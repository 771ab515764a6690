"""Config-validation unit tests.

Mirrors every case of the reference's
`src/test/java/io/cdap/plugin/table/streaming/TableStreamingSourceConfigTest.java`
(shared fixture schema at `:34-40`; cases at `:48-131`), plus duration-parser
unit tests for `TableStreamingSourceConfig.java:109-111`.
"""

import json

import pytest

from table_streaming_source_spark.config import (
    FailureCollector,
    SourceConfig,
    ValidationException,
    parse_duration_ms,
)

# `simpleTableSchema` fixture (`TableStreamingSourceConfigTest.java:34-40`):
# string_value: non-null string; int_value: nullable long;
# float_value: nullable double; boolean_value: nullable boolean.
SIMPLE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "simpleTableSchema",
        "fields": [
            {"name": "string_value", "type": "string"},
            {"name": "int_value", "type": ["null", "long"]},
            {"name": "float_value", "type": ["null", "double"]},
            {"name": "boolean_value", "type": ["null", "boolean"]},
        ],
    }
)


def validate(config: SourceConfig) -> FailureCollector:
    collector = FailureCollector()
    config.validate(collector)
    return collector


def assert_validation_failed(collector: FailureCollector, prop: str) -> None:
    # mirrors `assertValidationFailed` (`ConfigTest.java:133-150`): exactly
    # one failure, attributed to the right config property.
    assert len(collector.failures) == 1
    assert collector.failures[0].property == prop


def test_valid_config():
    # `ConfigTest.java:48-53`
    collector = validate(SourceConfig(name="t", schema_json=SIMPLE_SCHEMA))
    assert collector.failures == []
    collector.get_or_throw()  # no-op when clean


def test_valid_row_field():
    # `ConfigTest.java:56-64` — non-nullable field accepted as rowField
    collector = validate(
        SourceConfig(name="t", schema_json=SIMPLE_SCHEMA, row_field="string_value")
    )
    assert collector.failures == []


def test_valid_refresh_interval():
    # `ConfigTest.java:66-75` — "5d" accepted
    config = SourceConfig(name="t", schema_json=SIMPLE_SCHEMA, refresh_interval="5d")
    assert validate(config).failures == []
    assert config.get_refresh_interval_ms() == 5 * 86_400_000


def test_nonexistent_row_field():
    # `ConfigTest.java:77-89`
    collector = validate(
        SourceConfig(name="t", schema_json=SIMPLE_SCHEMA, row_field="test")
    )
    assert_validation_failed(collector, SourceConfig.PROP_ROW_FIELD)


def test_nullable_row_field():
    # `ConfigTest.java:91-103` — int_value is nullable → rejected
    collector = validate(
        SourceConfig(name="t", schema_json=SIMPLE_SCHEMA, row_field="int_value")
    )
    assert_validation_failed(collector, SourceConfig.PROP_ROW_FIELD)


def test_invalid_refresh_interval():
    # `ConfigTest.java:105-117` — "t3" rejected by the `\d+[dhms]$` regex
    collector = validate(
        SourceConfig(name="t", schema_json=SIMPLE_SCHEMA, refresh_interval="t3")
    )
    assert_validation_failed(collector, SourceConfig.PROP_REFRESH_INTERVAL)


def test_invalid_schema():
    # `ConfigTest.java:119-131` — unparseable schema string
    collector = validate(SourceConfig(name="t", schema_json="test"))
    assert_validation_failed(collector, SourceConfig.PROP_SCHEMA)


def test_collected_not_fail_fast():
    # collected validation: bad interval AND bad schema → two failures
    collector = validate(
        SourceConfig(name="t", schema_json="test", refresh_interval="t3")
    )
    assert {f.property for f in collector.failures} == {
        SourceConfig.PROP_SCHEMA,
        SourceConfig.PROP_REFRESH_INTERVAL,
    }
    with pytest.raises(ValidationException) as exc:
        collector.get_or_throw()
    assert len(exc.value.failures) == 2


@pytest.mark.parametrize(
    ("text", "ms"),
    [
        ("5s", 5_000),
        ("10m", 600_000),
        ("6h", 21_600_000),
        ("5d", 432_000_000),
        (None, 3_600_000),  # default 1h (`Config.java:110`)
        ("", 3_600_000),
    ],
)
def test_parse_duration(text, ms):
    assert parse_duration_ms(text) == ms


@pytest.mark.parametrize("bad", ["t3", "5", "s5", "5ss", "5w", "-5s", "5 s"])
def test_parse_duration_invalid(bad):
    with pytest.raises(ValueError):
        parse_duration_ms(bad)


# ---------------------------------------------------------------------------
# macro late-binding (`TableStreamingSourceConfig.java:41-44` @Macro name;
# skip-create branch `TableStreamingSource.java:67-69`)
# ---------------------------------------------------------------------------

def test_contains_macro_detection():
    from table_streaming_source_spark.config import contains_macro

    assert contains_macro("${runtime.table}")
    assert contains_macro("prefix_${env}_events")
    assert not contains_macro("plain_table")
    assert not contains_macro(None)
    assert not contains_macro("")


def test_config_contains_macro_only_for_name():
    cfg = SourceConfig(name="${tbl}", schema_json=SIMPLE_SCHEMA)
    assert cfg.contains_macro(SourceConfig.PROP_NAME)
    # only `name` is @Macro in the reference — other props never report one
    assert not cfg.contains_macro(SourceConfig.PROP_SCHEMA)
    concrete = SourceConfig(name="t", schema_json=SIMPLE_SCHEMA)
    assert not concrete.contains_macro(SourceConfig.PROP_NAME)


def test_resolve_macros_substitutes_and_raises_on_missing():
    from table_streaming_source_spark.config import resolve_macros

    assert resolve_macros("${a}_x_${b}", {"a": "t1", "b": "t2"}) == "t1_x_t2"
    with pytest.raises(ValueError, match=r"\['b'\]"):
        resolve_macros("${a}_x_${b}", {"a": "t1"})


def test_resolved_returns_concrete_copy():
    cfg = SourceConfig(
        name="${env}_events", schema_json=SIMPLE_SCHEMA, refresh_interval="5m"
    )
    out = cfg.resolved({"env": "prod"})
    assert out.name == "prod_events"
    assert out.schema_json == cfg.schema_json
    assert out.refresh_interval == "5m"
    assert cfg.name == "${env}_events"  # original untouched


def test_macro_name_still_validates_other_properties():
    # the reference validates everything else at configure time even when
    # `name` is a macro — a bad refresh interval must fail the deploy
    collector = validate(
        SourceConfig(name="${tbl}", schema_json=SIMPLE_SCHEMA, refresh_interval="t3")
    )
    assert_validation_failed(collector, SourceConfig.PROP_REFRESH_INTERVAL)
