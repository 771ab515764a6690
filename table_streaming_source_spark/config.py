"""Source configuration + collected (non-fail-fast) validation.

Re-expresses the reference's config kernel in Python over Spark types:

- ``parse_duration_ms`` — ``"<n><d|h|m|s>"`` → milliseconds with a ``1h``
  default (reference `TableStreamingSourceConfig.java:109-111`, format doc
  `TableStreamingSourceConfig.java:58-63`).
- ``FailureCollector`` — collected validation à la CDAP's FailureCollector
  (reference `TableStreamingSourceConfig.java:113-144`): every rule runs,
  failures accumulate, ``get_or_throw`` raises once with all of them.
- ``SourceConfig.validate`` — the four rule families of
  `TableStreamingSourceConfig.java:113-144`: refresh-interval format regex
  (`:115`), schema parseability (`:122-129`), rowField presence (`:132-136`)
  and rowField non-nullability (`:138-142`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql.types import StructType

from table_streaming_source_spark.avro_schema import AvroSchemaError, parse_avro_json

#: Reference regex at `TableStreamingSourceConfig.java:115`: ``\d+[dhms]{1}$``
DURATION_RE = re.compile(r"^\d+[dhms]$")

#: Unresolved late-binding placeholder, ``${variable}`` — the reference's
#: macro syntax (`TableStreamingSourceConfig.java:41-44` marks ``name``
#: ``@Macro``, i.e. its value may still be a placeholder at configure time).
MACRO_RE = re.compile(r"\$\{([^${}]*)\}")


def contains_macro(value: Optional[str]) -> bool:
    """True iff *value* holds at least one unresolved ``${...}`` placeholder
    (the reference's ``config.containsMacro(...)``,
    `TableStreamingSource.java:67`)."""
    return bool(value) and MACRO_RE.search(value) is not None


def resolve_macros(value: str, variables: dict[str, str]) -> str:
    """Substitute every ``${var}`` in *value* from *variables* — the runtime
    half of macro late-binding (the reference framework resolves macros
    before ``getStream`` runs).  Raises :class:`ValueError` listing any
    placeholder with no binding, so a half-resolved name can never reach
    DDL or a scan."""
    unresolved: list[str] = []

    def _sub(m: "re.Match[str]") -> str:
        var = m.group(1)
        if var not in variables:
            unresolved.append(var)
            return m.group(0)
        return str(variables[var])

    out = MACRO_RE.sub(_sub, value)
    if unresolved:
        raise ValueError(
            f"Unresolved macro variable(s) {sorted(set(unresolved))} in "
            f"{value!r}."
        )
    return out

_UNIT_MS = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

#: Reference default at `TableStreamingSourceConfig.java:110`: ``"1h"``.
DEFAULT_REFRESH_INTERVAL = "1h"


def parse_duration_ms(value: Optional[str], default: str = DEFAULT_REFRESH_INTERVAL) -> int:
    """``"5s" / "10m" / "6h" / "5d"`` → milliseconds.

    ``None``/empty falls back to *default* (1 hour), mirroring
    `TableStreamingSourceConfig.java:110`.
    """
    s = (value or default).strip()
    if not DURATION_RE.match(s):
        raise ValueError(
            f"Invalid duration {s!r}: must match <number><d|h|m|s>, e.g. '5s' or '1h'."
        )
    return int(s[:-1]) * _UNIT_MS[s[-1]]


@dataclass
class ValidationFailure:
    """One collected validation failure, attributed to a config property."""

    message: str
    property: Optional[str] = None
    corrective_action: Optional[str] = None

    def __str__(self) -> str:
        prop = f" [{self.property}]" if self.property else ""
        fix = f" {self.corrective_action}" if self.corrective_action else ""
        return f"{self.message}{prop}{fix}"


class ValidationException(ValueError):
    """Raised by ``FailureCollector.get_or_throw`` with every failure."""

    def __init__(self, failures: list[ValidationFailure]):
        self.failures = failures
        super().__init__(
            f"{len(failures)} validation failure(s): "
            + "; ".join(str(f) for f in failures)
        )


class EnvironmentGatedError(RuntimeError):
    """Raised by a catalog entry whose runtime dependency is absent in
    the current environment (e.g. ``transformWithStateInPandas``
    requires ``google.protobuf`` for Spark's named-state wire
    protocol).  The local correctness gate reports these as SKIP with
    the reason instead of FAIL — the entry is implemented and runs
    green where the dependency exists; listing it keeps the surface
    gap visible in the catalog itself."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(reason)


class FailureCollector:
    """Collects validation failures instead of failing fast.

    Mirrors the reference's collected-validation pattern
    (`TableStreamingSourceConfig.java:113-144` calling
    ``collector.addFailure(...).withConfigProperty(...)``).
    """

    def __init__(self) -> None:
        self.failures: list[ValidationFailure] = []

    def add_failure(
        self,
        message: str,
        property: Optional[str] = None,
        corrective_action: Optional[str] = None,
    ) -> ValidationFailure:
        failure = ValidationFailure(message, property, corrective_action)
        self.failures.append(failure)
        return failure

    def get_or_throw(self) -> None:
        """Raise :class:`ValidationException` iff any failure was collected
        (reference `TableStreamingSource.java:62-63`
        ``collector.getOrThrowException()``)."""
        if self.failures:
            raise ValidationException(self.failures)


@dataclass
class SourceConfig:
    """Configuration of a refreshable snapshot source.

    Field-for-field equivalent of ``TableStreamingSourceConfig``
    (`TableStreamingSourceConfig.java:34-63`):

    name
        Table/dataset to snapshot (macro-enabled in the reference,
        `TableStreamingSourceConfig.java:41-44`; here: a catalog table name
        or a parquet path).
    schema_json
        The declared output schema as an Avro-JSON string
        (`TableStreamingSourceConfig.java:46-50`).
    row_field
        Optional schema field populated from the table row key
        (`TableStreamingSourceConfig.java:52-56`); must exist in the schema
        and be non-nullable (`TableStreamingSourceConfig.java:131-143`).
    refresh_interval
        Snapshot TTL as ``<n><d|h|m|s>``; default ``1h``
        (`TableStreamingSourceConfig.java:58-63`, `:109-111`).
    """

    name: str
    schema_json: Optional[str] = None
    row_field: Optional[str] = None
    refresh_interval: Optional[str] = None
    _schema_cache: Optional[StructType] = field(
        default=None, repr=False, compare=False
    )

    # property names as they appear in failure attribution (widget form
    # field names, reference `widgets/Table-streamingsource.json`).
    PROP_NAME = "name"
    PROP_SCHEMA = "schema"
    PROP_ROW_FIELD = "rowField"
    PROP_REFRESH_INTERVAL = "refreshInterval"

    def contains_macro(self, prop: str) -> bool:
        """Whether *prop*'s configured value is still an unresolved
        ``${...}`` placeholder (reference ``config.containsMacro("name")``,
        `TableStreamingSource.java:67`).  Only ``name`` is macro-enabled in
        the reference (`TableStreamingSourceConfig.java:41-44`); other
        properties always answer False so configure-time validation runs on
        them unconditionally."""
        if prop == self.PROP_NAME:
            return contains_macro(self.name)
        return False

    def resolved(self, variables: dict[str, str]) -> "SourceConfig":
        """A copy with every macro in ``name`` substituted from *variables*
        — the stream-build-time resolution step.  No-op (same values) when
        ``name`` has no placeholders; raises if a placeholder has no
        binding."""
        name = (
            resolve_macros(self.name, variables)
            if contains_macro(self.name)
            else self.name
        )
        return SourceConfig(
            name=name,
            schema_json=self.schema_json,
            row_field=self.row_field,
            refresh_interval=self.refresh_interval,
        )

    def get_schema(self) -> StructType:
        """Parse ``schema_json`` → ``StructType``
        (reference `TableStreamingSourceConfig.java:101-107`)."""
        if self._schema_cache is None:
            if not self.schema_json:
                raise AvroSchemaError("No schema configured")
            self._schema_cache = parse_avro_json(self.schema_json)
        return self._schema_cache

    def get_refresh_interval_ms(self) -> int:
        """Refresh interval in ms, defaulting to 1h
        (reference `TableStreamingSourceConfig.java:109-111`)."""
        return parse_duration_ms(self.refresh_interval)

    def validate(self, collector: FailureCollector) -> None:
        """Collected validation — all four rule families of
        `TableStreamingSourceConfig.java:113-144` run regardless of earlier
        failures."""
        # 1. refresh interval format (`TableStreamingSourceConfig.java:114-120`)
        if self.refresh_interval is not None and not DURATION_RE.match(
            self.refresh_interval
        ):
            collector.add_failure(
                f"Invalid refresh interval {self.refresh_interval!r}.",
                property=self.PROP_REFRESH_INTERVAL,
                corrective_action=(
                    "Specify refresh interval as a number followed by a unit "
                    "d, h, m or s, e.g. '5s' or '1h'."
                ),
            )

        # 2. schema parseability (`TableStreamingSourceConfig.java:122-129`)
        schema: Optional[StructType] = None
        if self.schema_json is not None:
            try:
                schema = self.get_schema()
            except AvroSchemaError as exc:
                collector.add_failure(
                    f"Invalid schema: {exc}", property=self.PROP_SCHEMA
                )

        # 3+4. rowField presence + non-nullability
        # (`TableStreamingSourceConfig.java:131-143`)
        if self.row_field is not None and schema is not None:
            names = {f.name: f for f in schema.fields}
            if self.row_field not in names:
                collector.add_failure(
                    f"Row field {self.row_field!r} must be present in the "
                    "schema.",
                    property=self.PROP_ROW_FIELD,
                    corrective_action="Add it to the schema or choose an "
                    "existing field.",
                )
            elif names[self.row_field].nullable:
                collector.add_failure(
                    f"Row field {self.row_field!r} cannot be nullable: it is "
                    "populated from the table row key, which is never null.",
                    property=self.PROP_ROW_FIELD,
                    corrective_action="Mark the field non-nullable.",
                )
