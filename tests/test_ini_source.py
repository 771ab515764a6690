"""INI source edge cases: the ``value_int`` TRY_CAST contract must
yield NULL — never a task failure — for every non-integer shape a
valid INI value can take (round-11 advice fix)."""

from table_streaming_source_spark.sources.ini_config import (
    _try_int32,
    ini_rows,
    parse_ini,
)


def test_try_int32_contract():
    assert _try_int32("5") == 5
    assert _try_int32("-5") == -5
    assert _try_int32("+5") == 5
    assert _try_int32("  7 ") == 7  # int() strips whitespace, as SQL does
    assert _try_int32("--5") is None  # lstrip('-') trap: not an int
    assert _try_int32("99999999999") is None  # past int32: NULL, not error
    assert _try_int32(str(-(2**31))) == -(2**31)
    assert _try_int32(str(2**31 - 1)) == 2**31 - 1
    assert _try_int32(str(2**31)) is None
    assert _try_int32("5_0") is None  # Python literal sugar; SQL rejects
    assert _try_int32("1.5") is None
    assert _try_int32("") is None


def test_ini_rows_survives_weird_int_values(spark):
    """A valid INI doc whose values include ``--5`` and an int64-range
    number must produce NULL cells, not a crashed Arrow batch."""
    doc = "[a]\nx = --5\ny = 99999999999\nz = 12\n"
    df = spark.createDataFrame([(1, doc)], "key long, ini string")
    rows = {r["prop"]: r["value_int"] for r in ini_rows(df).collect()}
    assert rows == {"x": None, "y": None, "z": 12}


def test_parse_ini_malformed_raises():
    try:
        parse_ini("not an ini [section\n===")
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("malformed INI must raise ValueError")
