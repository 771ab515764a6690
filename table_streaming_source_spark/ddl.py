"""Configure-time DDL: create-table-if-absent with the declared schema.

The reference creates its Table dataset at configure time and again
defensively at runtime, tolerating the create race when two pipeline
instances start together (`TableStreamingSource.java:66-69` configure-time,
`java:81-87` runtime with `InstanceConflictException` swallowed, schema +
rowField properties built at `java:120-126`).  Spark's catalog gives the
same semantics declaratively: ``CREATE TABLE IF NOT EXISTS`` is an atomic
check-and-create against the metastore, and the one remaining race window
(two sessions passing the existence check in different metastores) is
handled by swallowing the duplicate-table error exactly as the reference
swallows its conflict exception.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def _validate_row_field(schema: StructType, row_field: str) -> None:
    """Reference rule `TableStreamingSourceConfig.java:131-143`: the row
    field must be present and non-nullable (it is populated from the table
    row key, which is never null)."""
    by_name = {f.name: f for f in schema.fields}
    if row_field not in by_name:
        raise ValueError(
            f"Row field {row_field!r} must be present in the schema."
        )
    if by_name[row_field].nullable:
        raise ValueError(f"Row field {row_field!r} cannot be nullable.")


def ensure_table(
    spark: SparkSession,
    name: str,
    schema: StructType,
    *,
    row_field: str | None,
    location: str | None = None,
    table_format: str = "parquet",
) -> None:
    """Create ``name`` with ``schema`` if it does not exist (idempotent).

    ``row_field`` is validated against the schema the way the reference's
    config validation does (present + non-nullable,
    `TableStreamingSourceConfig.java:131-143`) and recorded as a table
    property, mirroring the reference's dataset properties
    (`TableStreamingSource.java:120-126`; the reference's rowField property
    may be null, so ``None`` skips the property).  ``location`` makes the
    table external — at scale the path is the governed data lake prefix,
    not the warehouse default.
    """
    if row_field is not None:
        _validate_row_field(schema, row_field)
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        f"{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    loc = f" LOCATION '{location}'" if location else ""
    props = (
        f" TBLPROPERTIES ('rowField' = '{row_field}')"
        if row_field is not None
        else ""
    )
    try:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({cols}) "
            f"USING {table_format}{loc}{props}"
        )
    except Exception as exc:  # create race: another session won — fine
        if "already exists" not in str(exc).lower():
            raise


def table_row_field(spark: SparkSession, name: str) -> str | None:
    """Read back the recorded rowField property (None if unset)."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    for r in rows:
        if r.key == "rowField":
            return r.value
    return None
