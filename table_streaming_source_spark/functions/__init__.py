"""User-defined function surface: vectorized (Arrow) pandas UDFs, a
grouped-aggregate pandas UDAF, and a Python UDTF (SURVEY.md §2B
"UDF/UDAF/UDTF" row).

The engine's position (SURVEY.md §4): built-in ``pyspark.sql.functions``
are the hot path — JVM-side, whole-stage-codegen'd.  When user logic must
run in Python, Arrow-batched pandas UDFs keep the transfer vectorized
(~10-100× over row-at-a-time Python UDFs); UDTFs are the lateral-join
extension point.  These implementations exist to prove the full surface
with oracle-checked semantics, each documenting its JVM-native equivalent.
"""

from table_streaming_source_spark.functions.vectorized import (
    Tokenize,
    discounted_revenue,
    register_udtfs,
    weighted_avg,
)

__all__ = [
    "Tokenize",
    "discounted_revenue",
    "register_udtfs",
    "weighted_avg",
]
