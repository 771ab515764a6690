"""Read-lineage extraction (reference A9).

The reference registers each dataset read with its platform's lineage
service (`TableStreamingSource.java:88`,
``streamingContext.registerLineage(name)``).  Spark has no ambient
platform, but the information is already in every query plan: the set of
file locations (and catalog tables) a DataFrame will scan.  This module
surfaces it so a caller can register lineage with whatever governance
system surrounds the cluster — the moral equivalent of the reference's
one-line hook, derived from the plan instead of declared by the source.

Plan-derived lineage is also *truthful* in ways declared lineage is not:
after pruning and pushdown it reflects what the query actually touches.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: FileScan renders as `Location: InMemoryFileIndex(2 paths)[p1, p2, ...]`
_LOCATION = re.compile(r"Location: \w+\(\d+ paths?\)\[([^\]]+)\]")


def read_paths(df: DataFrame) -> set[str]:
    """The file locations ``df``'s plan scans.

    Parsed from the executed plan's ``FileScan ... Location:`` entries.
    Plan rendering truncates very long path lists (``, ...``); for
    multi-thousand-file tables register the table identity from
    :func:`read_tables` instead of individual files.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    paths: set[str] = set()
    for group in _LOCATION.findall(plan):
        for p in group.split(","):
            p = p.strip()
            if p and p != "...":
                paths.add(p)
    return paths


def read_tables(df: DataFrame) -> set[str]:
    """Catalog table identifiers ``df``'s analyzed plan references
    (empty for pure path-based reads)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return set(
        m.group(1)
        for m in re.finditer(
            r"Relation (?:spark_catalog\.)?(\w+\.\w+)\[", analyzed
        )
    )


def register_lineage(df: DataFrame, registry: list[str]) -> DataFrame:
    """Append every scanned location to ``registry`` and return ``df``
    unchanged — the shape of the reference's hook
    (`TableStreamingSource.java:88`) for callers that collect lineage
    into their own service client."""
    registry.extend(sorted(read_paths(df)))
    return df
