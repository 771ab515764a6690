"""Declared query catalog: every operator of SURVEY.md §2B as a named
(Spark callable, DuckDB oracle SQL) pair — the driver's correctness
contract (`__spark_entry__.py`)."""
