"""Commit-log / manifest scaling sweep for the table format (round 15,
VERDICT item #5): measures how the METADATA paths scale with history
depth and file count — the 100 TB question for the log layer is
"is read cost manifest-proportional (retained entries) or
table-lifetime-proportional (all commits ever)?".

Shapes measured at 1x/10x/100x commit depth (10 / 100 / 1000 commits):

- ``snapshot_files`` resolve (manifest walk), cold and warm commit
  cache — the cost every read pays;
- ``_walk_files_renamed`` chain walk with a rename at half depth —
  the era-translation bookkeeping;
- ``read_cdf`` over the LAST 5 commits — must stay flat vs depth
  (change-proportional), while a from-0 replay is linear by design;
- the tail stream's per-batch planning (``_lineage_commits`` +
  ``_commit_new_files`` for the last 5 commits);
- ``expire_snapshots(keep_last=5)`` and the post-expiry resolve —
  the remedy that bounds the walk.

The log is SYNTHESIZED driver-side (one real parquet file hardlinked
under N manifest paths, commits via ``_write_commit``) so the sweep
times the metadata layer, not Spark write throughput.  Run:

    python scripts/bench_format_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from table_streaming_source_spark import table_format as TF  # noqa: E402


def _build(root: str, n_commits: int, files_per_commit: int = 1):
    """A table with ``n_commits`` appends (hardlinked data files) and
    a rename at half depth."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(root, f"t{n_commits}x{files_per_commit}")
    TF.create_table(path)
    seed = os.path.join(path, "data", "seed.parquet")
    pq.write_table(
        pa.table({"k": list(range(100)), "v": [i * 2 for i in range(100)]}),
        seed,
    )
    st = {"k": [0, 99]}
    half = n_commits // 2
    v = 0
    for i in range(1, n_commits + 1):
        if i == half:
            TF.commit_rename_column(path, {"v": f"v{i}"})
            v = i
            continue
        entries = []
        for j in range(files_per_commit):
            rel = f"data/c{i}-{j}.parquet"
            os.link(seed, os.path.join(path, rel))
            entries.append(
                {"path": rel, "rows": 100, "stats": st, "seq": i}
            )
        TF._write_commit(
            path, i, {"version": i, "files": entries, "parent": v}
        )
        v = i
    return path, v


def _t(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from table_streaming_source_spark.session import get_spark

    spark = get_spark(shuffle_partitions=4)
    root = tempfile.mkdtemp(prefix="fmt_scale_")
    rows = []
    for n in (10, 100, 1000):
        path, head = _build(root, n)
        TF._COMMIT_CACHE.clear()
        t_resolve_cold = _t(lambda: TF.snapshot_files(path), reps=1)
        t_resolve_warm = _t(lambda: TF.snapshot_files(path))
        t_chain = _t(lambda: TF._walk_files_renamed(path, head))
        t_cdf5 = _t(
            lambda: TF.read_cdf(
                spark, path, from_version=head - 5
            ).count(),
            reps=1,
        )
        from table_streaming_source_spark.streaming.format_tail import (
            _commit_new_files,
            _lineage_commits,
        )

        t_tail5 = _t(
            lambda: [
                _commit_new_files(path, v)
                for v in _lineage_commits(path, head - 5, head)
            ]
        )
        t_read = _t(
            lambda: TF.read_table(spark, path).count(), reps=1
        )
        t_expire = _t(
            lambda: TF.expire_snapshots(path, keep_last=5), reps=1
        )
        TF._COMMIT_CACHE.clear()
        t_resolve_post = _t(lambda: TF.snapshot_files(path))
        rows.append(
            {
                "commits": n,
                "resolve_cold_ms": round(t_resolve_cold * 1e3, 2),
                "resolve_warm_ms": round(t_resolve_warm * 1e3, 2),
                "chain_walk_ms": round(t_chain * 1e3, 2),
                "cdf_last5_s": round(t_cdf5, 3),
                "tail_plan5_ms": round(t_tail5 * 1e3, 2),
                "read_count_s": round(t_read, 3),
                "expire_s": round(t_expire, 3),
                "resolve_postexpire_ms": round(t_resolve_post * 1e3, 2),
            }
        )
        print(json.dumps(rows[-1]))
    # file-count shape: same total entries, ONE commit
    path, head = _build(root, 2, files_per_commit=1000)
    TF._COMMIT_CACHE.clear()
    wide = {
        "commits": 2,
        "files": 1000,
        "resolve_cold_ms": round(
            _t(lambda: TF.snapshot_files(path), reps=1) * 1e3, 2
        ),
        "resolve_warm_ms": round(
            _t(lambda: TF.snapshot_files(path)) * 1e3, 2
        ),
        "read_count_s": round(
            _t(lambda: TF.read_table(spark, path).count(), reps=1), 3
        ),
    }
    print(json.dumps(wide))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
