#!/usr/bin/env python
"""Regenerate docs/PLANS.md: the final physical plan of every headline
query at $SPARK_GRAFT_SF_DIR, with the scale-relevant features called out.

Usage: python scripts/dump_plans.py  (writes docs/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "flagship_enrichment": "fact⋈fact sort-merge or broadcast by stats; "
    "all dimensions broadcast; single final aggregation exchange.",
    "pricing_summary": "partial+final HashAggregate; decimal-path sums for "
    "partitioning-independent results.",
    "join_asof": "union + running last() window — one exchange on the key, "
    "no pair explosion.",
    "window_topk_per_group": "ranking window then filter; one exchange on "
    "the group key.",
    "window_session": "session_window aggregation.",
    "dedup_minhash_lsh": "signature/banding fully row-local (no exchange "
    "until the band-bucket aggregation); verify joins only candidate docs.",
    "dedup_embedding": "blocked cosine self-join on the label cell; "
    "checkpointed pair graph.",
    "sim_topk": "queries broadcast; corpus never shuffles; per-query top-k "
    "window.",
    "sim_ann_lsh": "row-local hyperplane bucketing; bucket equi-join "
    "replaces the cross product.",
    "text_tfidf": "two hash aggregations + broadcast term join.",
    "multimodal_decode": "ArrowEvalPython/mapInPandas stage, partition-"
    "preserving, payload column pruned elsewhere.",
    "scalar_json": "JSON path extraction inside whole-stage codegen + one "
    "aggregation.",
    "waiting_suppliers": "Q21 double-EXISTS rewritten to one window pass: "
    "exactly one fact shuffle (hashpartitioning on l_orderkey), dims "
    "broadcast, no self-join.",
    "pipeline_corpus_prep": "composed clean→gate→dedup→pack pipeline: two "
    "hash shuffles total, all row-local stages fused by codegen.",
    "sim_kmeans_refine": "two Lloyd iterations as long-format hash "
    "aggregates; centroid table broadcasts into the dim join.",
    "join_bucketed": "bucketed scan (SelectedBucketsCount 8/8); at "
    "fixture scale the planner broadcasts the small side, at scale the "
    "same layout merge-joins bucket pairs with no exchange "
    "(tests/test_scale_strategies.py proves the SMJ shape with "
    "broadcast disabled); either way the only shuffle is the final "
    "aggregation.",
    "streaming_session_agg_update": "append-mode session windows with "
    "watermark eviction + parquet sink — the production stateful shape.",
}

#: extra showcase plans beyond the bench headline set
EXTRA = ["waiting_suppliers", "pipeline_corpus_prep", "sim_kmeans_refine", "join_bucketed"]


def main() -> None:
    from bench import HEADLINE

    from table_streaming_source_spark.plans.catalog import QUERIES
    from table_streaming_source_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — final physical plans of the headline queries",
        "",
        f"Captured from `local[*]` at `{sf_dir}` after execution (AQE final "
        "plans).  Regenerate with `python scripts/dump_plans.py`.  What to "
        "look for per query is noted above each plan; docs/SCALE.md has the "
        "full scale reasoning.",
        "",
    ]
    for name in HEADLINE + EXTRA:
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        # strip expression ids (#123L) for readable diffs
        plan = re.sub(r"#\d+L?", "", plan).rstrip()
        out += [
            f"## {name}",
            "",
            f"*{NOTES.get(name, '')}*",
            "",
            "```",
            plan,
            "```",
            "",
        ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "PLANS.md",
    )
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(out)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
