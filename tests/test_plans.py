"""Golden-plan regression gates.

Plan-shape invariants for the headline queries — the properties that make
them survive a 100× scale-up — pinned as tests so a regressed hint or an
accidental extra shuffle fails CI, not the 100 TB run:

* **No forced broadcast of scale-growing tables.** With
  ``autoBroadcastJoinThreshold=-1`` (and AQE off) the planner broadcasts
  ONLY where the code carries an explicit ``F.broadcast`` hint, so the
  set of base tables scanned under ``BroadcastExchange`` nodes is exactly
  the set of hinted builds.  Golden sets below allow bounded dims
  (nation 25, region 5, supplier SF×10k — the reference's snapshot-dim
  scale) and bounded-cardinality derived aggregates, never a raw
  customer/orders/lineitem/part scan.  Re-adding ``F.broadcast(customer)``
  flips a golden set and fails the test.
* **Stats/AQE still deliver broadcast at fixture scale.**  Removing the
  hints must not cost the small-SF plan its BroadcastHashJoin — the
  planner's own statistics pick it when the side is genuinely small.
* **Shuffle budgets.**  Each query's count of shuffle exchanges in the
  final adaptive plan has a golden upper bound; an accidental
  repartition/extra aggregation step breaks it.
* **Top-k stays TakeOrderedAndProject** — never a global sort.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest

from table_streaming_source_spark.plans import catalog

#: column-prefix → TPC-H table, for classifying scans inside a broadcast
_PFX = {
    "l_": "lineitem",
    "o_": "orders",
    "c_": "customer",
    "n_": "nation",
    "r_": "region",
    "s_": "supplier",
    "p_": "part",
}

#: golden: base tables scanned under BroadcastExchange when ONLY explicit
#: hints can broadcast.  "lineitem"/"part" entries are bounded-cardinality
#: derived aggregates (a scalar max, a supplier-keyed candidate set) whose
#: subtree scans those tables — not raw-table broadcasts.
_HINTED_BROADCASTS = {
    "flagship_enrichment": {"nation", "region"},
    "join_inner": set(),
    "shipping_priority": set(),
    "large_volume_orders": set(),
    "returned_items": {"nation"},
    "market_share": {"nation", "region", "supplier"},
    "local_supplier_volume": {"nation", "region", "supplier"},
    "nation_volume": {"nation", "supplier"},
    "product_profit": {"nation", "supplier"},
    "supplier_cnt": {"supplier"},
    "small_qty_revenue": set(),
    "excess_suppliers": {"lineitem", "part"},  # supplier-keyed candidate set
    "promo_revenue": set(),
    "discounted_brand_revenue": set(),
    "min_cost_supplier": {"supplier"},
    "window_topk_per_group": set(),
    "join_theta_range": set(),
    "top_supplier": {"lineitem", "supplier"},  # scalar max-revenue row
    "pricing_summary": set(),
}


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _broadcast_tables(df) -> set[str]:
    """Base tables scanned under any BroadcastExchange in the prepared
    (unexecuted) physical plan."""
    out: set[str] = set()
    for n in _walk(df._jdf.queryExecution().executedPlan()):
        if "BroadcastExchange" not in n.nodeName():
            continue
        for m in _walk(n):
            if "Scan" not in m.nodeName():
                continue
            head = m.toString().split("\n")[0]
            cols = re.search(r"\[([a-z_0-9#, L]+)\]", head)
            first = cols.group(1).split(",")[0].strip() if cols else ""
            out.add(
                next(
                    (t for p, t in _PFX.items() if first.startswith(p)),
                    f"other:{first}",
                )
            )
    return out


@pytest.fixture(scope="module")
def hints_only(spark):
    """Planner state where broadcast can ONLY come from explicit hints."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", sorted(_HINTED_BROADCASTS))
def test_hinted_broadcasts_are_bounded_dims_only(hints_only, sf_dir, name):
    df = catalog.QUERIES[name](hints_only, sf_dir)
    got = _broadcast_tables(df)
    assert got == _HINTED_BROADCASTS[name], (
        f"{name}: hinted broadcast set changed — raw customer/orders/"
        f"lineitem/part must never carry a forced hint (got {sorted(got)})"
    )
    assert not any(t.startswith("other:") for t in got), got


#: golden hinted-broadcast sets for the extension families (documents /
#: embeddings surface).  Keys are first-scanned-column names with the
#: unstable ``#exprId`` suffix stripped.  Every allowed entry is bounded
#: BY DESIGN, never by luck:
#:   * ``text_decontaminate`` → the benchmark shingle set (benchmarks are
#:     small by definition; the corpus side is never hinted);
#:   * ``sim_ivfpq_search`` → PQ codebooks (k×m centroids) and the
#:     per-query ADC lookup tables / query vectors (bounded by the query
#:     batch, not the corpus).
#: Corpus-derived unbounded tables (tf-idf vocabulary, LSH candidate
#: keys) must NEVER appear here — that is the 100 TB scale-killer class
#: round 2 purged from plans/relational.py and round 4 purged from
#: operators/text.py and operators/dedup.py.
_EXTENSION_HINTED_BROADCASTS = {
    "text_tfidf": set(),
    # the verify-prefilter broadcast is COUNT-GATED (operators/dedup.py::
    # minhash_lsh_pairs, verify_broadcast_max_keys) and since round 15
    # lives INSIDE the pinned candidate-shingle checkpoint
    # (``pin_verify``), so the catalog entry's final plan shows no
    # forced hint at all; the gate's two branches stay pinned by
    # tests/test_scale_strategies.py::test_minhash_verify_gate_both_branches
    # (which passes pin_verify=False to keep the semi-join visible)
    "dedup_minhash_lsh": set(),
    "dedup_ngram_jaccard": set(),
    "pipeline_image_prep": set(),
    "text_decontaminate": {"doc_id"},
    "sim_ivfpq_search": {"embedding", "subspace", "vec_id"},
    # round-4 additions: every hint below is bounded BY DESIGN — the
    # query set (user-chosen, KBs), per-label centroids (|labels|×64
    # cells), per-source sizes (|sources| rows), or a 1-row scalar.
    # Corpus-derived tables (the keyword vocabulary join, the overlap
    # posting join) must stay unhinted.
    "sim_prefix_rerank": {"embedding"},
    "sim_centroid_classify": {"embedding"},
    "text_doc_keywords": {""},  # 1-row COUNT(*) scalar (column-less scan)
    "text_source_overlap": {"doc_id"},  # per-source size table (|sources| rows)
}


@pytest.mark.parametrize("name", sorted(_EXTENSION_HINTED_BROADCASTS))
def test_extension_hinted_broadcasts_are_bounded(hints_only, sf_dir, name):
    df = catalog.QUERIES[name](hints_only, sf_dir)
    got = {
        t.split(":", 1)[1].split("#")[0] if t.startswith("other:") else t
        for t in _broadcast_tables(df)
    }
    assert got == _EXTENSION_HINTED_BROADCASTS[name], (
        f"{name}: hinted broadcast set changed — corpus-derived tables "
        f"(vocabularies, candidate keys, shingle tables) must never carry "
        f"a forced hint (got {sorted(got)})"
    )


def _final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def _count_exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


@contextmanager
def capture_lazy_pins():
    """Record every DataFrame that gets a LAZY ``localCheckpoint`` while
    the context is active.  A lazy pin truncates lineage, so its
    upstream shuffles vanish from the final plan — the round-15 pins
    made the plain exchange count blind to the pinned subtrees (VERDICT
    r15 item #1 of "what's wrong").  The recorded parents let the
    budget gate count each pinned subtree's own exchanges too.

    Eager checkpoints are deliberately NOT recorded: they are lifecycle
    truncations (receipt reads, scratch-table rollups) whose work is a
    commit/drain lifecycle, not the declared query's plan shape.

    Each pin's subtree plan is rendered AT CAPTURE TIME (noop-executed
    inside the wrapper, so it renders in final adaptive form — counting
    the initial plan instead would inflate budgets with exchanges AQE
    removes at runtime, e.g. sort-merge joins finishing as broadcasts).
    Rendering later would break table-format lifecycle entries: a pin
    taken mid-lifecycle references scratch files that a later lifecycle
    step (compaction, delete) removes, so re-executing it after the
    entry completes fails with FILE_NOT_EXIST.

    NOTE: Spark 4's local-mode instances are
    ``pyspark.sql.classic.dataframe.DataFrame``, which OVERRIDES
    ``localCheckpoint`` — patching only the abstract
    ``pyspark.sql.DataFrame`` intercepts nothing (verified: 0 pins
    captured across the whole catalog), so the concrete class must be
    patched."""
    try:  # Spark 4 local mode
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older releases: one concrete class
        from pyspark.sql import DataFrame

    recorded: list = []
    orig = DataFrame.localCheckpoint

    def wrapper(self, eager=True):
        if not eager:
            # render while this subtree's inputs still exist; restore
            # the original method during the render so the noop
            # execution of this parent cannot re-enter the recorder
            DataFrame.localCheckpoint = orig
            try:
                recorded.append(_final_plan(self))
            finally:
                DataFrame.localCheckpoint = wrapper
        return orig(self, eager)

    DataFrame.localCheckpoint = wrapper
    try:
        yield recorded
    finally:
        DataFrame.localCheckpoint = orig


def plan_exchange_count(fn, spark, sf_dir) -> tuple[int, str]:
    """Total shuffle-exchange count of a catalog entry ACROSS lazy
    checkpoint boundaries: the final adaptive plan's exchanges plus each
    lazily-pinned subtree's own (rendered at capture time — see
    ``capture_lazy_pins``).  Nested pins do not double-count — a pin's
    parent plan is already truncated at any deeper pin applied before
    it."""
    with capture_lazy_pins() as pins:
        df = fn(spark, sf_dir)
        plan = _final_plan(df)
    n = _count_exchanges(plan)
    rendered = [plan]
    for sub in pins:
        n += _count_exchanges(sub)
        rendered.append(f"--- lazily pinned subtree ---\n{sub}")
    return n, "\n".join(rendered)


def _broadcast_subtrees(plan: str) -> list[str]:
    """Text of each BroadcastExchange subtree in a rendered plan tree."""
    lines = plan.split("\n")

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-|"))

    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        base = indent(line)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if nxt.strip() and indent(nxt) <= base:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


@pytest.fixture
def stats_planner(spark):
    """Explicit default-stats planner state (AQE on, 10 MB threshold) —
    self-contained so ordering against the module-scoped ``hints_only``
    fixture cannot leak ``-1`` thresholds into this test."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.adaptive.enabled": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_unhinted_customer_still_broadcasts_at_fixture_scale(
    stats_planner, sf_dir
):
    """Removing the forced hint must not cost the small-SF plan its
    broadcast: the planner's statistics (or AQE at runtime) still build
    a BroadcastHashJoin on customer when it is actually small."""
    plan = _final_plan(
        catalog.QUERIES["flagship_enrichment"](stats_planner, sf_dir)
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert any(
        "c_custkey" in sub or "c_nationkey" in sub
        for sub in _broadcast_subtrees(plan)
    ), f"customer no longer broadcast at fixture scale:\n{plan}"


#: golden upper bound on shuffle exchanges in the final adaptive plan
_SHUFFLE_BUDGET = {
    "pricing_summary": 1,  # partial+final agg = one exchange
    "window_topk_per_group": 2,  # join + window partition (AQE may fuse)
    "flagship_enrichment": 3,  # fact⋈fact + distinct-agg pair
    "shipping_priority": 3,  # two fact sides + group agg (top-k no sort)
    "order_limit_topk": 1,  # TakeOrderedAndProject, no global sort
    "text_tfidf": 3,  # r15: df derived from the pinned tf table
    "sim_topk": 1,  # corpus never shuffles; per-query top-k window
    # bucketed co-located join: the join itself is exchange-free (bucket
    # pairs merge-join in place); only the final aggregation shuffles
    "join_bucketed": 1,
    # extension families — the scale shapes pinned alongside TPC-H's:
    # band-bucket explode + distinct + verify join; payloads never shuffle
    "dedup_minhash_lsh": 3,  # banding+verify live inside checkpoints (r15 pin_verify)
    # cell assign + within-cell ADC agg + top-k; codebooks broadcast
    "sim_ivfpq_search": 3,
    # corpus shingle agg + benchmark semi-join + doc-level rollup
    "text_decontaminate": 3,
    # quarantine routing + phash dedup join; blobs never shuffle
    "pipeline_image_prep": 2,
    # round-4 additions: SCD2 equi-keyed temporal join (dim broadcast at
    # fixture scale; 2 join-input exchanges + agg if it grows to SMJ)
    "join_scd2": 3,
    # one running window over the user key — no self-join ever
    "window_attribution": 1,
    # binaryFile scan → Arrow decode → partial/final agg pair
    "source_avro": 2,
    "udf_grouped_arrow": 1,
    # round-4 additions (second batch)
    # MERGE = ONE full-outer join: each side partitions once, then every
    # decision is row-local — a third exchange means a second pass crept in
    "merge_upsert": 2,
    # OHLC bars are one map-combinable struct-min/max hash aggregate:
    # open/close via a window sort would show as an extra range exchange
    "ts_resample_ohlc": 1,
    # word-count agg + vocab join + doc rollup; the per-round pair
    # aggregates live behind the 1-row merge checkpoints (train twin
    # shows 0 for the same reason)
    "text_bpe_encode": 7,
    # pure mapInPandas decode chain — media bytes must never shuffle
    "multimodal_video_frames": 0,
    # round-4 additions (third batch)
    # the model fit is ONE map-combinable hash aggregate — a second
    # exchange means a two-pass formulation crept in
    "agg_linear_fit": 1,
    # minute rollup + hour re-aggregate; raw events partition once
    "ts_rollup_reagg": 2,
    # frequency table + struct-max argmax
    "agg_mode": 2,
    # one window partition exchange; the frame array is row-local
    "window_rolling_median": 1,
    # canonicalization is row-local; one hash aggregate on the string
    "text_url_dedup": 1,
    # pure mapInPandas decode chain — compressed audio never shuffles
    "multimodal_adpcm": 0,
    # metadata walk and progressive-color decode chains are likewise
    # shuffle-free end to end
    "multimodal_tiff_meta": 0,
    "multimodal_jpeg_progressive_color": 0,
    # round-4 additions (fourth batch)
    # decode chains stay shuffle-free end to end
    "multimodal_flac": 0,
    "multimodal_mjpeg_frames": 0,
    # one hash aggregate — the model-fit-at-the-cost-of-a-sum contract
    "agg_higher_moments": 1,
    # frequency aggregate + entropy rollup (the per-type window fuses
    # into the same exchange)
    "agg_entropy": 2,
    # ordered cumulative-weight window + crossing argmin
    "agg_weighted_median": 2,
    # prefix phase shuffles nothing (queries broadcast); the shortlist
    # key join + rerank window bound the exchanges
    "sim_prefix_rerank": 3,
    # sessionize window + session agg + profile rollup share the
    # user-hashed lineage
    "pipeline_behavior": 3,
    # mixed-codec decode is mapInPandas; metadata join + rollup
    "pipeline_audio_prep": 3,
    # round-5 additions
    # published rule batteries are pure row-local maps — zero shuffles
    "text_gopher_quality": 0,
    "text_c4_filters": 0,
    "text_html_strip": 0,
    # owner election on the line + ownership join + per-doc rebuild
    "text_line_dedup": 2,  # r15: exploded line table pinned once
    # two stacked windows on ONE (user, ts) sort — a single exchange
    "anomaly_cusum": 1,
    # blocked linkage: the block-key equi-join (broadcast at fixture
    # scale; two hash exchanges at 100 TB) + nothing else
    "join_fuzzy_levenshtein": 0,  # blocked self-join broadcasts at gate scale
    # scan + two-phase distinct aggregate, same as the other sources
    "source_xml": 2,
    # container decode chains never shuffle
    "multimodal_ulaw": 0,
    "multimodal_mp3_meta": 0,
    "multimodal_png_interlaced": 0,
    "multimodal_png_filtered": 0,
    "multimodal_png_rgb": 0,
    "multimodal_tga": 0,
    # one map-combinable aggregate (M4) / broadcast-NL + argmin agg
    "ts_downsample_m4": 1,
    # line rules are row-local; dedup election + ownership join +
    # source rollup bound the exchanges
    "pipeline_web_clean": 3,  # r15: line_dedup pin
    "join_nearest_spatial": 1,
    # collated grouping is the same two-phase distinct aggregate
    "scalar_collation": 2,
    # round-6 additions.  Group-bounded collect_list/set: one hash agg
    "agg_string_agg": 1,
    # fact agg + the 15-row cell-table windows (bounded by |priority|×|status|)
    "agg_chi_square": 2,
    # single-pass conditional moments → one global agg
    "agg_welch_ttest": 1,
    # per-order window partition — one exchange, bounded frames
    "window_distinct_running": 1,
    # derive + parse + /16 rollup: one hash agg
    "scalar_ip": 1,
    # digest-keyed keep-best: one hash agg (max_by folds in)
    "dedup_keep_best": 1,
    # priority sampling is TakeOrderedAndProject — NO exchange, no sort
    "sample_weighted": 0,
    # a-priori basket pairs: distinct + item counts + support join +
    # basket collect + pair agg — pair expansion is ROW-LOCAL from the
    # basket array (≤136 pairs/basket), no fact×fact self-join; AQE
    # broadcast-converts the small sides at larger SF
    "market_basket": 7,
    # block-keyed self-join (broadcast at fixture scale) + per-vector window
    "sim_knn_join": 2,
    # two token aggs + vocab distinct + token joins + doc rollup;
    # vocabulary tables are NEVER hint-broadcast (Heaps' law)
    "text_importance_weight": 3,  # r15: one token agg, totals from vocab table
    # card rollup: group agg + digest distinct-count expansion
    "pipeline_dataset_card": 2,
    # daily rollup + series self-join + per-type median window
    "ts_theil_sen": 3,
    # metadata-only: the aggregate IS the scan output — zero exchanges
    # beyond the 1-row fold (none at all in the adaptive plan)
    "scan_metadata_only": 0,
    # round-6 second wave (round-7 rotation backlog)
    # GROUP BY ALL is physically the plain two-key hash aggregate
    "sql_groupby_all": 1,
    # _metadata lineage scan checkpoints eagerly — plan is the pinned read
    "scan_file_metadata": 0,
    # digest count + mark join (+ per-doc island window under AQE reuse)
    "text_substring_dedup": 2,
    # user rollup + 1-row moment fold
    "agg_delta_method_ci": 2,
    # bin-keyed equi join + DISTINCT/rollup pair
    "join_interval_overlap_agg": 2,
    # pure Arrow map decode chain — zero shuffles, like every codec entry
    "multimodal_ico": 0,
    # daily rollup + per-type window + max join + final rollup
    "window_drawdown": 4,
    # manifest arithmetic + checkpointed snapshot aggregate
    "format_orphan_audit": 0,
    # greedy loop is checkpointed; the returned frame is the pinned picks
    "sim_mmr_rerank": 0,
    # bounded hourly rollup checkpointed once; flagging is row-local
    "ts_anomaly_seasonal": 1,
    # Gram cells + iterations all checkpointed (d² constant-size tables)
    "sim_pca_power": 0,
    # cell rollup + the distinct-count expansion
    "scalar_geohash": 2,
    # observe metrics ride the scan; the returned row is driver-built
    "scan_observe_metrics": 0,
    # two-level bitmap rollup: bucket OR + priority popcount-sum
    "agg_bitmap_distinct": 2,
    # SNM: ONE sorted-window pass (the block partition), lead() columns,
    # row-local distance — no pair join anywhere
    "dedup_sorted_neighborhood": 1,
    # checked commits: the plan is the checkpointed snapshot rollup
    "format_constraint_check": 0,
    # peeled edge set checkpointed per round; final degree aggregate
    "graph_kcore": 2,
    # one session-window aggregate per user (dynamic gap is row-local)
    "window_session_dynamic": 1,
    # WAP: the returned frame is the checkpointed snapshot rollup
    "format_wap_publish": 0,
    # custom-format read checkpoints eagerly after the rollup
    "source_python_batch": 0,
    # the pandas front door compiles to the same single hash aggregate
    "api_pandas_on_spark": 1,
    # zone-exploded localization + one (zone, hour) rollup
    "scalar_timezone": 1,
    # char-class counting is row-local; one (lang, script) rollup
    "text_script_profile": 1,
    # shingle min-agg + first-occurrence join + doc rollup
    "text_novelty_rate": 2,
    # daily rollup + bounded trend window + seasonal agg + final join
    "ts_decompose": 4,
    # --- round 7 ---
    # the returned frame is the checkpointed final index read
    "dedup_state_table": 0,
    # per-file record walk is mapInPandas over binaryFile; frame is
    # checkpointed after the projection
    "source_warc": 0,
    # checkpointed manifest rollup over the written shard directories
    "pipeline_shard_export": 2,
    # single hash aggregate with argmax/argmin structs — no window
    "pipeline_preference_pairs": 1,
    # per-distinct-value agg + per-type ordered window
    "agg_mann_whitney": 2,
    # per-user agg + per-lifetime agg + two global ordered windows over
    # |distinct lifetimes| rows
    "agg_survival_km": 4,
    # per-(source, score) agg + per-source ordered window
    "text_auc_eval": 2,
    # daily rollup + the 14-day banded self-join on the rollup
    "ts_ewma_decay": 2,
    # row-local packing; broadcast query set; one top-k window
    "sim_binary_quant": 1,
    # zero-shuffle Arrow decode chain
    "multimodal_png_palette": 0,
    # pure projection — whole-stage codegen end to end
    "scalar_uuid3": 0,
    # SQL UDFs inline: the plan is one hash aggregate
    "api_sql_udf": 1,
    # one per-stratum ordered window over hash digests
    "sample_bottom_k": 1,
    # --- round 7 second wave ---
    # archive walks are mapInPandas over binaryFile; frames checkpoint
    # after the projection
    "source_webdataset": 0,
    "source_zip": 0,
    # custom-writer round trip checkpoints the final rollup
    "sink_python_batch": 0,
    # one (lang,doc,n,gram) agg per side + clip join (reuses the agg
    # partitioning) + per-(lang,n) rollup + lengths + final join
    "text_bleu_eval": 6,
    # zero-shuffle Arrow decode chains
    "multimodal_webp": 0,
    "multimodal_gif_interlaced": 0,
    "multimodal_bmp_rle": 0,
    # both mode reads aggregate to 1 row each; checkpointed union
    "source_csv_malformed": 0,
    # QI-class hash aggregate + 1-row summary broadcast
    "dq_k_anonymity": 3,
    # sparsified edge distinct + supplier-keyed self-join + pair agg +
    # two degree joins (AQE broadcasts the tiny degree sides at
    # runtime; the static bound counts the planned exchanges) + the
    # round-8 LIVE hub cap's per-via count aggregate feeding the
    # broadcast thinning filter (common_neighbor_pairs max_hub) — a
    # fixed +2 planned exchanges that buys O(deg²)→O(deg·cap)
    # candidate volume on mega-hubs
    "graph_link_prediction": 13,
    # --- round 9 ---
    # table-format entries return the checkpointed rollup read; the
    # streaming CDF entry returns the drained memory table
    "format_positional_deletes": 0,
    "format_cdf_read": 2,
    "format_multi_key_deletes": 0,
    "streaming_format_cdf": 0,
    # counter-grid agg (192 cells) + truth agg; the probe top-k is a
    # TakeOrdered, the counters attach by broadcast
    "agg_count_min": 2,
    # per-edge: one 1-row fact count + one 1-row orphan aggregate
    # (SinglePartition each), ×2 edges + the final union alignment;
    # both anti-joins broadcast the dimension key set
    "dq_referential_integrity": 6,
    # the returned frame is the checkpointed post-drain rollup read
    "streaming_format_upsert": 0,
    # --- round 10 ---
    # table-format entries return the checkpointed rollup read; the
    # streaming CDF-compaction entry returns the drained memory table
    "format_delete_compaction": 0,
    "format_dv_encoding": 0,
    "format_cdf_projected": 2,
    "format_txn_expiry": 0,
    "streaming_cdf_compaction": 0,
    "multimodal_srt_cues": 0,
    # one fact aggregate + arithmetic over the tiny cell/bin table
    # (the second exchange is the 1-row final agg / empty-frame window)
    "agg_cramers_v": 2,
    "agg_brier_decomposition": 2,
    "agg_cohens_d": 2,
    "agg_levene": 2,
    "agg_stump_split": 2,
    # cell histogram + margin windows + three 1-row aggs — all
    # post-aggregation exchanges over ≤ |X|·|Y| rows; ONE fact scan
    "agg_mutual_information": 6,
    "ts_peaks": 1,                  # one (type, ts) sort, agg fused
    "ts_intervals_merge": 2,        # (user) sort + bucket rollup
    "ts_cohort_retention": 2,       # user window + cohort agg
    "ts_bollinger": 2,              # daily agg + (type, day) sort
    "agg_winsorized_mean": 7,       # ranks.global_rank_prefix pass
    # (bounds + partials aggs + ONE parallel bucket exchange) + bounds
    "text_log_odds": 3,             # token agg + broadcast totals
    # (the grand total is a scalar agg, never a vocab-sized window)
    "text_anchor_extract": 2,       # host agg (+ distinct-doc pair)
    # residue-bounded edge distinct + swapped-pair semi-join + 1-row
    # aggs — every exchange is over the ≤211² edge domain
    "graph_reciprocity": 3,
    "graph_bipartite_projection": 2,  # pinned edge distinct + pair agg
    "dq_freshness": 3,              # per-type agg + 1-row watermark
    "dq_uniqueness": 2,             # key agg + per-type rollup
    # two-pass by contract (rates need global counts): count agg +
    # rate window + kept agg + rate re-join alignment
    "pipeline_rejection_sample": 5,
    "sql_distinct_on": 2,           # per-customer sort + rollup
    # --- round 10, wave 2 ---
    "format_vacuum_retention": 0,   # checkpointed rollup read
    "format_null_pruning": 0,       # two pruned scans, rollups fused
    "agg_cochran_q": 2,             # subject agg + 1-row totals
    # unpivot agg + per-item agg + prevalence agg + two 1-row sums —
    # all post-aggregation exchanges over ≤ |items|·|cats| rows
    "agg_fleiss_kappa": 5,
    "text_collocation_llr": 5,      # bigram agg + 2 margin windows
    # (hash-partitioned by word) + broadcast grand total
    # per-step conditional-min aggs on the user key (3 joins re-use
    # the same hash partitioning; AQE broadcasts the shrinking sides)
    "window_funnel": 6,
    "agg_rfm_segments": 20,         # per-customer agg + 3 bucketed
    # rank passes (bounds/partials are tiny-data exchanges) + 2 joins
    "source_ini": 2,                # parse rows agg + section rollup
    "dq_schema_drift": 5,           # six 1-row column profiles + join
    "multimodal_subtitle_align": 3,  # cue/frame sort + asof + rollup
    # --- round 10, wave 3 ---
    "agg_poisson_dispersion": 2,    # per-user agg + 1-row totals
    "pipeline_dataset_split": 2,    # split rollup (+ distinct pair)
    "scalar_popcount": 1,           # row-local bit ops, one rollup
    "sql_grouping_id": 1,           # one expand + grouping aggregate
    "format_manifest_metrics": 0,   # manifest-only, driver metadata
    "multimodal_webvtt_cues": 0,    # zero-shuffle decode chain
    # --- round 11: table-format front door + maintenance (all return
    # checkpointed rollups — the scratch-table work happens inside) ---
    "format_sql_read": 0,
    "format_binpack_compaction": 0,
    "format_bloom_pruning": 0,
    "format_replace_where": 0,
    # --- round 11: experiment/inference statistics ---
    "agg_jarque_bera": 1,           # one moment hash aggregate
    "agg_durbin_watson": 1,         # per-type series window + rollup
    "agg_grubbs": 3,                # moments + mean-cents + argmax join
    "agg_cuped": 2,                 # per-user agg + 1-row moments
    "agg_srm": 3,                   # distinct users + arm agg + 1-row
    "agg_power_two_proportions": 4,  # two distinct counts + 1-row
    "agg_bradley_terry": 4,         # pair agg checkpointed; MM joins
    "agg_gamma_moments": 1,         # one moment hash aggregate
    "agg_tukey_hsd": 4,             # moments + 1-row MSE + pair grid
    "agg_smape": 2,                 # daily agg + naive-lag window
    "agg_kendall_tau": 5,           # hourly agg + bounded pair join
    "agg_lognormal_fit": 1,         # one rounded-log moment aggregate
    # --- round 11: time series / windows ---
    "ts_vwap": 2,                   # daily agg + cumulative window
    "ts_rsi_cutler": 2,             # daily agg + SMA window
    "ts_lag_correlation": 3,        # hourly agg + shift join + moments
    "ts_hurst": 4,                  # daily agg + chunk join + cum + rs
    # price dedupe + bucket-local skyline + one candidate-merge pass
    # (round-12 two-phase shape; the extra exchange buys the parallel
    # phase-1 window)
    "window_pareto_front": 3,
    # --- round 11: SQL surface / scalar ---
    "sql_try_arithmetic": 1,        # row-local try_* + one rollup
    "scalar_semver": 1,             # struct-max per brand
    "scalar_time_bucket": 1,        # epoch bucket hash aggregate
    # --- round 11: DQ / pipeline ---
    "dq_cross_field": 2,            # rule battery + injected union
    "dq_volume_anomaly": 3,         # daily agg + 1-row moments + sort
    "pipeline_dataset_diff": 3,     # v2 derivation + full-outer + agg
    "pipeline_quality_routing": 1,  # row-local rules + one rollup
    # --- round 11: text / eval ---
    "text_rake_keywords": 6,        # phrase window + word stats joins
    "text_calibration_ece": 4,      # bin agg + 1-row total + order
    "text_pass_at_k": 2,            # task agg + 1-row macro average
    "text_sentence_stats": 0,       # row-local segmentation
    "text_markdown_strip": 0,       # row-local regex algebra
    "text_code_detect": 1,          # row-local features + one rollup
    "text_slop_score": 3,           # trigram agg + per-doc + decile
    # --- round 11: sources (row-local parse + rollups) ---
    "source_properties": 2,
    "source_toml": 1,
    "source_rss": 2,
    # --- round 11: multimodal (decode chains never shuffle) ---
    "multimodal_pcx": 0,
    "multimodal_sniff": 1,          # detected-type rollup
    "multimodal_ass_subtitles": 0,
    "multimodal_cur": 0,
    "multimodal_wav_markers": 0,
    # --- round 11: graph / similarity ---
    "graph_motif_ffl": 3,           # edges checkpointed; motif joins
    "graph_degree_tail": 2,         # df agg + parallel top-20 (no window)
    "sim_mips_transform": 1,        # corpus never shuffles; top-k window
    # --- round 12: SQL DML router (receipts are 1-row checkpoints) ---
    "format_sql_merge": 0,
    "format_sql_update": 0,
    "format_sql_delete": 0,
    "format_sql_insert": 0,
    # --- round 12: agreement / reliability statistics ---
    "agg_ccc": 1,                   # one moment aggregate
    "agg_icc": 4,                   # group agg + 1-row total + terms
    "agg_partial_correlation": 1,   # one moment aggregate
    "agg_vif": 1,                   # one moment aggregate
    "agg_effect_sizes": 4,          # group agg + 1-row total + terms
    "agg_youden_j": 4,              # bucket agg + bounded-domain scan
    "agg_cumulative_gains": 6,      # cents max + band agg + cum window
    # --- round 12: time series ---
    "ts_mase": 2,                   # daily agg + per-type lag windows
    "ts_pettitt": 2,                # daily agg + partitioned windows
    "ts_ema_crossover": 2,          # daily agg + per-type array fold
    # --- round 12: text / retrieval eval ---
    "text_mrr": 2,                  # per-source window + 1-row mean
    "text_wer": 2,                  # hyp re-assembly + per-lang mean
    "text_lang_vocab_overlap": 7,   # vocab distinct + bounded pair joins
    "text_rank_turbulence": 5,      # rank table checkpointed once
    # --- round 12: graph / similarity ---
    "graph_2hop_reach": 3,          # residue-bounded joins + topk
    "sim_ivf_balance": 2,           # cell assign + bounded histogram
    # --- round 12: sources / multimodal (row-local parse chains) ---
    "source_srec": 0,
    "source_fasta": 0,
    "source_mbox": 0,
    "multimodal_png_text": 0,
    "multimodal_ttf": 0,
    "multimodal_id3": 0,
    # --- round 12: scalar ---
    "scalar_base58": 2,             # one distinct + final aggregate
    # --- round-13 backlog (built in round 12) ---
    "format_sql_ref_read": 0,       # 1-row receipt checkpoint
    "agg_cmh": 2,                   # strata cells + 1-row pooled terms
    "agg_tost_equivalence": 2,      # two-group moments + cross
    "agg_hellinger": 4,             # type counts + 1-row totals + terms
    "ts_page_hinkley": 2,           # daily agg + partitioned prefix sums
    "dq_monotonicity": 3,           # per-user lag window + one rollup
    "graph_adamic_adar": 4,         # residue-bounded joins + topk
    "text_keyword_burstiness": 5,   # counts + top-5 + bounded join
    "sim_pq_distortion": 2,         # codebook broadcast + m-bounded agg
    "dedup_minhash_cardinality": 6, # vocab checkpointed once
    "multimodal_gif_comments": 0,
    "multimodal_ani": 0,
    "source_m3u": 0,
    "source_wkt": 0,
    "source_vcf": 0,
    "source_pcap": 0,
    "agg_weighted_kappa": 6,        # 25-row grid checkpointed once
    "scalar_isbn": 1,               # row-local digits + one aggregate
    "pipeline_stratified_kfold": 2, # fold agg + per-lang rollup
    "format_sql_optimize": 0,       # 1-row receipt checkpoint
    "multimodal_ico_png": 0,
    "agg_krippendorff_alpha": 8,    # 5-row coincidence domain
    "agg_beta_binomial": 2,         # two-arm counts + cross
    "ts_croston": 2,                # day spine + one array fold
    "multimodal_wav_info": 0,
    "format_sql_merge_cdc": 0,      # 1-row receipt checkpoint
    "text_burrows_delta": 3,        # grid + z checkpointed (15→3)
    "ts_entropy_rate": 3,           # lead window + bounded cells
    "source_robots_txt": 0,
    "multimodal_apng": 0,
    "join_asof_tolerance": 2,       # per-user asof + one rollup
    "graph_modularity": 4,          # edges checkpointed; c-bounded
    "agg_simpson_diversity": 3,     # per-user counts + 1-row mean
    "multimodal_flac_tags": 0,
    "multimodal_edid": 0,
    "source_gff3": 0,
    "source_obj": 0,
    "multimodal_stl": 0,
    "agg_circular_stats": 2,        # hour buckets + per-type rollup
    "dedup_lsh_tuning_curve": 0,    # pure expression math
    "scalar_roman": 2,              # one distinct + final aggregate
    # --- round 13: the ex-unpartitioned-window family, now on
    # operators.ranks.global_rank_prefix (each pass = bounds agg +
    # partials agg + ONE parallel bucket exchange; only that last one
    # moves data-proportional rows) or the orderBy().limit(k) recipe ---
    "text_heaps_law": 14,           # rank/prefix pass + checkpoint legs
    "text_zipf_fit": 1,             # top-100 TakeOrderedAndProject
    "text_pmi_cooccur": 6,          # top-12 prune + pair agg + 1-row n
    "sim_rrf_fusion": 12,            # 2 dense rank passes + fusion joins
    "agg_lorenz_points": 5,         # one rank/prefix pass + decile join
    "agg_bh_fdr": 15,                # two rank passes (fwd rank, rev min)
    "dq_sequence_gaps": 11,          # rank pass + adjacent-rank join
    "graph_rich_club": 21,          # residue-bounded legs + 1-row aggs
    # --- round 13: pinning the 22 window entries the round-12 close
    # left without a budget (SCALE.md §33.5 completeness) ---
    "format_update_where": 0,       # checkpointed commit receipt read
    "format_history": 0,            # checkpointed history read
    "format_changes_sql": 0,        # checkpointed CDF read
    "streaming_update_cdf": 0,      # checkpointed micro-batch result
    "ts_granger_1lag": 3,           # hourly agg + join + 1-row moments
    "ts_theil_u2": 2,               # daily agg + per-type rollup
    "ts_interarrival": 1,           # per-(type,ts) sort, agg fused
    "ts_seasonality_strength": 6,   # daily/dow/overall aggs + joins
    "agg_mcc": 1,                   # per-user agg, 1-row confusion
    "agg_negative_binomial": 2,     # per-user counts + 1-row moments
    "text_mattr": 4,                # segment agg + per-doc + per-lang
    "window_ratio_to_report": 2,    # 25-row segment×tier aggregate
    "scalar_ulid": 0,               # row-local encode/decode
    "source_arff": 2,               # parsed-rows agg + rollup
    "source_intel_hex": 0,          # checkpointed record walk
    "multimodal_dds_meta": 0,       # checkpointed header walk
    "streaming_sql_insert_tail": 0,  # checkpointed tail drain
    "streaming_tail_schema_evolution": 0,  # checkpointed tail drain
    "streaming_sql_update_cdf": 0,  # checkpointed CDF drain
    # --- round 13: new entries ---
    "format_sql_merge_full_sync": 0,  # checkpointed receipt read
    # band-bucket explode + distinct + verify join + 2 scalar evals
    "dedup_planted_eval": 6,  # r16: recursive count across the minhash verify pin
    # rank pass (bounds + partials + bucket exchange) + 4-row rollup
    "pipeline_curriculum_order": 6,
    # per-source moments + k-row second stage + broadcast back
    "agg_james_stein": 3,
    "ts_holt_winters": 2,           # daily agg + per-type series fold
    # model agg + rank pass (bounds/partials) + 2 broadcast scalars
    "agg_conformal_interval": 12,  # r16: recursive count across the rank-prefix pin
    "source_bencode": 0,            # row-local synth + parse chain
    "format_rename_column": 0,      # checkpointed receipt read
    "format_sql_rename": 0,         # checkpointed receipt read
    # word-keyed BPE encode join + per-doc agg + lang rollup
    "pipeline_tokenizer_fertility": 8,
    "format_widen_column": 0,       # checkpointed receipt read
    # two rank passes + harmonic-number scalar + broadcast joins
    "agg_by_fdr": 27,
    # moments agg + SSE agg + TakeOrderedAndProject top-10
    "agg_cooks_distance": 3,
    "format_sql_select": 0,         # checkpointed result read
    "scalar_morton": 2,             # row-local bit folds + final agg
    # block-keyed equi-join (phonetic key × id bucket) + scalar evals
    "join_soundex_blocking": 2,
    # round-14 additions (measured at sf0.001, gate planner state):
    # per-doc chunk window (doc-bounded) + chunk digest agg + corpus
    # stats + the n_docs scalar leg
    "dedup_cdc_chunking": 4,
    "agg_bartlett": 1,              # one exact-moment pivot aggregate
    "format_sql_time_travel": 0,    # checkpointed receipt read
    "format_sql_ctas": 0,           # checkpointed re-read of the CTAS
    "format_rename_incremental": 0,  # checkpointed summary row
}


#: Round-14 coverage completion: measured final-adaptive-plan exchange
#: counts for every catalog entry NOT hand-budgeted above, generated by
#: ``scripts/gen_shuffle_budgets.py`` at sf0.001 under the gate's
#: planner state (AQE on, 10 MB broadcast threshold).  These are
#: empirical upper bounds that (a) pin plan regressions and (b) put the
#: WHOLE catalog under the generic SinglePartition-window gate below —
#: previously it audited only the hand-budgeted 319/625.  Regenerate
#: with the script after intentional plan changes.
_SHUFFLE_BUDGET_AUTO = {
    'agg_anova': 1,
    # r16: +1 planned exchange (split exact/HLL aggregates + group-key
    # join) buys sketch-per-status instead of sketch-per-customer in
    # the distinct stages — the join side is 3 rows, AQE broadcasts it
    'agg_approx_distinct': 3,
    'agg_approx_quantile_bound': 3,
    'agg_benford': 2,
    'agg_bootstrap_ci': 3,
    'agg_capture_recapture': 1,
    'agg_cms_heavy_hitters': 2,
    'agg_cohens_kappa': 1,
    'agg_correlation': 1,
    'agg_cronbach_alpha': 1,
    'agg_cube': 1,
    'agg_distinct': 2,
    'agg_filtered': 1,
    'agg_friedman': 5,
    'agg_gini': 1,
    'agg_grouping_sets': 1,
    'agg_herfindahl': 4,
    'agg_histogram': 1,
    'agg_hll_sketch': 4,
    'agg_hodges_lehmann': 2,
    'agg_kmv_sketch': 4,
    'agg_kruskal_wallis': 7,
    'agg_ks_drift': 2,
    'agg_mcnemar': 2,
    'agg_odds_ratio': 1,
    'agg_percentiles': 1,
    'agg_pivot': 2,
    'agg_psi': 2,
    'agg_pythagorean_means': 1,
    'agg_rollup': 1,
    'agg_runs_test': 3,
    'agg_salted': 2,
    'agg_spearman': 1,
    'agg_sprt': 2,
    'agg_stats': 1,
    'agg_theil_index': 2,
    'agg_trimmed_mean': 1,
    'agg_unpivot': 1,
    'agg_var_cvar': 2,
    'agg_wilson_ci': 1,
    'anomaly_mad': 3,
    'changelog_compact': 1,
    'cohort_retention': 8,
    'customer_distribution': 2,
    'dedup_components': 6,
    'dedup_containment': 2,
    'dedup_embedding': 2,
    'dedup_embedding_capped': 3,
    'dedup_exact': 1,
    'dedup_fingerprint': 1,
    'dedup_incremental': 2,
    'dedup_jaccard_prefix': 3,
    'dedup_minhash_star': 3,  # r15: pin_verify
    'dedup_ngram_jaccard': 2,  # r16: shingle explode + sizes pinned once
    'dedup_recall_eval': 8,
    'dedup_simhash': 0,
    'dedup_simhash_pairs': 1,
    'discounted_brand_revenue': 1,
    'dq_expectations': 4,
    'dq_l_diversity': 5,
    'dq_outlier_fences': 2,
    'dq_profile': 2,
    'dq_t_closeness': 4,
    'excess_suppliers': 3,
    'filter_project': 0,
    'forecast_revenue': 1,
    'format_branch_tag': 0,
    'format_cluster_evolution': 0,
    'format_delete_vectors': 0,
    'format_expire_snapshots': 0,
    'format_incremental_read': 0,
    'format_merge_upsert': 0,
    'format_partition_evolution': 0,
    'format_rename_then_merge': 0,
    'format_row_lineage': 0,
    'format_schema_evolution': 0,
    'format_shallow_clone': 0,
    'format_snapshot_read': 0,
    'format_stats_pruning': 0,
    'format_zorder_3d': 0,
    'format_zorder_pruning': 0,
    'funnel_steps': 6,
    'graph_assortativity': 4,
    'graph_bfs': 11,
    'graph_clustering': 4,
    'graph_hits': 11,
    'graph_label_propagation': 0,
    'graph_pagerank': 13,
    'graph_ppr': 13,
    'graph_triangles': 3,
    'idle_customers': 2,
    'important_stock': 3,
    'join_anti': 0,
    'join_asof': 1,
    'join_asof_nearest': 1,
    'join_bloom_prefilter': 3,
    'join_inner': 1,
    'join_interval_binned': 2,
    'join_null_safe': 2,
    'join_outer': 1,
    'join_point_in_polygon': 1,
    'join_salted': 2,
    'join_semi': 0,
    'join_skew_aqe': 3,
    'join_theta_range': 1,
    'large_volume_orders': 1,
    'local_supplier_volume': 1,
    'market_share': 1,
    'markov_transitions': 3,
    'merge_upsert_sequenced': 2,
    'min_cost_supplier': 1,
    'multimodal_aiff': 0,
    'multimodal_au': 0,
    'multimodal_audio_features': 0,
    'multimodal_audio_resample': 0,
    'multimodal_bmp': 0,
    'multimodal_decode': 0,
    'multimodal_dedup_phash': 1,
    'multimodal_frames': 0,
    'multimodal_gif_frames': 0,
    'multimodal_gif_stats': 0,
    'multimodal_jpeg_420': 0,
    'multimodal_jpeg_color': 0,
    'multimodal_jpeg_progressive': 0,
    'multimodal_jpeg_stats': 0,
    'multimodal_meta': 2,
    'multimodal_midi_meta': 0,
    'multimodal_mkv_meta': 0,
    'multimodal_mp4_meta': 0,
    'multimodal_netpbm': 0,
    'multimodal_ogg_meta': 0,
    'multimodal_phash_near': 1,
    'multimodal_pixel_stats': 0,
    'multimodal_qoi': 0,
    'multimodal_quarantine': 0,
    'multimodal_resize': 0,
    'nation_volume': 1,
    'pipeline_chunk_overlap': 0,
    'pipeline_corpus_prep': 2,
    'pipeline_entity_resolution': 9,
    'pipeline_pretrain_mix': 11,  # r16: dd + picked pinned once (multi-consumer)
    'pipeline_video_prep': 2,
    'priority_wait': 2,
    'product_profit': 2,
    'promo_revenue': 1,
    'returned_items': 1,
    'scalar_array': 0,
    'scalar_bitwise': 0,
    'scalar_conditional': 0,
    'scalar_date': 0,
    'scalar_json': 2,
    'scalar_luhn': 0,
    'scalar_map': 0,
    'scalar_math': 0,
    'scalar_string': 0,
    'scalar_try': 0,
    'scalar_url': 0,
    'scalar_variant': 1,
    'scan_dpp_join': 2,
    'scan_parquet_footer': 0,
    'scan_partition_pruned': 1,
    'set_ops': 3,
    'set_ops_all': 2,
    'shipmode_priority': 2,
    'sim_ann_lsh': 1,
    'sim_ann_multiprobe': 1,
    'sim_centroid_classify': 4,
    'sim_cluster_eval': 32,
    'sim_ivf_assign': 0,
    'sim_ivf_search': 9,
    'sim_kmeans_refine': 6,
    'sim_nn_descent': 7,  # r16: seeded kNN graph pinned once (4 consumers)
    'sim_pairs_blocked': 0,
    'sim_pq_encode': 1,
    'sim_pq_search': 3,
    'sim_range_search': 0,
    'sim_recall_eval': 5,
    'sim_semantic_decontaminate': 3,
    'sim_silhouette': 1,
    'sim_sq_encode': 0,
    'sim_sq_search': 1,
    'sim_topk_filtered': 1,
    'sink_clustered': 0,
    'sink_compaction': 0,
    'sink_partition_overwrite': 0,
    'sink_python_stream': 0,
    'sink_time_travel': 0,
    'small_qty_revenue': 3,
    'snapshot_diff': 2,
    'snapshot_roundtrip': 2,
    'snapshot_scan': 0,
    'source_bson': 0,
    'source_csv': 2,
    'source_dbf': 0,
    'source_eml': 0,
    'source_gzip': 0,
    'source_ics': 0,
    'source_json': 2,
    'source_logfmt': 0,
    'source_orc': 2,
    'source_parquet_evolved': 1,
    'source_pdf': 0,
    'source_protobuf': 0,
    'source_sqlite': 0,
    'source_xlsx': 0,
    'sql_cte_window': 1,
    'sql_lateral': 2,
    'sql_qualify': 1,
    'sql_recursive_cte': 0,
    'stream_dedup_batch': 2,
    'streaming_avro_ingest': 0,
    'streaming_binpack_silence': 0,
    'streaming_bson_ingest': 0,
    'streaming_changelog_upsert': 0,
    'streaming_dedup': 0,
    'streaming_dual_sink': 0,
    'streaming_enrichment': 0,
    'streaming_fanin_union': 0,
    'streaming_fidelity_snapshot': 0,
    'streaming_format_maintenance': 0,
    'streaming_format_tail': 0,
    'streaming_interval_join': 0,
    'streaming_interval_join_full': 0,
    'streaming_interval_join_outer': 0,
    'streaming_protobuf_ingest': 0,
    'streaming_running_totals': 0,
    'streaming_scd2_build': 0,
    'streaming_session_agg': 0,
    'streaming_session_agg_update': 0,
    'streaming_session_dynamic': 0,
    'streaming_state_inspect': 0,
    'streaming_tail_rate_limit': 0,
    'streaming_timeout_sessions': 0,
    'streaming_timeout_sessions_tws': 0,
    'streaming_topk': 0,
    'streaming_warc_ingest': 0,
    'streaming_window_agg': 0,
    'subquery_correlated': 1,
    'supplier_cnt': 4,
    'text_bigram_lm': 3,
    'text_bm25_rank': 5,
    'text_bpe_train': 6,
    'text_chrf_eval': 4,
    'text_chunk_dedup': 2,
    'text_doc_keywords': 5,
    'text_edit_distance': 0,
    'text_feature_hash': 1,
    'text_fingerprint': 1,
    'text_hapax_rate': 2,
    'text_html_tables': 0,
    'text_js_divergence': 4,
    'text_langid': 0,
    'text_langid_eval': 1,
    'text_lm_heldout_eval': 3,
    'text_macro_f1': 19,
    'text_mixture_sample': 4,
    'text_ndcg_eval': 16,
    'text_pack_sequences': 1,
    'text_pack_stats': 1,
    'text_pii_scrub': 0,
    'text_quality': 0,
    'text_quality_train': 4,
    'text_readability': 0,
    'text_repetition': 0,
    'text_rouge_eval': 2,  # r15: one gram agg, no clip join
    'text_sample_split': 1,
    'text_source_overlap': 9,
    'text_stratified_sample': 1,
    'text_token_stats': 0,
    'text_unigram_logprob': 2,
    'text_vocab_coverage': 4,
    'text_winnow': 0,
    'top_supplier': 3,
    'ts_autocorr': 2,
    'ts_changepoint': 2,
    'ts_dtw': 4,
    'ts_gapfill': 3,
    'ts_holt_linear': 2,
    'ts_interpolate': 2,
    'ts_ljung_box': 2,
    'ts_mann_kendall': 9,
    'ts_motif': 4,
    'ts_pacf': 2,
    'ts_rolling_corr': 3,
    'ts_sax': 2,
    'ts_seasonal_profile': 5,
    'udaf_grouped': 1,
    'udf_grouped_map': 1,
    'udf_vectorized': 0,
    'udtf_tokenize': 0,
    'waiting_suppliers': 2,
    'window_distribution': 1,
    'window_ewma': 1,
    'window_first_last': 1,
    'window_lag_lead': 1,
    'window_pattern_negation': 1,
    'window_range_frame': 2,
    'window_rank_distribution': 1,
    'window_ranks': 1,
    'window_running': 1,
    'window_session': 1,
    'window_sessionize': 1,
    'window_sliding': 1,
    'window_streaks': 2,
    'window_tumbling': 1,
    'window_zscore': 1,
    'zorder_key': 1,
}


#: entries allowed to keep an ``Exchange SinglePartition`` feeding a
#: WindowExec on input the textual bounded-markers can't prove bounded —
#: each with the reason the input is NOT data-row-proportional.  This is
#: the explicit allowlist of the generic gate below; add entries only
#: with a bounded-input argument, never for convenience.
_GLOBAL_WINDOW_OK: dict[str, str] = {
    # phase-2 merge of per-bucket local skyline fronts: candidate set is
    # bucket-bounded (test_pareto_front_is_two_phase pins the shape)
    "window_pareto_front": "merged local fronts, bucket-bounded",
    # single LAG over the hourly rollup — calendar-grain-bounded input
    # (one row per hour, never one per event)
    "ts_granger_1lag": "hourly series, calendar-grain-bounded",
    # SUM() OVER () across per-(segment, tier) aggregates — value-
    # bounded input (5 segments × 5 tiers = 25 rows)
    "window_ratio_to_report": "segment×tier aggregate, value-bounded",
    # windows over per-bin/contingency aggregates: input cardinality is
    # the number of DISTINCT cells (bins, enum pairs, categories, score
    # buckets, day-grain lifetimes) — never one row per fact-table row
    "agg_brier_decomposition": "probability-band histogram, bin-bounded",
    "agg_chi_square": "priority×status contingency, enum-bounded",
    "agg_cramers_v": "contingency cells, enum-bounded",
    "agg_cumulative_gains": "score-band gains table, bin-bounded",
    "agg_fleiss_kappa": "per-category coincidence rows, enum-bounded",
    "agg_levene": "per-group spread aggregate, group-bounded",
    "agg_mutual_information": "x×y contingency cells, enum-bounded",
    "agg_stump_split": "distinct-threshold histogram, value-bounded",
    "agg_survival_km": "per-lifetime rows, day-grain-bounded",
    "agg_youden_j": "ROC bucket table, bin-bounded",
    "pipeline_rejection_sample": "per-source rate rows, source-bounded",
    # round-14 sweep of the previously-unbudgeted 306 entries: 3 hits,
    # each with a bounded-input argument verified against the code
    "agg_kruskal_wallis": "rank window over the per-value histogram "
    "(value-bounded tie groups), not per-row",
    "window_range_frame": "calendar-grain daily rollup — one row per "
    "day, never one per event",
    "text_vocab_coverage": "global rank window fed by the Arrow "
    "mapInPandas per-partition top-k pre-prune (operators/text.py::"
    "vocab_coverage) — at most partitions×4k candidate rows",
}

#: subtree markers that prove the exchange input is bounded: a
#: materialized tiny frame (checkpointed partials/histograms — the
#: operators.ranks discipline), a pruned top-k/limit, a per-partition
#: pre-limited window feed, or a literal/local relation.
_BOUNDED_MARKERS = (
    "Scan ExistingRDD",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "GlobalLimit",
    "CollectLimit",
    "LocalTableScan",
)

#: pass-through physical nodes between an exchange and the operator that
#: required its distribution
_PASS_THROUGH = (
    # trailing space/bracket: "Sort " must not swallow SortAggregate /
    # SortMergeJoin consumers (those are NOT windows — skipping them
    # would mislabel the next ancestor)
    "Sort ",
    "Sort[",
    "Project ",
    "Project[",
    "Filter ",
    "Filter(",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
)


def _global_window_violations(plan: str) -> list[str]:
    """Every ``Exchange SinglePartition`` whose consumer is a Window and
    whose input subtree carries no bounded-input marker — the canonical
    100 TB scale-killer (the whole data-proportional input moves to ONE
    task).  Returns the offending exchange lines."""
    lines = plan.split("\n")

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-|*"))

    viol = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        ei = indent(line)
        # nearest non-pass-through ancestor = the distribution consumer
        cur, anc = ei, None
        for j in range(i - 1, -1, -1):
            if not lines[j].strip() or indent(lines[j]) >= cur:
                continue
            node = lines[j].lstrip(" :+-|*")
            cur = indent(lines[j])
            if not node.startswith(_PASS_THROUGH):
                anc = node
                break
        if anc is None or not anc.startswith("Window"):
            continue
        sub = []
        for k in range(i + 1, len(lines)):
            if lines[k].strip() and indent(lines[k]) <= ei:
                break
            sub.append(lines[k])
        if not any(m in "\n".join(sub) for m in _BOUNDED_MARKERS):
            viol.append(line.strip())
    return viol


#: hand-written + generated budgets — together they cover EVERY catalog
#: entry, so the generic window gate below audits the whole catalog
#: (asserted by test_budget_covers_whole_catalog).
_ALL_BUDGETS = {**_SHUFFLE_BUDGET_AUTO, **_SHUFFLE_BUDGET}


def test_budget_covers_whole_catalog():
    missing = sorted(set(catalog.QUERIES) - set(_ALL_BUDGETS))
    assert not missing, (
        f"{len(missing)} catalog entries have no shuffle budget — run "
        f"scripts/gen_shuffle_budgets.py and add them: {missing[:10]}…"
    )


@pytest.mark.parametrize("name", sorted(_ALL_BUDGETS))
def test_shuffle_budget(stats_planner, sf_dir, name):
    # round-16: the count recurses into lazily-checkpointed subtrees
    # (plan_exchange_count), so a shuffle regression UPSTREAM of a
    # round-15 pin fails the gate instead of hiding behind truncated
    # lineage; budgets below are re-pinned against the recursive count
    n, plan = plan_exchange_count(
        catalog.QUERIES[name], stats_planner, sf_dir
    )
    assert n <= _ALL_BUDGETS[name], (
        f"{name}: {n} shuffle exchanges (incl. lazily pinned subtrees) "
        f"> budget {_ALL_BUDGETS[name]}\n{plan}"
    )
    # the window gate below also scans the pinned subtrees (each is a
    # separate rendered tree; the separator line carries no Exchange)
    # generic unpartitioned-window gate (round-13): no SinglePartition
    # exchange may feed a WindowExec on data-proportional input — the
    # class behind graph_degree_tail/window_pareto_front and the 11
    # round-12 perf-weak marks.  Bounded inputs (checkpointed partials,
    # post-prune candidate sets, pre-limited window feeds) pass via
    # _BOUNDED_MARKERS; anything else needs a reasoned allowlist row.
    if name not in _GLOBAL_WINDOW_OK:
        bad = _global_window_violations(plan)
        assert not bad, (
            f"{name}: Exchange SinglePartition feeds a Window on input "
            f"not provably bounded ({bad}) — rewrite on "
            f"operators.ranks.global_rank_prefix or the orderBy().limit"
            f"(k) recipe, or allowlist with a bounded-input reason\n"
            f"{plan}"
        )


def test_budget_gate_sees_shuffles_behind_lazy_pins(stats_planner, sf_dir):
    """Deliberate-mutation proof (VERDICT r15 item #3): a shuffle added
    UPSTREAM of a lazy localCheckpoint is invisible to the final plan's
    exchange count (lineage truncation) but MUST be visible to
    plan_exchange_count — otherwise the round-15 pins would let shuffle
    regressions through the budget gate silently."""
    from pyspark.sql import functions as F

    def pinned_with_hidden_shuffle(spark, _sf):
        base = spark.range(1000).withColumn("g", F.col("id") % 7)
        agg = base.groupBy("g").count()  # one hashpartitioning exchange
        pinned = agg.localCheckpoint(eager=False)  # hides it
        return pinned.select(F.sum("count").alias("s"))

    # the final plan alone sees only the post-pin scalar aggregate
    with capture_lazy_pins():
        flat = _final_plan(
            pinned_with_hidden_shuffle(stats_planner, sf_dir)
        )
    n_flat = _count_exchanges(flat)
    n_rec, _ = plan_exchange_count(
        pinned_with_hidden_shuffle, stats_planner, sf_dir
    )
    assert n_rec > n_flat, (flat, n_rec)
    assert n_rec >= 1  # the hidden groupBy exchange is counted


@pytest.mark.parametrize(
    "name", ["shipping_priority", "order_limit_topk", "sample_weighted"]
)
def test_topk_never_global_sorts(stats_planner, sf_dir, name):
    plan = _final_plan(catalog.QUERIES[name](stats_planner, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_degree_tail_has_no_global_window(stats_planner, sf_dir):
    """Round-12 fix of the round-11 perf-weak mark: the top-20 tail
    selection must be TakeOrderedAndProject (parallel partial top-k),
    NEVER a row_number() over an unpartitioned window — which would
    move the entire data-proportional word-frequency table to one
    task."""
    plan = _final_plan(
        catalog.QUERIES["graph_degree_tail"](stats_planner, sf_dir)
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, (
        f"graph_degree_tail regained a window:\n{plan}"
    )


def test_pareto_front_is_two_phase(stats_planner, sf_dir):
    """Round-12 fix of the round-11 perf-weak mark: the skyline must
    run the standard two-phase shape — a PARTITIONED (hash-bucketed)
    window computing local fronts in parallel, and only the merged
    candidate set crossing the one single-partition boundary.  An
    unpartitioned window directly over the distinct-price domain
    would show as a SinglePartition exchange feeding the FIRST window
    with no hash-partitioned window anywhere."""
    plan = _final_plan(
        catalog.QUERIES["window_pareto_front"](stats_planner, sf_dir)
    )
    assert plan.count("Window") == 2, plan
    # phase 1 runs under a hash partitioning on the bucket column
    assert re.search(r"Exchange hashpartitioning\(b#", plan), plan
    # exactly one global boundary — the merge of local fronts
    assert plan.count("Exchange SinglePartition") == 1, plan


def _t_events(spark, sf_dir):
    from table_streaming_source_spark.plans.common import t

    return t(spark, sf_dir, "events")


def test_partition_pruning_reaches_the_scan(stats_planner, sf_dir):
    """scan_partition_pruned must prune at directory level: the scan node
    carries the event_type predicate as a PartitionFilter and reads only
    the matching partition directory."""
    df = catalog.QUERIES["scan_partition_pruned"](stats_planner, sf_dir)
    # sparkPlan: pre-AQE physical tree (the adaptive wrapper hides its
    # children until execution)
    scan = next(
        n.toString()
        for n in _walk(df._jdf.queryExecution().sparkPlan())
        if "Scan" in n.nodeName() and "parquet" in n.toString().lower()
    )
    assert "PartitionFilters: [" in scan and "event_type" in scan.split(
        "PartitionFilters:"
    )[1].split("]")[0], scan
    # the pruned scan reads exactly the one matching partition directory
    n_parts = catalog.QUERIES["scan_partition_pruned"](
        stats_planner, sf_dir
    ).count()
    flat = (
        _t_events(stats_planner, sf_dir)
        .filter("event_type = 'purchase'")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_parts == flat


def test_binned_band_join_avoids_cartesian(stats_planner, sf_dir):
    """join_interval_binned's bin rewrite must execute as a hash/merge
    equi-join on the bin — never a CartesianProduct or
    BroadcastNestedLoopJoin, which is what the raw band predicate would
    plan as."""
    plan = _final_plan(
        catalog.QUERIES["join_interval_binned"](stats_planner, sf_dir)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_vocab_coverage_prunes_before_global_window(stats_planner, sf_dir):
    """text_vocab_coverage's global rank window is single-partition by
    nature; the fix that makes it survive a web-scale vocabulary is the
    narrow per-partition top-k pre-prune (MapInPandas, zero extra
    exchange) BETWEEN the token aggregate and the window, so the single
    ordered partition carries at most partitions × k candidate rows.
    This gate fails if the window ever consumes the raw vocabulary
    aggregate again (round-4 weak mark)."""
    plan = _final_plan(
        catalog.QUERIES["text_vocab_coverage"](stats_planner, sf_dir)
    )
    # top-down tree print: Window above its child chain.  The ordered
    # single-partition exchange must sit ABOVE MapInPandas, which must
    # sit ABOVE the token-count HashAggregate.
    i_win = plan.index("Window")
    i_map = plan.index("MapInPandas")
    i_agg = plan.index("HashAggregate", i_map)
    assert i_win < i_map < i_agg, plan


def test_dpp_reaches_the_partitioned_scan(stats_planner, sf_dir):
    """scan_dpp_join must plan RUNTIME partition pruning: the fact
    scan's PartitionFilters carry a dynamicpruning expression fed by
    the dim's build-side keys (unknowable at plan time — the static
    twin scan_partition_pruned proves the literal form)."""
    df = catalog.QUERIES["scan_dpp_join"](stats_planner, sf_dir)
    scan = next(
        n.toString()
        for n in _walk(df._jdf.queryExecution().sparkPlan())
        if "Scan" in n.nodeName() and "parquet" in n.toString().lower()
    )
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "dynamicpruning" in pf.lower(), scan


def test_metadata_only_scan_pushes_the_aggregates(stats_planner, sf_dir):
    """scan_metadata_only must answer from parquet footers: with
    aggregate pushdown on the DSv2 scan, the BatchScan's OUTPUT SCHEMA
    becomes the aggregate list itself (count/min/max columns, no data
    columns) — zero data pages read.  The entry eagerly checkpoints, so
    the gate rebuilds the plan under the same scoped confs."""
    pushdown_key = "spark.sql.parquet.aggregatePushdown"
    v1_key = "spark.sql.sources.useV1SourceList"
    old_push = stats_planner.conf.get(pushdown_key, None)
    old_v1 = stats_planner.conf.get(v1_key, None)
    stats_planner.conf.set(pushdown_key, "true")
    stats_planner.conf.set(v1_key, "")
    try:
        from pyspark.sql import functions as F

        df = (
            stats_planner.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("l_orderkey").alias("min_key"),
                F.max("l_orderkey").alias("max_key"),
                F.min("l_extendedprice").alias("min_price"),
                F.max("l_extendedprice").alias("max_price"),
            )
        )
        plan = _final_plan(df)
        scan_line = next(
            l for l in plan.splitlines() if "BatchScan" in l
        )
        assert "count(*)" in scan_line and "min(l_orderkey)" in scan_line, (
            scan_line
        )
        # no raw data column in the scan output
        assert "l_extendedprice#" not in scan_line.split("ParquetScan")[0], (
            scan_line
        )
    finally:
        for key, old in ((pushdown_key, old_push), (v1_key, old_v1)):
            if old is None:
                stats_planner.conf.unset(key)
            else:
                stats_planner.conf.set(key, old)
