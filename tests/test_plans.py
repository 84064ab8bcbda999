"""Plan-shape tests: the promises that matter at 100 TB — pushdown, column
pruning, broadcast dims, and no row-at-a-time Python UDFs in hot paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xena_gdc_etl_spark.catalog import Catalog
from xena_gdc_etl_spark.plans import (
    formatted_plan,
    has_pushed_filter,
    python_udf_count,
    scan_read_schema,
    uses_broadcast_join,
)
from xena_gdc_etl_spark.workload import QUERIES


def test_search_filter_pushes_predicates(spark, sf_dir):
    df = QUERIES["search_filter"](spark, sf_dir)
    assert has_pushed_filter(df, "l_returnflag")


def test_search_filter_prunes_columns(spark, sf_dir):
    df = QUERIES["search_filter"](spark, sf_dir)
    read = scan_read_schema(df)
    assert "l_extendedprice" not in read
    assert "l_returnflag" in read


def test_q1_prunes_unused_columns(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    read = scan_read_schema(df)
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_project_info_broadcasts_dims(spark, sf_dir):
    df = QUERIES["project_info"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_keep_samples_semi_join_not_inner(spark, sf_dir):
    plan = formatted_plan(QUERIES["keep_samples"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_no_python_udfs_in_relational_queries(spark, sf_dir):
    for name in [
        "q1_pricing_summary",
        "sample_matrix",
        "survival_transform",
        "dedup_exact",
        "dedup_minhash",
        "token_count",
        "text_quality",
        "lang_id",
        "doc_fingerprint",
        "sessionize",
    ]:
        assert python_udf_count(QUERIES[name](spark, sf_dir)) == 0, name


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE only reports codegen spans in the finalized plan
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "codegen id" in formatted_plan(df)


def test_projection_ops_have_zero_shuffles(spark, sf_dir):
    # pure row-wise ops must not exchange: quantization, struct flattening,
    # split assignment (before any aggregation)
    from xena_gdc_etl_spark.operators.sampling import split_assign
    from xena_gdc_etl_spark.operators.similarity import quantize_int8

    cat = Catalog(spark, sf_dir)
    for df in [
        quantize_int8(cat.embeddings),
        split_assign(cat.documents, "doc_id"),
        QUERIES["flatten_props"](spark, sf_dir),
    ]:
        assert "Exchange" not in formatted_plan(df)


def test_train_split_reads_only_needed_columns(spark, sf_dir):
    read = scan_read_schema(QUERIES["train_split"](spark, sf_dir))
    assert "text" not in read  # the fat column stays unread


def test_doc_repetition_zero_shuffle_pure_codegen(spark, sf_dir):
    from xena_gdc_etl_spark.operators.text import repetition_scores
    from xena_gdc_etl_spark.plans import shuffle_count

    # the OPERATOR is shuffleless scan-stage codegen; the registered query
    # adds exactly one round-robin spread for local scan parallelism
    op = repetition_scores(Catalog(spark, sf_dir).documents)
    assert shuffle_count(op) == 0
    df = QUERIES["doc_repetition"](spark, sf_dir)
    assert shuffle_count(df) <= 1
    assert python_udf_count(df) == 0


def test_contamination_broadcasts_test_grams(spark, sf_dir):
    # the train side must probe a broadcast of the held-out gram set, never
    # shuffle on the gram key
    df = QUERIES["contamination"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_asof_join_single_shuffle(spark, sf_dir):
    # union + carry-forward window: exactly ONE exchange (on the join key),
    # same shuffle count as a plain sort-merge join
    from xena_gdc_etl_spark.plans import shuffle_count

    df = QUERIES["asof_join"](spark, sf_dir)
    assert shuffle_count(df) == 1
    assert python_udf_count(df) == 0


def test_histogram_and_percentiles_prune_columns(spark, sf_dir):
    read = scan_read_schema(QUERIES["value_histogram"](spark, sf_dir))
    assert read == ["l_extendedprice"]
    read = scan_read_schema(QUERIES["group_percentiles"](spark, sf_dir))
    assert sorted(read) == ["c_acctbal", "c_nationkey"]


def test_range_join_is_equi_join_not_cartesian(spark, sf_dir):
    # the bin-bucketed interval join must plan as a hash/sort-merge join on
    # the bin key — never a cartesian/broadcast-nested-loop product
    plan = formatted_plan(QUERIES["range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_no_cartesian_no_python(spark, sf_dir):
    plan = formatted_plan(QUERIES["simhash_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert python_udf_count(QUERIES["simhash_pairs"](spark, sf_dir)) == 0


def test_quality_filter_is_scan_stage_only(spark, sf_dir):
    from xena_gdc_etl_spark.plans import shuffle_count

    df = QUERIES["quality_filter"](spark, sf_dir)
    # rule-chain filter must be a single pass: no shuffle, no Python
    assert shuffle_count(df) == 0
    assert python_udf_count(df) == 0
    # and it only reads what it needs from the scan
    read = scan_read_schema(df)
    assert "text" in read and "lang" not in read


def test_passage_dedup_no_pair_join(spark, sf_dir):
    plan = formatted_plan(QUERIES["passage_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert python_udf_count(QUERIES["passage_dedup"](spark, sf_dir)) == 0


def test_dedup_keep_best_reads_two_doc_columns(spark, sf_dir):
    df = QUERIES["dedup_keep_best"](spark, sf_dir)
    # the doc side of the window argmax joins only (doc_id, length(text))
    assert python_udf_count(df) == 0


def test_sequence_pack_sharded_prefix_no_udf(spark, sf_dir):
    from xena_gdc_etl_spark.operators.prefix import group_prefix_sum
    from xena_gdc_etl_spark.plans import window_specs

    df = QUERIES["sequence_pack"](spark, sf_dir)
    assert python_udf_count(df) == 0
    # At fixture scale the boundary sample proves the frame fits one task
    # and the prefix scan takes the plain-window fallback; the SHARDED
    # shape — the one that matters at 100 TB — is asserted by forcing the
    # probe to overflow (sample_cap below the row count): every window
    # ordering by doc_id must then also partition by the shard id (a bare
    # PARTITION BY source window would pull a whole source into one task).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", "source", F.length("text").cast("bigint").alias("n")
    )
    sharded = group_prefix_sum(
        toks, ["source"], ["doc_id"], "n", "cum", sample_cap=16
    )
    doc_windows = [s for s in window_specs(sharded) if "doc_id" in s]
    assert doc_windows, "expected a sharded prefix window in the plan"
    assert all("__shard" in s for s in doc_windows)


def test_top_docs_per_source_partial_topk(spark, sf_dir):
    from xena_gdc_etl_spark.plans import window_specs

    df = QUERIES["top_docs_per_source"](spark, sf_dir)
    specs = window_specs(df)
    # two-stage top-k: a sharded local window prunes to shards×k rows
    # before the per-source window — a lone per-source window would sort a
    # whole (possibly corpus-sized) source in one task
    assert any("__shard" in s for s in specs)
    assert len(specs) == 2


def test_quality_buckets_sharded_rank_no_udf(spark, sf_dir):
    from xena_gdc_etl_spark.operators.prefix import group_row_number
    from xena_gdc_etl_spark.plans import window_specs

    df = QUERIES["quality_buckets"](spark, sf_dir)
    assert python_udf_count(df) == 0
    plan = formatted_plan(df)
    assert "ntile" not in plan  # replaced by rank arithmetic
    # At fixture scale the rank frame (one row per doc) fits one task and
    # the rank takes the plain-window fallback. Force the sharded shape
    # (the 100 TB path) and assert it: the rank window over the big frame
    # (ordered by commonness, doc_id) must be sharded; lang-only windows
    # are allowed solely on the tiny offsets frame, which never carries
    # the commonness ordering.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranked_in = docs.select(
        "doc_id", "lang", F.length("text").cast("bigint").alias("commonness")
    )
    sharded = group_row_number(
        ranked_in,
        ["lang"],
        [("commonness", "desc"), "doc_id"],
        "__rank",
        total_col="__n",
        sample_cap=16,
    )
    ranked = [
        s for s in window_specs(sharded) if "commonness" in s and "doc_id" in s
    ]
    assert ranked, "expected a sharded rank window in the plan"
    assert all("__shard" in s for s in ranked)


def test_event_funnel_aggregate_only(spark, sf_dir):
    from xena_gdc_etl_spark.plans import shuffle_count

    df = QUERIES["event_funnel"](spark, sf_dir)
    plan = formatted_plan(df)
    # skew-safe shape: conditional-min AGGREGATES chained by user-key
    # joins — no per-user window anywhere (a degenerate bot user must
    # never funnel through one window task), every min() map-side partial
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # u/c/p aggs + their joins + final single-row agg — every exchange is
    # user-key-bounded (partial-agged or skew-splittable), unlike the one
    # skew-fragile window exchange this replaced
    assert shuffle_count(df) <= 10
    assert python_udf_count(df) == 0


def test_incremental_dedup_no_udf_no_cartesian(spark, sf_dir):
    df = QUERIES["incremental_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_udf_count(df) == 0


def test_cohort_retention_shares_user_shuffle(spark, sf_dir):
    from xena_gdc_etl_spark.plans import shuffle_count

    df = QUERIES["cohort_retention"](spark, sf_dir)
    assert python_udf_count(df) == 0
    # first-seen agg, activity distinct, join, final agg — but never a
    # self-join of the raw events and never more than the agg exchanges
    assert shuffle_count(df) <= 4


def test_round4_queries_no_python_no_cartesian(spark, sf_dir):
    for name in ["bigram_lm_score", "pack_stats", "quality_buckets"]:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert python_udf_count(df) == 0, name


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    # pair generation must stay cell-bucketed (applyInPandas per cell),
    # never a global cross join
    plan = formatted_plan(QUERIES["semantic_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round5_queries_no_python_no_cartesian(spark, sf_dir):
    # mixture_plan's 1-row totals cross join is the one sanctioned
    # BroadcastNestedLoopJoin (bounded side is a single aggregate row)
    for name in ["gopher_quality", "oov_rate", "dup_spans"]:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert python_udf_count(df) == 0, name
    assert python_udf_count(QUERIES["mixture_plan"](spark, sf_dir)) == 0


def test_oov_rate_broadcasts_vocab(spark, sf_dir):
    # the top-K vocabulary probe must be a map-side broadcast hash join —
    # the corpus-sized token stream never shuffles for it
    assert uses_broadcast_join(QUERIES["oov_rate"](spark, sf_dir))


def test_gopher_quality_scan_stage_only(spark, sf_dir):
    plan = formatted_plan(QUERIES["gopher_quality"](spark, sf_dir))
    assert "Exchange" not in plan
    assert python_udf_count(QUERIES["gopher_quality"](spark, sf_dir)) == 0


def test_winnow_and_chunks_zero_shuffle(spark, sf_dir):
    # both are pure Column programs over one scan: no Exchange anywhere,
    # no Python, so they run at scan speed at any scale
    for name in ["winnow_fingerprint", "chunk_documents"]:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "Exchange" not in plan, name
        assert python_udf_count(df) == 0, name


def test_vocab_overlap_broadcasts_after_rank(spark, sf_dir):
    # everything downstream of the top-k rank filter is broadcast-sized;
    # the pair and domain joins must not shuffle the corpus again
    df = QUERIES["vocab_overlap"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert "CartesianProduct" not in formatted_plan(df)
    assert python_udf_count(df) == 0


def test_heavy_hitters_partial_topk(spark, sf_dir):
    # orderBy().limit(k) must plan as TakeOrderedAndProject (per-partition
    # heaps + driver merge), never a global Sort
    df = QUERIES["heavy_hitters"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert python_udf_count(df) == 0


def test_length_band_filter_broadcasts_bounds(spark, sf_dir):
    # boundary frame (one row per source) must broadcast; the corpus side
    # must not shuffle for the join
    df = QUERIES["length_band_filter"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert python_udf_count(df) == 0


def test_containment_and_purity_plan_shape(spark, sf_dir):
    # per-candidate joins and map-side aggregates only: no cartesian, no
    # Python in either; the purity reduction must also be window-free
    for name in ["containment_pairs", "cluster_purity"]:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    purity_plan = formatted_plan(QUERIES["cluster_purity"](spark, sf_dir))
    assert "Window" not in purity_plan


def test_mixture_temperature_o_sources_traffic(spark, sf_dir):
    """The corpus collapses to one row per source BEFORE any join; the
    grand total joins back as a broadcast — shuffle traffic is
    O(sources), and no Python UDF touches the hot path."""
    from xena_gdc_etl_spark.plans import shuffle_count

    df = QUERIES["mixture_temperature"](spark, sf_dir)
    assert python_udf_count(df) == 0
    # the 1-row totals side is a keyless cross join → Catalyst compiles
    # it to BroadcastNestedLoopJoin with a BroadcastExchange build side
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" in plan
    # per-source collapse exchange on each branch (the totals branch
    # re-derives the per-group agg rather than persisting a 20-row frame)
    # plus the SinglePartition totals exchange — every one of them carries
    # O(sources) rows after map-side partials, never the corpus
    assert shuffle_count(df) <= 3
    read = scan_read_schema(df)
    assert "doc_id" not in read  # only source + text are consumed


def test_cross_source_overlap_text_never_shuffles(spark, sf_dir):
    """Text leaves the scan stage only as its md5 digest: no exchange in
    the plan carries the text column, and the scan reads just
    (source, text)."""
    from xena_gdc_etl_spark.plans import formatted_plan as _fp

    df = QUERIES["cross_source_overlap"](spark, sf_dir)
    assert python_udf_count(df) == 0
    plan = _fp(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    read = scan_read_schema(df)
    assert set(read) <= {"source", "text"}


def test_leakage_safe_split_zero_extra_shuffle(spark, sf_dir):
    """The split assignment itself is a pure projection over the cluster
    labels — it must add ZERO shuffles beyond what the cluster labeling
    already costs."""
    from xena_gdc_etl_spark.plans import shuffle_count

    from xena_gdc_etl_spark.workload import _clusters_df

    clusters = _clusters_df(spark, sf_dir)
    split = QUERIES["leakage_safe_split"](spark, sf_dir)
    assert shuffle_count(split) == shuffle_count(clusters)
    assert python_udf_count(split) == 0


def test_bm25_broadcasts_stats_and_df(spark, sf_dir):
    # the |Q|-row df frame and the 1-row N/avgdl aggregate must broadcast;
    # the corpus-side tf frame never shuffles for them
    df = QUERIES["bm25_topk"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert python_udf_count(df) == 0


def test_norm_outliers_single_scan_no_python(spark, sf_dir):
    # norm is a codegen higher-order aggregate; the only join is against
    # the broadcast 1-row mean/stddev frame — a keyless cross join, which
    # Spark plans as BroadcastNestedLoopJoin with the 1-row side as the
    # build (the right shape here: nothing to hash on, broadcast cost is
    # one row). What must NOT appear is an unbroadcast CartesianProduct.
    df = QUERIES["embedding_norm_outliers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert python_udf_count(df) == 0
    assert "CartesianProduct" not in plan


def test_prefix_dup_digest_only_shuffle(spark, sf_dir):
    # the shuffle key is the md5 digest of the normalized 128-char prefix —
    # full text must not cross the wire (the digest groupBy projects it out)
    df = QUERIES["prefix_dup"](spark, sf_dir)
    assert python_udf_count(df) == 0
    plan = formatted_plan(df)
    assert "md5" in plan and "Exchange" in plan


def test_source_lang_entropy_broadcast_totals(spark, sf_dir):
    df = QUERIES["source_lang_entropy"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert python_udf_count(df) == 0


def test_pmi_min_support_before_joins_no_python(spark, sf_dir):
    # the c_ab >= 5 support cut must run before the marginal joins (the
    # bigram tail is the bulk); no Python anywhere; totals broadcast
    df = QUERIES["cooccurrence_pmi"](spark, sf_dir)
    assert python_udf_count(df) == 0
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the support filter appears below (later in the text than) the first
    # join node in the formatted tree's operator list
    assert "5" in plan  # literal present; structural cut pinned below
    import re

    # find a Filter containing c_ab >= 5 and assert at least one join
    # consumes its output (filter id < join id in the numbered tree)
    m_f = re.search(r"\((\d+)\) Filter[\s\S]*?c_ab#\d+L? >= 5", plan)
    joins = [int(x) for x in re.findall(r"\((\d+)\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)]
    assert m_f and joins, "expected a support filter and joins in the plan"
    # formatted plans number leaves upward: the filter feeding a join has
    # a LOWER id than the join that consumes it
    assert int(m_f.group(1)) < max(joins)


def test_pq_recall_exact_half_is_gemm_batch_stage(spark, sf_dir):
    # round-14 shape: the exact-L2 ground truth is sq_l2_topk's Arrow
    # batch stage (BLAS expansion + batch-local top-k), NOT the old
    # broadcast-queries zip_with nested loop the 100x lane measured
    # super-linear (e=1.26, 800M interpreted folds at x100) — and the
    # global window only ever sees the pruned partitions x ~k survivors
    df = QUERIES["ann_pq_recall_eval"](spark, sf_dir)
    assert python_udf_count(df) == 0  # row-at-a-time Python: none
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the zip_with shape planned the != join as BroadcastNestedLoop; the
    # GEMM shape must have none anywhere in the query
    assert "BroadcastNestedLoop" not in plan
    assert "MapInPandas" in plan  # the batch GEMM stage is present


# BASELINE §lane-coverage class audit (round 15): the sub-second-tier
# queries carry plan-property justifications instead of lane rows; these
# lists pin the MEASURED properties so the prose can never drift from
# the plans. Strict = zero exchanges + zero Python stages; spread-only =
# at most the fill-aware pre-explode round-robin (absent on a filled
# 100 TB scan); broadcast = the dim side must hash-broadcast.
CLASS_S_STRICT = [
    "search_filter", "snv_vaf", "survival_transform", "gopher_quality",
    "quality_filter", "scrub_pii", "token_count", "text_quality",
    "lang_id", "doc_fingerprint", "winnow_fingerprint", "embed_quantize",
    "sample_by_group", "flatten_props", "multimodal_features",
    "logreg_score",
]
CLASS_S_SPREAD_ONLY = [
    "doc_repetition", "train_split", "weighted_sample", "pq_adc_score",
]
CLASS_B_BROADCAST = [
    "project_info", "keep_samples", "snv_placeholder_filter",
]


def test_lane_coverage_class_s_strict(spark, sf_dir):
    from xena_gdc_etl_spark.plans import shuffle_count

    for name in CLASS_S_STRICT:
        df = QUERIES[name](spark, sf_dir)
        assert shuffle_count(df) == 0, f"{name}: expected zero exchanges"
        assert python_udf_count(df) == 0, f"{name}: expected zero Python"


def test_lane_coverage_class_s_spread_only(spark, sf_dir):
    from xena_gdc_etl_spark.plans import shuffle_count

    for name in CLASS_S_SPREAD_ONLY:
        df = QUERIES[name](spark, sf_dir)
        assert shuffle_count(df) <= 1, f"{name}: expected <=1 exchange"
        assert python_udf_count(df) == 0, f"{name}: expected zero Python"


def test_lane_coverage_class_b_broadcasts(spark, sf_dir):
    for name in CLASS_B_BROADCAST:
        df = QUERIES[name](spark, sf_dir)
        assert uses_broadcast_join(df), f"{name}: expected broadcast join"
