"""Structured Streaming variants of the event operators.

The batch plans in operators/events.py are written against ``F.window`` so
the same aggregation logic runs under ``readStream``; these helpers add the
stream wiring (watermarks for late data, output mode). Sessionization uses
``F.session_window`` — Spark's native gap-based session state operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window count/avg — the streaming twin of
    operators/events.py:windowed_agg. State for a window is dropped once
    the watermark passes its end, bounding memory on unbounded input.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col(value_col)), 6).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("ws"),
            F.col(key_col),
            F.col("n"),
            F.col("avg_value"),
        )
    )


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions on a stream via ``session_window`` (native session
    state; sessions close when no event arrives within the gap, finalized by
    the watermark).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def streaming_dedup_exact(
    records: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first record per content hash.

    State is the set of hashes inside the watermark horizon —
    ``dropDuplicatesWithinWatermark`` evicts a hash once no duplicate can
    still arrive, so state is bounded on unbounded input (a plain
    ``dropDuplicates`` would grow state forever). Batch twin:
    operators/dedup.py:dedup_exact.
    """
    if key_cols is None:
        records = records.withColumn("content_hash", F.md5(F.col(text_col)))
        key_cols = ["content_hash"]
    return records.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] = (),
    trigger_available_now: bool = True,
    output_mode: "str | None" = None,
):
    """Land a stream into the engine's partitioned parquet sink via
    ``foreachBatch`` — each micro-batch goes through the same
    ``write_partitioned`` layout (hive dirs, file-size caps) the batch
    pipelines use, so downstream readers can't tell how the data arrived.

    Delivery is AT-LEAST-ONCE: the checkpoint prevents skipped batches,
    but a crash between a batch's append and its checkpoint commit
    replays that batch on restart, appending its rows a second time.
    A blind append cannot be exactly-once; deployments that need it
    should key writes on ``batch_id`` idempotently (overwrite a
    ``batch_id=``-partitioned directory per batch, or dedup on a stable
    row key downstream). The batch twins' exact-dedup operators make the
    downstream-dedup route native here.

    ``output_mode`` must be set to ``"update"`` when the upstream plan
    contains an update-mode stateful operator (e.g.
    ``streaming_funnel``); the landed table is then an append-only LOG of
    per-key updates — each eviction/emission becomes a row — which is the
    shape batch reconciliation jobs want.
    """
    from xena_gdc_etl_spark.sources.parquet_sink import write_partitioned

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_partitioned(
            batch_df, path, partition_by=partition_by, mode="append"
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to every
    streamed row. With ``broadcast=True`` (default) the static side is
    force-broadcast — the stream never shuffles and no join state
    accumulates — which assumes a DIMENSION-sized static side; a
    corpus-scale dim would OOM the driver under the hint. Pass
    ``broadcast=False`` for big static sides: the planner then sizes the
    join itself (threshold-based broadcast still fires when the dim is
    actually small), the same discipline as the incremental-dedup
    example's landed-index join.
    """
    return stream.join(F.broadcast(dim) if broadcast else dim, on, how)


def streaming_time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows at-or-before each left row and
    within ``lookback`` of it, per key — the streaming counterpart of the
    batch as-of/interval joins (operators/asof.py, operators/interval.py).

    Both sides carry watermarks and the join condition bounds event time
    from BOTH directions, so Spark can evict join state once the watermark
    passes ``lookback`` — without the time bound, stream-stream state grows
    forever. Matches emit as soon as both rows arrive (inner-join
    semantics); the watermark only governs state cleanup.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}"))
        & (
            F.col(f"r.{ts_col}")
            >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    joined = l.join(r, cond)
    # normalize the output: the raw join carried BOTH sides' key/ts
    # columns under one name each, so any unqualified reference
    # downstream died with AMBIGUOUS_REFERENCE. One key column (equal on
    # both sides by the join condition); right-side columns whose names
    # collide with a left column get a right_ prefix (the right ts
    # becomes right_ts); non-colliding right columns keep their names.
    keep = [
        F.col(f"l.{key_col}").alias(key_col),
        *[
            F.col(f"l.{c}").alias(c)
            for c in left.columns
            if c != key_col
        ],
    ]
    rcols = [
        F.col(f"r.{c}").alias(
            f"right_{c}" if c in left.columns else c
        )
        for c in right.columns
        if c != key_col
    ]
    return joined.select(*keep, *rcols)


def streaming_incremental_dedup(
    new_docs: DataFrame,
    landed_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    within_stream_watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the ``incremental_dedup`` query: every arriving
    document probes the landed corpus's (content hash → keeper id) index
    via a stream-static left join. The stream side carries only its
    digest through the join; the static index is re-resolved per
    micro-batch (and broadcast when it fits), so a continuously-fed
    pipeline can run this indefinitely. Batch twin: workload.py
    ``incremental_dedup``.

    ``ts_col`` additionally dedups WITHIN the stream:
    ``dropDuplicatesWithinWatermark`` on the digest keeps the FIRST
    arrival of each new content hash and drops re-arrivals inside the
    watermark horizon — the landed index only knows yesterday's corpus,
    so without this two copies of the same new document arriving today
    both pass. State is one digest per distinct new content, evicted
    when the watermark passes (bounded — the 100 TB requirement a plain
    ``dropDuplicates`` on a stream violates by keeping state forever).
    """
    hashed = new_docs.withColumn("__h", F.md5(F.col(text_col)))
    if ts_col is not None:
        hashed = hashed.withWatermark(
            ts_col, within_stream_watermark
        ).dropDuplicatesWithinWatermark(["__h"])
    index = landed_index.select(
        F.col("h").alias("__h"), F.col("dup_of")
    )
    return hashed.join(index, "__h", "left").select(
        F.col(id_col), F.col("dup_of")
    )


def streaming_pii_rate(
    docs: DataFrame,
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the ``pii_rate`` rollup: per (window, source)
    PII hit counts over an arriving document feed — the live scrubbing
    monitor a continuously-fed corpus runs (a source whose PII density
    jumps is a crawl regression you want the same hour, not at the next
    mix freeze). The per-doc regex counts are scan-stage codegen exactly
    as in the batch operator; state is only the watermark-bounded
    windowed aggregate. Emits counts, not the final ratio — ratios of
    sums don't merge incrementally, so the tiny per-window division runs
    on read (``finalize``-style), same two-tier shape as
    ``streaming_heavy_hitters``.
    """
    from xena_gdc_etl_spark.operators.text import PII_PATTERNS

    hits = None
    for name, pattern, _tok in PII_PATTERNS:
        c = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).cast("bigint")
        hits = c if hits is None else hits + c
    return (
        docs.withColumn("__hits", hits)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration), F.col(source_col)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("__hits") > 0).cast("int"))
            .cast("bigint")
            .alias("pii_docs"),
            F.sum("__hits").cast("bigint").alias("pii_hits"),
            F.sum(chars_col).cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("window.start").alias("ws"),
            F.col(source_col),
            "n_docs",
            "pii_docs",
            "pii_hits",
            "n_chars",
        )
    )


def stateless_minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-doc MinHash signatures as a PURE PROJECTION — no explode, no
    groupBy — so a STREAM can sign arriving documents statelessly
    (dedup.minhash_signatures aggregates over an exploded shingle table,
    which on a stream would need watermarked per-doc state for no
    reason: a document's signature depends only on its own text).

    Same numbers as the batch operator, pinned by test: identical
    shingling (k-char substrings over guarded offsets; docs shorter than
    k have no shingles and emit NO row, matching the batch groupBy's
    absent-key contract), identical slot derivation (8×8-hex chunks of
    seeded sha256, base-16 decoded to bigint), min over the doc's
    shingle multiset via ``array_min`` — all codegen higher-order
    Column math, no Python, usable in append mode.
    """
    from xena_gdc_etl_spark.operators.dedup import _offsets

    sh = F.transform(
        _offsets(text_col, shingle_k),
        lambda i: F.col(text_col).substr(i, F.lit(shingle_k)),
    )
    base = docs.select(F.col(id_col), sh.alias("__sh")).filter(
        F.size("__sh") > 0
    )
    n_digests = (num_hashes + 7) // 8

    # factory closures, NOT default-arg lambdas: F.transform treats a
    # TWO-arg lambda as (element, index), so `lambda x, d=d: ...` would
    # silently receive the array INDEX as d — every slot would compute
    # the same expression (caught by the batch-equality pin)
    def _dig_fn(d: int):
        return lambda x: F.sha2(F.concat(F.lit(f"s{d}:"), x), 256)

    def _slot_fn(c: int):
        return lambda h: F.conv(
            F.substring(h, 1 + 8 * c, 8), 16, 10
        ).cast("bigint")

    # one seeded digest ARRAY per 8 slots, materialized as a column so
    # the 8 slot extractions read it instead of re-hashing per slot
    dig_cols = [
        F.transform(F.col("__sh"), _dig_fn(d)).alias(f"__dig{d}")
        for d in range(n_digests)
    ]
    staged = base.select(id_col, *dig_cols)
    slot_cols = []
    for j in range(num_hashes):
        d, c = j // 8, j % 8
        slot_cols.append(
            F.array_min(
                F.transform(F.col(f"__dig{d}"), _slot_fn(c))
            ).alias(f"mh{j}")
        )
    return staged.select(id_col, *slot_cols)


def streaming_lsh_probe(
    new_docs: DataFrame,
    landed_signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 5,
) -> DataFrame:
    """Streaming twin of the incremental near-dedup probe
    (sources/minhash_index.py ``lsh_probe_pairs``): every ARRIVING
    document is signed statelessly (:func:`stateless_minhash_signatures`),
    banded, and joined against the LANDED corpus's persisted signature
    artifact — the landed text is never re-shingled, and the stream
    carries only ``num_hashes`` longs per doc into the join.

    Plan shape (all streaming-legal, stateless): sign → band → explode
    (band, bucket) → stream-static inner join on (band, bucket). The
    static side is the banded artifact (a digest-scale table — broadcast
    when it fits, re-resolved per micro-batch), so no join state
    accumulates. Output is one (new_id, landed_id, band) row PER MATCHING
    BAND: collapsing to distinct pairs would need cross-row state the
    stream cannot bound, so — same two-tier discipline as the
    heavy-hitters / cluster-purity twins — the tiny per-micro-batch
    ``dropDuplicates`` runs in the foreachBatch consumer (batch twin
    applies ``.distinct()`` in-plan). Batch equivalence on the distinct
    pair set is pinned by test.
    """
    from xena_gdc_etl_spark.operators.dedup import lsh_buckets

    new_sigs = stateless_minhash_signatures(
        new_docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    new_b = lsh_buckets(
        new_sigs, id_col=id_col, num_hashes=num_hashes, band_size=band_size
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    landed_b = lsh_buckets(
        landed_signatures, id_col=id_col, num_hashes=num_hashes,
        band_size=band_size,
    ).select(F.col(id_col).alias("landed_id"), "band", "bucket")
    return new_b.join(landed_b, ["band", "bucket"]).select(
        "new_id", "landed_id", "band"
    )


def streaming_bm25_score(
    docs: DataFrame,
    query_terms: "list[str]",
    vocab: DataFrame,
    manifest: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score ARRIVING documents against a STATIC corpus's BM25 statistics
    — the serve side of the token-stats build→persist→consume loop
    (sources/token_stats.py builds ``vocab``/``manifest`` once per corpus
    freeze; examples/token_stats_build.py is the build side). The live
    use: route/rank incoming crawl docs against a frozen domain query
    ("most about X") without waiting for the next batch snapshot.

    Plan shape — deliberately STATELESS: N and avgdl come from the
    manifest (``n_docs``, ``n_tokens/n_docs``) and each query term's
    document frequency is a |Q|-row bounded collect off the vocab table,
    all folded into scan-stage literals, so every arriving doc is scored
    by pure Column math (tokenize once, one ``size(filter(...))`` tf per
    term) — no watermark, no join state, no shuffle, usable in append
    mode inside any stream. This is the same posting-list-slice economics
    as the batch twin (``text.bm25_scores``: df is a |Q|-row broadcast,
    N/avgdl a 1-row broadcast); a stream-static JOIN would buy nothing
    here because the per-term state is |Q| scalars, below even a
    broadcast's overhead. Batch-equivalence is pinned by test against
    ``bm25_scores`` when the artifact is built from the same corpus.

    A query term absent from the landed vocabulary scores with df=0
    (maximal idf) — the standard convention for out-of-corpus terms.
    Docs containing NO query term are dropped, matching the batch twin's
    inner-join contract.
    """
    import math

    from xena_gdc_etl_spark.operators.text import WS_RE

    if not query_terms:
        raise ValueError("streaming_bm25_score needs at least one query term")
    # SET semantics over terms, like the batch twin's isin() filter: a
    # raw query split can repeat a term, and the per-term loop below
    # would double-count its contribution
    query_terms = list(dict.fromkeys(query_terms))
    n_docs = int(manifest["n_docs"])
    if n_docs <= 0:
        raise ValueError(
            "streaming_bm25_score: manifest has n_docs=0 — an empty landed "
            "corpus has no BM25 statistics to score against"
        )
    avgdl = float(manifest["n_tokens"]) / n_docs
    df_rows = (
        vocab.filter(F.col("tok").isin(list(query_terms)))
        .select("tok", "doc_freq")
        .collect()  # bounded: at most |Q| rows — index state, never data
    )
    df_by_term = {r["tok"]: int(r["doc_freq"]) for r in df_rows}

    # tokenize ONCE into an intermediate array column; every per-term tf
    # and the length read from it (a single-select form would lean on
    # codegen subexpression elimination to avoid |Q|+1 re-tokenizations)
    tok_df = docs.select(
        F.col(id_col),
        F.array_remove(
            F.split(F.lower(F.col(text_col)), WS_RE), ""
        ).alias("__toks"),
    )
    dl = F.size("__toks").cast("double")
    score = F.lit(0.0)
    any_hit = F.lit(False)
    for t in query_terms:
        dft = df_by_term.get(t, 0)
        idf = math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
        tf = F.size(
            F.filter(F.col("__toks"), lambda x: x == t)
        ).cast("double")
        score = score + idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )
        any_hit = any_hit | (tf > 0)
    return tok_df.filter(any_hit).select(
        F.col(id_col), F.round(score, 6).alias("bm25")
    )


def streaming_heavy_hitters(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 20,
) -> DataFrame:
    """Streaming twin of the ``heavy_hitters`` skew profile: per
    tumbling window, exact per-key counts with watermark-bounded state;
    the top-``k`` cut runs per FINALIZED window downstream (the returned
    frame is (window_start, key, cnt) in append mode — a foreachBatch
    consumer applies the same ``orderBy().limit(k)`` TakeOrdered cut the
    batch operator uses, or the complete-mode memory sink ranks on
    read). Keeping the rank cut out of the stateful plan is deliberate:
    Structured Streaming cannot incrementally maintain a global sort, so
    the stream carries only the windowed aggregate (state drops when the
    watermark passes a window's end) and the tiny per-window rank runs
    as a batch operation on each emitted window — the same two-tier
    shape the batch operator uses at 100 TB, with the corpus-sized work
    in the watermarked aggregate.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("ws"),
            F.col(key_col),
            F.col("cnt"),
        )
    )


def streaming_cluster_purity(
    vectors: DataFrame,
    centroids: DataFrame,
    ts_col: str = "ts",
    id_col: str = "vec_id",
    label_col: str = "label",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the ``cluster_purity`` index-quality profile:
    arriving labeled vectors are assigned to their nearest STATIC centroid
    (stream-static broadcast enrichment — the same train-once/serve-many
    contract as sources/ann_index.py) and counted per (tumbling window,
    cell, label) under a watermark, so state drops once a window
    finalizes.

    The majority/purity cut — pick the biggest label per (window, cell),
    smallest-label tiebreak, share of the cell — runs per FINALIZED window
    downstream (``finalize_cluster_purity``), exactly like the
    heavy-hitter twin's top-k cut: Structured Streaming cannot
    incrementally maintain an argmax-with-tiebreak, and the per-window
    label-count frame is already reduced to #cells × #labels rows, so the
    cut is trivially cheap wherever it runs. Batch twin:
    operators/similarity.py ``cell_label_purity``.

    Watermark-liveness caveat (see streaming_containment for the full
    trap): ``ivf_assign`` drops NULL-embedding rows, and that filter
    sits below the watermark — a malformed (null-vector) arrival does
    not advance event time. Unlike sub-k documents (legitimate data,
    handled via explode_outer in the text twins), null vectors are
    corrupt input; feeds whose keep-alives might carry null embeddings
    should watermark upstream of this operator.
    """
    from xena_gdc_etl_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, keep_cols=(ts_col, label_col)
    )
    return (
        assigned.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration),
            F.col("centroid_id"),
            F.col(label_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("ws"),
            "centroid_id",
            F.col(label_col).alias("label"),
            F.col("n"),
        )
    )


def finalize_cluster_purity(window_counts: DataFrame) -> DataFrame:
    """The per-finalized-window purity cut for
    :func:`streaming_cluster_purity` output (also usable on any
    (ws, centroid_id, label, n) frame): majority label with
    smallest-label tiebreak + member count + purity share — the batch
    ``cell_label_purity`` columns, per window."""
    per_cell = window_counts.groupBy("ws", "centroid_id").agg(
        F.sum("n").cast("bigint").alias("n_members"),
        F.max(
            F.struct(F.col("n"), (-F.col("label")).alias("neg"))
        ).alias("b"),
    )
    return per_cell.select(
        "ws",
        "centroid_id",
        "n_members",
        # bigint, matching the batch twin cell_label_purity — an int cast
        # here would silently truncate labels beyond int32
        (-F.col("b.neg")).cast("bigint").alias("majority_label"),
        F.col("b.n").cast("bigint").alias("n_majority"),
        F.round(F.col("b.n") / F.col("n_members"), 6).alias("purity"),
    )


def streaming_containment(
    new_docs: DataFrame,
    landed_shingles: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    landed_id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of the ``containment_pairs`` quote/doc-inside-doc
    profile: each ARRIVING document is scored against the LANDED corpus —
    C(new, landed) = |S(new) ∩ S(landed)| / |S(new)| for every landed doc
    sharing at least one k-char shingle.

    Plan shape (all streaming-legal): the stream side folds each doc to
    its DISTINCT shingle array statelessly (array_distinct before the
    explode — no dropDuplicates state), carries |S(new)| as a column,
    probes the static (shingle → landed doc) posting frame with a
    stream-static join, and one watermarked aggregate per (window, new
    doc, landed doc) counts the intersection — state drops when the
    watermark passes the window. The landed posting frame is the durable
    artifact (build it with ``dedup.shingles(landed, distinct=True)`` and
    cap hot shingles with a ``max_doc_freq``-style filter before handing
    it in — the same pre-expansion cap discipline as the batch LSH path,
    SURVEY §6 cap table). Landed docs with zero shingles never appear
    (no posting rows), matching the batch operator's inner-join contract.

    Watermark-liveness shape (round 12, the trap the winnow twin's serve
    example exposed): the watermark sits on the INPUT stream, the
    shingle explode is ``explode_outer``, and the posting join is LEFT —
    because Catalyst pushes any row-dropping predicate that doesn't
    reference the event-time column BELOW the watermark node (a plain
    explode's implicit non-empty filter, an inner join's IsNotNull, and
    even a post-agg null-group filter, which converts the left join back
    to inner via EliminateOuterJoin). With the prior inner shape, an
    arrival sharing NO shingle with the landed corpus never advanced the
    watermark — in a feed where matches are rare, windows never
    finalized and append mode emitted nothing, silently. Consequence:
    non-matching docs surface as one (ws, a, b=NULL) row per window —
    drop ``b IS NULL`` in the foreachBatch consumer (two-tier
    discipline, like the heavy-hitters top-k cut); an in-plan filter
    would be pushed below the watermark and re-open the stall.
    """
    from xena_gdc_etl_spark.operators.dedup import _offsets

    # guarded offsets (dedup._offsets): text shorter than k yields ZERO
    # shingles — sequence(1, stop<1) would run backward and emit garbage
    sh_arr = F.array_distinct(
        F.transform(
            _offsets(text_col, k),
            lambda i: F.col(text_col).substr(i, F.lit(k)),
        )
    )
    stream = new_docs.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.col(id_col).alias("a"),
        sh_arr.alias("__sh"),
    ).select(
        F.col(ts_col),
        "a",
        F.size("__sh").alias("n_a"),
        F.explode_outer("__sh").alias("shingle"),
    )
    # landed_shingles: the (landed id, shingle) frame dedup.shingles
    # produces — the landed doc id is selected BY NAME (``landed_id_col``,
    # default "doc_id"), never positionally: a (shingle, doc_id)-ordered
    # frame would otherwise silently bind the shingle column as the id
    # and produce wrong pairs instead of an error
    if landed_id_col not in landed_shingles.columns:
        raise ValueError(
            f"landed_shingles has no column {landed_id_col!r} "
            f"(columns: {landed_shingles.columns}); pass landed_id_col="
        )
    if landed_id_col == "shingle":
        raise ValueError("landed_id_col must not be the shingle column")
    posting = landed_shingles.select(
        "shingle", F.col(landed_id_col).alias("b")
    )
    # LEFT join + no in-plan null filter: see the watermark-liveness
    # note in the docstring — the consumer drops the b IS NULL rows
    joined = stream.join(posting, "shingle", "left")
    return (
        joined
        .groupBy(
            F.window(F.col(ts_col), window_duration),
            F.col("a"),
            F.col("b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.max("n_a").cast("bigint").alias("n_a"),
        )
        .select(
            F.col("window.start").alias("ws"),
            "a",
            "b",
            "n_common",
            "n_a",
            # try_divide: a sub-k liveness row has n_a = 0, and ANSI
            # division would kill the whole query for a row the
            # consumer drops anyway; real rows (n_a > 0) are unchanged
            F.round(F.try_divide(F.col("n_common"), F.col("n_a")), 6).alias(
                "containment_a"
            ),
        )
    )


def streaming_winnow_decontamination(
    docs: DataFrame,
    heldout_fingerprints: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    watermark: str = "10 minutes",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``winnow_contamination`` (operators/text.py):
    score ARRIVING training documents against a STATIC held-out
    fingerprint set (the
    artifact ``text.winnow_fingerprint_set`` freezes once per eval-suite
    snapshot) — the serve side of standing decontamination, with the
    same verbatim-span guarantee (any shared >= k+w-1 token run between
    an arriving doc and the held-out set shares a fingerprint).

    Plan shape, all streaming-legal: the winnowing selector is a PURE
    projection (``_winnow_fps_frame`` — tokenize, zip_with chains,
    window-min; no shuffle, no state), the fingerprint explode feeds a
    stream-static LEFT join on fp (the static side is the eval-suite-
    sized fingerprint set — AQE/broadcast territory, re-resolved per
    micro-batch, no join state), and the per-doc rollup is a WATERMARKED
    windowed aggregate — every fp-row of a doc carries the doc's single
    event time, so a (window, id) group IS the doc, finalized in append
    mode once the watermark passes. Docs with no fingerprints (under k
    tokens) explode to nothing and are absent, matching the batch
    operator's contract.

    One honest divergence from the batch twin's physics: the batch
    operator materializes the fingerprint ARRAYS through an
    eagerly-filled persist seam before exploding (the explode otherwise
    re-evaluates the higher-order selector chain outside codegen — the
    measured 10x trap at text.py's winnow_contamination). A stream
    cannot persist; the twin pays that interpreted re-evaluation on the
    INCREMENT only — bounded by micro-batch size, linear in arrivals,
    and the right trade vs. unbounded state or a batch round-trip.

    Output: (ws window-start, id, n_fps, n_hit, contam_fp_frac) — the
    batch columns plus the finalizing window. Batch equivalence on the
    (id, n_fps, n_hit, contam_fp_frac) projection is pinned by test.
    """
    from xena_gdc_etl_spark.operators.text import _winnow_fps_frame

    # Watermark on the INPUT stream, and explode_OUTER — both halves of
    # one trap found live: event-time stats are collected at the
    # EventTimeWatermark operator, and a plain explode's implicit
    # non-empty filter is PUSHED BELOW the watermark by the optimizer
    # (it doesn't reference the event-time column), so a fingerprint-
    # less arrival (sub-k doc, heartbeat/keep-alive) would be dropped
    # before the watermark tracker ever saw its timestamp — the
    # watermark stalls and append mode emits NOTHING, forever, with no
    # error. explode_outer keeps one fp=NULL row per empty doc flowing
    # through the watermark; the post-aggregate n_fps > 0 filter (which
    # the optimizer cannot push below the agg) restores the batch
    # operator's absent-row contract for sub-k docs.
    docs = docs.withWatermark(ts_col, watermark)
    fps = _winnow_fps_frame(
        docs, id_col, text_col, k, w, keep_cols=(ts_col,)
    )
    train_fp = fps.select(
        F.col(id_col), F.col(ts_col), F.explode_outer("__fps").alias("fp")
    )
    held_fp = (
        heldout_fingerprints.select("fp").distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        train_fp.join(held_fp, "fp", "left")
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(id_col))
        .agg(
            F.count("fp").cast("bigint").alias("n_fps"),
            F.count("__hit").cast("bigint").alias("n_hit"),
            # try_divide, not "/": heartbeat/sub-k rows aggregate with
            # count(fp)=0 and under ANSI mode a plain division would
            # throw DIVIDE_BY_ZERO the moment a plan-shape change stops
            # Catalyst from evaluating the n_fps > 0 filter first
            # (streaming_containment uses the same guard).
            F.round(
                F.try_divide(F.count("__hit"), F.count("fp")), 6
            ).alias("contam_fp_frac"),
        )
        .filter(F.col("n_fps") > 0)
        .select(
            F.col("window.start").alias("ws"),
            F.col(id_col),
            "n_fps",
            "n_hit",
            "contam_fp_frac",
        )
    )
