"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline; IVF (inverted-file) cell
search is the scale path: vectors are assigned to their nearest centroid
once, and queries only score vectors in their own cell — pruning the
candidate set by ~n_centroids× at 100 TB. Vector math runs as Arrow-batched
numpy (one BLAS matmul per batch via mapInPandas/applyInPandas) — measured
~20× faster than Catalyst higher-order functions, which are interpreted
per-element; a pure-JVM zip_with/aggregate cosine remains in
xena_gdc_etl_spark.functions for tests and single-pair use.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

def _safe_norms(m: np.ndarray) -> np.ndarray:
    """Row L2 norms with zeros replaced by 1.0 — a zero vector then keeps
    cosine 0.0 against everything instead of poisoning the matmul with NaN
    (NaN > threshold is False, but NaN also breaks top-k ordering).
    """
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return norms


# The query/centroid sides of the broadcast ANN operators are collected to
# the driver by design (they are the small side); this bound turns the
# silent driver OOM of an oversized side into an actionable error.
DEFAULT_MAX_BROADCAST_ROWS = 1 << 16

# Size floor for the matmul-family spread (see _spread_to_cores): frames
# whose known plan estimate is below this run in their scan's own
# partitioning. 4 MiB ≈ 16k d=64 double vectors — a single-core BLAS
# pass over that is ~ms, far below one repartition exchange + 32 Arrow
# task round-trips (A/B on the sf0.1 embedding frame: 0.71 s unspread
# vs 1.00 s spread). Env-overridable for cluster tuning.
SPREAD_MIN_MATMUL_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_MATMUL_BYTES", str(4 * 1024 * 1024))
)


def _collect_bounded(df: DataFrame, what: str, limit: int) -> list:
    """Collect a deliberately-small DataFrame, failing clearly (instead of
    an opaque driver OOM) when it exceeds ``limit`` rows."""
    rows = df.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"{what} has more than {limit} rows — this side is collected "
            "to the driver and broadcast, so it must stay small; raise "
            "max_driver_rows only if the driver can really hold it"
        )
    return rows


class _CRow(NamedTuple):
    cid: int
    cv: "list[float]"


def _centroid_rows(
    centroids: "DataFrame | Sequence[tuple]",
    vec_col: str,
    centroid_id: str,
    max_driver_rows: int,
) -> "list":
    """Centroid state as driver rows: collect a DataFrame (bounded), or
    validate an already-driver-side sequence of (id, vector) tuples —
    the no-job fast path for callers that hold the state (see
    :func:`ivf_assign`)."""
    if isinstance(centroids, DataFrame):
        return _collect_bounded(
            centroids.filter(F.col(vec_col).isNotNull()).select(
                F.col(centroid_id).alias("cid"), F.col(vec_col).alias("cv")
            ),
            "the centroid side of ivf_assign",
            max_driver_rows,
        )
    if len(centroids) > max_driver_rows:
        raise ValueError(
            f"the centroid side of ivf_assign has more than "
            f"{max_driver_rows} rows — raise max_driver_rows only if the "
            "driver can really hold it"
        )
    return [_CRow(cid, vec) for cid, vec in centroids if vec is not None]


# Row-chunk bound for the brute-force top-k matmul: the (|Q|, chunk)
# candidate matrix stays bounded even at the bounded-collect query
# ceiling (65536 queries), independent of Arrow batch sizing.
TOPK_CHUNK_ROWS = 2048
# Block width for the two-level per-query threshold (see _local_topk):
# the k-th largest of the row's BLOCK MAXIMA is provably <= the row's
# k-th largest element, so thresholding on it keeps a small superset
# while reading the candidate matrix with plain vectorized maxes
# instead of a per-row introselect.
TOPK_BLOCK = 16

_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("match_id", LongType()),
        StructField("sim", DoubleType()),
    ]
)


def _spread_to_cores(df: DataFrame, par: int) -> DataFrame:
    """Repartition ONLY when the plan says the scan underfills the cores.

    Compact vector files scan as a handful of partitions, so without a
    spread the Arrow matmul stages run on a fraction of the cluster. But
    an unconditional ``repartition`` is a full-corpus shuffle that a
    100 TB scan (thousands of input splits ≥ parallelism already) must
    never pay — the fill-aware, strictly plan-only underfill probe lives
    in operators/partitioning.py (partition COUNTS were the wrong
    signal; ``.rdd`` probes were unsafe under AQE).

    The Arrow matmul family has CONSTANT fan-out (output ≈ input, per-row
    work is a few hundred FLOPs), so unlike the 100-300× explode
    consumers it passes a size floor: below it the repartition exchange
    plus one Python-worker round trip per core costs more than the
    single-task BLAS it parallelizes (guide §2.4 — remove shuffles
    outright).
    """
    from xena_gdc_etl_spark.operators.partitioning import spread

    return spread(df, par, min_bytes=SPREAD_MIN_MATMUL_BYTES)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_driver_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Exact top-k by cosine for every query vector (self-match excluded).

    Two-stage top-k: the small query side is shipped to every task as a
    dense normalized matrix; each Arrow batch of the corpus computes all
    sims with one BLAS matmul and keeps its batch-local top-k per query
    (ordered by the FINAL criterion — rounded sim desc, id asc — so the
    stages compose exactly); a cheap global window over partitions×k rows
    finishes. The corpus never shuffles.
    """
    spark = vectors.sparkSession
    # null vectors carry no geometry: dropped on BOTH sides (aggregate-
    # style null semantics — a dirty ingest must not crash the plan)
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    qrows = _collect_bounded(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "the query side of cosine_topk",
        max_driver_rows,
    )
    if not qrows:
        # empty-in → empty-out: a filter that matches no queries must not
        # kill the pipeline (np.stack/argmax on empty raises AxisError)
        return spark.createDataFrame(
            [], "query_id bigint, match_id bigint, sim double, rank bigint"
        )
    q_ids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qm = np.array([r.qv for r in qrows], dtype=np.float64)
    qn = qm / _safe_norms(qm)
    bc = spark.sparkContext.broadcast((q_ids, qn))

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fully vectorized batch stage — no per-query Python loop. The
        # previous implementation looped `for qid in ids` with an O(n)
        # mask + lexsort per query: fine at |Q|=200, but |Q| grows with
        # the corpus (10% rule), so at the 100× lane (|Q|=20k) the loop
        # ran |Q|×chunks Python-level lexsorts per partition and
        # dominated the stage. This stage only needs to emit a SUPERSET
        # of each query's batch-local top-k by the FINAL criterion
        # (rounded sim desc, id asc) — the global window downstream
        # applies that exact rule — so it emits every candidate whose
        # sim reaches the k-th largest per query (ties included; an
        # arbitrary argpartition tie-cut could drop the smaller-id tie
        # the exact rule keeps).
        # Bandwidth discipline (the 100x-lane-found knee at |Q|=20k,
        # N=200k): 32 concurrent workers each streaming a (|Q|, chunk)
        # float64 matrix several times saturate host DRAM — the solo-
        # fast paths (full-matrix round, argmax passes, per-row
        # introselect over float64) all degraded 25x under concurrency.
        # So the candidate pass runs in FLOAT32 (half the traffic) into
        # one reused buffer, the per-query threshold comes from a
        # two-level BLOCK-MAX cut that reads the matrix once with plain
        # vectorized maxes, and only the ~k survivors per query are
        # re-scored exactly in float64 and rounded. Exactness: for any
        # j, the j-th largest of a row's block maxima is <= the row's
        # j-th largest element (the top-j blocks contain j distinct
        # elements >= it), so thresholding at (block-kth - 1e-3) keeps
        # a superset of the float64 rounded top-k incl. 6-dp ties
        # (float32 dot error at d<=4096 unit vectors is <~1e-5, orders
        # under the margin); the downstream window applies the exact
        # (rounded sim desc, id asc) rule to the superset.
        ids, qmat = bc.value
        qmat32 = qmat.astype(np.float32)
        # Unit vectors bound every |sim| by 1, so each float32 dot carries
        # deterministic error ≤ ~2·γ_d ≈ 2·d·eps32. The cut compares TWO
        # independently-erring float32 values (candidate vs threshold), so
        # the margin is 2× that — 4·d·eps32 — a deterministic superset
        # guarantee, not a statistical one; it scales with d past the 1e-3
        # floor so very wide embeddings (d ≳ 4k) can't outgrow a constant.
        margin = max(1e-3, 4.0 * qmat.shape[1] * float(np.finfo(np.float32).eps))
        sims_buf = None
        for pdf in batches:
            if pdf.empty:
                continue
            vids_all = pdf[id_col].to_numpy(dtype=np.int64)
            vm_all = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vm_all /= _safe_norms(vm_all)
            vm32_all = vm_all.astype(np.float32)
            for lo in range(0, len(vids_all), TOPK_CHUNK_ROWS):
                vids = vids_all[lo:lo + TOPK_CHUNK_ROWS]
                vm32 = vm32_all[lo:lo + TOPK_CHUNK_ROWS]
                n = len(vids)
                if sims_buf is None or sims_buf.shape != (len(ids), n):
                    sims_buf = np.empty((len(ids), n), dtype=np.float32)
                sims = np.matmul(qmat32, vm32.T, out=sims_buf)
                # self-match exclusion, vectorized: locate each query id
                # in this chunk's (unsorted) vid array via searchsorted
                # on an argsort permutation, then sink its cells to
                # -inf. left/right bounds cover EVERY occurrence of a
                # duplicated id (dirty ingest), not just the first —
                # a single-position sink would let the second copy of a
                # self row survive as sim=1.0.
                order_v = np.argsort(vids)
                sv = vids[order_v]
                left = np.searchsorted(sv, ids, side="left")
                right = np.searchsorted(sv, ids, side="right")
                cnt = right - left
                if cnt.any():
                    hit_q = np.repeat(np.arange(len(ids)), cnt)
                    total = int(cnt.sum())
                    starts = np.repeat(left, cnt)
                    offs = (
                        np.arange(total)
                        - np.repeat(np.cumsum(cnt) - cnt, cnt)
                    )
                    sims[hit_q, order_v[starts + offs]] = -np.inf
                if n > k:
                    nb = n // TOPK_BLOCK
                    if n % TOPK_BLOCK == 0 and nb > k:
                        bm = sims.reshape(
                            len(ids), nb, TOPK_BLOCK
                        ).max(axis=2)
                        thr = np.partition(bm, nb - k, axis=1)[:, nb - k]
                    else:
                        # ragged tail chunk: direct per-row introselect
                        # on the small remainder
                        thr = np.partition(sims, n - k, axis=1)[:, n - k]
                    # & isfinite: mirrored guard to sq_l2_topk — a chunk
                    # where a duplicated query id leaves fewer than k
                    # finite entries yields thr=-inf, and -inf >= -inf
                    # would re-admit the sunk self rows.
                    mask = (
                        sims >= (thr - margin)[:, None]
                    ) & np.isfinite(sims)
                else:
                    mask = np.isfinite(sims)
                q_idx, v_idx = np.nonzero(mask)
                # exact float64 re-score of the ~k survivors per query —
                # the emitted value is identical to the all-float64 path
                vals = np.round(
                    np.einsum(
                        "ij,ij->i",
                        qmat[q_idx],
                        vm_all[lo:lo + TOPK_CHUNK_ROWS][v_idx],
                    ),
                    6,
                )
                yield pd.DataFrame(
                    {
                        "query_id": ids[q_idx],
                        "match_id": vids[v_idx],
                        "sim": vals,
                    }
                )

    par = spark.sparkContext.defaultParallelism
    local = _spread_to_cores(
        vectors.select(id_col, vec_col), par
    ).mapInPandas(_local_topk, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", F.col("rank").cast("bigint").alias("rank"))
    )


def sq_l2_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
    max_driver_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Exact top-k by SQUARED L2 distance (ascending) for every query
    vector, self-match excluded — the L2 sibling of :func:`cosine_topk`
    with the same two-stage shape: broadcast query matrix, one BLAS
    expansion per Arrow chunk (‖v‖² + ‖q‖² − 2·v·q), float32 candidate
    pass with a margined threshold cut, exact float64 re-score of the
    ~k survivors, then the global (rounded d2 asc, id asc) window.

    Built for the PQ recall gate's ground-truth side: its original
    zip_with form evaluated |Q|·N interpreted higher-order folds —
    measured e=1.26 SUPER-linear at the 100× lane (657 s: 800M folds) —
    where the contract is Θ(|Q|·N·d) FLOPs that belong in a GEMM. The
    candidate cut emits a SUPERSET of each query's batch-local top-k
    including 6-dp ties (float32 d2 error on O(100)-magnitude values is
    ≲1e-3, far under the 0.01 margin), and the downstream window applies
    the exact rule, so results are identical to the all-float64 path.
    """
    spark = vectors.sparkSession
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    qrows = _collect_bounded(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "the query side of sq_l2_topk",
        max_driver_rows,
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id bigint, match_id bigint, d2 double, rank bigint"
        )
    q_ids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qm = np.array([r.qv for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((q_ids, qm))

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qmat = bc.value
        qmat32 = qmat.astype(np.float32)
        q2_32 = np.einsum("ij,ij->i", qmat32, qmat32)
        # The float32 cancellation error of the ‖v‖²+‖q‖²−2·v·q expansion
        # scales with the squared norms (γ_d·magnitude), so a FIXED
        # candidate margin silently cuts true top-k members once ‖·‖²
        # outgrows the O(100) regime the old constant assumed. Each
        # expanded value carries deterministic error ≤ ~2·γ_d·(‖q‖²+‖v‖²),
        # and the cut compares TWO independently-erring values (candidate
        # vs threshold), so the margin is twice that:
        # 4·d·eps32·(max‖q‖² + max per-chunk ‖v‖²) — a deterministic
        # superset bound. The 1e-2 floor keeps the benign-case candidate
        # count unchanged.
        eps32 = float(np.finfo(np.float32).eps)
        dim = qmat.shape[1]
        q2max = float(q2_32.max())
        d2_buf = None
        for pdf in batches:
            if pdf.empty:
                continue
            vids_all = pdf[id_col].to_numpy(dtype=np.int64)
            vm_all = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vm32_all = vm_all.astype(np.float32)
            for lo in range(0, len(vids_all), TOPK_CHUNK_ROWS):
                vids = vids_all[lo:lo + TOPK_CHUNK_ROWS]
                vm32 = vm32_all[lo:lo + TOPK_CHUNK_ROWS]
                n = len(vids)
                if d2_buf is None or d2_buf.shape != (len(ids), n):
                    d2_buf = np.empty((len(ids), n), dtype=np.float32)
                np.matmul(qmat32, vm32.T, out=d2_buf)
                d2_buf *= -2.0
                d2_buf += q2_32[:, None]
                v2_32 = np.einsum("ij,ij->i", vm32, vm32)
                d2_buf += v2_32[None, :]
                # self-exclusion: sink EVERY occurrence of a query id in
                # this chunk (dup-id-safe — same discipline as
                # cosine_topk)
                order_v = np.argsort(vids)
                sv = vids[order_v]
                left = np.searchsorted(sv, ids, side="left")
                right = np.searchsorted(sv, ids, side="right")
                cnt = right - left
                if cnt.any():
                    hit_q = np.repeat(np.arange(len(ids)), cnt)
                    total = int(cnt.sum())
                    starts = np.repeat(left, cnt)
                    offs = (
                        np.arange(total)
                        - np.repeat(np.cumsum(cnt) - cnt, cnt)
                    )
                    d2_buf[hit_q, order_v[starts + offs]] = np.inf
                if n > k:
                    thr = np.partition(d2_buf, k - 1, axis=1)[:, k - 1]
                    margin = max(
                        1e-2,
                        4.0 * dim * eps32 * (q2max + float(v2_32.max())),
                    )
                    # & isfinite: when a duplicated query id leaves fewer
                    # than k finite entries in a chunk, thr itself is
                    # +inf and inf <= inf+margin would re-admit the sunk
                    # self rows — they'd re-score exactly to d2=0 and an
                    # exact-dup self copy would rank #1, violating the
                    # self-excluded contract.
                    mask = (
                        d2_buf <= (thr + margin)[:, None]
                    ) & np.isfinite(d2_buf)
                else:
                    mask = np.isfinite(d2_buf)
                q_idx, v_idx = np.nonzero(mask)
                diff = (
                    qmat[q_idx]
                    - vm_all[lo:lo + TOPK_CHUNK_ROWS][v_idx]
                )
                vals = np.round(
                    np.einsum("ij,ij->i", diff, diff), round_digits
                )
                yield pd.DataFrame(
                    {
                        "query_id": ids[q_idx],
                        "match_id": vids[v_idx],
                        "d2": vals,
                    }
                )

    par = spark.sparkContext.defaultParallelism
    local = _spread_to_cores(
        vectors.select(id_col, vec_col), par
    ).mapInPandas(
        _local_topk, schema="query_id long, match_id long, d2 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("match_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "match_id",
            "d2",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = round(127/max|x|, 6)``
    (rounded so the factor is engine-portable), ``q_i = floor(x_i·scale+0.5)``
    (explicit half-up — identical in any IEEE engine). 4× smaller vectors for
    the ANN candidate stage; runs entirely in higher-order functions
    (aggregate/transform), no Python, no shuffle.
    """
    v = F.col(vec_col)
    maxabs = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.round(F.lit(127.0) / F.nullif(maxabs, F.lit(0.0)), 6)
    quant = F.transform(
        v, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int")
    )
    return vectors.select(
        F.col(id_col),
        scale.alias("scale"),
        quant.alias("q"),
    )


def suggest_n_cells(
    corpus_rows: int,
    target_cell_rows: int = 4096,
    min_cells: int = 1,
    max_cells: int = DEFAULT_MAX_BROADCAST_ROWS,
) -> int:
    """Scale the IVF cell count with the corpus instead of fixing it.

    The within-cell pair stage of embedding dedup costs O(Σ cell²) total
    work ≈ O(rows²/n_cells); holding the PER-CELL population near
    ``target_cell_rows`` (n_cells ≈ rows/target) makes that stage
    O(rows × target) — linear in the corpus — which is the difference
    between a plan that survives a 100× scale-up and one that quietly
    goes quadratic (the round-9 BASELINE §sf1 residual: a fixed
    n_cells=8 means cells grow ∝ corpus). Clamped to
    [min_cells, max_cells]: the centroid matrix is collected/broadcast
    driver-side, so the ceiling is the bounded-collect broadcast cap.

    This is the dedup/assignment-cost knob; for pure ANN recall-vs-speed
    the classical sqrt-ish rules also apply — callers tuning recall
    should still run ``ann_recall_eval`` against their choice.
    """
    import math

    if corpus_rows < 0:
        raise ValueError("corpus_rows must be >= 0")
    if target_cell_rows <= 0:
        raise ValueError("target_cell_rows must be > 0")
    return max(min_cells, min(max_cells, math.ceil(corpus_rows / target_cell_rows)))


def ivf_assign(
    vectors: DataFrame,
    centroids: "DataFrame | Sequence[tuple]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    max_driver_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Assign every vector to its nearest centroid (rounded cosine; ties →
    smallest centroid id). The centroid matrix ships to every task; one
    matmul per Arrow batch, no shuffle and no per-row window.
    ``keep_cols``: extra input columns carried through unchanged (e.g. an
    event-time column for the streaming purity twin).

    ``centroids`` may be a DataFrame (collected here, bounded) or a
    driver-side sequence of ``(centroid_id, vector)`` tuples. The matrix
    ends up on the driver either way — trained centroid state IS
    driver-sized by contract — so a caller that already holds the rows
    (a literal init state, a trainer's previous round) skips the
    limit+collect round trip entirely: that collect is a whole Spark job
    whose fixed cost dominates small-state callers (guide §5 — keep
    driver work off the query path).
    """
    spark = vectors.sparkSession
    # null vectors/centroids are dropped, not crashed on (see cosine_topk)
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    crows = _centroid_rows(centroids, vec_col, centroid_id, max_driver_rows)
    in_schema = vectors.select(id_col, vec_col, *keep_cols).schema
    out_schema = StructType(
        [
            in_schema[id_col],
            StructField(centroid_id, LongType()),
            in_schema[vec_col],
            *[in_schema[c] for c in keep_cols],
        ]
    )
    if not crows:
        # empty-in → empty-out: an empty centroid frame (empty corpus
        # upstream) must not crash with a numpy AxisError mid-pipeline
        return spark.createDataFrame([], out_schema)
    # sorted by centroid id so argmax's first-max rule == smallest-id tiebreak
    crows.sort(key=lambda r: r.cid)
    c_ids = np.array([r.cid for r in crows], dtype=np.int64)
    cm = np.array([r.cv for r in crows], dtype=np.float64)
    cn = cm / _safe_norms(cm)
    bc = spark.sparkContext.broadcast((c_ids, cn))

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cmat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vm /= _safe_norms(vm)
            sims = np.round(vm @ cmat.T, 6)
            nearest = ids[np.argmax(sims, axis=1)]
            out = {
                id_col: pdf[id_col],
                centroid_id: nearest,
                vec_col: pdf[vec_col],
            }
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    par = spark.sparkContext.defaultParallelism
    selected = vectors.select(id_col, vec_col, *keep_cols)
    if not selected.isStreaming:
        # spread past scan parallelism when underfilled; a streaming
        # source manages its own micro-batch partitioning (and a pre-map
        # repartition would add a stateless shuffle per batch for nothing)
        selected = _spread_to_cores(selected, par)
    return selected.mapInPandas(_assign, schema=out_schema)


def ivf_assign_probes(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    max_driver_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Multi-probe assignment: one row per (vector, cell) for the
    ``nprobe`` NEAREST cells (rounded cosine; ties → smaller centroid id)
    — the standard IVF search widening (probe several cells, not one) that
    trades candidate volume for recall. Feed the result as
    ``queries_assigned`` into :func:`ivf_topk`: members live in exactly
    one cell, so the per-cell candidate sets a multi-probed query sees are
    disjoint and the global top-k window merges them exactly. Same
    broadcast-matmul shape as :func:`ivf_assign` — no shuffle, no per-row
    work.
    """
    spark = vectors.sparkSession
    # null vectors/centroids are dropped, not crashed on (see cosine_topk)
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    crows = _collect_bounded(
        centroids.filter(F.col(vec_col).isNotNull()).select(
            F.col(centroid_id).alias("cid"), F.col(vec_col).alias("cv")
        ),
        "the centroid side of ivf_assign_probes",
        max_driver_rows,
    )
    in_schema = vectors.select(id_col, vec_col).schema
    out_schema = StructType(
        [
            in_schema[id_col],
            StructField(centroid_id, LongType()),
            in_schema[vec_col],
        ]
    )
    if not crows:
        # empty-in → empty-out, matching ivf_assign's empty posture
        return spark.createDataFrame([], out_schema)
    crows.sort(key=lambda r: r.cid)
    c_ids = np.array([r.cid for r in crows], dtype=np.int64)
    cm = np.array([r.cv for r in crows], dtype=np.float64)
    cn = cm / _safe_norms(cm)
    bc = spark.sparkContext.broadcast((c_ids, cn))
    n_probe = min(int(nprobe), len(crows))

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cmat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vm /= _safe_norms(vm)
            sims = np.round(vm @ cmat.T, 6)
            # (sim desc, cid asc): ids are sorted ascending, so a stable
            # argsort on -sims yields the smaller cid first among ties
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_probe),
                    centroid_id: ids[order].reshape(-1),
                    vec_col: pdf[vec_col].to_numpy().repeat(n_probe),
                }
            )

    selected = vectors.select(id_col, vec_col)
    if not selected.isStreaming:
        selected = _spread_to_cores(
            selected, spark.sparkContext.defaultParallelism
        )
    return selected.mapInPandas(_probe, schema=out_schema)


def ivf_topk(
    assigned: DataFrame,
    queries_assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    k: int = 5,
    n_shards: int = 8,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's cell.
    The join key is the centroid id — candidate pruning happens in the join
    itself, which is the whole point of IVF at scale.

    Cells are additionally SUB-SHARDED (deterministic id-hash into
    ``n_shards`` slices, cell queries replicated to every slice) so a hot
    cell never lands in one task: local top-k per (cell, shard), then a
    global window over ≤ shards×k rows per query. Exact w.r.t. the
    unsharded form — same candidate set, same rounding, same
    (sim desc, id) tiebreak — so results are shard-count-invariant.
    """
    q_keyed = queries_assigned.select(
        F.col(centroid_id), F.col(id_col).alias("__qid"), F.col(vec_col)
    )
    # members keep their own shard; cell queries replicate to every shard
    members = assigned.select(
        F.col(centroid_id),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("__shard"),
        F.col(id_col),
        F.col(vec_col),
        F.lit(False).alias("is_query"),
    )
    replicas = q_keyed.withColumn(
        "__shard", F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1)))
    ).select(
        F.col(centroid_id),
        F.col("__shard").cast("bigint"),
        F.col("__qid").alias(id_col),
        F.col(vec_col),
        F.lit(True).alias("is_query"),
    )
    cells = members.unionByName(replicas)

    def _slice_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qmask = pdf["is_query"].to_numpy()
        if qmask.all() or not qmask.any():
            return pd.DataFrame(columns=["query_id", "match_id", "sim"])
        vids = pdf[id_col].to_numpy(dtype=np.int64)
        vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        vm /= _safe_norms(vm)
        qids = vids[qmask]
        cand_ids_all = vids[~qmask]
        sims = np.round(vm[~qmask] @ vm[qmask].T, 6)  # (n_members, n_q)
        out_q, out_m, out_s = [], [], []
        for j, qid in enumerate(qids):
            mask = cand_ids_all != qid  # a query never matches itself
            cand_ids = cand_ids_all[mask]
            cand = sims[mask, j]
            order = np.lexsort((cand_ids, -cand))[:k]
            out_q.extend([qid] * len(order))
            out_m.extend(cand_ids[order])
            out_s.extend(cand[order])
        return pd.DataFrame({"query_id": out_q, "match_id": out_m, "sim": out_s})

    local = (
        cells.groupBy(centroid_id, "__shard")
        .applyInPandas(
            _slice_topk,
            schema=StructType(
                [
                    StructField("query_id", LongType()),
                    StructField("match_id", LongType()),
                    StructField("sim", DoubleType()),
                ]
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "match_id", "sim", F.col("rank").cast("bigint")
        )
    )


# Mean-path selection for the Lloyd-round cell mean: the column path
# builds ONE F.avg(vec[i]) aggregate column PER DIMENSION — fine at the
# fixture's d=64, but at real embedding widths (768–4096) that is
# thousands of codegen aggregate expressions per training round: a
# plan-size/compile cliff that only bites at deployment. Above this
# threshold the mean folds through the same Arrow (sum, count) partial
# shape pq_train already uses, whose plan size is O(1) in d. 256 keeps
# every in-repo fixture on the zero-Python codegen path while routing
# real embedding widths to the partial path; the two paths are
# equivalence-pinned at d=64 and the plan shapes are pinned at d=512
# (tests/test_trainer_mean_path.py).
#
# The crossover is ROW-COUNT-dependent (ivf_mean_dim_probe.json, round
# 18/19): the column path's fixed codegen/compile premium amortizes over
# rows while the Arrow path's per-row boundary cost does not, so the
# break-even dim RISES with the row count — measured ≈160 at 2k rows and
# between 256 (column wins) and 384 (arrow wins) at 100k rows. "auto"
# interpolates log-linearly between those measured anchors from the
# PLAN-ONLY size estimate (no probe job — same posture as spread());
# frames with unknown Catalyst stats fall back to this dim-only
# constant. Anchors are clamped, never extrapolated: beyond 100k rows
# the threshold stays at the largest measured value — the plan-size
# cliff argument for Arrow at real embedding widths is unchanged.
IVF_MEAN_ARROW_MIN_DIM = 256
_MEAN_CROSSOVER_ANCHORS = ((2_000, 160.0), (100_000, 320.0))


def _arrow_mean_min_dim(n_rows_est: int) -> float:
    """Measured break-even dim for the cell-mean Arrow path at an
    estimated row count (see the crossover note above)."""
    import math

    (r0, d0), (r1, d1) = _MEAN_CROSSOVER_ANCHORS
    if n_rows_est <= r0:
        return d0
    if n_rows_est >= r1:
        return d1
    frac = (math.log(n_rows_est) - math.log(r0)) / (
        math.log(r1) - math.log(r0)
    )
    return d0 + frac * (d1 - d0)


def _catalyst_row_bytes(schema) -> int:
    """Catalyst's defaultSize of one row of ``schema`` — the divisor
    that converts a plan size estimate into a row-count estimate.
    Mirrors DataType.defaultSize: fixed-width types their width,
    strings 20, ARRAYS ONE ELEMENT (Catalyst cannot see lengths, which
    is exactly why bytes/(8·dim) is the wrong divisor for vector
    frames). Exact for local relations (whose stats are rows ×
    defaultSize); for parquet scans the file-bytes estimate then
    OVERcounts rows (real vector rows are far wider than defaultSize),
    which only clamps the threshold at the big-rows anchor — the safe
    direction at scale."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructType,
    )

    def one(dt) -> int:
        if isinstance(dt, (ByteType, BooleanType)):
            return 1
        if isinstance(dt, ShortType):
            return 2
        if isinstance(dt, (IntegerType, FloatType)):
            return 4
        if isinstance(dt, (LongType, DoubleType)):
            return 8
        if isinstance(dt, StringType):
            return 20
        if isinstance(dt, ArrayType):
            return one(dt.elementType)
        if isinstance(dt, StructType):
            return sum(one(f.dataType) for f in dt.fields)
        return 8

    return max(1, sum(one(f.dataType) for f in schema.fields))


def _cell_mean_agg(
    assigned: DataFrame,
    dim: int,
    centroid_id: str = "centroid_id",
    vec_col: str = "embedding",
    mean_path: str = "auto",
) -> DataFrame:
    """Element-wise per-cell mean of the raw vectors — the shared round
    body of :func:`ivf_train` / :func:`ivf_train_step`. Returns one row
    per NON-EMPTY cell: (centroid_id, n_members bigint, __mean
    array<double>).

    Two plans, same numbers (both are sum-then-divide in doubles;
    association differs only at ulp level across paths/partitionings,
    absorbed by the trainers' round-6 output contract):

    - ``"column"`` (auto-selected for dim <= IVF_MEAN_ARROW_MIN_DIM):
      d ``avg`` aggregate columns — map-side partial, whole-stage
      codegen, no Python — re-packed into one array.
    - ``"arrow"`` (auto-selected above): a ``mapInPandas`` partial emits
      at most one (cell, count, sum-vector) row per cell per batch —
      ONE array column instead of d scalar aggregate expressions, so
      the generated plan does not grow with d — folded per cell by an
      ``applyInPandas`` over the tiny partial set (≤ n_partitions rows
      per cell, k cells total).
    """
    if mean_path == "auto":
        threshold: float = IVF_MEAN_ARROW_MIN_DIM
        if dim > 0:
            from xena_gdc_etl_spark.operators.partitioning import (
                SIZE_UNKNOWN_SENTINEL,
                estimated_size_bytes,
            )

            size = estimated_size_bytes(assigned)
            if size < SIZE_UNKNOWN_SENTINEL:
                rows_est = size // _catalyst_row_bytes(assigned.schema)
                threshold = _arrow_mean_min_dim(max(1, rows_est))
        mean_path = "arrow" if dim > threshold else "column"
    if mean_path == "column":
        return (
            assigned.groupBy(centroid_id)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_members"),
                *[
                    F.avg(F.col(vec_col).getItem(i)).alias(f"__c{i}")
                    for i in range(dim)
                ],
            )
            .select(
                F.col(centroid_id),
                F.col("n_members"),
                F.array(*[F.col(f"__c{i}") for i in range(dim)]).alias(
                    "__mean"
                ),
            )
        )
    if mean_path != "arrow":
        raise ValueError(
            f"mean_path must be 'auto', 'column' or 'arrow', got {mean_path!r}"
        )

    partial_schema = StructType(
        [
            StructField(centroid_id, LongType()),
            StructField("__n", LongType()),
            StructField("__sum", ArrayType(DoubleType())),
        ]
    )

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cids = pdf[centroid_id].to_numpy(dtype=np.int64)
            uniq = np.unique(cids)
            sums = [vm[cids == c].sum(axis=0).tolist() for c in uniq]
            yield pd.DataFrame(
                {
                    centroid_id: uniq,
                    "__n": [int((cids == c).sum()) for c in uniq],
                    "__sum": sums,
                }
            )

    fold_schema = StructType(
        [
            StructField(centroid_id, LongType()),
            StructField("n_members", LongType()),
            StructField("__mean", ArrayType(DoubleType())),
        ]
    )

    def _fold(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["__n"].sum())
        s = np.stack(pdf["__sum"].to_numpy()).astype(np.float64).sum(axis=0)
        return pd.DataFrame(
            {
                centroid_id: [int(key[0])],
                "n_members": [n],
                "__mean": [(s / n).tolist()],
            }
        )

    return (
        assigned.select(centroid_id, vec_col)
        .mapInPandas(_partials, schema=partial_schema)
        .groupBy(centroid_id)
        .applyInPandas(_fold, schema=fold_schema)
    )


def ivf_train(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    mean_path: str = "auto",
) -> DataFrame:
    """Train IVF centroids with Lloyd's k-means — deterministic for a
    fixed input partitioning: init = the ``k`` smallest-id vectors
    (reproducible, no RNG), fixed ``iterations`` (no data-dependent
    stopping), cosine assignment with the same rounding/tiebreak as
    ``ivf_assign``. Re-partitioning the input re-associates the per-cell
    mean fold, so centroids agree only to fp-association (ulp) level
    across different partitionings.

    Per round: one broadcast of the k×d centroid matrix + one matmul per
    Arrow batch (assignment), then one partial-aggregated groupBy for the
    per-cell mean, COLLECTED as k×d floats and re-emitted as literal
    values for the next round. Collecting the (bounded, k rows × d
    doubles) means each round is load-bearing, not convenience: an
    earlier version threaded the new centroids through as a DataFrame
    join against the previous frame, so round N's centroid lineage
    contained rounds 1..N-1's aggregation subtrees and each round's
    centroid collect re-executed EVERY prior round's corpus pass —
    O(iterations²) scans. With literal re-emission each round runs
    exactly one corpus pass and the driver only ever holds k×d floats
    (doubles round-trip the driver exactly, so results are bit-identical
    to the joined form for a fixed partitioning).
    """
    vectors = vectors.filter(F.col(vec_col).isNotNull())  # nulls dropped
    dim = len(vectors.select(vec_col).first()[0])
    init = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col))
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"ivf_train needs at least {k} vectors, got {len(init)}")
    # centroid_id → vector, maintained driver-side (k×d floats)
    cents: dict[int, list] = {i: list(r[0]) for i, r in enumerate(init)}

    def _centroid_rows_sorted() -> list:
        return [
            (int(i), [float(x) for x in v]) for i, v in sorted(cents.items())
        ]

    def _centroid_frame() -> DataFrame:
        from xena_gdc_etl_spark.operators.partitioning import local_rows_df

        return local_rows_df(
            vectors.sparkSession,
            _centroid_rows_sorted(),
            StructType(
                [
                    StructField(centroid_id, LongType()),
                    StructField(vec_col, ArrayType(DoubleType())),
                ]
            ),
        )

    for _ in range(iterations):
        # the state is already driver-side — hand ivf_assign the rows
        # instead of a frame it would pay a limit+collect job to read back
        assigned = ivf_assign(
            vectors,
            _centroid_rows_sorted(),
            id_col=id_col,
            vec_col=vec_col,
            centroid_id=centroid_id,
        )
        # element-wise mean per cell (_cell_mean_agg: d avg columns below
        # IVF_MEAN_ARROW_MIN_DIM, an Arrow (sum,count) partial above);
        # the collect is k rows of d doubles — index state, never data
        rows = _cell_mean_agg(
            assigned, dim, centroid_id, vec_col, mean_path
        ).collect()
        for r in rows:
            # a cell that attracted no vectors has no row and keeps its
            # previous centroid instead of silently vanishing
            cents[r[centroid_id]] = list(r["__mean"])
    return _centroid_frame()


def norm_outliers(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Embedding health screen: per-vector L2 norm, its z-score against
    the corpus norm distribution, and an outlier flag (|z| > threshold).
    Collapsed/exploded embeddings (near-zero or huge norms — encoder
    failures, wrong preprocessing) are the vector-side analog of the
    text quality filters and should be screened before dedup/ANN, where
    they distort cells and cosine thresholds.

    Plan: one scan computing the norm (codegen higher-order aggregate,
    no Python), a 1-row mean/stddev aggregate broadcast back, zero
    shuffles of the corpus. stddev is the SAMPLE one (stddev_samp) —
    matched exactly by the oracle.
    """
    e = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    with_norm = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), norm.alias("__norm")
    )
    stats = with_norm.agg(
        F.avg("__norm").alias("__mu"),
        F.stddev_samp("__norm").alias("__sd"),
    )
    z = (F.col("__norm") - F.col("__mu")) / F.col("__sd")
    return with_norm.join(F.broadcast(stats)).select(
        F.col(id_col),
        F.round("__norm", 6).alias("norm"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > z_threshold).cast("int").alias("is_outlier"),
    )


def ivf_train_step(
    vectors: DataFrame,
    centroids: "DataFrame | Sequence[tuple]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    dim: int | None = None,
    mean_path: str = "auto",
) -> DataFrame:
    """ONE Lloyd round under a FIXED centroid state, returned as a
    DataFrame — the per-round body of :func:`ivf_train` factored out so
    the trainer's numerics can be oracle-gated: assignment (rounded-6
    cosine, smallest-centroid-id tiebreak — ``ivf_assign``) followed by
    the element-wise per-cell mean of the RAW vectors, all
    SQL-expressible once the centroid state is frozen. Cells that
    attract no vectors keep their previous centroid (``ivf_train``'s
    keep-previous rule) with ``n_members = 0``.

    ``centroids``: a DataFrame, or a driver-side sequence of
    ``(centroid_id, vector)`` tuples — same contract and same result as
    :func:`ivf_assign`; the sequence form skips the collect job.

    Output: (centroid_id, n_members, ``vec_col`` = updated centroid).
    Fully distributed — one broadcast-matmul assignment pass + one
    partial-aggregated groupBy; nothing corpus-sized reaches the driver.
    """
    if isinstance(centroids, DataFrame):
        if dim is None:
            # one tiny job; callers that know their dimension pass it
            # and skip this probe
            dim = len(centroids.select(vec_col).first()[0])
        prev = centroids.select(
            F.col(centroid_id),
            F.col(vec_col).cast("array<double>").alias("__prev"),
        )
    else:
        # driver-side state (see ivf_assign): no collect job for the
        # assignment, and the keep-previous join side becomes a ONE-slice
        # local frame — a k-slice default would cost a task per core in
        # the broadcast-build job for k tiny rows
        if dim is None:
            dim = len(centroids[0][1])
        from xena_gdc_etl_spark.operators.partitioning import local_rows_df

        spark = vectors.sparkSession
        prev = local_rows_df(
            spark,
            [(int(c), [float(x) for x in v]) for c, v in centroids],
            f"{centroid_id} long, __prev array<double>",
        )
    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id=centroid_id,
    )
    agg = _cell_mean_agg(assigned, dim, centroid_id, vec_col, mean_path)
    return (
        prev
        .join(agg, centroid_id, "left")
        .select(
            F.col(centroid_id),
            F.coalesce("n_members", F.lit(0)).cast("long").alias(
                "n_members"
            ),
            F.when(F.col("n_members").isNotNull(), F.col("__mean"))
            .otherwise(F.col("__prev"))
            .alias(vec_col),
        )
    )


# One cap-configured notice per process (INFO): see cosine_dup_pairs.
_CAP_NOTICE_LOGGED = False


def capped_cell_count(
    assigned: DataFrame,
    max_cell_size: int,
    centroid_id: str = "centroid_id",
) -> int:
    """Number of IVF cells whose membership exceeds ``max_cell_size`` —
    the on-demand accounting for :func:`cosine_dup_pairs`'s cap opt-out
    (the pairs plan itself stays action-free). One map-side-partial
    groupBy reduced to a single driver row.
    """
    return (
        assigned.groupBy(centroid_id)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_cell_size)
        .count()
    )


def cosine_dup_pairs(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    threshold: float = 0.95,
    max_cell_size: int | None = None,
    block_size: int = 10_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, candidates limited
    to vectors sharing an IVF cell (bucketed, not global O(n²)).

    Hot cells are SUB-SHARDED, not dropped: a cell with n > ``block_size``
    members splits into ``nb = ceil(n/block_size)`` deterministic id-hash
    blocks and each (block_i ≤ block_j) pair becomes its own task —
    triangle tasks for i == j, cross tasks otherwise — so every task
    scores at most ~2·block_size vectors while the PAIR SET stays exactly
    the uncapped one (near-duplicates concentrate in hot cells, which is
    precisely where a fail-open drop would un-deduplicate). The total
    O(n²/…) sim count is inherent to exact pairing — for degenerate
    mega-cells re-train a finer index rather than raising block counts.

    ``max_cell_size`` is an optional TOTAL cap for deliberate cost
    ceilings: cells above it are excluded before pairing, and — per the
    no-silent-caps convention — the number of dropped cells is logged at
    WARNING (callers that need the count can pre-aggregate sizes). With
    the default ``None`` the operator is exact and matches a caps-free
    oracle regardless of cell-size distribution.
    """
    out_schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def _block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[1]), int(key[2])
        vids = pdf[id_col].to_numpy(dtype=np.int64)
        vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        vm /= _safe_norms(vm)
        if bi == bj:
            sims = np.round(vm @ vm.T, 6)
            iu, ju = np.triu_indices(len(vids), k=1)
            li, ri = vids[iu], vids[ju]
            vals = sims[iu, ju]
        else:
            left = pdf["__b"].to_numpy() == bi
            sims = np.round(vm[left] @ vm[~left].T, 6)
            iu, ju = np.nonzero(np.ones_like(sims, dtype=bool))
            li, ri = vids[left][iu], vids[~left][ju]
            vals = sims[iu, ju]
        # canonical (a < b) orientation regardless of row order in the cell
        ai, bi_ = np.minimum(li, ri), np.maximum(li, ri)
        keep = vals >= threshold
        return pd.DataFrame({"a": ai[keep], "b": bi_[keep], "sim": vals[keep]})

    cells = assigned.select(centroid_id, id_col, vec_col)
    sizes = cells.groupBy(centroid_id).agg(F.count(F.lit(1)).alias("__n"))
    if max_cell_size is not None:
        # Lazy accounting: no job at construction time (plan building must
        # stay action-free — the former eager count here ran a full
        # corpus aggregation per call just to log). Configuring the cap is
        # NOT a problem by itself, so this logs at INFO, once per process
        # — WARNING is reserved for an actual drop, which only a job can
        # observe; callers wanting that signal call
        # :func:`capped_cell_count` (one bounded groupBy) before/after the
        # run. Sub-sharding is the default path precisely so this opt-out
        # is rarely used.
        import logging

        global _CAP_NOTICE_LOGGED
        if not _CAP_NOTICE_LOGGED:
            _CAP_NOTICE_LOGGED = True
            logging.getLogger(__name__).info(
                "cosine_dup_pairs: max_cell_size=%d configured — cells "
                "over the cap are excluded from pairing (fail-open for "
                "dedup); call capped_cell_count() for the actual dropped-"
                "cell count; the default sub-sharding path "
                "(max_cell_size=None) pairs every cell exactly",
                max_cell_size,
            )
        sizes = sizes.filter(F.col("__n") <= max_cell_size)
    nb = F.greatest(
        F.lit(1), F.ceil(F.col("__n") / F.lit(block_size))
    ).cast("int")
    sized = cells.join(
        F.broadcast(sizes.select(centroid_id, nb.alias("__nb"))), centroid_id
    )
    blocked = sized.withColumn(
        "__b", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nb")).cast("int")
    )
    # replicate each vector to every (its block, partner block) task key;
    # replication factor = nb per vector, 1 when the cell fits one block
    tasks = (
        blocked.withColumn(
            "__t", F.explode(F.sequence(F.lit(0), F.col("__nb") - 1))
        )
        .withColumn("__bi", F.least("__b", "__t"))
        .withColumn("__bj", F.greatest("__b", "__t"))
    )
    return tasks.groupBy(centroid_id, "__bi", "__bj").applyInPandas(
        _block_pairs, schema=out_schema
    )


def semantic_dedup(
    assigned: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023): vectors
    whose embeddings are near-identical (cosine ≥ τ within an IVF cell)
    form clusters; one representative per cluster survives.

    Plan: candidate pairs come cell-bucketed from ``cosine_dup_pairs``
    (never global O(n²); hot cells sub-shard into block-pair tasks, so
    the pair set is exact and matches a caps-free oracle); clusters are
    connected components over the
    pair graph, run through the bipartite propagation engine
    (``connected_components_bipartite``, dedup.py) by treating every pair
    as a 2-member bucket node — O(pairs) edges, aggregate-only driver
    loop, the same 100 TB shape as the MinHash cluster path. The keep
    decision (smallest id represents the cluster) is a projection off the
    labels, not a per-cluster window.

    Returns (id, cluster_id, keep ∈ {0,1}); singletons keep themselves.

    ``pairs`` injects an already-materialized τ-pair frame (e.g. the
    session-scoped shared cache in workload.py) so dedup variants that
    share candidate generation don't recompute it; when omitted the pairs
    are computed here. CONTRACT: an injected frame is used as-is — the
    ``threshold``/column arguments describe only the self-computed path,
    and nothing can validate that an injected frame was built at the same
    τ, so the caller owns that consistency (the workload cache keys on
    (sf_dir, τ) for exactly this reason).
    """
    from xena_gdc_etl_spark.operators.dedup import (
        connected_components_bipartite,
    )

    if pairs is None:
        pairs = cosine_dup_pairs(
            assigned, id_col=id_col, vec_col=vec_col,
            centroid_id=centroid_id, threshold=threshold,
        )
    bkey = F.concat_ws("_", F.col("a"), F.col("b")).alias("bkey")
    edges = pairs.select(F.col("a").alias(id_col), bkey).unionByName(
        pairs.select(F.col("b").alias(id_col), bkey)
    )
    labels = connected_components_bipartite(
        assigned.select(id_col), edges, id_col=id_col
    )
    return labels.select(
        F.col(id_col),
        F.col("cluster_id"),
        (F.col("cluster_id") == F.col(id_col)).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory side of the IVF-PQ layout that makes
# billion-vector ANN feasible — each d-dim float vector compresses to m
# uint8 codes (one per subspace), and query-time distances come from an
# m×k lookup table (asymmetric distance computation, ADC) instead of
# touching raw vectors. Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 (public method).
# ---------------------------------------------------------------------------


def pq_train(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[np.ndarray]:
    """Train per-subspace codebooks with deterministic Lloyd's k-means
    (same determinism contract as ``ivf_train``: smallest-id init, fixed
    iterations, first-min tiebreak). Returns ``m`` arrays of shape (k,
    d/m) on the driver — codebooks are k·d floats TOTAL (kilobytes), the
    one piece of ANN state that is *supposed* to live driver-side and
    broadcast.

    Per round each subspace needs only (sum, count) per centroid — one
    partial-aggregated pass over the corpus computes ALL subspaces'
    assignments and sums inside Arrow batches; the driver folds m×k
    running sums, never rows.
    """
    vectors = vectors.filter(F.col(vec_col).isNotNull())  # nulls dropped
    probe = vectors.select(vec_col).first()
    if probe is None:
        raise ValueError(
            f"pq_train needs at least one non-null '{vec_col}' vector; "
            "input is empty or all-null"
        )
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    init_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init_rows)}")
    books = [
        np.array([r[1][j * sub : (j + 1) * sub] for r in init_rows])
        for j in range(m)
    ]

    spark = vectors.sparkSession
    agg_schema = StructType(
        [
            StructField("subspace", LongType()),
            StructField("centroid", LongType()),
            StructField("n", LongType()),
            *[StructField(f"s{i}", DoubleType()) for i in range(sub)],
        ]
    )

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast([b.copy() for b in books])

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            codebooks = bc.value
            sums = np.zeros((m, k, sub))
            counts = np.zeros((m, k), dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                for j in range(m):
                    sv = vm[:, j * sub : (j + 1) * sub]
                    d2 = ((sv[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    nearest = np.argmin(np.round(d2, 9), axis=1)
                    for c in range(k):
                        mask = nearest == c
                        if mask.any():
                            sums[j, c] += sv[mask].sum(axis=0)
                            counts[j, c] += int(mask.sum())
            rows = []
            for j in range(m):
                for c in range(k):
                    rows.append(
                        (j, c, int(counts[j, c]), *sums[j, c].tolist())
                    )
            yield pd.DataFrame(
                rows, columns=["subspace", "centroid", "n"]
                + [f"s{i}" for i in range(sub)],
            )

        partials = (
            vectors.select(id_col, vec_col)
            .mapInPandas(_partial, schema=agg_schema)
            .groupBy("subspace", "centroid")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(sub)],
            )
            .collect()
        )
        for r in partials:
            j, c, n = r["subspace"], r["centroid"], r["n"]
            if n > 0:
                books[j][c] = np.array([r[f"s{i}"] for i in range(sub)]) / n
            # empty cells keep their previous centroid (ivf_train contract)
        bc.destroy()
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its m nearest-subcentroid codes. Codebooks
    broadcast; one batched distance argmin per subspace; output is
    (id, array<int> of length m) — the 8-bit-per-subspace compressed corpus.
    """
    spark = vectors.sparkSession
    vectors = vectors.filter(F.col(vec_col).isNotNull())  # nulls dropped
    m = len(codebooks)
    sub = codebooks[0].shape[1]
    bc = spark.sparkContext.broadcast(codebooks)

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.zeros((len(vm), m), dtype=np.int32)
            for j in range(m):
                sv = vm[:, j * sub : (j + 1) * sub]
                d2 = ((sv[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(np.round(d2, 9), axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        _encode, schema=out_schema
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    codes_id_col: str | None = None,
    codes_col: str = "codes",
    round_digits: int = 9,
) -> DataFrame:
    """Approximate top-k by ADC: per query, an m×k_codebook table of
    squared subdistances to every subcentroid; a candidate's distance is m
    table lookups summed — the compressed corpus is never decoded. Same
    two-stage top-k shape as ``cosine_topk`` (batch-local top-k ordered by
    the final criterion, then one cheap global window).

    ``id_col``/``vec_col`` name the QUERY side; the codes side follows
    ``pq_encode``'s output (``id_col``/"codes") unless overridden with
    ``codes_id_col``/``codes_col``. ``round_digits`` rounds the summed ADC
    distance (ranking uses the rounded value, then the id tiebreak) — the
    oracle-gated scorer uses 6 so a cross-engine ulp in the m-term sum
    can't flip a digit the hash compare sees.
    """
    codes_id_col = codes_id_col if codes_id_col is not None else id_col
    missing = [c for c in (codes_id_col, codes_col) if c not in codes.columns]
    if missing:
        raise ValueError(
            f"codes side lacks column(s) {missing}; have {codes.columns} — "
            "pass codes_id_col/codes_col to match your pq_encode output"
        )
    spark = codes.sparkSession
    m = len(codebooks)
    qrows = _collect_bounded(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "the query side of pq_topk",
        DEFAULT_MAX_BROADCAST_ROWS,
    )
    if not qrows:
        # empty-in → empty-out (see cosine_topk): no queries, no rows
        return spark.createDataFrame(
            [],
            "query_id bigint, match_id bigint, adc_dist double, rank bigint",
        )
    q_ids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qm = np.array([r.qv for r in qrows], dtype=np.float64)
    sub = codebooks[0].shape[1]
    # (n_query, m, k_codebook) lookup tables, built once on the driver
    tables = np.stack(
        [
            np.stack(
                [
                    (
                        (qm[:, j * sub : (j + 1) * sub][:, None, :]
                         - codebooks[j][None, :, :])
                        ** 2
                    ).sum(axis=2)
                    for j in range(m)
                ],
                axis=1,
            )
        ]
    )[0]
    bc = spark.sparkContext.broadcast((q_ids, tables))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("match_id", LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tabs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[codes_id_col].to_numpy(dtype=np.int64)
            cm = np.stack(pdf[codes_col].to_numpy()).astype(np.int64)
            out_q, out_m, out_d = [], [], []
            for qi, qid in enumerate(ids):
                # dist[v] = sum_j tabs[qi, j, cm[v, j]]
                d = np.round(
                    tabs[qi, np.arange(m)[None, :], cm].sum(axis=1),
                    round_digits,
                )
                mask = vids != qid
                cand_ids = vids[mask]
                cand = d[mask]
                order = np.lexsort((cand_ids, cand))[:k]
                out_q.extend([qid] * len(order))
                out_m.extend(cand_ids[order])
                out_d.extend(cand[order])
            yield pd.DataFrame(
                {"query_id": out_q, "match_id": out_m, "adc_dist": out_d}
            )

    local = codes.mapInPandas(_local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("match_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "match_id",
            "adc_dist",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ivf_pq_train(
    vectors: DataFrame,
    n_cells: int,
    m: int,
    k_codebook: int,
    iterations: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Train IVF centroids AND the m PQ codebooks in ONE corpus scan per
    round. Run separately (``ivf_train`` + ``pq_train``) each round costs
    two full passes plus their driver collects; both trainers need only
    per-group (sum, count) partials, so a single Arrow pass can emit the
    IVF per-cell sums (as m subspace segments — a cell mean is the
    concatenation of its segment means) alongside the PQ per-subcentroid
    sums, halving the jobs the registered ann_ivf_pq query schedules.

    Determinism contract matches the standalone trainers: init = smallest
    ``max(n_cells, k_codebook)`` ids (one collect covers both), cosine
    assignment with round-6 + smallest-id tiebreak for IVF, round-9 L2
    argmin for PQ, empty groups keep their previous centroid. The PQ half
    reproduces ``pq_train`` bit-for-bit (same batch accumulation, same
    partial-fold shape) — pinned by the probe-widening equivalence test.
    Returns (cell centroid matrix (n_cells, d), list of m codebooks).
    """
    spark = vectors.sparkSession
    n_init = max(n_cells, k_codebook)
    vectors = vectors.filter(F.col(vec_col).isNotNull())  # nulls dropped
    init_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_init)
        .collect()
    )
    if not init_rows:
        raise ValueError(
            f"ivf_pq_train needs at least one non-null '{vec_col}' vector"
        )
    if len(init_rows) < n_init:
        raise ValueError(
            f"need at least {n_init} vectors, got {len(init_rows)}"
        )
    dim = len(init_rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    cents = np.array([r[1] for r in init_rows[:n_cells]], dtype=np.float64)
    books = [
        np.array([r[1][j * sub : (j + 1) * sub] for r in init_rows[:k_codebook]])
        for j in range(m)
    ]

    agg_schema = StructType(
        [
            StructField("kind", LongType()),  # 0 = ivf segment, 1 = pq
            StructField("subspace", LongType()),
            StructField("centroid", LongType()),
            StructField("n", LongType()),
            *[StructField(f"s{i}", DoubleType()) for i in range(sub)],
        ]
    )
    cols = ["kind", "subspace", "centroid", "n"] + [f"s{i}" for i in range(sub)]

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(
            (cents / _safe_norms(cents), [b.copy() for b in books])
        )

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cn, codebooks = bc.value
            k_c = len(cn)
            ivf_sums = np.zeros((m, k_c, sub))
            ivf_counts = np.zeros(k_c, dtype=np.int64)
            pq_sums = np.zeros((m, k_codebook, sub))
            pq_counts = np.zeros((m, k_codebook), dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                vn = vm / _safe_norms(vm)
                nearest_cell = np.argmax(np.round(vn @ cn.T, 6), axis=1)
                for c in range(k_c):
                    mask = nearest_cell == c
                    if mask.any():
                        ivf_counts[c] += int(mask.sum())
                        for j in range(m):
                            ivf_sums[j, c] += (
                                vm[mask, j * sub : (j + 1) * sub].sum(axis=0)
                            )
                for j in range(m):
                    sv = vm[:, j * sub : (j + 1) * sub]
                    d2 = ((sv[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    nearest = np.argmin(np.round(d2, 9), axis=1)
                    for c in range(k_codebook):
                        mask = nearest == c
                        if mask.any():
                            pq_sums[j, c] += sv[mask].sum(axis=0)
                            pq_counts[j, c] += int(mask.sum())
            rows = []
            for j in range(m):
                for c in range(k_c):
                    rows.append(
                        (0, j, c, int(ivf_counts[c]), *ivf_sums[j, c].tolist())
                    )
            for j in range(m):
                for c in range(k_codebook):
                    rows.append(
                        (1, j, c, int(pq_counts[j, c]), *pq_sums[j, c].tolist())
                    )
            yield pd.DataFrame(rows, columns=cols)

        partials = (
            vectors.select(id_col, vec_col)
            .mapInPandas(_partial, schema=agg_schema)
            .groupBy("kind", "subspace", "centroid")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(sub)],
            )
            .collect()
        )
        for r in partials:
            j, c, n = r["subspace"], r["centroid"], r["n"]
            if n <= 0:
                continue  # empty groups keep their previous centroid
            seg = np.array([r[f"s{i}"] for i in range(sub)]) / n
            if r["kind"] == 0:
                cents[c, j * sub : (j + 1) * sub] = seg
            else:
                books[j][c] = seg
        bc.destroy()
    return cents, books


def ivf_pq_encode(
    vectors: DataFrame,
    c_ids: np.ndarray,
    c_norm: np.ndarray,
    codebooks: list[np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fused inverted-file build: ONE corpus scan computes both the IVF
    cell assignment and the PQ codes — both need only broadcast state
    (normalized centroid matrix + codebooks), so splitting them into
    separate ``ivf_assign`` and ``pq_encode`` scans re-joined on the id
    (the pre-round-4 shape) paid a second full corpus scan plus a
    corpus-wide shuffle for nothing. Semantics are bit-identical to the
    two-pass form: assignment = argmax of rounded cosine over id-sorted
    centroids (first-max ⇒ smallest-id tiebreak), codes = per-subspace
    argmin of rounded squared distance.
    """
    spark = vectors.sparkSession
    vectors = vectors.filter(F.col(vec_col).isNotNull())  # nulls dropped
    m = len(codebooks)
    sub = codebooks[0].shape[1]
    bc = spark.sparkContext.broadcast((c_ids, c_norm, codebooks))

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("centroid_id", LongType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def _assign_encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cmat, books = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = vm / _safe_norms(vm)
            nearest = ids[np.argmax(np.round(vn @ cmat.T, 6), axis=1)]
            codes = np.zeros((len(vm), m), dtype=np.int32)
            for j in range(m):
                sv = vm[:, j * sub : (j + 1) * sub]
                d2 = ((sv[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(np.round(d2, 9), axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "centroid_id": nearest,
                    "codes": list(codes),
                }
            )

    par = spark.sparkContext.defaultParallelism
    return _spread_to_cores(
        vectors.select(id_col, vec_col), par
    ).mapInPandas(_assign_encode, schema=out_schema)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    m: int = 4,
    k_codebook: int = 16,
    k: int = 5,
    nprobe: int = 2,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the full billion-vector ANN layout (Jégou et al., TPAMI
    2011) — IVF restricts WHICH vectors a query scores (``nprobe`` nearest
    cells out of ``n_cells``), PQ restricts WHAT is scored (m uint8 codes
    per vector via ADC tables, never raw floats).

    Scale anatomy, piece by piece:
    - driver state: k×d centroid floats + m codebooks (kilobytes) — the
      only ANN state that lives driver-side, by design;
    - corpus: one assignment matmul + one encode pass, landing as the
      compressed inverted file (cell, id, m codes) — m bytes + a cell id
      per vector, the thing that actually fits 10^9 vectors in RAM;
    - query time: probes (query, cell) pairs join the inverted file ON THE
      CELL KEY — candidate pruning happens in the join, the corpus never
      shuffles — then batch-local ADC top-k and one cheap global window
      over ≤ partitions×k rows per query.

    Exact-recall caveats are PQ's own: ADC distances are approximate, so
    recall is a function of (m, k_codebook, nprobe) — measured in
    tests/test_dedup_similarity.py, not promised.
    """
    spark = vectors.sparkSession
    # ---- fused training: IVF centroids + PQ codebooks from ONE corpus
    # scan per round (see ivf_pq_train). The trained state is kilobytes
    # and lives driver-side by design — in a real deployment it is
    # offline state reused across queries; training here keeps the
    # registered query honest about end-to-end cost. ----
    cm, books = ivf_pq_train(
        vectors, n_cells=n_cells, m=m, k_codebook=k_codebook,
        iterations=iterations, id_col=id_col, vec_col=vec_col,
    )
    c_ids = np.arange(n_cells, dtype=np.int64)
    cn = cm / _safe_norms(cm)
    # fused single-scan inverted file (assignment + codes in one pass)
    inverted = ivf_pq_encode(vectors, c_ids, cn, books, id_col, vec_col)
    qrows = _collect_bounded(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "the query side of ivf_pq_topk",
        DEFAULT_MAX_BROADCAST_ROWS,
    )
    if not qrows:
        # empty-in → empty-out (see cosine_topk)
        return queries.sparkSession.createDataFrame(
            [],
            "query_id bigint, match_id bigint, adc_dist double, rank bigint",
        )
    q_ids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qm = np.array([r.qv for r in qrows], dtype=np.float64)
    qn = qm / _safe_norms(qm)
    sims = np.round(qn @ cn.T, 6)
    order = np.lexsort(
        (np.broadcast_to(c_ids, sims.shape), -sims), axis=1
    )[:, : min(nprobe, len(c_ids))]
    from xena_gdc_etl_spark.operators.partitioning import local_rows_df

    # size-proportional slicing: default core-count slicing made every
    # consumption of this small probe list a task-per-core job
    probes = local_rows_df(
        spark,
        [
            (int(q_ids[qi]), int(c_ids[ci]))
            for qi in range(len(q_ids))
            for ci in order[qi]
        ],
        "query_id long, centroid_id long",
    )

    # ADC tables: (n_query, m, k_codebook) squared subdistances
    sub = books[0].shape[1]
    tables = np.stack(
        [
            np.stack(
                [
                    ((qm[:, j * sub : (j + 1) * sub][:, None, :]
                      - books[j][None, :, :]) ** 2).sum(axis=2)
                    for j in range(m)
                ],
                axis=1,
            )
        ]
    )[0]
    qidx = {int(q): i for i, q in enumerate(q_ids)}
    bc = spark.sparkContext.broadcast((qidx, tables))

    cand = inverted.join(F.broadcast(probes), "centroid_id").select(
        "query_id", F.col(id_col), F.col("codes")
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("match_id", LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx, tabs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            cm_ = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qrow = np.array([idx[int(q)] for q in qids])
            d = np.round(
                tabs[qrow[:, None], np.arange(m)[None, :], cm_].sum(axis=1), 9
            )
            out_q, out_m, out_d = [], [], []
            for q in np.unique(qids):
                msk = (qids == q) & (vids != q)
                cand_ids, cand_d = vids[msk], d[msk]
                sel = np.lexsort((cand_ids, cand_d))[:k]
                out_q.extend([q] * len(sel))
                out_m.extend(cand_ids[sel])
                out_d.extend(cand_d[sel])
            yield pd.DataFrame(
                {"query_id": out_q, "match_id": out_m, "adc_dist": out_d}
            )

    local = cand.mapInPandas(_local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("match_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "match_id",
            "adc_dist",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def cell_label_purity(
    assigned: DataFrame,
    centroid_id: str = "centroid_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-cell label purity of an inverted-file assignment: for every IVF
    cell, the member count, the majority label (ties: smallest label), and
    purity = majority share — the standard external clustering-quality
    check run before trusting an index for semantic dedup or
    cluster-balanced sampling (a low-purity cell means the quantizer is
    mixing populations and τ-pair candidate generation inside it will
    cross semantic boundaries).

    Plan shape: two map-side-partial groupBys — (cell, label) counts, then
    a per-cell ``max(struct)`` argmax — so the reduced frame after the
    first aggregation is #cells × #labels rows regardless of corpus size;
    no window, no driver collect.
    """
    per = assigned.groupBy(centroid_id, label_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # lexicographic argmax: highest count, then SMALLEST label (negate the
    # label inside the struct so max() prefers it)
    best = F.max(
        F.struct(F.col("__cnt").alias("c"), (-F.col(label_col)).alias("nl"))
    )
    return (
        per.groupBy(centroid_id)
        .agg(
            F.sum("__cnt").alias("__n"),
            best.alias("__best"),
        )
        .select(
            F.col(centroid_id),
            F.col("__n").cast("bigint").alias("n_members"),
            (-F.col("__best.nl")).cast("bigint").alias("majority_label"),
            F.col("__best.c").cast("bigint").alias("n_majority"),
            F.round(F.col("__best.c") / F.col("__n"), 6).alias("purity"),
        )
    )
