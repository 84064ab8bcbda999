"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline; IVF (inverted-file) cell
search is the scale path: vectors are assigned to their nearest centroid
once, and queries only score vectors in their own cell — pruning the
candidate set by ~n_centroids× at 100 TB. All vector math is JVM-side
(zip_with/aggregate); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xena_gdc_etl_spark.functions import cosine_similarity


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for every query vector (self-match excluded).

    The query side is small by construction (sampled probes / user queries):
    Spark broadcasts it, so the corpus never shuffles. Deterministic ranking:
    (rounded sim desc, id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    v = vectors.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__vv"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "sim", F.round(cosine_similarity(F.col("__qv"), F.col("__vv")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", F.col("rank").cast("bigint").alias("rank"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine; ties → smallest
    centroid id). Centroids are a broadcast dim table; one pass, no shuffle
    of the corpus.
    """
    c = centroids.select(
        F.col(centroid_id), F.col(vec_col).alias("__cv")
    )
    scored = vectors.crossJoin(F.broadcast(c)).withColumn(
        "sim", F.round(cosine_similarity(F.col(vec_col), F.col("__cv")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col(centroid_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(centroid_id), F.col(vec_col))
    )


def ivf_topk(
    assigned: DataFrame,
    queries_assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's cell.
    The join key is the centroid id — candidate pruning happens in the join
    itself, which is the whole point of IVF at scale.
    """
    q = queries_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(centroid_id),
        F.col(vec_col).alias("__qv"),
    )
    v = assigned.select(
        F.col(id_col).alias("match_id"),
        F.col(centroid_id),
        F.col(vec_col).alias("__vv"),
    )
    scored = (
        v.join(F.broadcast(q), on=centroid_id)
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "sim", F.round(cosine_similarity(F.col("__qv"), F.col("__vv")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", F.col("rank").cast("bigint").alias("rank"))
    )


def cosine_dup_pairs(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, candidates limited
    to vectors sharing an IVF cell (bucketed, not global O(n²)).
    """
    a = assigned.select(
        F.col(centroid_id), F.col(id_col).alias("a"), F.col(vec_col).alias("__av")
    )
    b = assigned.select(
        F.col(centroid_id), F.col(id_col).alias("b"), F.col(vec_col).alias("__bv")
    )
    return (
        a.join(b, on=centroid_id)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "sim", F.round(cosine_similarity(F.col("__av"), F.col("__bv")), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )
