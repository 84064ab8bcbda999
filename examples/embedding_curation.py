"""End-to-end embedding curation: the vector-side pipeline composed from
the engine's similarity operators — the companion to
examples/corpus_curation.py (text side).

    raw embeddings
      → IVF + PQ training       (fused one-scan-per-round Lloyd's; driver
                                 holds kilobytes of centroids/codebooks)
      → semantic dedup          (SemDeDup: τ-pairs within cells → CC →
                                 keep one representative per cluster)
      → compressed index build  (fused assign+encode: cell id + m uint8
                                 codes per vector in ONE corpus scan)
      → int8 candidate payload  (4× smaller re-rank side)
      → partitioned parquet     (hive-partitioned by cell — probe-side
                                 partition pruning) + _manifest.json

Every stage is either a DataFrame transformation or an aggregate-only
driver fold; the corpus is scanned a bounded number of times and never
collected.

Run: python examples/embedding_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_embeddings(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    n_cells: int | None = None,
    m: int = 4,
    k_codebook: int = 8,
    dup_threshold: float = 0.3,
    target_cell_rows: int = 4096,
) -> DataFrame:
    """Returns the deduplicated, compressed vector index; writes it (plus
    the dataset manifest) when ``out_dir`` is set."""
    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.operators import similarity as sim

    emb = Catalog(spark, sf_dir).embeddings

    # 0. cell count scales WITH the corpus (n_cells ≈ rows/target, so the
    #    within-cell pair stage stays O(rows × target) instead of going
    #    quadratic as cells fatten) — suggest_n_cells documents the math;
    #    pass an explicit n_cells to override
    if n_cells is None:
        n_cells = max(
            2, sim.suggest_n_cells(emb.count(), target_cell_rows)
        )

    # 1. train the layout state (offline in a real deployment): IVF
    #    centroids + PQ codebooks from one fused scan per round
    cents, books = sim.ivf_pq_train(
        emb, n_cells=n_cells, m=m, k_codebook=k_codebook, iterations=2
    )
    c_ids = np.arange(n_cells, dtype=np.int64)
    c_norm = cents / sim._safe_norms(cents)

    # 2. semantic dedup: drop near-identical vectors (keep one
    #    representative per cosine cluster), using the SAME trained cells
    cents_df = spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(n_cells)],
        "centroid_id long, embedding array<double>",
    )
    assigned = sim.ivf_assign(emb, cents_df)
    keep = sim.semantic_dedup(assigned, threshold=dup_threshold).filter(
        F.col("keep") == 1
    ).select("vec_id")
    emb = emb.join(keep, "vec_id", "left_semi")

    # 3. compressed index: (cell, id, m uint8 codes) in one scan — the
    #    billion-vector-in-RAM representation
    index = sim.ivf_pq_encode(emb, c_ids, c_norm, books)

    # 4. int8 re-rank payload rides along (scale, q_csv)
    index = index.join(sim.quantize_int8(emb), "vec_id")

    if out_dir:
        from xena_gdc_etl_spark.sources.parquet_sink import (
            write_manifest,
            write_partitioned,
        )

        write_partitioned(
            index, out_dir, partition_by=["centroid_id"],
            sort_within=["vec_id"],
        )
        write_manifest(index, out_dir, partition_by=["centroid_id"])
    return index


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="embedding-curation")
    spark.sparkContext.setLogLevel("ERROR")
    result = curate_embeddings(spark, sf_dir, out)
    n_before = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    print(f"curated index: kept {result.count()}/{n_before} vectors")
