"""In-engine BPE tokenizer training + encoding + sequence packing,
end to end — the full tokenizer story a training-data pipeline runs:

    raw documents
      → word frequencies        (one partial-agg groupBy — the vocab frame)
      → bpe_train               (count → argmax → apply rounds; exact by
                                 default, disjoint-batched via
                                 merges_per_round for real vocabularies)
      → bpe_encode              (rank-priority subword tokenization; the
                                 Python merge loop touches only DISTINCT
                                 words, the token stream is join+flatten)
      → sequence_pack           (per-source CONTIGUOUS chunk layout of the
                                 SUBWORD counts into fixed token budgets
                                 via the sharded prefix scan — no
                                 per-source window task)

Everything corpus-sized stays in DataFrames; the driver holds the merge
list (a few KB at any vocabulary size).

Run: python examples/bpe_tokenizer_train.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys


def tokenize_and_pack(
    spark,
    sf_dir: str,
    n_merges: int = 32,
    pack_budget: int = 256,
    merges_per_round: int = 4,
):
    """Train a BPE vocab on the corpus, encode every document with it,
    and pack the encoded lengths into fixed-size sequences.

    Returns ``(merges, packed)`` where ``packed`` has one row per doc:
    (doc_id, source, n_subwords, pack_id, pack_offset). Pack geometry is
    over the TRAINED subword counts — the number that actually fills a
    training batch — not whitespace token counts.

    Layout contract: this is a CONTIGUOUS chunk layout (pack_id/pack_offset
    from floor/mod of the running prefix sum), not boundary-respecting
    packing — a document may straddle pack boundaries
    (pack_offset + n_subwords > pack_budget spills into pack_id + 1), and
    a doc longer than the budget spans several packs. Consumers must
    treat pack_id as "where the doc STARTS", not whole-doc containment;
    a loader that needs intact docs per batch should split on the
    straddle rows downstream.
    """
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.operators.bpe import bpe_encode, bpe_train
    from xena_gdc_etl_spark.operators.prefix import group_prefix_sum
    from xena_gdc_etl_spark.operators.text import WS_RE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), WS_RE), lambda t: t != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, _seg = bpe_train(wf, n_merges, merges_per_round=merges_per_round)

    encoded = bpe_encode(docs, merges, lowercase=True)
    counts = encoded.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id",
        "source",
        F.size("subwords").cast("bigint").alias("n_subwords"),
    )
    cum = group_prefix_sum(
        counts, ["source"], ["doc_id"], "n_subwords", "__cum"
    )
    start = F.col("__cum") - F.col("n_subwords")
    packed = cum.select(
        "doc_id",
        "source",
        "n_subwords",
        F.floor(start / pack_budget).cast("bigint").alias("pack_id"),
        (start % pack_budget).cast("bigint").alias("pack_offset"),
    )
    return merges, packed


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="bpe-train")
    spark.sparkContext.setLogLevel("ERROR")

    merges, packed = tokenize_and_pack(spark, sf_dir, n_merges)
    print(f"learned {len(merges)} merges; first 10: {merges[:10]}")

    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_subwords").alias("subwords"),
        F.round(F.avg("n_subwords"), 1).alias("subwords_per_doc"),
        (F.countDistinct("source", "pack_id")).alias("packs"),
    ).collect()[0]
    print(
        f"encoded {stats.docs} docs → {stats.subwords} subwords "
        f"({stats.subwords_per_doc}/doc) into {stats.packs} packs"
    )
    sample = packed.orderBy("doc_id").limit(3).collect()
    for r in sample:
        print(
            f"doc {r.doc_id} source={r.source} n_subwords={r.n_subwords} "
            f"pack={r.pack_id} offset={r.pack_offset}"
        )


if __name__ == "__main__":
    main()
