"""In-engine BPE tokenizer training + encoding, end to end.

    raw documents
      → word frequencies        (one partial-agg groupBy — the vocab frame)
      → bpe_train               (count → argmax → apply rounds; exact by
                                 default, disjoint-batched via
                                 merges_per_round for real vocabularies)
      → bpe_encode              (rank-priority subword tokenization; the
                                 Python merge loop touches only DISTINCT
                                 words, the token stream is join+flatten)
      → subword corpus stats    (tokens/doc, total subword count)

Everything corpus-sized stays in DataFrames; the driver holds the merge
list (a few KB at any vocabulary size).

Run: python examples/bpe_tokenizer_train.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.operators.bpe import bpe_encode, bpe_train
    from xena_gdc_etl_spark.operators.text import WS_RE
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="bpe-train")
    spark.sparkContext.setLogLevel("ERROR")

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
    merges, _seg = bpe_train(wf, n_merges, merges_per_round=4)
    print(f"learned {len(merges)} merges; first 10: {merges[:10]}")

    encoded = bpe_encode(docs, merges, lowercase=True)
    stats = encoded.select(
        F.size("subwords").alias("n")
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n").alias("subwords"),
        F.round(F.avg("n"), 1).alias("subwords_per_doc"),
    ).collect()[0]
    print(
        f"encoded {stats.docs} docs → {stats.subwords} subwords "
        f"({stats.subwords_per_doc}/doc)"
    )
    sample = encoded.orderBy("doc_id").limit(1).collect()[0]
    print("doc", sample.doc_id, "first 12 subwords:", sample.subwords[:12])


if __name__ == "__main__":
    main()
