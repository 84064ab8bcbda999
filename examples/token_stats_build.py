"""Build → persist → consume the token-statistics artifact.

A deployment tokenizes the corpus ONCE per snapshot and fans every unigram
consumer out from the persisted statistics; this example is that loop in
miniature:

    documents
      → doc_term_freqs            (one explode + one groupBy)
      → save_token_stats          (tf table + vocab rollup + manifest)
      → load_token_stats          (sentinel + tokenizer-tag validated)
      → unigram_logprob_scores(tf=...)   (a consumer that never
                                          re-tokenizes the corpus)

Cheap consumers (mixture planning needs only the totals) read the
manifest and never touch the tables.

Run: python examples/token_stats_build.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys


def main() -> None:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.operators.text import (
        doc_term_freqs,
        unigram_logprob_scores,
    )
    from xena_gdc_etl_spark.session import get_spark
    from xena_gdc_etl_spark.sources.token_stats import (
        load_token_stats,
        save_token_stats,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/token_stats"
    spark = get_spark(app_name="token-stats-build")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    manifest = save_token_stats(doc_term_freqs(docs), out)
    print(f"artifact at {out}: {manifest}")

    tf, vocab, _ = load_token_stats(spark, out)
    scored = unigram_logprob_scores(docs, tf=tf)
    sample = scored.orderBy("doc_id").limit(3).collect()
    print("top vocab:", [r.tok for r in vocab.orderBy(vocab.tf.desc()).limit(5).collect()])
    print("lm sample:", [(r.doc_id, r.lm_score) for r in sample])


if __name__ == "__main__":
    main()
