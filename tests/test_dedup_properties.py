"""Property-based invariants for the dedup stack (hypothesis): semantic
guarantees that must hold for ANY input corpus, not just fixtures.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xena_gdc_etl_spark.operators import dedup as dd

_word = st.text(alphabet="abcxyz", min_size=1, max_size=4)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=8)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"],
    )


@_SLOW
@given(texts=_corpus)
def test_normalize_text_is_idempotent(spark, texts):
    from pyspark.sql import functions as F

    df = _docs(spark, texts)
    once = df.select(dd.normalize_text("text").alias("n"))
    twice = once.select(dd.normalize_text(F.col("n")).alias("n"))
    assert [r.n for r in once.collect()] == [r.n for r in twice.collect()]


@_SLOW
@given(texts=_corpus)
def test_dedup_exact_partitions_the_corpus(spark, texts):
    df = _docs(spark, texts)
    groups = dd.dedup_exact(df).collect()
    # group sizes sum to the corpus, keep_ids are distinct members
    assert sum(r.n_dups for r in groups) == len(texts)
    keep_ids = [r.keep_id for r in groups]
    assert len(set(keep_ids)) == len(keep_ids)
    assert all(0 <= k < len(texts) for k in keep_ids)


@_SLOW
@given(texts=_corpus)
def test_identical_docs_always_share_lsh_bucket(spark, texts):
    # duplicate every doc; each (i, i+n) twin must appear as a candidate
    # pair — MinHash of identical shingle sets is identical, so LSH can
    # never miss an exact duplicate (no false negatives at J=1)
    n = len(texts)
    twins = texts + texts
    df = _docs(spark, twins)
    sig = dd.minhash_signatures(dd.shingles(df, k=3, distinct=False))
    pairs = {(r.a, r.b) for r in dd.lsh_candidate_pairs(sig).collect()}
    for i, t in enumerate(texts):
        if len(t) >= 3:  # shorter docs have no shingles/signature
            assert (i, i + n) in pairs


@_SLOW
@given(texts=_corpus)
def test_simhash_partition_count_invariant(spark, texts):
    df = _docs(spark, texts)
    one = {(r.doc_id, r.simhash) for r in dd.simhash(df, bits=16).collect()}
    many = {
        (r.doc_id, r.simhash)
        for r in dd.simhash(df.repartition(5), bits=16).collect()
    }
    assert one == many


@_SLOW
@given(texts=_corpus)
def test_jaccard_estimate_bounds(spark, texts):
    df = _docs(spark, texts)
    sig = dd.minhash_signatures(dd.shingles(df, k=3, distinct=False))
    pairs = dd.lsh_candidate_pairs(sig)
    est = dd.minhash_jaccard_estimate(pairs, sig, threshold=0.0).collect()
    for r in est:
        assert 0.0 <= r.est_jaccard <= 1.0
