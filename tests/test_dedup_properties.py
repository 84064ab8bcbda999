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


_sid = st.sampled_from(["S1", "S2", "S3", "S4", "S5"])
_case_map = st.fixed_dictionaries(
    {}, optional={s: st.sampled_from(["C1", "C2"]) for s in
                  ["S1", "S2", "S3", "S4", "S5"]}
)


@_SLOW
@given(
    cells=st.lists(
        st.tuples(
            _sid,
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=20,
    ),
    mapping=_case_map,
)
def test_postprocess_rename_dedup_properties(spark, cells, mapping):
    """For ANY long matrix and ANY sample→case map: (a) column-dtype
    output has exactly one row per (feature, renamed sample) and its
    value comes from the lexicographically smallest original sample that
    renamed onto it; (b) row-form output equals the distinct set of
    renamed cells (reference drop_duplicates semantics)."""
    from xena_gdc_etl_spark.operators.mapping import postprocess_rename_dedup

    long_df = spark.createDataFrame(
        [(s, g, float(v)) for s, g, v in cells],
        ["sample", "feature", "value"],
    )
    mdf = spark.createDataFrame(
        list(mapping.items()) or [("__none__", "__none__")],
        ["sample", "case"],
    )

    def rn(s):
        return mapping.get(s, s)

    # column form
    out = postprocess_rename_dedup(long_df, "star_counts", mdf).collect()
    got = {(r.feature, r.sample): r.value for r in out}
    assert len(got) == len(out)  # one row per (feature, renamed sample)
    expected = {}
    for s, g, v in cells:
        key = (g, rn(s))
        prev = expected.get(key)
        if prev is None or s < prev[0]:
            expected[key] = (s, float(v))
    # the reference keeps ONE column per duplicated name; with several
    # cells from the SAME original sample+feature the kept value is any
    # of that sample's values — compare at sample granularity
    assert set(got) == set(expected)
    for key, (src_sample, _v) in expected.items():
        src_vals = {
            float(v) for s, g, v in cells
            if s == src_sample and g == key[0]
        }
        assert got[key] in src_vals
    # row form: distinct renamed cells
    out2 = postprocess_rename_dedup(long_df, "GDC_phenotype", mdf).collect()
    got2 = {(r.sample, r.feature, r.value) for r in out2}
    assert len(got2) == len(out2)
    assert got2 == {(rn(s), g, float(v)) for s, g, v in cells}


def test_simhash_packed_matches_reference(spark):
    import hashlib
    import re

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the one two two three",
        "a",
        "x y z x y z x y",
        "lorem ipsum dolor sit amet consectetur",
    ]

    def ref_simhash(bits):
        out = {}
        for i, t in enumerate(texts):
            toks = [x for x in re.split(r"[ \t\n\r\f]+", t) if x]
            sums = [0] * bits
            for tok in toks:
                h = int(
                    hashlib.md5(("sim:" + tok).encode()).hexdigest()[:15],
                    16,
                )
                for j in range(bits):
                    sums[j] += 1 if (h >> j) & 1 else -1
            out[i] = sum(
                1 << j for j in range(bits) if sums[j] > 0
            )
        return out

    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"],
    )
    # widths exercising the partial-last-group path (bits % lanes != 0)
    # and a non-default lane_width (2 lanes of 31 bits per counter)
    for bits in (1, 7, 13, 33, 60):
        got = {
            r.doc_id: r.simhash
            for r in dd.simhash(df, bits=bits).collect()
        }
        assert got == ref_simhash(bits), f"bits={bits}"
    got31 = {
        r.doc_id: r.simhash
        for r in dd.simhash(df, bits=60, lane_width=31).collect()
    }
    assert got31 == ref_simhash(60)
