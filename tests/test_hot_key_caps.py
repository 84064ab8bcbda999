"""Hot-key caps: LSH bucket-size cap and n-gram document-frequency cut.

Both drop ONLY over-limit groups before the quadratic pair expansion —
results for under-limit groups are byte-identical to the uncapped run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xena_gdc_etl_spark.operators import dedup as dd


def docs_df(spark, texts, source="s"):
    return spark.createDataFrame(
        [(i, t, source) for i, t in enumerate(texts)],
        ["doc_id", "text", "source"],
    )


def _sig(spark, texts):
    return dd.minhash_signatures(
        dd.shingles(docs_df(spark, texts), k=5, distinct=False)
    )


def test_lsh_bucket_cap_drops_only_over_limit_buckets(spark):
    # 4 identical docs (one bucket of 4 in every band) + 2 identical docs
    # (bucket of 2) + 1 unique
    texts = (
        ["the quick brown fox jumps over the lazy dog"] * 4
        + ["an entirely different duplicated sentence here ok"] * 2
        + ["no duplicate of this one exists anywhere at all"]
    )
    sig = _sig(spark, texts)
    uncapped = {(r.a, r.b) for r in dd.lsh_candidate_pairs(sig).collect()}
    capped = {
        (r.a, r.b)
        for r in dd.lsh_candidate_pairs(sig, max_bucket_size=3).collect()
    }
    # the 4-clique (docs 0-3) is gone, the 2-bucket pair (4,5) survives
    assert (4, 5) in capped
    assert all(not (a <= 3 and b <= 3) for a, b in capped)
    # capped is exactly uncapped minus the over-limit bucket's pairs
    assert capped == {
        (a, b) for a, b in uncapped if not (a <= 3 and b <= 3)
    }


def test_lsh_cap_none_is_uncapped(spark):
    texts = ["the quick brown fox jumps over it"] * 3
    sig = _sig(spark, texts)
    # collect() row order is scheduling-dependent — compare as sorted rows
    assert (
        sorted(dd.lsh_candidate_pairs(sig).collect())
        == sorted(dd.lsh_candidate_pairs(sig, max_bucket_size=None).collect())
    )


def test_simhash_bucket_cap_drops_only_over_limit_buckets(spark):
    # 4 docs share fingerprint A (one bucket of 4 in every band), 2 share
    # fingerprint B (bucket of 2), doc 6 is far from both.
    fp_a = 0b1111000011110000
    fp_b = 0b0000111100001111
    rows = [(i, fp_a) for i in range(4)] + [(4, fp_b), (5, fp_b), (6, 0)]
    fps = spark.createDataFrame(rows, ["doc_id", "simhash"])
    kw = dict(bits=16, bands=4, max_distance=3)
    uncapped = {(r.a, r.b) for r in dd.simhash_pairs(fps, **kw).collect()}
    capped = {
        (r.a, r.b)
        for r in dd.simhash_pairs(fps, max_bucket_size=3, **kw).collect()
    }
    assert (4, 5) in capped
    assert all(not (a <= 3 and b <= 3) for a, b in capped)
    assert capped == {(a, b) for a, b in uncapped if not (a <= 3 and b <= 3)}


def test_simhash_cap_none_is_uncapped(spark):
    fps = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], ["doc_id", "simhash"]
    )
    kw = dict(bits=16, bands=4, max_distance=3)
    # collect() row order is scheduling-dependent — compare as sorted rows
    assert (
        sorted(dd.simhash_pairs(fps, **kw).collect())
        == sorted(dd.simhash_pairs(fps, max_bucket_size=None, **kw).collect())
    )


def test_ngram_doc_freq_cut_drops_only_hot_grams(spark):
    # docs 0/1 share a rare 3-gram pattern; a hot gram ('zzz') appears in all
    texts = [
        "abcdef zzz",
        "abcdef zzz",
        "qrstuv zzz",
        "mnopqr zzz",
    ]
    df = docs_df(spark, texts)
    uncapped = {
        (r.a, r.b): r.jaccard
        for r in dd.ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    }
    capped = {
        (r.a, r.b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            df, n=3, threshold=0.0, max_doc_freq=2
        ).collect()
    }
    # pair (0,1) still intersects on the rare 'abc'... grams
    assert (0, 1) in capped
    # pairs held together ONLY by hot grams (df > 2, e.g. ' zz'/'zzz') vanish
    assert (2, 3) in uncapped and (2, 3) not in capped
    # capped similarity is a lower bound of the uncapped one (denominator
    # keeps all grams, numerator loses the hot ones)
    for pair, j in capped.items():
        assert j <= uncapped[pair] + 1e-9


def test_cosine_dup_pairs_hot_cell_cap(spark):
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.operators import similarity as sim

    # cell 0: four near-identical vectors (hot); cell 1: two
    vecs = [(i, [1.0, 0.0], 0) for i in range(4)] + [
        (10, [0.0, 1.0], 1),
        (11, [0.0, 1.0], 1),
    ]
    assigned = spark.createDataFrame(
        vecs, ["vec_id", "embedding", "centroid_id"]
    )
    full = sim.cosine_dup_pairs(assigned, threshold=0.9, max_cell_size=None)
    assert full.count() == 7  # C(4,2) + 1
    capped = sim.cosine_dup_pairs(assigned, threshold=0.9, max_cell_size=3)
    # the hot cell is dropped BEFORE pairing; the small cell still pairs
    assert {(r.a, r.b) for r in capped.collect()} == {(10, 11)}


def test_cosine_dup_pairs_block_sharding_exact(spark):
    """Hot-cell sub-sharding must reproduce the single-block pair set
    exactly (same pairs, same rounded sims) for any block size."""
    import math

    from xena_gdc_etl_spark.operators import similarity as sim

    vecs = [
        (i, [math.cos(i * 0.07), math.sin(i * 0.07)], i % 2) for i in range(40)
    ]
    assigned = spark.createDataFrame(
        vecs, ["vec_id", "embedding", "centroid_id"]
    )

    def rows(block_size):
        return sorted(
            (r.a, r.b, r.sim)
            for r in sim.cosine_dup_pairs(
                assigned, threshold=0.9, block_size=block_size
            ).collect()
        )

    want = rows(10_000)  # single block per cell
    assert want  # non-vacuous: nearby angles pass the threshold
    for bs in (3, 7, 19):
        assert rows(bs) == want, bs


def test_containment_array_cap_excludes_only_over_limit_docs(spark):
    # doc 0: long text (many distinct 5-shingles); docs 1-2: short texts
    texts = [
        " ".join(f"tok{i:03d}" for i in range(40)),  # > 60 distinct shingles
        "shared quote body here",
        "shared quote body here too",
    ]
    docs = docs_df(spark, texts)
    cands = spark.createDataFrame(
        [(0, 1), (1, 2)], ["a", "b"]
    )
    uncapped = dd.containment_pairs(
        docs, cands, k=5, strategy="array"
    ).collect()
    capped = dd.containment_pairs(
        docs, cands, k=5, strategy="array", max_shingles_per_doc=60
    ).collect()
    # pair (0,1) vanishes with the over-cap doc 0; (1,2) survives
    # byte-identical to the uncapped run
    assert {(r.a, r.b) for r in uncapped} == {(0, 1), (1, 2)}
    assert [(r.a, r.b) for r in capped] == [(1, 2)]
    uncapped_12 = [r for r in uncapped if (r.a, r.b) == (1, 2)]
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped_12))


def test_containment_array_cap_none_is_uncapped(spark):
    texts = ["alpha beta gamma delta", "alpha beta gamma delta epsilon"]
    docs = docs_df(spark, texts)
    cands = spark.createDataFrame([(0, 1)], ["a", "b"])
    assert sorted(
        map(
            tuple,
            dd.containment_pairs(docs, cands, k=5, strategy="array").collect(),
        )
    ) == sorted(
        map(
            tuple,
            dd.containment_pairs(
                docs, cands, k=5, strategy="array", max_shingles_per_doc=None
            ).collect(),
        )
    )
