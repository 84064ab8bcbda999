"""Durable MinHash signature artifact (sources/minhash_index.py):
roundtrip bit-identity, the param-mismatch guard, and the probe's
equivalence to rescanning (lsh_probe_pairs == lsh_candidate_pairs over
the union, restricted to new×landed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xena_gdc_etl_spark.catalog import Catalog
from xena_gdc_etl_spark.operators import dedup as dd
from xena_gdc_etl_spark.sources import minhash_index as mh

P = dict(num_hashes=8, shingle_k=5, band_size=2)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents


def test_roundtrip_bit_identity(spark, docs, tmp_path):
    sigs = mh.build_signatures(docs, num_hashes=8, shingle_k=5)
    mh.save_minhash_index(sigs, str(tmp_path / "idx"), **P)
    loaded, manifest = mh.load_minhash_index(spark, str(tmp_path / "idx"), **P)
    assert manifest["n_docs"] == docs.count()
    before = sorted(tuple(r) for r in sigs.collect())
    after = sorted(tuple(r) for r in loaded.collect())
    assert before == after  # bigint slots: exact roundtrip, no fp anywhere
    assert loaded.columns == ["doc_id"] + [f"mh{j}" for j in range(8)]


def test_param_mismatch_refused(spark, docs, tmp_path):
    sigs = mh.build_signatures(docs, num_hashes=8, shingle_k=5)
    mh.save_minhash_index(sigs, str(tmp_path / "idx"), **P)
    for bad in (
        dict(P, num_hashes=16),
        dict(P, shingle_k=7),
        dict(P, band_size=4),
        dict(P, normalized=True),
    ):
        with pytest.raises(ValueError, match="must not mix"):
            mh.load_minhash_index(spark, str(tmp_path / "idx"), **bad)


def test_missing_sentinel_refused(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="_minhash.json"):
        mh.load_minhash_index(spark, str(tmp_path / "nope"), **P)


def test_save_validates_slot_columns(docs, tmp_path):
    sigs = mh.build_signatures(docs, num_hashes=8, shingle_k=5)
    with pytest.raises(ValueError, match="num_hashes=4"):
        mh.save_minhash_index(
            sigs, str(tmp_path / "idx"), num_hashes=4, shingle_k=5,
            band_size=2,
        )


def test_probe_equals_rescan(spark, docs, tmp_path):
    landed = docs.filter(F.col("doc_id") % 5 == 0)
    new = docs.filter(F.col("doc_id") % 5 != 0)
    landed_sigs = mh.build_signatures(landed, num_hashes=8, shingle_k=5)
    mh.save_minhash_index(landed_sigs, str(tmp_path / "idx"), **P)
    loaded, _ = mh.load_minhash_index(spark, str(tmp_path / "idx"), **P)
    new_sigs = mh.build_signatures(new, num_hashes=8, shingle_k=5)

    got = sorted(
        (r.new_id, r.landed_id)
        for r in mh.lsh_probe_pairs(
            new_sigs, loaded, num_hashes=8, band_size=2
        ).collect()
    )

    # the rescan answer: candidate pairs over the WHOLE corpus, cut to
    # pairs that straddle the increment/landed boundary
    union_sigs = mh.build_signatures(docs, num_hashes=8, shingle_k=5)
    all_pairs = dd.lsh_candidate_pairs(
        union_sigs, num_hashes=8, band_size=2
    ).collect()
    want = sorted(
        (a, b) if a % 5 != 0 else (b, a)
        for a, b in ((r.a, r.b) for r in all_pairs)
        if (a % 5 == 0) != (b % 5 == 0)
    )
    assert got == want
    assert got, "fixture produced no cross pairs — test is vacuous"


def test_probe_broadcast_hint_in_plan(spark, docs):
    landed = docs.filter(F.col("doc_id") % 5 == 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).limit(50)
    landed_sigs = mh.build_signatures(landed, num_hashes=8, shingle_k=5)
    new_sigs = mh.build_signatures(new, num_hashes=8, shingle_k=5)
    plan = (
        mh.lsh_probe_pairs(new_sigs, landed_sigs, num_hashes=8, band_size=2)
        ._jdf.queryExecution()
        .toString()
    )
    # the increment side broadcasts; the landed corpus must never shuffle
    # for the join
    assert "Broadcast" in plan


def test_save_refuses_non_integral_id(spark, tmp_path):
    # a string doc id would throw mid-write (ANSI) or silently cast to
    # all-NULL bigints (try_cast lineages); the saver must refuse the
    # type up front instead of deferring the failure to probe time
    bad = spark.createDataFrame(
        [("doc-a", 1, 2, 3, 4, 5, 6, 7, 8), ("doc-b", 9, 8, 7, 6, 5, 4, 3, 2)],
        ["doc_id"] + [f"mh{j}" for j in range(8)],
    )
    import os

    with pytest.raises(ValueError, match="integral"):
        mh.save_minhash_index(bad, str(tmp_path / "bad"), **P)
    # and the sentinel must NOT endorse any partial artifact
    assert not os.path.exists(str(tmp_path / "bad" / "_minhash.json"))


def test_save_refuses_null_ids(spark, tmp_path):
    rows = [(1, 1, 2, 3, 4, 5, 6, 7, 8), (None, 9, 8, 7, 6, 5, 4, 3, 2)]
    schema = "doc_id bigint, " + ", ".join(f"mh{j} bigint" for j in range(8))
    bad = spark.createDataFrame(rows, schema)
    import os

    with pytest.raises(ValueError, match="NULL"):
        mh.save_minhash_index(bad, str(tmp_path / "nulls"), **P)
    assert not os.path.exists(str(tmp_path / "nulls" / "_minhash.json"))


def test_roll_forward_resave_to_same_path(spark, tmp_path):
    """save(load(path).union(increment)) back to the SAME path — the
    daily artifact loop. An in-place overwrite deletes the input files
    mid-scan (FAILED_READ_FILE) and a post-write validation failure had
    no rollback; the stage-then-swap save must survive both (round-16
    review)."""
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.sources.minhash_index import (
        load_minhash_index,
        save_minhash_index,
    )

    path = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, *[i * 10 + j for j in range(8)]) for i in range(5)],
        "doc_id bigint, " + ", ".join(f"mh{j} bigint" for j in range(8)),
    )
    kw = dict(num_hashes=8, shingle_k=5, band_size=2)
    save_minhash_index(base, path, **kw)
    loaded, _ = load_minhash_index(spark, path, **kw)
    inc = spark.createDataFrame(
        [(100, *[7] * 8)],
        "doc_id bigint, " + ", ".join(f"mh{j} bigint" for j in range(8)),
    )
    save_minhash_index(loaded.unionByName(inc), path, **kw)
    re_loaded, man = load_minhash_index(spark, path, **kw)
    assert re_loaded.count() == 6 and man["n_docs"] == 6


def test_failed_validation_leaves_previous_artifact_endorsed(spark, tmp_path):
    from xena_gdc_etl_spark.sources.minhash_index import (
        load_minhash_index,
        save_minhash_index,
    )

    path = str(tmp_path / "idx2")
    schema = "doc_id bigint, " + ", ".join(f"mh{j} bigint" for j in range(8))
    good = spark.createDataFrame([(1, *[2] * 8)], schema)
    kw = dict(num_hashes=8, shingle_k=5, band_size=2)
    save_minhash_index(good, path, **kw)
    bad = spark.createDataFrame([(None, *[3] * 8)], schema)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        save_minhash_index(bad, path, **kw)
    # previous artifact still endorsed and readable
    loaded, man = load_minhash_index(spark, path, **kw)
    assert loaded.count() == 1 and man["n_docs"] == 1
