"""Inductive oracle gating for the ITERATED trainers (round-10 verdict
task 6): kmeans_round / logreg_round gate ONE round under frozen state;
here DuckDB replays round 1's UNROUNDED output as round 2's frozen
input — pure SQL composition of the existing single-round oracle — and
the composition is pinned equal to ``ivf_train(iterations=2)`` /
``logistic_train(iterations=2)``. With the existing
``train(iterations=1) == step(init)`` pins, every rows-only trainer is
now "N oracle-gated rounds composed", each link checked.

Chaining precision: the raw oracle emits exact doubles (DuckDB DOUBLE →
Python float → ``repr`` → DOUBLE literal round-trips bit-exactly), so
no rounding enters between rounds — matching the trainers, which never
round intermediates. The two engines' round-1 states can differ at ulp
level (aggregation association), absorbed by the round-6 comparison on
the FINAL output exactly as in the single-round gates.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from xena_gdc_etl_spark.catalog import Catalog
from xena_gdc_etl_spark.operators import logreg as lr
from xena_gdc_etl_spark.operators import similarity as sim
from xena_gdc_etl_spark.operators.text import raw_quality_ratios
from xena_gdc_etl_spark.workload import _kmeans_round_sql, _logreg_round_sql

K = 8


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _fmt6(vals) -> str:
    # the kmeans_round canonical form: %.6f with -0.0 collapsed
    return ",".join(f"{round(v, 6) + 0.0:.6f}" for v in vals)


def test_kmeans_two_rounds_matches_chained_oracle(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    # ivf_train's init state: the K smallest-id vectors, exact doubles
    # (float32 -> float64 widening is exact on both engines)
    init = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(K)
        .select("embedding")
        .collect()
    ]
    assert len(init) == K

    con = _duck(sf_dir)
    # round 1: frozen init -> exact (unrounded) centroids
    r1 = con.execute(_kmeans_round_sql(cents=init, raw=True)).fetchall()
    chained = [list(map(float, row[2])) for row in sorted(r1)]
    # round 2: replay round 1's output as the frozen state, %.6f output
    r2 = con.execute(_kmeans_round_sql(cents=chained)).fetchall()
    want = sorted((row[0], row[2]) for row in r2)

    trained = sim.ivf_train(emb, k=K, iterations=2)
    got = sorted(
        (r.centroid_id, _fmt6(r.embedding)) for r in trained.collect()
    )
    assert got == want


def test_kmeans_chained_oracle_differs_from_one_round(spark, sf_dir):
    """Anti-vacuity: the two-round composition must actually move the
    centroids past round 1 (otherwise the chain tests nothing)."""
    emb = Catalog(spark, sf_dir).embeddings
    init = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(K)
        .select("embedding")
        .collect()
    ]
    con = _duck(sf_dir)
    r1 = con.execute(_kmeans_round_sql(cents=init, raw=True)).fetchall()
    chained = [list(map(float, row[2])) for row in sorted(r1)]
    one = {
        (row[0], _fmt6(row[2]))
        for row in r1
    }
    two = {
        (row[0], row[2])
        for row in con.execute(_kmeans_round_sql(cents=chained)).fetchall()
    }
    assert one != two


FCOLS = ["f_len", "punct_ratio", "stopword_ratio"]


def _feats(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    n_toks, punct_ratio, stop_ratio = raw_quality_ratios("text")
    return docs.select(
        (F.col("lang") == "en").cast("double").alias("is_en"),
        F.least(n_toks / 100.0, F.lit(1.0)).alias("f_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
    )


@pytest.mark.parametrize("force_distributed", [False, True])
def test_logreg_two_rounds_matches_chained_oracle(
    spark, sf_dir, force_distributed
):
    con = _duck(sf_dir)
    zeros = (0.0, 0.0, 0.0)
    # round 1 from zeros (logistic_train's init), exact doubles out
    r1 = dict(
        con.execute(
            _logreg_round_sql(w=zeros, b=0.0, lr=0.5, raw=True)
        ).fetchall()
    )
    w1 = tuple(float(r1[c]) for c in FCOLS)
    b1 = float(r1["bias"])
    # round 2 chained, round-6 output
    r2 = dict(
        con.execute(_logreg_round_sql(w=w1, b=b1, lr=0.5)).fetchall()
    )

    w, b = lr.logistic_train(
        _feats(spark, sf_dir),
        FCOLS,
        "is_en",
        iterations=2,
        lr=0.5,
        driver_max_rows=0 if force_distributed else 2_000_000,
    )
    got = {c: round(v, 6) for c, v in zip(FCOLS, w)}
    got["bias"] = round(b, 6)
    want = {c: round(float(v), 6) for c, v in r2.items()}
    assert got == want
    # anti-vacuity: two rounds moved past round 1
    assert want != {c: round(float(v), 6) for c, v in r1.items()}


def test_chained_state_roundtrips_exactly():
    """The chaining step itself must be lossless: a double that went
    through repr() into a DuckDB literal comes back bit-identical — with
    ONE documented exception: DuckDB folds the literal ``-0.0`` to
    ``+0.0`` (unary minus on the constant). Sign-of-zero is semantically
    inert for both trainers (x·(−0.0) == x·0.0 in every dot product and
    gradient term, and the %.6f canonicalizer collapses −0.0 anyway), so
    the pin allows exactly that case and nothing else."""
    vals = [0.1 + 0.2, 1e-17, 2.0 / 3.0, np.nextafter(1.0, 2.0), 1e300]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT [{', '.join(repr(v) for v in vals)}]::DOUBLE[]"
    ).fetchone()[0]
    assert [v.hex() for v in map(float, got)] == [v.hex() for v in vals]
    # the one allowed divergence, pinned so a DuckDB behavior change is
    # noticed rather than silently relied on
    neg_zero = con.execute("SELECT (-0.0)::DOUBLE").fetchone()[0]
    assert float(neg_zero) == 0.0
