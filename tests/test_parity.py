"""DuckDB-oracle parity for every query with an oracle — mirrors the
driver's t2 gate (row count + schema width + order-insensitive value
comparison, columns sorted by name).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from xena_gdc_etl_spark.catalog import TPCH_TABLES
from xena_gdc_etl_spark.workload import ORACLES, QUERIES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    ours = _norm_rows([c.lower() for c in spark_cols], spark_rows)
    theirs = _norm_rows([c.lower() for c in duck_cols], duck_rows)
    mismatches = [
        (a, b) for a, b in zip(ours, theirs) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
