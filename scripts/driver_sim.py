"""Simulate the grading driver: vanilla SparkSession (none of session.py's
configs), run queries() vs oracle_sql() in DuckDB, canonicalize exactly like
the driver (pandas sort_values over all columns — dies on list cells), and
compare counts/schema/values.

Usage: python scripts/driver_sim.py [query ...]   (default: all)
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    return [tuple(cell(v) for v in row) for row in pdf.itertuples(index=False)]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    names = sys.argv[1:] or sorted(queries)
    failed = []
    for name in names:
        try:
            sdf = queries[name](spark, SF)
            spark_pdf = sdf.toPandas()
            if name not in oracles:
                print(f"{name}: rows={len(spark_pdf)} (no oracle)")
                continue
            res = con.execute(oracles[name])
            duck_pdf = res.fetchdf()
            ok_rows = len(spark_pdf) == len(duck_pdf)
            ok_cols = sorted(c.lower() for c in spark_pdf.columns) == sorted(
                c.lower() for c in duck_pdf.columns
            )
            spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
            duck_pdf.columns = [c.lower() for c in duck_pdf.columns]
            ok_hash = ok_cols and _canon(spark_pdf) == _canon(duck_pdf)
            status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            print(
                f"{name}: {status} rows={len(spark_pdf)}/{len(duck_pdf)}"
                f" cols={ok_cols} hash={ok_hash}"
            )
            if status == "FAIL":
                failed.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:300]}")
            failed.append(name)
    print("FAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
