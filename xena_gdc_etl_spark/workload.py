"""Query workload: every SURVEY.md §2 operator instantiated on the test
tables, each with a DuckDB-equivalent oracle SQL string.

Conventions (driver compares row-count + schema + order-insensitive value
hash, with columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- float values produced by multi-row aggregation are rounded (addition order
  differs between engines); per-row float arithmetic is IEEE-identical and
  left unrounded;
- integer aggregates are cast to bigint on both sides (DuckDB sums promote
  to hugeint otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xena_gdc_etl_spark.catalog import Catalog
from xena_gdc_etl_spark.filters import search
from xena_gdc_etl_spark.operators import events as ev
from xena_gdc_etl_spark.operators import mapping as mp
from xena_gdc_etl_spark.operators import matrix as mx
from xena_gdc_etl_spark.operators import phenotype as ph
from xena_gdc_etl_spark.operators import snv
from xena_gdc_etl_spark.operators import survival as sv

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# 1. Flagship: pricing summary (the merge+aggregate shape of the reference's
#    matrix builds, TPC-H Q1 form). Pure groupBy-agg, map-side partials.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 2. Declarative in/exclude filter + projection (gdc.simple_and_filter +
#    gdc.search parity). Predicate + columns push to the parquet scan.
# --------------------------------------------------------------------------
@query(
    "search_filter",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_linestatus NOT IN ('F')
    """,
)
def search_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return search(
        li,
        include={"l_returnflag": ["A", "R"]},
        exclude={"l_linestatus": ["F"]},
        fields=["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"],
    )


# --------------------------------------------------------------------------
# 3. merge_sample_cols: long-format matrix build — average duplicates per
#    (sample, feature), then log2(x+1).
# --------------------------------------------------------------------------
@query(
    "sample_matrix",
    """
    SELECT l_suppkey AS sample, l_partkey AS feature,
           CAST(round(log2(avg(l_quantity) + 1.0), 6) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey, l_partkey
    """,
)
def sample_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    m = mx.merge_sample_cols(li, "l_suppkey", "l_partkey", "l_quantity", log2tf=True)
    return m.withColumn("value", F.round(F.col("value"), 6))


# --------------------------------------------------------------------------
# 4. Matrix union (axis=0 concat / merge_cnv): segment-style frames with
#    column alignment on union.
# --------------------------------------------------------------------------
@query(
    "matrix_union",
    """
    SELECT l_suppkey AS sample, l_returnflag AS chrom, l_orderkey AS seg_start,
           CAST(l_linenumber AS BIGINT) AS seg_end, l_quantity AS value
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
    UNION ALL
    SELECT l_suppkey AS sample, l_returnflag AS chrom, l_orderkey AS seg_start,
           CAST(NULL AS BIGINT) AS seg_end, l_quantity AS value
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def matrix_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    cutoff = F.lit("1995-01-01 00:00:00").cast("timestamp")
    seg_a = li.filter(F.col("l_shipdate") < cutoff).select(
        F.col("l_suppkey").alias("sample"),
        F.col("l_returnflag").alias("chrom"),
        F.col("l_orderkey").alias("seg_start"),
        F.col("l_linenumber").cast("bigint").alias("seg_end"),
        F.col("l_quantity").alias("value"),
    )
    seg_b = li.filter(F.col("l_shipdate") >= cutoff).select(
        F.col("l_suppkey").alias("sample"),
        F.col("l_returnflag").alias("chrom"),
        F.col("l_orderkey").alias("seg_start"),
        F.col("l_quantity").alias("value"),
    )
    return mx.union_matrices([seg_a, seg_b])


# --------------------------------------------------------------------------
# 5. Matrix join (axis=1 concat): column-wise merge of two matrices on the
#    shared row index.
# --------------------------------------------------------------------------
@query(
    "matrix_join",
    """
    SELECT COALESCE(a.feature, b.feature) AS feature,
           a.avg_qty, b.p_retailprice
    FROM (SELECT l_partkey AS feature,
                 CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
    FULL JOIN (SELECT p_partkey AS feature, p_retailprice FROM part) b
      ON a.feature = b.feature
    """,
)
def matrix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = (
        cat.lineitem.groupBy(F.col("l_partkey").alias("feature"))
        .agg(F.round(F.avg("l_quantity"), 6).alias("avg_qty"))
    )
    b = cat.part.select(F.col("p_partkey").alias("feature"), "p_retailprice")
    return mx.join_matrices([a, b], on="feature", how="full")


# --------------------------------------------------------------------------
# 6. SNV/MAF transform: VAF ratio, drop inputs, rename to Xena schema,
#    barcode trim.
# --------------------------------------------------------------------------
@query(
    "snv_vaf",
    """
    SELECT l_partkey AS gene, l_returnflag AS chrom, l_orderkey AS start,
           CAST(l_linenumber AS INT) AS "end",
           substr(CAST(l_shipdate AS VARCHAR), 1, 7) AS sampleid,
           l_quantity / (l_quantity + l_linenumber) AS dna_vaf
    FROM lineitem
    """,
)
def snv_vaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    df = li.select(
        "l_partkey",
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("string").alias("sampleid"),
        F.col("l_quantity").alias("t_alt_count"),
        (F.col("l_quantity") + F.col("l_linenumber")).alias("t_depth"),
    )
    df = snv.with_vaf(df, "t_alt_count", "t_depth")
    df = snv.trim_barcode(df, "sampleid", 7)
    return snv.rename_columns(
        df,
        {
            "l_partkey": "gene",
            "l_returnflag": "chrom",
            "l_orderkey": "start",
            "l_linenumber": "end",
        },
    )


# --------------------------------------------------------------------------
# 7. Placeholder-row removal: keep a sentinel row only when its sample has no
#    real rows (anti-join).
# --------------------------------------------------------------------------
@query(
    "snv_placeholder_filter",
    """
    WITH real AS (SELECT * FROM lineitem WHERE NOT (l_quantity < 5)),
         ph AS (SELECT * FROM lineitem WHERE l_quantity < 5)
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber, l_quantity FROM real
    UNION ALL
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber, l_quantity FROM ph
    WHERE l_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM real)
    """,
)
def snv_placeholder_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    out = snv.drop_placeholders_with_data(
        li, "l_orderkey", F.col("l_quantity") < 5
    )
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


# --------------------------------------------------------------------------
# 8. Survival matrix: per-case record → per-sample rows, OS flag flip.
# --------------------------------------------------------------------------
@query(
    "survival_transform",
    """
    SELECT CAST(l.l_orderkey AS VARCHAR) || '_' || CAST(l.l_linenumber AS VARCHAR) AS sample,
           CAST(NOT (o.o_orderstatus = 'O') AS INT) AS OS,
           o.o_totalprice AS OS_time,
           o.o_custkey AS _PATIENT
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def survival_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    survival = cat.orders.select(
        F.col("o_orderkey").alias("case_id"),
        (F.col("o_orderstatus") == "O").alias("censored"),
        F.col("o_totalprice").alias("time"),
        F.col("o_custkey").alias("submitter_id"),
    )
    case_samples = cat.lineitem.select(
        F.col("l_orderkey").alias("case_id"),
        F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber")).alias("sample"),
    )
    return sv.survival_matrix(survival, case_samples, "case_id")


# --------------------------------------------------------------------------
# 9. Phenotype coalesce-join: clinical values take priority over biospecimen
#    on overlapping columns.
# --------------------------------------------------------------------------
@query(
    "pheno_coalesce_join",
    """
    WITH clin AS (
        SELECT c_custkey AS custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS segment,
               c_acctbal AS acctbal
        FROM customer),
    bio AS (
        SELECT o_custkey AS custkey, max(o_orderpriority) AS segment,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey)
    SELECT COALESCE(clin.custkey, bio.custkey) AS custkey,
           COALESCE(clin.segment, bio.segment) AS segment,
           clin.acctbal, bio.n_orders
    FROM clin FULL JOIN bio ON clin.custkey = bio.custkey
    """,
)
def pheno_coalesce_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    clin = cat.customer.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )
    bio = cat.orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderpriority").alias("segment"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return mx.coalesce_join(clin, bio, on="custkey", how="full")


# --------------------------------------------------------------------------
# 10. Most-recent-follow-up per key (window argmax with tiebreak).
# --------------------------------------------------------------------------
@query(
    "latest_followup",
    """
    SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM (SELECT *, row_number() OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def latest_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    latest = ph.latest_per_key(orders, "o_custkey", "o_orderdate", ("o_orderkey",))
    return latest.select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


# --------------------------------------------------------------------------
# 11. Keep-samples semi-join filter.
# --------------------------------------------------------------------------
@query(
    "keep_samples",
    """
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
    """,
)
def keep_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    members = cat.supplier.filter(F.col("s_acctbal") > 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    kept = ph.keep_samples_filter(cat.lineitem, members, "l_suppkey")
    return kept.select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")


# --------------------------------------------------------------------------
# 12. Two-field mapping: key → sorted distinct set of values.
# --------------------------------------------------------------------------
@query(
    "field_map",
    """
    SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS mapped
    FROM customer GROUP BY c_nationkey
    """,
)
def field_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = Catalog(spark, sf_dir).customer
    return mp.field_map(customer, "c_nationkey", "c_mktsegment")


# --------------------------------------------------------------------------
# 13. check-new summary: membership filter + distinct impact summary.
# --------------------------------------------------------------------------
_CHECK_NEW_IDS = list(range(1, 2000, 3))

@query(
    "check_new",
    f"""
    SELECT DISTINCT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderkey IN ({", ".join(str(i) for i in _CHECK_NEW_IDS)})
    """,
)
def check_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return mp.check_new(
        orders, "o_orderkey", _CHECK_NEW_IDS, ["o_orderpriority", "o_orderstatus"]
    )


# --------------------------------------------------------------------------
# 14. Project-info catalog join: dims broadcast onto the fact side.
# --------------------------------------------------------------------------
@query(
    "project_info",
    """
    SELECT r_name AS region, n_name AS nation,
           CAST(count(c_custkey) AS BIGINT) AS n_customers,
           CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS total_acctbal
    FROM region
    JOIN nation ON r_regionkey = n_regionkey
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name, n_name
    """,
)
def project_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        F.broadcast(cat.region)
        .join(F.broadcast(cat.nation), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(cat.customer, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# 15. Derived earliest-diagnosis columns: min per key + unit conversion.
# --------------------------------------------------------------------------
@query(
    "earliest_diagnosis",
    """
    SELECT o_custkey, min(o_totalprice) AS earliest,
           min(o_totalprice) / 365.0 AS earliest_years
    FROM orders GROUP BY o_custkey
    """,
)
def earliest_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return orders.groupBy("o_custkey").agg(
        F.min("o_totalprice").alias("earliest"),
        (F.min("o_totalprice") / 365.0).alias("earliest_years"),
    )


# --------------------------------------------------------------------------
# 16. Postprocess: rename values via mapping table + drop duplicate rows.
# --------------------------------------------------------------------------
@query(
    "postprocess_dedup",
    """
    SELECT DISTINCT COALESCE(s.s_name, CAST(l.l_suppkey AS VARCHAR)) AS sample,
           l.l_partkey, l.l_quantity
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) AS sk, s_name FROM supplier) s
      ON CAST(l.l_suppkey AS VARCHAR) = s.sk
    """,
)
def postprocess_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    df = cat.lineitem.select(
        F.col("l_suppkey").cast("string").alias("sample"),
        "l_partkey",
        "l_quantity",
    )
    m = cat.supplier.select(
        F.col("s_suppkey").cast("string").alias("sk"), "s_name"
    )
    renamed = mp.rename_by_mapping(df, m, "sample", "sk", "s_name")
    return mp.dedup_rows(renamed)


# --------------------------------------------------------------------------
# 17. xena-eql: order-insensitive matrix equality via symmetric-diff counts.
# --------------------------------------------------------------------------
@query(
    "xena_eql",
    """
    WITH m AS (SELECT l_orderkey, l_linenumber,
                      CAST(round(sum(l_quantity), 2) AS DOUBLE) AS q
               FROM lineitem GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS compared_rows,
           CAST(sum(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mismatched_rows
    FROM m
    """,
)
def xena_eql(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    left = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.round(F.sum("l_quantity"), 2).alias("q")
    )
    right = left.withColumn(
        "q",
        F.when(F.col("l_linenumber") == 1, F.col("q") + 1).otherwise(F.col("q")),
    )
    return mx.matrix_equal(left, right, keys=["l_orderkey", "l_linenumber"])


# --------------------------------------------------------------------------
# 18. Tumbling-window aggregation over events (streaming-ready plan).
# --------------------------------------------------------------------------
@query(
    "events_window",
    """
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ws,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(value), 6) AS DOUBLE) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.windowed_agg(Catalog(spark, sf_dir).events)


# --------------------------------------------------------------------------
# 19. Gap-based sessionization.
# --------------------------------------------------------------------------
@query(
    "sessionize",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
    g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
        FROM g)
    SELECT user_id, session_num, CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_num
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.sessionize(Catalog(spark, sf_dir).events)
