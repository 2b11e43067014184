"""Group B1/B3/B5 — scans, projection, filtering, aggregation, set ops.

These reproduce the relational surface postpy delegates to PostgreSQL
(SURVEY.md §2 groups B1/B3/B5).  Reference implementation LoC: 0 — postpy
ships SQL strings to the server (``postpy/sql.py::select`` [U]); here each
query is a declarative DataFrame plan so Catalyst gets predicate pushdown,
column pruning and partial aggregation for free.

Float discipline: every *derived* float aggregate (sum/avg/stddev over
arithmetic) is rounded identically in the Spark plan and the oracle SQL,
because summation order differs between engines.  Stored values (min/max of
a raw column, raw projections) are bit-exact in both engines and are not
rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postpy_spark.io import load_table
from postpy_spark.registry import query

# ---------------------------------------------------------------------------
# B1 — scans, projection, filtering
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="SELECT * FROM supplier",
    group="B1",
)
def scan_parquet_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain columnar scan; vectorized parquet reader end-to-end."""
    return load_table(spark, sf_dir, "supplier")


@query(
    "project",
    oracle="SELECT c_custkey AS id, c_name AS name FROM customer",
    group="B1",
)
def project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename; ReadSchema should list exactly two columns."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
    group="B1",
)
def project_expr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2dp inputs → the products are exact 4dp/6dp decimals; rounding AT that
    # width is tie-free in both engines (rounding coarser, e.g. to 2dp, hits
    # exact .xx5 ties where Spark HALF_UP and DuckDB float-rounding diverge).
    l = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 4).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charge"),
    )


@query(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05 AND NOT (l_returnflag = 'A')
    """,
    group="B1",
)
def filter_basic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT; all predicates push into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_discount") < 0.05)
        & ~(F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c_acctbal BETWEEN 100 AND 5000
      AND c_name LIKE '%5%'
    """,
    group="B1",
)
def filter_in_between_like_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
        & F.col("c_acctbal").between(100, 5000)
        & F.col("c_name").like("%5%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL
       OR (o_orderstatus IS NOT DISTINCT FROM 'F')
    """,
    group="B1",
)
def filter_null_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>)."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.filter(
        status_or_null.isNull() | F.col("o_orderstatus").eqNullSafe(F.lit("F"))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        status_or_null.alias("status_or_null"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    group="B1",
)
def distinct_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# B3 — aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           MIN(l_discount) AS min_disc,
           MAX(l_discount) AS max_disc
    FROM lineitem
    """,
    group="B3",
)
def agg_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                            AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                       AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                            AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                       AS avg_price,
           ROUND(AVG(l_discount), 4)                                            AS avg_disc,
           COUNT(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    group="B3",
)
def agg_groupby_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary over lineitem.

    Partial (map-side) + final aggregation comes free from groupBy; the
    shipdate predicate pushes into the parquet row-group filter.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3 AND SUM(o_totalprice) > 50000
    """,
    group="B3",
)
def agg_having_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_total"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("_total") > 50000))
        .select("o_custkey", "n_orders", F.round("_total", 2).alias("total_spent"))
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    group="B3",
)
def agg_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct; Spark plans the two-phase expand automatically."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("agg_approx_distinct", oracle=None, group="B3")
def agg_approx_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality — approximate, so rows-only at the driver;
    tests assert ±5% of exact (BASELINE.md)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


@query("agg_approx_quantile", oracle=None, group="B3")
def agg_approx_quantile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile sketch (GK); tests assert tolerance vs exact quantiles.
    Output is exploded to scalar ``(q, price_quantile)`` rows — a top-level
    array column would crash the driver's canonicalizer (the r9 embed_pca
    class, now guarded by testing.nonscalar_top_level_columns)."""
    l = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.95]
    agg = l.agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("price_quantiles")
    )
    return agg.select(
        F.posexplode("price_quantiles").alias("pos", "price_quantile")
    ).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("pos") + 1).alias("q"),
        "price_quantile",
    )


@query(
    "agg_hllpp_planted",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderkey % 40) AS BIGINT) AS n40,
           CAST(COUNT(DISTINCT o_orderkey % 13) AS BIGINT) AS n13
    FROM orders WHERE o_orderkey <= 600
    """,
    group="B3",
)
def agg_hllpp_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the built-in HyperLogLog++ path
    (agg_approx_distinct is rows-only — HLL is an estimator): at rsd =
    0.01 the sketch carries 2^14+ registers, so 40 planted distinct keys
    over a FIXED key range (o_orderkey <= 600 — input byte-identical at
    every sf tier) sit deep in the linear-counting regime where the
    estimate m·ln(m/V) is within ~c²/2m « 0.5 of the true cardinality c
    and the rounded answer is EXACTLY c, provided the planted keys hit c
    distinct registers — a deterministic property of the fixed domain
    (verified at 40 and 13 keys; both answers are exact at every tier).
    Pins the HLL++ register update, merge, and estimate paths through
    the sql-hash gate; the ±5% pytest on the production query covers the
    estimating regime."""
    pk = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 600)
        .select(
            (F.col("o_orderkey") % 40).alias("k40"),
            (F.col("o_orderkey") % 13).alias("k13"),
        )
    )
    return pk.agg(
        F.approx_count_distinct("k40", rsd=0.01).alias("n40"),
        F.approx_count_distinct("k13", rsd=0.01).alias("n13"),
    )


@query(
    "agg_pctl_planted",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR((o_orderkey % 700) / 100) AS DOUBLE) AS val
        FROM orders WHERE o_orderkey <= 700
    )
    SELECT CAST(0.10 AS DOUBLE) AS q, quantile_disc(val, 0.10) AS est FROM v
    UNION ALL
    SELECT CAST(0.25 AS DOUBLE), quantile_disc(val, 0.25) FROM v
    UNION ALL
    SELECT CAST(0.50 AS DOUBLE), quantile_disc(val, 0.50) FROM v
    UNION ALL
    SELECT CAST(0.75 AS DOUBLE), quantile_disc(val, 0.75) FROM v
    UNION ALL
    SELECT CAST(0.90 AS DOUBLE), quantile_disc(val, 0.90) FROM v
    """,
    group="B3",
)
def agg_pctl_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the percentile_approx sketch path
    (agg_approx_quantile is rows-only — GK summaries are rank-approximate
    by design): with n ≈ 700 « accuracy = 10000 the summary never
    compacts, so the query is an exact rank lookup; and the plant makes
    the answer CONVENTION-PROOF — seven runs of ~100 equal values each,
    with every q·n cut point landing ≥ 25 ranks INSIDE a run, so lower-
    rank, nearest-rank, and interpolating definitions all return the
    same run value on both engines (no q·n-near-integer float hazard,
    the agg_kll_planted failure mode, can flip the answer across a run
    boundary).  Fixed key range (o_orderkey <= 700) keeps the input
    byte-identical at every sf tier.  Pins summary insert, merge, and
    rank query exactly; the tolerance pytest covers the compacting
    regime."""
    v = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 700)
        .select(
            F.floor((F.col("o_orderkey") % 700) / 100).cast("double").alias("val")
        )
    )
    qs = [0.10, 0.25, 0.50, 0.75, 0.90]
    agg = v.agg(F.percentile_approx("val", qs, 10000).alias("p"))
    return agg.select(F.posexplode("p").alias("pos", "est")).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("pos") + 1).alias(
            "q"
        ),
        "est",
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
           ROUND(VAR_SAMP(l_quantity), 4)         AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    group="B3",
)
def agg_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    group="B3",
)
def agg_grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_pp_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM _pp_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    group="B3",
)
def agg_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    group="B3",
)
def agg_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@query(
    "agg_collect",
    oracle="""
    SELECT l_returnflag, string_agg(ls, ',' ORDER BY ls) AS statuses
    FROM (SELECT DISTINCT l_returnflag, l_linestatus AS ls FROM lineitem)
    GROUP BY l_returnflag
    """,
    group="B3",
)
def agg_collect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + deterministic ordering, serialized to a string so the
    value-hash is representation-stable across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses")
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END), 2) AS returned_value,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           ROUND(AVG(CASE WHEN l_discount > 0.05 THEN l_extendedprice END), 4) AS avg_discounted
    FROM lineitem
    GROUP BY l_linestatus
    """,
    group="B3",
)
def agg_conditional_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))), 2
        ).alias("returned_value"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.round(
            F.avg(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 4
        ).alias("avg_discounted"),
    )


@query(
    "pivot_wide",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id % 100
    """,
    group="B3",
)
def pivot_wide_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot with an explicit value list (no extra distinct pass —
    at scale, always pass the values to pivot())."""
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.withColumn("user_bucket", F.col("user_id") % 100)
        .groupBy("user_bucket")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot-count yields NULL for absent combos; oracle's FILTER yields 0.
    return out.na.fill(0, kinds)


# ---------------------------------------------------------------------------
# B5 — sort / limit / set ops / sampling
# ---------------------------------------------------------------------------


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC
    LIMIT 25
    """,
    group="B5",
)
def sort_multi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort; unique-key tiebreak keeps the LIMIT slice
    deterministic in both engines (TakeOrderedAndProject physical op)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .limit(25)
    )


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20",
    group="B5",
)
def limit_n_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").limit(20)


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
    group="B5",
)
def topk_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → per-partition top-k then driver merge (no global
    sort materialization); scales as O(n log k)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(15)
    )


@query(
    "union_all",
    oracle="""
    SELECT c_custkey, c_acctbal, 'low' AS band FROM customer WHERE c_acctbal < 1000
    UNION ALL
    SELECT c_custkey, c_acctbal, 'high' AS band FROM customer WHERE c_acctbal > 9000
    """,
    group="B5",
)
def union_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    low = c.filter(F.col("c_acctbal") < 1000).select(
        "c_custkey", "c_acctbal", F.lit("low").alias("band")
    )
    high = c.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_acctbal", F.lit("high").alias("band")
    )
    return low.unionByName(high)


@query(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    group="B5",
)
def union_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "intersect_ab",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    group="B5",
)
def intersect_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_ab",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    group="B5",
)
def except_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "except_all_ab",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem
    EXCEPT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_linestatus = 'F'
    """,
    group="B5",
)
def except_all_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL — bag semantics differ from EXCEPT; tested on a
    column with heavy duplication."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.select(F.col("l_returnflag").alias("flag"))
    b = l.filter(F.col("l_linestatus") == "F").select(F.col("l_returnflag").alias("flag"))
    return a.exceptAll(b)


@query(
    "intersect_all_ab",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    group="B5",
)
def intersect_all_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") > 25).select(F.col("l_returnflag").alias("flag"))
    b = l.filter(F.col("l_discount") > 0.05).select(F.col("l_returnflag").alias("flag"))
    return a.intersectAll(b)


@query("sample_frac", oracle=None, group="B5")
def sample_frac_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — sampling sequence is engine-specific, so
    rows-only at the driver; pytest asserts the count tolerance."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@query(
    "agg_null_semantics",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, NULLIF(o_totalprice, 0) AS p,
               CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS p_closed
        FROM orders
    )
    SELECT COUNT(*)                          AS n_rows,
           COUNT(p_closed)                   AS n_closed,
           ROUND(SUM(p_closed), 2)           AS sum_closed,
           ROUND(AVG(p_closed), 4)           AS avg_closed,
           COUNT(DISTINCT p_closed IS NULL)  AS null_flag_card
    FROM t
    """,
    group="B3",
)
def agg_null_semantics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling contract: COUNT(*) counts rows, COUNT(col)/SUM/AVG skip
    NULLs — the asymmetry every aggregate consumer relies on."""
    o = load_table(spark, sf_dir, "orders")
    p_closed = F.when(F.col("o_orderstatus") == "O", None).otherwise(F.col("o_totalprice"))
    t = o.select(p_closed.alias("p_closed"))
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("p_closed").alias("n_closed"),
        F.round(F.sum("p_closed"), 2).alias("sum_closed"),
        F.round(F.avg("p_closed"), 4).alias("avg_closed"),
        F.countDistinct(F.col("p_closed").isNull()).alias("null_flag_card"),
    )


@query(
    "agg_decimal_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS exact_total_cents,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    group="B3",
)
def agg_decimal_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money aggregation: sum integer CENTS (BIGINT), which is
    associative, order-independent, and hash-identical across engines —
    the no-rounding-games alternative to double sums (postpy's `numeric`
    money path).

    Round-6 driver lesson: DECIMAL output hashes differently across engines
    even when DESCRIBE shows the same logical type on both sides (physical
    int64 vs int128 payloads), so decimals are banned from hashed oracle
    output entirely (testing.type_parity_errors enforces this); exact money
    lives in the integer class instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "exact_total_cents"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    group="B5",
)
def unpivot_long_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (inverse of pivot_wide): one row per (id, measure).
    The oracle is the engine-portable UNION ALL formulation."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn("measure", F.expr("substring(measure, 3)"))


@query("sample_stratified", oracle=None, group="B5")
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-group) sampling via sampleBy — the quality-weighted
    downsampling step of a training pipeline: uneven keep-rates per market
    segment, seeded Bernoulli per stratum (deterministic given the seed;
    per-stratum rate tolerance asserted in pytest).  Rows-only: DuckDB
    cannot reproduce Spark's per-row hash draw."""
    c = load_table(spark, sf_dir, "customer")
    fractions = {
        "AUTOMOBILE": 0.5, "BUILDING": 0.3, "FURNITURE": 0.2,
        "HOUSEHOLD": 0.1, "MACHINERY": 0.05,
    }
    return c.sampleBy("c_mktsegment", fractions, seed=42).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_dist
    FROM customer GROUP BY c_nationkey
    """,
    group="B3",
)
def agg_bitmap_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5 bitmap_*):
    keys bucket into 32k-bit bitmaps, per-(group, bucket) OR-aggregation is
    map-side partial, then bitmap popcounts sum per group.  For dense
    integer keys this replaces count_distinct's expand+two-phase with a
    fixed-width bitmap shuffle — the exact-distinct formulation that holds
    at 100 TB.  Result equals COUNT(DISTINCT) exactly (oracle-checked)."""
    c = load_table(spark, sf_dir, "customer")
    per_bucket = (
        c.select(
            "c_nationkey",
            F.expr("bitmap_bucket_number(c_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(c_custkey)").alias("pos"),
        )
        .groupBy("c_nationkey", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("cnt"))
    )
    return per_bucket.groupBy("c_nationkey").agg(F.sum("cnt").alias("n_dist"))


def _hll_per_segment_and_union(
    df: DataFrame, seg_col: str, key_col: str, out_col: str
) -> DataFrame:
    """Shared mergeable-HLL shape (production path for agg_hll_mergeable
    and the closed-form path agg_hll_planted hash-checks exactly):
    per-segment hll_sketch_agg built ONCE, re-aggregated with
    hll_union_agg for the '__ALL__' row."""
    seg = df.groupBy(seg_col).agg(
        F.expr(f"hll_sketch_agg({key_col})").alias("sk")
    )
    per_seg = seg.select(
        seg_col,
        F.expr("hll_sketch_estimate(sk)").cast("bigint").alias(out_col),
    )
    total = seg.agg(
        F.lit("__ALL__").alias(seg_col),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("bigint").alias(
            out_col
        ),
    )
    return per_seg.unionByName(total)


@query("agg_hll_mergeable", oracle=None, group="B3")
def agg_hll_mergeable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (datasketches, Spark 3.5): per-segment
    sketches are built ONCE, then re-aggregated with hll_union_agg for the
    global figure — the sketch-reuse pattern that makes rollups over
    petabyte facts cheap (build once, merge per grain).  Rows-only for the
    driver; pytest gates both estimates within ±5% of exact;
    agg_hll_planted is the sql-hash-checked exact twin."""
    c = load_table(spark, sf_dir, "customer")
    return _hll_per_segment_and_union(
        c, "c_mktsegment", "c_custkey", "approx_dist"
    )


@query(
    "agg_hll_planted",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey % 97) AS BIGINT) AS n_dist
    FROM customer WHERE c_custkey <= 900 GROUP BY 1
    UNION ALL
    SELECT '__ALL__',
           CAST(COUNT(DISTINCT c_custkey % 97) AS BIGINT)
    FROM customer WHERE c_custkey <= 900
    """,
    group="B3",
)
def agg_hll_planted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle attestation of the mergeable-HLL path
    (agg_hll_mergeable is rows-only): datasketches HLL stores coupons
    EXACTLY until the coupon set outgrows the promotion threshold
    (hundreds for the default lgK=12), so with <= 97 planted distinct
    keys per segment — a fixed modulus over a FIXED key range
    (c_custkey <= 900), hence byte-identical input at every sf tier —
    both the per-segment estimates AND the hll_union_agg merge stay in
    the exact coupon regime and the closed form is COUNT(DISTINCT).
    This pins build, serialize, union-merge, and estimate exactly
    through the production expressions; the ±5% pytest band covers the
    promoted (estimating) regime the closed form cannot."""
    pc = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 900)
        .select("c_mktsegment", (F.col("c_custkey") % 97).alias("key97"))
    )
    return _hll_per_segment_and_union(pc, "c_mktsegment", "key97", "n_dist")


@query(
    "agg_group_by_all",
    oracle="""
    SELECT c_mktsegment, c_nationkey % 5 AS nk_band,
           COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY ALL
    """,
    group="B3",
)
def agg_group_by_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (the modern dimensional shorthand, supported by both
    engines): grouping keys inferred from the non-aggregate select list."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_pp_gba_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey % 5 AS nk_band,
               COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
        FROM _pp_gba_customer GROUP BY ALL
        """
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_transform(
               quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
               x -> CAST(ROUND(x, 4) AS VARCHAR)), ',') AS quartiles
    FROM lineitem GROUP BY l_returnflag
    """,
    group="B3",
)
def agg_percentile_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (linear interpolation — Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``), emitted as a joined string
    so the array representation can't skew the hash compare.  Exact
    percentiles sort within each group: fine per-group, use
    percentile_approx (agg_approx_quantile) when groups are huge."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
    return l.groupBy("l_returnflag").agg(
        F.array_join(
            F.transform(p, lambda x: F.round(x, 4).cast("string")), ","
        ).alias("quartiles")
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS band, c_acctbal
    FROM customer
    ORDER BY NULLIF(c_nationkey % 5, 0) ASC NULLS FIRST,
             c_acctbal DESC, c_custkey
    LIMIT 200
    """,
    group="B5",
)
def sort_nulls_ordering_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST on an ascending key mixed with a descending
    tiebreak — null-placement defaults differ across engines (Spark ASC =
    nulls first, DuckDB ASC = nulls last), so portable sorts must pin it."""
    c = load_table(spark, sf_dir, "customer")
    band = F.nullif(F.col("c_nationkey") % 5, F.lit(0))
    return (
        c.select("c_custkey", band.alias("band"), "c_acctbal")
        .orderBy(
            F.col("band").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey"),
        )
        .limit(200)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
    group="B5",
)
def limit_offset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (ORDER BY + LIMIT/OFFSET, Spark ≥3.4): fine
    for shallow pages; deep OFFSET still sorts the head — prefer keyset
    (WHERE key > last_seen) pagination at depth."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(50)
    )


@query(
    "agg_bitmap_intersect",
    oracle="""
    WITH p(type_a, type_b) AS (
        VALUES ('purchase', 'view'), ('purchase', 'error'),
               ('click', 'signup')
    ),
    u AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_both
    FROM p
    JOIN u a ON a.event_type = p.type_a
    JOIN u b ON b.event_type = p.type_b AND b.user_id = a.user_id
    GROUP BY type_a, type_b
    """,
    group="B3",
)
def agg_bitmap_intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience intersection via distributed BITMAP algebra (the
    roaring-bitmap pattern, in pure DataFrame ops): users are packed into
    64-bit words — word_id = user_id div 64, one bit per user — with a
    single BIT_OR aggregate per (event_type, word_id); an audience pair's
    overlap is then a word_id equi-join + bitwise AND + BIT_COUNT sum.

    Scale: the bitmap frame is |user_space|/64 rows per audience
    regardless of event count (the BIT_OR shuffle carries words, not
    users), repeat events need NO distinct pass (BIT_OR is idempotent),
    and every pairwise intersection after that touches only word-sized
    frames.  The same words frame serves any number of pair queries —
    exactly how audience-overlap engines (e.g. ClickHouse/Druid bitmap
    datasketches) stay sublinear in raw events.  Oracle = the naive
    DISTINCT self-join."""
    e = load_table(spark, sf_dir, "events")
    pairs = [("purchase", "view"), ("purchase", "error"), ("click", "signup")]
    types = sorted({t for ab in pairs for t in ab})
    words = (
        e.filter(F.col("event_type").isin(types))
        .select(
            "event_type",
            F.expr("user_id div 64").alias("word_id"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("event_type", "word_id")
        .agg(F.bit_or("mask").alias("w"))
    )
    pair_df = spark.createDataFrame(pairs, "type_a string, type_b string")
    a = words.select(
        F.col("event_type").alias("type_a"), "word_id", F.col("w").alias("wa")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "word_id", F.col("w").alias("wb")
    )
    return (
        F.broadcast(pair_df)
        .join(a, "type_a")
        .join(b, ["type_b", "word_id"])
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb"))))
            .cast("bigint")
            .alias("n_both")
        )
    )


@query(
    "sample_topk_hash_per_group",
    oracle="""
    SELECT event_type, event_id, user_id
    FROM (
        SELECT event_type, event_id, user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR) || ':r7'), event_id
               ) AS rn
        FROM events
    ) WHERE rn <= 50
    """,
    group="B5",
)
def sample_topk_hash_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC uniform k-per-group sampling: rank by the MD5 of the
    row key + salt and keep the k smallest per group.  Unlike rand()-based
    sampling (partition-order dependent → rows-only checks), the hash rank
    is a pure function of the data, so the sample is reproducible across
    engines, runs, and partitionings — which is what you want for
    train/eval splits anyway — and the op is fully sql-checked.  Changing
    the salt re-draws the sample.

    Scale: per-group window; k-smallest per partition could further prune
    via AQE, but the rank window already shuffles only (group, hash)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    h = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":r7")))
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        e.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


@query(
    "distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
    group="B5",
)
def distinct_on_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgreSQL's DISTINCT ON — first row per key under an ORDER BY
    (here: each customer's latest order, orderkey tie-break).  Spark has
    no DISTINCT ON; the scalable equivalent is max_by on a packed
    (sort-key, payload) struct inside ONE hash aggregate — map-side
    partials, no window, no sort of the fact table.  Struct comparison
    is lexicographic, so (o_orderdate, o_orderkey) DESC packs directly."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max_by(
        F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
        F.struct("o_orderdate", "o_orderkey"),
    )
    return (
        o.groupBy("o_custkey")
        .agg(best.alias("b"))
        .select(
            "o_custkey",
            F.col("b.o_orderkey").alias("o_orderkey"),
            F.col("b.o_orderdate").alias("o_orderdate"),
            F.col("b.o_totalprice").alias("o_totalprice"),
        )
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey < 200
    GROUP BY c_nationkey
    """,
    group="B3",
)
def agg_string_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgreSQL string_agg(... ORDER BY ...) — ordered string
    concatenation per group.  Spark's listagg/collect_list gives NO
    intra-group order guarantee, so the deterministic form is
    array_sort(collect_list(...)) then array_join — the sort is
    per-group (bounded by group size), never a global sort.  Bounded to
    a key slice because concatenated blobs are an anti-pattern at scale
    (the docstring IS the warning: prefer arrays or explode downstream)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
