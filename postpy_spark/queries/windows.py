"""Group B4 — window functions (SURVEY.md §2.B4).

Determinism discipline: any ranking/frame whose order admits ties gets a
unique-key tiebreak in BOTH engines, and float frame-aggregates are rounded
(window sum/avg may associate differently across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postpy_spark.io import load_table
from postpy_spark.registry import query


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT)       AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    group="B4",
)
def win_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "win_lead_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           DATE_DIFF('second', LAG(ts) OVER w, ts) AS secs_since_prev
    FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    group="B4",
)
def win_lead_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        # NTZ has no direct long cast; go via LTZ (session tz is pinned UTC,
        # so the epoch seconds match DuckDB's date_diff('second', ...)).
        (
            F.col("ts").cast("timestamp").cast("bigint")
            - F.lag(F.col("ts").cast("timestamp").cast("bigint")).over(w)
        ).alias("secs_since_prev"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_value
    FROM events
    """,
    group="B4",
)
def win_running_sum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
           AS moving_avg
    FROM events
    """,
    group="B4",
)
def win_moving_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return e.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("moving_avg")
    )


@query(
    "win_ntile_pctrank",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w    AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    group="B4",
)
def win_ntile_pctrank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile/percent_rank/cume_dist WITHOUT the single-task global
    window: routed through the range-partitioned ranking path
    (operators.ranking.ranked_analytics — same output as ``NTILE(4) OVER
    (ORDER BY …)``, shuffle-parallel execution).  The naive
    ``Window.orderBy`` formulation funnels all data through one task; this
    one survives 100 TB.  ``win_ntile_distributed`` keeps the same routing
    under its original name."""
    from postpy_spark.operators.ranking import ranked_analytics

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return ranked_analytics(c, ["c_acctbal", "c_custkey"], n_tiles=4).select(
        "c_custkey", "quartile", "pct_rank", "cume"
    )


@query(
    "win_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           FIRST_VALUE(c_acctbal) OVER w AS seg_min_bal,
           LAST_VALUE(c_acctbal)  OVER w AS seg_max_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    group="B4",
)
def win_first_last_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_acctbal").over(w).alias("seg_min_bal"),
        F.last("c_acctbal").over(w).alias("seg_max_bal"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    group="B4",
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter — Spark pushes a
    per-partition top-k (WindowGroupLimit) before the shuffle, so this
    scales without materializing full per-group sorts."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_ntile_distributed",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w    AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    group="B4",
)
def win_ntile_distributed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same analytics as ``win_ntile_pctrank`` WITHOUT the single-task
    global window: range-partitioned global row number + offset prefix-sum
    (operators.ranking), ntile/percent_rank/cume as pure expressions.  The
    only windows in the plan run per range-partition or over the P-row
    partition-count frame — this is the formulation that survives 100 TB.
    """
    from postpy_spark.operators.ranking import ranked_analytics

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return ranked_analytics(c, ["c_acctbal", "c_custkey"], n_tiles=4).select(
        "c_custkey", "quartile", "pct_rank", "cume"
    )


@query(
    "win_nth_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price,
           ROUND(CUME_DIST() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey), 6) AS cume
    FROM orders
    """,
    group="B4",
)
def win_nth_cume_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + cume_dist — the last two SQL window functions not yet
    surfaced (rank/dense/ntile/pct_rank/lead/lag/first/last are covered
    elsewhere in B4).  nth_value needs an explicit full-partition frame
    (the default running frame would leave row 1 NULL); cume_dist takes
    the default frame.  Both ride ONE (priority, price) sort."""
    o = load_table(spark, sf_dir, "orders")
    ws = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.nth_value("o_totalprice", 2)
        .over(ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("second_price"),
        F.round(F.cume_dist().over(ws), 6).alias("cume"),
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    per_user AS (
        SELECT user_id,
               date_diff('day', MAX(CAST(ts AS DATE)), (SELECT h FROM horizon))
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
                   AS BIGINT) AS monetary_cents
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT)    AS frequency,
           monetary_cents,
           CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS BIGINT)      AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)    AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT) AS m_score
    FROM per_user
    """,
    group="B4",
)
def events_rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) — the
    classic CRM scoring query.  Metrics are ONE hash aggregate over
    events (monetary in exact integer cents); each quintile is the
    DISTRIBUTED ranked path (range exchange + offset prefix sum,
    operators/ranking.py) over the per-USER frame — three rankings of a
    users-sized frame, never a one-task global window, and never a
    second pass over raw events."""
    from postpy_spark.operators.ranking import global_row_number, ntile_expr

    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("bigint"),
                    )
                ),
                F.lit(0),
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff("h", "last_day").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    # descending keys pre-negated into columns: the ranking path buckets
    # on the first order column's VALUES (plain ascending names only)
    out = per_user.withColumn("_negf", -F.col("frequency")).withColumn(
        "_negm", -F.col("monetary_cents")
    )
    for score, order in [
        ("r_score", ["recency_days", "user_id"]),
        ("f_score", ["_negf", "user_id"]),
        ("m_score", ["_negm", "user_id"]),
    ]:
        ranked = global_row_number(out, order, rn_col="_rn", total_col="_n")
        out = ranked.withColumn(
            score, ntile_expr(F.col("_rn"), F.col("_n"), 5)
        ).drop("_rn", "_n")
    return out.drop("_negf", "_negm")
