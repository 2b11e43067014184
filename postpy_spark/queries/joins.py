"""Group B2 — join surface (SURVEY.md §2.B2).

postpy delegates every join to the PostgreSQL planner; here each shape is a
declarative DataFrame join so Catalyst/AQE pick broadcast-hash vs
shuffle-hash vs sort-merge at runtime.  Explicit ``broadcast()`` hints mark
dimension tables the planner must map-side (at 100 TB the fact side never
shuffles for those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from postpy_spark.io import load_table
from postpy_spark.operators.asof import asof_join, asof_nearest_join
from postpy_spark.registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    group="B2",
)
def join_inner_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
    group="B2",
)
def join_left_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
    group="B2",
)
def join_right_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    group="B2",
)
def join_full_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = c.join(s, c.nk == s.nk, "full")
    return j.select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
    """,
    group="B2",
)
def join_semi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ≡ left_semi: no fan-out, right side only probed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    group="B2",
)
def join_anti_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_not_in",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN (SELECT NULLIF(l_partkey, 7) FROM lineitem
                            WHERE l_quantity > 45)
    """,
    group="B2",
)
def join_anti_not_in_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware NOT IN — the subquery contains a NULL, so the whole result
    must be empty (≠ left_anti semantics, which would return rows).  Spark
    plans this as a null-aware anti join only via the SQL path."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_pp_part_nin")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_pp_lineitem_nin")
    return spark.sql(
        """
        SELECT p_partkey FROM _pp_part_nin
        WHERE p_partkey NOT IN (SELECT NULLIF(l_partkey, 7) FROM _pp_lineitem_nin
                                WHERE l_quantity > 45)
        """
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
    group="B2",
)
def join_cross_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(statuses)


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    group="B2",
)
def join_broadcast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact table never shuffles: both dims are broadcast, the aggregate is
    partial+final.  At 100 TB this is THE pattern for dim enrichment.
    This op IS the explicit-hint surface, so the hints are literal by
    design; note supplier scales with SF (≈10 MB at sf10, ~1 GB at
    sf1000), so production callers at extreme tiers should prefer the
    AQE size-based choice the TPC-H shapes in composite.py demonstrate
    (r11 verdict item 4) and reserve the literal hint for provably
    bounded frames like nation/region."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    """,
    group="B2",
)
def join_theta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi component hashes; the non-equi residual filters post-probe —
    avoids a nested-loop join entirely."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal),
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "join_range_interval",
    oracle="""
    SELECT a.event_id AS purchase_id,
           COUNT(b.event_id) AS n_follow,
           ROUND(SUM(b.value), 2) AS follow_value
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
    group="B2",
)
def join_range_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join keyed on user_id: the equi key does the heavy lifting
    (hash join), the ts-range predicate is a residual — no quadratic blowup."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("event_id").alias("b_event"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("b_event").alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("follow_value"),
    )


@query(
    "join_range_salted",
    oracle="""
    SELECT a.event_id AS purchase_id,
           COUNT(*) AS n_follow,
           ROUND(SUM(b.value), 2) AS follow_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
    group="B2",
)
def join_range_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted twin of ``join_range_interval``: same interval-join
    semantics (events within [purchase.ts, purchase.ts + 1h) per user,
    closed-open so every purchase deterministically matches at least
    itself), executed through ``operators/skew.py::salted_range_join`` —
    the events side is scattered over 16 salt sub-keys and the interval
    side replicated per salt, so a hot user's probe rows land on 16
    reducers instead of serializing one task.

    SCALE HONESTY (r11 soak experiment): salting fixes REDUCER
    serialization but NOT within-key mass — when one user owns ~20% of
    both events AND intervals (the planted 16x tier), every salt replica
    still carries all of that user's intervals, so per-task work stays
    |events_u|/n_salts x |intervals_u| and the warm pass alone ran >15
    min against a 0.7 s base (aborted).  The registered hot-key SCALE
    path is therefore ``join_range_bucketed`` (time-grid partitioning,
    density-bounded per-task work) — this query remains the right tool
    only for the moderate-skew case where the interval side per key is
    genuinely small (the dimension-sized assumption its operator
    documents).  Inner-join semantics are what makes salting exact:
    every big row carries one salt and every interval is present under
    all salts, so the result equals the unsalted join (equivalence
    pytest: tests/test_skew.py::test_salted_range_join_matches_plain)."""
    from postpy_spark.operators.skew import salted_range_join

    e = load_table(spark, sf_dir, "events")
    big = e.select(
        F.col("event_id").alias("b_event"),
        "user_id",
        "ts",
        F.col("value").alias("b_value"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    joined = salted_range_join(
        big, intervals, key="user_id", big_time="ts",
        small_start="t0", small_end="t1", n_salts=16,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("follow_value"),
    )


@query(
    "join_range_bucketed",
    oracle="""
    SELECT a.event_id AS purchase_id,
           COUNT(*) AS n_follow,
           ROUND(SUM(b.value), 2) AS follow_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
    group="B2",
)
def join_range_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOT-KEY SCALE path for the point-in-interval join — identical
    semantics and oracle to ``join_range_salted``, executed through
    ``operators/skew.py::bucketed_range_join``: events land in their one
    floor(ts/1h) grid cell, intervals explode to the <= 2 cells they
    cover, and the equi-join runs on (user_id, cell).  A user owning 20%
    of the corpus fans out over their ACTIVE TIME RANGE (thousands of
    cells), so per-task work is bounded by per-hour DENSITY — the
    quantity real growth holds constant while extending history, which
    is exactly how the 16x soak synthesizes its tier.  This is the shape
    that passes the planted-hot-user soak after the salted form
    measurably could not (see join_range_salted's docstring and
    docs/SCALE_SOAK.md); equivalence pytest: tests/test_skew.py::
    test_bucketed_range_join_matches_plain_and_salted."""
    from postpy_spark.operators.skew import bucketed_range_join

    e = load_table(spark, sf_dir, "events")
    big = e.select(
        F.col("event_id").alias("b_event"),
        "user_id",
        "ts",
        F.col("value").alias("b_value"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    joined = bucketed_range_join(
        big, intervals, key="user_id", big_time="ts",
        small_start="t0", small_end="t1",
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("follow_value"),
    )


@query(
    "join_range_autowidth",
    oracle="""
    SELECT a.event_id AS purchase_id,
           COUNT(*) AS n_follow,
           ROUND(SUM(b.value), 2) AS follow_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
    GROUP BY a.event_id
    """,
    group="B2",
)
def join_range_autowidth_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join_range_bucketed`` with the grid width AUTO-TUNED from the
    interval side (bucket_width_us=None → ``choose_bucket_width``: one
    approxQuantile pass over the dimension-sized interval table picks
    W = median interval length, ≤2 grid replicas per typical interval).
    The fixed 1 h default assumed 1 h intervals; here the window is 30
    minutes, so a hard-coded W would double per-cell event density for
    no benefit — the tuner picks W = 1.8e9 µs from the data instead.
    At 100 TB the same one-pass choice adapts the grid to whatever
    interval scale the workload carries (session windows, trading
    halts, retention cohorts) without a per-pipeline constant to get
    wrong; pathological fixed widths and the tuner's escape from them
    are measured in tests/test_skew.py::test_choose_bucket_width_self_
    corrects.  Every event is an interval anchor (no purchase filter):
    the tuner must see the full interval population."""
    from postpy_spark.operators.skew import bucketed_range_join

    e = load_table(spark, sf_dir, "events")
    big = e.select(
        F.col("event_id").alias("b_event"),
        "user_id",
        "ts",
        F.col("value").alias("b_value"),
    )
    intervals = e.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t1"),
    )
    joined = bucketed_range_join(
        big, intervals, key="user_id", big_time="ts",
        small_start="t0", small_end="t1", bucket_width_us=None,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("follow_value"),
    )


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date, o.day_total
    FROM events e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_total
        FROM orders GROUP BY o_custkey, o_orderdate
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    group="B2",
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the customer's latest order day ≤ event time.
    Implemented with the single-shuffle union+window as-of operator
    (postpy_spark.operators.asof) — DuckDB's native ASOF JOIN is the oracle."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    out = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["day_total"],
        include_right_time="last_order_date",
    )
    return out.select("event_id", "user_id", "last_order_date", "day_total")


@query(
    "join_multiway_star",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    group="B2",
)
def join_multiway_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star join; Catalyst + AQE reorder and pick
    broadcast for region/nation/supplier, fact tables sort-merge on keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "join_asof_strict",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT ROUND(SUM(o2.o_totalprice), 2)
            FROM orders o2
            WHERE o2.o_custkey = e.user_id
              AND o2.o_orderdate = (SELECT MAX(o3.o_orderdate) FROM orders o3
                                    WHERE o3.o_custkey = e.user_id
                                      AND o3.o_orderdate < e.ts)) AS day_total
    FROM events e
    """,
    group="B2",
)
def join_asof_strict_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict (<) as-of: the latest order day STRICTLY before each event —
    an event at exactly an order's timestamp must not match it (the
    look-ahead-bias rule in feature engineering).  DuckDB's native ASOF
    JOIN is >= only, so the oracle is the correlated-subquery formulation;
    Spark side is the same single-shuffle union+window operator with the
    tie ordering flipped."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    out = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["day_total"],
        strict=True,
    )
    return out.select("event_id", "user_id", "day_total")


@query(
    "join_skew_salted",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, p_brand, p_size
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 20
    """,
    group="B2",
)
def join_skew_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): the fact side scattered over 16
    sub-keys, the dimension replicated per salt — the planning-time hot-key
    cure when AQE's runtime split can't apply.  The salt changes ONLY the
    shuffle distribution; the result is exactly the plain join, which is
    what the oracle checks."""
    from postpy_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") > 20)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size")
    )
    return salted_join(l, p, "l_partkey", n_salts=16)


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[-1] AS block
        FROM part
    )
    SELECT a.block,
           CAST(COUNT(*) AS BIGINT)             AS n_pairs,
           CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist,
           ROUND(AVG(levenshtein(a.p_name, b.p_name)), 4)       AS avg_dist
    FROM p a JOIN p b
      ON a.block = b.block
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    GROUP BY a.block
    """,
    group="B2",
)
def join_fuzzy_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string self-join (entity-resolution shape): candidate
    pairs come from an EQUI-join on a cheap blocking key (the name's last
    token), and the expensive edit-distance predicate runs only inside
    blocks — never all-pairs.  The classic record-linkage tradeoff:
    work is Σ block² instead of n²; skewed blocks are the salted-join /
    AQE-skew problem, already handled by the session defaults.

    Both engines implement classic Levenshtein, so the residual compares
    exactly; result aggregated per block to a stable grain."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "block",
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("block").alias("block_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    pairs = a.join(
        b,
        (F.col("block") == F.col("block_b")) & (F.col("key_a") < F.col("key_b")),
    ).filter(dist <= 4)
    return pairs.groupBy("block").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min(dist).cast("bigint").alias("min_dist"),
        F.round(F.avg(dist), 4).alias("avg_dist"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
        SELECT event_id AS purchase_id, ts AS a_s, ts + INTERVAL 2 HOUR AS a_e
        FROM events WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT event_id AS view_id, value AS view_value,
               ts AS b_s, ts + INTERVAL 1 HOUR AS b_e
        FROM events WHERE event_type = 'view'
    ),
    j AS (
        SELECT purchase_id, view_id, view_value
        FROM a JOIN b ON a_s < b_e AND b_s < a_e
    ),
    agg AS (
        SELECT purchase_id, COUNT(*) AS n_overlap,
               CAST(SUM(CAST(ROUND(view_value * 100) AS BIGINT)) AS BIGINT)
                 AS view_cents
        FROM j GROUP BY purchase_id
    )
    SELECT a.purchase_id,
           CAST(COALESCE(agg.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(agg.view_cents, 0) AS BIGINT) AS view_cents
    FROM a LEFT JOIN agg USING (purchase_id)
    """,
    group="B2",
)
def join_interval_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval-overlap join — purchase attention windows [ts, ts+2h)
    × view visibility windows [ts, ts+1h), no shared equi key.  The naive
    form is a theta join (BroadcastNestedLoop → quadratic); the scale path
    is operators/intervals.overlap_join_binned: explode each interval into
    the 1h buckets it covers, hash-join on bucket, keep true overlaps, and
    de-dup by attributing each pair to the bucket of its overlap start.
    Work is O(|A| + |B| + true_pairs), never |A|·|B|.  Money summed as
    BIGINT cents (decimal-hash landmine, CLAUDE.md)."""
    from postpy_spark.operators.intervals import overlap_join_binned

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour_us = 3_600 * 1_000_000
    a = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        us.alias("a_s"),
        (us + F.lit(2 * hour_us)).alias("a_e"),
    )
    b = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
        us.alias("b_s"),
        (us + F.lit(hour_us)).alias("b_e"),
    )
    pairs = overlap_join_binned(
        a, b, a_start="a_s", a_end="a_e", b_start="b_s", b_end="b_e",
        bucket_width_us=hour_us,
    )
    agg = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.sum(F.round(F.col("view_value") * 100).cast("long"))
        .cast("bigint")
        .alias("view_cents"),
    )
    return (
        a.select("purchase_id")
        .join(agg, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            F.coalesce("view_cents", F.lit(0)).cast("bigint").alias("view_cents"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_total
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, l.o_orderdate AS nearest_order_date, l.day_total
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o.o_orderdate, o.day_total
        FROM o
        WHERE o.o_custkey = e.user_id
          AND abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) <= 2592000000000
        ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) ASC, o.o_orderdate ASC
        LIMIT 1
    ) l ON TRUE
    """,
    group="B2",
)
def join_asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-either-direction as-of (pandas merge_asof
    direction='nearest'): each event matched to the customer's CLOSEST
    order day within a 30-day tolerance, ties resolved backward.
    Completes the as-of family (backward `join_asof`, strict
    `join_asof_strict`).  Spark side is the one-shuffle dual-frame window
    operator (operators/asof.py::asof_nearest_join); the oracle is
    DuckDB's LATERAL nearest-row formulation with the same tie-break."""
    tol_us = 30 * 86400 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
        .select(
            "o_custkey", "day_total",
            F.col("o_orderdate").alias("nearest_order_date"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_us"),
        )
    )
    out = asof_nearest_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="t_us",
        right_time="o_us",
        right_cols=["nearest_order_date", "day_total"],
        tolerance=tol_us,
    )
    return out.select("event_id", "user_id", "nearest_order_date", "day_total")


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
    group="B2",
)
def join_bloom_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with explicit Bloom-filter pre-pruning
    (operators/bloom.py): the build side's keys fold into a FIXED-SIZE
    8 KiB bitmap (one bounded groupBy, then a sketch-sized driver
    collect like the PCA/PQ reductions), the fact side drops
    non-members via a LITERAL-bitmap bit-test filter sitting directly
    on the scan — no join reordering can hoist it above the confirm
    join's exchange — and an exact semi join confirms candidates, so
    the result equals the plain semi join while the shuffled fact
    volume scales with the match rate, not the table.  The explicit
    form of Spark's runtime row-level bloom filtering, usable where
    the optimizer's heuristics would not inject one.  Pruning
    effectiveness is pinned by pytest (false-positive budget at the
    default m/k)."""
    from postpy_spark.operators.bloom import bloom_build, bloom_prune

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    candidates = bloom_prune(o, "o_custkey", bloom_build(c, "c_custkey"))
    # No broadcast hint on the confirm: the bloom exists precisely because
    # the build side may be too big to broadcast — at scale this is a
    # shuffled semi join over the PRUNED fact only (AQE may still pick
    # broadcast when the dimension happens to fit).
    return candidates.join(
        c.select("c_custkey"),
        candidates.o_custkey == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey", "o_totalprice")
