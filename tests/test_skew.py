"""Salted join: result equivalence + partition-spread property."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from postpy_spark.operators.skew import salted_join, skew_stats


def test_salted_join_equals_plain_join(spark):
    # heavily skewed big side: one key owns 90% of rows
    big = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(900)] + [Row(k=i % 7 + 2, v=i) for i in range(100)]
    )
    small = spark.createDataFrame([Row(k=i, w=f"dim{i}") for i in range(10)])
    plain = big.join(small, "k").select("k", "v", "w")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([Row(k=1, v=1), Row(k=99, v=2)])
    small = spark.createDataFrame([Row(k=1, w="a")])
    out = {r.v: r.w for r in salted_join(big, small, "k", n_salts=4, how="left").collect()}
    assert out == {1: "a", 2: None}


def test_salt_spreads_hot_key(spark):
    big = spark.createDataFrame([Row(k=1, v=i) for i in range(1000)])
    salted = big.withColumn("_salt", (F.rand(seed=42) * 8).cast("int"))
    spread = salted.groupBy("_salt").count().collect()
    assert len(spread) == 8
    assert max(r["count"] for r in spread) < 1000 * 0.3  # no reducer owns the key


def test_skew_stats(spark):
    df = spark.createDataFrame([Row(k=1)] * 98 + [Row(k=2), Row(k=3)])
    top = skew_stats(df, ["k"], top=1).collect()[0]
    assert top.k == 1 and top.n_rows == 98 and abs(top.share - 0.98) < 1e-9


def test_salted_join_rejects_right_and_full_outer(spark):
    """Replicating the small side makes its UNMATCHED rows appear once per
    salt under right/full outer semantics — salted_join must refuse."""
    big = spark.createDataFrame([Row(k=1, v=1)])
    small = spark.createDataFrame([Row(k=2, w="orphan")])
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", n_salts=4, how=how)


# ---------------------------------------------------------------------------
# As-of bucketing + salted range join (skew escape hatches)
# ---------------------------------------------------------------------------


def _skewed_events(spark, n=20_000, hot_share=0.2):
    """One user owns hot_share of all events — the power-law case."""
    n_hot = int(n * hot_share)
    hot = spark.range(n_hot).selectExpr(
        "CAST(1 AS BIGINT) AS user_id", "id * 7 + 3 AS t", "id AS ev"
    )
    cold = spark.range(n - n_hot).selectExpr(
        "2 + CAST(id % 49 AS BIGINT) AS user_id", "id * 5 + 1 AS t", "100000 + id AS ev"
    )
    return hot.unionByName(cold)


def _rights(spark):
    """20 quote rows per user at regular times."""
    return spark.range(50 * 20).selectExpr(
        "1 + CAST(id % 50 AS BIGINT) AS user_id",
        "CAST(id / 50 AS BIGINT) * 5000 AS rt",
        "CAST(id AS DOUBLE) / 7 AS quote",
    )


def test_bucketed_asof_equals_plain_synthetic_skew(spark):
    from postpy_spark.operators.asof import asof_join

    ev, rt = _skewed_events(spark), _rights(spark)
    kw = dict(left_on="user_id", right_on="user_id", left_time="t",
              right_time="rt", right_cols=["quote"], include_right_time="rts")
    plain = asof_join(ev, rt, **kw)
    bucketed = asof_join(ev, rt, bucket_width=10_000, **kw)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b
    # the scale property: no (key, bucket) task approaches the hot key's size
    from pyspark.sql import functions as FF

    per_bucket = (
        ev.groupBy("user_id", FF.floor(FF.col("t") / 10_000).alias("b"))
        .count().agg(FF.max("count")).collect()[0][0]
    )
    hot_total = ev.filter("user_id = 1").count()
    assert per_bucket < hot_total / 2


def test_bucketed_asof_equals_plain_real_tables(spark):
    """events × per-day orders, the join_asof contract shape, on sf0.001."""
    from postpy_spark.io import load_table
    from postpy_spark.operators.asof import asof_join
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    kw = dict(left_on="user_id", right_on="o_custkey", left_time="ts",
              right_time="o_orderdate", right_cols=["day_total"],
              include_right_time="last_order_date")
    plain = asof_join(e, o, **kw)
    bucketed = asof_join(e, o, bucket_width=30 * 86400.0, **kw)  # 30-day buckets
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))


def test_salted_range_join_matches_plain(spark):
    from postpy_spark.operators.skew import salted_range_join

    ev = _skewed_events(spark, n=5_000)
    iv = spark.range(200).selectExpr(
        "1 + CAST(id % 50 AS BIGINT) AS user_id",
        "CAST(id AS BIGINT) * 300 AS t_start",
        "CAST(id AS BIGINT) * 300 + 2000 AS t_end",
        "id AS iv_id",
    )
    plain = ev.alias("e").join(
        iv.alias("i"),
        (F.col("e.user_id") == F.col("i.user_id"))
        & (F.col("e.t") >= F.col("i.t_start"))
        & (F.col("e.t") < F.col("i.t_end")),
    ).select("e.user_id", "e.t", "e.ev", "i.t_start", "i.t_end", "i.iv_id")
    salted = salted_range_join(ev, iv, "user_id", "t", "t_start", "t_end", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The 100 TB posture leans on AQE's skew-join split for residual skew
    (docs/SCALE.md): prove it actually engages.  Thresholds are lowered so
    the hot key trips the split at test scale; the final adaptive plan must
    show SortMergeJoin(skew=true) with a skewed AQEShuffleRead."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(100_000).selectExpr(
            "CASE WHEN id % 5 = 0 THEN 1 ELSE id END AS k",
            # incompressible pad: compressed shuffle sizes drive the detector
            "concat(md5(cast(id as string)), md5(cast(id+1 as string))) AS pad",
        )
        other = spark.range(30_000).selectExpr("id AS k", "id * 2 AS v")
        joined = big.join(other, "k")
        assert len(joined.collect()) == 44_000  # 20k hot-key + 24k tail rows
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_bucketed_asof_strict_mode_equals_plain(spark):
    """strict='<' tie handling must survive bucketing (equal-time rows land
    in the same bucket, so the side ordering is exercised)."""
    from postpy_spark.operators.asof import asof_join

    ev = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate([10, 100, 100, 250, 300])],
        "user_id BIGINT, t BIGINT, ev BIGINT",
    )
    rt = spark.createDataFrame(
        [(1, 10, 1.0), (1, 100, 2.0), (1, 300, 3.0)],
        "user_id BIGINT, rt BIGINT, quote DOUBLE",
    )
    kw = dict(left_on="user_id", right_on="user_id", left_time="t",
              right_time="rt", right_cols=["quote"], strict=True)
    plain = sorted(map(tuple, asof_join(ev, rt, **kw).collect()))
    bucketed = sorted(map(tuple, asof_join(ev, rt, bucket_width=100.0, **kw).collect()))
    assert plain == bucketed
    # and the strict semantics themselves: t=100 must see rt=10's quote
    got = {r.ev: r.quote for r in asof_join(ev, rt, **kw).collect()}
    assert got[1] == 1.0 and got[2] == 1.0 and got[4] == 2.0


def test_bucketed_range_join_matches_plain_and_salted(spark):
    """The grid-partitioned range join (the r11 hot-key scale path) must
    equal both the plain theta join and the salted rewrite, including on
    bucket-edge times (t == interval start / t == end excluded)."""
    from postpy_spark.operators.skew import bucketed_range_join, salted_range_join

    ev = _skewed_events(spark, n=5_000)
    iv = spark.range(200).selectExpr(
        "1 + CAST(id % 50 AS BIGINT) AS user_id",
        "CAST(id AS BIGINT) * 300 AS t_start",
        "CAST(id AS BIGINT) * 300 + 2000 AS t_end",
        "id AS iv_id",
    )
    plain = ev.alias("e").join(
        iv.alias("i"),
        (F.col("e.user_id") == F.col("i.user_id"))
        & (F.col("e.t") >= F.col("i.t_start"))
        & (F.col("e.t") < F.col("i.t_end")),
    ).select("e.user_id", "e.t", "e.ev", "i.t_start", "i.t_end", "i.iv_id")
    want = sorted(map(tuple, plain.collect()))
    # bucket width deliberately NOT a divisor of the interval length/stride
    # so intervals straddle bucket edges both aligned and misaligned
    got_b = bucketed_range_join(
        ev, iv, "user_id", "t", "t_start", "t_end", bucket_width_us=700
    )
    assert sorted(map(tuple, got_b.collect())) == want
    got_s = salted_range_join(ev, iv, "user_id", "t", "t_start", "t_end", n_salts=8)
    assert sorted(map(tuple, got_s.collect())) == want


def test_bucketed_range_join_degenerate_and_edge_intervals(spark):
    """Empty intervals (end <= start) match nothing but must not crash the
    bucket sequence; an event exactly at end is excluded, at start included."""
    from postpy_spark.operators.skew import bucketed_range_join

    ev = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 300)], "user_id BIGINT, t BIGINT"
    )
    iv = spark.createDataFrame(
        [(1, 100, 300, "ok"), (1, 250, 250, "empty"), (1, 400, 350, "inverted")],
        "user_id BIGINT, t_start BIGINT, t_end BIGINT, tag STRING",
    )
    got = bucketed_range_join(
        ev, iv, "user_id", "t", "t_start", "t_end", bucket_width_us=64
    ).collect()
    assert sorted((r.t, r.tag) for r in got) == [(100, "ok"), (200, "ok")]


def test_bucketed_range_join_fractional_end(spark):
    """r11-advice hazard: an interval whose EXCLUSIVE end lies within one
    unit past a bucket edge on a FRACTIONAL axis (end=3600.5 at w=3600)
    must still explode into its final bucket — floor((end-1)/w) dropped
    it; the fix computes hi = ceil(end/w) - 1.  Events at t=3600.0 and
    t=3600.25 fall inside [0, 3600.5) and live in bucket 1."""
    from postpy_spark.operators.skew import bucketed_range_join

    ev = spark.createDataFrame(
        [(1, 10.0, 100), (1, 3600.0, 101), (1, 3600.25, 102), (1, 3600.5, 103)],
        "k BIGINT, t DOUBLE, ev BIGINT",
    )
    iv = spark.createDataFrame(
        [(1, 0.0, 3600.5, 7)], "k BIGINT, t_start DOUBLE, t_end DOUBLE, iv_id BIGINT"
    )
    got = bucketed_range_join(ev, iv, "k", "t", "t_start", "t_end", bucket_width_us=3600)
    assert sorted(r.ev for r in got.collect()) == [100, 101, 102]  # 103 excluded (end exclusive)
    # integral axis, end exactly on a bucket edge: ceil(end/w)-1 must NOT
    # reach into the edge bucket (exclusive end)
    ev2 = spark.createDataFrame([(1, 3600, 200)], "k BIGINT, t BIGINT, ev BIGINT")
    iv2 = spark.createDataFrame(
        [(1, 0, 3600, 8)], "k BIGINT, t_start BIGINT, t_end BIGINT, iv_id BIGINT"
    )
    got2 = bucketed_range_join(ev2, iv2, "k", "t", "t_start", "t_end", bucket_width_us=3600)
    assert got2.count() == 0


def test_choose_bucket_width_self_corrects(spark):
    """The auto-tuner (bucket_width_us=None) must pick W ≈ median interval
    length, escaping BOTH pathological fixed-W regimes: W far above the
    interval scale reconcentrates a hot key into a handful of giant cells
    (degenerates toward the plain per-key join the grid exists to avoid);
    W far below it multiplies interval replication ~len/W times.  Results
    must match the plain theta join either way — the tuner is a
    performance choice, never a correctness one."""
    from postpy_spark.operators.skew import bucketed_range_join, choose_bucket_width

    ev = _skewed_events(spark, n=4_000)
    iv = spark.range(200).selectExpr(
        "1 + CAST(id % 50 AS BIGINT) AS user_id",
        "CAST(id AS BIGINT) * 300 AS t_start",
        "CAST(id AS BIGINT) * 300 + 2000 AS t_end",
        "id AS iv_id",
    )
    w = choose_bucket_width(iv, "t_start", "t_end")
    assert w == 2000  # median interval length (all intervals are 2000 long)

    # pathological fixed widths vs the auto width, on the SAME data:
    # W=10^9 → every interval in bucket 0 (grid degenerate); W=1 → each
    # interval explodes ~2000×.  The auto width keeps replication ≤2 AND
    # spreads the hot key's events over many cells.
    hot_events = ev.filter("user_id = 1").count()
    def max_cell(w_):
        return (
            ev.groupBy("user_id", (F.floor(F.col("t") / w_)).alias("b"))
            .count().agg(F.max("count")).collect()[0][0]
        )
    assert max_cell(10**9) == hot_events          # degenerate: one giant cell
    # auto: hot key fanned out over its active range (the fixture's hot
    # span covers ~3 buckets at the chosen W; wider spans fan out more)
    assert max_cell(w) <= hot_events / 2
    repl = iv.selectExpr(
        f"CAST(CEIL(t_end / {w}) - 1 - FLOOR(t_start / {w}) + 1 AS BIGINT) AS n"
    ).agg(F.max("n")).collect()[0][0]
    assert repl <= 2                              # auto: ≤2 replicas/interval

    plain = ev.alias("e").join(
        iv.alias("i"),
        (F.col("e.user_id") == F.col("i.user_id"))
        & (F.col("e.t") >= F.col("i.t_start"))
        & (F.col("e.t") < F.col("i.t_end")),
    ).select("e.user_id", "e.t", "e.ev", "i.t_start", "i.t_end", "i.iv_id")
    auto = bucketed_range_join(
        ev, iv, "user_id", "t", "t_start", "t_end", bucket_width_us=None
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, auto.collect()))
