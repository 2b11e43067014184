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
