"""Bucketed co-located joins: the pre-shuffle strategy for repeated fact
joins at 100 TB (SURVEY.md §4.2).  Writing both sides bucketed on the join
key lets sort-merge join run with ZERO exchanges."""

import pytest
from pyspark.sql import functions as F

from postpy_spark.io import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    for name, df, key in [("b_orders", o, "o_custkey"), ("b_customer", c, "c_custkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, ct = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_avoids_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucketing — no exchange."""
    ot, _ = bucketed_tables
    agg = spark.table(ot).groupBy("o_custkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
