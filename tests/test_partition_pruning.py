"""Partitioned writes + static/dynamic partition pruning — the 100 TB scan
economics (SURVEY.md §4.1 'partition pruning')."""

import pytest
from pyspark.sql import functions as F

from postpy_spark.io import load_table, sink_parquet
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    sink_parquet(o, path, partition_by=["o_year"])
    return path


def test_static_partition_pruning(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).filter(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:120]
    years = {r.o_year for r in df.select("o_year").distinct().collect()}
    assert years == {1997}


def test_dynamic_partition_pruning(spark, partitioned_orders):
    """A selective dim-side filter must prune fact partitions at runtime
    (DPP inserts a dynamicpruning subquery into the scan)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.read.parquet(partitioned_orders)
        dim = (
            load_table(spark, SF_SMOKE, "orders")
            .select(F.year("o_orderdate").alias("o_year"))
            .distinct()
            .filter(F.col("o_year").isin(1996, 1997))
        )
        joined = fact.join(dim, "o_year")
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "dynamicpruning" in optimized.lower(), optimized
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
