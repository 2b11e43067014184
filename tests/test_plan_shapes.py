"""Plan-shape regression tests: lock in the physical-plan properties the
100 TB posture depends on (pushdown, broadcasts, join-free as-of, pruned
reads).  A refactor that silently loses one of these still passes
correctness — these tests are the performance contract."""

import re

import pytest

from postpy_spark import registry
from tests.conftest import SF_SMOKE

REG = registry.load_all()


def executed_plan(spark, name):
    df = REG[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_agg_groupby_pushes_shipdate_filter(spark):
    plan = executed_plan(spark, "agg_groupby")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1)
    # scan must not read columns the query doesn't touch
    read = re.search(r"ReadSchema: (\S+)", plan)
    assert read and "l_orderkey" not in read.group(1)


def test_join_broadcast_uses_broadcast_hash(spark):
    plan = executed_plan(spark, "join_broadcast")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_multiway_star_all_dims_broadcast(spark):
    plan = executed_plan(spark, "join_multiway_star")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_join_free(spark):
    plan = executed_plan(spark, "join_asof")
    # union+window implementation: a Window over a Union, no Join operator
    # for the as-of matching itself (the only join-ish node would come from
    # the pre-aggregation, which there isn't)
    assert "Join" not in plan
    assert "Window" in plan


def test_range_interval_join_not_nested_loop(spark):
    plan = executed_plan(spark, "join_range_interval")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_topk_per_group_uses_window_group_limit(spark):
    plan = executed_plan(spark, "topk_per_group")
    # Spark 3.5+/4 pushes rn<=k down as WindowGroupLimit before the shuffle
    assert "WindowGroupLimit" in plan


def test_topk_global_is_take_ordered(spark):
    plan = executed_plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_multimodal_metadata_scan_prunes_text(spark):
    plan = executed_plan(spark, "multimodal_resize")
    read = re.search(r"ReadSchema: (\S+)", plan)
    assert read and "text" not in read.group(1)


@pytest.mark.parametrize("name", ["join_semi", "join_anti"])
def test_semi_anti_plans(spark, name):
    plan = executed_plan(spark, name)
    kind = "LeftSemi" if name == "join_semi" else "LeftAnti"
    assert kind in plan


def test_ivf_no_global_sort_or_unpartitioned_window(spark):
    """Round-1 scale defect: ivf_build ranked the whole corpus through one
    task (Window.orderBy with no partitioning) plus a driver count().  The
    reseeded build must sample centroids via TakeOrderedAndProject (partial
    per-partition top-k) and every Window in the plan must be partitioned
    by query_id / vec_id — never a global window over the corpus."""
    plan = executed_plan(spark, "sim_ivf_topk")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # a global sort would shuffle so
    for line in plan.splitlines():
        if "Window [" in line:
            assert "query_id#" in line or "vec_id#" in line, line


@pytest.mark.parametrize("key", ["win_ntile_distributed", "win_ntile_pctrank"])
def test_ntile_avoids_global_data_window(spark, key):
    """The scalable ntile (now also the CONTRACT key win_ntile_pctrank) must
    range-partition the data and run its full-data window keyed on the
    partition id — the only unpartitioned window may be the one over the
    P-row partition-count frame."""
    plan = executed_plan(spark, key)
    assert "rangepartitioning" in plan
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "row_number" in ln
    ]
    assert data_windows and all("__rank_pid#" in ln for ln in data_windows)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-group pruning for selective fact⋈filtered-dim joins: with
    the optimizer's bloom-filter rewrite on, the selective side's keys are
    aggregated into a bloom filter that pre-filters the big side before the
    shuffle — at 100 TB this is the difference between shuffling the whole
    fact table and shuffling the ~matching slice."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from postpy_spark.io import load_table

        l = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter("o_totalprice > 450000")
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan  # probe side actually applies it
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_join_strategy_hints_are_honored(spark):
    """Deployers tune join strategy per query at scale; the hints must
    actually reach the planner: shuffle_hash forces ShuffledHashJoin and
    merge forces SortMergeJoin even where broadcast would win."""
    from postpy_spark.io import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    n = load_table(spark, SF_SMOKE, "customer")
    sh = o.join(n.hint("shuffle_hash"), o.o_custkey == n.c_custkey)
    assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()
    sm = o.join(n.hint("merge"), o.o_custkey == n.c_custkey)
    assert "SortMergeJoin" in sm._jdf.queryExecution().executedPlan().toString()


def test_rebalance_hint_reaches_planner(spark):
    """AQE rebalance (the skewed-WRITE cure: splits oversized output
    partitions without a fixed count) must survive planning."""
    from postpy_spark.io import load_table

    df = load_table(spark, SF_SMOKE, "lineitem").hint("rebalance")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan
