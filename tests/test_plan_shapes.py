"""Plan-shape regression tests: lock in the physical-plan properties the
100 TB posture depends on (pushdown, broadcasts, join-free as-of, pruned
reads).  A refactor that silently loses one of these still passes
correctness — these tests are the performance contract."""

import os
import re

import pytest

from postpy_spark import registry
from tests.conftest import SF_SMOKE

REG = registry.load_all()


@pytest.fixture(scope="module", autouse=True)
def _uncached_scans(spark):
    """Plan assertions inspect parquet SCAN nodes (PushedFilters/ReadSchema);
    a table left .cache()d by an earlier module substitutes an
    InMemoryRelation and silently changes every plan under test."""
    spark.catalog.clearCache()
    yield


def executed_plan(spark, name):
    # Default spark.sql.maxMetadataStringLength (100) truncates long
    # PushedFilters lists mid-bracket, which silently breaks the
    # `\[([^\]]*)\]` regexes below (Q6 pushes 7 filters). Raise it so the
    # plan string is complete; plan *shape* is unaffected.
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
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
    # Since r10's per-iteration centroid localCheckpoint, the final plan is
    # truncated at the checkpoint (Scan ExistingRDD) and the seeding's
    # TakeOrderedAndProject executes in an EARLIER job — assert it on the
    # seeding frame's own plan instead of the (now-truncated) final plan.
    from postpy_spark.io import load_table
    from postpy_spark.operators.similarity import ivf_build

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids, _ = ivf_build(emb, n_cells=16)
    seed_plan = centroids._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in seed_plan
    assert "rangepartitioning" not in seed_plan
    assert "rangepartitioning" not in plan  # a global sort would shuffle so
    for line in plan.splitlines():
        if "Window [" in line:
            assert "query_id#" in line or "vec_id#" in line, line


@pytest.mark.parametrize("key", ["win_ntile_distributed", "win_ntile_pctrank"])
def test_ntile_avoids_global_data_window(spark, key):
    """The scalable ntile (now also the CONTRACT key win_ntile_pctrank) must
    bucket the data deterministically and run its full-data window keyed
    on the bucket id — the only unpartitioned window may be the one over
    the P-row bucket-count frame (r12: literal-split-point bucket id
    replaced the range exchange; see operators/ranking.py)."""
    plan = executed_plan(spark, key)
    assert "__rank_pid#" in plan
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


# ---------------------------------------------------------------------------
# Group D scale paths (the least driver-attested code): pin the plan shapes
# the 100 TB posture depends on — equi-join candidate generation (never a
# cartesian/BNLJ), map-side partial aggregation, broadcast-bounded rerank.
# ---------------------------------------------------------------------------


def _docs(spark):
    from postpy_spark.io import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_signature_single_shuffle_with_partial_min(spark):
    """signature = explode + groupBy: exactly ONE exchange (hashpartitioning
    on doc_id), and the MIN must partially aggregate BEFORE the shuffle so
    shuffle volume is |docs|×num_hashes, not |shingles|×num_hashes."""
    from postpy_spark.operators import dedup

    plan = _plan_of(dedup.minhash_signature(_docs(spark)))
    assert plan.count("Exchange") == 1, plan
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_lsh_candidate_pairs_equi_join_only(spark):
    """Banding must make candidate generation an EQUI self-join on
    (band_id, band_hash, _salt) — any cartesian/BNLJ here is the O(n²)
    scan LSH exists to avoid."""
    from postpy_spark.operators import dedup

    sigs = dedup.minhash_signature(_docs(spark))
    plan = _plan_of(dedup.lsh_candidate_pairs(sigs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_simhash_near_pairs_equi_join_only(spark):
    from postpy_spark.operators import dedup

    plan = _plan_of(dedup.simhash_near_pairs(_docs(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_ann_lsh_rerank_is_broadcast_bounded(spark):
    """ann_lsh_topk: the bucket join against the (small) query side must be
    a broadcast — the corpus is streamed linearly, never shuffled into a
    cartesian — and the final top-k window must be partitioned per query."""
    plan = executed_plan(spark, "sim_ann_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "query_id#" in line, line


def test_cbo_join_reorder_with_stats(spark, tmp_path):
    """SURVEY §4.1: PG's planner join-reorders from pg_statistic; Spark's
    CBO is the analog but needs ANALYZE-collected stats.  A star query
    deliberately written fact-first (orders, customer, nation, region) must
    keep its written order without CBO, and join the selective dimensions
    FIRST once column stats + cbo + joinReorder are on."""
    import re as _re

    from postpy_spark.etl import analyze_table
    from postpy_spark.io import load_table

    tables = {
        "orders": ["o_custkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "nation": ["n_nationkey", "n_regionkey"],
        "region": ["r_regionkey", "r_name"],
    }
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t, cols in tables.items():
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        # DROP of a metastore-unknown table leaves an orphan location behind
        shutil.rmtree(os.path.join(warehouse, f"cbo_{t}"), ignore_errors=True)
        load_table(spark, SF_SMOKE, t).write.mode("overwrite").saveAsTable(f"cbo_{t}")
        stats = analyze_table(spark, f"cbo_{t}", cols)
        assert stats["row_count"] > 0 and stats["size_bytes"] > 0, (t, stats)

    q = """
    SELECT o.o_orderpriority, count(*) AS cnt
    FROM cbo_orders o, cbo_customer c, cbo_nation n, cbo_region r
    WHERE o.o_custkey = c.c_custkey
      AND c.c_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
    GROUP BY o.o_orderpriority
    """

    def leaves(plan):
        seen = []
        for m in _re.findall(r"cbo_(\w+)", plan):
            if m not in seen:
                seen.append(m)
        return seen

    confs = {
        "spark.sql.cbo.enabled": None,
        "spark.sql.cbo.joinReorder.enabled": None,
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k in confs:
            spark.conf.set(k, "false")
        baseline = leaves(spark.sql(q)._jdf.queryExecution().optimizedPlan().toString())
        assert baseline[0] == "orders", baseline  # written order kept
        for k in confs:
            spark.conf.set(k, "true")
        reordered = leaves(spark.sql(q)._jdf.queryExecution().optimizedPlan().toString())
        # stats-informed: the selective dim side is joined before the fact
        assert reordered != baseline, reordered
        assert reordered.index("orders") > 0, reordered
        assert reordered.index("region") < reordered.index("orders"), reordered
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


def test_token_shard_running_sum_is_distributed(spark):
    """The global token prefix sum must use the bucketed two-phase path:
    every full-data window keyed on the deterministic bucket id — never an
    unpartitioned SUM OVER (ORDER BY) window (r12: the bucket id is a
    literal-split-point expression, not spark_partition_id after a range
    exchange, so no rangepartitioning node is expected anymore)."""
    plan = executed_plan(spark, "shard_by_token_budget")
    assert "__rank_pid#" in plan
    for line in plan.splitlines():
        if "Window [" in line and "sum(" in line and "__rank_pid#" not in line:
            # the only non-pid window is the P-row offsets frame (pmod group)
            assert "pmod(" in line, line


def test_pack_sequences_running_sum_is_distributed(spark):
    """The packing manifest's token prefix sum must ride the bucketed
    two-phase path (same contract as shard_by_token_budget): every
    full-data window keyed on the deterministic bucket id, the only
    non-pid window being the P-row offsets frame."""
    plan = executed_plan(spark, "pack_sequences")
    assert "__rank_pid#" in plan
    for line in plan.splitlines():
        if "Window [" in line and "sum(" in line and "__rank_pid#" not in line:
            assert "pmod(" in line, line


def test_watermark_running_max_is_distributed(spark):
    """stream_watermark_late's watermark (global running max of ts) must use
    the bucketed two-phase path: every full-data window keyed on the
    deterministic bucket id — never an unpartitioned MAX OVER (ORDER BY)
    that funnels events through one task (r12: literal-split-point bucket
    id replaced the range exchange; see operators/ranking.py)."""
    plan = executed_plan(spark, "stream_watermark_late")
    assert "__rank_pid#" in plan
    for line in plan.splitlines():
        if "Window [" in line and "max(" in line and "__rank_pid#" not in line:
            # the only non-pid window is the P-row partition-max frame
            assert "pmod(" in line, line


def test_tpch_q6_full_pushdown_and_pruned_read(spark):
    """Q6's whole selectivity lives in the scan: all three predicates must
    reach PushedFilters and only the 4 touched columns may be read."""
    plan = executed_plan(spark, "tpch_q6_shape")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed.group(1), f"{col} not pushed: {pushed.group(1)}"
    read = re.search(r"ReadSchema: (\S+)", plan)
    assert read and "l_orderkey" not in read.group(1)
    assert "l_partkey" not in read.group(1)


def test_tpch_q17_colocated_agg_join_and_broadcast_dim(spark):
    """Q17's decorrelated per-part AVG joins back to the fact on l_partkey:
    both sides hash-partition on the key (no extra exchange cascade into a
    nested loop), and the part dim must stay broadcast."""
    plan = executed_plan(spark, "tpch_q17_shape")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # no full-fact window snuck in during decorrelation
    assert "Window [" not in plan


def test_tpch_q21_stacked_aggregates_no_nested_loop(spark):
    """Q21's double-EXISTS decorrelation = two stacked aggregates joined
    back; supplier broadcasts.  A regression to BNLJ/cartesian (the shape a
    naive correlated rewrite produces) must fail."""
    plan = executed_plan(spark, "tpch_q21_shape")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window [" not in plan


def test_tpch_q15_scalar_max_broadcast_only(spark):
    """Q15's MAX-equality scalar subquery is a broadcast ONE-ROW join — the
    only acceptable nested-loop in the plan; supplier must broadcast-hash
    and nothing may fall back to a cartesian product."""
    plan = executed_plan(spark, "tpch_q15_shape")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # the 1-row max join may appear as BroadcastNestedLoopJoin — that's the
    # intended shape; but there must be at most one such node
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_vocab_coverage_takeordered_and_broadcast(spark):
    """Vocab selection must be TakeOrderedAndProject (partial per-partition
    top-V, no global sort / one-task window even at 100M-term vocabulary),
    and the V-row vocab must broadcast against the token stream."""
    plan = executed_plan(spark, "text_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window [" not in plan


def test_ngram_dup_ratio_no_pairs_blowup(spark):
    """Cross-doc duplicate-ngram ratio joins gram COUNTS back to grams —
    never doc pairs: no nested loop, no cartesian, no window."""
    plan = executed_plan(spark, "text_ngram_dup_ratio")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window [" not in plan


def test_corpus_mixture_window_is_partitioned(spark):
    """The cumulative-share window runs over the (lang, source) aggregate
    frame with the pmod partition key — an unpartitioned spec (first
    windowspecdefinition arg = the DESC sort column) means the tiny-frame
    discipline regressed; the only BNLJ is the broadcast 1-row total."""
    plan = executed_plan(spark, "corpus_mixture_report")
    assert "windowspecdefinition(n_tokens" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_fuzzy_blocked_join_is_hash_not_nested_loop(spark):
    """The blocking key must carry a HASH join with levenshtein as a
    residual — a regression to BroadcastNestedLoopJoin/cartesian means the
    blocking stopped working and the join went all-pairs."""
    plan = executed_plan(spark, "join_fuzzy_blocked")
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q12_residual_predicate_stays_hash_join(spark):
    """The shipdate-vs-orderdate predicate crosses the join, so it cannot be
    pushed below it — but the o_orderkey equi-key must still carry a hash
    join (never a nested loop), with the cross-table comparison as a
    residual filter above/inside it."""
    plan = executed_plan(spark, "tpch_q12_shape")
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q13_left_join_keeps_on_clause_filter(spark):
    """Q13's o_orderstatus filter lives in the LEFT join's ON clause; the
    optimizer may push it to the orders scan (preserved side is customer),
    but it must never convert the join to inner or a nested loop."""
    plan = executed_plan(spark, "tpch_q13_shape")
    assert "LeftOuter" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_plan_audit_detector_patterns():
    """Unit-pin the repo-wide plan linter's pattern rules
    (tools/plan_audit.py) so refactors can't silently blind it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(os.path.dirname(__file__), "..", "tools", "plan_audit.py")
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    # unpartitioned window: first windowspecdefinition arg is the sort spec
    bad_win = "+- Window [sum(x#1L) windowspecdefinition(x#1L ASC NULLS FIRST, specifiedwindowframe(...))]"
    good_win = "+- Window [sum(x#1L) windowspecdefinition(_w0#9L, x#1L DESC NULLS LAST, specifiedwindowframe(...))]"
    assert ("UNPARTITIONED_WIN", bad_win.strip()[:120]) in pa.flags_for(bad_win)
    assert not any(f == "UNPARTITIONED_WIN" for f, _ in pa.flags_for(good_win))

    # SinglePartition over a partial aggregate is the correct global-agg
    # shape; over anything else it's a funnel
    good_agg = (
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- HashAggregate(keys=[], functions=[partial_count(1)])"
    )
    bad_funnel = (
        "+- Exchange SinglePartition, REPARTITION_BY_NUM\n"
        "   +- FileScan parquet [a#1L]"
    )
    assert not any(f == "SINGLE_PARTITION" for f, _ in pa.flags_for(good_agg))
    assert any(f == "SINGLE_PARTITION" for f, _ in pa.flags_for(bad_funnel))

    # AQE wrappers between the exchange and the partial aggregate must not
    # false-flag (r6 ADVICE: fixed 2-line window missed this)
    aqe_wrapped = (
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- ShuffleQueryStage 1\n"
        "      +- WholeStageCodegen (2)\n"
        "         +- HashAggregate(keys=[], functions=[partial_count(1)])"
    )
    assert not any(f == "SINGLE_PARTITION" for f, _ in pa.flags_for(aqe_wrapped))
    # ...and an unrelated 'partial' in a SIBLING node must not suppress a
    # real funnel (the old substring window scanned past the subtree)
    funnel_with_sibling_partial = (
        ":- Exchange SinglePartition, REPARTITION_BY_NUM\n"
        ":  +- FileScan parquet [a#1L]\n"
        "+- HashAggregate(keys=[], functions=[partial_count(1)])"
    )
    assert any(
        f == "SINGLE_PARTITION"
        for f, _ in pa.flags_for(funnel_with_sibling_partial)
    )

    assert any(f == "CARTESIAN" for f, _ in pa.flags_for("CartesianProduct"))
    assert any(f == "PY_ROW_UDF" for f, _ in pa.flags_for("BatchEvalPython"))


def test_text_chunk_fixed_is_shuffle_free(spark):
    """Chunking is a pure projection+generate: any Exchange in this plan
    means someone added an accidental shuffle to a map-only pipeline."""
    plan = executed_plan(spark, "text_chunk_fixed")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the posexplode


def test_skyline_has_no_global_window(spark):
    """The skyline's running min must ride the range-partitioned two-phase
    scheme: no window whose partition spec funnels the full point set into
    one task (SinglePartition exchange feeding a Window over the data
    frame).  The P-row offsets window is fine — it's over partition ids."""
    plan = executed_plan(spark, "skyline_pareto")
    # the only SinglePartition exchange allowed is the tiny offsets frame
    # (input: the P-row groupBy-partition-id aggregate, never the scan)
    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.start() : m.start() + 2000]
        assert "_pid" in tail or "spark_partition_id" in tail, tail


def test_bitmap_intersect_pairs_are_broadcast(spark):
    """The 3-row pair list must broadcast; the words frames hash-join on
    word_id.  A missing broadcast would shuffle the words frame 3x."""
    plan = executed_plan(spark, "agg_bitmap_intersect")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_ohlc_is_window_free_single_agg(spark):
    """ts_resample_ohlc: open/close via min_by/max_by inside one hash
    aggregate — a Window or a second join here would betray the design."""
    plan = executed_plan(spark, "ts_resample_ohlc")
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final, final
    assert "Join" not in final, final
    # two-phase hash agg over ONE exchange
    assert final.count("Exchange hashpartitioning") == 1, final


def test_attribution_single_window(spark):
    """events_attribution: the lag flag and the running session-id sum are
    different frames over the SAME per-user partitioning+sort — they may
    print as stacked Window nodes but must share one sort and one
    exchange, and channel recovery must not add a join or a second
    window stage."""
    plan = executed_plan(spark, "events_attribution")
    final = plan.split("== Initial Plan ==")[0]
    # exactly two exchanges: user_id (window) and channel (final agg); the
    # per-(user, session) aggregate must reuse the window's partitioning
    # (Catalyst picks SortAggregate with an in-partition sort — no shuffle)
    assert final.count("Exchange hashpartitioning") == 2, final
    assert "Join" not in final, final


def test_split_assign_no_preagg_shuffle(spark):
    """docs_split_assign: pure projection into one aggregate — exactly one
    exchange (the groupBy), nothing upstream of it."""
    plan = executed_plan(spark, "docs_split_assign")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2, final  # agg + distinct-lang expand
    assert "Join" not in final and "Window" not in final, final


def test_generator_explode_is_narrow(spark):
    """fn_generator_explode: a Generate node, zero exchanges — the fan-out
    happens inside the stage."""
    plan = executed_plan(spark, "fn_generator_explode")
    final = plan.split("== Initial Plan ==")[0]
    assert "Generate" in final, final
    assert "Exchange" not in final, final


def test_asof_nearest_join_free_plan(spark):
    """join_asof_nearest (registered query): union+dual-frame window — no
    join node; TWO sorts (asc backward frame + the reversed running frame
    that replaces the O(partition²) unboundedFollowing frame) over one
    exchange."""
    plan = executed_plan(spark, "join_asof_nearest")
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final, final
    assert len(re.findall(r"\bSort \[", final)) == 2, final
    # the asof machinery itself adds exactly ONE exchange (the upstream
    # feed aggregate owns its own)
    assert final.count("Exchange hashpartitioning(__asof_key") == 1, final


def test_cdc_apply_single_exchange_partial_agg(spark):
    """etl_cdc_apply: compact-the-changelog is one two-phase hash
    aggregate — a window or join here would betray the single-shuffle
    design."""
    plan = executed_plan(spark, "etl_cdc_apply")
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final and "Join" not in final, final
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "partial_max" in final or "partial" in final.lower(), final


def test_ewma_single_window_sort(spark):
    """ts_ewma: one bounded-frame window — exactly one sort + one
    exchange; the fold must stay a JVM higher-order aggregate (no
    Python runner node)."""
    plan = executed_plan(spark, "ts_ewma")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert len(re.findall(r"\bSort \[", final)) == 1, final
    assert "Python" not in final, final


def test_interpolate_shares_sort_per_direction(spark):
    """ts_interpolate_linear: the backward (pv/peh) and forward (nv/neh)
    lookups are frames over the same (user, hour) order — at most one
    sort per frame direction downstream of the grid join, and no extra
    exchange beyond grid-join/aggs/window repartitioning."""
    plan = executed_plan(spark, "ts_interpolate_linear")
    final = plan.split("== Initial Plan ==")[0]
    # forward frame reverses sort order: 2 window sorts max (+1 in-join sort
    # pair is SMJ's, counted separately below)
    win_sorts = len(re.findall(r"\bSort \[", final))
    assert win_sorts <= 4, final
    assert "BroadcastNestedLoop" not in final, final


def test_triangle_count_no_bnlj_in_heavy_path(spark):
    """graph_triangle_count: the only BNLJ nodes are the three 1-row
    aggregate combiners; the pair-enumeration and closure joins must be
    hash/sort-merge equi-joins, and the checkpointed edge list means no
    parquet re-scan per subtree."""
    plan = executed_plan(spark, "graph_triangle_count")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastNestedLoopJoin") <= 2, final
    # pair-enum + closure (the rank-attach joins live behind the eo
    # checkpoint), both equi
    assert final.count("BroadcastHashJoin") + final.count(
        "SortMergeJoin"
    ) + final.count("ShuffledHashJoin") >= 2, final
    assert final.count("Scan parquet") <= 1, final


def test_url_canonical_single_aggregate(spark):
    """dedup_url_canonical: canonicalization is pure projection — exactly
    one exchange (the canonical groupBy, plus its distinct-count expand),
    no join, no window, no Python."""
    plan = executed_plan(spark, "dedup_url_canonical")
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final and "Window" not in final, final
    assert "Python" not in final, final
    assert final.count("Exchange hashpartitioning") <= 2, final


def test_cms_build_is_partial_agg_bounded(spark):
    """agg_cms_estimate: the sketch build must show a two-phase aggregate
    (map-side partials bound the shuffle at depth*width rows per task);
    the probe side joins on (j, bucket)."""
    plan = executed_plan(spark, "agg_cms_estimate")
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_count" in final, final
    assert "Python" not in final, final


def test_range_search_is_broadcast_linear(spark):
    """sim_range_search: corpus side streams once against the broadcast
    query set — no shuffle of the corpus, no window."""
    plan = executed_plan(spark, "sim_range_search")
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final, final
    assert "BroadcastNestedLoopJoin" in final, final
    assert "Exchange hashpartitioning" not in final, final


def test_bloom_prune_filters_fact_before_shuffle(spark):
    """join_bloom_pruned: the fact side must pass the bloom bit-test
    FILTER before any hashpartitioning exchange (that pre-shuffle drop
    is the op's whole point), the bloom itself arrives via exactly one
    BNLJ broadcast, and everything stays JVM-side."""
    plan = executed_plan(spark, "join_bloom_pruned")
    final = plan.split("== Initial Plan ==")[0]
    assert "Python" not in final, final
    # literal-bitmap form: no crossJoin/BNLJ carrying the bloom at all
    assert "BroadcastNestedLoopJoin" not in final, final
    # the bit-test lives in a Filter node (scan-adjacent, codegen'd) ...
    assert re.search(r"Filter .*element_at", final), final
    # ... BELOW the confirm semi join (plan prints top-down, so the
    # filter must appear after the join line — a reorder that hoisted
    # the bloom above the join would flip this)
    assert final.index("element_at") > final.index("LeftSemi"), final


def test_equidepth_and_rfm_have_no_one_task_window(spark):
    """agg_histogram_equidepth / events_rfm_segments: the distributed
    ranked path must key every full-data window on the deterministic
    bucket id — no empty-partition global Window (the one-task scale
    killer)."""
    for name in ("agg_histogram_equidepth", "events_rfm_segments"):
        plan = executed_plan(spark, name)
        final = plan.split("== Initial Plan ==")[0]
        assert "__rank_pid#" in final, (name, final)
        # every full-data window must ride the ranged-path partition id;
        # benign SinglePartition exchanges remain (1-row global-agg
        # combines like the RFM horizon), so assert on the windows, not
        # the exchanges
        data_windows = [
            ln
            for ln in final.splitlines()
            if "Window [" in ln and ("row_number" in ln or "sum(" in ln)
        ]
        assert data_windows, (name, final)
        assert all("__rank_pid#" in ln for ln in data_windows), (name, final)


def test_bm25_probes_and_stats_broadcast(spark):
    """text_bm25_topk: probe terms and corpus stats ride broadcasts; the
    rank window partitions by term (never a global sort of postings)."""
    plan = executed_plan(spark, "text_bm25_topk")
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final
    assert "Python" not in final, final


def test_table_diff_single_full_outer_join(spark):
    """etl_table_diff: one FullOuter join, no window, no Python."""
    plan = executed_plan(spark, "etl_table_diff")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FullOuter") == 1, final
    assert "Window" not in final and "Python" not in final, final


def test_winsorize_bounds_broadcast_back(spark):
    """fn_winsorize: the per-group percentile bounds join back as a
    BROADCAST hash join (bounds frame is |groups| rows), never a
    shuffle of the events."""
    plan = executed_plan(spark, "fn_winsorize")
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_null_skew_join_routes_nulls_around_exchange(spark):
    """join_null_skew_routed: the join branch must filter NULL keys
    BEFORE its exchange (plan prints the isnotnull filter under the
    join), and the null branch unions back without any join."""
    plan = executed_plan(spark, "join_null_skew_routed")
    final = plan.split("== Initial Plan ==")[0]
    assert "Union" in final, final
    join_at = final.find("Join")
    assert join_at != -1, final
    notnull_at = final.find("isnotnull", join_at)
    assert notnull_at != -1, final
    # exactly one join — the null branch must not add a second
    assert final.count("HashJoin") + final.count("SortMergeJoin") == 1, final


def test_pareto_gini_uses_ranged_prefix_paths(spark):
    """events_pareto_gini: both rank and cumulative sum ride the bucketed
    two-phase path (full-data windows keyed on the deterministic bucket
    id) — no SinglePartition exchange over the per-user frame."""
    plan = executed_plan(spark, "events_pareto_gini")
    final = plan.split("== Initial Plan ==")[0]
    assert "__rank_pid#" in final, final
    for m in re.finditer(r"Exchange SinglePartition", final):
        tail = final[m.start() : m.start() + 1500]
        assert "__rank_pid" in tail or "partial" in tail.lower(), tail


def test_tpch_scaling_dims_broadcast_by_size_not_hint(spark):
    """r11 verdict item 4: the TPC-H shapes no longer carry literal
    broadcast() hints on customer/part/supplier — tables that scale
    linearly with SF, where a hard hint overrides the size check and
    becomes a forced-OOM build side at 1000×+.  The hint's removal must
    NOT change the local plan: at test scale the dims sit far under
    autoBroadcastJoinThreshold, so Spark's statistics-based choice still
    broadcasts them.  If this ever regresses to SortMergeJoin at test
    scale, either the threshold conf drifted or a projection stopped
    pruning — both worth failing loudly."""
    for name, min_bhj in [
        ("tpch_q3_shape", 1),   # customer (filtered)
        ("tpch_q5_shape", 4),   # customer, supplier, nation, region
        ("tpch_q8_shape", 6),   # part, supplier, customer, n1, n2, region
        ("tpch_q16_shape", 2),  # part, supplier-filter
    ]:
        plan = executed_plan(spark, name).split("== Initial Plan ==")[0]
        n_bhj = plan.count("BroadcastHashJoin")
        assert n_bhj >= min_bhj, f"{name}: {n_bhj} BroadcastHashJoin < {min_bhj}\n{plan}"
        assert "SortMergeJoin" not in plan or name == "tpch_q8_shape", name
        # no literal hint remains on the scaling dims: the source of truth
        # is the code itself, but the plan must at least not CARTESIAN
        assert "CartesianProduct" not in plan, name
