#!/usr/bin/env python
"""Repo-wide physical-plan lint: scan EVERY registered query's executed
plan for scale anti-patterns.  tests/test_plan_shapes.py pins a hand-picked
set; this sweeps all of them so a new query can't quietly ship a cartesian
product or a one-task window.

Flags (each reported as ``query: FLAG detail``):

- CARTESIAN           CartesianProduct anywhere
- NESTED_LOOP         BroadcastNestedLoopJoin (legit only for broadcast
                      one-row/scalar joins — whitelist below)
- UNPARTITIONED_WIN   windowspecdefinition whose first argument is already
                      the sort spec (no partition key): the whole input
                      funnels through ONE task (legit only over provably
                      tiny frames — whitelist)
- PY_ROW_UDF          BatchEvalPython (row-at-a-time Python; the Arrow path
                      is ArrowEvalPython / mapInPandas) — legit only for the
                      contract op that IS this surface
- SINGLE_PARTITION    Exchange SinglePartition whose child is NOT a
                      partial aggregate.  (Global aggregates correctly
                      exchange P partial-agg rows to one partition for the
                      final merge — that is the distributed shape, not a
                      funnel.  A SinglePartition exchange over raw rows —
                      repartition(1)/coalesce(1)/unpartitioned sort — IS.)

Usage: python tools/plan_audit.py [--sf DIR] [names...]
Exit 1 if any NON-WHITELISTED flag fires.  The whitelist is the audited,
justified set — grow it only with a reason string.
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")

from postpy_spark import registry  # noqa: E402
from postpy_spark.session import get_spark  # noqa: E402

# (query, flag) -> why it's acceptable.  Every entry must argue a BOUND on
# the data the flagged node sees.
WHITELIST: dict[tuple[str, str], str] = {
    # --- broadcast scalar/one-row joins (BNLJ over <= a few rows) ---
    ("tpch_q15_shape", "NESTED_LOOP"): "broadcast 1-row MAX-equality scalar",
    ("corpus_mixture_report", "NESTED_LOOP"): "broadcast 1-row corpus total",
    ("text_tfidf", "NESTED_LOOP"): "broadcast 1-row corpus size",
    ("text_keywords_tfidf", "NESTED_LOOP"): "broadcast 1-row corpus size (IDF stage)",
    ("text_bm25_topk", "NESTED_LOOP"): "broadcast 1-row corpus stats (N, avgdl)",
    ("stat_crosstab_chi2", "NESTED_LOOP"): "broadcast 1-row grand total",
    ("ts_seasonal_profile", "NESTED_LOOP"): "broadcast 1-row global mean",
    ("ml_woe_encoding", "NESTED_LOOP"): "broadcast 1-row pos/neg totals",
    ("events_pareto_gini", "NESTED_LOOP"): "broadcast 1-row grand total",
    ("stat_join_cardinality_est", "NESTED_LOOP"):
        "all sides are 1-row count/sketch-estimate frames",
    ("stat_cardinality_planted", "NESTED_LOOP"):
        "all sides are 1-row count/sketch-estimate frames (exact twin)",
    ("events_basket_lift", "NESTED_LOOP"): "broadcast 1-row basket count",
    ("stat_benford", "NESTED_LOOP"): "broadcast 1-row digit total",
    ("stat_ttest_welch", "NESTED_LOOP"): "broadcast 1-row group stats triple",
    ("stat_ks_test", "NESTED_LOOP"): "broadcast 1-row (na, nb) sample totals",
    ("stat_psi_drift", "NESTED_LOOP"): "broadcast 1-row (tr, tc) split totals",
    ("events_rfm_segments", "NESTED_LOOP"): "broadcast 1-row horizon date",
    ("text_bigram_lm", "NESTED_LOOP"): "broadcast 1-row vocab size",
    ("text_lm_ppl_buckets", "NESTED_LOOP"): "broadcast 1-row vocab size (LM stage)",
    ("tpch_q22_shape", "NESTED_LOOP"): "broadcast 1-row avg-balance scalar",
    ("tpch_q11_shape", "NESTED_LOOP"): "broadcast 1-row global-value total",
    ("tpch_q14_shape", "NESTED_LOOP"): "broadcast 1-row promo-share denominator",
    ("tpch_q8_shape", "NESTED_LOOP"): "broadcast 1-row year volume totals",
    ("agg_hll_mergeable", "NESTED_LOOP"): "broadcast 1-row merged-HLL grand total",
    ("scalar_subquery", "NESTED_LOOP"): "the op IS the broadcast scalar subquery",
    ("join_theta", "NESTED_LOOP"): "the op IS a non-equi theta join; inputs pre-filtered small",
    ("join_cross", "NESTED_LOOP"): "the op IS a cross join over two broadcast-small dims",
    ("sim_cosine_pairs", "NESTED_LOOP"): "documented O(n²) verification oracle, never the scale path",
    ("dedup_ngram_jaccard", "NESTED_LOOP"): "documented exact-Jaccard oracle over capped candidates",
    ("dedup_containment", "NESTED_LOOP"):
        "documented exact-containment oracle over capped candidates; scale "
        "path = MinHash-banded candidates then this verify",
    ("sim_topk_per_query", "NESTED_LOOP"): "broadcast SMALL query set vs corpus — linear, documented",
    ("sim_range_search", "NESTED_LOOP"):
        "broadcast SMALL query set vs corpus — linear radius scan, documented; "
        "corpus×corpus radius joins use the bucketed embedding-dedup path",
    ("sim_ann_lsh", "NESTED_LOOP"): "broadcast query band signatures (small query set)",
    ("sim_pq_topk", "NESTED_LOOP"): "broadcast query LUTs (small query set)",
    ("sim_mmr_rerank", "NESTED_LOOP"):
        "candidate stage = broadcast SMALL query set vs corpus (same shape as "
        "sim_topk_per_query); greedy stage bounded at n_candidates per query",
    ("dedup_embedding_cosine", "NESTED_LOOP"): "bucketed candidates; BNLJ side is broadcast-bounded",
    ("kmeans_clusters", "NESTED_LOOP"): "broadcast k centroids",
    ("kmeans_planted", "NESTED_LOOP"):
        "same Lloyd assignment path on the planted geometry (broadcast k=4 centroids)",
    ("sim_ivf_topk", "NESTED_LOOP"): "broadcast n_cells centroids + probed cells",
    ("sim_ivf_planted", "NESTED_LOOP"):
        "same IVF path on the planted one-hot corpus (broadcast centroids "
        "+ probed cells)",
    ("sim_ivfpq_topk", "NESTED_LOOP"):
        "broadcast n_cells centroids (probe) + |q|*n_probe query LUTs",
    ("sim_ivfpq_planted", "NESTED_LOOP"):
        "same IVF-PQ path on the planted one-hot corpus (broadcast "
        "centroids + query LUTs)",
    ("sim_mmr_planted", "NESTED_LOOP"):
        "same MMR path on the planted one-hot corpus (broadcast 25-row "
        "query set; greedy bounded at n_candidates)",
    ("dedup_semantic", "NESTED_LOOP"): "broadcast n_cells centroids (cluster assignment argmax)",
    ("dedup_semantic_planted", "NESTED_LOOP"): "same SemDeDup path on the planted one-hot corpus (broadcast centroids)",
    ("join_cross", "CARTESIAN"): "the op IS a cross join (pre-filtered dims)",
    ("graph_triangle_count", "NESTED_LOOP"):
        "combining the three 1-row aggregate frames (node/edge/triangle "
        "counts); every BNLJ side is exactly one row",
    # --- windows over provably bounded frames ---
    ("win_ntile_pctrank", "UNPARTITIONED_WIN"):
        "the CONTRACT op documents the naive global window; the distributed "
        "variant is win_ntile_distributed",
    ("events_top_paths", "UNPARTITIONED_WIN"):
        "rank over aggregated path counts: <= |event_types|^3 = 125 rows",
    ("text_zipf_slope", "UNPARTITIONED_WIN"):
        "rank over the LIMIT-256 vocabulary head: frame bounded at 256 rows "
        "by construction (TakeOrdered feeds it)",
    ("text_heavy_hitters", "UNPARTITIONED_WIN"):
        "rank over MG candidates: <= partitions x capacity rows (test-pinned)",
    ("text_tokenize_tf", "UNPARTITIONED_WIN"):
        "rank within per-lang term counts: vocab-bounded per language",
    ("ts_change_point", "UNPARTITIONED_WIN"):
        "cumulatives over the DAILY aggregate: days-sized frame by construction",
    ("ts_change_point", "SINGLE_PARTITION"):
        "the same days-sized daily frame feeding its global window",
    # --- the contract ops that ARE the row-at-a-time surface ---
    ("udf_scalar_py", "PY_ROW_UDF"): "group-E contract op for the classic UDF path",
    ("udtf_python", "PY_ROW_UDF"): "the op IS the classic Python UDTF surface",
    ("udtf_table_arg", "PY_ROW_UDF"): "the op IS the TABLE-arg UDTF surface; partition-shuffle shape matches the aggregate twin",
    ("udtf_python_analyze", "PY_ROW_UDF"):
        "the op IS the polymorphic (analyze) Python UDTF surface; bounded input",
    ("sample_mixture_stable", "NESTED_LOOP"): "broadcast per-lang keep-rate frame (|langs| rows)",
}

_UNPART_WIN = re.compile(r"windowspecdefinition\([^,()]*(?: ASC| DESC)")


def flags_for(plan: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    if "CartesianProduct" in plan:
        out.append(("CARTESIAN", ""))
    if "BroadcastNestedLoopJoin" in plan:
        out.append(("NESTED_LOOP", ""))
    for line in plan.splitlines():
        if "Window [" in line and _UNPART_WIN.search(line):
            out.append(("UNPARTITIONED_WIN", line.strip()[:120]))
            break
    if "BatchEvalPython" in plan:
        out.append(("PY_ROW_UDF", ""))
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # a partial aggregate feeding the exchange means only P partial
        # rows cross — the correct global-agg shape, not a data funnel
        if not _exchange_feeds_partial_agg(lines, i):
            out.append(("SINGLE_PARTITION", line.strip()[:120]))
            break
    return out


# AQE / codegen wrapper nodes that may sit between an exchange and its real
# child in the printed tree — transparent for the funnel question.
_WRAPPER_NODES = (
    "ShuffleQueryStage",
    "AQEShuffleRead",
    "InputAdapter",
    "WholeStageCodegen",
    "ReusedExchange",
    "TableCacheQueryStage",
)


def _tree_depth(line: str) -> int:
    """Indentation depth of a plan-tree line: where the node text starts,
    past the tree-drawing / codegen-id prefix (``+-``, ``:-``, ``*(3) ``)."""
    return len(line) - len(line.lstrip(" :+-*()0123456789"))


def _exchange_feeds_partial_agg(lines: list[str], i: int) -> bool:
    """True when the first real (non-wrapper) node UNDER the exchange at
    ``lines[i]`` is a partial aggregate.  Scans by tree depth instead of a
    fixed 2-line window: AQE wrappers between the exchange and the partial
    aggregate no longer false-flag, and an unrelated 'partial' elsewhere no
    longer suppresses a real funnel."""
    d0 = _tree_depth(lines[i])
    for line in lines[i + 1 :]:
        if not line.strip():
            break
        if _tree_depth(line) <= d0:
            return False  # sibling or parent — no deeper child to inspect
        if any(w in line for w in _WRAPPER_NODES):
            continue
        is_agg = "HashAggregate" in line or "SortAggregate" in line or (
            "ObjectHashAggregate" in line
        )
        return is_agg and "partial_" in line
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("postpy-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    reg = registry.load_all()
    names = args.names or sorted(reg)

    bad = 0
    for name in names:
        try:
            df = reg[name].fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - build failure is its own bug
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
            bad += 1
            continue
        for flag, detail in flags_for(plan):
            why = WHITELIST.get((name, flag))
            if why:
                print(f"ok    {name}: {flag} (whitelisted: {why})")
            else:
                print(f"FLAG  {name}: {flag} {detail}")
                bad += 1
    print(f"\n{'FAIL' if bad else 'PASS'}: {bad} non-whitelisted flags")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
