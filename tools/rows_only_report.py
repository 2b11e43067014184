#!/usr/bin/env python
"""Rows-only margin report (r7 verdict item 6).

The 32 rows-only queries have no DuckDB oracle BY DESIGN; each is gated
by pytest (recall floors, sketch error bands, golden fixtures,
closed-form references).  The margins — how far each measured value sits
from its gate — were previously visible only inside test internals.

This tool runs the quantitative gate tests with ``PP_MARGIN_OUT`` set
(tests call ``postpy_spark.testing.record_margin`` at their assertion
sites; a no-op in normal runs), merges the measurements with the static
gate inventory for the exact-match / property / golden-fixture gates,
and writes ``docs/ROWS_ONLY_MARGINS.json`` — one committed artifact the
driver and judge can read without spelunking test output.

Usage:  python tools/rows_only_report.py            # run gates + write
        python tools/rows_only_report.py --check    # verify file is fresh-parseable
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "ROWS_ONLY_MARGINS.json",
)

#: Tests that carry record_margin() instrumentation. Kept narrow so the
#: report run stays a few minutes, not the whole suite.
GATE_TESTS = [
    "tests/test_llm_ops.py::test_minhash_recall_and_precision",
    "tests/test_llm_ops.py::test_ann_recall_vs_brute_force",
    "tests/test_llm_ops.py::test_approx_count_distinct_tolerance",
    "tests/test_llm_ops.py::test_approx_quantile_tolerance",
    "tests/test_llm_ops.py::test_ivf_recall_vs_brute_force",
    "tests/test_llm_ops.py::test_ivf_refine_improves_or_holds_recall",
    "tests/test_llm_ops.py::test_pq_recall_vs_brute_force",
    "tests/test_llm_ops.py::test_ivfpq_recall_vs_brute_force",
    "tests/test_llm_ops.py::test_knn_graph_recall_vs_bruteforce",
    "tests/test_llm_ops.py::test_nndescent_refine_recall_monotone",
    "tests/test_llm_ops.py::test_nndescent_converge_monotone_and_terminates",
    "tests/test_relational_edges.py::test_hll_mergeable_within_tolerance",
    "tests/test_relational_edges.py::test_cms_contract_and_mergeability",
    "tests/test_relational_edges.py::test_kmv_accuracy_and_mergeability",
    "tests/test_relational_edges.py::test_kmv_set_estimates_accuracy",
    "tests/test_relational_edges.py::test_kll_rank_error_mergeability_and_exact_branch",
    "tests/test_relational_edges.py::test_join_cardinality_estimate_within_2x",
    "tests/test_multimodal.py::test_phash_dedup_catches_inplace_edits_not_reframes",
    "tests/test_llm_ops.py::test_logreg_irls_matches_numpy_reference",
]

#: Rows-only queries whose gate is exact/structural rather than a numeric
#: band — described statically so every rows-only query appears in the
#: report with its gating mechanism.
STATIC_GATES = {
    "agg_approx_topk": "exact-match on coarse domain (test_relational_edges)",
    "sample_frac": "count band + determinism-by-seed (test_relational_edges)",
    "sample_weighted": "golden byte-exact fixture (test_golden_probabilistic)",
    "sample_stratified": "golden byte-exact fixture (test_golden_probabilistic)",
    "sample_mixture_stable": "golden byte-exact + partition invariance "
    "(test_golden_probabilistic)",
    "dedup_simhash": "golden pair fixture + pigeonhole property "
    "(test_golden_dedup)",
    "dedup_fuzzy_minhash": "also: golden pair fixture (test_golden_dedup)",
    "dedup_clusters": "connected-components closed form vs networkx-free "
    "union-find reference (test_llm_ops)",
    "dedup_incremental": "incremental == full-rerun equivalence "
    "(test_llm_ops)",
    "dedup_pipeline_end_to_end": "stagewise survivor-set invariants "
    "(test_llm_ops)",
    "dedup_canonical_rank": "power-iteration vs numpy reference + "
    "hub-selection property (test_llm_ops)",
    "dedup_minhash_eval": "estimator vs exact jaccard on labeled pairs "
    "(test_llm_ops)",
    "dedup_containment_scaled": "stop-gram cap stats + equality-when-uncapped "
    "(test_llm_ops)",
    "dedup_containment_incremental": "incremental == full restricted "
    "(test_llm_ops)",
    "dedup_semantic": "planted exact oracle (dedup_semantic_planted, "
    "sql-checked) + no-near-identical-survivor property (test_llm_ops)",
    "kmeans_clusters": "assignment optimality + inertia-descent vs numpy "
    "(test_llm_ops)",
    "embed_pca": "gram-eigen vs numpy.linalg reference (test_llm_ops)",
    "sim_mmr_rerank": "greedy trace vs pure-python reference (test_llm_ops)",
    "text_excise_repeated_spans": "identity on untouched docs + python "
    "reference slice + shrinking-mass property (test_llm_ops)",
    "stream_approx_dedup": "batch-vs-stream convergence + bloom "
    "no-false-negative property (test_streaming)",
    "text_bpe_merges": "exact merge-list equality vs independent "
    "pure-python BPE + greedy-overlap unit (test_llm_ops)",
    "text_bpe_segment": "trained vocab segmentation == reference vocab, "
    "per-word concat identity (test_llm_ops)",
}

#: Rows-only op → the registered SQL-HASH-CHECKED query that drives the
#: SAME production operator path through a planted geometry where the
#: estimator/iteration is provably exact (the round-10/11 exact-
#: attestation program).  Every rows-only family except the seeded-random
#: samplers (sample_*: randomness IS the semantics; gated by golden
#: byte-exact fixtures instead) carries one.
EXACT_TWINS = {
    "agg_approx_distinct": "agg_hllpp_planted",
    "agg_approx_quantile": "agg_pctl_planted",
    "agg_approx_topk": "agg_topk_planted",
    "agg_cms_estimate": "agg_cms_planted",
    "agg_hll_mergeable": "agg_hll_planted",
    "agg_kll_quantiles": "agg_kll_planted",
    "agg_kmv_distinct": "agg_kmv_planted",
    "agg_kmv_setops": "stat_cardinality_planted",
    "dedup_canonical_rank": "dedup_canonical_planted",
    "dedup_clusters": "graph_connected_components",
    "dedup_containment_scaled": "dedup_containment_planted",
    "dedup_containment_incremental": "dedup_containment_planted",
    "dedup_fuzzy_minhash": "dedup_minhash_planted",
    "dedup_incremental": "dedup_incremental_planted",
    "dedup_minhash_eval": "dedup_eval_planted",
    "dedup_pipeline_end_to_end": "dedup_funnel_planted",
    "dedup_semantic": "dedup_semantic_planted",
    "dedup_simhash": "dedup_simhash_planted",
    "embed_pca": "embed_pca_planted",
    "kmeans_clusters": "kmeans_planted",
    "ml_logreg_irls": "ml_logreg_planted",
    "multimodal_phash_dedup": "multimodal_phash_planted",
    "sim_ann_lsh": "sim_ann_planted",
    "sim_ivf_topk": "sim_ivf_planted",
    "sim_ivfpq_topk": "sim_ivfpq_planted",
    "sim_knn_graph": "sim_knn_graph_planted",
    "sim_nndescent_refine": "sim_nndescent_planted",
    "sim_mmr_rerank": "sim_mmr_planted",
    "sim_pq_topk": "sim_ivfpq_planted (shared PQ encode/ADC core)",
    "stat_join_cardinality_est": "stat_cardinality_planted",
    "stream_approx_dedup": "stream_approx_planted",
    "text_bpe_merges": "text_bpe_planted",
    "text_bpe_segment": "text_bpe_planted",
    "text_excise_repeated_spans": "text_excise_planted",
}


def main() -> None:
    if "--check" in sys.argv:
        with open(OUT) as f:
            data = json.load(f)
        assert data["queries"], "empty report"
        print(f"OK {OUT}: {len(data['queries'])} queries")
        return

    with tempfile.NamedTemporaryFile(mode="w", suffix=".jsonl", delete=False) as tf:
        margin_path = tf.name
    env = dict(os.environ, PP_MARGIN_OUT=margin_path)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *GATE_TESTS],
        env=env,
        cwd=os.path.dirname(OUT) + "/..",
    )
    if r.returncode != 0:
        sys.exit("gate tests FAILED — fix before regenerating the report")

    measured: dict[str, list[dict]] = {}
    with open(margin_path) as f:
        for line in f:
            rec = json.loads(line)
            measured.setdefault(rec.pop("query"), []).append(rec)
    os.unlink(margin_path)

    from postpy_spark import registry

    qs, osql = registry.queries(), registry.oracle_sql()
    rows_only = sorted(n for n in qs if n not in osql)
    report = {"queries": {}}
    for name in rows_only:
        entry: dict = {}
        if name in measured:
            entry["measured_gates"] = sorted(
                measured[name], key=lambda r: r["margin"]
            )
            entry["min_margin"] = min(r["margin"] for r in measured[name])
        if name in STATIC_GATES:
            entry["structural_gate"] = STATIC_GATES[name]
        if name in EXACT_TWINS:
            entry["exact_twin"] = EXACT_TWINS[name]
        if not entry:
            entry["structural_gate"] = "MISSING — add a gate or a STATIC_GATES note"
        report["queries"][name] = entry
    # margins also recorded for a few sql-checked queries' probabilistic
    # cousins (e.g. sim_ann_lsh feeds sim_topk_filtered) — keep them
    for name, recs in measured.items():
        if name not in report["queries"]:
            report["queries"][name] = {
                "measured_gates": sorted(recs, key=lambda r: r["margin"]),
                "min_margin": min(r["margin"] for r in recs),
                "note": "not rows-only; margin recorded by a shared gate",
            }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    tight = [
        (n, e["min_margin"])
        for n, e in report["queries"].items()
        if "min_margin" in e
    ]
    tight.sort(key=lambda t: t[1])
    print(f"wrote {OUT} ({len(report['queries'])} queries)")
    for n, m in tight[:5]:
        print(f"  tightest: {n} margin={m}")


if __name__ == "__main__":
    main()
