#!/usr/bin/env python
"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side row serialization skewing the numbers). One SparkSession is
reused; the first query absorbs JVM warm-up, so a `_warmup` pass runs the
flagship once before timing.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

RUNS = 3  # timed passes per query; median/spread below derive from this

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postpy_spark import registry
from postpy_spark.session import get_spark

# Representative heavy shapes across SURVEY.md §2 groups (subset of the full
# contract: scans+agg, star join, as-of, windows, set-ops, text/vector ops).
HEADLINE = [
    "agg_groupby",
    "agg_count_distinct",
    "join_inner",
    "join_broadcast",
    "join_multiway_star",
    "join_asof",
    "join_range_interval",
    "win_running_sum",
    "topk_per_group",
    "project_expr",
    "distinct_rows",
    "pivot_wide",
    "stream_session",
    "dedup_exact",
    "dedup_fuzzy_minhash",
    "text_tfidf",
    "sim_topk_per_query",
    "udf_scalar_pandas",
    "multimodal_image_stats",
]

# Second section (r7 verdict item 5): heavy shapes added in rounds 2-7 that
# the frozen headline set never times — a perf regression in these was
# previously invisible.  The primary HEADLINE list stays untouched so
# cross-round continuity of "value"/"queries" holds; extras report under
# separate keys ("extras*") with their own pass count.
HEAVY_EXTRAS = [
    "dedup_containment_scaled",
    "dedup_repeated_spans",
    "dedup_semantic",
    "dedup_simhash",
    "join_interval_overlap",
    "events_dau_wau",
    "events_top_paths",
    "events_window_funnel",
    "events_interval_union",
    "sim_pq_topk",
    "sim_ivf_topk",
    "sim_knn_graph",
    "sim_ivfpq_topk",
    "graph_label_propagation",
    "graph_connected_components",
    "graph_pagerank",
    "kmeans_planted",
    "ts_interpolate_linear",
    "text_bm25_topk",
    "text_bpe_merges",
    "tpch_q9_shape",
    # r11 additions: both registered hot-key range-join shapes stay timed
    # (salted for the moderate-skew case, bucketed as the scale path)
    "join_range_salted",
    "join_range_bucketed",
    # r12 additions: cross-document shared-passage extraction and the
    # NN-descent refinement round (seed kNN graph + one friends-of-
    # friends rescore — inherently ~2x sim_knn_graph's cost by design)
    "dedup_crossdoc_spans",
    "sim_nndescent_refine",
    # r12: fuzzy entity resolution — blocked edit-distance join (light)
    # and its end-to-end composition with iterative connected components
    "dedup_editdist_blocked",
    "er_canonical_entities",
    # r14 additions: the char tier of exact-substring dedup (per-doc and
    # pairwise), incremental ER (batch probe + contracted merge), and
    # unigram-LM tokenizer training (3 EM rounds over the vocab)
    "dedup_char_spans",
    "dedup_char_crossdoc",
    "er_incremental",
    "text_unigram_train",
]
EXTRAS_RUNS = 2


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def load_context() -> dict:
    """Machine-load snapshot embedded in the bench JSON (r13 verdict item 6).

    Wall-clock here swings ±25% with concurrent machine load (CLAUDE.md /
    docs/BENCH_NOTES.md), so each BENCH_r{N}.json carries its own
    interpretation context: 1-minute loadavg and the number of currently
    RUNNING (state R) processes other than this one.  A loadavg well above
    the core count, or running procs > ~2, means the totals are inflated
    and must not be compared across rounds without an interleaved A/B.
    """
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = -1.0
    running = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    if fh.read().rsplit(")", 1)[1].split()[0] == "R":
                        running += 1
            except OSError:
                continue
    except OSError:
        running = -1
    return {"loadavg_1m": round(la1, 2), "loadavg_5m": round(la5, 2), "running_procs": running}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    # Size shuffle partitions to the input (BASELINE.md): at sf≤0.1 the data
    # is a few hundred MB — 8 reducers beat 32 by ~12% (scheduling floor);
    # at larger scale the core-count default + AQE coalescing applies.
    parts = 8 if 0 < sf <= 0.1 else None
    load_start = load_context()
    spark = get_spark("postpy-bench", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry.load_all()
    names = [n for n in HEADLINE if n in reg]

    # r14 methodology fix (OPTIMIZATION_r14.md): base tables are NO LONGER
    # .cache()d before the timed region.  The r1–r13 pre-cache timed every
    # query against InMemoryRelations instead of the parquet inputs, hiding
    # scan/pushdown cost; every timed pass now computes from parquet.
    # Old-methodology numbers are preserved in docs/bench_r14_precache.json.

    # Untimed warm-up pass: JVM startup, whole-stage-codegen compilation and
    # Python worker pool spin-up are one-time costs a long-lived cluster
    # amortizes; the timed pass below reports steady-state throughput.
    for name in names:
        force(reg[name].fn(spark, sf_dir))

    # Three timed passes; report per-query MIN (the reproducible steady
    # state — Python-worker scheduling adds ±0.5s noise on single shots,
    # "value"/"queries" stay comparable with earlier rounds) plus MEDIAN and
    # the max-min SPREAD so a reader can tell real regressions from machine
    # noise without re-running (the ±25% wall-clock swings documented in
    # CLAUDE.md made single-number rounds unadjudicable).
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(RUNS):
        for name in names:
            t0 = time.perf_counter()
            force(reg[name].fn(spark, sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 3))

    timings = {name: min(s) for name, s in samples.items()}
    medians = {name: round(statistics.median(s), 3) for name, s in samples.items()}
    spreads = {name: round(max(s) - min(s), 3) for name, s in samples.items()}
    total = round(sum(timings.values()), 3)

    # heavy_extras: warm-up once, then EXTRAS_RUNS timed passes, report min.
    extra_names = [n for n in HEAVY_EXTRAS if n in reg]
    for name in extra_names:
        force(reg[name].fn(spark, sf_dir))
    extra_samples: dict[str, list[float]] = {name: [] for name in extra_names}
    for _ in range(EXTRAS_RUNS):
        for name in extra_names:
            t0 = time.perf_counter()
            force(reg[name].fn(spark, sf_dir))
            extra_samples[name].append(round(time.perf_counter() - t0, 3))
    extras = {name: min(s) for name, s in extra_samples.items()}

    # The driver retains only the LAST 2000 chars of stdout and parses the
    # final JSON line.  The r8 single-line dump (medians + spreads + extras)
    # outgrew that tail, so BENCH_r08/r09 recorded "parsed: null".  Emit the
    # full detail dict on an EARLIER line (for humans / BENCH_NOTES), then
    # end stdout with a compact final line that is well under 2000 chars.
    print(
        "DETAIL "
        + json.dumps(
            {
                "queries_median": medians,
                "queries_spread": spreads,
                "extras": extras,
                "extras_runs": EXTRAS_RUNS,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "value_median": round(sum(medians.values()), 3),
                "extras_value": round(sum(extras.values()), 3),
                "runs": RUNS,
                "sf": sf,
                "load_start": load_start,
                "load_end": load_context(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
