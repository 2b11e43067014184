#!/usr/bin/env python
"""Empirical scale-and-skew soak (r7 verdict item 2).

Every 100 TB claim in this repo is plan-argued and plan-pinned, but until
this tool nothing had executed above sf0.1.  The soak synthesizes a
``--mult``× tier of the scale-sensitive tables in /tmp **with planted
pathologies** — the failure shapes the caps exist for:

- **hot user**: ~20% of all events reassigned to user_id 1 (which exists
  in ``customer``, so it is simultaneously a hot GROUP key and a hot
  JOIN key);
- **boilerplate shingle**: a fixed ~14-token footer appended to ~30% of
  documents (hot grams → the containment stop-gram cap must engage);
- **near-identical template docs**: ~2% of documents collapsed onto one
  template (hot MinHash band buckets → the LSH salt-split must engage);
- **dense embedding cluster**: ~14% of vectors replaced by one base
  vector + per-id jitter of ~1e-4 (one dense k-means cell → the
  SemDeDup ``max_cell`` salt-split must engage; one dense LSH bucket for
  the kNN graph).

Synthesis preserves DENSITY, because that is what real growth does:
event replicas extend the time range (more history, same events/hour),
document replicas are near-duplicates (a repost cluster), embedding
replicas are fresh pseudo-random vectors.  Naive in-place replication
makes density-dependent OUTPUTS (interval-overlap pairs, dup pairs)
quadratic by construction and flags healthy operators — the first draft
of this tool did exactly that, and the one finding that survived the
synthesis fix was real: SemDeDup's fixed cell count made within-cell
pair work n²/n_cells (50× wall-time at 16×), now adaptive
(operators/similarity.py::semantic_dedup).

It then asserts three things:

(a) **caps engage**: ``stats["hot_buckets"] > 0`` for the MinHash and
    SemDeDup paths, ``stats["stop_grams"] > 0`` for containment;
(b) **~linear growth**: wall-time(soak) / wall-time(base) ≤ mult ×
    SLACK for each scale-sensitive op (a quadratic blowup would show
    mult² = hundreds);
(c) **no task failures/retries**: per-op job groups, summed
    numFailedTasks across all stages == 0.

Usage:
    python tools/scale_soak.py                       # mult=16 on sf0.1
    python tools/scale_soak.py --mult 4 --base /root/testdata/sf0.01
    python tools/scale_soak.py --write-doc           # also refresh docs/SCALE_SOAK.md

The small configuration (mult=3 on sf0.01) runs in pytest as
tests/test_scale_soak.py so the engagement asserts stay green per-round.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: ops whose plans carry explicit scale arguments (caps, routing, binning),
#: plus the two r8 additions with distinctive scale claims: sim_pq_topk
#: (corpus-sized ADC scan + shortlist window must stay linear under the
#: dense-cluster plant) and text_bpe_merges (merge rounds run on the
#: vocabulary, which Heaps' law keeps near-constant while the corpus
#: multiplies — its ratio should sit far BELOW mult, the empirical proof
#: of the sublinearity argument).
SOAK_OPS = [
    "dedup_fuzzy_minhash",
    "dedup_semantic",
    "dedup_containment_scaled",
    "sim_knn_graph",
    "sim_pq_topk",
    "text_bpe_merges",
    "join_null_skew_routed",
    "join_interval_overlap",
    "events_dau_wau",
    # r10: the iterative connected-components loop at scale — runs on the
    # SCALED documents corpus (LSH candidate pairs → min-label +
    # pointer-doubling CC), where the planted template cluster produces
    # one giant near-dup component; rounds grow O(log diameter), so the
    # ratio must stay ~linear in mult.
    "dedup_clusters",
    # r10: the IVF-PQ composition under the dense-cluster plant — one
    # crowded coarse cell is exactly the pathology that makes a fixed
    # n_probe routing degrade gracefully (more candidates in the probed
    # cell) instead of quadratically (the ADC scan is linear in the
    # shortlist, rerank bounded by it).
    "sim_ivfpq_topk",
    # r11: the registered hot-key range join.  The first r11 soak ran the
    # SALTED form here and it measurably failed (warm pass >15 min vs a
    # 0.7 s base, aborted): salting scatters the probe side but every
    # salt replica still carries ALL of the hot user's intervals, so
    # within-key work stays |events_u|/n_salts x |intervals_u|.  The
    # time-grid form bounds per-task work by per-hour DENSITY — the
    # quantity this synthesis holds constant — and measured 2.5x at 16x.
    # join_range_interval (naive) and join_range_salted both stay out of
    # the op list for the same measured reason.
    "join_range_bucketed",
    # r12: the NN-descent refinement under the dense-cluster plant — hub
    # vectors (one vector in hundreds of top-k lists) are exactly the
    # pathology the reverse-neighbor cap exists for; without it the
    # friends-of-friends join is quadratic in degree.
    "sim_nndescent_refine",
    # r13: the fuzzy-ER family under the part-name plant (each replica's
    # name d≤2 from its base, pair mass linear in mult) — PassJoin's
    # bounded probe fan-out is what must keep the candidate set
    # data-bounded as the name vocabulary multiplies; the CC consumer
    # rides the same pairs with O(log diameter) rounds.
    "dedup_editdist_blocked",
    "er_canonical_entities",
    # r14: char-level repeated spans on the scaled documents corpus — the
    # boilerplate footer and template plants are hot CHAR grams too
    # (every 20-char window of the footer recurs across ~30% of docs);
    # the op must stay one gram-count shuffle + per-doc windows, with
    # dup-position volume linear in the replica count.
    "dedup_char_spans",
    # r14: incremental ER under the part-name plant — the batch probes
    # the planted vocabulary without old×old candidates and the merge
    # runs on the contracted graph, so growth must track the vocabulary,
    # not history × batch.
    "er_incremental",
]

#: Exact-parity sweep at the soak tier (r10 verdict item 6): sql-checked
#: queries whose oracles the DuckDB gate re-runs against the PLANTED 16×
#: tier — `python tools/check.py --sf /tmp/pp_soak_m16_sf0.1 $(python -c
#: "from tools.scale_soak import SOAK_SWEEP; print(' '.join(SOAK_SWEEP))")`.
#: Biased toward the SCALED tables (events/documents/embeddings, where the
#: plants live); the planted ANN/dedup twins ride along because their
#: closed-form proofs must hold at any tier.  join_range_interval and join_range_salted stay
#: excluded (measured hot-key pathologies — join_range_bucketed is the
#: registered survivor; see SOAK_OPS note).
SOAK_SWEEP = [
    # events (10M rows, hot-user plant)
    "events_dau_wau", "events_top_paths", "events_window_funnel",
    "events_interval_union", "events_attribution", "events_attribution_linear",
    "events_transitions", "events_funnel", "events_activity_streaks",
    "events_anomaly_zscore", "events_rfm_segments", "events_pareto_gini",
    "cohort_retention", "join_range_bucketed", "join_interval_overlap",
    "join_null_skew_routed", "join_asof",
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "ts_ewma", "ts_gapfill", "ts_interpolate_linear", "ts_resample_ohlc",
    "ts_seasonal_profile", "ts_autocorr", "rollup_time_multires",
    # documents (1M docs, template + boilerplate plants)
    "text_stats", "text_tfidf", "text_tokenize_tf", "text_token_count",
    "text_langid", "text_quality", "text_ngram_dup_ratio", "text_repetition",
    "text_zipf_slope", "text_bpe_pair_counts", "text_heavy_hitters",
    "dedup_exact", "dedup_repeated_spans", "dedup_crossdoc_spans",
    "doc_fingerprint",
    "docs_quality_filter_chain", "docs_split_assign", "shard_by_token_budget",
    "dedup_url_canonical", "dedup_doc_prefix",
    # r13 additions (documents-scaled: packing manifest + mixture sampling)
    "pack_sequences", "mixture_resample",
    # r14 additions: char-tier exact-substring dedup on the scaled corpus
    # (its direct oracle re-runs at the tier) + the closed-form twins of
    # the r14 operators (orders-based, tier-invariant by construction)
    "dedup_char_spans", "dedup_char_spans_planted", "dedup_char_crossdoc",
    "text_unigram_planted", "er_incremental_planted",
    "er_golden_incremental_planted",
    # embeddings (1M vectors, dense-cluster plant)
    "dedup_embedding_cosine", "embed_norm_quant", "embed_matryoshka",
    "embed_centroid_drift", "sim_cosine_pairs", "sim_topk_per_query",
    "sim_range_search", "sim_topk_filtered",
    # planted exact twins (orders-based; closed forms must be tier-invariant)
    "sim_ann_planted", "sim_ivfpq_planted", "sim_knn_graph_planted",
    "sim_nndescent_planted", "sim_mmr_planted", "text_bpe_planted", "dedup_minhash_planted",
    "dedup_simhash_planted", "dedup_semantic_planted", "kmeans_planted",
    "embed_pca_planted", "ml_logreg_planted", "stat_ks_test", "stat_psi_drift",
    # sketch/stream exact twins (fixed key ranges — tier-invariant by
    # construction; stream_approx_planted additionally pins its key
    # POPULATION with user_id <= 1499 so the bloom stays in the zero-FP
    # regime at any tier)
    "agg_topk_planted", "agg_cms_planted", "agg_hll_planted",
    "agg_hllpp_planted", "agg_pctl_planted", "dedup_eval_planted",
    "multimodal_phash_planted",
    "stat_cardinality_planted", "stream_approx_planted",
    # r12 widening (verdict item 6): the long-tail query families the
    # sweep had not touched — TPC-H shapes incl. the r1-vintage extras,
    # the iterative/lateral/frame extras, and all nine B6 scalar-function
    # families plus their extras.  These run on the COPIED (unscaled)
    # relational tables of the soak dir, so the check is oracle parity in
    # the soak ENVIRONMENT (same session, same tier directory) rather
    # than scaled-input parity — what it buys is that no query family is
    # absent from the per-tier exact-value record.
    "tpch_q10_shape", "tpch_q18_shape", "recursive_cte", "join_lateral",
    "win_range_frame", "scalar_subquery",
    "fn_string", "fn_regex", "fn_date", "fn_math", "fn_conditional",
    "fn_cast", "fn_array", "fn_map", "fn_json",
    "fn_bitwise", "fn_hash", "fn_variant", "fn_string_extra",
    "agg_bool", "agg_median_mode", "agg_regr",
    "fn_array_hof", "join_anti_not_in", "join_range_autowidth",
    "stat_auc_roc", "dedup_editdist_scaled",
    # The part-reading ER queries stay sweepable even though part is now
    # SYNTHESIZED with the ER plant: testdata's part carries only 64
    # distinct names, so the planted vocabulary is ~64×(positions+1) ≈
    # 300 names and the quadratic levenshtein oracles remain feasible.
    # True vocabulary-scaling evidence comes from er_probe (below), not
    # from these — the registered queries' work is bounded by the
    # vocabulary, not the row count (their SOAK_OPS ratios ≈ 1 SHOW
    # that: 16× more part rows, same distinct-name work).
    "dedup_editdist_blocked", "er_canonical_entities", "er_golden_record",
]

HOT_USER = 1          # exists in customer → hot group AND join key
SLACK = 2.0           # linearity head-room (scheduling floors, salt passes)

#: part replicas get a new partkey = base + rep * ER_KEY_STRIDE, so a
#: replica's base row is recoverable as pmod(p_partkey, ER_KEY_STRIDE)
ER_KEY_STRIDE = 10**7

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "orders", "lineitem",
]

BOILER = (
    " standard compliance footer all rights reserved unsubscribe at any time"
    " terms apply see website for details"
)
TEMPLATE = (
    "breaking news update markets rallied today as investors cheered the"
    " latest earnings reports from major technology companies and analysts"
    " raised their price targets across the sector while bond yields"
)


def synthesize(spark: SparkSession, base: str, out: str, mult: int) -> None:
    """Write the planted ×mult tier (idempotent via a marker file)."""
    marker = os.path.join(out, "_SOAK_OK")
    # v2: part is synthesized (ER plant) rather than copied — stale tiers
    # from earlier rounds must re-synthesize
    want = f"{base}|{mult}|v2"
    if os.path.exists(marker) and open(marker).read().strip() == want:
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")

    e = spark.read.parquet(f"{base}/events.parquet")
    # Replicas EXTEND the time range instead of densifying it: real growth
    # is more days of history, not 16 copies of the same hour.  In-place
    # replication makes every density-dependent output (interval-overlap
    # pairs, sessions) quadratic BY CONSTRUCTION and the soak would flag
    # healthy operators (the r8 first-draft mistake).
    # shift ts by rep*span with EXACT integer arithmetic in the column's
    # native unit: bigint nanos if the tier stores TIMESTAMP(NANOS) read
    # via nanosAsLong, else µs via unix_micros round-trip (UTC session).
    ts_type = dict(e.dtypes)["ts"]
    span = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    if ts_type == "bigint":
        span_ns = int(span.hi - span.lo) + 3_600_000_000_000  # +1h gap
        shifted = F.col("ts") + F.col("rep").cast("bigint") * F.lit(span_ns)
    else:
        span_us = (
            int((span.hi - span.lo).total_seconds()) * 1_000_000
            + (span.hi - span.lo).microseconds
            + 3_600_000_000
        )
        shifted = F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("rep").cast("bigint") * F.lit(span_us)
        ).cast(ts_type)
    ev = (
        e.select("*", rep)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(10**9))
        .withColumn("ts", shifted)
        # hot-user plant: ~20% of ALL rows land on one user
        .withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0, F.lit(HOT_USER)
            ).otherwise(F.col("user_id")),
        )
        .drop("rep")
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    d = spark.read.parquet(f"{base}/documents.parquet")
    docs = (
        d.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10**7))
        # replicas carry a per-rep marker token: NEAR-duplicates (a real
        # template/repost cluster, linear pair mass) instead of exact
        # copies of the whole corpus (quadratic pair mass by construction)
        .withColumn(
            "text",
            F.when(
                F.col("rep") > 0,
                F.concat(
                    F.col("text"), F.lit(" repost "), F.col("rep").cast("string")
                ),
            ).otherwise(F.col("text")),
        )
        .drop("rep")
        # template plant FIRST (~2%: near-identical docs → hot LSH bucket)
        .withColumn(
            "text",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0,
                F.concat(
                    F.lit(TEMPLATE),
                    F.lit(" edition "),
                    F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
                ),
            ).otherwise(F.col("text")),
        )
        # boilerplate plant (~30%: shared footer → hot grams / stop-grams)
        .withColumn(
            "text",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3,
                F.concat(F.col("text"), F.lit(BOILER)),
            ).otherwise(F.col("text")),
        )
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    dense = F.expr(
        "transform(sequence(0, 63), j -> CAST(1.0 + 0.0001 * "
        "pmod(vec_id * 31 + j, 101) AS FLOAT))"
    )
    # replicas are FRESH pseudo-random vectors (hash-uniform in [-1, 1]),
    # not copies: copying makes every vector a 0.95-cosine duplicate of its
    # 15 clones and the dup-pair output quadratic by construction
    fresh = F.expr(
        "transform(sequence(0, 63), j -> CAST("
        "pmod(xxhash64(vec_id, j), 2001) / 1000.0 - 1.0 AS FLOAT))"
    )
    embs = (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10**7))
        .withColumn(
            "embedding", F.when(F.col("rep") > 0, fresh).otherwise(F.col("embedding"))
        )
        .drop("rep")
        # dense-cluster plant (~14%: one crowded k-means cell / LSH bucket)
        .withColumn(
            "embedding",
            F.when(F.pmod(F.xxhash64("vec_id"), F.lit(7)) == 0, dense).otherwise(
                F.col("embedding")
            ),
        )
    )
    embs.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # part: the fuzzy-ER plant (r12 verdict item 3).  Each replica's
    # p_name is the base row's name with a 2-char 'zq' overlay at a
    # rep-dependent position — edit distance ≤ 2 from its base, while two
    # replicas of the same base differ at FOUR positions (d=4 > 2) unless
    # the position wheel wraps, so the d≤2 pair mass grows ~LINEARLY in
    # mult (base↔replica pairs), the same density rule as the other
    # tables.  This is the fixed-name-shape regime the PassJoin blocking
    # exists for: at 16× the ~320k-name vocabulary is where the q-gram
    # signature space saturated (operators/editdist.py module docstring).
    p = spark.read.parquet(f"{base}/part.parquet")
    pos = (
        F.lit(1)
        + F.lit(2)
        * F.pmod(
            F.col("rep") - 1,
            F.greatest(
                F.floor((F.length("p_name") - F.lit(1)) / 2), F.lit(1)
            ),
        )
    ).cast("int")
    parts = (
        p.select("*", rep)
        .withColumn(
            "p_partkey", F.col("p_partkey") + F.col("rep") * F.lit(ER_KEY_STRIDE)
        )
        .withColumn(
            "p_name",
            F.when(
                F.col("rep") > 0, F.overlay(F.col("p_name"), F.lit("zq"), pos)
            ).otherwise(F.col("p_name")),
        )
        .drop("rep")
    )
    parts.write.mode("overwrite").parquet(f"{out}/part.parquet")

    for t in COPY_TABLES:
        src = f"{base}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(want)


def _failed_tasks(sc, group: str) -> int:
    tracker = sc.statusTracker()
    failed = 0
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                failed += si.numFailedTasks
    return failed


def _timed(spark: SparkSession, fn, sf_dir: str, group: str) -> tuple[float, int]:
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
    finally:
        sc.setJobGroup("", "")
    return round(dt, 2), _failed_tasks(sc, group)


def engagement_stats(spark: SparkSession, soak: str) -> dict:
    """Run the capped operators DIRECTLY with stats dicts and verify the
    planted pathologies actually trip each cap."""
    from postpy_spark.io import load_table
    from postpy_spark.operators import dedup as D
    from postpy_spark.operators import similarity as S

    # Caps scale with the corpus (the production posture: a cap is a
    # fraction of the tier, not an absolute): the planted hot structures
    # are percentage-sized, so percentage caps must trip at EVERY tier —
    # template bucket ~2% vs bucket cap 1%, boilerplate grams ~30% vs
    # posting cap 10%/4096, dense cell ~14% vs cell cap 10%.
    out: dict = {}
    docs = load_table(spark, soak, "documents")
    n_docs = docs.count()
    st: dict = {}
    D.minhash_dedup_pairs(
        docs, threshold=0.6, max_bucket=min(1024, max(8, n_docs // 100)), stats=st
    ).write.format("noop").mode("overwrite").save()
    out["minhash"] = dict(st)
    assert st.get("hot_buckets", 0) > 0, f"LSH salt-split never engaged: {st}"

    st = {}
    cand = D.containment_candidates(
        docs, threshold=0.8, max_posting=min(4096, max(64, n_docs // 10)), stats=st
    )
    cand.write.format("noop").mode("overwrite").save()
    out["containment"] = dict(st)
    assert st.get("stop_grams", 0) > 0, f"stop-gram cap never engaged: {st}"

    emb = load_table(spark, soak, "embeddings")
    n_emb = emb.count()
    st = {}
    # n_cells pinned COARSE (16): with the r8 adaptive quantizer, k-means
    # seeds enough centroids inside the planted dense cluster to dissolve
    # it — correct behavior, but then the cap has nothing to do.  The cap
    # is the BACKSTOP for when quantization under-splits (few cells, or a
    # cluster denser than the centroid budget), so that is the shape this
    # probe pins.
    S.semantic_dedup(
        emb,
        threshold=0.95,
        n_cells=16,
        max_cell=min(4096, max(32, n_emb // 10)),
        stats=st,
    ).write.format("noop").mode("overwrite").save()
    out["semantic"] = dict(st)
    assert st.get("hot_buckets", 0) > 0, f"SemDeDup cell cap never engaged: {st}"

    # hot-user plant sanity: the skew the routed join / dau_wau face
    e = load_table(spark, soak, "events")
    total = e.count()
    hot = e.filter(F.col("user_id") == HOT_USER).count()
    out["hot_user_share"] = round(hot / total, 4)
    assert 0.15 <= hot / total <= 0.3, out["hot_user_share"]

    # ER plant: the PassJoin blocking must recover EVERY planted
    # base↔replica name pair (losslessness at the tier where the oracle
    # sweep's quadratic levenshtein join is infeasible), and the candidate
    # fan-out must stay near the true pair mass (the bound grams lacked).
    from postpy_spark.operators import editdist as ED

    p = load_table(spark, soak, "part")
    vals = p.select(F.col("p_name").alias("val")).distinct()
    n_names = vals.count()
    cand = ED.passjoin_candidates(vals, "val", 2).count()
    pairs = ED.editdist_pairs(vals, max_dist=2).localCheckpoint()
    true_pairs = pairs.count()
    base_names = p.filter(F.col("p_partkey") < ER_KEY_STRIDE).select(
        F.col("p_partkey").alias("_bk"), F.col("p_name").alias("_bn")
    )
    planted = (
        p.filter(F.col("p_partkey") >= ER_KEY_STRIDE)
        .select(
            F.pmod(F.col("p_partkey"), F.lit(ER_KEY_STRIDE)).alias("_bk"),
            F.col("p_name").alias("_rn"),
        )
        .join(base_names, "_bk")
        .filter(F.col("_rn") != F.col("_bn"))
        .select(
            F.least("_rn", "_bn").alias("val_a"),
            F.greatest("_rn", "_bn").alias("val_b"),
        )
        .distinct()
    )
    n_planted = planted.count()
    missing = planted.join(pairs, ["val_a", "val_b"], "left_anti").count()
    out["er"] = {
        "n_names": n_names,
        "candidates": cand,
        "true_pairs": true_pairs,
        "cand_per_true": round(cand / max(true_pairs, 1), 2),
        "planted_pairs": n_planted,
        "planted_missing": missing,
    }
    assert n_planted > 0, "ER plant produced no planted pairs"
    assert missing == 0, f"ER blocking missed {missing} planted pairs"
    return out


def _er_vocab(spark: SparkSession, n: int):
    """Planted fixed-shape vocabulary of n strings over alphabet {a,b,c}
    (degenerate — the regime where q-gram signatures saturate and the
    original blocking died, operators/editdist.py module docstring):
    clusters of 4 (1 base + 3 variants, each variant = 2 forced-differing
    substitutions at disjoint positions), so true d≤2 pair mass is
    EXACTLY 3 per cluster — linear in n, the same density rule as the
    table synthesis.  Lengths 24-32 keep cross-cluster d≤2 collisions
    vanishing (3^24 ≈ 3e11 space), so super-linear growth in the probe
    is an OPERATOR defect, never an output artifact."""
    ids = spark.range(n)
    gid = F.expr("id div 4")
    v = F.pmod(F.col("id"), F.lit(4))
    length = F.lit(24) + F.pmod(F.xxhash64(gid), F.lit(9))
    abc = F.array(F.lit("a"), F.lit("b"), F.lit("c"))

    def ch(j):
        base_idx = F.pmod(F.xxhash64(gid, j), F.lit(3))
        is_sub = (v > 0) & ((j == (v - 1) * 2) | (j == (v - 1) * 2 + 1))
        idx = F.when(is_sub, F.pmod(base_idx + 1, F.lit(3))).otherwise(base_idx)
        return F.element_at(abc, (idx + 1).cast("int"))

    val = F.array_join(
        F.transform(F.sequence(F.lit(0), (length - 1).cast("int")), ch), ""
    )
    return ids.select(gid.alias("gid"), val.alias("val"))


def er_probe(spark: SparkSession, mult: int, n0: int = 6000) -> dict:
    """Vocabulary-scaling ER probe (r12 verdict item 3).  The SOAK_OPS
    rows for the ER family are VOCABULARY-bounded (testdata part has 64
    distinct names → ratio ≈ 1 at any row mult), so the scaling variable
    that actually stresses PassJoin — distinct-string count — must be
    synthesized directly: n0 strings (base) vs n0×mult (soak), planted
    clusters, editdist_pairs + connected_components timed on each.
    Asserts blocking completeness (every planted in-cluster pair
    recovered) and the linearity gate, and records candidate fan-out."""
    from postpy_spark.operators import dedup as D
    from postpy_spark.operators import editdist as ED

    sc = spark.sparkContext
    out: dict = {"n_base": n0, "n_soak": n0 * mult}
    # warm the session untimed (codegen/broadcast machinery) so the base
    # measurement is not first-query-cold, which would inflate the
    # denominator and understate the ratio
    warm = _er_vocab(spark, 200).select("val")
    ED.editdist_pairs(warm, max_dist=2).write.format("noop").mode(
        "overwrite"
    ).save()
    for tag, n in (("base", n0), ("soak", n0 * mult)):
        vocab = _er_vocab(spark, n).localCheckpoint()
        vals = vocab.select("val")
        sc.setJobGroup(f"er_probe_{tag}", f"er_probe_{tag}")
        try:
            t0 = time.perf_counter()
            pairs = ED.editdist_pairs(vals, max_dist=2).localCheckpoint()
            comps = D.connected_components(pairs, "val_a", "val_b")
            n_comp = comps.select("component").distinct().count()
            dt = time.perf_counter() - t0
        finally:
            sc.setJobGroup("", "")
        true_pairs = pairs.count()
        cand = ED.passjoin_candidates(vals, "val", 2).count()
        # completeness: every planted in-cluster pair must be present
        planted = (
            vocab.alias("a")
            .join(vocab.alias("b"), "gid")
            .filter(F.col("a.val") < F.col("b.val"))
            .filter(F.levenshtein(F.col("a.val"), F.col("b.val")) <= 2)
            .select(
                F.col("a.val").alias("val_a"), F.col("b.val").alias("val_b")
            )
            .distinct()
        )
        n_planted = planted.count()
        missing = planted.join(pairs, ["val_a", "val_b"], "left_anti").count()
        assert missing == 0, f"er_probe {tag}: {missing} planted pairs missed"
        out[tag] = {
            "wall_s": round(dt, 2),
            "true_pairs": true_pairs,
            "candidates": cand,
            "cand_per_true": round(cand / max(true_pairs, 1), 2),
            "planted_pairs": n_planted,
            "components": n_comp,
            "failed_tasks": _failed_tasks(sc, f"er_probe_{tag}"),
        }
    out["ratio"] = round(out["soak"]["wall_s"] / max(out["base"]["wall_s"], 1e-3), 1)
    return out


def nndescent_convergence(
    spark: SparkSession, soak: str, k: int = 5, max_rounds: int = 4
) -> dict:
    """Full NN-descent loop on the soak tier's embeddings (dense-cluster
    plant): records rounds-to-convergence and per-round new-edge
    fractions (r12 verdict item 5).  The loop's own per-round counts ARE
    the actions, so the returned stats reflect real executed rounds."""
    from postpy_spark.io import load_table
    from postpy_spark.operators.similarity import knn_graph, nndescent

    em = load_table(spark, soak, "embeddings")
    st: dict = {}
    t0 = time.perf_counter()
    seed = knn_graph(em, k=k).localCheckpoint()
    st["seed_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    nndescent(seed, em, k=k, max_rounds=max_rounds, min_new_frac=0.01, stats=st)
    st["loop_s"] = round(time.perf_counter() - t0, 1)
    return st


def run_soak(
    spark: SparkSession, base: str, soak: str, mult: int,
    ops: list[str] | None = None,
    soak_only: bool = False,
) -> tuple[dict, list[str]]:
    """Timed base-vs-soak pass over ``ops`` (default SOAK_OPS).

    ``soak_only=True`` runs each op ONCE, on the soaked tier only — the
    mode the per-round pytest gate uses (tests/test_scale_soak.py): its
    asserts are failed_tasks == 0 and cap engagement, never the wall-time
    ratio (load-dependent, docs/BENCH_NOTES.md), so the base timing and
    the warm pass it paid for were pure suite wall-clock (~4 executions
    per op; the r14 driver's pytest run outgrew its time budget).  The
    full ratio-gated protocol stays the manual tool's default."""
    from postpy_spark.registry import load_all

    reg = load_all()
    rows: dict = {"mult": mult, "base": base, "ops": {}}
    problems: list[str] = []
    for name in ops or SOAK_OPS:
        fn = reg[name].fn
        if soak_only:
            sc = spark.sparkContext
            group = f"soak_{name}"
            sc.setJobGroup(group, group)
            try:
                t0 = time.perf_counter()
                fn(spark, soak).write.format("noop").mode("overwrite").save()
                t_soak = round(time.perf_counter() - t0, 2)
            finally:
                sc.setJobGroup("", "")
            f_all = _failed_tasks(sc, group)
            rows["ops"][name] = {"soak_s": t_soak, "failed_tasks": f_all}
            if f_all:
                problems.append(f"{name}: {f_all} failed tasks")
            continue
        t_base, f_base = _timed(spark, fn, base, f"soak_base_{name}")
        t_soak, f_soak = _timed(spark, fn, soak, f"soak_{name}")
        ratio = round(t_soak / max(t_base, 1e-3), 1)
        rows["ops"][name] = {
            "base_s": t_base,
            "soak_s": t_soak,
            "ratio": ratio,
            "failed_tasks": f_base + f_soak,
        }
        if f_base + f_soak:
            problems.append(f"{name}: {f_base + f_soak} failed tasks")
        if ratio > mult * SLACK:
            problems.append(
                f"{name}: super-linear growth {ratio}x at mult={mult}"
            )
    return rows, problems


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--write-doc", action="store_true")
    ap.add_argument(
        "--ops", nargs="*", default=None,
        help="subset of SOAK_OPS to time (e.g. --ops dedup_semantic for a "
        "single-op probe at a higher mult); cap-engagement still runs",
    )
    ap.add_argument(
        "--nndescent", action="store_true",
        help="also run the full NN-descent convergence loop on the soak "
        "tier (rounds-to-convergence + per-round new-edge fractions; "
        "~5-8 min at mult=16)",
    )
    ap.add_argument(
        "--er-probe", action="store_true",
        help="also run the vocabulary-scaling ER probe (6000 vs "
        "6000×mult planted strings through editdist_pairs + CC)",
    )
    args = ap.parse_args()
    out = args.out or f"/tmp/pp_soak_m{args.mult}_{os.path.basename(args.base)}"

    from postpy_spark.session import get_spark

    spark = get_spark("postpy-soak")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"synthesizing {args.mult}x tier at {out} ...", flush=True)
    synthesize(spark, args.base, out, args.mult)

    print("cap engagement ...", flush=True)
    eng = engagement_stats(spark, out)
    print(json.dumps(eng), flush=True)

    print("timed soak ...", flush=True)
    rows, problems = run_soak(spark, args.base, out, args.mult, ops=args.ops)
    rows["engagement"] = eng
    if args.nndescent:
        print("nndescent convergence ...", flush=True)
        nd = nndescent_convergence(spark, out)
        rows["nndescent"] = nd
        print(json.dumps(nd), flush=True)
        if not nd["converged"]:
            problems.append(
                f"nndescent did not converge within {nd['rounds']} rounds"
            )
    if args.er_probe:
        print("er vocabulary probe ...", flush=True)
        er = er_probe(spark, args.mult)
        rows["er_probe"] = er
        print(json.dumps(er), flush=True)
        if er["ratio"] > args.mult * SLACK:
            problems.append(
                f"er_probe: super-linear growth {er['ratio']}x at "
                f"mult={args.mult}"
            )
        ft = er["base"]["failed_tasks"] + er["soak"]["failed_tasks"]
        if ft:
            problems.append(f"er_probe: {ft} failed tasks")
    print(json.dumps(rows), flush=True)

    if args.write_doc:
        _write_doc(rows)
    spark.stop()
    if problems:
        sys.exit("SOAK PROBLEMS:\n  " + "\n  ".join(problems))
    print("soak PASS")


def _write_doc(rows: dict) -> None:
    doc = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "SCALE_SOAK.md",
    )
    lines = [
        "# SCALE — empirical scale-and-skew soak",
        "",
        "Generated by `tools/scale_soak.py` (see its module docstring for the",
        "planted pathologies).  `ratio` is wall-time(soak) / wall-time(base);",
        f"linear scaling at mult={rows['mult']} predicts ratio ≈ {rows['mult']}"
        " on CPU-bound ops (well under it when the base run is floor-bound by",
        "scheduling), quadratic blowup would show "
        f"~{rows['mult'] ** 2}.  Gate: ratio ≤ mult × {SLACK} and zero failed",
        "tasks.  The cap-engagement stats prove the planted pathologies",
        "actually tripped each salt-split / stop-gram path.",
        "",
        f"Base tier: `{rows['base']}`, multiplier: **{rows['mult']}×**",
        "",
        "| op | base (s) | soak (s) | ratio | failed tasks |",
        "| --- | --- | --- | --- | --- |",
    ]
    for name, r in rows["ops"].items():
        lines.append(
            f"| {name} | {r['base_s']} | {r['soak_s']} | {r['ratio']}× "
            f"| {r['failed_tasks']} |"
        )
    eng = rows["engagement"]
    lines += [
        "",
        "## Cap engagement on the planted tier",
        "",
        f"- MinHash LSH salt-split: `{json.dumps(eng['minhash'])}`",
        f"- Containment stop-grams: `{json.dumps(eng['containment'])}`",
        f"- SemDeDup cell cap: `{json.dumps(eng['semantic'])}`",
        f"- Hot-user share of events: **{eng['hot_user_share']:.1%}**"
        " (planted ~20% on one key)",
    ]
    if "er" in eng:
        lines.append(
            f"- ER plant (PassJoin losslessness + fan-out): `{json.dumps(eng['er'])}`"
        )
    if "nndescent" in rows:
        nd = rows["nndescent"]
        lines += [
            "",
            "## NN-descent convergence on the planted tier",
            "",
            f"Full loop (k=5, min_new_frac=0.01): **{nd['rounds']} rounds, "
            f"converged={nd['converged']}**, seed {nd['seed_s']} s + loop "
            f"{nd['loop_s']} s.  Per-round new-edge fractions: "
            f"`{json.dumps(nd['per_round'])}`",
        ]
    if "er_probe" in rows:
        er = rows["er_probe"]
        lines += [
            "",
            "## ER vocabulary-scaling probe",
            "",
            "The registered ER queries' work is bounded by the DISTINCT-"
            "name count (their table rows above sit at ratio ≈ 1 by"
            " design), so the scaling axis that stresses PassJoin is"
            " probed directly on planted fixed-shape vocabularies"
            f" (alphabet {{a,b,c}}, linear pair mass): **{er['n_base']} →"
            f" {er['n_soak']} strings, {er['base']['wall_s']} s →"
            f" {er['soak']['wall_s']} s (ratio {er['ratio']}×)**, blocking"
            " completeness asserted on every planted pair, 0 failed"
            f" tasks.  Fan-out: `{json.dumps(er['base'])}` →"
            f" `{json.dumps(er['soak'])}`",
        ]
    lines += [
        "",
        "Small configuration (mult=3 on sf0.01) runs per-round in",
        "`tests/test_scale_soak.py`.",
        "",
    ]
    lines += _STATIC_EPILOGUE
    with open(doc, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {doc}")


#: Historical results that are NOT regenerated per run (the r10 --write-doc
#: refresh silently dropped this section once; keep static content here so
#: regeneration preserves it).
_STATIC_EPILOGUE = [
    "## Exact-value parity at the 16× tier (SOAK_SWEEP — r13 run)",
    "",
    "The sweep grew to **111 queries** (the three part-reading ER queries",
    "returned — the planted vocabulary is ~300 names, so their quadratic",
    "levenshtein oracles stay feasible — plus the two r13 additions",
    "`pack_sequences` and `mixture_resample`, both over the SCALED 1M-doc",
    "corpus) and was re-run end-to-end against the regenerated v2 tier",
    "(part now carries the ER plant): **111 pass / 0 fail**",
    "(`/tmp/r13_sweep16.log`, ~65 min wall).  Notables: `pack_sequences`",
    "exact-matched its packing manifest over the scaled corpus through",
    "the bucketed prefix-sum path; `dedup_editdist_blocked` /",
    "`er_canonical_entities` / `er_golden_record` exact-matched on the",
    "PLANTED vocabulary (248 planted pairs, every one recovered, CC +",
    "golden-record composition identical to the DuckDB recursive-CTE",
    "closure); `ts_gapfill` again exact-matched 17.3M generated rows.",
    "",
    "## The 32× refine re-probe after the r13 seed-materialization fix",
    "",
    "sim_nndescent_refine's r12 32× row (12.3×) predates the r13 change",
    "that materializes the LSH seed once (eager localCheckpoint) instead",
    "of letting four plan branches re-run it.  Re-probed at mult=32 on",
    "the v2 tier: **198.8 s vs 7.7 s base (ratio 25.9×, gate ≤64, 0",
    "failed tasks, soak PASS)**.  Honest reading: the fix is a ~3× win at",
    "bench scale (28.4 → ~10 s at sf0.1, where the re-planned seed",
    "dominates) but NEUTRAL at 32× (199 vs r12's 184 s — within the load",
    "band; at that tier Spark's exchange reuse was already deduplicating",
    "most of the seed subtree, and the ratio rose only because the BASE",
    "halved).  Both plans sit far inside the gate; the checkpointed form",
    "is kept for its bench-scale win and bounded-lineage property.",
    "",
    "## The 32× ER vocabulary probe (round 13)",
    "",
    "`er_probe` at mult=32 — **192,000 planted strings over alphabet",
    "{a,b,c}** (degenerate regime, ~2× the r12 100k standalone record):",
    "editdist_pairs + connected_components in **26.98 s vs 7.46 s at the",
    "6k base (ratio 3.6×, gate ≤64), 0 failed tasks**; every one of the",
    "151,746 planted d≤2 pairs recovered (7 additional genuine",
    "cross-cluster pairs appeared at this density — birthday collisions,",
    "each re-verified by the exact levenshtein filter — merging 3 of the",
    "48k planted components: 47,997 observed).  Honest trend to record:",
    "candidates-per-true-pair grows 3.7 → 28.6 → 54.7 at 6k/96k/192k as",
    "the 3-letter segment space saturates — the verify stage stays linear",
    "in candidates (8.3M at 192k, cheap), but a corpus pushing beyond",
    "~10⁶ distinct strings at THIS alphabet would want longer segments",
    "(higher d partitioning) or a length-stratified pre-split; real",
    "vocabularies (larger alphabets) do not saturate this way.",
    "",
    "## Exact-value parity at the 16× tier (round 8)",
    "",
    "`tools/check.py` now also runs against Spark-written directory-parquet",
    "tiers, so the CORRECTNESS gate itself was pointed at the planted 16×",
    "tier: **38 scale-sensitive sql-checked queries (aggs, joins, windows,",
    "events analytics, dedup, text, TPC-H shapes) pass the exact-value +",
    "type-parity DuckDB compare at ~10M events / 1M embeddings-docs — 38",
    "pass / 0 fail** (`/tmp/r8_soaktier_check2.log`; ~25 min wall).  The one",
    "deliberate exclusion: `join_range_interval`, whose CONTRACT shape",
    "(equi-key hash join + range residual) serializes on the planted hot",
    "user exactly as docs/SCALE.md warns.",
    "",
    "## The range-join skew experiment (round 11)",
    "",
    "The r10 verdict hypothesized `salted_range_join` as the scale path for",
    "the hot-key interval join.  Running it in the 16× soak FALSIFIED that:",
    "salting scatters the event side over n_salts reducers, but every salt",
    "replica still carries ALL of the hot user's ~20%-of-corpus intervals,",
    "so per-task residual work stays |events_u|/n_salts × |intervals_u| —",
    "the warm pass alone exceeded 15 min against a 0.7 s base and was",
    "aborted.  The fix that survives is TIME-GRID partitioning",
    "(`operators/skew.py::bucketed_range_join`, registered + sql-checked as",
    "`join_range_bucketed`): events hash to their one floor(ts/1h) cell,",
    "intervals explode to the ≤2 cells they cover, and a hot key fans out",
    "over its active time range with per-task work bounded by per-hour",
    "density — measured **2.51 s at 16× vs 0.99 s base (ratio 2.5×, gate",
    "≤32×)**.  `join_range_salted` stays registered (correct, equivalence-",
    "tested, right for dimension-sized interval sides) with its docstring",
    "stating exactly when it is NOT the answer.",
    "",
    "## The 32× semantic-dedup probe (round 12): knee found, fixed, passed",
    "",
    "The r11 verdict ordered dedup_semantic — the op nearest its 16× gate",
    "(22.7× vs ≤32) — re-measured at mult=32.  First run FAILED the ≤64",
    "gate: **80.6× (178 s vs 2.2 s base)**.  Diagnosis: the IVF assignment",
    "(`operators/similarity.py::_assign`) materialized corpus × n_cells",
    "scored rows (2M × 4096 = 8.2B at 32×) through a row_number() window —",
    "an n×k shuffle+sort just to keep each vector's argmax, with n_cells",
    "itself growing as n/512 under the adaptive quantizer.  Fix: the argmax",
    "is now a PARTIAL-AGGREGATING max_by — the broadcast-join stream emits",
    "each vector's candidates consecutively, so map-side combine collapses",
    "them before any exchange and shuffle volume is |corpus| rows",
    "regardless of n_cells (tie-break identical: max over (sim,",
    "-cell_id)).  Re-measured: **39.6× at mult=32 (229 s vs 5.8 s base,",
    "gate ≤64, 0 failed tasks) — soak PASS**, with every IVF-family exact",
    "twin (sim_ivf/ivfpq/knn_graph/mmr/kmeans/semantic_planted) and recall",
    "gate re-verified green after the change.  The fix benefits every",
    "_assign consumer (ivf_build / ivf_refine → sim_ivf_topk,",
    "sim_ivfpq_topk, dedup_semantic).  Remaining super-linear term at the",
    "cap: n × 4096 dot products in the scoring pass itself — linear per",
    "row once n_cells saturates at 4096, which is why 39.6× lands between",
    "mult (32) and the old 80.6×.  The full 16× table above was re-run",
    "post-fix: dedup_semantic dropped 22.7× → 7.6×, every other op",
    "inside its gate, 0 failed tasks anywhere.",
    "",
    "## The 32× heavy-family probe (round 12): all pass",
    "",
    "With dedup_semantic fixed, the three remaining highest-16×-ratio ops",
    "were pushed to mult=32 (`--mult 32 --ops …`; gate ratio ≤ 64, planted",
    "pathologies engaged: 9 hot minhash buckets, 12 stop-grams, hot-user",
    "share 20.05%):",
    "",
    "| op | base (s) | soak 32× (s) | ratio | failed tasks |",
    "| --- | --- | --- | --- | --- |",
    "| sim_knn_graph | 7.00 | 178.31 | 25.5× | 0 |",
    "| join_interval_overlap | 0.80 | 11.78 | 14.7× | 0 |",
    "| sim_ivfpq_topk | 5.07 | 34.79 | 6.9× | 0 |",
    "| sim_nndescent_refine | 14.97 | 184.30 | 12.3× | 0 |",
    "",
    "sim_knn_graph's 25.5× (vs 13.0× in the r11 16× table; per-run",
    "growing the capped buckets' candidate mass linearly with the corpus",
    "while the base stays scheduling-floor-bound — still inside the gate",
    "with 2.5× headroom and zero task failures; the salt split is what",
    "keeps it from going quadratic.  join_interval_overlap's 14.7× tracks",
    "the hot user's interval density doubling vs 16×.  ivfpq stays",
    "sublinear-per-mult (6.9×) because n_probe routing bounds the ADC",
    "scan.  sim_nndescent_refine (probed late-r12 after joining SOAK_OPS)",
    "holds 12.3× at 32× — the reverse-neighbor cap bounds hub fan-out at 2M",
    "vectors with 0 failed tasks.  No knee found in the heavy family",
    "through 32×.",
    "",
    "## Exact-value parity at the 16× tier (SOAK_SWEEP — r12 run)",
    "",
    "The sweep list is COMMITTED as `tools/scale_soak.py::SOAK_SWEEP`",
    "(105 sql-checked queries spanning every query family — the scaled",
    "events/documents/embeddings blocks where the plants live, every planted",
    "exact twin, the TPC-H/iterative/lateral/frame extras, and all nine B6",
    "scalar families) and the round-12 run against the planted 16× tier is",
    "**105 pass / 0 fail** (`/tmp/r12_sweep16.log`, ~110 min wall), up from",
    "r11's 68 (77-list) and r8's 38 — including all four r12 additions:",
    "`dedup_crossdoc_spans` (replica/boilerplate grams provably stop-listed,",
    "base spans exact-matched), `sim_nndescent_planted`,",
    "`join_range_autowidth` (1.6M rows exact under the hot-user plant), and",
    "`stat_auc_roc` — the last through the REWRITTEN bucketed ranking path,",
    "so the r12 determinism fix is itself tier-verified.",
    "Earlier notables: `join_range_bucketed` exact-matched",
    "321k rows in 90 s under the hot-user plant; `ts_gapfill` /",
    "`ts_interpolate_linear` exact-matched 17.2M generated rows each.  One",
    "finding came OUT of the sweep: `dedup_semantic_planted`'s uncapped plant let its",
    "group SIZE scale with the table (1956 s at 16× — quadratic by",
    "construction); the plant is now PINNED to vec_id < 500 so the",
    "correctness geometry is tier-invariant (re-verified at the 16× tier",
    "in seconds after the pin), and capped-regime scaling remains the",
    "production `dedup_semantic` entry's job in SOAK_OPS.",
    "",
    "Late-r11 additions — nine exact twins (`agg_topk_planted`,",
    "`agg_cms_planted`, `agg_hll_planted`, `agg_hllpp_planted`,",
    "`agg_pctl_planted`, `stat_cardinality_planted`, `stream_approx_planted`,",
    "`dedup_eval_planted`, `multimodal_phash_planted`) joined SOAK_SWEEP",
    "(now 77), and the FULL 77-query sweep was re-run against the 16×",
    "tier end-to-end: **77 pass / 0 fail** (`/tmp/r11_sweep_full.log`).",
    "Their plants pin the KEY domain with fixed key ranges, so the",
    "exact-regime arguments (coupon-exact HLL, below-k KMV,",
    "collision-free CMS, zero-FP bloom, identical-shingle LSH recall,",
    "byte-identical phash groups) are tier-invariant by construction.",
    "",
]


if __name__ == "__main__":
    main()
