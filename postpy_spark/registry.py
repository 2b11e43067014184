"""Driver-contract registry: named queries and their DuckDB oracle SQL.

Every operator declared done in SURVEY.md §2 registers here with a stable
name; ``__spark_entry__.py`` exposes the registry to the correctness driver.
``oracle=None`` marks non-SQL-expressible ops (driver falls back to a
rows-only check).

Contract rules encoded here (SURVEY.md §5.2):
- every computed column is aliased identically in the Spark plan and the SQL;
- derived float aggregates are rounded identically on both sides (float
  summation order differs between engines);
- results are order-insensitive (the driver hashes a sorted canonical form),
  but any ranking-within-ties must be made deterministic via unique-key
  tiebreaks in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    group: str  # SURVEY.md §2 group tag, e.g. "B3"


_REGISTRY: dict[str, RegisteredQuery] = {}

#: SURVEY.md §2 contract operators in checklist order (groups A, B1–B6, C, D,
#: E).  The driver's correctness pass walks ``queries()`` in iteration order
#: and may truncate under a per-round budget (round 1 stopped after 50 of 130
#: — most of the contract went unproven while extras were checked first), so
#: ``load_all`` emits these 93 names first, their variants next, extras last.
CONTRACT_ORDER: tuple[str, ...] = (
    # Group A — ETL surface (15)
    "scan_csv", "sink_csv", "scan_jdbc", "sink_jdbc_append", "merge_upsert",
    "ddl_create_table", "ddl_create_table_as", "catalog_list_tables",
    "catalog_describe", "schema_reset", "txn_exec", "conn_env", "type_map",
    "encoding_map", "ext_install",
    # B1 — scans/projection/filtering (7)
    "scan_parquet", "project", "project_expr", "filter_basic",
    "filter_in_between_like", "filter_null", "distinct_rows",
    # B2 — joins (12)
    "join_inner", "join_left", "join_right", "join_full", "join_semi",
    "join_anti", "join_cross", "join_broadcast", "join_theta",
    "join_range_interval", "join_asof", "join_multiway_star",
    # B3 — aggregation (13)
    "agg_global", "agg_groupby", "agg_having", "agg_count_distinct",
    "agg_approx_distinct", "agg_approx_quantile", "agg_stats",
    "agg_grouping_sets", "agg_rollup", "agg_cube", "agg_collect",
    "agg_conditional", "pivot_wide",
    # B4 — windows (7)
    "win_rank", "win_lead_lag", "win_running_sum", "win_moving_avg",
    "win_ntile_pctrank", "win_first_last", "topk_per_group",
    # B5 — sort/limit/set ops/sampling (8)
    "sort_multi", "limit_n", "topk_global", "union_all", "union_distinct",
    "intersect_ab", "except_ab", "sample_frac",
    # B6 — scalar function families (9)
    "fn_string", "fn_regex", "fn_date", "fn_math", "fn_conditional",
    "fn_cast", "fn_array", "fn_map", "fn_json",
    # C — streaming (7)
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_dedup", "stream_stateful_sessionize",
    "stream_sink_upsert",
    # D — LLM pipeline (10)
    "text_stats", "text_tokenize_tf", "text_tfidf", "dedup_exact",
    "dedup_fuzzy_minhash", "dedup_clusters", "sim_cosine_pairs",
    "sim_topk_per_query", "sim_ann_lsh", "multimodal_join",
    # E — UDF surface (5)
    "udf_scalar_py", "udf_scalar_pandas", "udaf_pandas",
    "udtf_apply_in_pandas", "udtf_map_in_pandas",
)

#: Contract-op variants counted under their parent op in SURVEY §2 — proven
#: right after the contract block, before unrelated extras.
CONTRACT_VARIANTS: tuple[str, ...] = (
    "join_anti_not_in", "fn_array_hof", "except_all_ab", "intersect_all_ab",
)

#: Driver-sample rotation (round 4).  The external driver hashes only the
#: FIRST ~50 queries in iteration order each round, and rounds 2–3 sampled
#: the identical prefix (groups A, B1–B3, and three B4 windows) — so 35
#: contract ops (B4 tail, all of B5, C, D, E, plus ``fn_cast`` whose only
#: driver row is the round-1 FAIL that was fixed in round 2) had never
#: received a driver CORRECTNESS row, and 8 B6 ops' rows are round-1
#: vintage.  Emitting these 43 first converts them to driver-attested
#: without hiding anything: every op stays registered and the local oracle
#: gate still checks all of them.  The approx pair (``agg_approx_*``) is
#: deliberately NOT in the prefix — it can only ever produce ``no_oracle``
#: rows, which would waste two sample slots.
DRIVER_SAMPLE_ROTATION: tuple[str, ...] = (
    # -- round-14 rotation.  The driver samples the FIRST ~50 registry
    # entries each round.  Cumulative attestation after r13: 364/365
    # queries carry >=1 driver row, every latest row green; the single
    # hole is sim_nndescent_refine (rows-only by design, never sampled)
    # — it leads this round (r13 VERDICT task 1).  Next: the full
    # rows-only liveness refresh (every rows-only op whose latest driver
    # row predates r10 — the r3/r5/r7 probabilistic contract ops plus
    # the r9-vintage sketch/sampler family), deliberately spending
    # sample slots on no_oracle rows this once so `spark_rows > 0` is
    # attested on CURRENT code for the whole rows-only population.
    # Then the sql-checked staleness queue: the 11-query r6-vintage tail
    # that fell off the end of r13's 50-slot window (streaming + UDF
    # variants), then r7-vintage fill.
    # (0) new in round 14
    "dedup_char_spans", "dedup_char_spans_planted", "dedup_char_crossdoc",
    "text_unigram_train", "text_unigram_planted", "text_unigram_segment",
    "er_incremental", "er_incremental_planted",
    "er_golden_incremental", "er_golden_incremental_planted",
    # (1) the last attestation hole (never driver-sampled, rows-only)
    "sim_nndescent_refine",
    # (2) rows-only liveness refresh (latest driver rows r3–r9)
    "agg_approx_distinct", "agg_approx_quantile",
    "dedup_clusters", "dedup_fuzzy_minhash", "sample_frac", "sim_ann_lsh",
    "dedup_semantic",
    "agg_approx_topk", "agg_cms_estimate", "agg_hll_mergeable",
    "agg_kll_quantiles", "agg_kmv_distinct", "agg_kmv_setops",
    "sample_mixture_stable", "sample_stratified", "sample_weighted",
    # (3) r6-vintage sql tail (missed r13's window)
    "stream_scd2_dimension", "stream_session_dynamic_gap",
    "stream_static_enrich", "stream_stream_join", "stream_two_level_agg",
    "udaf_pandas_window", "udf_scalar_pandas_iter", "udtf_cogroup_pandas",
    "udtf_map_in_arrow", "udtf_python", "win_ntile_distributed",
    # (4) r7-vintage sql fill
    "agg_decimal_exact", "agg_histogram_equidepth", "agg_string_agg",
    "agg_weighted_stats", "catalog_schema_diff", "dedup_url_canonical",
    "distinct_on", "dq_entropy_profile", "dq_observe_metrics",
    "embed_centroid_drift", "etl_cdc_apply", "etl_partition_overwrite",
    "etl_table_diff", "events_activity_streaks",
    "events_attribution_linear", "events_rfm_segments",
)


def query(name: str, oracle: str | None = None, group: str = "?"):
    """Decorator: register fn as the driver-contract query `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, group=group)
        return fn

    return deco


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module (side effect: decorators register)."""
    from postpy_spark.queries import (  # noqa: F401
        composite,
        etl_surface,
        functions,
        joins,
        llm_pipeline,
        relational,
        streaming_batch,
        udfs,
        windows,
    )

    ordered: dict[str, RegisteredQuery] = {}
    for name in (*DRIVER_SAMPLE_ROTATION, *CONTRACT_ORDER, *CONTRACT_VARIANTS):
        if name in _REGISTRY and name not in ordered:
            ordered[name] = _REGISTRY[name]
    for name, rq in _REGISTRY.items():  # extras keep registration order
        ordered.setdefault(name, rq)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: rq.fn for n, rq in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {n: rq.oracle for n, rq in load_all().items() if rq.oracle is not None}
