"""Distributed global ranking (SURVEY.md §2.B4 scale posture).

A global ``Window.orderBy`` funnels the whole frame through ONE task — the
contract query ``win_ntile_pctrank`` documents that honestly.  This module
is the scale path: classic range-bucketed ranking, where the only
full-data shuffles are one hash exchange per window/aggregate and every
window runs over either a bucket's rows or a bucket-count frame.

    1. assign each row a DETERMINISTIC ascending bucket id from a
       driver-collected list of approximate quantile split points
       (literals — same discipline as the k-means centroids and bloom
       bitmaps elsewhere in this package);
    2. local ``row_number`` / cumsum / running-max per bucket (window
       keyed on the bucket id);
    3. per-bucket counts/totals → exclusive prefix over the ≤P bucket
       rows (a window over P rows, trivially single-task by construction);
    4. broadcast-join offsets back: ``global = offset + local``.

Why explicit literal split points instead of ``repartitionByRange`` +
``spark_partition_id()`` (the r1–r11 form): the local-window branch and
the totals branch each planned their OWN range exchange (no exchange
reuse fires across the self-join dedup), and each exchange SAMPLES its
split points independently — when the samples disagree, "partition id"
means different key ranges in the two branches and the joined offsets are
silently wrong.  Observed live in r12: stat_auc_roc's prefix sum over
392k distinct prices drifted +1472 mid-stream at sf0.1 while the same
operator's sf0.01 run matched.  A bucket id computed from one collected
literal list is a pure function of the ROW, so every branch agrees by
construction, at any tier, under any physical replanning.

ntile / percent_rank / cume_dist are then pure expressions over
``global_rn`` and the total count (joined in as a 1-row broadcast, no
driver-side ``count()``).

``order_cols`` must be plain column NAMES (ascending, NULLS FIRST — the
Spark default); for a descending key, pre-negate into a column (see
``win_ntile_distributed`` / ``events_rfm_segments``).  The FIRST order
column must be numeric / timestamp / date (it seeds the quantile
bucketing); the remaining columns only break ties inside a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_PID = "__rank_pid"
_LRN = "__rank_local_rn"
_OFF = "__rank_offset"
_N = "__rank_total"


def _numeric_key(df: DataFrame, col: str) -> Column:
    """``col`` as an order-preserving double (timestamps via unix_micros —
    TIMESTAMP_NTZ won't cast to double directly)."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if dt == "date":
        return F.unix_date(F.col(col)).cast("double")
    return F.col(col).cast("double")


def _bucket_id(df: DataFrame, first_col: str, num_partitions: int | None) -> Column:
    """Deterministic ascending bucket id for the two-phase ranking scheme:
    ≤ P-1 approximate-quantile split points of the first order column are
    collected ONCE and inlined as literals, and the id is the count of
    split points ≤ the row's key (NULLs → bucket 0, matching NULLS FIRST).
    Any split-point list yields EXACT results — quality only balances the
    buckets — so the approxQuantile error bound is a skew knob, not a
    correctness parameter."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    key = _numeric_key(df, first_col)
    # constant-0 bucket id that is NOT foldable (depends on the key
    # column): a literal would be constant-folded out of the downstream
    # window's partition spec, leaving an unpartitioned window (see the
    # pmod note in global_row_number)
    zero = F.coalesce((key * 0).cast("int"), F.lit(0))
    if n <= 1:
        # single bucket — no split points to collect (and an empty
        # probability list NPEs approxQuantile on the JVM side)
        return zero
    probs = [i / n for i in range(1, n)]
    keyed = df.select(key.alias("_k")).filter(F.col("_k").isNotNull())
    bounds = sorted(set(keyed.stat.approxQuantile("_k", probs, 0.001)))
    if not bounds:
        return zero
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    # the lambda re-evaluates `key` per element (no CSE) — a scalar cast,
    # cheap by design; keep expensive keys out of order_cols[0].
    return (
        F.when(key.isNull(), F.lit(0))
        .otherwise(F.size(F.filter(arr, lambda b: b <= key)))
        .cast("int")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    rn_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """df + 1-based ``rn_col`` = global row number under ``order_cols``
    (which must form a total order — add a unique tiebreak; plain column
    names, ascending; pre-negate for descending).  Optionally also
    attaches the total row count as ``total_col``.  One full-data
    shuffle, no single-task stage over the data."""
    cols = [F.col(c) for c in order_cols]
    tagged = df.withColumn(_PID, _bucket_id(df, order_cols[0], num_partitions))
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    local = tagged.withColumn(_LRN, F.row_number().over(w_local))

    cnts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_cnt"))
    # ≤P rows — one task over bucket COUNTS only.  The constant partition
    # key pins the tiny frame to one window group WITHOUT tripping Spark's
    # unpartitioned-window warning; pmod(_pid, 1) (always 0) is used instead
    # of lit(0) because Catalyst constant-folds a foldable partition key
    # away, leaving an empty partition spec that warns on every task.
    one_group = F.pmod(F.col(_PID), F.lit(1))
    w_off = (
        Window.partitionBy(one_group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = cnts.select(
        _PID,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias(_OFF),
        F.sum("_cnt").over(
            Window.partitionBy(one_group).orderBy(_PID).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias(_N),
    )
    out = local.join(broadcast(offsets), _PID).withColumn(
        rn_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint")
    )
    if total_col:
        out = out.withColumn(total_col, F.col(_N).cast("bigint"))
    return out.drop(_PID, _LRN, _OFF, _N)


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + inclusive global prefix sum of ``value_col`` under
    ``order_cols`` (a total order), via the same bucketed two-phase
    scheme as :func:`global_row_number`: local per-bucket cumsum, then an
    exclusive prefix over the ≤P bucket TOTALS (a window over P rows)
    broadcast-joined back.  One full-data shuffle, no single-task stage
    over the data — the scalable form of ``SUM(v) OVER (ORDER BY ...)``,
    which would otherwise funnel the whole frame through one task."""
    cols = [F.col(c) for c in order_cols]
    tagged = df.withColumn(_PID, _bucket_id(df, order_cols[0], num_partitions))
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn(_LRN, F.sum(value_col).over(w_local))

    totals = tagged.groupBy(_PID).agg(F.sum(value_col).alias("_tot"))
    one_group = F.pmod(F.col(_PID), F.lit(1))  # see global_row_number note
    w_off = (
        Window.partitionBy(one_group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID, F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(broadcast(offsets), _PID)
        .withColumn(sum_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
        .drop(_PID, _LRN, _OFF)
    )


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    max_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + inclusive global running max of ``value_col`` under
    ``order_cols`` (a total order) — the scalable form of
    ``MAX(v) OVER (ORDER BY ...)``, which funnels the whole frame through
    ONE task.  Running max is associative, so the same bucketed two-phase
    scheme as :func:`global_running_sum` applies: local per-bucket
    running max, then an exclusive prefix-max over the ≤P bucket MAXes
    (a window over P rows) broadcast-joined back and combined with
    ``greatest`` (which skips the NULL offset of the first bucket).
    Preserves ``value_col``'s type (no numeric cast) so it works on
    timestamps — only the ORDER key needs a numeric/timestamp type."""
    cols = [F.col(c) for c in order_cols]
    tagged = df.withColumn(_PID, _bucket_id(df, order_cols[0], num_partitions))
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn(_LRN, F.max(value_col).over(w_local))

    totals = tagged.groupBy(_PID).agg(F.max(value_col).alias("_tot"))
    one_group = F.pmod(F.col(_PID), F.lit(1))  # see global_row_number note
    w_off = (
        Window.partitionBy(one_group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(_PID, F.max("_tot").over(w_off).alias(_OFF))
    return (
        local.join(broadcast(offsets), _PID)
        .withColumn(max_col, F.greatest(F.col(_OFF), F.col(_LRN)))
        .drop(_PID, _LRN, _OFF)
    )


def ntile_expr(rn: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) from a 1-based global row number: the first
    ``total % n`` buckets get ``ceil(total/n)`` rows, the rest get
    ``floor(total/n)`` — matches the standard (and DuckDB/Spark) NTILE."""
    big = F.floor(total / n) + 1  # rows per bucket in the first (total % n) buckets
    small = F.floor(total / n)
    cut = (total % n) * big  # rows covered by the big buckets
    return (
        F.when(rn <= cut, F.floor((rn - 1) / big))
        .otherwise((total % n) + F.floor((rn - cut - 1) / F.greatest(small, F.lit(1))))
        .cast("bigint")
        + 1
    )


def ranked_analytics(
    df: DataFrame,
    order_cols: list[str],
    n_tiles: int = 4,
) -> DataFrame:
    """df + quartile/pct_rank/cume via the distributed ranking path.
    ``order_cols`` must be a total order (unique tiebreak), which makes
    RANK == ROW_NUMBER, so percent_rank = (rn-1)/(N-1) and cume = rn/N."""
    ranked = global_row_number(df, order_cols, rn_col="_grn", total_col="_gn")
    rn, n = F.col("_grn"), F.col("_gn")
    return (
        ranked.withColumn("quartile", ntile_expr(rn, n, n_tiles))
        .withColumn("pct_rank", (rn - 1) / (n - 1))
        .withColumn("cume", rn / n)
        .drop("_grn", "_gn")
    )
