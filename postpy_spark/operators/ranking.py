"""Distributed global ranking (SURVEY.md §2.B4 scale posture).

A global ``Window.orderBy`` funnels the whole frame through ONE task — the
contract query ``win_ntile_pctrank`` documents that honestly.  This module
is the scale path: classic range-partitioned ranking, where the only
full-data shuffles are a range exchange and one hash exchange, and every
window runs over either a partition's rows or a partition-count frame.

    1. ``repartitionByRange(P, cols)`` — range partitioner assigns ascending
       key ranges to ascending partition ids (sampled split points);
    2. local ``row_number`` per partition (window keyed on
       ``spark_partition_id()`` — each range partition is one window group);
    3. per-partition counts → exclusive prefix sum (a window over P rows,
       trivially single-task by construction);
    4. broadcast-join offsets back: ``global_rn = offset + local_rn``.

ntile / percent_rank / cume_dist are then pure expressions over
``global_rn`` and the total count (joined in as a 1-row broadcast, no
driver-side ``count()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_PID = "__rank_pid"
_LRN = "__rank_local_rn"
_OFF = "__rank_offset"
_N = "__rank_total"


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    rn_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """df + 1-based ``rn_col`` = global row number under ``order_cols``
    (which must form a total order — add a unique tiebreak; names or
    Column sort expressions, e.g. ``F.col(x).desc()``).  Optionally
    also attaches the total row count as ``total_col``.  Two full-data
    shuffles, no single-task stage over the data."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*( [num_partitions] if num_partitions else [] ), *cols)
    tagged = ranged.withColumn(_PID, F.spark_partition_id())
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    local = tagged.withColumn(_LRN, F.row_number().over(w_local))

    cnts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("_cnt"))
    # P rows — one task over partition COUNTS only.  The constant partition
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
    ``order_cols`` (a total order), via the same range-partitioned
    two-phase scheme as :func:`global_row_number`: local per-partition
    cumsum, then an exclusive prefix over the P partition TOTALS (a window
    over P rows) broadcast-joined back.  Two full-data shuffles, no
    single-task stage over the data — the scalable form of
    ``SUM(v) OVER (ORDER BY ...)``, which would otherwise funnel the whole
    frame through one task."""
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    tagged = ranged.withColumn(_PID, F.spark_partition_id())
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
    ONE task.  Running max is associative, so the same range-partitioned
    two-phase scheme as :func:`global_running_sum` applies: local
    per-partition running max, then an exclusive prefix-max over the P
    partition MAXes (a window over P rows) broadcast-joined back and
    combined with ``greatest`` (which skips the NULL offset of the first
    partition).  Preserves ``value_col``'s type (no numeric cast) so it
    works on timestamps."""
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    tagged = ranged.withColumn(_PID, F.spark_partition_id())
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
