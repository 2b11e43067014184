"""As-of (backward) join: match each left row to the most recent right row.

PostgreSQL users of postpy express this with LATERAL + ORDER BY/LIMIT 1;
DuckDB has ASOF JOIN.  Spark has no native as-of join, so we use the
union + window ``last(ignorenulls)`` pattern (SURVEY.md §2.B2 `join_asof`):

1. tag left rows (side=1) and right rows (side=0);
2. union them on (key, time, side, payload-struct);
3. one window per key ordered by (time, side) carries the latest right
   payload forward;
4. keep left rows, unpack the carried struct.

Scale properties: exactly ONE shuffle (the window partitioning on key) —
no nested-loop, no range explosion; skewed keys are the same hazard as any
window (salt upstream if a single key dominates).  The right payload is
packed in a struct so a NULL *field* in the matched row is preserved
rather than skipped by ignorenulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_time"
_KEY = "__asof_key"
_PAYLOAD = "__asof_payload"
_BUCKET = "__asof_bucket"
_TIME_F = "__asof_time_f"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    include_right_time: str | None = None,
    strict: bool = False,
    bucket_width: float | None = None,
) -> DataFrame:
    """Backward as-of left join.

    Each left row gets the payload of the right row with the greatest
    ``right_time`` ≤ ``left_time`` (strictly ``<`` when ``strict``) within
    the same key; unmatched left rows keep NULL payload (left-join
    semantics).  ``right`` must be unique per (key, time) for deterministic
    results — pre-aggregate otherwise.

    ``bucket_width`` (seconds, or plain units for numeric time columns) is
    the SKEW ESCAPE HATCH: the default single window per key funnels a
    dominant key through one task.  When set, each key's timeline is split
    into fixed-width buckets, windows run per (key, bucket), and a carry-in
    pass seeds every bucket with the latest earlier-bucket payload — same
    result (asserted in tests/test_skew.py), max task bounded by the
    densest (key, bucket) instead of the whole hot key, at the cost of two
    extra small shuffles.
    """
    if bucket_width is not None:
        return _asof_join_bucketed(
            left, right, left_on, right_on, left_time, right_time,
            right_cols, include_right_time, strict, bucket_width,
        )
    rcols = right_cols or [c for c in right.columns if c not in (right_on, right_time)]
    out_time = include_right_time

    r = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.struct(
            *[F.col(c) for c in rcols],
            *( [F.col(right_time).alias(out_time)] if out_time else [] ),
        ).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns],
    )

    # strict '<': left rows must sort BEFORE right rows at equal time.
    side_order = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(_KEY)
        .orderBy(F.col(_TIME).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    matched = unioned.filter(F.col(_SIDE) == 1)
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols]
    if out_time:
        out_cols.append(F.col(f"{_PAYLOAD}.{out_time}").alias(out_time))
    return matched.select(*out_cols)


def _asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None,
    include_right_time: str | None,
    strict: bool,
    bucket_width: float,
) -> DataFrame:
    """Time-bucketed as-of (see ``asof_join``'s ``bucket_width``).

    1. bucket every row: ``floor(time / width)`` (timestamp → epoch secs);
    2. reduce right to its last payload per (key, bucket) — map-side
       partial ``max_by``, one small shuffle;
    3. carry-in: for each (key, bucket) seen on EITHER side, the latest
       payload from any EARLIER bucket, via a window over the per-bucket
       frame (rows per key = #buckets, not #events — this window is the
       only per-key serial step and it is tiny);
    4. union carry-in seeds (NULL time → sorts first in the bucket), right
       rows, and left rows; window per (key, bucket); keep left rows.

    Equal-time boundary rows land in the same bucket, so strict/non-strict
    tie ordering is identical to the unbucketed form.
    """
    from pyspark.sql import types as T

    rcols = right_cols or [c for c in right.columns if c not in (right_on, right_time)]
    out_time = include_right_time

    def bucket_of(col, dtype):
        # timestamp[_ntz]/date → epoch seconds; numerics bucket directly
        if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
            col, dtype = col.cast("timestamp"), T.TimestampType()
        if isinstance(dtype, T.TimestampType):
            secs = F.unix_micros(col) / F.lit(1_000_000.0)
        else:
            secs = col.cast("double")
        return F.floor(secs / F.lit(float(bucket_width))).cast("bigint")

    payload = F.struct(
        *[F.col(c) for c in rcols],
        *([F.col(right_time).alias(out_time)] if out_time else []),
    )
    r = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_time).alias(_TIME),
        bucket_of(F.col(right_time), right.schema[right_time].dataType).alias(_BUCKET),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_time).alias(_TIME),
        bucket_of(F.col(left_time), left.schema[left_time].dataType).alias(_BUCKET),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns],
    )

    # (2) last right payload per (key, bucket)
    rb = r.groupBy(_KEY, _BUCKET).agg(F.max_by(_PAYLOAD, _TIME).alias(_PAYLOAD))
    # (3) carry-in per (key, bucket) over the union of bucket sets
    buckets = (
        l.select(_KEY, _BUCKET).distinct()
        .unionByName(rb.select(_KEY, _BUCKET))
        .distinct()
        .join(rb, [_KEY, _BUCKET], "left")
    )
    w_carry = (
        Window.partitionBy(_KEY)
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w_carry))
        .filter(F.col(_PAYLOAD).isNotNull())
        .select(
            _KEY,
            F.lit(None).cast(r.schema[_TIME].dataType).alias(_TIME),
            _BUCKET,
            F.lit(-1).alias(_SIDE),
            _PAYLOAD,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        )
    )

    # (4) per-bucket window; NULL carry time sorts first under asc nulls-first
    side_order = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(_KEY, _BUCKET)
        .orderBy(F.col(_TIME).asc_nulls_first(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(carry).unionByName(l).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    matched = unioned.filter(F.col(_SIDE) == 1)
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols]
    if out_time:
        out_cols.append(F.col(f"{_PAYLOAD}.{out_time}").alias(out_time))
    return matched.select(*out_cols)


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    include_right_time: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Nearest-in-either-direction as-of left join (pandas
    ``merge_asof(direction='nearest')`` semantics).

    Each left row gets the payload of the right row whose ``right_time``
    is CLOSEST to ``left_time`` in absolute distance within the same key;
    ties (equidistant backward/forward match) resolve to the BACKWARD row
    so results are deterministic.  ``tolerance`` (same units as the time
    columns) discards matches farther than the bound — unmatched rows
    keep NULL payload.  Time columns must be numeric (cast timestamps to
    ``unix_micros`` upstream); ``right`` must be unique per (key, time).

    Scale design: ONE shuffle.  Both direction passes share a single
    window partitioning/sort — ``last(ignorenulls)`` over the preceding
    frame carries the latest earlier right payload, ``first(ignorenulls)``
    over the following frame pulls the earliest later one; Spark computes
    both frames in one WindowExec over one sort.  No self-join, no
    nested-loop.  Skewed keys: same hazard as any per-key window.
    """
    rcols = right_cols or [c for c in right.columns if c not in (right_on, right_time)]
    out_time = include_right_time

    payload_fields = [F.col(c) for c in rcols]
    payload_fields.append(F.col(right_time).cast("double").alias(_TIME_F))
    if out_time:
        payload_fields.append(F.col(right_time).alias(out_time))

    r = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.struct(*payload_fields).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns],
    )

    # Equal-time right rows sort BEFORE left rows (side 0 < 1), so an exact
    # match lands in the backward frame with distance 0 and wins every tie.
    order = [F.col(_TIME).asc(), F.col(_SIDE).asc()]
    w_back = (
        Window.partitionBy(_KEY).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward neighbour via the REVERSED ordering with a RUNNING frame:
    # Spark's [currentRow, unboundedFollowing] frame re-aggregates the
    # whole remaining frame per row (UnboundedFollowingWindowFunctionFrame,
    # O(partition²)); last(...) over the descending running frame is the
    # O(n) incremental path and selects the identical row.  Side DESC keeps
    # the tie contract: at equal time the left row still precedes the right
    # row, so an exact-time match stays in the BACKWARD frame only.
    w_fwd_rev = (
        Window.partitionBy(_KEY)
        .orderBy(F.col(_TIME).desc(), F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = (
        r.unionByName(l)
        .withColumn("__back", F.last(_PAYLOAD, ignorenulls=True).over(w_back))
        .withColumn("__fwd", F.last(_PAYLOAD, ignorenulls=True).over(w_fwd_rev))
    )

    t = F.col(_TIME).cast("double")
    d_back = t - F.col(f"__back.{_TIME_F}")
    d_fwd = F.col(f"__fwd.{_TIME_F}") - t
    if tolerance is not None:
        back_ok = F.col("__back").isNotNull() & (d_back <= F.lit(float(tolerance)))
        fwd_ok = F.col("__fwd").isNotNull() & (d_fwd <= F.lit(float(tolerance)))
    else:
        back_ok = F.col("__back").isNotNull()
        fwd_ok = F.col("__fwd").isNotNull()
    # backward wins ties (<=), matching the documented determinism contract
    pick_back = back_ok & (~fwd_ok | (d_back <= d_fwd))
    chosen = (
        F.when(pick_back, F.col("__back"))
        .when(fwd_ok, F.col("__fwd"))
        .otherwise(F.lit(None).cast(r.schema[_PAYLOAD].dataType))
    )
    matched = unioned.filter(F.col(_SIDE) == 1).withColumn(_PAYLOAD, chosen)
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols]
    if out_time:
        out_cols.append(F.col(f"{_PAYLOAD}.{out_time}").alias(out_time))
    return matched.select(*out_cols)
