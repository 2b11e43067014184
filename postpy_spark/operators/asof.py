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
) -> DataFrame:
    """Backward as-of left join.

    Each left row gets the payload of the right row with the greatest
    ``right_time`` ≤ ``left_time`` (strictly ``<`` when ``strict``) within
    the same key; unmatched left rows keep NULL payload (left-join
    semantics).  ``right`` must be unique per (key, time) for deterministic
    results — pre-aggregate otherwise.
    """
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
