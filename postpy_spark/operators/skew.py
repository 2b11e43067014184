"""Skew mitigation: salted joins for hot keys (SURVEY.md §4.2).

AQE's skew-join split (enabled in session defaults) handles most skew at
runtime by splitting oversized partitions, but it only applies to
sort-merge/shuffle-hash joins AFTER materialization.  Explicit salting is
the planning-time tool when one side has a few pathological keys (the
classic NULL-key or power-law-user case at 100 TB): fan the small side out
N ways and scatter the big side uniformly, so no single reducer owns a hot
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot side scattered over ``n_salts`` sub-keys.

    ``big`` rows get a uniform pseudo-random salt; ``small`` is replicated
    once per salt value (explode of a literal range — cheap when small is
    dimension-sized).  The join runs on (key…, salt), so a key with k rows
    lands on min(k, n_salts) reducers instead of one.

    Supported ``how``: inner / left / left_semi / left_anti — for these the
    result equals the unsalted join exactly (every big row carries exactly
    one salt, and each small key-group is fully present under every salt).
    right/full outer are rejected: an UNMATCHED small-side row exists once
    per replica, so it would be emitted ``n_salts`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicating the small side duplicates its unmatched rows under "
            "right/full outer semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on=keys + [_SALT], how=how).drop(_SALT)


def salted_range_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_time: str,
    small_start: str,
    small_end: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner range join (``small.start <= big.time < small.end`` within
    ``key``) with the big side salted — the skew escape hatch for
    ``join_range_interval`` when one key owns a disproportionate share of
    events.  The interval side is replicated per salt (dimension-sized by
    assumption), so the shuffle spreads a hot key over ``n_salts``
    reducers; the range predicate rides the equi-join as a residual, same
    as the unsalted plan.  Inner-only (see ``salted_join`` on why outer +
    replication don't mix).  Output columns: all of ``big``, then
    ``small``'s non-key columns."""
    b = big.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int")).alias("b")
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).alias("s")
    cond = (
        (F.col(f"b.{key}") == F.col(f"s.{key}"))
        & (F.col(f"b.{_SALT}") == F.col(f"s.{_SALT}"))
        & (F.col(f"b.{big_time}") >= F.col(f"s.{small_start}"))
        & (F.col(f"b.{big_time}") < F.col(f"s.{small_end}"))
    )
    small_out = [c for c in small.columns if c != key]
    return b.join(s, cond).select(
        *[F.col(f"b.{c}") for c in big.columns],
        *[F.col(f"s.{c}") for c in small_out],
    )


def skew_stats(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Per-key row counts + share of total for the heaviest keys — the
    diagnostic used to decide whether salting/AQE-splitting is needed."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / total, 6))
        # key tie-break: a count tie at the `top` boundary must not make
        # the report row set run-dependent
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
    )


def choose_bucket_width(
    small: DataFrame,
    small_start: str,
    small_end: str,
    rel_err: float = 0.05,
) -> int:
    """Pick a grid width for :func:`bucketed_range_join` from the data:
    the MEDIAN interval length (approxQuantile over one cheap pass of the
    dimension-sized interval side).

    Why the median length is the right operating point: an interval of
    length L explodes to at most ceil(L/W)+1 buckets, so W = median(L)
    caps the typical interval at ~2 replicas (the same bound the 1 h
    default assumed for 1 h intervals), while keeping buckets NARROW
    enough that a hot key's events fan out over its active range instead
    of piling into a handful of giant cells.  W far above median(L)
    degenerates toward the plain per-key join (few huge cells, the hot
    key's quadratic mass reconcentrates); W far below it multiplies the
    interval-side explosion factor (ceil(L/W)+1 replicas per interval)
    without reducing per-cell event counts proportionally.  Both failure
    modes are demonstrated and self-corrected in
    tests/test_skew.py::test_choose_bucket_width_self_corrects.

    One driver-side pass over the SMALL side only (dimension-sized by the
    operator's own contract), so the two-pass cost is bounded the same
    way the join's replication is.
    """
    dt = dict(small.dtypes)

    def _num(col: str) -> "F.Column":
        c = F.col(col)
        if dt[col].startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double")

    lens = small.select(
        (_num(small_end) - _num(small_start)).cast("double").alias("__len")
    ).where(F.col("__len") > 0)
    med = lens.approxQuantile("__len", [0.5], rel_err)
    if not med:  # all-degenerate or empty interval side: any width works
        return 3_600_000_000
    return max(1, int(med[0]))


def bucketed_range_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_time: str,
    small_start: str,
    small_end: str,
    bucket_width_us: int | None = 3_600_000_000,
) -> DataFrame:
    """Inner point-in-interval join (``small.start <= big.time < big.end``
    within ``key``) on a (key, time-bucket) GRID — the hot-key scale path
    the r11 soak experiment proved ``salted_range_join`` is not.

    Why salting alone fails here (measured, not theorized): on the 16×
    planted-hot-user tier one user owns ~20% of both sides.  Salting
    scatters the event side over n_salts reducers, but every salt replica
    still carries ALL of that user's intervals, so each task performs
    |events_u|/n_salts × |intervals_u| residual comparisons — the
    within-key quadratic mass is untouched and the warm pass alone ran
    >15 min against a 0.7 s base (aborted; docs/SCALE_SOAK.md).

    The grid attacks the mass itself: events land in exactly ONE
    ``floor(t/W)`` bucket; each interval is exploded to the buckets it
    covers (≤ ceil(len/W)+1 — 2 replicas for 1 h intervals at W = 1 h).
    The equi-join runs on (key, bucket), so a hot key fans out over its
    ACTIVE TIME RANGE — per-task work is bounded by per-bucket DENSITY
    (events/hour × intervals/hour), which real growth holds constant
    while extending the range (the soak's synthesis models exactly this).
    No de-dup step is needed: the event's single bucket decides the one
    (key, bucket) cell a matching pair can meet in.  Inner-only, same
    contract as ``salted_range_join``; equivalence pytest in
    tests/test_skew.py.  Pathological residue (a key × bucket cell
    denser than memory) is AQE skew-split territory, orthogonal here.

    ``bucket_width_us=None`` auto-tunes W from the interval side via
    :func:`choose_bucket_width` (median interval length: ≤2 replicas per
    typical interval, buckets no wider than they need to be).  The fixed
    default remains 1 h for callers whose axis is known to be µs with
    ~hour-scale intervals; pass an explicit W when the axis is in a
    different unit.
    """
    if bucket_width_us is None:
        bucket_width_us = choose_bucket_width(small, small_start, small_end)
    w = int(bucket_width_us)

    def _axis(df: DataFrame, col: str) -> "F.Column":
        # timestamps → µs on the bucket axis; numeric epochs stay in the
        # caller's unit (then bucket_width_us is in that same unit)
        dt = dict(df.dtypes)[col]
        c = F.col(col)
        if dt.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double")

    # __bk columns are added BEFORE aliasing (withColumn would drop a
    # subquery alias applied earlier)
    b = big.withColumn(
        "__bk", F.floor(_axis(big, big_time) / w).cast("bigint")
    ).alias("b")
    lo = F.floor(_axis(small, small_start) / w).cast("bigint")
    # end is EXCLUSIVE: an interval ending exactly on a bucket edge does
    # not reach into that bucket, so the last covered bucket is
    # ceil(end/w) - 1.  (floor((end-1)/w) is equivalent ONLY on an
    # integral axis; with a fractional end like 3600.5 at w=3600 it lands
    # one bucket short and silently drops that bucket's matches.)
    # greatest() guards degenerate empty intervals so sequence() never
    # sees stop < start.
    hi = F.greatest(
        (F.ceil(_axis(small, small_end) / w) - 1).cast("bigint"), lo
    )
    s = small.withColumn("__bk", F.explode(F.sequence(lo, hi))).alias("s")
    cond = (
        (F.col(f"b.{key}") == F.col(f"s.{key}"))
        & (F.col("b.__bk") == F.col("s.__bk"))
        & (F.col(f"b.{big_time}") >= F.col(f"s.{small_start}"))
        & (F.col(f"b.{big_time}") < F.col(f"s.{small_end}"))
    )
    small_out = [c for c in small.columns if c != key]
    return b.join(s, cond).select(
        *[F.col(f"b.{c}") for c in big.columns],
        *[F.col(f"s.{c}") for c in small_out],
    )
