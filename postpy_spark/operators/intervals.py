"""Keyless interval-overlap join via bucketed binning.

``join_range_interval`` (queries/joins.py) handles the common case where an
equi key (user_id) carries the hash join and the time range is a residual.
This module covers the genuinely hard case: two interval sets with NO shared
equi key, where the naive formulation is a theta join — BroadcastNestedLoop
or a cartesian product, both quadratic and fatal at 100 TB.

The scale-safe rewrite is the classic binning technique (used by e.g.
genomics overlap joins and telemetry correlation): pick a bucket width W,
explode every interval into the W-aligned buckets it covers, equi-join on
the bucket id, keep pairs that truly overlap, and de-duplicate WITHOUT a
distinct by attributing each pair to exactly one bucket — the bucket
containing the overlap start ``max(a_start, b_start)``, which both
intervals necessarily cover.  Cost is |A|·ceil(len/W) + |B|·ceil(len/W)
exploded rows and a hash join whose fan-out is the true overlap density,
never |A|·|B|.

Choosing W ≈ the typical interval length keeps the explode factor at 2–3
rows per interval; AQE's skew-join split handles pathological hot buckets
(a flash-crowd hour) the same way it handles any skewed hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["overlap_join_binned"]


def _covered_buckets(start_us: Column, end_us: Column, width_us: int) -> Column:
    """Bucket ids covered by the half-open interval [start_us, end_us)."""
    first = F.floor(start_us / F.lit(width_us))
    # end is exclusive: an interval ending exactly on a boundary does not
    # touch the next bucket.  Guard degenerate (empty) intervals to one
    # bucket so sequence() never sees stop < start.
    last = F.greatest(F.floor((end_us - F.lit(1)) / F.lit(width_us)), first)
    return F.sequence(first, last)


def overlap_join_binned(
    a: DataFrame,
    b: DataFrame,
    *,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width_us: int,
) -> DataFrame:
    """Inner overlap join of half-open microsecond intervals [start, end).

    ``a`` and ``b`` carry bigint epoch-microsecond bounds plus any payload
    columns (names must not collide across the two frames).  Returns one row
    per truly-overlapping (a, b) pair with both payloads — exactly the rows
    of ``a JOIN b ON a_start < b_end AND b_start < a_end``, produced via a
    bucket equi-join instead of a nested loop.

    De-dup rule: a pair overlapping several shared buckets is emitted only
    from the bucket containing ``greatest(a_start, b_start)`` — no
    ``distinct`` (which would shuffle the full pair stream a second time).
    """
    w = int(bucket_width_us)
    ax = a.withColumn(
        "__bucket", F.explode(_covered_buckets(F.col(a_start), F.col(a_end), w))
    )
    bx = b.withColumn(
        "__bucket", F.explode(_covered_buckets(F.col(b_start), F.col(b_end), w))
    )
    overlap = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    owner = F.floor(F.greatest(F.col(a_start), F.col(b_start)) / F.lit(w))
    return (
        ax.join(bx, "__bucket")
        .filter(overlap & (F.col("__bucket") == owner))
        .drop("__bucket")
    )
