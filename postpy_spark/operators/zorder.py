"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans skip row groups whose min/max stats exclude the predicate.
A table sorted by ONE column skips beautifully on that column and not at
all on others; interleaving the bits of several columns (the Morton curve)
gives every interleaved column locality, so 2-D box predicates prune row
groups on BOTH axes — the mechanism behind Delta/Iceberg's OPTIMIZE
ZORDER, here as a plain DataFrame transform + sorted parquet write.

Scale shape: one pass to compute per-column quantile ranks (approximate,
``approxQuantile`` on a sample-sized cut list), one ``repartitionByRange``
on the interleaved key (range exchange = the same shuffle a global sort
pays), sorted write.  Skipping effectiveness is MEASURED in
tests/test_zorder.py by reading the written row-group stats via pyarrow.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ZKEY = "__zorder_key"


def _rank_expr(col, cuts: list[float]):
    """Map a value to its bucket index (0..len(cuts)) via the cut list —
    a broadcast-free CASE cascade (cuts are literals)."""
    expr = F.lit(0)
    for c in cuts:
        expr = expr + F.when(F.col(col) > F.lit(c), 1).otherwise(0)
    return expr


def _interleave(bit_cols, bits: int):
    """Interleave ``bits`` bits from each bucket index into one Morton key."""
    terms = []
    n = len(bit_cols)
    for b in range(bits):
        for i, c in enumerate(bit_cols):
            src_bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src_bit.cast("long"), b * n + i))
    return reduce(lambda a, x: a + x, terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 6,
    num_files: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` parquet z-ordered on ``cols`` (numeric).

    Each column is bucketed into 2^bits quantile ranks (equal-population,
    so skew cannot collapse the curve), ranks are bit-interleaved, and the
    frame is range-partitioned + sorted on the Morton key before writing —
    row-group min/max stats then prune on every interleaved column."""
    n_buckets = (1 << bits) - 1
    cuts = {
        c: df.stat.approxQuantile(
            c, [i / (n_buckets + 1) for i in range(1, n_buckets + 1)], 0.01
        )
        for c in cols
    }
    # Materialize each rank ONCE as a named column before interleaving:
    # _interleave references every rank `bits` times, and inlining the
    # (2^bits - 1)-term CASE cascade at each reference multiplies the
    # expression tree ~bits× (hundreds of when-terms at defaults) — enough
    # to threaten codegen size limits and slow planning at higher bits.
    rank_cols = [f"__zrank_{i}" for i in range(len(cols))]
    ranked = df
    for rc, c in zip(rank_cols, cols):
        ranked = ranked.withColumn(rc, _rank_expr(c, cuts[c]))
    ranked = ranked.withColumn(
        _ZKEY, _interleave([F.col(rc) for rc in rank_cols], bits)
    )
    writer = (
        ranked.repartitionByRange(num_files, _ZKEY)
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY, *rank_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
