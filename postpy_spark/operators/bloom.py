"""Bloom-filter semi-join pruning.

At 100 TB the classic "keep fact rows whose key appears in a big dimension
subset" semi join shuffles the ENTIRE fact side before the join can drop
anything.  A Bloom filter of the build-side keys is fixed-size (``m_bits``,
default 64 Kibit = 8 KiB) no matter how many keys it summarizes, so it can
always be broadcast: the fact scan drops non-members *before* the shuffle
and only candidates (true members + the false-positive rate) reach the
exact confirm join.  This is the explicit, parameterized form of Spark's
own runtime row-level filtering (``spark.sql.optimizer.runtime.bloomFilter``,
Spark 3.3+) — same LSH-style contract as ``operators/similarity.py``:
a cheap over-approximate candidate pass, then exact verification, so the
composition is exactly equal to the plain semi join.

Shapes (everything JVM-side, no Python, no driver state):

- build: one explode (k positions per key) + one partial-aggregated
  ``groupBy(word).bit_or(bit)`` bounded at ``m_bits/64`` rows, folded into a
  ONE-ROW frame holding a ``map<word, mask>`` — the same broadcast-1-row
  pattern as the TF-IDF corpus size.
- probe: crossJoin(broadcast(1-row bloom)) + k bit tests as column
  expressions; false positives are possible, false negatives are not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: xxhash64 seeds are varied by hashing (key, i); any fixed distinct ints do.
_DEFAULT_K = 5


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for one key (xxhash64 family)."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = _DEFAULT_K
) -> DataFrame:
    """1-row frame with column ``bloom``: map<word_idx, 64-bit mask>.

    The word aggregation is a normal partial-agg shuffle bounded at
    ``m_bits/64`` groups; the final fold to one row touches only those
    ≤ m_bits/64 rows (never the data), so no one-task stage over the input.
    """
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("mask"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("bloom"))
    )


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """probe rows whose key MIGHT be in the bloom'd key set (no false
    negatives).  Pure column expressions against the broadcast 1-row map."""
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        word = F.coalesce(
            F.element_at(F.col("bloom"), F.shiftright(pos, 6)),
            F.lit(0).cast("long"),
        )
        bit = F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64({key_col}, {i}), {m_bits})"
            " % 64 AS INT))"
        )
        tests.append(word.bitwiseAND(bit) != 0)
    return (
        probe.crossJoin(F.broadcast(bloom))
        .filter(reduce(lambda a, b: a & b, tests))
        .drop("bloom")
    )
