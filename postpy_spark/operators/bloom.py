"""Bloom-filter semi-join pruning.

At 100 TB the classic "keep fact rows whose key appears in a big dimension
subset" semi join shuffles the ENTIRE fact side before the join can drop
anything.  A Bloom filter of the build-side keys is fixed-size (``m_bits``,
default 64 Kibit = 8 KiB) no matter how many keys it summarizes, so it can
always ship to every task: the fact scan drops non-members *before* the
shuffle and only candidates (true members + the false-positive rate) reach
the exact confirm join.  This is the explicit, parameterized form of
Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter``, Spark 3.3+) — same LSH-style
contract as ``operators/similarity.py``: a cheap over-approximate candidate
pass, then exact verification, so the composition is exactly equal to the
plain semi join.

Shapes:

- build: one explode (k positions per key) + one PARTIAL-AGGREGATED
  ``groupBy(word).bit_or(bit)`` bounded at ``m_bits/64`` groups, then a
  driver collect of those ≤ m_bits/64 longs — the same bounded-driver-state
  pattern as the PCA Gram reduction (operators/linalg.py) and PQ codebooks
  (operators/pq.py): driver memory ∝ sketch size, never data size.
- probe: the bitmap is inlined as a LITERAL array in a plain Filter, so it
  sits directly on the scan where predicate pushdown/codegen keep it, and
  no join reordering can hoist it above the confirm join's exchange (a
  broadcast-1-row crossJoin variant was tried first: Catalyst legally
  reordered the BNLJ above the semi join, turning the bloom into a
  post-filter).  False positives are possible, false negatives are not.
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
) -> list[int]:
    """The filter's ``m_bits/64`` words as a Python list (dense, zero-filled).

    The word aggregation is a normal partial-agg shuffle bounded at
    ``m_bits/64`` groups; only those rows reach the driver.
    """
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    rows = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r.w] = r.mask
    return words


def bloom_might_contain(
    key_col: str, words: list[int], m_bits: int = 1 << 16, k: int = _DEFAULT_K
) -> Column:
    """Boolean column: key MIGHT be in the bloom'd set (no false
    negatives).  Pure JVM expressions over the literal bitmap — stays a
    scan-adjacent Filter inside whole-stage codegen."""
    arr = F.lit(words)
    tests = []
    for i in range(k):
        # One hash derivation: word index AND bit index both come from
        # this single pos Column (bit_get takes a Column position, so no
        # f-string re-derivation that could drift — r7 advice).
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        tests.append(F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1)
    return reduce(lambda a, b: a & b, tests)


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = 1 << 16,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """probe rows passing the bloom membership test."""
    return probe.filter(bloom_might_contain(key_col, words, m_bits, k))
