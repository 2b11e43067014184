"""Mergeable quantile sketch (KLL-style compactor hierarchy; Karnin,
Lang & Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016 —
the simplified equal-capacity variant, which keeps the mergeability and
O(k·log(n/k)) size with a slightly looser constant on the rank error).

Why this exists next to ``approx_percentile`` (agg_approx_quantile): the
built-in must SEE the raw rows, while a KLL sketch row is a persistable,
addable artifact — build one per shard/day (bounded: levels·k doubles),
store them, and answer quantiles over any UNION of shards later by merging
sketches, never re-reading the data.  That is the same shard-rollup
contract as the HLL/KMV/CMS/bitmap kit (operators/sketch.py).

Scale design: the only corpus-sized pass is one ``mapInPandas`` sweep that
streams Arrow batches through a constant-memory compactor and emits ONE
sketch row per input partition.  Merging is driver-side over
#partitions-many bounded sketches — the same bounded-reduction pattern as
the Gram-partial PCA (operators/linalg.py).

Determinism: compaction drops odd- or even-indexed items; the choice is
drawn from a hash-seeded ``random.Random`` so a fixed seed gives a
reproducible sketch for a fixed partitioning (tests pin bounds, not bits —
the estimator is probabilistic by nature, like the MinHash family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kll_core():
    """Pure-Python compactor, function-scope so mapper closures pickle it
    BY VALUE (tests/test_pickle_isolation.py contract).

    A sketch is ``[level0, level1, ...]``: level i holds UNSORTED floats
    of weight 2**i; every level is capped at k items."""

    def compact_once(levels, k, rng):
        # compact the lowest level over capacity: sort, keep a random
        # parity, promote survivors (weight doubles) to the next level
        for i, lv in enumerate(levels):
            if len(lv) > k:
                lv.sort()
                keep = lv[rng.randrange(2) :: 2]
                del levels[i][:]
                if i + 1 == len(levels):
                    levels.append([])
                levels[i + 1].extend(keep)
                return True
        return False

    def insert_many(levels, xs, k, rng):
        if not levels:
            levels.append([])
        for x in xs:
            levels[0].append(float(x))
            if len(levels[0]) > k:
                while compact_once(levels, k, rng):
                    pass
        return levels

    def merge(a, b, k, rng):
        out = [list(lv) for lv in a]
        while len(out) < len(b):
            out.append([])
        for i, lv in enumerate(b):
            out[i].extend(lv)
        while compact_once(out, k, rng):
            pass
        return out

    def weighted_items(levels):
        return [
            (x, 1 << i) for i, lv in enumerate(levels) for x in lv
        ]

    def quantiles(levels, qs):
        items = sorted(weighted_items(levels))
        total = sum(w for _, w in items)
        if not items:
            return [None for _ in qs]
        out = []
        for q in qs:
            target = q * total
            cum = 0
            val = items[-1][0]
            for x, w in items:
                cum += w
                if cum >= target:
                    val = x
                    break
            out.append(val)
        return out

    return insert_many, merge, quantiles


def kll_build(df: DataFrame, value_col: str, k: int = 200, seed: int = 42) -> DataFrame:
    """One KLL sketch row PER INPUT PARTITION:
    ``(n_items bigint, levels array<array<double>>)``.

    Streams every Arrow batch of the partition through the compactor —
    memory is O(k·log(n/k)) regardless of partition size — and yields a
    single bounded row, the persistable shard artifact."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    core = _kll_core()

    def mapper(batches):
        import pandas as pd
        import random

        insert_many, _merge, _q = core
        rng = random.Random(seed)
        levels: list = []
        n = 0
        for pdf in batches:
            vals = pdf[value_col].dropna()
            n += len(vals)
            insert_many(levels, vals.tolist(), k, rng)
        if n:
            yield pd.DataFrame({"n_items": [n], "levels": [levels]})

    schema = StructType(
        [
            StructField("n_items", LongType()),
            StructField("levels", ArrayType(ArrayType(DoubleType()))),
        ]
    )
    return df.select(F.col(value_col).cast("double").alias(value_col)).mapInPandas(
        mapper, schema
    )


def kll_merge_quantiles(
    sketches: DataFrame, qs: list[float], k: int = 200, seed: int = 42
):
    """Merge bounded sketch rows driver-side and answer ``qs``.

    Returns ``(estimates, n_total)`` — estimates is a Python list aligned
    with qs.  The collect is #shards × O(k·log) doubles: the bounded
    driver reduction every sketch kit ends in."""
    import random

    _ins, merge, quantiles = _kll_core()
    rng = random.Random(seed)
    rows = sketches.collect()
    acc: list = []
    n = 0
    for r in rows:
        acc = merge(acc, [list(lv) for lv in r["levels"]], k, rng)
        n += r["n_items"]
    if n == 0:
        # kll_build emits NO sketch rows for an all-empty/all-null input;
        # without this guard quantiles() would return [None]*len(qs) and
        # callers crash later on float(None) — a confusing TypeError far
        # from the cause.  Fail here with the real reason instead.
        raise ValueError(
            "kll_merge_quantiles: no sketch rows to merge (empty or "
            "all-null input column — no quantiles are defined)"
        )
    return quantiles(acc, qs), n
