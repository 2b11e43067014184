"""Deterministic content-hash sampling (SURVEY.md §2.D extras).

``F.rand(seed)`` is only partition-deterministic: the draw for a row is a
function of (seed, partitionIndex, row position), so a repartition, an AQE
re-coalesce, or a retried task that reads its input in a different order
RESAMPLES the corpus.  At 100 TB with speculative execution and
stage retries that is a silent correctness hazard — two runs of "the same"
sampled dataset differ, and a retried partition can double-include or drop
rows relative to its sibling attempt.

Content-hash draws fix this: ``u = pmod(xxhash64(key, seed), M) / M`` is a
pure function of the ROW (its stable key) and the seed — invariant under
partitioning, ordering, retries, cluster size, and Spark version of the
shuffle.  The price is that the draw is only as uniform as xxhash64 (fine)
and requires a stable key column (any unique id; at worst hash the
payload).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def stable_uniform(key: Column, seed: int = 0) -> Column:
    """U[0,1) as a pure function of (key, seed) — partition-invariant."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_M)) / F.lit(float(_M))


def sample_stable(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Bernoulli(fraction) sample that survives repartition/retry: a row is
    in or out based only on its key — unlike ``df.sample`` / ``rand(seed)``
    whose draws move with the partition layout."""
    return df.filter(stable_uniform(F.col(key_col), seed) < fraction)


def sample_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target_share: dict[str, float] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Rebalance a corpus toward a target group mixture (the data-mixture
    step before training): per-group keep-rates are computed from the
    group's actual share vs its target share (uniform across observed
    groups when ``target_share`` is None), capped at 1 (no upsampling),
    and applied with the stable content-hash draw.

    One aggregate over group counts (tiny — |groups| rows, broadcast back)
    plus one narrow filter pass: no shuffle of the data itself."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(
        F.sum("_n").alias("_total"), F.count(F.lit(1)).alias("_groups")
    )
    rates = counts.join(F.broadcast(total))
    if target_share is None:
        tgt = F.col("_total") / F.col("_groups")
    else:
        mapping = F.create_map(
            *[x for kv in target_share.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )
        tgt = mapping[F.col(group_col)] * F.col("_total")
    rates = rates.select(
        group_col,
        F.least(F.lit(1.0), tgt / F.col("_n")).alias("_keep_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(stable_uniform(F.col(key_col), seed) < F.col("_keep_rate"))
        .drop("_keep_rate")
    )
