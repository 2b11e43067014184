"""Count-min sketch as a DISTRIBUTED DataFrame (SURVEY.md §2.B3 extras).

The sketch is not a driver-side object: it IS a (row, bucket, cnt) frame of
``depth × width`` counters, built with one explode + one groupBy (map-side
partial aggregation collapses each partition to ≤ depth·width rows before
the shuffle — the mergeable-summary pattern shared with the Misra-Gries
heavy-hitters path in :mod:`postpy_spark.operators.dedup`).  Point
frequency estimates are a bucket equi-join + MIN, never a driver loop.

Mergeability — THE property that makes CMS useful at 100 TB (per-shard /
per-day sketches combine by elementwise counter addition) — falls out of
the representation: union the counter frames and re-aggregate with SUM.
Cormode & Muthukrishnan, J. Algorithms 55(1), 2005.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: xxhash64 seed pinning the hash family; row index j is hashed in as a
#: column so the d rows are d independent functions of the same family.
_SEED = 42


def _bucket(key_col, j_col, width: int):
    return F.pmod(F.xxhash64(key_col, j_col, F.lit(_SEED)), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(j, bucket, cnt): the depth×width counter matrix as a DataFrame.

    One narrow explode (×depth) then one groupBy — partial aggregation
    bounds the shuffle at depth·width rows per map task regardless of
    input size.
    """
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    return (
        df.select(F.col(key_col).alias("k"), j)
        .groupBy("j", _bucket(F.col("k"), F.col("j"), width).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise counter addition — sketch of a union of streams."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est): min over the d probed counters — the classic CMS point
    query, as a broadcast-probe equi-join on (j, bucket).  ``est`` is an
    overestimate-never-underestimate of the true frequency."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    p = probes.select(F.col(key_col).alias("key"), j).select(
        "key", "j", _bucket(F.col("key"), F.col("j"), width).alias("bucket")
    )
    return (
        p.join(sketch, ["j", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------


def kmv_unit_hash(col):
    """xxhash64 mapped to a uniform double in (0, 1)."""
    return (F.xxhash64(col, F.lit(_SEED)).cast("double") + F.lit(2.0**63)) / F.lit(
        2.0**64
    )


def kmv_build(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """The k smallest unit hashes of the DISTINCT keys — a k-row frame.
    TakeOrderedAndProject computes the global k-min without a one-task
    window; the distinct is one shuffle.  Mergeable: union two sketches,
    re-take the k smallest (Beyer et al., SIGMOD'07)."""
    return (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .select(kmv_unit_hash(F.col("key")).alias("u"))
        .orderBy("u")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Sketch of the union of the underlying key sets."""
    return a.unionByName(b).distinct().orderBy("u").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """1-row (est, n_hashes): (k-1)/u_(k) when the sketch is full, else
    the sketch size itself (fewer than k distinct keys seen → exact)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("u").alias("u_max")
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("u_max"))
    return agg.select(
        F.round(est).cast("bigint").alias("est"),
        F.col("n_hashes").cast("bigint").alias("n_hashes"),
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """1-row (union_est, intersect_est, jaccard) from two KMV sketches —
    the theta-sketch trick (Dasgupta et al., 2016): take the k smallest
    hashes of the UNION, measure what fraction appears in BOTH input
    sketches (that fraction is an unbiased Jaccard estimate, since the
    k-min of the union is a uniform sample of the union), then scale the
    union cardinality estimate.  All frame sizes are ≤ 2k rows."""
    u = kmv_merge(a, b, k=k)
    flagged = (
        u.join(a.withColumnRenamed("u", "ua"), u.u == F.col("ua"), "left")
        .join(b.withColumnRenamed("u", "ub"), u.u == F.col("ub"), "left")
        .select(
            "u",
            (F.col("ua").isNotNull() & F.col("ub").isNotNull()).cast("int").alias(
                "in_both"
            ),
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("u").alias("u_max"),
        F.sum("in_both").alias("n_both"),
    )
    union_est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("u_max"))
    jacc = F.col("n_both") / F.col("n_hashes")
    return agg.select(
        F.round(union_est).cast("bigint").alias("union_est"),
        F.round(union_est * jacc).cast("bigint").alias("intersect_est"),
        F.round(jacc, 6).alias("jaccard"),
    )
