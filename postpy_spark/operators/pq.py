"""Product-quantization ANN (SURVEY.md §2.D scale path; Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

PQ compresses each d-dim vector into ``m`` one-byte codes (one per
subspace), so a 100 TB float corpus becomes a ~1.5 TB code table that fits
hot storage; queries scan codes with asymmetric-distance (ADC) lookups and
exact-rerank only a small shortlist.

Spark mapping:

- **train**: codebooks are seeded from a ``TakeOrderedAndProject`` sample
  (no global sort / one-task stage) and refined with Lloyd iterations whose
  only full-corpus pass is a narrow Arrow-batched encode; the per-cell mean
  is a (m x ks x sub_dim)-bounded aggregate — never corpus-sized state.
- **encode**: one vectorized pandas UDF (numpy broadcast argmin over the
  codebook) — the codebook ships INSIDE the closure (by value, bounded at
  m*ks*sub_dim doubles), so workers need no repo import and no join.
- **score**: ADC is pure JVM: per-query LUTs are built with higher-order
  functions on the (small, broadcast) query side, and each candidate costs
  ``m`` array lookups — whole-stage-codegen friendly, no Python in the
  corpus-sized path.
- **rerank**: exact cosine on the ADC top-``shortlist`` only (the standard
  ADC+rerank recipe), so recall is set by the shortlist, not by raw code
  resolution.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from postpy_spark.operators.similarity import cosine_expr, norm_expr


def unit_col(vec):
    """vec scaled to unit L2 norm (zero vectors pass through unchanged).
    For unit vectors L2² = 2 - 2·cosine, so ADC's L2 ranking matches the
    cosine truth the rerank and recall gates use.  The norm is let-bound
    via the transform(array(...)) trick — a bare HOF lambda would
    re-evaluate the norm fold per element (no CSE across lambdas)."""
    return F.element_at(
        F.transform(
            F.array(norm_expr(vec)),
            lambda n: F.when(
                n > 0, F.transform(vec, lambda x: x.cast("double") / n)
            ).otherwise(F.transform(vec, lambda x: x.cast("double"))),
        ),
        1,
    )


def _l2sq_expr(a, b):
    """Σ (aᵢ-bᵢ)² in double precision (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _seed_codebook(
    corpus: DataFrame, m: int, ks: int, id_col: str, vec_col: str, seed: int
) -> np.ndarray:
    """(m, ks, sub_dim) codebook from a deterministic pseudo-random sample:
    order by salted xxhash64, keep ``ks`` vectors (TakeOrderedAndProject —
    partition-local top-ks, driver merges ks rows), slice into subspaces."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(ks)
        .collect()
    )
    if not rows:
        raise ValueError("PQ codebook seeding needs a non-empty corpus")
    # A corpus smaller than ks (small scale tiers, aggressively filtered
    # inputs) simply trains fewer centroids — downstream reads ks from the
    # codebook's shape, so clamping here is the whole fix.
    ks = min(ks, len(rows))
    sample = np.array([r["v"] for r in rows], dtype="float64")  # (ks, d)
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    # codebook[j, c] = subspace-j slice of sampled vector c
    return sample.reshape(ks, m, sub).transpose(1, 0, 2).copy()


def _encode_fn(codebook: np.ndarray):
    """Vectorized encoder body: pd.Series of vectors -> pd.Series of m-code
    lists.  The codebook array is captured IN the closure (pickled by
    value — tests/test_pickle_isolation.py pins this)."""
    cb = codebook.copy()  # (m, ks, sub)
    m, ks, sub = cb.shape

    def encode(batch):
        import numpy as np
        import pandas as pd

        out = []
        for v in batch:
            x = np.asarray(v, dtype="float64").reshape(m, 1, sub)
            # (m, ks) squared distances via broadcasting, argmin per subspace
            d2 = ((x - cb) ** 2).sum(axis=2)
            out.append(d2.argmin(axis=1).astype("int32").tolist())
        return pd.Series(out)

    return encode


def _encode_udf(codebook: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_encode_fn(codebook), "array<int>")


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iter: int = 1,
) -> np.ndarray:
    """Train per-subspace codebooks: sampled seeding + ``n_iter`` Lloyd
    rounds.  Each round = one narrow encode pass over the corpus plus a
    per-(subspace, code, dim) mean whose state is bounded at m*ks*sub_dim
    cells; empty cells keep their previous centroid."""
    cb = _seed_codebook(corpus, m, ks, id_col, vec_col, seed)
    sub = cb.shape[2]
    for _ in range(n_iter):
        enc = corpus.select(
            F.col(vec_col).alias("v"), _encode_udf(cb)(F.col(vec_col)).alias("codes")
        )
        dims = enc.select(F.posexplode("v").alias("pos", "val"), "codes").select(
            (F.col("pos") / sub).cast("int").alias("j"),
            F.pmod(F.col("pos"), F.lit(sub)).alias("p"),
            F.element_at(F.col("codes"), (F.col("pos") / sub).cast("int") + 1).alias(
                "code"
            ),
            F.col("val").cast("double").alias("val"),
        )
        means = dims.groupBy("j", "code", "p").agg(F.avg("val").alias("m")).collect()
        new_cb = cb.copy()
        for r in means:
            new_cb[r["j"], r["code"], r["p"]] = r["m"]
        cb = new_cb
    return cb


def pq_encode(
    corpus: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """corpus + ``codes`` (array<int>, length m): the compressed
    representation — at scale THIS is what you persist and scan."""
    return corpus.withColumn("codes", _encode_udf(codebook)(F.col(vec_col)))


def _lut_col(qv, codebook: np.ndarray):
    """Per-query ADC lookup table: array of m arrays of ks squared
    distances from the query's subvector to each centroid — built with
    JVM-side folds over literal centroid arrays (query side is small)."""
    m, ks, sub = codebook.shape
    luts = []
    for j in range(m):
        qsub = F.slice(qv, j * sub + 1, sub)
        luts.append(
            F.array(
                *[
                    _l2sq_expr(
                        qsub, F.array(*[F.lit(float(w)) for w in codebook[j, c]])
                    )
                    for c in range(ks)
                ]
            )
        )
    return F.array(*luts)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 32,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iter: int = 2,
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC approximate k-NN with exact rerank.

    Corpus-sized work: one encode pass (Arrow) + one broadcast scan doing
    ``m`` array lookups per (candidate, query) — no shuffle until the
    per-query shortlist window, which AQE keeps small.  The exact cosine
    runs on ``shortlist`` candidates per query only."""
    # normalize once up front: codes, LUTs, and shortlist all live in the
    # unit sphere where L2 ranking == cosine ranking; the exact rerank is
    # scale-invariant anyway
    corpus_n = corpus.withColumn(vec_col, unit_col(F.col(vec_col)))
    queries_n = queries.withColumn(vec_col, unit_col(F.col(vec_col)))
    if codebook is None:
        codebook = pq_train(corpus_n, m, ks, id_col, vec_col, seed, n_iter)
    encoded = pq_encode(corpus_n, codebook, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "codes"
    )
    q = queries_n.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _lut_col(F.col(vec_col), codebook).alias("lut"),
    )
    scored = encoded.join(
        broadcast(q), F.col("query_id") != F.col("cand_id")
    ).withColumn(
        "adc",
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("lut"),
                lambda c, lut: F.element_at(lut, c + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("cand_id"))
    short = scored.withColumn("_srn", F.row_number().over(ws)).filter(
        F.col("_srn") <= shortlist
    )
    rer = short.select(
        "query_id",
        "cand_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
