"""Product-quantization ANN (SURVEY.md §2.D scale path; Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

PQ compresses each d-dim vector into ``m`` one-byte codes (one per
subspace), so a 100 TB float corpus becomes a ~1.5 TB code table that fits
hot storage; queries scan codes with asymmetric-distance (ADC) lookups and
exact-rerank only a small shortlist.

Spark mapping:

- **train**: codebooks are seeded from a ``TakeOrderedAndProject`` sample
  (no global sort / one-task stage) and refined with Lloyd iterations whose
  only full-corpus pass is the narrow JVM encode; the per-cell mean is a
  (m x ks x sub_dim)-bounded aggregate — never corpus-sized state.
- **encode**: an Arrow-vectorized ``mapInPandas`` OPERATOR (numpy
  broadcast argmin over the codebook; the codebook ships inside the
  closure, bounded at m*ks*sub_dim doubles).  An operator, not a scalar
  pandas UDF in a projection — see ``_with_codes`` for the Spark 4.1
  extraction hazard that rules the UDF form out.  (A pure-Column HOF
  encoder was tried and is ~4x slower at sf0.1: 256 interpreted
  aggregate-folds per row lose to one Arrow batch.)
- **score**: per-query LUTs are computed Arrow-vectorized on the (small,
  broadcast) query side (``_with_lut``); the corpus-sized ADC scan is pure
  JVM — each candidate costs ``m`` array lookups inside a zip_with fold,
  whole-stage-codegen friendly.  (A pure-Column LUT built from m*ks
  ``aggregate`` folds over literal centroid arrays was tried first: the
  driver spent ~10 s per invocation in py4j just CONSTRUCTING the ~2k-node
  expression tree, dwarfing execution at any scale.)
- **rerank**: exact cosine on the ADC top-``shortlist`` only (the standard
  ADC+rerank recipe), so recall is set by the shortlist, not by raw code
  resolution.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from postpy_spark.operators.similarity import cosine_expr, dot_expr, unit_col

__all__ = ["pq_train", "pq_encode", "pq_topk", "ivfpq_topk", "unit_col"]


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


def _make_encode_mapper(codebook: np.ndarray, vec_col: str):
    """mapInPandas body: passes every input column through and appends
    ``codes`` (numpy broadcast argmin over the codebook, first-minimum
    tie-break).  Vectorized across the Arrow batch in 1024-row chunks —
    the (chunk, m, ks, sub) distance tensor stays ~16 MB while the whole
    batch computes in a handful of numpy kernels instead of a Python
    per-row loop (the r8 shape; ~10× slower on large batches).  The
    arithmetic is EXACTLY ``((x - cb) ** 2).sum`` per subspace, so codes
    (incl. ties) are bit-identical to the per-row reference the tests pin.
    Function-scope so cloudpickle ships it BY VALUE — the worker never
    imports postpy_spark (tests/test_pickle_isolation.py)."""
    cb = codebook.copy()  # (m, ks, sub)
    m, ks, sub = cb.shape

    def mapper(batches):
        import numpy as np

        for pdf in batches:
            out: list = []
            vals = pdf[vec_col].to_numpy()
            for lo in range(0, len(pdf), 1024):
                chunk = vals[lo : lo + 1024]
                if not len(chunk):
                    continue
                x = np.stack([np.asarray(v, dtype="float64") for v in chunk])
                x = x.reshape(len(chunk), m, 1, sub)
                d2 = ((x - cb) ** 2).sum(axis=3)  # (chunk, m, ks)
                out.extend(d2.argmin(axis=2).astype("int32").tolist())
            pdf = pdf.copy()
            pdf["codes"] = out
            yield pdf

    return mapper


def _make_lut_mapper(codebook: np.ndarray, vec_col: str):
    """mapInPandas body for the QUERY side: appends ``lut`` —
    ``array<array<double>>`` of shape (m, ks), the squared distance from
    the query's j-th subvector to every centroid of subspace j.  Same
    function-scope pickle-by-value rule as the encode mapper."""
    cb = codebook.copy()  # (m, ks, sub)
    m, ks, sub = cb.shape

    def mapper(batches):
        import numpy as np

        for pdf in batches:
            out: list = []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype="float64").reshape(m, 1, sub)
                out.append(((x - cb) ** 2).sum(axis=2).tolist())  # (m, ks)
            pdf = pdf.copy()
            pdf["lut"] = out
            yield pdf

    return mapper


def _with_lut(df: DataFrame, codebook: np.ndarray, vec_col: str) -> DataFrame:
    """df + ``lut`` (array<array<double>>, m × ks) via ``mapInPandas`` —
    queries are broadcast-small, so this is one tiny Arrow batch; see the
    module docstring for why this replaced a pure-Column LUT."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [StructField("lut", ArrayType(ArrayType(DoubleType())))]
    )
    return df.mapInPandas(_make_lut_mapper(codebook, vec_col), schema)


def _with_codes(df: DataFrame, codebook: np.ndarray, vec_col: str) -> DataFrame:
    """df + ``codes`` (array<int>, length m) via ``mapInPandas``.

    Deliberately an OPERATOR, not a scalar pandas UDF in a projection: a
    Spark 4.1 planner edge let the UDF-in-Project form escape
    ArrowEvalPython extraction when the input was a cached InMemoryRelation
    fragment, crashing with INTERNAL_ERROR "Cannot evaluate expression:
    encode(...)" at runtime.  MapInPandas is a standalone plan node the
    optimizer can never inline into a projection, with the same
    Arrow-vectorized execution."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    # A fresh StructType: StructType.add MUTATES, and df.schema is the
    # DataFrame's cached schema object — mutating it desyncs df.columns
    # from the JVM plan (mapInPandas then resolves a phantom column).
    schema = StructType(
        list(df.schema.fields)
        + [StructField("codes", ArrayType(IntegerType()))]
    )
    return df.mapInPandas(_make_encode_mapper(codebook, vec_col), schema)


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
        enc = _with_codes(corpus.select(F.col(vec_col).alias("v")), cb, "v")
        # One (j, code, subvector) row PER SUBSPACE — m rows per vector,
        # not d (an earlier per-dimension posexplode made d/m times the
        # rows for the same aggregate); per-dimension sums are sub agg
        # columns, the mean divides driver-side over m*ks rows.
        segs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.element_at(F.col("codes"), j + 1).alias("code"),
                    F.slice(F.col("v"), j * sub + 1, sub).alias("sv"),
                )
                for j in range(m)
            ]
        )
        sums = (
            enc.select(F.explode(segs).alias("s"))
            .select("s.j", "s.code", "s.sv")
            .groupBy("j", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at(F.col("sv"), p + 1).cast("double")).alias(
                        f"s{p}"
                    )
                    for p in range(sub)
                ],
            )
            .collect()
        )
        new_cb = cb.copy()
        for r in sums:
            for p in range(sub):
                new_cb[r["j"], r["code"], p] = r[f"s{p}"] / r["n"]
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
    return _with_codes(corpus, codebook, vec_col)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 32,
    shortlist: int = 150,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iter: int = 2,
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC approximate k-NN with exact rerank.

    Corpus-sized work: one JVM encode pass + one broadcast scan doing
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
    # The corpus-sized ADC scan and the shortlist window carry ONLY
    # (cand_id, codes, query_id, adc): the d-float candidate vector and the
    # query vector never enter the scan rows or the window shuffle (codes
    # are m bytes; the vectors would be ~d*8 bytes per (candidate, query)
    # row).  Exact-rerank payloads join back onto the shortlist, which is
    # |queries|*shortlist rows — broadcastable by construction.
    encoded = pq_encode(corpus_n, codebook, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), "codes"
    )
    q = _with_lut(
        queries_n.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ),
        codebook,
        "_qv",
    ).select("query_id", "lut")
    scored = encoded.join(
        broadcast(q), F.col("query_id") != F.col("cand_id")
    ).select(
        "query_id",
        "cand_id",
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("lut"),
                lambda c, lut: F.element_at(lut, c + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("adc"),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("cand_id"))
    short = scored.withColumn("_srn", F.row_number().over(ws)).filter(
        F.col("_srn") <= shortlist
    )
    # Broadcasting the shortlist side is safe because the encode pass is a
    # MapInPandas OPERATOR (see _with_codes) — the hazard was a scalar
    # pandas UDF escaping extraction inside the BroadcastExchange build
    # projection.  The hint keeps the corpus from ever being shuffled for
    # the rerank: at scale the corpus side streams once against the
    # |queries|*shortlist-row hashed relation.
    short_q = broadcast(
        short.select("query_id", "cand_id").join(
            broadcast(
                queries_n.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
                )
            ),
            "query_id",
        )
    )
    rer = (
        short_q
        .join(
            corpus_n.select(
                F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
            ),
            "cand_id",
        )
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 32,
    shortlist: int = 200,
    n_cells: int = 32,
    n_probe: int = 28,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iter: int = 2,
) -> DataFrame:
    """IVF-PQ approximate k-NN — the composition every billion-vector ANN
    system actually deploys (FAISS ``IVFx,PQy``; Jégou et al. 2011 §V):
    the IVF coarse quantizer ROUTES each query to ``n_probe`` cells so
    only that fraction of the corpus is touched, PQ codes make the touched
    candidates ``m`` bytes instead of ``d`` floats, and the exact cosine
    runs on the ADC top-``shortlist`` only.

    Work per query at scale: |corpus| * (n_probe / n_cells) candidate rows
    scanned as m-byte codes (JVM zip_with fold over the broadcast LUT), a
    per-query shortlist window, and ``shortlist`` exact reranks.  The two
    corpus-sized passes (cell assignment, encode) are query-independent
    index-build work — at 100 TB you persist ``(cell_id, codes)`` once and
    amortize across every query batch (pq_encode's contract).

    Codes are non-residual (global codebook, not per-cell residual
    encoding): one LUT per query instead of n_probe LUTs, at a recall cost
    the exact rerank absorbs — the honest simplification for a LUT that
    must stay broadcast-sized.
    """
    from postpy_spark.operators.similarity import ivf_build, ivf_refine

    corpus_n = corpus.withColumn(vec_col, unit_col(F.col(vec_col)))
    queries_n = queries.withColumn(vec_col, unit_col(F.col(vec_col)))
    centroids, assigned = ivf_build(corpus_n, n_cells, id_col, vec_col, seed)
    if refine_iters:
        centroids, assigned = ivf_refine(
            corpus_n, centroids, refine_iters, id_col, vec_col
        )
    codebook = pq_train(corpus_n, m, ks, id_col, vec_col, seed, n_iter)
    encoded = _with_codes(assigned, codebook, vec_col).select(
        F.col(id_col).alias("cand_id"), "cell_id", "codes"
    )
    # probe: per query the n_probe max-cosine cells (broadcast argmax over
    # the n_cells-row centroid frame — identical shape to ivf_topk's)
    q = queries_n.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    # dot against unit centroids == cosine ranking per query (|q| constant)
    cn = centroids.select("cell_id", unit_col(F.col("cv")).alias("_ucv"))
    qc = q.crossJoin(broadcast(cn)).select(
        "query_id", "cell_id", dot_expr(F.col("_qv"), F.col("_ucv")).alias("_sim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell_id"))
    probed = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "cell_id")
    )
    q_lut = _with_lut(q, codebook, "_qv").select("query_id", "lut")
    # candidates: only codes in probed cells; the (query, lut) side is
    # |queries| * n_probe rows of m*ks doubles — broadcast-sized
    cand = encoded.join(
        broadcast(probed.join(q_lut, "query_id")), "cell_id"
    ).filter(F.col("query_id") != F.col("cand_id"))
    scored = cand.select(
        "query_id",
        "cand_id",
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("lut"), lambda c, lut: F.element_at(lut, c + 1)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("adc"),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("cand_id"))
    short = scored.withColumn("_srn", F.row_number().over(ws)).filter(
        F.col("_srn") <= shortlist
    )
    short_q = broadcast(
        short.select("query_id", "cand_id").join(
            broadcast(
                queries_n.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
                )
            ),
            "query_id",
        )
    )
    rer = short_q.join(
        corpus_n.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")),
        "cand_id",
    ).select(
        "query_id",
        "cand_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
