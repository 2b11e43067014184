"""Distributed linear algebra for embedding columns (SURVEY.md §2.D extras).

PCA without MLlib/RDDs: the classic Gram-partial pattern —

1. one ``mapInPandas`` pass emits a single (count, sum, X^T X) partial per
   Arrow-batch stream (a length 1+d+d² double array per partition);
2. the partials are reduced DISTRIBUTED (posexplode → groupBy position →
   sum), so no executor ever holds more than d² doubles and the driver
   only ever sees the d²-bounded reduced array (d ≪ n by assumption —
   for d=64 that is 33 KB regardless of corpus size);
3. the d×d eigendecomposition runs on the driver (O(d³), microseconds);
4. the k×d component matrix broadcasts back and a second Arrow pass
   projects.

At 100 TB this is two linear passes over the data and one d²-row shuffle —
the same shape ``summary statistics`` uses.  Sign convention: each
component's largest-|coordinate| entry is made positive, so downstream
consumers see a deterministic basis (eigh is sign-ambiguous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per partition: array [n, s_0..s_{d-1}, g_00..g_{dd}]."""

    def partial(batches):
        import numpy as np
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if s is None:
                d = X.shape[1]
                s, g = np.zeros(d), np.zeros((d, d))
            n += X.shape[0]
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"partial": [[float(n)] + s.tolist() + g.flatten().tolist()]}
            )

    return df.select(vec_col).mapInPandas(partial, "partial ARRAY<DOUBLE>")


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Fit PCA on an embedding column; returns (mean: np.ndarray[d],
    components: np.ndarray[k,d], explained_variance: np.ndarray[k]).

    The only driver-side materialization is the REDUCED moment vector
    (1+d+d² doubles) — bounded by dimension, not data size."""
    import numpy as np

    reduced = (
        _gram_partials(df, vec_col)
        .select(F.posexplode("partial").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    moments = np.zeros(len(reduced))
    for r in reduced:
        moments[r.pos] = r.v
    n = moments[0]
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {int(n)}")
    d = int(round((-1 + (1 + 4 * (len(moments) - 1)) ** 0.5) / 2))
    mean = moments[1 : 1 + d] / n
    gram = moments[1 + d :].reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    # deterministic sign: largest-|coordinate| entry positive per component
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, pca: array<double>[k]) — fit + project in one call.  The
    component matrix rides to executors inside the Arrow UDF closure
    (k×d doubles; broadcast-sized by construction)."""
    mean, comps, _ = fit_pca(df, vec_col, k)
    m_list, c_list = mean.tolist(), comps.tolist()
    keep = keep_cols or []

    def project(batches):
        import numpy as np
        import pandas as pd

        M = np.array(m_list)
        W = np.array(c_list)  # k × d
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - M) @ W.T
            out = {id_col: pdf[id_col]}
            for c in keep:
                out[c] = pdf[c]
            out["pca"] = list(P)
            yield pd.DataFrame(out)

    in_schema = df.select(id_col, *keep, vec_col)
    keep_schema = "".join(
        f", {c} {in_schema.schema[c].dataType.simpleString()}" for c in keep
    )
    id_type = in_schema.schema[id_col].dataType.simpleString()
    return in_schema.mapInPandas(
        project, f"{id_col} {id_type}{keep_schema}, pca ARRAY<DOUBLE>"
    )


def logreg_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 8,
    ridge: float = 1e-9,
) -> tuple[list[float], int]:
    """Binary logistic regression fit by IRLS (Fisher scoring) —
    "ML training as one aggregate per iteration", the GLM sibling of the
    closed-form OLS query.

    Each Newton step solves (Xᵀ W X + λI) β = Xᵀ W z with w = p(1−p) and
    working response z = η + (y−p)/w.  All (k+1)(k+4)/2 weighted moment
    sums (k features + intercept) come out of ONE partial-aggregable
    JVM-side pass — w, z are closed-form column expressions of the
    broadcast-as-literal current β — and the driver solves only the
    (k+1)×(k+1) system (numpy, microseconds).  Nothing data-sized ever
    reaches the driver; per-iteration cost is one scan + one scalar
    aggregate, the exact shape a 1000-executor cluster wants.

    Returns (beta, n) with beta = [intercept, b_1..b_k].  p is clamped to
    [1e-12, 1−1e-12] so a separable direction cannot produce w = 0 /
    infinite z inside the aggregate.
    """
    import numpy as np

    k = len(feature_cols)
    names = ["__one"] + list(feature_cols)
    beta = [0.0] * (k + 1)
    base = df.select(
        F.lit(1.0).alias("__one"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    n = -1
    for _ in range(n_iter):
        eta = F.lit(beta[0]) * F.col("__one")
        for i, c in enumerate(feature_cols):
            eta = eta + F.lit(beta[i + 1]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        p = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        w = p * (F.lit(1.0) - p)
        z = eta + (F.col("__y") - p) / w
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i in range(k + 1):
            for j in range(i, k + 1):
                aggs.append(
                    F.sum(w * F.col(names[i]) * F.col(names[j])).alias(f"h_{i}_{j}")
                )
            aggs.append(F.sum(w * F.col(names[i]) * z).alias(f"g_{i}"))
        row = base.agg(*aggs).first()
        n = row["__n"]
        H = np.zeros((k + 1, k + 1))
        g = np.zeros(k + 1)
        for i in range(k + 1):
            for j in range(i, k + 1):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
            g[i] = row[f"g_{i}"]
        beta = list(np.linalg.solve(H + ridge * np.eye(k + 1), g))
    return [float(b) for b in beta], int(n)
