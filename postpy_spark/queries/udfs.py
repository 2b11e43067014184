"""Group E — UDF/UDAF/UDTF surface (SURVEY.md §2.E).

postpy does record munging in plain Python between cursor fetches [U]; the
Spark equivalents span the full extension ladder: row-at-a-time Python UDF
(slowest, shown once), Arrow-vectorized pandas UDFs, grouped aggregate
UDAFs, and the table-function forms (applyInPandas / mapInPandas).  Every
query here is sql-checkable because each UDF's logic is also expressible
relationally — exactly what makes them good correctness probes for the
Arrow boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from postpy_spark.io import load_table
from postpy_spark.registry import query


@query(
    "udf_scalar_py",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS urgency
    FROM orders
    """,
    group="E",
)
def udf_scalar_py_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (pickle serialization per row — the slow
    path, kept for surface parity; everything else uses Arrow)."""

    @F.udf("bigint")
    def parse_urgency(priority: str) -> int:
        return int(priority.split("-")[0])

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_orderpriority", parse_urgency("o_orderpriority").alias("urgency")
    )


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
    group="E",
)
def udf_scalar_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: whole columns cross the Python
    boundary as Arrow batches (~10-100× the row-at-a-time path)."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1.0 - discount)).round(4)

    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS qty_weighted_price
    FROM lineitem GROUP BY l_returnflag
    """,
    group="E",
)
def udaf_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (custom UDAF): quantity-weighted mean
    price per return flag."""

    @pandas_udf("double")
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(weighted_price("l_extendedprice", "l_quantity"), 4).alias(
            "qty_weighted_price"
        )
    )


@query(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND((c_acctbal - AVG(c_acctbal) OVER w)
                 / STDDEV_SAMP(c_acctbal) OVER w, 4) AS z_score
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
    group="E",
)
def udtf_apply_in_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group table function (gapply): z-score normalization of account
    balances within each market segment via applyInPandas (pandas std is
    ddof=1 = STDDEV_SAMP)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        pdf = pdf[["c_custkey", "c_mktsegment"]].copy()
        pdf["z_score"] = ((bal - bal.mean()) / bal.std(ddof=1)).round(4)
        return pdf

    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_custkey BIGINT, c_mktsegment STRING, z_score DOUBLE")
    )


@query(
    "udtf_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_tax, 4) AS tax_amount
    FROM lineitem WHERE l_quantity > 40
    """,
    group="E",
)
def udtf_map_in_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise table function: mapInPandas iterator over Arrow
    batches — filter + derive without a shuffle."""

    def tax_batches(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 40]
            yield pd.DataFrame(
                {
                    "l_orderkey": out["l_orderkey"],
                    "l_linenumber": out["l_linenumber"],
                    "tax_amount": (out["l_extendedprice"] * out["l_tax"]).round(4),
                }
            )

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"
    )
    return l.mapInPandas(
        tax_batches, "l_orderkey BIGINT, l_linenumber INT, tax_amount DOUBLE"
    )


@query(
    "udtf_python",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 100),
    u AS (SELECT doc_id,
                 unnest(list_transform(range(LEN(toks)),
                        i -> {'word': toks[i+1], 'pos': i})) AS e
          FROM t)
    SELECT doc_id, e.word AS word, CAST(e.pos AS INT) AS pos FROM u
    """,
    group="E",
)
def udtf_python_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 @udtf): one input row →
    many output rows, lateral-joined in SQL.  Tokenization is a plain
    `split(' ')` on both engines so empty tokens align.  Row-at-a-time
    Python like udf_scalar_py — a surface demo, bounded input; the
    vectorized path for this job is explode/posexplode (text_tokenize_tf)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, w in enumerate((text or "").split(" ")):
                yield (w, i)

    spark.udtf.register("pp_split_words", SplitWords)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("_pp_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word, s.pos "
        "FROM _pp_udtf_docs d, LATERAL pp_split_words(d.doc_id, d.text) s"
    )


@query(
    "udtf_map_in_arrow",
    oracle="""
    SELECT doc_id, CAST(LEN(text) AS BIGINT) AS n_cp, lang
    FROM documents
    """,
    group="E",
)
def udtf_map_in_arrow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python boundary: RecordBatches pass
    straight through pyarrow.compute with no pandas materialization.
    Counts code points per doc via pc.utf8_length (matches DuckDB LEN)."""
    import pyarrow as pa

    def batch_len(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
                    b.column("lang"),
                ],
                names=["doc_id", "n_cp", "lang"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return d.mapInArrow(batch_len, "doc_id bigint, n_cp bigint, lang string")


@query(
    "udtf_cogroup_pandas",
    oracle="""
    WITH e AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
         o AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
               FROM orders GROUP BY 1)
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
    group="E",
)
def udtf_cogroup_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: BOTH sides of a key are handed to one
    Python function as aligned pandas frames — the escape hatch for per-key
    logic spanning two tables (custom reconciliation, per-entity model
    scoring).  Each key's pair of groups crosses the Arrow boundary once."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("user_id")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )

    def reconcile(key, events_pdf, orders_pdf):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(events_pdf)],
                "n_orders": [len(orders_pdf)],
            }
        )

    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("user_id"))
        .applyInPandas(reconcile, "user_id BIGINT, n_events BIGINT, n_orders BIGINT")
    )


@query(
    "udf_scalar_pandas_iter",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice * 0.93 + 5.0, 4) AS adjusted
    FROM part
    """,
    group="E",
)
def udf_scalar_pandas_iter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF: the per-executor expensive init (model
    load, codec table…) happens ONCE per worker, then streams over every
    Arrow batch — the right shape for model-scoring UDFs where per-batch
    init would dominate."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _adjust_batches(it):
        rate, fee = 0.93, 5.0  # stands in for the once-per-worker model load
        for s in it:
            yield s * rate + fee

    # real typing objects (not strings): `from __future__ import annotations`
    # stringizes inline hints, which the pandas_udf eval-type inference
    # cannot resolve for locally-imported names
    _adjust_batches.__annotations__ = {
        "it": Iterator[pd.Series], "return": Iterator[pd.Series]
    }
    adjust = pandas_udf(_adjust_batches, "double")
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(adjust(F.col("p_retailprice")), 4).alias("adjusted"),
    )


@query(
    "udaf_pandas_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
    FROM orders
    """,
    group="E",
)
def udaf_pandas_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pandas aggregation applied OVER A WINDOW — the vectorized
    path for rolling metrics no builtin covers (here a plain mean so the
    oracle can verify exactly); Spark feeds the UDAF each bounded frame as
    a pandas Series."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mean(s):
        return float(s.mean())

    _mean.__annotations__ = {"s": pd.Series, "return": float}
    mean_udaf = pandas_udf(_mean, "double")

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(mean_udaf(F.col("o_totalprice")).over(w), 4).alias("avg3"),
    )


@query(
    "udtf_python_analyze",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS tok0,
           string_split(text, ' ')[2] AS tok1,
           string_split(text, ' ')[3] AS tok2
    FROM documents WHERE doc_id < 50
    """,
    group="E",
)
def udtf_python_analyze_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()`): the output schema is
    computed AT PLAN TIME from the call's literal argument — here
    `first_tokens(text, 3)` resolves to columns tok0..tok2 before any data
    moves, so downstream plans/pruning see real column names instead of a
    generic array.  The static-schema variant is udtf_python; same
    row-at-a-time surface caveat applies (bounded input, whitelisted)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text_arg, n_arg):  # noqa: ANN001, ANN205
            n = n_arg.value
            schema = StructType()
            for i in range(n):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):  # noqa: ANN001
            toks = (text or "").split(" ")
            row = tuple(toks[i] if i < len(toks) else None for i in range(n))
            yield row

    spark.udtf.register("pp_first_tokens", udtf(FirstTokens))
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_pp_udtf_poly_docs")
    return spark.sql(
        "SELECT d.doc_id, s.tok0, s.tok1, s.tok2 "
        "FROM _pp_udtf_poly_docs d, LATERAL pp_first_tokens(d.text, 3) s"
    )


@query(
    "udtf_table_arg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)  AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
                                     AS total
    FROM events GROUP BY event_type
    """,
    group="E",
)
def udtf_table_arg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument + PARTITION BY (Spark 4): the
    planner feeds each partition's rows to one UDTF instance (eval per
    row, terminate emits the partition summary) — the SQL-surface twin
    of applyInPandas for users who live in SQL.  PARTITION BY shuffles
    on event_type exactly like the equivalent aggregate; the UDTF adds
    per-partition streaming state, not another pass.  Bounded demo of
    the surface — the vectorized path for THIS job is a plain groupBy.

    The sum accumulates EXACT integer cents (events.value is 2-decimal
    by construction) and divides only at emit: a float accumulator in
    nondeterministic partition row order + Python round() (banker's)
    is the rounding-flake class CLAUDE.md documents (r7 advice)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, n bigint, total double")
    class TypeSummary:
        def __init__(self):
            self._key = None
            self._n = 0
            self._cents = 0  # exact integer cents — order-independent

        def eval(self, row):  # noqa: ANN001 - Row of the partitioned table
            self._key = row["event_type"]
            self._n += 1
            self._cents += int(round(row["value"] * 100))

        def terminate(self):
            if self._key is not None:
                yield (self._key, self._n, self._cents / 100.0)

    spark.udtf.register("pp_type_summary", TypeSummary)
    load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).createOrReplaceTempView("_pp_udtf_tbl_events")
    return spark.sql(
        "SELECT event_type, n, total FROM pp_type_summary("
        "TABLE(_pp_udtf_tbl_events) PARTITION BY event_type)"
    )
