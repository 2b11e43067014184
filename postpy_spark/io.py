"""Source/sink layer: parquet/CSV/JSON scans and sinks, JDBC passthrough.

postpy analogs [U] (SURVEY.md §2 group A):
- ``postpy/dml*::copy_from_csv`` (COPY FROM STDIN WITH CSV) → :func:`scan_csv`
- ``postpy/sql.py::select / select_dict`` (cursor row streaming) → :func:`scan_jdbc`
- batched INSERT (``postpy/dml.py::insert_many``) → :func:`sink_jdbc_append`

Scale notes: all scans are plain DataFrame readers, so Catalyst pushes
filters and prunes columns into the Parquet scan for free; `load_table`
never caches or collects.  The only impedance fix is the ``events.ts``
nanosecond timestamp (Spark has no ns type — read as long, convert to µs,
matching DuckDB's own ns→µs truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postpy_spark.session import ensure_runtime_confs

#: Tables the driver generates (TESTDATA.md); one parquet file each.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar parquet scan (vectorized reader; filter/column pushdown)."""
    ensure_runtime_confs(spark)
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table, normalizing types.

    ``events.ts`` arrives as bigint nanoseconds (legacy nanosAsLong); convert
    to a µs TIMESTAMP_NTZ so Spark and the naive-timestamp oracle agree
    bit-for-bit (both truncate toward zero; all values are post-epoch).
    """
    df = scan_parquet(spark, f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer `div`, NOT `/1000`: ns epoch values exceed 2^53, so float
        # division rounds the last µs digit up on ~half the rows.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view for the SQL-string path."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# CSV (postpy COPY parity)
# ---------------------------------------------------------------------------

def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    null_value: str = "",
    encoding: str = "UTF-8",
    **options,
) -> DataFrame:
    """CSV ingest with COPY-option parity: header / delimiter / NULL string /
    encoding (upstream ``copy_from_csv`` keyword surface [U]).

    With an explicit schema the read is single-pass; without one we
    infer (two passes — fine for utility use, avoid in pipelines).
    """
    ensure_runtime_confs(spark)
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("nullValue", null_value)
        .option("encoding", encoding)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def sink_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",",
             mode: str = "overwrite", **options) -> None:
    """COPY TO equivalent; one file per partition (coalesce upstream if a
    single file is required — never on big data)."""
    w = df.write.option("header", header).option("sep", sep).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.csv(path)


def scan_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    """Line-oriented text ingest (raw-log / jsonl-before-parse shape): one
    ``value: string`` row per line, or one row per FILE with
    ``wholetext=true``.  Parsing stays declarative downstream (split /
    from_json / regexp_extract), so pushdown-friendly projections apply."""
    ensure_runtime_confs(spark)
    return spark.read.option("wholetext", whole_text).text(path)


def sink_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: exactly one string column becomes one line per row (the
    export shape for line-delimited corpora); one file per partition."""
    df.write.mode(mode).text(path)


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                 partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def scan_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None,
              **options) -> DataFrame:
    ensure_runtime_confs(spark)
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# ---------------------------------------------------------------------------
# JDBC (postpy's psycopg2 cursor surface, re-expressed)
# ---------------------------------------------------------------------------

#: Embedded JDBC engine shipped on Spark's own classpath (derby-*.jar lives
#: in pyspark/jars for the Hive metastore).  It gives the JDBC scan/sink a
#: REAL executed round-trip in this no-network harness; against a live
#: PostgreSQL the same code paths take the PG URL from :func:`jdbc_url_from_env`.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL rooted at a filesystem path (per-JVM lock:
    include the PID in ``db_path`` when multiple processes may probe)."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_path}{suffix}"


def _ensure_derby_home(spark: SparkSession) -> None:
    """Point derby.system.home at scratch BEFORE the engine first boots so
    derby.log lands in /tmp, not the process cwd.  No-op once booted."""
    try:
        spark._jvm.java.lang.System.setProperty(
            "derby.system.home", "/tmp/postpy_spark_work"
        )
    except Exception:
        pass


def jdbc_url_from_env(env: dict[str, str] | None = None) -> str:
    """Build a PostgreSQL JDBC URL from PG* env vars (``connections.py`` [U])."""
    e = env or os.environ
    host = e.get("PGHOST", "localhost")
    port = e.get("PGPORT", "5432")
    db = e.get("PGDATABASE", "postgres")
    return f"jdbc:postgresql://{host}:{port}/{db}"


def scan_jdbc(
    spark: SparkSession,
    table: str | None = None,
    query: str | None = None,
    url: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan (replaces cursor iteration in ``sql.py::select`` [U]).

    For scale, always pass partition_column/bounds/num_partitions — a single
    unpartitioned JDBC read funnels the whole table through one task.
    Executed for real against embedded Derby (:data:`DERBY_DRIVER`) in this
    harness; the PostgreSQL path differs only in URL/driver.
    """
    ensure_runtime_confs(spark)
    if url and url.startswith("jdbc:derby:"):
        _ensure_derby_home(spark)
    reader = spark.read.format("jdbc").option("url", url or jdbc_url_from_env())
    if query is not None:
        reader = reader.option("query", query)
    elif table is not None:
        reader = reader.option("dbtable", table)
    else:
        raise ValueError("scan_jdbc requires table= or query=")
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    e = properties or {}
    for k, v in e.items():
        reader = reader.option(k, v)
    return reader.load()


def sink_jdbc_append(df: DataFrame, table: str, url: str | None = None,
                     batchsize: int = 10_000,
                     properties: dict[str, str] | None = None,
                     mode: str = "append") -> None:
    """Batched append (replaces ``dml.py::insert_many`` executemany [U]).
    ``batchsize`` maps to the JDBC writer's executeBatch chunking — the same
    knob as upstream's mogrify-batch size.  ``mode="overwrite"`` is the
    create-or-replace seeding path."""
    if url and url.startswith("jdbc:derby:"):
        _ensure_derby_home(df.sparkSession)
    w = (
        df.write.format("jdbc")
        .option("url", url or jdbc_url_from_env())
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    w.save()
