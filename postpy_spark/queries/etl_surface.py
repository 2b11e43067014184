"""Group A — postpy's own ETL surface as contract queries (SURVEY.md §2.A).

Each query exercises a real ETL operator end-to-end (CSV roundtrips through
/tmp, DDL against the session catalog with explicit /tmp locations, keyed
upserts) and returns a DataFrame the DuckDB oracle can reproduce.  The
operators themselves live in :mod:`postpy_spark.etl`, :mod:`~.schema`,
:mod:`~.io`; these wrappers pin their behavior to the driver contract.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from postpy_spark import etl
from postpy_spark.io import load_table, scan_csv, sink_csv
from postpy_spark.registry import query
from postpy_spark.schema import (
    PG_ENCODING_MAP,
    PG_TYPE_MAP,
    Column,
    PrimaryKey,
    Table,
)

WORK_ROOT = "/tmp/postpy_spark_work"

#: Scratch-dir prefixes that are pid-keyed (`<prefix>_<pid>`).  New
#: pid-keyed dirs MUST be created via _pid_dir(), which enforces membership
#: here.  Registration buys the LIVE-PID guard: a registered dir is only
#: reclaimed when its pid is gone.  Tag-level names matching NO registered
#: pattern are reclaimed unconditionally as pre-r12 old-layout residue
#: (r13 ADVICE) — the current layout writes nothing un-pid-keyed at tag
#: level, so an unmatched name cannot be live work.
PID_DIR_PREFIXES = (
    "derby", "vt_demo", "orders_evo", "binfiles", "orders_compact", "merge_vt",
    "work",
)

_swept = False


def _getpid() -> int:
    """Seam for tests: monkeypatch THIS, never the global ``os.getpid``
    (r13 ADVICE — patching the shared os module leaks the fake pid into
    every other module's pid-keyed scratch paths during the window)."""
    return os.getpid()


def _pid_dir(prefix: str, sub: str | None = None) -> str:
    """`<prefix>_<pid>[/sub]` with the prefix registered for sweeping."""
    assert prefix in PID_DIR_PREFIXES, f"register {prefix!r} in PID_DIR_PREFIXES"
    name = f"{prefix}_{_getpid()}"
    return f"{name}/{sub}" if sub else name


def _sweep_stale_pid_dirs() -> None:
    """Remove per-PID scratch dirs (derby_NNN, vt_demo_NNN, …) left by
    processes that no longer exist.  Per-PID keying is required — Derby
    locks a database dir per JVM — but without a sweep every gate/pytest
    run leaves another ~5 MB Derby db behind forever.  Runs once per
    process, before the first scratch path is handed out.

    Two candidate classes under each sf-tag dir:
    - names matching a registered pid-keyed prefix whose pid is gone
      (the normal case since the r12 layout);
    - names matching NO registered pattern — pre-r12 un-pid-keyed residue
      (``<tag>/py_sink_jsonl`` etc.) that the old sweep could never
      reclaim (r13 ADVICE).  Everything the current layout writes under a
      tag dir goes through ``_workdir`` → ``work_<pid>/…``, so an
      unmatched tag-level name can only be old-layout residue."""
    global _swept
    if _swept:
        return
    _swept = True
    import re
    import shutil

    pat = re.compile(rf"^(?:{'|'.join(map(re.escape, PID_DIR_PREFIXES))})_(\d+)$")
    try:
        tags = os.listdir(WORK_ROOT)
    except FileNotFoundError:
        return
    for tag in tags:
        tag_dir = os.path.join(WORK_ROOT, tag)
        if not os.path.isdir(tag_dir):
            continue
        for name in os.listdir(tag_dir):
            m = pat.search(name)
            if not m:  # pre-r12 layout: not pid-keyed, reclaim unconditionally
                shutil.rmtree(os.path.join(tag_dir, name), ignore_errors=True)
                continue
            if int(m.group(1)) == _getpid():
                continue
            try:
                os.kill(int(m.group(1)), 0)  # raises if pid is gone
            except ProcessLookupError:
                shutil.rmtree(os.path.join(tag_dir, name), ignore_errors=True)
            except PermissionError:
                pass  # pid alive under another uid — leave it


def _workdir(sf_dir: str, name: str) -> str:
    """Per-(sf, pid) scratch path.  The pid segment is load-bearing: two
    concurrent processes at the same scale factor (e.g. a gate overlapping
    a bench) must not share `py_sink_jsonl` etc. — one side's rmtree would
    delete the directory while the other is mid-read.  Stale pid dirs are
    reclaimed by _sweep_stale_pid_dirs on the next process's first call."""
    _sweep_stale_pid_dirs()
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    path = f"{WORK_ROOT}/{tag}/{_pid_dir('work')}/{name}"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# COPY parity: CSV roundtrips
# ---------------------------------------------------------------------------


@query("scan_csv", oracle="SELECT * FROM nation", group="A")
def scan_csv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY FROM parity: export nation to CSV, re-ingest with an explicit
    schema + header/delimiter options — roundtrip must be lossless."""
    path = _workdir(sf_dir, "nation_csv")
    sink_csv(load_table(spark, sf_dir, "nation"), path, header=True, sep="|")
    return scan_csv(
        spark,
        path,
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        header=True,
        sep="|",
    )


@query(
    "sink_csv",
    oracle="SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    group="A",
)
def sink_csv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO parity: doubles must survive the text roundtrip exactly
    (shortest round-trippable repr on write, exact parse on read)."""
    path = _workdir(sf_dir, "orders_csv")
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    sink_csv(df, path, header=True)
    return scan_csv(
        spark,
        path,
        schema="o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
        header=True,
    )


# ---------------------------------------------------------------------------
# Upsert (INSERT … ON CONFLICT DO UPDATE)
# ---------------------------------------------------------------------------


@query(
    "merge_upsert",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_totalprice, FALSE AS updated
        FROM orders WHERE o_orderkey % 10 < 8
    ),
    src AS (
        SELECT o_orderkey, ROUND(o_totalprice * 1.1, 3) AS o_totalprice, TRUE AS updated
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT * FROM src
    UNION ALL
    SELECT t.* FROM target t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    """,
    group="A",
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert: source rows overwrite colliding target keys AND insert
    new keys (both paths exercised by the %10/%3 split).  postpy upstream:
    dml.py::upsert_records [U]."""
    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_totalprice", F.lit(False).alias("updated")
    )
    source = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 3).alias("o_totalprice"),
        F.lit(True).alias("updated"),
    )
    return etl.merge_upsert(target, source, keys=["o_orderkey"])


@query(
    "merge_scd2",
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM customer
    ),
    src AS (
        SELECT c_custkey, c_mktsegment, ROUND(c_acctbal + 100, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2)
        FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 10 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, 'NEW', 0.0
        FROM customer WHERE c_custkey % 25 = 0
    ),
    chg AS (
        SELECT t.c_custkey, t.c_mktsegment AS t_seg, t.c_acctbal AS t_bal,
               s.c_mktsegment AS s_seg, s.c_acctbal AS s_bal, t.valid_from
        FROM tgt t JOIN src s USING (c_custkey)
        WHERE t.c_acctbal IS DISTINCT FROM s.c_acctbal
           OR t.c_mktsegment IS DISTINCT FROM s.c_mktsegment
    )
    SELECT c_custkey, t_seg AS c_mktsegment, t_bal AS c_acctbal, valid_from,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_to, FALSE AS is_current
    FROM chg
    UNION ALL
    SELECT c_custkey, s_seg, s_bal, TIMESTAMP '2026-01-01 00:00:00',
           CAST(NULL AS TIMESTAMP), TRUE
    FROM chg
    UNION ALL
    SELECT t.* FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.c_custkey = t.c_custkey)
    UNION ALL
    SELECT s.c_custkey, s.c_mktsegment, s.c_acctbal,
           TIMESTAMP '2026-01-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
    FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.c_custkey = s.c_custkey)
    """,
    group="A",
)
def merge_scd2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge on a customer-dimension snapshot: the change feed
    carries value changes (%10: acctbal bumped), no-op resends (%7: same
    values — must pass through untouched), and brand-new keys (%25 +
    1_000_000).  Changed keys get their current version closed at the
    change timestamp and a new open version; history is immutable.
    postpy upstream analog: dml.py::upsert_records [U] (type-1 only; the
    versioned-history semantics are the warehouse-native extension)."""
    c = load_table(spark, sf_dir, "customer")
    tgt = c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.lit("2020-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
    )
    resend = c.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 10 != 0)
    ).select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal"))
    new = c.filter(F.col("c_custkey") % 25 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    src = changed.unionByName(resend).unionByName(new)
    return etl.merge_scd2(
        tgt,
        src,
        keys=["c_custkey"],
        compare_cols=["c_mktsegment", "c_acctbal"],
        change_ts="2026-01-01 00:00:00",
    )



# ---------------------------------------------------------------------------
# DDL + catalog reflection
# ---------------------------------------------------------------------------

_META_COLS = [
    Column("id", "bigint", nullable=False),
    Column("name", "text"),
    Column("amount", "numeric(12,2)"),
    Column("created", "timestamp"),
    Column("active", "boolean"),
]


@query(
    "ddl_create_table",
    oracle="""
    SELECT * FROM (VALUES
        ('id',      'bigint',        TRUE),
        ('name',    'string',        TRUE),
        ('amount',  'decimal(12,2)', TRUE),
        ('created', 'timestamp_ntz', TRUE),
        ('active',  'boolean',       TRUE)
    ) AS t(col_name, data_type, nullable)
    """,
    group="A",
)
def ddl_create_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG-typed Table model → compiled Spark DDL → catalog reflection.
    The oracle pins the PG→Spark type mapping (text→string,
    numeric(12,2)→decimal, timestamp→timestamp_ntz).  Documented gap:
    Spark's parquet catalog does not retain NOT NULL — reflection reports
    every column nullable (PostgreSQL would report id NOT NULL)."""
    t = Table(
        name="pp_ddl_demo",
        columns=_META_COLS,
        primary_key=PrimaryKey(["id"]),
        location=_workdir(sf_dir, "pp_ddl_demo"),
    )
    etl.create_table(spark, t, overwrite=True)
    return etl.describe_table(spark, "pp_ddl_demo").select(
        "col_name", "data_type", "nullable"
    )


@query(
    "ddl_create_table_as",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_supp, ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    group="A",
)
def ddl_create_table_as_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS: materialize an aggregate as a catalog table, read it back."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_pp_supplier_ctas")
    loc = _workdir(sf_dir, "pp_ctas_demo")
    spark.sql("DROP TABLE IF EXISTS pp_ctas_demo")
    import shutil

    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE pp_ctas_demo USING parquet LOCATION '{loc}' AS
        SELECT s_nationkey, COUNT(*) AS n_supp, ROUND(SUM(s_acctbal), 2) AS total_bal
        FROM _pp_supplier_ctas GROUP BY s_nationkey
        """
    )
    return spark.table("pp_ctas_demo")


@query(
    "catalog_list_tables",
    oracle="""
    SELECT * FROM (VALUES ('pp_cat_t1'), ('pp_cat_t2')) AS t(table_name)
    """,
    group="A",
)
def catalog_list_tables_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reflection parity with admin.get_user_tables [U]: namespace-scoped
    listing of user tables."""
    ns_loc = _workdir(sf_dir, "pp_cat_ns")
    spark.sql("DROP NAMESPACE IF EXISTS pp_cat CASCADE")
    spark.sql(f"CREATE NAMESPACE pp_cat LOCATION '{ns_loc}'")
    for t in ("pp_cat_t1", "pp_cat_t2"):
        spark.sql(
            f"CREATE TABLE pp_cat.{t} (id BIGINT, v STRING) USING parquet "
            f"LOCATION '{_workdir(sf_dir, 'pp_cat_ns/' + t)}'"
        )
    names = etl.list_tables(spark, "pp_cat")
    return spark.createDataFrame([Row(table_name=n) for n in names])


@query(
    "catalog_describe",
    oracle="""
    SELECT * FROM (VALUES
        ('id',      'bigint',        TRUE),
        ('name',    'string',        TRUE),
        ('amount',  'decimal(12,2)', TRUE),
        ('created', 'timestamp_ntz', TRUE),
        ('active',  'boolean',       TRUE),
        ('__pk__',  'id',            FALSE)
    ) AS t(col_name, data_type, nullable)
    """,
    group="A",
)
def catalog_describe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column metadata + informational primary key (admin.get_column_metadata
    and get_primary_keys [U] in one reflected view)."""
    t = Table(
        name="pp_desc_demo",
        columns=_META_COLS,
        primary_key=PrimaryKey(["id"]),
        location=_workdir(sf_dir, "pp_desc_demo"),
    )
    etl.create_table(spark, t, overwrite=True)
    desc = etl.describe_table(spark, "pp_desc_demo").select(
        "col_name", "data_type", "nullable"
    )
    pk = spark.createDataFrame(
        [
            Row(
                col_name="__pk__",
                data_type=",".join(etl.get_primary_keys(spark, "pp_desc_demo")),
                nullable=False,
            )
        ]
    )
    return desc.unionByName(pk)


@query(
    "schema_reset",
    oracle="SELECT CAST(0 AS BIGINT) AS n_tables, 'pp_reset' AS namespace",
    group="A",
)
def schema_reset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-and-recreate namespace isolation (admin.reset [U]): after reset
    the namespace must exist and be empty."""
    ns_loc = _workdir(sf_dir, "pp_reset_ns")
    spark.sql("DROP NAMESPACE IF EXISTS pp_reset CASCADE")
    spark.sql(f"CREATE NAMESPACE pp_reset LOCATION '{ns_loc}'")
    spark.sql(
        f"CREATE TABLE pp_reset.junk (id BIGINT) USING parquet "
        f"LOCATION '{_workdir(sf_dir, 'pp_reset_ns/junk')}'"
    )
    etl.reset_namespace(spark, "pp_reset")
    n = len(etl.list_tables(spark, "pp_reset"))
    return spark.createDataFrame([Row(n_tables=n, namespace="pp_reset")])


@query(
    "txn_exec",
    oracle="""
    SELECT id, label, CAST(score AS DOUBLE) AS score FROM (VALUES
        (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', 30.75)
    ) AS t(id, label, score)
    """,
    group="A",
)
def txn_exec_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered statement-list execution (sql.execute_transaction [U]) —
    DDL + INSERTs + final SELECT returned.  Rollback gap documented in
    postpy_spark.etl.execute_statements."""
    loc = _workdir(sf_dir, "pp_txn_demo")
    import shutil

    shutil.rmtree(loc, ignore_errors=True)
    results = etl.execute_statements(
        spark,
        [
            "DROP TABLE IF EXISTS pp_txn_demo",
            f"CREATE TABLE pp_txn_demo (id INT, label STRING, score DOUBLE) "
            f"USING parquet LOCATION '{loc}'",
            "INSERT INTO pp_txn_demo VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25)",
            "INSERT INTO pp_txn_demo VALUES (3, 'gamma', 30.75)",
            "SELECT * FROM pp_txn_demo",
        ],
    )
    return results[-1]


# ---------------------------------------------------------------------------
# Connection factory / JDBC option plumbing (no live PostgreSQL in harness)
# ---------------------------------------------------------------------------


@query(
    "conn_env",
    oracle="""
    SELECT 'jdbc:postgresql://dbhost:5433/analytics' AS jdbc_url,
           'org.postgresql.Driver' AS driver
    """,
    group="A",
)
def conn_env_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG* env → connection URL (connections.py::connect [U]); the factory
    is pure, so it is pinned by value."""
    from postpy_spark.io import jdbc_url_from_env

    url = jdbc_url_from_env(
        {"PGHOST": "dbhost", "PGPORT": "5433", "PGDATABASE": "analytics"}
    )
    return spark.createDataFrame(
        [Row(jdbc_url=url, driver="org.postgresql.Driver")]
    )


def _derby_db(sf_dir: str, name: str) -> str:
    """Per-(sf, process) embedded-Derby database path.  Derby locks a
    database directory per JVM; keying on the PID keeps concurrent probe
    processes (driver + pytest) from fighting over db.lck.  (io's JDBC
    helpers point derby.system.home at scratch so derby.log stays out of
    the process cwd.)"""
    return _workdir(sf_dir, _pid_dir("derby", name))


@query(
    "scan_jdbc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    group="A",
)
def scan_jdbc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL executed JDBC round-trip (sql.py::select parity [U]): seed an
    embedded-Derby table from the nation parquet, then a partitioned
    ``spark.read.jdbc`` scan (4 bound-split tasks on n_nationkey — the
    parallel-cursor shape; a single unpartitioned JDBC read funnels the
    table through one task at scale).  Derby ships on Spark's classpath, so
    the read/write paths execute for real in this no-network harness; a live
    PostgreSQL differs only in url/driver (see conn_env / jdbc_url_from_env).
    """
    from postpy_spark.io import DERBY_DRIVER, derby_url, scan_jdbc, sink_jdbc_append

    url = derby_url(_derby_db(sf_dir, "scan_db"))
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink_jdbc_append(
        src, "nation_jdbc", url=url, mode="overwrite",
        properties={"driver": DERBY_DRIVER},
    )
    return scan_jdbc(
        spark,
        table="nation_jdbc",
        url=url,
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
        properties={"driver": DERBY_DRIVER},
    ).select("n_nationkey", "n_name", "n_regionkey")


# ---------------------------------------------------------------------------
# Type / encoding maps, extensions
# ---------------------------------------------------------------------------

_TYPE_MAP_ORACLE = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{k}', '{v}')" for k, v in sorted(PG_TYPE_MAP.items()))
    + ") AS t(pg_type, spark_type)"
)


@query("type_map", oracle=_TYPE_MAP_ORACLE, group="A")
def type_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PG→Spark type map as data (data_types.py parity [U])."""
    return spark.createDataFrame(
        [Row(pg_type=k, spark_type=v) for k, v in sorted(PG_TYPE_MAP.items())]
    )


_ENC_MAP_ORACLE = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{k}', '{v}')" for k, v in sorted(PG_ENCODING_MAP.items()))
    + ") AS t(python_codec, pg_encoding)"
)


@query("encoding_map", oracle=_ENC_MAP_ORACLE, group="A")
def encoding_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python codec → PG encoding table (pg_encodings.py parity [U])."""
    return spark.createDataFrame(
        [Row(python_codec=k, pg_encoding=v) for k, v in sorted(PG_ENCODING_MAP.items())]
    )


@query(
    "ext_install",
    oracle="""
    SELECT * FROM (VALUES ('pg_trgm'), ('pgcrypto')) AS t(extension)
    """,
    group="A",
)
def ext_install_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE EXTENSION analog: capability registry (extensions.py [U])."""
    etl.install_extension("pgcrypto")
    etl.install_extension("pg_trgm")
    return spark.createDataFrame(
        [Row(extension=e) for e in etl.installed_extensions()]
    )


@query(
    "scan_json",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    """,
    group="A",
)
def scan_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lines roundtrip (postpy passes json/jsonb as strings; we read
    JSON natively): export events to JSON files, re-ingest with an explicit
    schema — timestamps must survive the ISO-text roundtrip to the µs."""
    from postpy_spark.io import scan_json

    path = _workdir(sf_dir, "events_json")
    df = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # default JSON timestamp format truncates to milliseconds; pin a µs format
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    df.write.mode("overwrite").option("timestampNTZFormat", fmt).json(path)
    return scan_json(
        spark,
        path,
        schema="event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
        timestampNTZFormat=fmt,
    )


@query(
    "scan_text",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
    group="A",
)
def scan_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text roundtrip (the raw-corpus export/ingest shape):
    documents flattened to TAB-joined lines via the text sink, re-read as
    ``value`` lines, and parsed back declaratively with split+cast — the
    parse stays JVM-side, so column pruning and pushdown apply to the
    downstream plan exactly as with a structured source.

    NULL discipline: ``concat_ws`` silently DROPS null fields, which would
    shift every later column on parse — so each field is coalesced to the
    PostgreSQL COPY sentinel ``\\N`` on write and mapped back via
    ``nullif`` on read, preserving NULLs positionally."""
    from postpy_spark.io import scan_text, sink_text

    NULL_TOKEN = "\\N"

    def _w(col):  # write-side: sentinel-encode NULLs
        return F.coalesce(col.cast("string"), F.lit(NULL_TOKEN))

    path = _workdir(sf_dir, "documents_txt")
    lines = load_table(spark, sf_dir, "documents").select(
        F.concat_ws(
            "\t",
            _w(F.col("doc_id")),
            _w(F.col("lang")),
            _w(F.col("n_chars")),
        ).alias("value")
    )
    sink_text(lines, path)
    parts = F.split(F.col("value"), "\t", -1)

    def _r(i):  # read-side: sentinel-decode back to NULL
        return F.nullif(parts.getItem(i), F.lit(NULL_TOKEN))

    return scan_text(spark, path).select(
        _r(0).cast("bigint").alias("doc_id"),
        _r(1).alias("lang"),
        _r(2).cast("bigint").alias("n_chars"),
    )


@query(
    "sink_jdbc_append",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_nationkey
    """,
    group="A",
)
def sink_jdbc_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL executed batched JDBC append (dml.py::insert_many parity [U]):
    the customer table lands in embedded Derby in two halves — the first
    seeds the table (overwrite), the second appends with an explicit
    ``batchsize`` (the executeBatch chunk, upstream's mogrify-batch size) —
    then the union is read back over JDBC and aggregated.  An exactly-once
    result proves the append neither dropped nor duplicated a batch."""
    from postpy_spark.io import DERBY_DRIVER, derby_url, scan_jdbc, sink_jdbc_append

    url = derby_url(_derby_db(sf_dir, "sink_db"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    first = cust.filter(F.col("c_custkey") % 2 == 0)
    second = cust.filter(F.col("c_custkey") % 2 == 1)
    props = {"driver": DERBY_DRIVER}
    sink_jdbc_append(first, "customer_sink", url=url, mode="overwrite", properties=props)
    sink_jdbc_append(second, "customer_sink", url=url, batchsize=500, properties=props)
    back = scan_jdbc(spark, table="customer_sink", url=url, properties=props)
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "scan_orc",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    group="A",
)
def scan_orc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (second columnar format, built into Spark): export
    supplier to ORC, re-read — types and doubles must survive exactly."""
    path = _workdir(sf_dir, "supplier_orc")
    df = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "scan_xml",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    group="A",
)
def scan_xml_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip (built into Spark 4): export nation to row-tagged XML,
    re-ingest with an explicit schema — the document-ingest path for
    XML-shaped corpora (arXiv, patents, wiki dumps)."""
    path = _workdir(sf_dir, "nation_xml")
    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    df.write.mode("overwrite").option("rootTag", "nations").option("rowTag", "nation").xml(path)
    return (
        spark.read.option("rowTag", "nation")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .xml(path)
    )


@query(
    "table_versioning",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    """,
    group="A",
)
def table_versioning_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned table with REAL rollback (closes txn_exec's
    round-1 'completed writes cannot be rolled back' gap): commit the even
    half, commit a full overwrite, roll back — the read must be the even
    half again.  Pointer-swap commits mean readers never see partial data
    (postpy_spark.versioned; semantics tested in tests/test_versioned.py)."""
    import shutil

    from postpy_spark.versioned import VersionedTable

    root = _workdir(sf_dir, _pid_dir("vt_demo"))
    shutil.rmtree(root, ignore_errors=True)
    vt = VersionedTable(root)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    vt.write(o.filter(F.col("o_orderkey") % 2 == 0))
    vt.write(o)
    vt.rollback()
    return vt.read(spark)


@query(
    "merge_versioned",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_totalprice, FALSE AS updated
        FROM orders WHERE o_orderkey % 10 < 8
    ),
    src AS (
        SELECT o_orderkey, ROUND(o_totalprice * 1.1, 3) AS o_totalprice,
               TRUE AS updated
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT * FROM src
    UNION ALL
    SELECT t.* FROM target t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    """,
    group="A",
)
def merge_versioned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC, time-travelable MERGE (r7 verdict item 3): merge_upsert's
    anti-join rewrite (etl.py) writing through the versioned snapshot
    layer (versioned.py) — commit target as v1, MERGE source as v2 via a
    staged-then-pointer-swapped commit, then apply the SAME merge AGAIN
    (v3).  The returned read must equal a single application — upsert
    idempotence is part of the sql-checked result, not just a pytest.
    Crash-mid-merge atomicity (old snapshot still reads, staging leaves
    no trace) is gated by tests/test_versioned.py::
    test_merge_versioned_crash_mid_write.  This is the closest honest
    Delta-parity MERGE achievable with no connector jars: readers resolve
    an immutable snapshot, writers swap one pointer atomically."""
    import shutil

    from postpy_spark.versioned import VersionedTable

    root = _workdir(sf_dir, _pid_dir("merge_vt"))
    shutil.rmtree(root, ignore_errors=True)
    vt = VersionedTable(root)
    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_totalprice", F.lit(False).alias("updated")
    )
    source = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 3).alias("o_totalprice"),
        F.lit(True).alias("updated"),
    )
    vt.write(target)
    vt.upsert(spark, source, keys=["o_orderkey"])
    vt.upsert(spark, source, keys=["o_orderkey"])  # idempotent re-run
    assert vt.current_version() == 3 and vt.versions() == [1, 2, 3]
    return vt.read(spark)


@query(
    "sql_execute",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderstatus
    """,
    group="A",
)
def sql_execute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL execution path — how postpy users actually drove the engine
    (sql.py::execute/select handed SQL strings to the server [U]).  A
    multi-statement script runs through etl.execute_statements (view setup,
    then the query); the last statement's frame is the result."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_pp_sql_orders")
    results = etl.execute_statements(
        spark,
        [
            """CREATE OR REPLACE TEMP VIEW _pp_recent AS
               SELECT * FROM _pp_sql_orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""",
            """SELECT o_orderstatus, COUNT(*) AS n,
                      ROUND(SUM(o_totalprice), 2) AS total
               FROM _pp_recent GROUP BY o_orderstatus""",
        ],
    )
    return results[-1]


@query(
    "sql_execute_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_totalprice > 150000.0
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    group="A",
)
def sql_execute_params_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL execution — the core psycopg2-shaped surface of
    the reference (execute(sql, params) with server-side binding [U]),
    Spark-native: named parameter markers (:min_price, :status) bound
    via ``spark.sql(query, args=...)``.  Binding happens in the
    ANALYZER, not by string interpolation, so values are injection-safe
    literals and the plan is identical to inlined constants (pushdown
    included — the bound predicates reach the parquet scan).  Exact-
    money discipline: BIGINT cents on both sides via ROUND before CAST
    (CLAUDE.md: bare CAST(double AS BIGINT) truncates in Spark but
    rounds in DuckDB; 2-decimal money x100 sits within 1e-9 of an
    integer, so ROUND is bit-stable in both engines)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_pp_sqlp_orders"
    )
    return spark.sql(
        """SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                      AS total_cents
           FROM _pp_sqlp_orders
           WHERE o_totalprice > :min_price
             AND o_orderstatus = :status
           GROUP BY o_orderpriority""",
        args={"min_price": 150000.0, "status": "F"},
    )


@query(
    "scan_python_datasource",
    oracle="""
    SELECT r AS id, concat('r', r) AS tag, CAST(r AS DOUBLE) * CAST(1.5 AS DOUBLE) AS score
    FROM range(500) t(r)
    """,
    group="A",
)
def scan_python_datasource_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON data source (Spark 4 DataSource API): the connector
    escape hatch for systems with no JVM driver — partitions() defines the
    parallelism (4 striped InputPartitions here), read() yields rows per
    partition, Arrow ships them JVM-side.  Deterministic synthetic rows so
    the oracle can reproduce the exact output."""
    from postpy_spark import sources

    sources.register(spark)
    return spark.read.format("pp_synth").option("n", 500).load()


@query(
    "etl_zorder_layout",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS price_band,
           CAST(FLOOR(l_quantity / 10) AS BIGINT)         AS qty_band,
           COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY 1, 2
    """,
    group="A",
)
def etl_zorder_layout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write + re-read (OPTIMIZE ZORDER analog): lineitem
    rewritten Morton-ordered on (price, quantity), then aggregated from the
    clustered copy — values must be lossless.  The layout's measured
    row-group pruning lives in tests/test_zorder.py."""
    from postpy_spark.operators.zorder import zorder_write

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    path = _workdir(sf_dir, "lineitem_zorder")
    zorder_write(l, path, ["l_extendedprice", "l_quantity"], bits=5, num_files=8)
    back = spark.read.parquet(path)
    return back.groupBy(
        F.floor(F.col("l_extendedprice") / 10000).cast("bigint").alias("price_band"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_band"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
    FROM orders
    """,
    group="A",
)
def scan_schema_evolution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: generation 1 files lack a column that
    generation 2 adds; mergeSchema=true unions the schemas and fills the
    missing column with NULLs — the append-only-pipeline reality where
    producers upgrade over time."""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    path = _workdir(sf_dir, _pid_dir("orders_evo"))
    shutil.rmtree(path, ignore_errors=True)
    gen1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    gen2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    gen1.write.mode("append").parquet(path)
    gen2.write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS n, ROUND(SUM(l.l_extendedprice), 2) AS total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    group="A",
)
def join_bucketed_colocated_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: both tables written CLUSTERED BY
    the join key into the same bucket count, so the join plans with ZERO
    shuffle exchanges on either side — the amortize-the-shuffle-once
    pattern for keys joined repeatedly at 100 TB (plan pinned in
    tests/test_bucketing.py; here the result is oracle-checked)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    for name, df, loc in (
        ("pp_orders_bkt", o, _workdir(sf_dir, "pp_orders_bkt")),
        ("pp_lineitem_bkt", l, _workdir(sf_dir, "pp_lineitem_bkt")),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
        key = "o_orderkey" if name == "pp_orders_bkt" else "l_orderkey"
        (df.write.bucketBy(8, key).sortBy(key)
           .option("path", loc).saveAsTable(name))
    ob = spark.table("pp_orders_bkt")
    lb = spark.table("pp_lineitem_bkt")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


@query(
    "catalog_view_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n FROM orders
    WHERE o_totalprice > 100000 GROUP BY 1
    """,
    group="A",
)
def catalog_view_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW → query-through-view (the reflection-visible logical
    layer PostgreSQL users lean on): the view body holds the filter, the
    query aggregates through it; DROP/CREATE is idempotent per run."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_pp_view_orders")
    spark.sql("DROP VIEW IF EXISTS pp_big_orders")
    spark.sql(
        "CREATE TEMPORARY VIEW pp_big_orders AS "
        "SELECT * FROM _pp_view_orders WHERE o_totalprice > 100000"
    )
    return spark.sql(
        "SELECT o_orderstatus, COUNT(*) AS n FROM pp_big_orders GROUP BY 1"
    )


@query(
    "scan_partitioned_pruned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'O'
    """,
    group="A",
)
def scan_partitioned_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + static partition pruning: the table
    is written partitionBy(status), the filter resolves to ONE directory —
    at 100 TB the skipped partitions are never even listed.  (Plan-level
    pruning/DPP assertions live in tests/test_partition_pruning.py.)"""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    path = _workdir(sf_dir, "orders_by_status")
    if not os.path.exists(f"{path}/_SUCCESS"):
        shutil.rmtree(path, ignore_errors=True)
        (o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
          .write.partitionBy("o_orderstatus").mode("overwrite").parquet(path))
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "scan_binaryfile",
    oracle="""
    SELECT concat('doc_', doc_id, '.bin') AS fname,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents WHERE doc_id < 20
    """,
    group="A",
)
def scan_binaryfile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw binary ingest (spark.read.format('binaryFile')) — how image /
    audio / model-shard files enter a pipeline before any decoder runs:
    whole files become (path, length, content) rows; content stays opaque
    bytes and is fingerprinted JVM-side."""
    import shutil

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    path = _workdir(sf_dir, _pid_dir("binfiles"))
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    for r in d.select("doc_id", "text").collect():  # 20 tiny fixture files
        with open(f"{path}/doc_{r.doc_id}.bin", "wb") as f:
            f.write(r.text.encode("utf-8"))
    b = spark.read.format("binaryFile").load(path)
    return b.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("digest"),
    )


@query(
    "etl_compact_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY 1
    """,
    group="A",
)
def etl_compact_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (OPTIMIZE/compaction analog): orders
    fragmented into 64 tiny files, compacted by etl.compact_parquet (sized
    by a recursive data-file listing, atomic staging swap), then aggregated
    from the compacted copy — values must be lossless.  File-count
    mechanics are pinned in tests/test_etl_unit.py; this query gates the
    DATA integrity of the rewrite.  Compaction must actually shrink the
    file count or the query fails loud rather than certifying a no-op."""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    path = _workdir(sf_dir, _pid_dir("orders_compact"))
    shutil.rmtree(path, ignore_errors=True)
    o.repartition(64).write.parquet(path)
    stats = etl.compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    if stats["files_after"] >= stats["files_before"]:
        raise RuntimeError(f"compaction did not reduce files: {stats}")
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_quantity > 40
    GROUP BY l_returnflag
    """,
    group="A",
)
def sql_pipe_syntax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`FROM t |> WHERE … |> AGGREGATE …`): the
    linear query-authoring surface SQL:2023-era engines are converging on.
    Same logical plan as the classic formulation — Catalyst canonicalizes
    both — so the DuckDB oracle is ordinary ANSI SQL."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_pp_pipe_l")
    return spark.sql(
        """
        FROM _pp_pipe_l
        |> WHERE l_quantity > 40
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
           GROUP BY l_returnflag
        """
    )


@query(
    "etl_cdc_apply",
    oracle="""
    WITH ch AS (
        SELECT l_orderkey AS order_key,
               CAST(l_linenumber AS BIGINT) * 10000000
                   + CAST(ROUND(l_quantity * 100) AS BIGINT) AS k
        FROM lineitem
    ),
    latest AS (
        SELECT order_key, MAX(k) AS maxk, COUNT(*) AS n_changes
        FROM ch GROUP BY order_key
    )
    SELECT order_key,
           CAST(maxk % 10000000 AS DOUBLE) / 100 AS last_qty,
           CAST(n_changes AS BIGINT)             AS n_changes
    FROM latest WHERE (maxk // 10000000) % 7 <> 0
    """,
    group="A",
)
def etl_cdc_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog → snapshot apply (Debezium-style upsert/delete
    semantics): the lineitem table doubles as a keyed changelog
    (key=l_orderkey, sequence=l_linenumber, every change whose latest
    sequence lands on a multiple of 7 is a tombstone).  The snapshot is
    "latest change per key wins; a trailing tombstone removes the key" —
    exactly what a MERGE from a CDC feed produces, computed in ONE
    shuffle with a single MAX (no window sort, no self-join; map-side
    partial aggregation applies).

    The synthetic feed has DUPLICATE (key, seq) pairs, so (seq, payload)
    is packed into one BIGINT — ``seq*1e7 + cents(qty)`` — and MAX picks
    the deterministic lexicographic latest on both engines (arg_max alone
    would tie-break arbitrarily and diverge).

    Scale: groupBy on the key with one MAX aggregate — the canonical
    compact-the-changelog plan at any volume; skewed hot keys fall to
    AQE skew handling like any aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    packed = etl.cdc_pack(li, key="l_orderkey", seq="l_linenumber", qty="l_quantity")
    return etl.cdc_snapshot(etl.cdc_compact(packed))


@query(
    "etl_table_diff",
    oracle="""
    WITH newsnap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
    ),
    d AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                        THEN 'changed' END           AS diff_status,
               ROUND(o.o_totalprice, 2)              AS old_price,
               ROUND(n.o_totalprice, 2)              AS new_price
        FROM orders o FULL JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    )
    SELECT * FROM d WHERE diff_status IS NOT NULL
    """,
    group="A",
)
def etl_table_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (``etl.table_diff``): diff two versions of
    a keyed table into added/removed/changed rows with before/after
    values — the audit half of CDC (etl_cdc_apply replays a changelog;
    this RECOVERS one from two snapshots, e.g. validating a migrated
    copy).  The "new" snapshot is derived deterministically from orders:
    keys %97==0 deleted, %89==0 repriced (+1.0), %101==0 re-keyed as
    inserts.  ONE full-outer join, both sides shuffling once on the
    primary key; null-safe comparison counts NULL transitions."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    diff = etl.table_diff(o, new, keys=["o_orderkey"], compare_cols=["o_totalprice"])
    return diff.select(
        "o_orderkey",
        "diff_status",
        F.round("old_o_totalprice", 2).alias("old_price"),
        F.round("new_o_totalprice", 2).alias("new_price"),
    )


@query(
    "scan_json_corrupt",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 13 <> 0
    """,
    group="A",
)
def scan_json_corrupt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance on JSONL ingest: every 13th line of the
    fixture is truncated mid-object; the PERMISSIVE read routes those
    lines into ``columnNameOfCorruptRecord`` instead of failing the job
    (the 100 TB reality: a crawl shard always has bad lines, and one of
    them must not kill a 1000-executor read).  The oracle is the clean
    subset of the source table; the in-query assert pins that every
    corrupt line was captured, not silently dropped."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _workdir(sf_dir, "docs_jsonl_corrupt")
    if not os.path.exists(f"{path}/_SUCCESS"):
        line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
        (
            d.select(
                F.when(
                    F.col("doc_id") % 13 == 0,
                    F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string")),
                )
                .otherwise(line)
                .alias("value")
            ).write.mode("overwrite").text(path)
        )
    got = spark.read.schema(
        "doc_id BIGINT, lang STRING, n_chars BIGINT, _bad STRING"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_bad"
    ).json(path)
    # Spark forbids counting ONLY the corrupt column on a raw JSON scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column pruning reduces any such
    # count to just _bad).  Equivalent capture check without touching
    # _bad alone: good parses + expected corrupt lines == raw line count.
    # the redundant doc_id conjunct keeps a data column referenced after
    # count()'s pruning (good lines always carry doc_id)
    n_good = got.filter(
        F.col("_bad").isNull() & F.col("doc_id").isNotNull()
    ).count()
    n_lines = spark.read.text(path).count()
    n_expected = d.filter(F.col("doc_id") % 13 == 0).count()
    assert n_good + n_expected == n_lines, (n_good, n_expected, n_lines)
    # The RETURNED frame needs the same data-column conjunct: a consumer
    # that only count()s it prunes the select away, leaving a filter on
    # _bad alone → QUERY_ONLY_CORRUPT_RECORD_COLUMN (found by the r8
    # plain-session all-query sweep; the oracle compare collects values,
    # so the local gate could never see it).
    return got.filter(
        F.col("_bad").isNull() & F.col("doc_id").isNotNull()
    ).select("doc_id", "lang", "n_chars")


@query(
    "scan_dpp_pruned",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
    FROM orders o JOIN (
        SELECT DISTINCT o_orderstatus AS st FROM orders
        WHERE o_totalprice > 450000
    ) d ON o.o_orderstatus = d.st
    """,
    group="A",
)
def scan_dpp_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the partition filter is only known at
    RUNTIME — "statuses that have a >450k order" comes out of the dim
    side's DATA (a literal status filter would constant-fold into a
    static filter instead), yet the partitioned fact scan still skips
    directories.  At 100 TB this is the difference between listing the
    matching partitions and scanning them all.  The in-query assert
    pins the dynamicpruning subquery in the optimized plan (broadcast
    disabled during planning so DPP inserts the subquery form;
    tests/test_partition_pruning.py covers the broadcast-reuse form)."""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    path = _workdir(sf_dir, "orders_by_status")
    if not os.path.exists(f"{path}/_SUCCESS"):
        shutil.rmtree(path, ignore_errors=True)
        (o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
          .write.partitionBy("o_orderstatus").mode("overwrite").parquet(path))
    fact = spark.read.parquet(path)
    dim = (
        o.filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_orderstatus").alias("st"))
        .distinct()
    )
    j = fact.join(dim, fact.o_orderstatus == dim.st).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "dynamicpruning" in optimized.lower(), optimized[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    return j


@query(
    "etl_partition_overwrite",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT o_orderkey, ROUND(o_totalprice + 1.0, 2) AS o_totalprice, o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
    group="A",
)
def etl_partition_overwrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the idempotent-backfill primitive:
    rewriting one day/status partition with ``mode("overwrite")`` must
    replace ONLY the partitions present in the incoming frame, never
    truncate the table (static overwrite mode — the default — would).
    The 'F' partition is re-priced and overwritten; the oracle proves
    the other partitions survived byte-for-byte.  Re-running is a no-op
    (same derived rows), which is what makes backfills safe to retry
    at 100 TB."""
    import shutil

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    path = _workdir(sf_dir, "orders_dyn_overwrite")
    if not os.path.exists(f"{path}/_SUCCESS"):
        shutil.rmtree(path, ignore_errors=True)
        o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    revised = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") + 1.0, 2)
    )
    (
        revised.write.partitionBy("o_orderstatus")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    out = spark.read.parquet(path).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    # dynamic mode must have preserved every other partition
    statuses = {r.o_orderstatus for r in out.select("o_orderstatus").distinct().collect()}
    expected = {r.o_orderstatus for r in o.select("o_orderstatus").distinct().collect()}
    assert statuses == expected, (statuses, expected)
    return out


@query(
    "join_federated_jdbc",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    group="A",
)
def join_federated_jdbc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEDERATED join: parquet fact × JDBC dimension in one plan — the
    lakehouse-reads-the-operational-DB shape (postgres_fdw parity from
    the lake side).  The Derby-backed nation dim arrives through a real
    JDBC scan and BROADCASTS onto the parquet customer aggregate, so the
    operational database is read once (25 rows over the wire) while the
    big side never leaves the lake.  At 100 TB the rule this op encodes:
    federate DIMENSIONS, never facts — the fact side stays columnar."""
    from postpy_spark.io import DERBY_DRIVER, derby_url, scan_jdbc, sink_jdbc_append

    url = derby_url(_derby_db(sf_dir, "fed_db"))
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink_jdbc_append(
        src, "nation_fed", url=url, mode="overwrite",
        properties={"driver": DERBY_DRIVER},
    )
    dim = scan_jdbc(
        spark,
        table="nation_fed",
        url=url,
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=2,
        properties={"driver": DERBY_DRIVER},
    ).select("n_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(dim), c.c_nationkey == dim.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@query(
    "catalog_schema_diff",
    oracle="""
    SELECT * FROM (VALUES
        ('lang',      'string', NULL,     'removed'),
        ('n_chars',   'bigint', 'int',    'retyped'),
        ('source',    'string', 'string', 'kept'),
        ('doc_id',    'bigint', 'bigint', 'kept'),
        ('text',      'string', 'string', 'kept'),
        ('n_tokens',  NULL,     'bigint', 'added')
    ) AS t(col_name, old_type, new_type, drift)
    """,
    group="A",
)
def catalog_schema_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift report — the metadata twin of etl_table_diff: diff
    two schema versions into added / removed / retyped / kept columns.
    The 'new' schema is an evolved projection of documents (lang
    dropped, n_chars narrowed to int, n_tokens added); the comparison
    runs on driver-side dtypes (bounded metadata, like the catalog
    ops), so no data is scanned at all.  The ingestion guard a 100 TB
    pipeline runs before appending a new day's batch."""
    d = load_table(spark, sf_dir, "documents")
    evolved = d.drop("lang").withColumn(
        "n_chars", F.col("n_chars").cast("int")
    ).withColumn("n_tokens", F.size(F.split("text", " ")).cast("bigint"))
    old_t = dict(d.dtypes)
    new_t = dict(evolved.dtypes)
    rows = []
    for col in sorted(set(old_t) | set(new_t)):
        o, n = old_t.get(col), new_t.get(col)
        drift = (
            "removed" if n is None
            else "added" if o is None
            else "retyped" if o != n
            else "kept"
        )
        rows.append((col, o, n, drift))
    return spark.createDataFrame(
        rows, "col_name STRING, old_type STRING, new_type STRING, drift STRING"
    )


@query(
    "fn_aes_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
    group="B6",
)
def fn_aes_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption at rest: aes_encrypt (GCM, random IV per
    row) then aes_decrypt with the same 256-bit key must return the
    plaintext bit-for-bit — the PII-column pattern where the lake stores
    ciphertext and only keyholders project the clear text.  Both
    functions are JVM built-ins (codegen'd, no Python); the oracle is
    the identity, which is exactly the contract.  The in-query assert
    pins that ciphertext actually differs from plaintext."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    key = F.lit("0123456789abcdef0123456789abcdef")  # 32-byte demo key
    enc = d.select(
        "doc_id",
        "text",
        F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary")).alias("ct"),
    )
    sample = enc.filter(F.col("doc_id") == 0).select(
        (F.col("ct").cast("string") != F.col("text")).alias("differs")
    ).collect()
    assert not sample or sample[0].differs
    return enc.select(
        "doc_id",
        F.aes_decrypt(F.col("ct"), key.cast("binary")).cast("string").alias("text"),
    )


@query(
    "scan_glob_recursive",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(YEAR(o_orderdate) AS BIGINT) AS y
    FROM orders WHERE YEAR(o_orderdate) IN (1996, 1997)
    """,
    group="A",
)
def scan_glob_recursive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glob-targeted reads over a nested (non-Hive) directory tree: data
    landed by an external process as ``dump/y=<year>/part*.parquet``
    without _metadata or partition discovery — the messy-data-lake
    reality.  ``recursiveFileLookup`` walks the tree, the path GLOB
    selects two years at LISTING time (files outside the glob are never
    opened — the poor man's partition pruning when there is no Hive
    layout), and the year column is recovered from the file path since
    non-Hive trees don't materialize it."""
    import shutil

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.year("o_orderdate").alias("y")
    )
    root = _workdir(sf_dir, "orders_nested_dump")
    if not os.path.exists(f"{root}/_DONE"):
        shutil.rmtree(root, ignore_errors=True)
        years = [r.y for r in o.select("y").distinct().collect()]
        for y in years:
            (
                o.filter(F.col("y") == y)
                .drop("y")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{root}/y={y}/deep")
            )
        open(f"{root}/_DONE", "w").close()
    got = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{root}/y={{1996,1997}}")
    )
    return got.select(
        "o_orderkey",
        "o_totalprice",
        F.regexp_extract(F.input_file_name(), r"y=(\d{4})", 1)
        .cast("bigint")
        .alias("y"),
    )


@query(
    "agg_ivm_update",
    oracle="""
    WITH final AS (
        SELECT o_custkey,
               CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 11 <> 0
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 500
                    ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
        FROM orders
        WHERE o_orderkey % 97 <> 0 AND o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY o_custkey
    """,
    group="A",
)
def agg_ivm_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (``etl.ivm_merge``): a materialized
    per-customer COUNT/SUM(cents) aggregate is brought up to date under a
    CDC delta — inserts (keys %97==0), deletes (base keys %11==0), and
    repricings (+5.00 on base keys %13==0 not deleted) — by merging the
    delta's signed per-group effects, never re-aggregating the base.

    The oracle recomputes the FINAL state from scratch, so the value-hash
    proves the delta algebra (insert +1/+v, delete −1/−v, update +Δ,
    count-0 groups dropped) exactly.  Exact-integer discipline: money as
    BIGINT cents on both sides (the DECIMAL landmine).

    Scale: the MV is only ever the stream side of broadcast anti/semi
    joins; the only Exchange carrying base-sized data is the ONE that
    builds the MV itself (which at 100 TB would already exist on disk)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    key = F.col("o_orderkey")
    base = o.filter(key % 97 != 0).select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    mv = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )
    inserts = o.filter(key % 97 == 0).select(
        "o_custkey", F.lit(1).alias("n_orders"), cents.alias("sum_cents")
    )
    deletes = base.filter(key % 11 == 0).select(
        "o_custkey",
        F.lit(-1).alias("n_orders"),
        (-F.col("cents")).alias("sum_cents"),
    )
    updates = base.filter((key % 13 == 0) & (key % 11 != 0)).select(
        "o_custkey", F.lit(0).alias("n_orders"), F.lit(500).alias("sum_cents")
    )
    delta = (
        inserts.unionByName(deletes)
        .unionByName(updates)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    out = etl.ivm_merge(mv, delta, ["o_custkey"], "n_orders", ["sum_cents"])
    return out.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )


@query(
    "sink_python_datasource",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS id,
           o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 10 = 0
    """,
    group="A",
)
def sink_python_datasource_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON data-source WRITER (Spark 4 DataSource API), the sink
    half of scan_python_datasource: each task stages its partition in a
    uniquely-named temp file and hands the path back as a commit message;
    only the driver's commit() renames staged files into place, abort()
    deletes them — so task retries can never leave a half-visible file
    (the task-temp + driver-commit protocol every distributed sink needs;
    see postpy_spark/sources.py::_JsonlWriter).  The round-trip re-reads
    the committed JSONL with an explicit schema and must reproduce the
    projection exactly — integer cents, no float JSON payload."""
    import shutil

    from postpy_spark import sources

    sources.register(spark)
    out = _workdir(sf_dir, "py_sink_jsonl")
    shutil.rmtree(out, ignore_errors=True)
    d = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d.select(
        F.col("o_orderkey").cast("bigint").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).write.format("pp_synth").option("path", out).mode("append").save()
    return spark.read.schema("id BIGINT, status STRING, cents BIGINT").json(out)
