"""SparkSession factory and runtime configuration.

postpy's analog is ``postpy/connections.py::connect`` [U] — a psycopg2
connection factory reading ``PGHOST/PGDATABASE/PGUSER/PGPASSWORD`` env vars
(SURVEY.md §2.A ``conn_env``).  Here the "connection" is a SparkSession; the
factory reads ``SPARK_GRAFT_*`` env knobs and applies scale-aware defaults.

Two layers:

- :func:`get_spark` — build a session with our defaults (used by tests,
  ``bench.py``, and standalone use).
- :func:`ensure_runtime_confs` — idempotently apply the *runtime-settable*
  confs to an externally-created session (the correctness driver builds its
  own SparkSession, so every query entry point funnels through this).

Scale posture (SURVEY.md §4.2): AQE on (runtime coalesce + skew-join split),
CBO hints honoured, broadcast threshold explicit, session timezone pinned to
UTC so timestamp semantics match a naive/UTC oracle, and the legacy
nanos-as-long switch set because the ``events`` table stores
``timestamp[ns]`` which Spark's vectorized Parquet reader otherwise rejects.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that can be flipped on a live session (SQLConf, not static).
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp type.
    # Read as bigint nanos, convert to µs in io.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Pin timezone: ts arithmetic must match the (naive) DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime partition coalescing, skew-join splitting,
    # and shuffle-hash/broadcast rewrites. The 100 TB posture relies on this.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # ANSI off: permissive casts/overflow like PostgreSQL's implicit behavior
    # postpy users relied on; also matches DuckDB's non-failing arithmetic.
    "spark.sql.ansi.enabled": "false",
    # Arrow for any pandas_udf / toPandas edge (group E operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Streaming state-store provider (SURVEY.md §4.2 / docs/SCALE.md).  The
# default HDFS-backed provider keeps every stateful operator's state on the
# executor HEAP — at 100 TB-scale streaming (millions of session/dedup/agg
# keys per executor) that is an OOM, GC-pause, and recovery-time hazard.
# RocksDB spills state to local disk with bounded memory and incremental
# (changelog) checkpoints.  Opt-in rather than default because at local test
# scale the JNI round-trips are pure overhead, and batch-only users never
# touch a state store.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
ROCKSDB_STATE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    # Changelog checkpointing uploads per-batch deltas instead of full
    # RocksDB snapshots — the difference between O(state) and O(delta)
    # checkpoint latency on large state.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def rocksdb_state_requested() -> bool:
    """Env-level opt-in: ``SPARK_GRAFT_ROCKSDB_STATE=1`` (or true/yes)."""
    return os.environ.get("SPARK_GRAFT_ROCKSDB_STATE", "").lower() in (
        "1",
        "true",
        "yes",
    )


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


import weakref

_ENSURED_SESSIONS: weakref.WeakSet = weakref.WeakSet()


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs to an existing session.

    Called at the top of every registered query so driver-created sessions
    behave identically to ours.  Guarded per-session: each conf check is a
    Py4J roundtrip, and load_table runs several times per query — ~40
    roundtrips/query of pure overhead without the guard.  The guard is a
    ``WeakSet`` of the SparkSession objects themselves (not ``id()`` values,
    which CPython reuses after garbage collection — a recycled id could
    silently skip a NEW session and run it without nanosAsLong/UTC).
    """
    if spark in _ENSURED_SESSIONS:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Conf unknown to this build — skip rather than fail the query.
            pass
    try:
        _ENSURED_SESSIONS.add(spark)
    except TypeError:
        pass  # non-weakrefable session stand-in (tests/mocks): no guard, still correct
    return spark


def get_spark(
    app_name: str = "postpy-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (driver contract).
    ``spark.sql.shuffle.partitions`` defaults to the parallelism — at local
    test scale big shuffle fan-out is pure overhead, and at cluster scale the
    deployer overrides it (AQE coalesces down from whatever is set).
    """
    n = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # CBO needs ANALYZE-collected stats to help; without them it is pure
        # planner overhead (~10% on join-heavy queries, measured). Deployers
        # who run ANALYZE TABLE ... COMPUTE STATISTICS should flip this on.
        .config("spark.sql.cbo.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    # Session-level RocksDB state store: explicit param wins, else env
    # opt-in (SPARK_GRAFT_ROCKSDB_STATE=1).  The transformWithState path
    # (streaming.py) additionally pins the provider itself because that
    # operator REQUIRES RocksDB regardless of the session default.
    if rocksdb_state if rocksdb_state is not None else rocksdb_state_requested():
        for k, v in ROCKSDB_STATE_CONFS.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_runtime_confs(spark)
    return spark
