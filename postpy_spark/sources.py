"""Custom Python data sources (Spark 4 DataSource V2 Python API).

postpy's surface was "read rows out of a system psycopg2 can talk to"; the
Spark-4 analog for arbitrary systems without a JVM connector is the Python
DataSource API: implement partitions() + read() and the source becomes a
first-class, partition-parallel ``spark.read.format(...)`` — pushdown-free
but fully distributed (one Python task per InputPartition, Arrow-batched
back to the JVM).

``SyntheticSource`` here is deliberately simple and DETERMINISTIC (id +
tag derived from id) so the contract query can be oracle-checked; it
demonstrates the partitioning contract, not a specific backend.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

N_PARTITIONS = 4


def _build_synthetic_source():
    """Factory producing the source classes at FUNCTION scope.

    ``spark.dataSource.register`` cloudpickles the DataSource class to the
    data-source worker process.  A module-level class pickles by REFERENCE
    (worker must be able to ``import postpy_spark`` — only true when the
    driver's cwd happens to be the repo root); function-scope classes pickle
    by VALUE, with all cross-references closure-captured, so registration
    works under any driver cwd/PYTHONPATH."""
    n_partitions = N_PARTITIONS

    class _SyntheticReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 100))

        def partitions(self) -> list[InputPartition]:
            return [InputPartition(i) for i in range(n_partitions)]

        def read(self, partition: InputPartition):
            # round-robin striping: each partition yields its residue class,
            # so the union over partitions is exactly range(n)
            for k in range(partition.value, self.n, n_partitions):
                yield (k, f"r{k}", float(k) * 1.5)

    class _SyntheticStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batch reader over the same synthetic rows:
        each batch serves ``batch_size`` rows and advances the committed
        offset, so restarts resume exactly where the checkpoint left off —
        the custom-source analog of a Kafka offset range."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 100))
            self.batch_size = int(options.get("batch_size", 10))

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def read(self, start: dict):
            pos = int(start["pos"])
            end = min(pos + self.batch_size, self.n)
            rows = [(k, f"r{k}", float(k) * 1.5) for k in range(pos, end)]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(
                (k, f"r{k}", float(k) * 1.5)
                for k in range(int(start["pos"]), int(end["pos"]))
            )

    class SyntheticSource(DataSource):
        """``spark.read.format("pp_synth").option("n", 1000)``."""

        @classmethod
        def name(cls) -> str:
            return "pp_synth"

        def schema(self) -> str:
            return "id BIGINT, tag STRING, score DOUBLE"

        def reader(self, schema) -> DataSourceReader:
            return _SyntheticReader(self.options)

        def simpleStreamReader(self, schema) -> "_SyntheticStreamReader":
            return _SyntheticStreamReader(self.options)

    return SyntheticSource


SyntheticSource = _build_synthetic_source()


#: Sessions that already completed a register() call — the primary idempotence
#: mechanism; message-matching below is only a fallback for the cross-process
#: case (same session object observed by a fresh import of this module).
_registered_sessions: set[int] = set()


def register(spark) -> None:
    """Idempotently register the source on a session.  Only the
    duplicate-registration error is swallowed — a genuine failure (API
    mismatch, bad source class) must surface HERE, not later as a
    confusing 'format not found' on read.

    Idempotence is tracked per session id first (robust to Spark rewording
    the duplicate-registration message); the message match stays as a
    fallback when a different module instance registered on this session."""
    if id(spark) in _registered_sessions:
        return
    try:
        spark.dataSource.register(SyntheticSource)
    except Exception as exc:  # noqa: BLE001 — narrowed by message below
        msg = str(exc)
        if not ("already" in msg.lower() and "regist" in msg.lower()):
            raise
    _registered_sessions.add(id(spark))
