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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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

    class _TaskCommit(WriterCommitMessage):
        """Per-task commit message: the staged temp file + its row count."""

        def __init__(self, tmp_path: str, n_rows: int) -> None:
            self.tmp_path = tmp_path
            self.n_rows = n_rows

    class _JsonlWriter(DataSourceWriter):
        """Exactly-once JSONL sink: each task stages its rows in a
        uniquely-named temp file and returns the path as its commit
        message; only the DRIVER's commit() renames staged files into
        place (abort() deletes them), so a retried/zombie task can never
        leave a half-visible file — the classic task-temp + driver-commit
        protocol every distributed sink needs.  Local-FS rename here; on a
        cluster the same protocol runs against shared storage."""

        def __init__(self, options: dict, overwrite: bool = False) -> None:
            path = options.get("path")
            if not path:
                raise ValueError("pp_synth writer requires .option('path', ...)")
            self.path = path
            self.overwrite = overwrite

        def write(self, iterator) -> "_TaskCommit":
            import json as _json
            import os as _os
            import uuid as _uuid

            _os.makedirs(self.path, exist_ok=True)
            tmp = _os.path.join(self.path, f"_staged_{_uuid.uuid4().hex}.jsonl")
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return _TaskCommit(tmp, n)

        def commit(self, messages) -> None:
            """Driver-side publish.  Atomicity caveat (r11 advice): each
            individual rename is atomic, but the overwrite sweep + renames
            are NOT one atomic unit — a concurrent reader listing the
            directory mid-commit can observe a partially emptied/partially
            renamed set.  Same window every file-listing-based sink has
            without a manifest (docs/SCALE.md); readers needing a
            consistent snapshot should read through ``merge_versioned``'s
            manifest commit instead."""
            import glob as _glob
            import os as _os

            # staged files belonging to THIS job get renamed below; any
            # other _staged_* in the directory is by definition the litter
            # of a previously aborted job (abort() only runs when the
            # driver survives) — sweep them so aborted runs can't
            # accumulate orphans (r11 advice).
            ours = {m.tmp_path for m in messages if m is not None}
            for stale in _glob.glob(_os.path.join(self.path, "_staged_*.jsonl")):
                if stale not in ours:
                    _os.remove(stale)
            if self.overwrite:
                # mode('overwrite') must not leave stale part files from a
                # previous job visible to a re-read (r10 advice): clear every
                # committed part-* BEFORE renaming the staged files in.  The
                # staged files use a distinct _staged_* prefix, so they are
                # never swept.  Driver-side only — still atomic per-file.
                for old in _glob.glob(_os.path.join(self.path, "part-*.jsonl")):
                    _os.remove(old)
            for i, m in enumerate(messages):
                if m is None:
                    continue
                final = _os.path.join(self.path, f"part-{i:05d}.jsonl")
                _os.replace(m.tmp_path, final)

        def abort(self, messages) -> None:
            import os as _os

            for m in messages:
                if m is not None and _os.path.exists(m.tmp_path):
                    _os.remove(m.tmp_path)

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

        def writer(self, schema, overwrite: bool) -> "_JsonlWriter":
            return _JsonlWriter(self.options, overwrite=overwrite)

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
