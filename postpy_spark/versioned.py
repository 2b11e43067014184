"""Versioned path-based tables: snapshot reads + rollback on plain parquet.

Round-1 gap: ``txn_exec`` documented that completed data writes could not
be rolled back (no Delta/Iceberg in the environment).  This module closes
that honestly with the classic manifest-pointer scheme those formats build
on:

    root/
      _versions/v00000001/   immutable parquet snapshot
      _versions/v00000002/
      _current               one-line pointer file, swapped atomically

Writers stage a NEW immutable version directory and then ``os.replace`` the
pointer (atomic on POSIX) — a reader that resolved the pointer before the
swap keeps reading its (immutable) snapshot to completion, one that
resolves after sees the new version, and no reader ever observes a
half-written table.  Rollback is a pointer move; old versions stay until
``vacuum``.

Scale notes: the pointer file is tiny metadata — data I/O is unchanged
parquet; version directories lay out exactly like any partitioned table, so
all scan-side behavior (pushdown, pruning, split sizing) is unaffected.  On
object stores without atomic rename, the pointer swap needs a conditional
PUT (the same requirement Delta's LogStore has); documented, not emulated.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSIONS = "_versions"
_CURRENT = "_current"


class VersionedTable:
    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")
        os.makedirs(os.path.join(self.root, _VERSIONS), exist_ok=True)

    # -- internals ----------------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.root, _CURRENT)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, _VERSIONS, f"v{version:08d}")

    def _swap_pointer(self, version: int) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"v{version:08d}\n")
        os.replace(tmp, self._pointer())  # atomic on POSIX

    # -- API ----------------------------------------------------------------

    def versions(self) -> list[int]:
        vs = []
        for name in sorted(os.listdir(os.path.join(self.root, _VERSIONS))):
            # exactly v + 8 digits: abandoned *.staging dirs are not versions
            if name.startswith("v") and name[1:].isdigit() and len(name) == 9:
                vs.append(int(name[1:]))
        return vs

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                content = f.read().strip()
        except FileNotFoundError:
            return None
        # exactly v + digits; a truncated/corrupt pointer must fail loudly,
        # not surface later as int('') or a bogus version number
        if not (content.startswith("v") and content[1:].isdigit()):
            raise ValueError(
                f"corrupt version pointer {self._pointer()!r}: {content!r}"
            )
        return int(content[1:])

    def write(self, df: DataFrame) -> int:
        """Commit df as the next version (immutable snapshot + pointer swap)."""
        version = (max(self.versions(), default=0)) + 1
        staging = self._vdir(version) + ".staging"
        try:
            df.write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)  # failed txn leaves no trace
            raise
        os.replace(staging, self._vdir(version))
        self._swap_pointer(version)
        return version

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the current (or a pinned) snapshot — time travel included."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root} has no commits")
        return spark.read.parquet(self._vdir(v))

    def rollback(self, to_version: int | None = None) -> int:
        """Repoint to an earlier committed version (default: previous).
        The abandoned version's directory remains until vacuum()."""
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError("nothing to roll back")
        vs = self.versions()
        if to_version is None:
            older = [v for v in vs if v < cur]
            if not older:
                raise ValueError("no earlier version to roll back to")
            to_version = older[-1]
        if to_version not in vs:
            raise ValueError(f"unknown version {to_version}")
        self._swap_pointer(to_version)
        return to_version

    def upsert(self, spark: SparkSession, source: DataFrame, keys: list[str]) -> int:
        """Keyed upsert as a snapshot commit: read the current version,
        merge (source wins on key collision), commit the result as a new
        version — MERGE INTO with rollback, on plain parquet.  Single-writer
        (the pointer swap is atomic but last-writer-wins; concurrent
        upserters need an external lock, same as Delta without a LogStore)."""
        from postpy_spark.etl import merge_upsert

        try:
            current = self.read(spark)
            merged = merge_upsert(current, source, keys)
        except FileNotFoundError:
            merged = source.dropDuplicates(keys)
        return self.write(merged)

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop version dirs older than the newest ``keep``, never the
        current pointer's target.  Returns removed versions."""
        vs = self.versions()
        cur = self.current_version()
        # keep<=0 means "only the current pointer's target" — vs[-0:] would
        # slice the WHOLE list and make vacuum(keep=0) a silent no-op
        newest = set(vs[-keep:]) if keep > 0 else set()
        keep_set = newest | ({cur} if cur is not None else set())
        removed = []
        for v in vs:
            if v not in keep_set:
                shutil.rmtree(self._vdir(v), ignore_errors=True)
                removed.append(v)
        return removed
