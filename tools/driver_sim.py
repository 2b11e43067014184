#!/usr/bin/env python
"""Plain-session driver simulation over EVERY registered query.

The external driver creates its own vanilla SparkSession (no engine
confs, arbitrary cwd) and consumes queries by count()/collect().  The
local oracle gate (tools/check.py) runs under get_spark() and compares
collected VALUES — so two whole failure classes are structurally
invisible to it:

- runtime-conf dependence (ensure_runtime_confs not reachable from some
  entry point);
- count()-only consumer shapes, where aggressive pruning changes plan
  legality (r8 find: scan_json_corrupt's corrupt-record filter).

This tool replays the driver's exact shape: chdir to a scratch dir,
plain builder session, run every ``queries()`` entry at ``--sf`` and
count() it.  Exit 1 on any failure.

Usage:  python tools/driver_sim.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.chdir(tempfile.mkdtemp(prefix="driver_sim_"))
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    bad: list[tuple[str, str]] = []
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            n = fn(spark, args.sf).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — report, don't mask
            bad.append((name, str(ex).splitlines()[0][:160]))
        if (i + 1) % 50 == 0:
            print(
                f"{i + 1}/{len(qs)} done, {len(bad)} failures,"
                f" {time.time() - t0:.0f}s",
                flush=True,
            )
    print(f"TOTAL {len(qs)} FAILURES {len(bad)}")
    for name, msg in bad:
        print(f"FAIL  {name}: {msg}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
