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
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose correct result IS empty at the sf0.01 tier (semantics, not
#: accident): except_ab subtracts a superset, join_anti_not_in's NOT IN list
#: covers every key, tpch_q22_shape's no-orders-customer filter matches no
#: row at this sf.  Everything else returning 0 rows is a failure — an
#: empty result under a plain session is exactly the silent-break class
#: this simulator exists to catch (r8 advice: `n >= 0` was vacuous).
EMPTY_OK = {"except_ab", "join_anti_not_in", "tpch_q22_shape"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--counts-out",
        default=None,
        help="optional path to write {query: row_count} JSON",
    )
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
    counts: dict[str, int] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            n = fn(spark, args.sf).count()
            counts[name] = n
            if n == 0 and name not in EMPTY_OK:
                bad.append((name, "EMPTY RESULT (0 rows, not in EMPTY_OK)"))
        except Exception as ex:  # noqa: BLE001 — report, don't mask
            bad.append((name, str(ex).splitlines()[0][:160]))
        if (i + 1) % 50 == 0:
            print(
                f"{i + 1}/{len(qs)} done, {len(bad)} failures,"
                f" {time.time() - t0:.0f}s",
                flush=True,
            )
    if args.counts_out:
        with open(args.counts_out, "w") as fh:
            json.dump(counts, fh, indent=1, sort_keys=True)
    print(f"TOTAL {len(qs)} FAILURES {len(bad)}")
    for name, msg in bad:
        print(f"FAIL  {name}: {msg}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
