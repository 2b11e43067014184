#!/usr/bin/env python
"""Side-by-side steady-state timings: Spark (our engine) vs DuckDB running
the oracle SQL for the same headline queries at the same scale factor.
Context for BASELINE.md's 2× envelope — not part of the driver contract
(bench.py stays the single-line contract output).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from bench import HEADLINE, force  # noqa: E402
from postpy_spark import registry  # noqa: E402
from postpy_spark.io import TABLES  # noqa: E402
from postpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("postpy-bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg = registry.load_all()
    names = [n for n in HEADLINE if n in reg and reg[n].oracle]

    for n in names:  # warm both engines
        force(reg[n].fn(spark, sf_dir))
        con.execute(reg[n].oracle).fetchall()

    rows = []
    for n in names:
        t0 = time.perf_counter()
        force(reg[n].fn(spark, sf_dir))
        spark_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(reg[n].oracle).fetchall()
        duck_s = time.perf_counter() - t0
        rows.append((n, spark_s, duck_s))

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print(f"{'query':26s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for n, s, d in rows:
        print(f"{n:26s} {s:8.3f} {d:8.3f} {s / max(d, 1e-9):7.1f}x")
    print(f"{'TOTAL':26s} {total_s:8.3f} {total_d:8.3f} {total_s / total_d:7.1f}x")
    print(
        json.dumps(
            {"spark_total_sec": round(total_s, 3), "duckdb_total_sec": round(total_d, 3)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
