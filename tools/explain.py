#!/usr/bin/env python
"""Dump the formatted physical plan of registered queries.

    python tools/explain.py agg_groupby join_asof      # named queries
    python tools/explain.py --all                      # everything (slow)

The plan is what the performance contract pins (tests/test_plan_shapes.py);
this tool is the human-inspection path: check PushedFilters / ReadSchema /
broadcast choices / WholeStageCodegen spans after touching an operator.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postpy_spark import registry  # noqa: E402
from postpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    reg = registry.load_all()
    names = list(reg) if "--all" in sys.argv else args
    if not names:
        print(__doc__)
        print("registered:", ", ".join(reg))
        return
    spark = get_spark("postpy-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in reg:
            print(f"== {name}: NOT REGISTERED ==")
            continue
        print(f"\n{'=' * 70}\n== {name}\n{'=' * 70}")
        df = reg[name].fn(spark, sf_dir)
        df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
