"""Golden-output regression net for the remaining probabilistic operators.

The recall/tolerance gates (test_llm_ops) verify QUALITY; they would not
catch a silent change in hyperplane seeding, IVF cell assignment, or the
sampling draw that still lands inside tolerance.  With fixed seeds all four
ops are deterministic on a fixed session config (rand(seed) is
per-partition-deterministic; the sf0.001 parquet layout and the test
session's partitioning are both pinned), so the exact sf0.001 outputs are
committed as data (fixtures_golden_probabilistic.json, regenerate with this
file's __main__ block after an INTENTIONAL algorithm change) and asserted
byte-for-byte here — the same net test_golden_dedup.py provides for
MinHash/SimHash.
"""

import json
import os

import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures_golden_probabilistic.json"
)
SF_GOLD = "/root/testdata/sf0.001"

KEYS = {
    # query name -> (sort key columns, float columns rounded at capture)
    "sim_ann_lsh": ["query_id", "cand_id"],
    "sim_ivf_topk": ["query_id", "cand_id"],
    "sample_weighted": ["doc_id"],
    "sample_stratified": ["doc_id"],
    # content-hash draw: deterministic by construction (partition-invariant)
    "sample_mixture_stable": ["doc_id"],
}


def _snapshot(spark, name):
    from postpy_spark.registry import load_all

    df = load_all()[name].fn(spark, SF_GOLD)
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        row = []
        for c in cols:
            v = r[c]
            row.append(round(v, 6) if isinstance(v, float) else v)
        rows.append(row)
    rows.sort(key=lambda row: tuple(str(x) for x in row))
    return {"columns": cols, "rows": rows}


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(KEYS))
def test_probabilistic_output_matches_golden(spark, golden, name):
    got = _snapshot(spark, name)
    want = golden[name]
    assert got["columns"] == want["columns"]
    assert got["rows"] == want["rows"], (
        f"{name}: {len(got['rows'])} rows vs golden {len(want['rows'])} — "
        "if the algorithm change was intentional, regenerate with "
        "`python tests/test_golden_probabilistic.py`"
    )


if __name__ == "__main__":  # regeneration helper
    from postpy_spark.session import get_spark

    spark = get_spark("golden-probabilistic", shuffle_partitions=8)
    out = {"sf_dir": SF_GOLD}
    for name in sorted(KEYS):
        out[name] = _snapshot(spark, name)
        print(f"{name}: {len(out[name]['rows'])} rows")
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1)
    print(f"regenerated {GOLDEN}")
