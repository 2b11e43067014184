"""Golden-pair regression net for the probabilistic dedup operators.

The recall/precision gates (test_llm_ops) verify QUALITY; they would not
catch a silent change in banding, seeding, or hashing that still lands
inside the tolerance.  With fixed seeds both pipelines are deterministic,
so the exact sf0.001 pair sets are committed as data
(fixtures_golden_dedup.json, regenerate with this file's __main__ block
after an INTENTIONAL algorithm change) and asserted byte-for-byte here.
"""

import json
import os

import pytest

from postpy_spark.io import load_table
from postpy_spark.operators import dedup

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures_golden_dedup.json")
SF_GOLD = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_GOLD, "documents")


def test_minhash_pairs_match_golden(spark, docs, golden):
    got = sorted(
        [r.id_a, r.id_b, r.jaccard]
        for r in dedup.minhash_dedup_pairs(docs).collect()
    )
    assert got == sorted(golden["minhash_defaults"]["pairs"])


def test_simhash_pairs_match_golden(spark, docs, golden):
    got = sorted(
        [r.id_a, r.id_b, r.hamming]
        for r in dedup.simhash_near_pairs(docs).collect()
    )
    assert got == sorted(golden["simhash_defaults"]["pairs"])


if __name__ == "__main__":  # regeneration helper
    from postpy_spark.session import get_spark

    spark = get_spark()
    d = load_table(spark, SF_GOLD, "documents")
    out = {
        "sf_dir": SF_GOLD,
        "minhash_defaults": {
            "pairs": sorted(
                [r.id_a, r.id_b, r.jaccard]
                for r in dedup.minhash_dedup_pairs(d).collect()
            )
        },
        "simhash_defaults": {
            "pairs": sorted(
                [r.id_a, r.id_b, r.hamming]
                for r in dedup.simhash_near_pairs(d).collect()
            )
        },
    }
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1)
    print(f"regenerated {GOLDEN}")
