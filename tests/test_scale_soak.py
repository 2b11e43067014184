"""Small-configuration scale-and-skew soak (r7 verdict item 2).

Runs the same planted-pathology machinery as tools/scale_soak.py at
mult=3 on sf0.01 (~30k events, 1.5k docs/embeddings) so the three soak
guarantees — caps engage, ~linear growth, zero failed tasks — are gated
per-round inside the normal suite.  The full tier (mult=16 on sf0.1) is
run manually via the tool; its results live in docs/SCALE_SOAK.md.
"""

import pytest

from tools.scale_soak import (
    SLACK,
    SOAK_OPS,
    engagement_stats,
    run_soak,
    synthesize,
)

BASE = "/root/testdata/sf0.01"
MULT = 3


@pytest.fixture(scope="module")
def soak_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("soak") / f"m{MULT}")
    synthesize(spark, BASE, out, MULT)
    return out


def test_planted_caps_engage(spark, soak_dir):
    eng = engagement_stats(spark, soak_dir)  # asserts each cap internally
    assert eng["minhash"]["hot_buckets"] > 0
    assert eng["containment"]["stop_grams"] > 0
    assert eng["semantic"]["hot_buckets"] > 0
    assert 0.15 <= eng["hot_user_share"] <= 0.3


def test_soak_no_failed_tasks(spark, soak_dir):
    """Caps + zero-failed-tasks only.  The wall-clock growth ratio is NOT
    asserted here: bench wall-clock swings ±25% with driver-machine load
    (docs/BENCH_NOTES.md), so a loaded machine during the base timing
    could flake the pre-commit suite (r8 advice).  The timing-ratio bound
    lives in the manual tier — tools/scale_soak.py at mult=16 — whose
    interleaved results are committed in docs/SCALE_SOAK.md.

    soak_only: each op runs ONCE on the soaked tier (the surface the
    failed-task gate actually inspects) — the base/warm passes bought
    nothing this test asserts and cost ~3 of the suite's 31 minutes
    (r15: the driver's pytest budget is the binding constraint)."""
    rows, problems = run_soak(spark, BASE, soak_dir, MULT, soak_only=True)
    assert not problems, problems
    assert set(rows["ops"]) == set(SOAK_OPS)
    for name, r in rows["ops"].items():
        assert r["failed_tasks"] == 0, (name, r)
        assert r["soak_s"] > 0, (name, r)


def test_crossdoc_spans_stop_grams_engage_on_plant(spark, soak_dir):
    """The boilerplate footer planted into ~30% of the soaked docs pushes
    its 6-grams far past df_cap=10, and the near-dup replicas push most
    shared grams past it too — crossdoc_spans must STOP those grams
    (counted in stats) rather than posting-join them, the cap that keeps
    the pair stage off the quadratic path at the real tier."""
    from postpy_spark.io import load_table
    from postpy_spark.operators import dedup

    docs = load_table(spark, soak_dir, "documents")
    stats: dict = {}
    out = dedup.crossdoc_spans(
        docs, k=6, df_cap=10, occ_cap=50, min_span=8, stats=stats
    )
    n = out.count()
    assert stats["stop_grams"] > 0, stats
    assert n >= 0  # bounded output; exact parity rides the 16x SOAK_SWEEP
