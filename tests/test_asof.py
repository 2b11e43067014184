"""Unit tests for the as-of join operator (edge cases the synthetic tables
don't hit: equal timestamps, unmatched keys, NULL payload fields)."""

import datetime

from pyspark.sql import Row

from postpy_spark.operators.asof import asof_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def make_frames(spark):
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", t=ts("2024-01-01T10:00:00")),
            Row(id=2, k="a", t=ts("2024-01-01T12:00:00")),
            Row(id=3, k="b", t=ts("2024-01-01T09:00:00")),
            Row(id=4, k="c", t=ts("2024-01-01T09:00:00")),  # no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=ts("2024-01-01T09:30:00"), v=1.0),
            Row(k="a", rt=ts("2024-01-01T12:00:00"), v=2.0),  # ties left id=2
            Row(k="b", rt=ts("2024-01-01T09:30:00"), v=3.0),  # after left id=3
            Row(k="b", rt=ts("2024-01-01T08:00:00"), v=None),  # NULL payload field
        ]
    )
    return left, right


def test_backward_match_and_ties(spark):
    left, right = make_frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k", left_time="t", right_time="rt",
        right_cols=["v"], include_right_time="matched_rt",
    )
    got = {r.id: (r.v, r.matched_rt) for r in out.collect()}
    assert got[1] == (1.0, ts("2024-01-01T09:30:00"))
    # equal timestamps match (>= semantics)
    assert got[2] == (2.0, ts("2024-01-01T12:00:00"))
    # NULL payload *field* must be carried, not skipped for an older row
    assert got[3] == (None, ts("2024-01-01T08:00:00"))
    # unmatched key → left row kept with NULLs
    assert got[4] == (None, None)


def test_strict_excludes_equal_ts(spark):
    left, right = make_frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k", left_time="t", right_time="rt",
        right_cols=["v"], include_right_time="matched_rt", strict=True,
    )
    got = {r.id: (r.v, r.matched_rt) for r in out.collect()}
    # id=2 at 12:00 must now match the 09:30 row, not the equal-ts one
    assert got[2] == (1.0, ts("2024-01-01T09:30:00"))


def test_single_shuffle_plan(spark):
    """The as-of join must be one window over a union — a single exchange,
    no join node (the 100 TB property)."""
    left, right = make_frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k", left_time="t", right_time="rt",
        right_cols=["v"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # key hash partitioning (+AQE read)


def test_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    """asof_nearest_join: closest match either direction; equidistant →
    backward; tolerance bounds both directions; one fused WindowExec."""
    from postpy_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [
            Row(id=1, k="a", t=100),   # back at 90 (d=10), fwd at 130 (d=30) → back
            Row(id=2, k="a", t=125),   # back at 90 (d=35), fwd at 130 (d=5) → fwd
            Row(id=3, k="a", t=110),   # back 90 (d=20) vs fwd 130 (d=20) → tie → back
            Row(id=4, k="a", t=500),   # nearest is 130 (d=370) > tol → NULL
            Row(id=5, k="b", t=7),     # only fwd at 10 (d=3) → fwd
            Row(id=6, k="c", t=1),     # no right rows → NULL
            Row(id=7, k="a", t=130),   # exact match, d=0
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=90, v="r90"),
            Row(k="a", rt=130, v="r130"),
            Row(k="b", rt=10, v="r10"),
        ]
    )
    out = asof_nearest_join(
        left, right, left_on="k", right_on="k", left_time="t", right_time="rt",
        right_cols=["v"], include_right_time="mrt", tolerance=100,
    )
    got = {r.id: (r.v, r.mrt) for r in out.collect()}
    assert got[1] == ("r90", 90)
    assert got[2] == ("r130", 130)
    assert got[3] == ("r90", 90)      # tie → backward
    assert got[4] == (None, None)     # beyond tolerance
    assert got[5] == ("r10", 10)      # forward-only match
    assert got[6] == (None, None)     # unmatched key
    assert got[7] == ("r130", 130)    # exact

    # Both direction frames ride ONE partitioning (single exchange, never
    # a join — the 100 TB property).  The forward frame runs on the
    # REVERSED sort's running frame (the O(n) incremental path; the
    # [currentRow, unboundedFollowing] frame re-aggregates per row,
    # O(partition²)), so exactly TWO sorts — asc + desc — share that one
    # exchange.  AQE's toString prints Final + Initial plans; inspect the
    # final one only.
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    import re
    assert len(re.findall(r"\bSort \[", final)) == 2, final
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "Join" not in final, final
