"""operators/intervals.overlap_join_binned — equivalence to the naive theta
join, half-open boundary semantics, multi-bucket de-dup, and the plan
contract (bucket equi-join, never a nested loop)."""

from pyspark.sql import functions as F

from postpy_spark.operators.intervals import overlap_join_binned

W = 10  # tiny bucket width so single intervals span many buckets


def _frames(spark):
    # [s, e) microsecond-style integer bounds; ids disjoint across frames
    a_rows = [
        (1, 0, 25),    # spans buckets 0,1,2
        (2, 30, 31),   # single-point-ish
        (3, 95, 100),  # ends exactly on a boundary — must not touch bucket 10
        (4, 200, 200), # degenerate [s,s): behaves as a POINT under the
                       # standard predicate (s < b_e AND b_s < s)
    ]
    b_rows = [
        (10, 5, 12),    # overlaps a1 in two shared buckets (dedup check)
        (11, 25, 40),   # touches a1 at 25 exactly: half-open → NO overlap; hits a2
        (12, 100, 110), # touches a3 at 100 exactly → NO overlap
        (13, 0, 300),   # long interval: overlaps a1, a2, a3 (not empty a4)
    ]
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long")
    return a, b


def test_overlap_matches_naive_theta(spark):
    a, b = _frames(spark)
    got = sorted(
        (r.a_id, r.b_id)
        for r in overlap_join_binned(
            a, b, a_start="a_s", a_end="a_e",
            b_start="b_s", b_end="b_e", bucket_width_us=W,
        ).collect()
    )
    naive = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b, (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
        ).collect()
    )
    assert got == naive
    assert (1, 10) in got          # multi-shared-bucket pair appears ONCE
    assert (1, 11) not in got      # half-open: touching at a point ≠ overlap
    assert (3, 12) not in got
    # degenerate [200,200) is inside b13=[0,300) → the standard predicate
    # (and therefore the binned op) reports it, as a point would be
    assert (4, 13) in got
    assert len(got) == len(set(got))


def test_overlap_plan_is_equi_join(spark):
    a, b = _frames(spark)
    plan = (
        overlap_join_binned(
            a, b, a_start="a_s", a_end="a_e",
            b_start="b_s", b_end="b_e", bucket_width_us=W,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
