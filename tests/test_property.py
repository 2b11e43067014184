"""Property-based algebraic invariants (SURVEY.md §5.2 property layer).
Small frames, few examples — each property runs real Spark actions."""

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from postpy_spark.operators.asof import asof_join
from postpy_spark.operators.dedup import exact_dedup

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ints = st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=12)


@given(xs=ints, ys=ints)
@SLOW
def test_union_count_additive(spark, xs, ys):
    a = spark.createDataFrame([Row(v=x) for x in xs], "v INT")
    b = spark.createDataFrame([Row(v=y) for y in ys], "v INT")
    assert a.unionByName(b).count() == len(xs) + len(ys)
    assert a.unionByName(b).distinct().count() == len(set(xs) | set(ys))


@given(xs=ints, ys=ints)
@SLOW
def test_intersect_except_partition(spark, xs, ys):
    """|a| = |a ∩all b| + |a ∖all b| (multiset partition identity)."""
    a = spark.createDataFrame([Row(v=x) for x in xs], "v INT")
    b = spark.createDataFrame([Row(v=y) for y in ys], "v INT")
    assert a.intersectAll(b).count() + a.exceptAll(b).count() == len(xs)


@given(xs=st.lists(st.sampled_from(["aa", "bb", "cc", "aa ", " AA"]), max_size=10))
@SLOW
def test_exact_dedup_idempotent_and_covering(spark, xs):
    if not xs:
        return
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(xs)]
    )
    once = exact_dedup(df)
    again = exact_dedup(once.drop("text_hash", "n_copies"))
    assert once.count() == again.count()
    # survivors' n_copies must sum back to the input size
    assert sum(r.n_copies for r in once.collect()) == len(xs)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
)
@SLOW
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """Our union+window as-of join ≡ pandas.merge_asof (backward) on random
    key/time sets — the authoritative public reference implementation."""
    base = datetime.datetime(2024, 1, 1)
    ldf = [Row(k=k, t=base + datetime.timedelta(seconds=s), lid=i)
           for i, (k, s) in enumerate(left)]
    # right must be unique per (k, t) for determinism
    seen = set()
    rrows = []
    for k, s in right:
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rrows.append(Row(k=k, rt=base + datetime.timedelta(seconds=s), rv=s))
    l = spark.createDataFrame(ldf)
    r = spark.createDataFrame(rrows)
    got = {
        row.lid: row.rv
        for row in asof_join(
            l, r, left_on="k", right_on="k", left_time="t", right_time="rt",
            right_cols=["rv"],
        ).collect()
    }
    lp = pd.DataFrame([(x.k, x.t, x.lid) for x in ldf], columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame([(x.k, x.rt, x.rv) for x in rrows], columns=["k", "rt", "rv"]).sort_values("rt")
    ref = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k", direction="backward")
    for _, row in ref.iterrows():
        expect = None if pd.isna(row["rv"]) else int(row["rv"])
        assert got[row["lid"]] == expect


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
    width=st.sampled_from([7.0, 60.0, 250.0, 5000.0]),
)
@SLOW
def test_asof_bucketed_equals_plain_property(spark, left, right, width):
    """The time-bucketed as-of (skew escape hatch) must equal the plain
    operator for ANY bucket width, including widths that slice ties and
    carry-in chains across many buckets."""
    base = datetime.datetime(2024, 1, 1)
    ldf = [Row(k=k, t=base + datetime.timedelta(seconds=s), lid=i)
           for i, (k, s) in enumerate(left)]
    seen = set()
    rrows = []
    for k, s in right:
        if (k, s) not in seen:
            seen.add((k, s))
            rrows.append(Row(k=k, rt=base + datetime.timedelta(seconds=s), rv=s))
    l = spark.createDataFrame(ldf)
    r = spark.createDataFrame(rrows)
    kw = dict(left_on="k", right_on="k", left_time="t", right_time="rt",
              right_cols=["rv"])
    plain = sorted(map(tuple, asof_join(l, r, **kw).collect()))
    bucketed = sorted(map(tuple, asof_join(l, r, bucket_width=width, **kw).collect()))
    assert plain == bucketed


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=10
    ),
    tol=st.sampled_from([None, 50, 200]),
)
@SLOW
def test_asof_nearest_matches_pandas(spark, left, right, tol):
    """asof_nearest_join ≡ pandas.merge_asof(direction='nearest') on random
    key/time sets, including the tolerance bound and the backward tie-break
    (pandas also resolves equidistant matches backward)."""
    from postpy_spark.operators.asof import asof_nearest_join

    lrows = [Row(k=k, t=s, lid=i) for i, (k, s) in enumerate(left)]
    seen = set()
    rrows = []
    for k, s in right:
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rrows.append(Row(k=k, rt=s, rv=s))
    l = spark.createDataFrame(lrows)
    r = spark.createDataFrame(rrows)
    got = {
        row.lid: row.rv
        for row in asof_nearest_join(
            l, r, left_on="k", right_on="k", left_time="t", right_time="rt",
            right_cols=["rv"], tolerance=tol,
        ).collect()
    }
    lp = pd.DataFrame([(x.k, x.t, x.lid) for x in lrows],
                      columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame([(x.k, x.rt, x.rv) for x in rrows],
                      columns=["k", "rt", "rv"]).sort_values("rt", kind="stable")
    ref = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction="nearest",
        tolerance=tol,
    )
    for _, row in ref.iterrows():
        expect = None if pd.isna(row["rv"]) else int(row["rv"])
        assert got[row["lid"]] == expect, (row["lid"], got[row["lid"]], expect)
