"""Closed-form unit pins for composite analytics whose DuckDB oracle
shares the formula with the Spark side (so the cross-engine gate cannot
catch a shared formula error — r7 advice class)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from postpy_spark.operators.bloom import bloom_build, bloom_might_contain
from postpy_spark.operators.ranking import global_row_number, global_running_sum


def _gini_desc(spark, counts):
    """The exact expression events_pareto_gini uses, on a synthetic
    per-user count list (descending-rank Lorenz form)."""
    per_user = spark.createDataFrame(
        [Row(user_id=i, n=c) for i, c in enumerate(counts)]
    ).withColumn("_negn", -F.col("n"))  # desc key pre-negated, as the
    # production query does (plain ascending names only on the bucketed
    # ranking path)
    ranked = global_row_number(
        per_user, ["_negn", "user_id"],
        rn_col="rn", total_col="n_users",
    ).drop("_negn")
    tot = per_user.agg(F.sum("n").alias("total"))
    cum = global_running_sum(ranked, ["rn"], "n", sum_col="cum_n").crossJoin(
        F.broadcast(tot)
    )
    share = F.col("cum_n") * 1.0 / F.col("total")
    return cum.agg(
        F.round(
            2.0 * F.sum(share) / F.max("n_users") - 1.0 - 1.0 / F.max("n_users"), 6
        ).alias("gini")
    ).collect()[0].gini


def test_gini_sign_concentrated_vs_uniform(spark):
    """One-user-owns-(almost)-all must give gini near +1 (POSITIVE — the
    ascending-form constant term flips the sign, r7 high-severity advice);
    a perfectly uniform distribution gives exactly 0."""
    n = 10
    concentrated = _gini_desc(spark, [991] + [1] * (n - 1))
    assert concentrated > 0.85, concentrated
    uniform = _gini_desc(spark, [7] * n)
    assert abs(uniform) < 1e-9, uniform
    # mild skew sits strictly between
    mild = _gini_desc(spark, [4, 3, 2, 1])
    assert 0.0 < mild < 0.5, mild


def test_bloom_no_false_negatives_after_bitget_rewrite(spark):
    """bloom_might_contain now derives word AND bit from one pos column
    (bit_get) — every built key must still test True (no false negatives),
    and most absent keys must test False at this m/k/n."""
    keys = spark.createDataFrame([Row(k=i * 37 + 1) for i in range(200)])
    words = bloom_build(keys, "k", m_bits=1 << 12, k=5)
    members = keys.filter(bloom_might_contain("k", words, m_bits=1 << 12, k=5))
    assert members.count() == 200
    absent = spark.createDataFrame([Row(k=-i) for i in range(1, 201)])
    fp = absent.filter(bloom_might_contain("k", words, m_bits=1 << 12, k=5)).count()
    assert fp < 40, fp  # ~0.02 expected rate at these parameters


def test_prefix_sum_consistent_across_plan_branches(spark):
    """Regression (r12): the two-phase prefix sum's local-window branch
    and totals branch must see the SAME bucket assignment.  The old form
    (spark_partition_id after repartitionByRange) let each branch's range
    exchange sample its own split points — observed live as a +1472 drift
    in stat_auc_roc's cumulative counts over 392k distinct doubles at
    sf0.1.  The bucket id is now a literal-split-point expression, a pure
    function of the row, so every branch agrees by construction.  Pin the
    exact cumsum against pandas on a frame wide enough to span many
    buckets (hash-scrambled distinct doubles, adversarial to sampling)."""
    import pandas as pd

    n = 120_000
    df = (
        spark.range(n)
        .select(
            (F.xxhash64(F.col("id")) % 1_000_000_007).cast("double").alias("v"),
            (F.col("id") % 7).cast("bigint").alias("x"),
        )
        .dropDuplicates(["v"])
    )
    out = global_running_sum(df, ["v"], "x", "cum").toPandas()
    out = out.sort_values("v").reset_index(drop=True)
    expected = out["x"].cumsum()
    mism = int((out["cum"] != expected).sum())
    assert mism == 0, f"{mism} of {len(out)} prefix sums inconsistent"
