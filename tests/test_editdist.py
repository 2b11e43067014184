"""Edit-distance similarity join: blocking completeness vs brute force,
planted-perturbation recall, and the short-string deficiency channel."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from postpy_spark.operators.editdist import editdist_pairs, qgrams_col

SF_DIR = "/root/testdata/sf0.001"


def _brute(spark, strings, d):
    """Reference O(n^2) pair set via Spark's own levenshtein built-in."""
    df = spark.createDataFrame([Row(val=s) for s in strings])
    a = df.select(F.col("val").alias("va"))
    b = df.select(F.col("val").alias("vb"))
    rows = (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("dist", F.levenshtein("va", "vb"))
        .filter(F.col("dist") <= d)
        .collect()
    )
    return {(r.va, r.vb, r.dist) for r in rows}


def _blocked(spark, strings, d, q=2, method="passjoin"):
    df = spark.createDataFrame([Row(val=s) for s in strings])
    return {
        (r.val_a, r.val_b, r.dist)
        for r in editdist_pairs(df, "val", max_dist=d, q=q, method=method).collect()
    }


METHODS = ["passjoin", "qgram"]


@pytest.mark.parametrize("method", METHODS)
def test_completeness_vs_bruteforce_on_part_names(spark, method):
    """The blocked plan equals brute force on the real part-name vocabulary
    at d=3 (the shipped query's oracle already pins d=2)."""
    names = [
        r.p_name
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_name")
        .distinct()
        .collect()
    ]
    assert len(names) > 30
    assert _blocked(spark, names, 3, method=method) == _brute(spark, names, 3)


@pytest.mark.parametrize("method", METHODS)
def test_planted_perturbations_all_found(spark, method):
    """Deterministic random edits of known distance <= d are all recovered
    (per-pair recall, independent of the brute-force twin)."""
    rng = random.Random(7)
    alphabet = "abcdefghij"
    bases = ["".join(rng.choice(alphabet) for _ in range(12)) for _ in range(40)]
    planted = []
    for i, s in enumerate(bases):
        chars = list(s)
        n_edits = 1 + i % 2  # alternate 1 and 2 edits
        for _ in range(n_edits):
            op = rng.choice("sid")
            pos = rng.randrange(len(chars))
            if op == "s":
                chars[pos] = rng.choice(alphabet)
            elif op == "i":
                chars.insert(pos, rng.choice(alphabet))
            elif len(chars) > 1:
                del chars[pos]
        edited = "".join(chars)
        if edited != s:
            planted.append((s, edited))
    strings = sorted({s for p in planted for s in p})
    got = {(a, b) for a, b, _ in _blocked(spark, strings, 2, method=method)}
    for s, e in planted:
        lo, hi = min(s, e), max(s, e)
        assert (lo, hi) in got, (s, e)


@pytest.mark.parametrize("method", METHODS)
def test_short_string_channel(spark, method):
    """Strings too short for the signature argument ("a" vs "b" share ZERO
    padded 2-grams; PassJoin segments would be empty) still pair through
    the length-key channel."""
    strings = ["a", "b", "ab", "ba", "xy", ""]
    assert _blocked(spark, strings, 1, method=method) == _brute(spark, strings, 1)
    assert _blocked(spark, strings, 2, method=method) == _brute(spark, strings, 2)


@pytest.mark.parametrize("method", METHODS)
def test_mixed_short_and_long(spark, method):
    """Deficient-length and signature-bearing strings coexist: pairs inside
    each regime and across the length boundary are all present."""
    strings = ["ab", "abc", "abcd", "abcde", "zzzzz", "abzde"]
    assert _blocked(spark, strings, 2, method=method) == _brute(spark, strings, 2)


def test_qgrams_padding_yields_grams_for_tiny_strings(spark):
    df = spark.createDataFrame([Row(val="a"), Row(val="")])
    out = {
        r.val: r.g
        for r in df.select("val", qgrams_col(F.col("val"), 2).alias("g")).collect()
    }
    assert len(out["a"]) == 2  # <pad>a, a<pad>
    assert len(out[""]) == 1  # <padL><padR>


def test_distance_values_exact(spark):
    """Output distances are the true Levenshtein distances."""
    strings = ["kitten", "sitten", "sittin", "mitten"]
    got = _blocked(spark, strings, 2)
    assert ("kitten", "sitten", 1) in got
    assert ("sitten", "sittin", 1) in got
    assert ("kitten", "sittin", 2) in got
    assert ("kitten", "mitten", 1) in got


def test_passjoin_insert_delete_shifts(spark):
    """Pure insert/delete pairs exercise the +-d segment displacement
    window (net length change = d), plus boundary edits at both ends."""
    strings = [
        "abcdefghij",
        "abcdefgh",      # 2 deletions at the end
        "xxabcdefghij",  # 2 insertions at the front
        "abcdeYfghij",   # 1 insertion mid-string
        "bcdefghij",     # 1 deletion at the front
    ]
    assert _blocked(spark, strings, 2, method="passjoin") == _brute(
        spark, strings, 2
    )


def test_passjoin_equal_length_substitutions(spark):
    """Equal-length pairs double-emit (each side probes the other) — the
    least/greatest fold plus distinct must leave exactly one row."""
    strings = ["matchbox", "watchbox", "matchbod", "catchbox"]
    got = _blocked(spark, strings, 2, method="passjoin")
    exp = _brute(spark, strings, 2)
    assert got == exp
    # and no duplicates survived the fold
    keys = [(a, b) for a, b, _ in got]
    assert len(keys) == len(set(keys))


def test_passjoin_segment_formula_consistency(spark):
    """Index and probe must use the SAME even-partition formula: a pair of
    identical-up-to-1-edit strings at every length 3..40 is found at d=1
    (sweeps every (length % k) remainder case)."""
    strings = []
    for n in range(3, 41):
        s = "".join(chr(ord("a") + (i * 7 + n) % 26) for i in range(n))
        strings.append(s)
        strings.append(s[: n // 2] + "Z" + s[n // 2 + 1 :])  # 1 substitution
    assert _blocked(spark, strings, 1, method="passjoin") == _brute(
        spark, strings, 1
    )
