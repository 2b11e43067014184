"""Edit-distance similarity self-join (entity resolution / fuzzy matching).

The reference checkout is empty (SURVEY.md §0); upstream postpy exposes no
string-similarity join — this is part of the LLM/data-cleaning surface the
brief asks for beyond the contract (fuzzy key matching before a dedup or
merge step: near-identical product names, OCR'd titles, user-typed labels).

Algorithm — ED-Join-style q-gram prefix filtering (Xiao, Wang, Lin,
VLDB'08 §3; prefix bound of Chaudhuri/Ganti/Kaushik, ICDE'06), then exact
Levenshtein verification on candidates only:

1.  Each string is padded with q-1 begin/end sentinels and cut into its
    DISTINCT q-grams.  A single edit operation (insert/delete/substitute)
    touches one position and therefore destroys at most q gram TYPES, so
    two strings within edit distance d satisfy |G(a) \\ G(b)| <= q*d.
2.  Order every string's gram set by a GLOBAL total order (document
    frequency ascending, gram value as tie-break) and keep only the first
    q*d + 1 grams — the PREFIX.  For any qualifying pair, the smallest
    common gram g under that order is preceded, in each side's sorted set,
    only by grams the other side lacks (anything smaller and shared would
    contradict g's minimality) — at most q*d of them — so g sits inside
    BOTH prefixes.  Joining prefix-against-prefix on the gram is therefore
    LOSSLESS for the threshold, at candidate volume ~ sum of squared
    prefix-posting lengths instead of |values|^2.  df-ascending ordering
    puts the RAREST grams in prefixes, which is exactly the posting-volume
    minimizer.
3.  Candidates pass the length filter (| |a|-|b| | <= d, necessary) and
    the exact ``levenshtein(a, b) <= d`` verify — both JVM built-ins.

Short-string channel: the prefix argument needs a COMMON gram to exist,
but a string with <= q*d padded grams (length <= q*(d-1)+1) can have its
entire gram set destroyed by d edits — "a" vs "b" at d=1 share nothing.
Such DEFICIENT strings are additionally paired through a length-key
equi-join (each deficient string fans out to its 2d+1 admissible partner
lengths; partners are themselves length-bounded by q*(d-1)+1+d, so both
sides of this channel are the bounded short-vocabulary slice — no cross
join, no hot key).  Union of the two channels is lossless for ALL inputs.

Scale design (100 TB posture):
- The join runs over DISTINCT string VALUES, not rows: callers aggregate
  to (value, count) first, so pair work scales with vocabulary size, and
  row-level multiplicity is joined back as counts afterwards.
- Everything is DataFrame built-ins: one groupBy for gram df, one bounded
  window (frame = a string's own gram count, ~len chars) for prefix rank,
  one equi-join on the gram for candidates, one hash join back to verify.
  No UDF, no cross join, no driver collect.
- Hot grams are self-limiting: a gram leads a prefix only when it is among
  that string's q*d+1 RAREST grams, so high-df grams drop out of prefixes
  on exactly the strings that have rarer evidence to offer.  The residual
  worst case (a near-duplicate-saturated vocabulary) has quadratic OUTPUT,
  which no candidate scheme can beat.

Exactness: with no caps anywhere in this pipeline, the result equals the
brute-force O(n^2) join — pinned by the DuckDB oracle of
``dedup_editdist_blocked`` (brute-force SQL vs this blocked plan) and by
tests/test_editdist.py's planted-perturbation completeness test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Sentinel padding characters (outside the data alphabet for the shipped
#: callers; collisions with data merely add shared grams, never lose pairs).
_PAD_L = "\x01"
_PAD_R = "\x02"


def qgrams_col(str_col: Column, q: int = 2) -> Column:
    """Distinct positional-content q-grams of ``str_col`` padded with q-1
    begin/end sentinels (array<string>, JVM HOF — no UDF).

    Padding guarantees every non-empty string yields at least q grams and
    makes single-character strings comparable at all.  The padded string is
    LET-BOUND via ``transform(array(x), s -> ...)`` — HOF lambdas re-evaluate
    outer expressions per element (no CSE), the repo-wide landmine.
    """
    padded = F.concat(F.lit(_PAD_L * (q - 1)), str_col, F.lit(_PAD_R * (q - 1)))

    def body(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(s) - (q - 1)),
            lambda i: F.substring(s, i, q),
        )

    return F.array_distinct(F.element_at(F.transform(F.array(padded), body), 1))


def editdist_candidates(
    values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Candidate pairs ``(val_a, val_b)`` with ``val_a < val_b`` containing
    EVERY pair within edit distance ``max_dist`` (prefix-filter theorem
    above), pre-pruned by the length filter.

    ``values`` must carry one row per distinct string in ``str_col``.
    """
    prefix_len = q * max_dist + 1
    grams = values.select(
        F.col(str_col).alias("_val"),
        F.explode(qgrams_col(F.col(str_col), q)).alias("_g"),
    )
    dfreq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_val").orderBy(F.col("_df").asc(), F.col("_g").asc())
    prefix = (
        grams.join(dfreq, "_g")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= prefix_len)
        .select("_val", "_g")
    )
    a = prefix.select(F.col("_val").alias("val_a"), "_g")
    b = prefix.select(F.col("_val").alias("val_b"), "_g")
    gram_cand = (
        a.join(b, "_g")
        .filter(F.col("val_a") < F.col("val_b"))
        .filter(
            F.abs(F.length("val_a") - F.length("val_b")) <= max_dist
        )
        .select("val_a", "val_b")
    )
    # Deficient-length channel (module docstring): strings short enough for
    # d edits to destroy every padded gram pair through a length-key
    # equi-join instead.  Both sides are bounded-short slices.
    short_max = q * (max_dist - 1) + 1
    s = values.filter(F.length(str_col) <= short_max).select(
        F.col(str_col).alias("_vs"),
        F.explode(
            F.sequence(
                F.length(str_col) - max_dist, F.length(str_col) + max_dist
            )
        ).alias("_len"),
    )
    t = values.filter(F.length(str_col) <= short_max + max_dist).select(
        F.col(str_col).alias("_vt"), F.length(str_col).alias("_len")
    )
    short_cand = (
        s.join(t, "_len")
        .filter(F.col("_vs") != F.col("_vt"))
        .select(
            F.least("_vs", "_vt").alias("val_a"),
            F.greatest("_vs", "_vt").alias("val_b"),
        )
    )
    return gram_cand.unionByName(short_cand).distinct()


def editdist_pairs(
    values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All distinct-value pairs within edit distance ``max_dist``:
    ``(val_a, val_b, dist)`` with ``val_a < val_b`` — prefix-filter
    candidates, then exact ``levenshtein`` verify (both JVM-side).

    Equals the brute-force quadratic join by the losslessness argument in
    the module docstring; the blocked plan is what runs.
    """
    cand = editdist_candidates(values, str_col, max_dist, q)
    return (
        cand.withColumn("dist", F.levenshtein("val_a", "val_b"))
        .filter(F.col("dist") <= max_dist)
        .select("val_a", "val_b", "dist")
    )
