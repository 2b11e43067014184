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

MEASURED LIMIT of the q-gram method, and the PassJoin default: q-gram
signatures saturate on low-character-diversity vocabularies.  On an
adversarial probe (strings drawn from a 200-word vocabulary plus a
numeric suffix — only ~10^3-10^4 distinct grams no matter how many
strings), candidate volume grew SUPER-linearly: 330 -> 1183 -> 2852
candidates/string as n went 10k -> 40k -> 100k at q=3 (n^2/|gram types|
— the signature space, not the data, is the bottleneck; candidate
generation hit 232 s at n=100k).  The fix is the published
partition-based scheme — PassJoin (Li, Deng & Feng, ICDE'11): partition
each string into d+1 SEGMENTS (pigeonhole: d edits leave >= 1 segment
untouched, and an untouched segment appears verbatim in the partner
displaced by at most d); the equi-join key is the full segment
(length ~ l/(d+1) chars, vastly more selective than any q-gram) plus
the partner length and segment index.  Probe fan-out is bounded:
<= (d+1) target lengths x (d+1) segments x (2d+1) positions per string.
``method="passjoin"`` is the default; ``method="qgram"`` remains for
high-diversity vocabularies where gram prefixes are smaller than
segment probes.  Same probe with PassJoin (the honest metric is
candidates per TRUE pair, because that synthetic vocabulary's ids
collide mod 200 and the OUTPUT itself is quadratic): n=10k -> 244k
candidates / 167k true pairs (1.5x), n=40k -> 4.0M / 1.7M (2.3x),
n=100k -> 24.9M / 6.9M (3.6x) in 130 s — versus the q-gram method's
62x at n=10k and non-termination at n=100k/q=2.  Candidate volume
tracks output volume, not n^2.  Numbers in docs/BENCH_NOTES.md
round-12 section; completeness pinned for both methods in
tests/test_editdist.py.

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


def _segment_bounds(length: Column, k: int, i: int) -> tuple[Column, Column]:
    """(start, len) of segment ``i`` in the even (d+1)-partition of a string
    of ``length`` chars: the first ``length % k`` segments get one extra
    char.  start = i*base + min(i, rem); len = base + (i < rem).  The probe
    side replicates this formula exactly — both sides MUST agree."""
    base = F.floor(length / k).cast("int")
    rem = (length % k).cast("int")
    seg_len = base + F.when(F.lit(i) < rem, F.lit(1)).otherwise(F.lit(0))
    start = F.lit(i) * base + F.least(F.lit(i), rem)
    return start, seg_len


def _passjoin_index(values: DataFrame, str_col: str, d: int) -> DataFrame:
    """PassJoin INDEX side: each string of length >= d+1 emits its d+1
    segments keyed (_lr=own length, _i=segment index, _seg) — the role of
    the SHORTER partner of a pair.  Carries the string as ``_vr``."""
    k = d + 1
    val = F.col(str_col)
    length = F.length(val)
    idx_parts = []
    for i in range(k):
        start, seg_len = _segment_bounds(length, k, i)
        idx_parts.append(
            F.struct(
                F.lit(i).alias("i"),
                val.substr(start + 1, seg_len).alias("seg"),
            )
        )
    return (
        values.filter(length >= k)
        .select(
            val.alias("_vr"),
            length.alias("_lr"),
            F.explode(F.array(*idx_parts)).alias("_s"),
        )
        .select("_vr", "_lr", F.col("_s.i").alias("_i"), F.col("_s.seg").alias("_seg"))
    )


def _passjoin_probe(values: DataFrame, str_col: str, d: int) -> DataFrame:
    """PassJoin PROBE side: each string, acting as the LONGER partner,
    emits for every admissible shorter length tl in [l-d, l] (tl >= d+1),
    every segment index, and every start within ±d of the partition-scheme
    start, the matching-length substring — a bounded (d+1)(d+1)(2d+1)
    fan-out.  Carries the string as ``_vs``.

    r14 optimization: the (d+1)²(2d+1)-way struct array is generated as ONE
    SQL string handed to ``F.expr`` instead of ~500 Column-DSL calls — each
    DSL call is a Py4J round-trip, and building this expression through the
    DSL measured 1.3–1.7 s of pure driver time PER INVOCATION at d=2
    (profiled r14; the JVM SQL parser takes milliseconds for the same
    text).  The generated tree is semantically identical: same loop order
    (delta, i, shift), same arithmetic (float-divide floor segment bounds),
    same CASE-WHEN-null shape, same let-bound filter/distinct HOFs.

    (r15 measured-and-rejected: memoizing the parsed Column per session
    saved nothing — a warm re-parse is ~30 ms; the residual 0.3 s/build is
    the surrounding DataFrame-DSL Py4J calls, which are not memoizable.
    Numbers in OPTIMIZATION_r15.md.)"""
    k = d + 1
    c = f"`{str_col}`"
    L = f"length({c})"
    parts: list[str] = []
    for delta in range(d + 1):  # tl = l - delta
        tl = f"({L} - {delta})"
        for i in range(k):
            base = f"CAST(FLOOR({tl} / {k}) AS INT)"
            rem = f"CAST(({tl} % {k}) AS INT)"
            seg_len = f"({base} + (CASE WHEN {i} < {rem} THEN 1 ELSE 0 END))"
            start = f"({i} * {base} + LEAST({i}, {rem}))"
            for shift in range(-d, d + 1):
                p = f"({start} + {shift})"
                valid = f"({tl} >= {k} AND {p} >= 0 AND {p} + {seg_len} <= {L})"
                parts.append(
                    f"CASE WHEN {valid} THEN named_struct("
                    f"'tl', CAST({tl} AS INT), 'i', {i}, "
                    f"'sub', substring({c}, {p} + 1, {seg_len})) END"
                )
    # LET-BIND the struct array before the filter/distinct HOFs: filter()
    # re-evaluates its input array PER ELEMENT (no CSE — the repo-wide
    # landmine), which turns the probe projection into ~45^2 interpreted
    # substr evaluations per row (measured: a 10k-string probe count did
    # not finish in minutes; with the binding it is sub-second).
    raw = f"array({', '.join(parts)})"
    cleaned = F.expr(
        f"element_at(transform(array({raw}), "
        f"a -> array_distinct(filter(a, x -> x IS NOT NULL))), 1)"
    )
    return (
        values.select(
            F.col(str_col).alias("_vs"),
            F.explode(cleaned).alias("_p"),
        )
        .select(
            "_vs",
            F.col("_p.tl").alias("_lr"),
            F.col("_p.i").alias("_i"),
            F.col("_p.sub").alias("_seg"),
        )
    )


def _seg_join(index: DataFrame, probe: DataFrame) -> DataFrame:
    return (
        index.join(probe, ["_lr", "_i", "_seg"])
        .filter(F.col("_vr") != F.col("_vs"))
        .select(
            F.least("_vr", "_vs").alias("val_a"),
            F.greatest("_vr", "_vs").alias("val_b"),
        )
    )


def _short_s(values: DataFrame, str_col: str, d: int) -> DataFrame:
    """Short channel, fan-out side: strings of length <= d keyed by every
    admissible partner length."""
    val = F.col(str_col)
    length = F.length(val)
    return values.filter(length <= d).select(
        val.alias("_vs"),
        F.explode(F.sequence(length - d, length + d)).alias("_len"),
    )


def _short_t(values: DataFrame, str_col: str, d: int) -> DataFrame:
    """Short channel, target side: strings of length <= 2d keyed by own
    length (both sides of any short pair have length <= 2d)."""
    val = F.col(str_col)
    length = F.length(val)
    return values.filter(length <= 2 * d).select(
        val.alias("_vt"), length.alias("_len")
    )


def _short_join(s: DataFrame, t: DataFrame) -> DataFrame:
    return (
        s.join(t, "_len")
        .filter(F.col("_vs") != F.col("_vt"))
        .select(
            F.least("_vs", "_vt").alias("val_a"),
            F.greatest("_vs", "_vt").alias("val_b"),
        )
    )


def passjoin_candidates(
    values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs ``(val_a, val_b)`` with ``val_a < val_b`` containing
    EVERY pair within edit distance d — PassJoin partition blocking (Li,
    Deng & Feng, ICDE'11; module docstring).

    Pigeonhole: d edits touch at most d of a string's d+1 segments, so at
    least one segment of the SHORTER side appears verbatim in the longer
    side, displaced by at most d (net insertions minus deletions before
    it).  The equi-join key is the full SEGMENT (length ~ l/(d+1) chars)
    — far more selective than any q-gram, which is what keeps candidate
    volume data-bounded on low-diversity vocabularies where gram
    signatures saturate (index/probe builders above).

    Pairs whose shorter side has length <= d (segments would be empty) go
    through the same bounded length-key channel as the q-gram method.
    """
    d = max_dist
    seg_cand = _seg_join(
        _passjoin_index(values, str_col, d), _passjoin_probe(values, str_col, d)
    )
    short_cand = _short_join(
        _short_s(values, str_col, d), _short_t(values, str_col, d)
    )
    return seg_cand.unionByName(short_cand).distinct()


def passjoin_candidates_incremental(
    old_values: DataFrame,
    new_values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs touching the NEW batch — every pair within edit
    distance d with >= 1 new member, and NO old×old candidate ever formed.

    Role decomposition (PassJoin is asymmetric: the shorter side indexes
    segments, the longer side probes substrings):
    - index(old ∪ new) ⋈ probe(new): pairs where the new string is the
      longer/equal partner, against anybody;
    - index(new) ⋈ probe(old): pairs where an old string is strictly
      longer than a new one;
    - short channel: s(new) ⋈ t(old ∪ new)  ∪  s(old) ⋈ t(new).

    In a deployed daily-ingest pipeline both old-side expansions (segments
    AND probe substrings — each per-string bounded) are the PERSISTED
    blocked index, appended to as strings arrive; here they are rebuilt
    inline, which costs one scan of the old vocabulary but generates
    candidates only where a key collides with the batch — candidate
    volume scales with the batch, not with |old|² (the same new×corpus
    contract as dedup.minhash_dedup_pairs_incremental)."""
    d = max_dist
    all_values = old_values.select(str_col).unionByName(
        new_values.select(str_col)
    )
    cand = (
        _seg_join(
            _passjoin_index(all_values, str_col, d),
            _passjoin_probe(new_values, str_col, d),
        )
        .unionByName(
            _seg_join(
                _passjoin_index(new_values, str_col, d),
                _passjoin_probe(old_values, str_col, d),
            )
        )
        .unionByName(
            _short_join(
                _short_s(new_values, str_col, d), _short_t(all_values, str_col, d)
            )
        )
        .unionByName(
            _short_join(
                _short_s(old_values, str_col, d), _short_t(new_values, str_col, d)
            )
        )
    )
    return cand.distinct()


def editdist_pairs(
    values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
    q: int = 2,
    method: str = "passjoin",
) -> DataFrame:
    """All distinct-value pairs within edit distance ``max_dist``:
    ``(val_a, val_b, dist)`` with ``val_a < val_b`` — blocked candidates,
    then exact ``levenshtein`` verify (both JVM-side).

    ``method="passjoin"`` (default) uses partition-segment blocking —
    candidate volume stays data-bounded even on low-character-diversity
    vocabularies where q-gram signatures saturate (measured in the module
    docstring).  ``method="qgram"`` uses the ED-Join prefix filter —
    slightly cheaper probes when gram diversity is high.  Both are
    LOSSLESS: result equals the brute-force quadratic join (pinned by the
    DuckDB oracle of ``dedup_editdist_blocked`` and the parameterized
    completeness tests).
    """
    if method == "passjoin":
        cand = passjoin_candidates(values, str_col, max_dist)
    elif method == "qgram":
        cand = editdist_candidates(values, str_col, max_dist, q)
    else:
        raise ValueError(f"unknown editdist method: {method!r}")
    return (
        cand.withColumn("dist", F.levenshtein("val_a", "val_b"))
        .filter(F.col("dist") <= max_dist)
        .select("val_a", "val_b", "dist")
    )


def editdist_pairs_incremental(
    old_values: DataFrame,
    new_values: DataFrame,
    str_col: str = "val",
    max_dist: int = 2,
) -> DataFrame:
    """All pairs within edit distance d that TOUCH the new batch:
    ``(val_a, val_b, dist)``, val_a < val_b — incremental PassJoin
    candidates (never old×old), then exact levenshtein verify.  Equals
    the full ``editdist_pairs`` over old ∪ new restricted to pairs with
    >= 1 new member (pinned by tests/test_editdist.py)."""
    cand = passjoin_candidates_incremental(
        old_values, new_values, str_col, max_dist
    )
    return (
        cand.withColumn("dist", F.levenshtein("val_a", "val_b"))
        .filter(F.col("dist") <= max_dist)
        .select("val_a", "val_b", "dist")
    )


def er_merge_incremental(
    old_assign: DataFrame,
    new_edges: DataFrame,
    new_values: DataFrame,
    str_col: str = "val",
    max_iter: int = 25,
) -> DataFrame:
    """Merge a new batch into an EXISTING entity-cluster assignment
    without re-clustering history: connected components run on the
    CONTRACTED graph whose nodes are old cluster labels and new strings
    (batch + touched-cluster sized, never history-sized).

    - ``old_assign``: (name, canonical) — the existing assignment, where
      ``canonical`` is the min member name of each old cluster (the
      invariant ``er_canonical_entities`` establishes).
    - ``new_edges``: (val_a, val_b, ...) match pairs touching the batch
      (from ``editdist_pairs_incremental``).
    - ``new_values``: one ``str_col`` row per new string.

    Each edge endpoint is CONTRACTED to its representative — an old
    name maps to its cluster's canonical label, a new name to itself —
    and min-label CC runs on the contracted edge set only.  Because old
    canonicals are minima of their members, the component minimum over
    contracted nodes equals the minimum over all underlying member
    names, so labels agree EXACTLY with a full re-clustering (pinned by
    tests/test_editdist.py equivalence suite).  Untouched old clusters
    never enter the computation at all.

    Returns the assignment DELTA: (name, canonical, is_new) for every
    new string plus every old string whose canonical label changed.
    Scale: two hash joins to contract endpoints, CC over the contracted
    (bounded) edge set, one join back to relabel members of touched old
    clusters only."""
    from postpy_spark.operators.dedup import connected_components

    old_map = old_assign.select(
        F.col("name").alias("_n"), F.col("canonical").alias("_c")
    )
    e = (
        new_edges.select("val_a", "val_b")
        .join(old_map.withColumnRenamed("_n", "val_a"), "val_a", "left")
        .withColumnRenamed("_c", "_ra")
        .join(old_map.withColumnRenamed("_n", "val_b"), "val_b", "left")
        .withColumnRenamed("_c", "_rb")
        .select(
            F.coalesce("_ra", F.col("val_a")).alias("ra"),
            F.coalesce("_rb", F.col("val_b")).alias("rb"),
        )
        .filter(F.col("ra") != F.col("rb"))
    )
    # steps_per_job=2 (r15): the contracted graph is batch-sized and its
    # loop is 1-2 changing rounds + 1 confirm — the driver-synchronized
    # checkpoint+count round-trips ARE its cost.  Fusing two steps per job
    # converges the typical daily batch in ONE job instead of two+, and
    # the duplicated in-plan step-1 fragments are bounded by the batch
    # (see connected_components' docstring for the measured general-case
    # neutrality that keeps the default at 1).
    comps = connected_components(
        e, "ra", "rb", max_iterations=max_iter, steps_per_job=2
    )
    # new strings: component of their own node, else themselves
    new_rows = (
        new_values.select(F.col(str_col).alias("name"))
        .join(
            comps.select(F.col("node").alias("name"), "component"), "name", "left"
        )
        .select(
            "name",
            F.coalesce("component", F.col("name")).alias("canonical"),
            F.lit(True).alias("is_new"),
        )
    )
    # old strings in touched clusters whose label actually changed
    relabeled = (
        old_assign.join(
            comps.select(F.col("node").alias("canonical"), "component"),
            "canonical",
        )
        .filter(F.col("component") != F.col("canonical"))
        .select(
            "name",
            F.col("component").alias("canonical"),
            F.lit(False).alias("is_new"),
        )
    )
    return new_rows.unionByName(relabeled)


def er_apply_delta(old_assign: DataFrame, delta: DataFrame) -> DataFrame:
    """Final (name, canonical) for every member of a TOUCHED cluster —
    the membership view downstream incremental consumers (golden-record
    maintenance) aggregate over.

    ``delta`` is ``er_merge_incremental`` output.  Old names pick up
    their relabel if present; the touched-cluster filter is a semi-join
    against the delta's canonical set, so untouched history never flows
    through.  New names come straight from the delta."""
    touched = delta.select("canonical").distinct()
    old_upd = (
        old_assign.join(
            delta.filter(~F.col("is_new")).select(
                "name", F.col("canonical").alias("_nc")
            ),
            "name",
            "left",
        )
        .select("name", F.coalesce("_nc", "canonical").alias("canonical"))
    )
    members_old = old_upd.join(touched, "canonical", "semi").select(
        "name", "canonical"
    )
    members_new = delta.filter(F.col("is_new")).select("name", "canonical")
    return members_old.unionByName(members_new)


def er_vanished_labels(old_assign: DataFrame, delta: DataFrame) -> DataFrame:
    """(canonical) labels that no longer head any cluster after the merge.

    A cluster's label is its min member name, so the label survives iff
    the name EQUAL to it kept its canonical; a relabeled row whose name
    was its own cluster's label marks that label as vanished."""
    return (
        delta.filter(~F.col("is_new"))
        .join(
            old_assign.filter(F.col("name") == F.col("canonical")).select(
                "name"
            ),
            "name",
            "semi",
        )
        .select(F.col("name").alias("canonical"))
    )
