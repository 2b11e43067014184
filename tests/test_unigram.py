"""Unigram-LM tokenizer training (operators/unigram.py) vs an INDEPENDENT
pure-Python hard-EM reference.

The reference below shares no code with the operator: seeding is a Counter
sweep, and segmentation ENUMERATES every segmentation recursively and takes
the score argmax (the operator runs a Viterbi DP).  Exact piece-table
equality is achievable because counts are integers and both sides compute
log-probs on the driver with the same formula over the same dict — the test
corpus uses distinct prime-ish counts so no two segmentations of any word
tie in score (asserted, so the tie-break rule never decides the outcome the
reference can't see).
"""

import math

import pyspark.sql.functions as F

from postpy_spark.operators import unigram

MAX_LEN = 4


def _ref_logprobs(counts):
    eff = {p: (c if c > 0 else 0.5) for p, c in counts.items()}
    z = sum(eff.values())
    return {p: math.log(v / z) for p, v in eff.items()}


def _ref_segmentations(w, logp, max_len):
    """All (score, pieces) for every full segmentation of w."""
    if not w:
        return [(0.0, [])]
    out = []
    for i in range(1, min(max_len, len(w)) + 1):
        head = w[:i]
        if head not in logp:
            continue
        for s, rest in _ref_segmentations(w[i:], logp, max_len):
            out.append((logp[head] + s, [head] + rest))
    return out


def _ref_best(w, logp, max_len):
    segs = _ref_segmentations(w, logp, max_len)
    if not segs:
        return list(w)
    segs.sort(key=lambda sp: -sp[0])
    if len(segs) > 1:
        assert segs[0][0] - segs[1][0] > 1e-9, (
            f"test corpus must not produce score ties: {w} {segs[:2]}"
        )
    return segs[0][1]


def _ref_train(words, max_len=MAX_LEN, seed_size=4096, n_iter=3):
    from collections import Counter

    seed = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                seed[w[i:j]] += c
    counts = dict(
        sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    )
    for p, c in seed.items():
        if len(p) == 1:
            counts[p] = c
    single = {p for p in counts if len(p) == 1}
    logp = _ref_logprobs(counts)
    for _ in range(n_iter):
        new = Counter()
        for w, c in words.items():
            for p in _ref_best(w, logp, max_len):
                new[p] += c
        counts = {
            p: new.get(p, 0)
            for p in counts
            if new.get(p, 0) > 0 or p in single
        }
        logp = _ref_logprobs(counts)
    return counts, logp


#: Overlapping subword structure, pairwise-distinct counts (no score ties).
WORDS = {
    "hello": 19,
    "help": 11,
    "hell": 3,
    "world": 13,
    "word": 17,
    "low": 5,
    "lower": 7,
    "newest": 23,
    "west": 29,
    "new": 2,
    "neon": 4,  # breaks the ne/new vs west/est count symmetry in "newest"
}


def _wc_df(spark):
    return spark.createDataFrame(
        list(WORDS.items()), "w string, cnt bigint"
    )


def test_unigram_train_matches_pure_python_em(spark):
    ref_counts, ref_logp = _ref_train(WORDS)
    got_counts, got_logp = unigram.unigram_train(
        spark, _wc_df(spark), max_piece_len=MAX_LEN, n_iter=3
    )
    assert got_counts == ref_counts
    assert set(got_logp) == set(ref_logp)
    for p, lp in ref_logp.items():
        assert got_logp[p] == lp, p  # same driver-side formula → exact


def test_unigram_segment_matches_reference(spark):
    _, logp = unigram.unigram_train(
        spark, _wc_df(spark), max_piece_len=MAX_LEN, n_iter=3
    )
    seg = {
        r["w"]: r["n_pieces"]
        for r in unigram.segment_vocab(
            _wc_df(spark), logp, max_piece_len=MAX_LEN
        ).collect()
    }
    for w in WORDS:
        assert seg[w] == len(_ref_best(w, logp, MAX_LEN)), w


def test_viterbi_tie_break_and_fallback():
    vit = unigram._viterbi_best
    # exact tie: p("ab")·p("cd") vs p("abcd") — identical scores; the
    # longest-piece rule must pick the single piece deterministically
    lp = {"ab": math.log(0.25), "cd": math.log(0.2), "abcd": math.log(0.05)}
    assert vit("abcd", lp, 4) == ["abcd"]
    # uncovered char (no piece at all) falls back to raw chars
    assert vit("xyz", {"x": -1.0}, 4) == ["x", "y", "z"]
    # empty word
    assert vit("", lp, 4) == []


def test_unigram_seed_includes_all_single_chars(spark):
    # tiny seed_size would evict rare chars; force-include must keep them
    wc = spark.createDataFrame(
        [("aaaa", 100), ("q", 1)], "w string, cnt bigint"
    )
    seed = {
        r["piece"]: r["piece_count"]
        for r in unigram.seed_vocab(wc, max_piece_len=4, seed_size=2).collect()
    }
    assert "q" in seed and "a" in seed
    assert seed["q"] == 1


def test_unigram_em_drops_dead_multichar_pieces(spark):
    # after EM, multi-char pieces that win no Viterbi mass must be gone
    counts, _ = unigram.unigram_train(
        spark, _wc_df(spark), max_piece_len=MAX_LEN, n_iter=3
    )
    ref_counts, _ = _ref_train(WORDS)
    dead = [p for p, c in counts.items() if len(p) > 1 and c == 0]
    assert dead == []
    assert all(c > 0 for p, c in counts.items() if len(p) > 1)
    assert counts == ref_counts
