"""Unigram-LM (SentencePiece-style) tokenizer training (Kudo 2018,
"Subword Regularization", arXiv:1804.10959) as a Spark EM loop over the
distinct word vocabulary.

The production tokenizer family has two members: BPE (operators/bpe.py,
greedy merge argmax) and the unigram LM trained here with hard-EM
(Viterbi E-step).  Scale design mirrors BPE's — the property that makes
this trainable on a 100 TB corpus:

- the only corpus-sized work is ONE tokenize + groupBy pass producing the
  weighted word vocabulary (w, cnt), which grows sublinearly with corpus
  size (Heaps' law);
- SEEDING is one JVM substring explode over the vocab (positions × piece
  lengths ≤ max_piece_len), one piece-count shuffle, one
  TakeOrderedAndProject for the top ``seed_size`` pieces (single chars
  force-included for coverage);
- each EM ITERATION is vocab-sized: the bounded piece table (≤ seed_size
  rows) is collected to the driver and shipped to an Arrow-batched
  ``mapInPandas`` E-step as a closure dict — the corpus NEVER enters
  Python, only the distinct words do — followed by one piece-sized
  count shuffle (M-step normalization is a scalar).

The E-step is hard EM: each word contributes its count to the pieces of
its single best (Viterbi) segmentation.  Determinism contract (shared
with the independent pure-Python reference in tests/test_unigram.py):
log-probs compared exactly; on an exact score tie the LONGER candidate
piece at each DP cell wins (the DP scans candidate start positions
ascending and replaces only on strictly-greater score).  Pieces that win
zero count are dropped at each M-step except single chars, which are
retained at a floor log-prob (half a count) so every word stays
segmentable; log-probs are renormalized over the retained mass.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def seed_vocab(
    wc: DataFrame, max_piece_len: int = 4, seed_size: int = 4096
) -> DataFrame:
    """(piece, piece_count) seed: all substrings of vocab words up to
    ``max_piece_len`` chars, weighted by word count, top ``seed_size`` by
    (count DESC, piece ASC) with every single character force-included.

    JVM-only: one explode over (position, length) per vocab word; the
    ordering tie-break on the piece string makes the seed deterministic."""
    w = wc.select(F.col("w"), F.col("cnt").cast("bigint").alias("cnt")).filter(
        F.length("w") >= 1
    )
    subs = (
        w.select(
            "cnt",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)), "
                    f"i -> transform(sequence(i, least(i + {max_piece_len - 1},"
                    " length(w))), j -> substring(w, i, j - i + 1))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("piece_count"))
    )
    top = subs.orderBy(F.col("piece_count").desc(), "piece").limit(seed_size)
    chars = subs.filter(F.length("piece") == 1)
    return (
        top.unionByName(chars)
        .groupBy("piece")
        .agg(F.max("piece_count").alias("piece_count"))
    )


def _make_viterbi():
    """Factory for the Viterbi segmenter — a NESTED function so payloads
    closing over it cloudpickle by VALUE (tests/test_pickle_isolation.py;
    a module-level function referenced from a worker payload pickles by
    reference and breaks when the driver cwd isn't the repo root)."""

    def viterbi_best(word: str, logp: dict, max_len: int):
        """Best segmentation of ``word`` under piece log-probs ``logp``.

        DP over end positions; candidate start positions scan ascending
        (longest piece first) and replace only on strictly greater score
        — the documented longest-piece tie-break."""
        neg_inf = float("-inf")
        n = len(word)
        best = [neg_inf] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                lp = logp.get(word[j:i])
                if lp is None or best[j] == neg_inf:
                    continue
                s = best[j] + lp
                if s > best[i]:
                    best[i] = s
                    back[i] = j
        if best[n] == neg_inf:  # uncovered char (no piece) — fall back
            return list(word)
        out = []
        i = n
        while i > 0:
            j = back[i]
            out.append(word[j:i])
            i = j
        out.reverse()
        return out

    return viterbi_best


#: Driver-side handle (tests + reference comparisons); worker payloads get
#: their own value-pickled instance from the factory inside each maker.
_viterbi_best = _make_viterbi()


def _make_estep(logp: dict, max_len: int):
    """Factory-nested mapInPandas payload (pickles by VALUE — see
    tests/test_pickle_isolation.py): emits one (piece, count) partial per
    Viterbi piece occurrence, weighted by word count."""
    vit = _make_viterbi()

    def estep(batches):
        import pandas as pd

        for pdf in batches:
            pieces: list = []
            counts: list = []
            for word, cnt in zip(pdf["w"], pdf["cnt"]):
                for p in vit(word, logp, max_len):
                    pieces.append(p)
                    counts.append(int(cnt))
            yield pd.DataFrame({"piece": pieces, "cnt": counts})

    return estep


def _make_segmenter(logp: dict, max_len: int):
    """Factory-nested mapInPandas payload: (w, n_pieces) per vocab word
    under the FINAL trained piece table."""
    vit = _make_viterbi()

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_pieces": [
                        len(vit(w, logp, max_len)) for w in pdf["w"]
                    ],
                }
            )

    return seg


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    """M-step: renormalized log-probs with single-char floor.

    Pieces with count 0 were already dropped by the caller except single
    chars, which get half a count so coverage never breaks; the mass is
    renormalized over what's retained."""
    total = float(sum(max(c, 0) for c in counts.values()))
    floor = 0.5
    eff = {p: (c if c > 0 else floor) for p, c in counts.items()}
    z = sum(eff.values())
    return {p: math.log(c / z) for p, c in eff.items()}


def unigram_train(
    spark: SparkSession,
    wc: DataFrame,
    max_piece_len: int = 4,
    seed_size: int = 4096,
    n_iter: int = 3,
):
    """Train the unigram LM: returns (pieces dict piece -> count, logp
    dict) after ``n_iter`` hard-EM rounds.

    Driver-side state is the BOUNDED piece table only (≤ seed_size +
    alphabet rows — the same driver-bounded-structure class as the BPE
    argmax row and the IVF centroid set); the vocab frame ``wc`` is never
    collected."""
    wc = wc.select("w", F.col("cnt").cast("bigint").alias("cnt"))
    seed_rows = seed_vocab(wc, max_piece_len, seed_size).collect()
    counts = {r["piece"]: int(r["piece_count"]) for r in seed_rows}
    single = {p for p in counts if len(p) == 1}
    logp = _logprobs(counts)
    for _ in range(n_iter):
        estep = _make_estep(logp, max_piece_len)
        new = (
            wc.mapInPandas(estep, "piece string, cnt bigint")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("c"))
            .collect()
        )
        got = {r["piece"]: int(r["c"]) for r in new}
        # drop zero-count pieces except single chars (coverage floor)
        counts = {p: got.get(p, 0) for p in counts if got.get(p, 0) > 0 or p in single}
        logp = _logprobs(counts)
    return counts, logp


def pieces_df(spark: SparkSession, counts: dict, logp: dict) -> DataFrame:
    rows = [
        (p, int(c), float(logp[p]))
        for p, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    return spark.createDataFrame(rows, "piece string, piece_count bigint, logprob double")


def segment_vocab(
    wc: DataFrame, logp: dict, max_piece_len: int = 4
) -> DataFrame:
    """(w, n_pieces) for every distinct word under the trained model —
    the broadcast-join side for corpus tokenization (the corpus itself is
    tokenized by joining its tokens against THIS frame, never by running
    Viterbi per corpus occurrence)."""
    seg = _make_segmenter(logp, max_piece_len)
    return wc.select("w").mapInPandas(seg, "w string, n_pieces bigint")
