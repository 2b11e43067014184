"""Text analysis for training-data pipelines (SURVEY.md §2.D, north-star):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All column expressions (JVM-side), usable inside any DataFrame plan.  No
Python UDFs: at 100 TB these run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postpy_spark.operators.dedup import normalize_text, shingles_col, tokens_col

#: Tiny per-language stopword lists for the n-gram/stopword-vote language
#: heuristic.  Deliberately small: the heuristic is a cheap first-pass
#: filter; real pipelines chain a model-based classifier behind it.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

_BPE_ISH_TOKEN_RE = r"[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]"


def word_tokens(col):
    return tokens_col(col)


def n_words(col):
    return F.size(word_tokens(col)).cast("bigint")


def stopword_hits(col, lang: str):
    """Count of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(word_tokens(col), lambda t: F.array_contains(sw, t))).cast(
        "bigint"
    )


def langid_scores(col):
    """Struct of per-language stopword-hit counts; argmax = predicted lang."""
    return F.struct(*[stopword_hits(col, lang).alias(lang) for lang in STOPWORDS])


def langid_predict(col):
    """Predicted language = argmax stopword hits, ties broken by lang code,
    'und' (undetermined) when nothing hits."""
    pairs = F.array(
        *[
            F.struct(stopword_hits(col, lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p.hits > 0))
    return F.coalesce(best.lang, F.lit("und"))


def quality_features(col):
    """Length / punctuation / stopword-ratio / mean-word-length features as
    a struct — the standard cheap quality gates for corpus filtering."""
    toks = word_tokens(col)
    nw = F.size(toks)
    nchars = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    sw_en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_en, t)))
    mean_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / F.greatest(nw, F.lit(1)).cast("double")
    return F.struct(
        nchars.cast("bigint").alias("n_chars"),
        nw.cast("bigint").alias("n_words"),
        F.round(punct / F.greatest(nchars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(sw_hits / F.greatest(nw, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(mean_wl, 6).alias("mean_word_len"),
    )


def quality_score(col):
    """Scalar [0,1] quality score: stopword presence up-weights, extreme
    punctuation and degenerate word lengths down-weight.  Deterministic,
    engine-portable arithmetic (round at the end)."""
    f = quality_features(col)
    raw = (
        F.least(f.stopword_ratio * 2.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(f.punct_ratio * 5.0, F.lit(1.0))) * 0.25
        + F.when((f.mean_word_len >= 3) & (f.mean_word_len <= 10), 0.25).otherwise(0.0)
    )
    return F.round(raw, 6)


def token_count_bpe(col):
    """Approximate BPE token count via a GPT-style pre-tokenizer regex
    (letters runs / digit groups / single punctuation)."""
    return F.regexp_count(col, F.lit(_BPE_ISH_TOKEN_RE)).cast("bigint")


def doc_fingerprint(col, k: int = 3):
    """Winnowing-style fingerprint: min MD5 over token k-gram shingles.
    MD5 is engine-portable (identical hex in Spark and any SQL oracle),
    unlike xxhash64.  Short docs fall back to md5(normalized text)."""
    sh = shingles_col(col, k)
    return F.coalesce(
        F.array_min(F.transform(sh, lambda s: F.md5(s))),
        F.md5(normalize_text(col)),
    )


def bigrams_col(col):
    """Adjacent token pairs as an array<struct<w1,w2>> (let-bound HOF —
    see operators.dedup.shingles_col for the CSE rationale)."""
    toks = tokens_col(col)

    def body(t):
        return F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.struct(
                F.element_at(t, i + 1).alias("w1"), F.element_at(t, i + 2).alias("w2")
            ),
        )

    return F.when(F.size(toks) >= 2, F.element_at(F.transform(F.array(toks), body), 1)).otherwise(
        F.array()
    )


def bigram_lm_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document add-1-smoothed bigram log-likelihood — the classic
    statistical quality/fluency score for corpus curation (no external
    model): score(d) = avg over bigrams of ln((c(w1,w2)+1)/(c(w1)+|V|)).

    Scale shape: one explode of bigrams (narrow per doc), two count
    aggregations, then joins back — bigram counts shuffle on (w1,w2);
    unigram counts and vocab size broadcast.
    """
    big = docs.select(
        F.col(id_col), F.explode(bigrams_col(F.col(text_col))).alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("vocab"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(F.broadcast(uc), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp", F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab"))))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("avg_logprob"),
    )
