"""Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2015,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) as a Spark iteration over the distinct word vocabulary.

Scale design — the property that makes BPE trainable on a 100 TB corpus:
the only corpus-sized work is ONE tokenize + groupBy pass producing
(word, count).  Every merge round after that runs on the VOCABULARY, which
grows sublinearly with corpus size (Heaps' law), weighted by the word
counts.  Per round:

- one adjacent-pair weighted aggregate over the vocab (map-side combined);
- one ``TakeOrderedAndProject`` argmax on (count DESC, left ASC, right ASC)
  — a driver-visible single row, the deterministic tie-break both the
  reference Python implementation and the tests share;
- one JVM fold (`_merge_adjacent`) rewriting ONLY the words that contain
  the winning pair — greedy, left-to-right, non-overlapping, the standard
  BPE application order.  No Python touches the vocab.

State is the (word, syms, cnt) frame; each round's frame is persisted and
the previous round's evicted, with ``localCheckpoint`` every
``checkpoint_every`` rounds to truncate lineage (the PageRank/LPA loop
pattern, operators/graph.py).  Words carry the classic ``</w>``
end-of-word marker so merges distinguish suffixes from mid-word units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _syms_col(word):
    """Initial symbol sequence: characters + the end-of-word marker.

    ``split('', '')`` returns ``[""]`` in Spark while Python's ``list('')``
    is ``[]`` — filter the empty symbol so an empty/whitespace-only word
    yields ``["</w>"]`` on both engines (keeps merge tables identical on
    corpora containing blank documents)."""
    return F.concat(
        F.filter(F.split(word, ""), lambda s: s != F.lit("")),
        F.array(F.lit(END_OF_WORD)),
    )


def _adjacent_pairs(syms):
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words).  The shifted copy is slice-based; slice length 0 is legal."""
    shifted = F.concat(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    z = F.zip_with(syms, shifted, lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return F.filter(z, lambda p: p["b"].isNotNull())


def _merge_adjacent(syms, left: str, right: str, joined: str):
    """Greedy left-to-right replacement of adjacent (left, right) by
    ``joined`` — one JVM fold; the accumulator's ``skip`` flag consumes the
    right half of a merged pair so overlapping occurrences ("aaa" with
    (a,a)) merge non-overlapping, exactly like reference BPE."""
    shifted = F.concat(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    z = F.zip_with(syms, shifted, lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )
    return F.aggregate(
        z,
        acc0,
        lambda acc, x: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (x["a"] == F.lit(left))
            & x["b"].isNotNull()
            & (x["b"] == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(joined))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(x["a"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )


def bpe_train(
    word_counts: DataFrame,
    n_merges: int = 12,
    word_col: str = "w",
    count_col: str = "cnt",
    checkpoint_every: int = 4,
    return_vocab: bool = False,
):
    """Learn ``n_merges`` BPE merges from a (word, count) vocabulary frame.

    Returns the merge table as a driver-side list of dicts
    ``{rank, left, right, merged, pair_count}`` — bounded at n_merges rows,
    the natural driver artifact (it IS the tokenizer).  Stops early when no
    adjacent pair remains.  With ``return_vocab=True`` also returns the
    trained per-word segmentation frame (w, syms, cnt) — the APPLY
    artifact: tokenizing a corpus is then a plain join of its tokens
    against this vocab, never a re-derivation per document.  The returned
    frame is eagerly localCheckpoint-ed so it survives the loop's persist
    eviction without replaying n_merges fold stages."""
    vocab = word_counts.select(
        F.col(word_col).alias("w"),
        _syms_col(F.col(word_col)).alias("syms"),
        F.col(count_col).cast("bigint").alias("cnt"),
    ).persist()
    merges: list[dict] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                vocab.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
                .groupBy(F.col("p.a").alias("left"), F.col("p.b").alias("right"))
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.col("pair_count").desc(), "left", "right")
                .limit(1)
                .collect()
            )
            if not top:
                break
            r = top[0]
            joined = r["left"] + r["right"]
            merges.append(
                {
                    "rank": rank,
                    "left": r["left"],
                    "right": r["right"],
                    "merged": joined,
                    "pair_count": r["pair_count"],
                }
            )
            new_vocab = vocab.select(
                "w",
                F.when(
                    F.exists(
                        _adjacent_pairs(F.col("syms")),
                        lambda p: (p["a"] == F.lit(r["left"]))
                        & (p["b"] == F.lit(r["right"])),
                    ),
                    _merge_adjacent(F.col("syms"), r["left"], r["right"], joined),
                )
                .otherwise(F.col("syms"))
                .alias("syms"),
                "cnt",
            )
            if rank % checkpoint_every == 0:
                new_vocab = new_vocab.localCheckpoint(eager=False)
            new_vocab = new_vocab.persist()
            old, vocab = vocab, new_vocab
            old.unpersist()
        if return_vocab:
            final_vocab = vocab.localCheckpoint(eager=True)
    finally:
        vocab.unpersist()
    return (merges, final_vocab) if return_vocab else merges


def merges_df(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """Driver merge list -> DataFrame (rank, left, right, merged,
    pair_count), the query-able artifact."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", LongType()),
            StructField("left", StringType()),
            StructField("right", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], int(m["pair_count"]))
            for m in merges
        ],
        schema,
    )


def bpe_reference(
    word_counts: dict[str, int], n_merges: int, return_vocab: bool = False
):
    """Independent pure-Python BPE (dict-based, same </w> marker and
    (count DESC, left ASC, right ASC) tie-break) — the test oracle for
    ``bpe_train``; deliberately shares no code with the Spark path.  With
    ``return_vocab=True`` also returns {word: [subword, ...]}."""
    words = {w: tuple(list(w) + [END_OF_WORD]) for w in word_counts}
    vocab = {
        tuple(list(w) + [END_OF_WORD]): int(c) for w, c in word_counts.items()
    }
    out: list[dict] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        joined = left + right
        def apply(syms):
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(joined)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            return tuple(merged)

        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            key = apply(syms)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
        words = {w: apply(s) for w, s in words.items()}
        out.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": joined,
                "pair_count": n,
            }
        )
    if return_vocab:
        return out, {w: list(s) for w, s in words.items()}
    return out
