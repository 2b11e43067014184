"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY.md §2.D north-star; no reference analog — postpy stores bytea only).

Data model: one row per asset —
    ``media(doc_id BIGINT, kind STRING, payload BINARY,
            meta STRUCT<width INT, height INT, n_frames INT, sample_rate INT>)``

The Spark-side plumbing (schema, partition-preserving mapInPandas over
Arrow batches, 1→N frame explosion, metadata pushdown) is REAL and tested.
The codec layer is STUBBED: the container ships no image/audio libraries,
so ``decode_real`` raises NotImplementedError behind an import-try, and the
default path is a deterministic fake decoder (codepoint stream = "pixels")
that exercises the identical batch shapes.  Swapping in Pillow/torchaudio
is a one-function change.

Scale notes: payloads stay opaque until the narrow mapInPandas stage —
column pruning means metadata-only queries never deserialize bytes; the
frame sampler yields its output incrementally per Arrow batch, so a
million-frame video table never materializes per-partition lists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, n_frames: INT, sample_rate: INT>"
)

KINDS = ["image", "audio", "video"]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from ``documents``: payload =
    UTF-8 bytes of the text, kind cycles by doc_id, metadata derived from
    n_chars.  Stands in for a real ingest (S3 blob scan) with identical
    schema and statistics behavior."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            ((F.col("n_chars") % 64) + 16).cast("int").alias("width"),
            ((F.col("n_chars") % 48) + 12).cast("int").alias("height"),
            ((F.col("n_chars") % 100) + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Codec layer (stubbed)
# ---------------------------------------------------------------------------


def decode_real(payload: bytes, kind: str):
    """Real decoder hook.  Raises NotImplementedError in this container —
    the image/audio libs are not installed; see module docstring."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
        elif kind in ("audio", "video"):
            import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"real {kind} decoding requires optional codec libraries "
            f"(not installed in this environment): {exc}"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def _make_fake_pixels():
    """Factory for the stand-in decoder.  UDF closures must capture the
    RETURNED function, not a module-level one: cloudpickle serializes
    module-level globals by reference (workers would need ``postpy_spark``
    importable — only true when the driver's cwd is the repo root), but a
    factory-nested function by VALUE, making the shipped UDF
    self-contained under any driver cwd/PYTHONPATH."""

    def fake_pixels(payload: bytes) -> list[int]:
        # Deterministic stand-in 'pixel' stream: unicode codepoints of the
        # payload text — stable across engines and languages, so
        # oracle-checkable.
        return [ord(c) for c in payload.decode("utf-8", errors="replace")]

    return fake_pixels


#: Driver-side convenience alias (tests/oracles); UDFs use the factory.
fake_pixels = _make_fake_pixels()


def decoder_availability() -> list[tuple[str, str, bool]]:
    out = []
    for kind, lib in [("image", "PIL"), ("audio", "soundfile"), ("video", "soundfile")]:
        try:
            __import__(lib)
            ok = True
        except ImportError:
            ok = False
        out.append((kind, lib, ok))
    return out


# ---------------------------------------------------------------------------
# mapInPandas operators (real plumbing, fake codec)
# ---------------------------------------------------------------------------

STATS_SCHEMA = (
    "doc_id BIGINT, kind STRING, byte_len BIGINT, width INT, height INT, "
    "mean_pixel DOUBLE, max_pixel BIGINT"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Per-asset decode → feature-extract over Arrow batches."""
    decode = _make_fake_pixels()  # closure-captured, pickled by value

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    # raw mean: rounding happens JVM-side in the caller (python
                    # round() is banker's — diverges from SQL ROUND on ties)
                    "mean_pixel": px.map(lambda v: sum(v) / len(v)),
                    "max_pixel": px.map(max).astype("int64"),
                }
            )

    return media.mapInPandas(stats, STATS_SCHEMA)


RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, out_width INT, out_height INT, out_pixels BIGINT"


def resize_plan(media: DataFrame, scale: float = 0.5) -> DataFrame:
    """Resize stage: computes output geometry per asset (the real version
    would also emit resampled bytes; geometry math is the testable part)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pd.Series([m["width"] for m in pdf["meta"]], index=pdf.index)
            h = pd.Series([m["height"] for m in pdf["meta"]], index=pdf.index)
            ow = (w * scale).astype("int32").clip(lower=1)
            oh = (h * scale).astype("int32").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": ow,
                    "out_height": oh,
                    "out_pixels": (ow.astype("int64") * oh.astype("int64")),
                }
            )

    # prune BEFORE mapInPandas: the UDF consumes whole rows, so payload
    # would otherwise be deserialized just to be ignored
    slim = media.filter(F.col("kind") == "image").select("doc_id", "meta")
    return slim.mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT"


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """1→N frame sampling for video assets: yields every k-th frame index
    incrementally per batch (no per-partition materialization)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                for i in range(0, int(meta["n_frames"]), every):
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32")})

    slim = media.filter(F.col("kind") == "video").select("doc_id", "meta")
    return slim.mapInPandas(frames, FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id BIGINT, n_samples BIGINT, duration_s DOUBLE, rms DOUBLE, peak BIGINT"
SAMPLE_RATE = 16_000


def audio_stats(media: DataFrame) -> DataFrame:
    """Audio-kind assets only: decode (fake PCM = codepoint stream) →
    duration / RMS / peak per asset over Arrow batches.  Same shape a real
    soundfile-backed decoder plugs into; raw floats cross back JVM-side
    un-rounded (python round is banker's)."""
    audio = media.filter(F.col("kind") == "audio")
    decode = _make_fake_pixels()  # closure-captured, pickled by value
    rate = SAMPLE_RATE  # local bind: module globals don't ship with the UDF

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": px.map(len).astype("int64"),
                    "duration_s": px.map(lambda v: len(v) / rate),
                    "rms": px.map(lambda v: (sum(x * x for x in v) / len(v)) ** 0.5),
                    "peak": px.map(max).astype("int64"),
                }
            )

    return audio.mapInPandas(stats, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (average-hash) dedup — near-duplicate IMAGES, not bytes
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "doc_id BIGINT, kind STRING, phash BIGINT"


def _make_phash():
    """Average-hash over the decoded pixel stream: resample to 64 buckets
    (mean per bucket), threshold each bucket at the global mean → 64-bit
    signature.  Robust to small local edits (a changed character shifts
    one bucket mean slightly) where the byte-digest dedup
    (multimodal_dedup) flips completely — that is the point of
    PERCEPTUAL dedup.  Factory-nested for by-value pickling."""
    decode = _make_fake_pixels()

    def phash(payload: bytes) -> int:
        px = decode(payload)
        if not px:
            return 0
        n = len(px)
        buckets = [0.0] * 64
        counts = [0] * 64
        for i, p in enumerate(px):
            b = i * 64 // n if n >= 64 else i
            buckets[b] += p
            counts[b] += 1
        means = [buckets[i] / counts[i] if counts[i] else 0.0 for i in range(64)]
        grand = sum(buckets) / n
        bits = 0
        for i, m in enumerate(means):
            if m > grand:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    return phash


def phash_signatures(media: DataFrame) -> DataFrame:
    """(doc_id, kind, phash) via the same Arrow-batched decode stage as
    image_stats — payload bytes never leave the narrow mapInPandas."""
    ph = _make_phash()

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "phash": pdf["payload"].map(ph).astype("int64"),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(sigs, PHASH_SCHEMA)


def phash_near_dups(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming): perceptual near-duplicate
    pairs via the shared 64-bit Hamming joiner (operators/dedup.py::
    hamming_near_pairs — pigeonhole chunk blocking, salted hot buckets,
    exact bit_count verify).  Decode cost is one pass; the join never
    sees payloads."""
    from postpy_spark.operators.dedup import hamming_near_pairs

    sigs = phash_signatures(media)
    return hamming_near_pairs(
        sigs, id_col="doc_id", sig_col="phash", max_hamming=max_hamming, blocks=8
    )
