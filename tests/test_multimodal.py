"""Multimodal plumbing: schemas, batch shapes, 1→N explosion, and the
stubbed real-decoder contract (SURVEY.md §2.D multimodal columns)."""

import pytest

from postpy_spark.io import load_table
from postpy_spark.operators import multimodal as MM
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(load_table(spark, SF_SMOKE, "documents")).cache()


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,n_frames:int,sample_rate:int>>"
    )


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_real(b"\x00", "image")


def test_decoder_availability_reports_missing():
    avail = dict((k, ok) for k, _, ok in MM.decoder_availability())
    assert avail["image"] is False  # no PIL in this container


def test_image_stats_deterministic(media):
    a = MM.image_stats(media).orderBy("doc_id").collect()
    b = MM.image_stats(media).orderBy("doc_id").collect()
    assert a == b
    row = a[0]
    assert row.byte_len > 0 and 0 < row.mean_pixel < 0x110000


def test_frame_sample_counts(media):
    import pyspark.sql.functions as F

    out = MM.frame_sample(media, every=4)
    per_doc = out.groupBy("doc_id").count()
    meta = media.filter(F.col("kind") == "video").select(
        "doc_id", F.col("meta.n_frames").alias("nf")
    )
    joined = per_doc.join(meta, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["count"] == (r.nf + 3) // 4  # ceil(nf / 4)


def test_payload_pruned_for_metadata_query(spark):
    """Column pruning: a metadata-only projection must not materialize the
    payload — the parquet scan reads only the metadata source columns
    (payload derives from `text`, which must be absent from ReadSchema)."""
    # clear the cached media fixture first: cache substitution would replace
    # the scan with an all-column InMemoryRelation and defeat pruning
    spark.catalog.clearCache()
    fresh = MM.synthesize_media(load_table(spark, SF_SMOKE, "documents"))
    scan_schema = (
        fresh.select("doc_id", "meta.width")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    read = re.search(r"ReadSchema: (\S+)", scan_schema)
    assert read, scan_schema
    assert "text" not in read.group(1) and "payload" not in read.group(1)


def test_phash_dedup_catches_inplace_edits_not_reframes(spark):
    """Perceptual dedup semantics: a single IN-PLACE byte edit (pixel
    noise analog) keeps Hamming small → every planted twin pairs up;
    byte-digest dedup on the same twins finds nothing (the digests all
    differ) — that separation is the op's reason to exist."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    media = MM.synthesize_media(docs)
    twin = media.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "payload",
        F.expr("overlay(payload placing to_binary('Z', 'utf-8') from 5)"),
    )
    both = media.unionByName(twin)
    pairs = MM.phash_near_dups(both, max_hamming=6)
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 100000).count()
    n = media.count()
    from postpy_spark.testing import record_margin
    record_margin("multimodal_phash_dedup", "planted_twin_recall", planted / n, 0.98)
    assert planted >= n * 0.98, (planted, n)
    # byte-exact dedup must NOT pair them (every payload differs)
    digests = both.select(
        "doc_id", F.sha2(F.col("payload"), 256).alias("d")
    )
    a, b = digests.alias("a"), digests.alias("b")
    byte_pairs = a.join(
        b,
        (F.col("a.d") == F.col("b.d"))
        & (F.col("b.doc_id") - F.col("a.doc_id") == 100000),
    ).count()
    assert byte_pairs == 0
