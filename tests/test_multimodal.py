"""Multimodal plumbing tests (payloads synthesized from document text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.operators import multimodal
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    docs = load_testdata(spark, SF_DIR, ("documents",))["documents"]
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def test_attach_metadata(spark):
    m = multimodal.attach_metadata(_media(spark))
    row = m.filter(F.col("media_id") == 0).select("meta.*", F.octet_length("payload").alias("n")).first()
    assert row.media_type == "image" and row.n_bytes == row.n
    assert [f.name for f in m.schema["meta"].dataType.fields] == [
        f.name for f in multimodal.MEDIA_META_SCHEMA.fields
    ]


def test_decode_images_bmp_roundtrip(spark):
    ids = _media(spark).select("media_id")
    out = multimodal.decode_images(multimodal.synthesize_bmp(ids))
    assert out.count() == ids.count()
    bad = out.filter(
        (F.col("width") != 16 + F.col("media_id") % 32)
        | (F.col("height") != 16 + (F.col("media_id") * 7) % 32)
        | (F.col("channels") != 3)
    ).count()
    assert bad == 0


def test_decode_image_header_bmp_pgm_ppm():
    # BMP: writer/parser round-trip at exact field level
    assert multimodal.decode_image_header(multimodal.bmp_bytes(33, 47)) == (33, 47, 3)
    # negative height = top-down BMP; dims still positive
    import struct

    b = bytearray(multimodal.bmp_bytes(20, 10))
    struct.pack_into("<i", b, 22, -10)
    assert multimodal.decode_image_header(bytes(b)) == (20, 10, 3)
    # binary PPM/PGM with a comment line
    assert multimodal.decode_image_header(b"P6\n# c\n12 34\n255\n" + b"\0" * 10) == (12, 34, 3)
    assert multimodal.decode_image_header(b"P5 7 9 255 " + b"\0" * 63) == (7, 9, 1)
    try:
        multimodal.decode_image_header(b"\x89PNG....")
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("non-BMP/PPM payload must raise")


def test_extract_features_fixed_dim(spark):
    out = multimodal.extract_features(_media(spark))
    sizes = out.select(F.size("feature").alias("d")).distinct().collect()
    assert [s.d for s in sizes] == [multimodal.FEATURE_DIM]
    # histogram normalized: components sum to ≈1
    s = out.select(
        F.expr("aggregate(feature, 0D, (a, x) -> a + x)").alias("s")
    ).agg(F.min("s"), F.max("s")).first()
    assert 0.99 <= s[0] <= s[1] <= 1.01


def test_sample_frames_fanout(spark):
    out = multimodal.sample_frames(_media(spark), frame_bytes=64, every_nth=2)
    assert out.count() > _media(spark).count()  # 1 → N fanout
    r = out.filter(F.col("frame_idx") == 0).select(F.octet_length("frame").alias("n")).first()
    assert 0 < r.n <= 64


def test_resize_bmp_matches_numpy_reference(spark):
    """The resize kernel must equal an independent nearest-neighbor
    computed directly on the decoded source pixels."""
    import numpy as np

    from sales_data_etl_pipeline_spark.operators.multimodal import (
        bmp_bytes,
        resize_bmp,
    )

    for mid, (tw, th) in [(3, (8, 8)), (21, (5, 9)), (40, (12, 4))]:
        w, h = 16 + mid % 32, 16 + (mid * 7) % 32
        src = bmp_bytes(w, h, mid)
        row_len = (w * 3 + 3) & ~3
        pix = (
            np.frombuffer(src, np.uint8, count=row_len * h, offset=54)
            .reshape(h, row_len)[:, : w * 3]
            .reshape(h, w, 3)
        )
        want = pix[(np.arange(th) * h) // th][:, (np.arange(tw) * w) // tw]
        out = resize_bmp(src, tw, th)
        orow = (tw * 3 + 3) & ~3
        got = (
            np.frombuffer(out, np.uint8, count=orow * th, offset=54)
            .reshape(th, orow)[:, : tw * 3]
            .reshape(th, tw, 3)
        )
        assert np.array_equal(got, want)


def test_sampled_frames_are_exact_payload_slices(spark):
    """Frame binaries must be byte-for-byte slices of the source
    payload at idx*256 — the content half the SQL oracle can't check."""
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.operators import multimodal

    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    media = multimodal.synthesize_bmp(ids)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    frames = multimodal.sample_frames(media).collect()
    assert frames
    for r in frames:
        src = payloads[r.media_id]
        assert bytes(r.frame) == src[r.frame_idx * 256 : (r.frame_idx + 1) * 256]
        assert r.frame_idx % 4 == 0
