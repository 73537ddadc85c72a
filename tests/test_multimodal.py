"""Multimodal plumbing: deterministic stub decode, Arrow batch path,
binary metadata, and the explicit real-decoder guard."""

from __future__ import annotations

import pytest

from customer_review__etl_spark.multimodal import binary as B
from customer_review__etl_spark.sources import tables

from conftest import SF_DIR


def test_fake_decode_deterministic():
    b = b"some image bytes"
    assert B.fake_decode(b) == B.fake_decode(b)
    w, h, c, lum = B.fake_decode(b)
    assert 64 <= w <= 255 and 64 <= h <= 255 and 1 <= c <= 4
    assert 0.0 <= lum <= 1.0
    assert B.fake_decode(None) == (0, 0, 0, 0.0)


def test_real_decoder_guard():
    with pytest.raises(NotImplementedError):
        B.decode_image(b"bytes")


def test_extract_features_schema_and_rows(spark):
    docs = B.with_blob(tables.load(spark, SF_DIR, "documents"))
    out = B.extract_features(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "n_channels", "mean_lum",
    ]
    rows = out.collect()
    assert len(rows) == docs.count()


def test_binary_meta_matches_text_bytes(spark):
    docs = B.with_blob(tables.load(spark, SF_DIR, "documents")).limit(5)
    for r in B.binary_meta(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    ).collect():
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))


def test_frame_sample_strided(spark):
    docs = B.with_blob(tables.load(spark, SF_DIR, "documents")).limit(20)
    rows = B.frame_sample(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        n_frames = doc_rows[0]["n_frames"]
        idx = sorted(r["frame_idx"] for r in doc_rows)
        assert idx == list(range(0, n_frames, B.FRAME_STRIDE))


def _ppm(w, h, rgb):
    """Binary P6 bytes for a solid-color w×h image."""
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def test_real_ppm_decode_exact():
    """decode_image really decodes uncompressed PPM — no libraries:
    exact dims/channels, exact Rec.601 mean luminance."""
    w, h = 4, 3
    img = _ppm(w, h, (255, 0, 0))  # pure red
    assert B.decode_image(img) == (4, 3, 3, 299 * 255 / (1000.0 * 255.0))
    gray = _ppm(2, 2, (128, 128, 128))
    gw, gh, gc, gl = B.decode_image(gray)
    assert (gw, gh, gc) == (2, 2, 3)
    assert abs(gl - 128 / 255.0) < 1e-12
    # comment + multi-space header tolerated
    weird = b"P6  # c\n 2\n1 255\n" + bytes((0, 0, 0)) * 2
    assert B.decode_image(weird)[:3] == (2, 1, 3)


def test_real_decode_through_mapinpandas(spark):
    """The real decoder rides the SAME mapInPandas batch path as the
    fake: PPM blobs in, exact features out, across partitions."""
    rows = [
        (1, bytearray(_ppm(4, 3, (255, 0, 0)))),
        (2, bytearray(_ppm(2, 5, (0, 255, 0)))),
        (3, bytearray(_ppm(3, 3, (0, 0, 255)))),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, blob BINARY").repartition(2)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_channels"],
                      round(r["mean_lum"], 9))
        for r in B.extract_features(df, real=True).collect()
    }
    assert got == {
        1: (4, 3, 3, round(299 / 1000.0, 9)),
        2: (2, 5, 3, round(587 / 1000.0, 9)),
        3: (3, 3, 3, round(114 / 1000.0, 9)),
    }
