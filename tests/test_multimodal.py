"""Multimodal binary-column plumbing: schema, Arrow batch shape, null
handling, frame-sample explode. Decode itself is stubbed (no image libs in
this container) — the deterministic fake exercises the full path."""

import hashlib

import pytest
from pyspark.sql import functions as F

from importpipeline_spark.operators.multimodal import (
    attach_fake_payload,
    decode_image_stub,
    extract_meta,
    frame_sample_stub,
)


def test_extract_meta_matches_python(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "päyload")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in extract_meta(attach_fake_payload(df)).collect()}
    for doc_id, text in [(1, "hello world"), (2, ""), (3, "päyload")]:
        payload = b"FAKEIMG1" + text.encode()
        r = got[doc_id]
        assert r.n_bytes == len(payload)
        assert r.mime == "image/x-fake"
        assert r.payload_hash == hashlib.md5(payload).hexdigest()[:16]
        w, h = decode_image_stub(payload)
        assert (r.width, r.height) == (w, h)
        assert 16 <= r.width < 80 and 16 <= r.height < 80


def test_extract_meta_null_payload(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"FAKEIMG1xx"), "image/x-fake"), (2, None, None)],
        "doc_id long, payload binary, mime string",
    )
    got = {r.doc_id: r for r in extract_meta(df).collect()}
    assert got[2].n_bytes == 0
    assert got[2].payload_hash is None and got[2].width is None
    assert got[1].n_bytes == 10


def test_decode_stub_honest():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image_stub(b"x", fake=False)


def test_frame_sample_explode(spark):
    df = attach_fake_payload(
        spark.createDataFrame([(7, "vid")], "doc_id long, text string")
    )
    frames = frame_sample_stub(df, every_n=5)
    rows = frames.select("doc_id", "frame_idx", "frame_key").collect()
    assert len(rows) == 5
    assert sorted(r.frame_idx for r in rows) == list(range(5))
    assert all(r.frame_key == f"7:{r.frame_idx}" for r in rows)
