"""Multimodal binary-column plumbing tests: schema, batching, null
handling, format sniffing, deterministic fake decode, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from nsq2kinesis_spark.functions.multimodal import (
    extract_media_meta,
    fake_decode,
    frame_sample,
    real_decode,
    sniff_format,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepixels" * 20
JPEG = b"\xff\xd8\xff\xe0" + b"jj" * 50
WAV = b"RIFF" + b"\x00" * 60
JUNK = b"not-a-media-file"


def _media_df(spark):
    rows = [(1, PNG), (2, JPEG), (3, WAV), (4, JUNK), (5, None), (6, b"")]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_sniff_format():
    assert sniff_format(PNG) == "png"
    assert sniff_format(JPEG) == "jpeg"
    assert sniff_format(WAV) == "riff"
    assert sniff_format(JUNK) == "unknown"


def test_extract_media_meta_end_to_end(spark):
    out = {r.doc_id: r for r in extract_media_meta(_media_df(spark)).collect()}
    assert out[1].format == "png"
    assert out[2].format == "jpeg"
    assert out[4].format == "unknown"
    assert out[5].format == "empty" and out[5].width is None
    assert out[6].format == "empty"
    assert out[1].n_bytes == len(PNG)
    assert out[1].content_hash == hashlib.md5(PNG).hexdigest()
    # decode is deterministic: same bytes → same fake dimensions
    assert (out[1].width, out[1].height) == fake_decode(PNG)
    assert 16 <= out[1].width <= 255


def test_real_decode_gated():
    with pytest.raises(NotImplementedError, match="codec not available"):
        real_decode(PNG)


def test_frame_sample_shapes(spark):
    frames = frame_sample(_media_df(spark), every_n_bytes=32, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 5 not in by_doc  # null payload skipped
    png_frames = sorted(by_doc[1], key=lambda r: r.frame_no)
    assert [f.frame_no for f in png_frames] == list(range(len(png_frames)))
    assert bytes(png_frames[0].frame) == PNG[:32]
    assert png_frames[0].frame_hash == hashlib.md5(PNG[:32]).hexdigest()
