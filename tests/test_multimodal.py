"""Multimodal pipeline plumbing: schemas, batch shapes, determinism of the
fallback kernels, and the real-PIL path when the library is importable."""

from __future__ import annotations

import base64

import pytest

from columnar_aware_dedup_spark.operators import multimodal

#: a valid 1x1 white-pixel PNG (hand-assembled, no image lib needed).
_PNG_1PX = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4//8/"
    "AwAI/AL+hc2rNAAAAABJRU5ErkJggg=="
)


def test_decode_stub_deterministic(spark, sf_dir):
    p = multimodal.payload_table(spark, sf_dir)
    a = {r["doc_id"]: tuple(r) for r in multimodal.decode_payloads(p).collect()}
    b = {r["doc_id"]: tuple(r) for r in multimodal.decode_payloads(p).collect()}
    assert a == b
    for _, (_, w, h, n, luma) in a.items():
        assert 64 <= w < 256 and 64 <= h < 256
        assert 1 <= n <= 8
        assert 0.0 <= luma <= 1.0


def test_resize_shapes(spark, sf_dir):
    p = multimodal.payload_table(spark, sf_dir)
    rows = multimodal.resize_payloads(p, target=32).collect()
    assert len(rows) == p.count()
    for r in rows:
        assert r["width"] <= 32 and r["height"] <= 32
        assert len(r["thumb_bytes"]) == 32 * 32 // 64


def test_fake_path_used_for_non_images():
    """Text payloads never decode as images, so results are identical whether
    or not PIL is installed (the driver fixtures stay deterministic)."""
    payload = b"just some utf-8 text, definitely not a PNG"
    w, h, n, luma = multimodal._decode_kernel(payload)
    import hashlib

    d = hashlib.md5(payload).digest()
    assert (w, h, n) == (64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 8)
    assert luma == round(d[3] / 255.0, 6)


@pytest.mark.skipif(multimodal._PILImage is None, reason="PIL not importable")
def test_real_decode_path():
    """With PIL present, a genuine PNG payload takes the REAL kernel: exact
    dimensions and luma, not the hash-derived fake."""
    assert multimodal.REAL_DECODE
    w, h, n, luma = multimodal._decode_kernel(_PNG_1PX)
    assert (w, h, n) == (1, 1, 1)
    assert luma == 1.0  # white pixel
    tw, th, thumb = multimodal._resize_kernel(_PNG_1PX, target=8)
    assert (tw, th) == (8, 8)
    assert thumb[:8] == b"\x89PNG\r\n\x1a\n"  # real PNG thumbnail bytes


def test_frame_sample_counts(spark, sf_dir):
    p = multimodal.payload_table(spark, sf_dir)
    decoded = {r["doc_id"]: r["n_frames"] for r in multimodal.decode_payloads(p).collect()}
    frames = multimodal.sample_frames(p, every_n=2).collect()
    by_doc: dict[int, int] = {}
    for r in frames:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    for doc_id, n_frames in decoded.items():
        assert by_doc[doc_id] == (n_frames + 1) // 2
