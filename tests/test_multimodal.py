"""Multimodal pipeline plumbing: schemas, batch shapes, determinism of the
stub kernels (the real decoders drop into the same signatures)."""

from __future__ import annotations

from columnar_aware_dedup_spark.operators import multimodal


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


def test_frame_sample_counts(spark, sf_dir):
    p = multimodal.payload_table(spark, sf_dir)
    decoded = {r["doc_id"]: r["n_frames"] for r in multimodal.decode_payloads(p).collect()}
    frames = multimodal.sample_frames(p, every_n=2).collect()
    by_doc: dict[int, int] = {}
    for r in frames:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    for doc_id, n_frames in decoded.items():
        assert by_doc[doc_id] == (n_frames + 1) // 2
