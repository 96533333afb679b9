"""Acoustic fingerprint family: planted gain-shift invariance and the
pigeonhole recall guarantee of the banded near-dup join.

The oracle gate (``test_registry_oracles``) already hash-checks both queries
against DuckDB; these tests pin the two claims the oracle can't see: that
the fixture really plants byte-different/fingerprint-identical classes, and
that banding loses NO pair within the Hamming radius (the oracle uses the
same banding, so it would miss a shared recall bug).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from columnar_aware_dedup_spark.functions import audiocodec
from columnar_aware_dedup_spark.operators.audiofp import (
    _FRAME,
    _HAM_T,
    audio_fingerprint_near_dup,
)


def _fingerprint(doc_id: int) -> tuple[int, int, int, int]:
    """The kernel's math, stand-alone (same code path as the Arrow kernel)."""
    _, _, _, samples = audiocodec.parse_wav(audiocodec.synth_class_wav(doc_id))
    e = np.abs(samples.astype(np.int64)).reshape(64, _FRAME).sum(axis=1)
    bits = (64 * e > e.sum()).astype(np.int64)
    weights = 1 << np.arange(16, dtype=np.int64)
    return tuple(int(b) for b in (bits.reshape(4, 16) * weights).sum(axis=1))


def test_gain_shifted_copies_share_fingerprint_but_not_bytes():
    """Same class (doc_id % 37), different gain (doc_id % 4): the WAV bytes
    (and so any byte/md5 dedup key) differ, every fingerprint bit agrees."""
    checked = 0
    for base in range(audiocodec.FP_CLASSES):
        a, b = base, base + audiocodec.FP_CLASSES  # same class, gain differs
        if (1 + a % 4) == (1 + b % 4):
            continue
        assert audiocodec.synth_class_wav(a) != audiocodec.synth_class_wav(b)
        assert _fingerprint(a) == _fingerprint(b)
        checked += 1
    assert checked >= 20, "fixture must plant many gain-shifted pairs"


def test_banded_near_dup_has_full_recall_at_radius(spark, sf_dir):
    """Pigeonhole guarantee: EVERY pair of docs within Hamming <= _HAM_T
    must appear in the banded output — compared against the exhaustive
    all-pairs truth computed from the same signatures."""
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    sigs = {d: _fingerprint(d) for d in range(n_docs)}
    truth = set()
    for a, b in combinations(range(n_docs), 2):
        ham = sum(bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b]))
        if ham <= _HAM_T:
            truth.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in audio_fingerprint_near_dup(spark, sf_dir).collect()
    }
    assert got == truth
    assert truth, "fixture must plant at least one near-dup pair"
