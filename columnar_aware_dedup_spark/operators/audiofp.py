"""Acoustic fingerprinting (frame-energy hash) + banded audio near-dup.

The last dedup modality: text has exact/MinHash/SimHash/containment, images
have the perceptual aHash (``operators/phash.py``), but an audio corpus also
carries re-encoded, volume-normalized, gain-shifted copies of the SAME
RECORDING whose bytes (and md5) differ. The standard cheap screen is an
energy-comparison fingerprint (the Chromaprint/Shazam family reduced to its
integer core): frame the signal into 64 windows, one bit per frame, set iff
the frame's energy exceeds its share of the total (``64 * E_k > sum(E)``) —
the exact structure of the image aHash, transplanted from pixel space to
frame-energy space. Pure integer arithmetic; both engines agree
bit-for-bit.

Scale shape (the multimodal + SimHash disciplines combined):

- fingerprints come out of ONE fused synth->parse->decode->hash
  ``mapInPandas`` pass (WAV payloads never cross Arrow); a real codec
  corpus drops an ffmpeg/soundfile decode into the same kernel signature;
- pairing is banded, never all-pairs: the 64-bit fingerprint splits into
  four 16-bit bands and only band-equal pairs meet in a bucket join
  (``text.banded_hamming_pairs``, shared with SimHash and the image
  aHash); any pair within Hamming distance 3 shares an untouched band by
  pigeonhole, so the ``<= 3`` verdict has full recall by construction.

Fixture: ``audiocodec.synth_class_samples`` plants duplicate CLASSES —
docs sharing ``doc_id % 37`` play the same waveform shape under a per-doc
integer gain. Because the gain multiplies AFTER the sawtooth's floor
division, frame energies scale exactly linearly, so every strict-inequality
bit is identical across a class while the payload bytes all differ:
byte-level dedup misses them, acoustic dedup must find them. Everything is
closed-form, so the DuckDB oracle regenerates samples, energies, bits, and
the pair set value-for-value (the audio/image oracle discipline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from columnar_aware_dedup_spark.functions import audiocodec
from columnar_aware_dedup_spark.registry import register

#: Hamming threshold; 4 bands of 16 bits give guaranteed recall up to 3
#: flipped bits (a 4th flip could touch every band).
_HAM_T = 3

_FRAME = audiocodec.FP_N_SAMPLES // 64  # samples per frame

#: shared closed-form CTE: per-doc frame energies of the fixture waveform.
#: s_i = gain * (((i % P) * 2A0) // (P - 1) - A0); E_k = sum(|s|) per
#: 16-sample frame; bit_k = 64 * E_k > total; bands pack 16 bits each.
_ENERGY_SQL = f"""
par AS (
  SELECT doc_id,
         16 + doc_id % {audiocodec.FP_CLASSES} AS p,
         1 + doc_id % 4 AS g
  FROM documents
), samp AS (
  SELECT doc_id, i.i AS i,
         g * (((i.i % p) * {2 * audiocodec.FP_BASE_AMP}) // (p - 1)
              - {audiocodec.FP_BASE_AMP}) AS s
  FROM par,
       (SELECT unnest(generate_series(0, {audiocodec.FP_N_SAMPLES - 1})) AS i) i
), fr AS (
  SELECT doc_id, i // {_FRAME} AS k, sum(abs(s)) AS e
  FROM samp GROUP BY 1, 2
), bits AS (
  SELECT doc_id, k,
         CASE WHEN 64 * e > sum(e) OVER (PARTITION BY doc_id)
              THEN 1 ELSE 0 END AS b
  FROM fr
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN k // 16 = 0 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b0,
         CAST(sum(CASE WHEN k // 16 = 1 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b1,
         CAST(sum(CASE WHEN k // 16 = 2 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b2,
         CAST(sum(CASE WHEN k // 16 = 3 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b3
  FROM bits GROUP BY doc_id
)"""

AUDIO_FP_SIG_ORACLE = f"""
WITH {_ENERGY_SQL}
SELECT doc_id, b0, b1, b2, b3 FROM sig ORDER BY doc_id
"""


def audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, b0..b3): the four 16-bit bands of each doc's 64-bit
    frame-energy fingerprint, computed by REALLY encoding and re-parsing
    RIFF/WAVE bytes in one fused Arrow pass (ids fan out, payloads never
    cross Arrow)."""
    from columnar_aware_dedup_spark.operators.multimodal import fanned_doc_ids

    ids = fanned_doc_ids(spark, sf_dir)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                _, _, _, samples = audiocodec.parse_wav(
                    audiocodec.synth_class_wav(int(did))
                )
                e = (
                    np.abs(samples.astype(np.int64))
                    .reshape(64, _FRAME)
                    .sum(axis=1)
                )
                bits = (64 * e > e.sum()).astype(np.int64)
                bands = (bits.reshape(4, 16) * weights).sum(axis=1)
                rows.append((int(did), *(int(b) for b in bands)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return ids.mapInPandas(
        _fp, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


@register("audio_fingerprint_signature", oracle=AUDIO_FP_SIG_ORACLE)
def audio_fingerprint_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc acoustic fingerprint, HASH-CHECKED end to end: the Spark side
    encodes real RIFF/WAVE bytes, walks the chunk list back out, frames the
    int16 samples, and thresholds each frame's energy against the exact
    integer total; the oracle regenerates every sample closed-form. Any
    defect in the codec, the framing, the bit packing, or the threshold
    breaks the match."""
    return audio_fingerprints(spark, sf_dir)


AUDIO_FP_NEAR_DUP_ORACLE = f"""
WITH {_ENERGY_SQL},
bands AS (
  SELECT doc_id, n.n AS band,
         CASE n.n WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
                  ELSE b3 END AS v
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS n) n
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
          + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
         AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
    + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) <= {_HAM_T}
ORDER BY doc_a, doc_b
"""


@register("audio_fingerprint_near_dup", oracle=AUDIO_FP_NEAR_DUP_ORACLE)
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by acoustic fingerprint: band-equal
    candidates (bucket join, never all-pairs) filtered to Hamming distance
    <= 3 — full recall at that radius by pigeonhole over the 4 bands. Finds
    the planted gain-shifted duplicate classes whose bytes and md5 all
    differ; feeds the same cluster/keeper machinery as the text and image
    near-dup pairs (`clustering.connected_components_star`)."""
    from columnar_aware_dedup_spark.operators.text import banded_hamming_pairs

    sigs = audio_fingerprints(spark, sf_dir).localCheckpoint(eager=True)
    return banded_hamming_pairs(sigs, _HAM_T)
