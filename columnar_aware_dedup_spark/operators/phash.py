"""Perceptual image hashing (average hash) + banded image near-dup pairs.

The missing dedup modality: the text family has exact/MinHash/SimHash/
containment dedup and the embedding family has cosine/SemDeDup, but a
multimodal corpus also carries re-encoded, brightness-shifted, metadata-
stripped copies of the SAME IMAGE whose bytes (and md5) differ. The
standard cheap screen is a perceptual hash — here average-hash (aHash):
sample the frame to an 8x8 grid, one bit per cell, set iff the cell is
brighter than the global mean; near-dups are pairs within a small Hamming
distance. All integer arithmetic: ``bit = 64 * gray > total`` needs no
float mean, so both engines agree bit-for-bit.

Scale shape (the multimodal + SimHash disciplines combined):

- hashes come out of ONE fused synth->decode->hash ``mapInPandas`` pass
  (payload bytes never cross Arrow — the r05 multimodal layout); a real
  JPEG corpus drops a PIL/libav decode into the same kernel signature;
- pairing is banded, never all-pairs: the 64-bit hash splits into four
  16-bit bands and only band-equal pairs meet in a bucket join (the
  SimHash banding); with 4 bands, any pair within Hamming distance 3 is
  GUARANTEED to share an untouched band (pigeonhole), so the ``<= 3``
  verdict has full recall by construction, not probabilistically.

Fixture: ``imagecodec.synth_class_frame`` plants duplicate CLASSES —
docs sharing ``doc_id % 41`` show the same pattern under a per-doc global
brightness shift, so their bytes and md5 differ but every aHash bit
(a strict inequality both of whose sides shift equally) is identical:
byte-level dedup misses them, perceptual dedup must find them. Everything
is closed-form, so the DuckDB oracle regenerates the hashes and the pair
set value-for-value (the audio/image oracle discipline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions import imagecodec
from columnar_aware_dedup_spark.registry import register

#: Hamming threshold; 4 bands of 16 bits give guaranteed recall up to 3
#: flipped bits (a 4th flip could touch every band).
_HAM_T = 3

#: shared closed-form CTE: the 64 sampled cell grays per doc. The sample
#: map is the nearest-neighbor resize of a 16x12 frame to 8x8:
#: sy = ty*12//8, sx = tx*16//8, pixel p = sy*16 + sx,
#: gray = sum_c ((cls*7 + p*3 + c) % 200 + delta).
_CELLS_SQL = """
par AS (
  SELECT doc_id, doc_id % 41 AS cls, 1 + doc_id % 3 AS delta
  FROM documents
), cell AS (
  SELECT doc_id, cls, delta, ty.g AS ty, tx.g AS tx,
         ((ty.g * 12) // 8) * 16 + (tx.g * 16) // 8 AS p
  FROM par,
       (SELECT unnest(generate_series(0, 7)) AS g) ty,
       (SELECT unnest(generate_series(0, 7)) AS g) tx
), gray AS (
  SELECT doc_id, ty * 8 + tx AS k,
         ((cls * 7 + p * 3 + 0) % 200 + delta)
       + ((cls * 7 + p * 3 + 1) % 200 + delta)
       + ((cls * 7 + p * 3 + 2) % 200 + delta) AS g
  FROM cell
), bits AS (
  SELECT doc_id, k,
         CASE WHEN 64 * g > sum(g) OVER (PARTITION BY doc_id)
              THEN 1 ELSE 0 END AS b
  FROM gray
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN k // 16 = 0 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b0,
         CAST(sum(CASE WHEN k // 16 = 1 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b1,
         CAST(sum(CASE WHEN k // 16 = 2 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b2,
         CAST(sum(CASE WHEN k // 16 = 3 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b3
  FROM bits GROUP BY doc_id
)"""

AHASH_SIG_ORACLE = f"""
WITH {_CELLS_SQL}
SELECT doc_id, b0, b1, b2, b3 FROM sig ORDER BY doc_id
"""


def ahash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, b0..b3): the four 16-bit bands of each doc's 64-bit aHash,
    computed by REALLY encoding and re-decoding P6 bytes in one fused
    Arrow pass (ids fan out, payloads never cross Arrow)."""
    from columnar_aware_dedup_spark.operators.multimodal import fanned_doc_ids

    ids = fanned_doc_ids(spark, sf_dir)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        w, h = imagecodec.AHASH_W, imagecodec.AHASH_H
        sy = (np.arange(8) * h) // 8
        sx = (np.arange(8) * w) // 8
        weights = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                frames = imagecodec.decode_frames(
                    imagecodec.synth_class_frame(int(did))
                )
                fw, fh, rgb = frames[0]
                px = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                px = px.reshape(fh, fw, 3)
                gray = px[sy][:, sx].sum(axis=2).reshape(64)
                bits = (64 * gray > gray.sum()).astype(np.int64)
                bands = (bits.reshape(4, 16) * weights).sum(axis=1)
                rows.append((int(did), *(int(b) for b in bands)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return ids.mapInPandas(
        _hash, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


@register("image_ahash_signature", oracle=AHASH_SIG_ORACLE)
def image_ahash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perceptual hash, HASH-CHECKED end to end: the Spark side
    encodes real P6 bytes, decodes them back, nearest-neighbor samples to
    8x8, and thresholds against the exact integer mean; the oracle
    regenerates every sampled gray closed-form. Any defect in the codec,
    the resize map, the bit packing, or the threshold breaks the match."""
    return ahash_signatures(spark, sf_dir)


AHASH_NEAR_DUP_ORACLE = f"""
WITH {_CELLS_SQL},
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


@register("image_ahash_near_dup", oracle=AHASH_NEAR_DUP_ORACLE)
def image_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: band-equal candidates
    (bucket join, never all-pairs) filtered to Hamming distance <= 3 —
    full recall at that radius by pigeonhole over the 4 bands. Finds the
    planted brightness-shifted duplicate classes whose bytes and md5 all
    differ; feeds the same cluster/keeper machinery as the text near-dup
    pairs (`clustering.connected_components_star`)."""
    from columnar_aware_dedup_spark.operators.text import banded_hamming_pairs

    sigs = ahash_signatures(spark, sf_dir).localCheckpoint(eager=True)
    return banded_hamming_pairs(sigs, _HAM_T)
