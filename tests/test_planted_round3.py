"""Planted-signal tests for the round-3 operators: synthetic fixtures with
hand-computed answers, independent of the DuckDB oracles (an oracle match
proves both engines agree, not that the shared semantics are the intended
ones — these tests pin the intent)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _write_events(tmp_path, rows):
    """rows = [(event_id, ts, user_id, event_type, value)] -> fixture dir."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gapfill_fills_gaps_and_carries_forward(spark, tmp_path):
    """Hours 10:00 and 13:00 have events; 11:00 and 12:00 must appear with
    n_events=0 and the 10:00 average carried forward."""
    from columnar_aware_dedup_spark.operators.events import event_gapfill_locf

    h = lambda hour, minute=0: dt.datetime(2024, 1, 1, hour, minute)
    rows = [
        (1, h(10, 5), 1, "click", 4.0),
        (2, h(10, 40), 2, "click", 8.0),
        (3, h(13, 1), 1, "click", 2.0),
    ]
    sf_dir = _write_events(tmp_path, rows)
    got = {
        r["bucket_start"].hour: (r["n_events"], r["filled_avg"])
        for r in event_gapfill_locf(spark, sf_dir).collect()
    }
    assert set(got) == {10, 11, 12, 13}
    assert got[10] == (2, 6.0)
    assert got[11] == (0, 6.0), "gap hour zero-filled, avg carried forward"
    assert got[12] == (0, 6.0)
    assert got[13] == (1, 2.0)


def test_anomaly_flags_planted_spike(spark, tmp_path):
    """24 alternating-count baseline hours then a 10x spike: only the spike
    hour is flagged, with the hand-computed z-score."""
    from columnar_aware_dedup_spark.operators.events import event_anomaly_zscore

    rows = []
    eid = 0
    counts = [3 if i % 2 == 0 else 4 for i in range(24)] + [20]
    for hour, n in enumerate(counts):
        for j in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1) + dt.timedelta(hours=hour, minutes=j),
                    1,
                    "click",
                    1.0,
                )
            )
    sf_dir = _write_events(tmp_path, rows)
    out = event_anomaly_zscore(spark, sf_dir).collect()
    # only hour 24 has a full 24-hour baseline
    assert [r["bucket_start"].hour for r in out] == [0]  # wraps to next day
    row = out[0]
    assert row["n_events"] == 20 and bool(row["is_anomaly"])
    mu = (12 * 3 + 12 * 4) / 24.0
    sd = math.sqrt(sum((c - mu) ** 2 for c in counts[:24]) / 23.0)
    assert abs(row["zscore"] - round((20 - mu) / sd, 6)) < 1e-6


def test_semantic_dedup_flags_identical_vector(spark, tmp_path):
    """A vector byte-identical to an earlier one lands in the same cell and
    is marked a duplicate; the earlier copy survives."""
    from columnar_aware_dedup_spark.operators.similarity import semantic_dedup

    dim = 8
    vecs = []
    for i in range(30):
        base = [((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)]
        vecs.append(base)
    vecs[5] = list(vecs[3])  # planted duplicate (cosine exactly 1)
    t = pa.table(
        {
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 30, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = {r["vec_id"]: r["is_dup"] for r in semantic_dedup(spark, str(tmp_path)).collect()}
    assert got[5] is True, "identical later vector must be dropped"
    assert got[3] is False, "earlier copy survives"


def _write_documents(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_search_requires_every_term(spark, tmp_path):
    """AND semantics: a doc containing two of three query terms never
    matches; tf ranking puts the heavier doc first."""
    from columnar_aware_dedup_spark.operators.search import inverted_index_search

    sf_dir = _write_documents(
        tmp_path,
        [
            "vector stream merge",  # doc 0: all three, tf 3
            "vector vector stream merge merge",  # doc 1: all three, tf 5
            "vector stream stream",  # doc 2: missing 'merge'
            "nothing relevant here",  # doc 3
        ],
    )
    got = [(r["doc_id"], r["total_tf"]) for r in inverted_index_search(spark, sf_dir).collect()]
    assert got == [(1, 5), (0, 3)]


def test_tfidf_prefers_rare_terms(spark, tmp_path):
    """A term unique to one doc outranks a corpus-wide term there."""
    from columnar_aware_dedup_spark.operators.search import tfidf_top_terms

    sf_dir = _write_documents(
        tmp_path,
        [
            "common common unicorn",
            "common common common",
            "common words only",
        ],
    )
    rows = [r for r in tfidf_top_terms(spark, sf_dir).collect() if r["doc_id"] == 0]
    assert rows[0]["term"] == "unicorn", rows
    # tfidf = tf(1) * ln(3/1)
    assert abs(rows[0]["tfidf"] - round(math.log(3.0), 6)) < 1e-6


def test_hash_embedding_unit_norm_and_empty_doc(spark, tmp_path):
    """Non-empty docs embed to unit L2 norm; an all-punctuation doc (no
    tokens after normalization) keeps an all-zero vector."""
    from columnar_aware_dedup_spark.operators.search import doc_hash_embedding

    sf_dir = _write_documents(tmp_path, ["alpha beta gamma", "?!...", "alpha"])
    # the embedding ships as a comma-joined fixed-point string (the driver
    # canon cannot sort array cells — see search.doc_hash_embedding)
    got = {
        r["doc_id"]: [float(v) for v in r["embedding"].split(",")]
        for r in doc_hash_embedding(spark, sf_dir).collect()
    }
    assert all(len(v) == 16 for v in got.values())
    assert all(v == 0.0 for v in got[1]), "token-free doc keeps zero vector"
    for d in (0, 2):
        nrm = math.sqrt(sum(v * v for v in got[d]))
        assert abs(nrm - 1.0) < 1e-4, (d, nrm)


def test_pipeline_dedup_all_decisions(spark, tmp_path):
    """Exact copy -> drop_exact (beats near); unique doc -> keep."""
    from columnar_aware_dedup_spark.operators.text import pipeline_dedup_all

    base = "the quick brown fox jumps over the lazy dog " * 3
    sf_dir = _write_documents(
        tmp_path,
        [base, base, "completely different content about spark engines"],
    )
    got = {r["doc_id"]: r["decision"] for r in pipeline_dedup_all(spark, sf_dir).collect()}
    assert got[0] == "keep"
    assert got[1] == "drop_exact", "identical text drops as exact, not near"
    assert got[2] == "keep"


def test_hash_embeddings_feed_the_ann_stack(spark, tmp_path):
    """The text->vector bridge composes with the existing vector machinery:
    byte-identical documents get identical hash embeddings, land in the same
    LSH bucket in EVERY band, and surface as near-dup candidates."""
    from columnar_aware_dedup_spark.operators.search import doc_hash_embedding
    from columnar_aware_dedup_spark.operators.similarity import lsh_buckets

    dup = "spark shuffles columns into buckets for the join"
    sf_dir = _write_documents(
        tmp_path,
        [dup, "totally unrelated words about storage formats", dup],
    )
    from pyspark.sql import functions as F

    # the query ships the vector as a comma-joined string (driver-canon
    # contract); the ANN stack consumes the parsed array form
    emb = doc_hash_embedding(spark, sf_dir).select(
        F.col("doc_id").alias("vec_id"),
        F.expr(
            "transform(split(embedding, ','), x -> CAST(x AS DOUBLE))"
        ).alias("embedding"),
    )
    b = lsh_buckets(emb).select("vec_id", "bucket")
    a, c = b.alias("a"), b.alias("c")

    cand = (
        a.join(
            c,
            (F.col("c.bucket") == F.col("a.bucket"))
            & (F.col("c.vec_id") > F.col("a.vec_id")),
        )
        .select(F.col("a.vec_id").alias("x"), F.col("c.vec_id").alias("y"))
        .distinct()
        .collect()
    )
    pairs = {(r["x"], r["y"]) for r in cand}
    assert (0, 2) in pairs, pairs
