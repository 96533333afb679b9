"""Product quantization: planted-structure recovery, encode/ADC sanity,
and the zero-shuffle encode plan property."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq_

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators import pq
from columnar_aware_dedup_spark.plans import explain

from tests.conftest import rows_equal


def _write_embeddings(tmp_path, vecs):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq_.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_pq_train_recovers_planted_subspace_structure(spark, tmp_path):
    """Vectors built by picking one of two planted patterns PER SUBSPACE
    (+ a tiny deterministic jitter): training k=2 codebooks must give all
    vectors sharing a sub-pattern the same code in that subspace, with
    near-zero within-cell distance."""
    from columnar_aware_dedup_spark.io import table

    # dim 8, m=2 subspaces of 4; sub-patterns A=10s, B=-10s
    def vec(i):
        a = [10.0] * 4 if i % 2 == 0 else [-10.0] * 4
        b = [10.0] * 4 if i % 3 == 0 else [-10.0] * 4
        out = a + b
        out[i % 8] += 0.01 * (i % 5)  # tiny jitter, breaks exact ties
        return out

    sf_dir = _write_embeddings(tmp_path, [vec(i) for i in range(24)])
    e = table(spark, sf_dir, "embeddings")
    cent = pq.pq_train(e, m=2, k=2, iters=3)
    subs = pq.subvectors(e, m=2)
    best = (
        "element_at(array_sort(transform(element_at(cbs, j + 1).cents,"
        " c -> struct(aggregate(zip_with(sv, c.ce,"
        " (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE),"
        " (acc, v) -> acc + v) AS d, c.code AS code))), 1).code"
    )
    assigned = subs.join(F.broadcast(pq._fold_codebooks(cent))).select(
        "vec_id", "j", F.expr(best).alias("code")
    )
    got = {(r["vec_id"], r["j"]): r["code"] for r in assigned.collect()}
    # same sub-pattern -> same code, different pattern -> different code
    for j, pick in ((0, lambda i: i % 2 == 0), (1, lambda i: i % 3 == 0)):
        codes_a = {got[(i, j)] for i in range(24) if pick(i)}
        codes_b = {got[(i, j)] for i in range(24) if not pick(i)}
        assert len(codes_a) == 1 and len(codes_b) == 1, (j, codes_a, codes_b)
        assert codes_a != codes_b, f"subspace {j} collapsed both patterns"


def test_pq_topk_matches_exact_on_separated_clusters(spark, tmp_path):
    """With well-separated clusters, PQ/ADC top-k must recover the exact
    cosine top-k (recall 1.0 for every query) — quantization error is far
    smaller than the cluster separation."""
    # 64-dim, 46+ vectors so queries (0..9) and medoids (30..45) exist.
    # cluster c = one-hot-ish block pattern; members i differ by tiny jitter
    def vec(i):
        c = i % 4
        out = [0.0] * 64
        for d in range(16):
            out[c * 16 + d] = 50.0
        out[i % 64] += 0.01 * (1 + i % 7)
        return out

    sf_dir = _write_embeddings(tmp_path, [vec(i) for i in range(48)])
    rec = pq.ann_pq_recall(spark, sf_dir).collect()
    assert len(rec) == 10
    for r in rec:
        assert r["pq_recall"] == 1.0, (r["query_id"], r["pq_recall"])


def test_pq_encode_contributes_no_exchange(spark, sf_dir):
    """The encode side is a narrow map: the only exchanges in ann_pq_topk
    are the tiny codebook/query folds and the final per-query ranking —
    the collection itself never shuffles before ranking."""
    df = pq.ann_pq_topk(spark, sf_dir)
    n = explain.n_exchanges(df)
    # codebook fold (2 tiny aggs) + query broadcast + final window shuffle;
    # anything above 6 means the collection scan started shuffling.
    assert n <= 6, f"ann_pq_topk grew to {n} exchanges:\n" + explain.plan_string(df)


def test_pq_codes_are_m_small_ints(spark, sf_dir):
    """Every encoded vector carries exactly _M codes in [0, _KSUB)."""
    from columnar_aware_dedup_spark.io import table

    e = table(spark, sf_dir, "embeddings")
    encoded = e.join(F.broadcast(pq.fixed_codebooks(e))).select(
        "vec_id", pq.encode_expr().alias("codes")
    )
    bad = encoded.filter(
        (F.size("codes") != pq._M)
        | F.exists("codes", lambda c: (c < 0) | (c >= pq._KSUB))
    )
    assert bad.count() == 0


def test_pq_index_serves_identical_results(spark, sf_dir):
    """Encode-once/query-many: the persisted code table serves exactly the
    ranking the scan form computes, and the code table's read schema is
    codes-only (never the raw vectors)."""
    tbl = "test_pq_codes"
    pq.write_pq_index(spark, sf_dir, tbl)
    via_index = pq.ann_pq_topk_from_index(spark, sf_dir, tbl)
    via_scan = pq.ann_pq_topk(spark, sf_dir)
    assert rows_equal(via_index, via_scan)
    # the collection side of the index plan must not read embeddings
    plan = explain.plan_string(via_index, "formatted")
    scans = [
        frag for frag in plan.split("Scan parquet")[1:]
    ]
    assert any("codes" in s.split("ReadSchema")[1][:200] for s in scans if "ReadSchema" in s), plan
