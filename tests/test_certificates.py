"""Certificate falsifiability (VERDICT r06 "Next round" #5).

Several H queries are *certificates*: their DuckDB oracle states constant
``TRUE`` bits and the Spark side computes the REAL boolean from the real
artifact (trained model, reconstructed bytes, sketch value). Such a row
proves something only if the bit CAN go false — a certificate that cannot
fail proves nothing. This module:

1. lints the registry: every oracle carrying a constant-TRUE bit must have
   a registered flip test (``CERT_FLIP_TESTS``, the ``R_ALLOWLIST``
   pattern), and every referenced test must exist;
2. supplies the flip tests that were missing — each feeds a DELIBERATELY
   broken artifact into the same bit-derivation code the registered query
   uses and asserts the load-bearing bits go false.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

#: certificate query -> (test module, test function) proving its bits flip.
CERT_FLIP_TESTS = {
    "approx_distinct": ("tests.test_certificates", "test_approx_tolerance_bit_flips"),
    "grouped_percentile_approx": (
        "tests.test_planted_round6",
        "test_rank_certificate_bits_flip_on_wrong_values",
    ),
    "transfer_stats_rollup_approx": (
        "tests.test_planted_round6",
        "test_rank_certificate_bits_flip_on_wrong_values",
    ),
    "ivf_train_kmeans": (
        "tests.test_kmeans",
        "test_certificate_inertia_bit_can_flip",
    ),
    "pq_train_codebooks": (
        "tests.test_certificates",
        "test_pq_inertia_bit_can_flip",
    ),
    "bpe_train_merges": ("tests.test_certificates", "test_bpe_train_bits_flip"),
    "bpe_segment_corpus": (
        "tests.test_certificates",
        "test_bpe_segment_bits_flip",
    ),
    "near_dup_pagerank": ("tests.test_certificates", "test_pagerank_bits_flip"),
    "embedding_pca_project": (
        "tests.test_certificates",
        "test_pca_model_bits_flip",
    ),
    "orc_file_chunks": (
        "tests.test_certificates",
        "test_cover_certificate_bits_flip",
    ),
    "parquet_file_chunks": (
        "tests.test_certificates",
        "test_cover_certificate_bits_flip",
    ),
    "orc_reconstruction": (
        "tests.test_certificates",
        "test_reconstruction_bit_flips",
    ),
    "parquet_reconstruction": (
        "tests.test_certificates",
        "test_reconstruction_bit_flips",
    ),
    "cdc_file_chunks": ("tests.test_cdc", "test_cdc_certificate_bits_flip"),
    "cdc_dedup_report": ("tests.test_cdc", "test_report_bits_flip"),
    "cdc_dedup_report_parquet": (
        "tests.test_cdc",
        "test_report_bits_flip_parquet_names",
    ),
    "file_inventory": ("tests.test_chunkers", "test_inventory_bits_flip"),
    "parquet_column_census": (
        "tests.test_parquet_census",
        "test_byte_bits_flip_on_corrupted_page_header",
    ),
    "orc_zone_map_pruning": ("tests.test_zonemap", "test_zone_map_bits_flip"),
    "orc_stats_pruned_dedup": (
        "tests.test_zonemap",
        "test_stats_pruned_bits_flip",
    ),
    "parquet_stats_pruned_dedup": (
        "tests.test_zonemap",
        "test_stats_pruned_bits_flip",  # shared derivation, one flip test
    ),
    # the r10 column-level fallback pair ships the SAME certificate
    # derivation (stats_pruned_certificate), so the shared flip test
    # covers their bits; the fallback-set derivation itself is pinned by
    # test_column_fallback_recovers_perturbed_files (region hits must
    # contribute no fallback columns).
    "orc_stats_pruned_columns": (
        "tests.test_zonemap",
        "test_stats_pruned_bits_flip",
    ),
    "parquet_stats_pruned_columns": (
        "tests.test_zonemap",
        "test_stats_pruned_bits_flip",
    ),
    # the 9th streaming family serves the SAME certificate derivation
    # from the maintained table (test_stats_pruned_bits_flip covers those
    # bits); the r11 served_from_index guard bit has its own flip test,
    # registered here for all three legs. The maintainer's replay-zero
    # claim is separately pinned by
    # test_statskey_merge_idempotent_and_dup_guarded (+ the two-level
    # twin).
    "streaming_statsprune_parity": (
        "tests.test_streaming",
        "test_statsprune_served_bit_flips_on_inplan_substitute",
    ),
    "streaming_statsprune_parquet_parity": (
        "tests.test_streaming",
        "test_statsprune_served_bit_flips_on_inplan_substitute",
    ),
    "streaming_statsprune_columns_parity": (
        "tests.test_streaming",
        "test_statsprune_served_bit_flips_on_inplan_substitute",
    ),
    # (orc_hierarchical_pruned's VALUES-style oracle sits outside this
    # guard's TRUE-AS derivation, like orc_hierarchical_dedup's; its flip
    # test is tests/test_orc_queries.py::test_hierarchical_pruned_bits_flip.)
    # r11: the pinned-census numeric drift gate.
    "orc_stats_census_drift": (
        "tests.test_zonemap",
        "test_census_drift_bits_flip",
    ),
    "parquet_zone_map_pruning": (
        "tests.test_zonemap",
        "test_parquet_zone_map_walker_and_bits",
    ),
    "cross_format_dedup": (
        "tests.test_crossformat",
        "test_cross_format_bits_flip",
    ),
    # r11 late batch: the JSONL source-format guard and the maintained
    # winnowing index's two-table served bit.
    "jsonl_ingest_dedup": (
        "tests.test_winnowing",
        "test_jsonl_read_bit_flips",
    ),
    "streaming_winnow_parity": (
        "tests.test_winnowing",
        "test_winnow_served_bit_flips_on_inplan_substitute",
    ),
}


def test_every_certificate_has_a_flip_test():
    """Derive the certificate set from the ORACLES themselves (any constant
    ``TRUE AS bit``), then require a one-to-one flip-test registration. A
    new certificate query fails here until its falsifiability test exists;
    a stale entry fails when the certificate is retired."""
    import importlib

    import __spark_entry__ as m

    certs = {
        name
        for name, sql in m.oracle_sql().items()
        if re.search(r"\bTRUE AS \w+", sql, re.IGNORECASE)
    }
    assert certs == set(CERT_FLIP_TESTS), (
        f"unregistered certificates: {sorted(certs - set(CERT_FLIP_TESTS))}; "
        f"stale entries: {sorted(set(CERT_FLIP_TESTS) - certs)}"
    )
    for query, (mod, fn) in CERT_FLIP_TESTS.items():
        module = importlib.import_module(mod)
        assert callable(getattr(module, fn, None)), (query, mod, fn)


# -- the flip tests themselves -------------------------------------------------


def test_approx_tolerance_bit_flips(spark):
    """within_pct_bit: true at a 10% deviation boundary, false beyond it."""
    from columnar_aware_dedup_spark.operators.relational import within_pct_bit

    df = spark.createDataFrame(
        [(100, 100), (110, 100), (111, 100), (89, 100)],
        "_approx long, exact long",
    ).select(within_pct_bit("_approx", "exact", 0.10).alias("ok"))
    assert [r["ok"] for r in df.collect()] == [True, True, False, False]


def test_pq_inertia_bit_can_flip(spark):
    """PQ's inertia_improved_ok is falsifiable: trained codebooks beat the
    seed on planted subspace clusters, while all-zero codebooks regress —
    so a broken update step cannot hide (the kmeans _total_inertia twin)."""
    from columnar_aware_dedup_spark.operators.pq import (
        _inertia_per_j,
        _init_codebooks,
        pq_train,
        subvectors,
    )

    rows = []
    for i in range(24):
        base = 10.0 if i % 2 else -10.0
        rows.append(
            (i, [base + (i % 3) * 0.1] * 2 + [-base - (i % 3) * 0.1] * 2)
        )
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seed = _init_codebooks(e, 2, 2)
    trained = pq_train(e, m=2, k=2, iters=2)
    bad = spark.createDataFrame(
        [(j, c, [0.0, 0.0]) for j in range(2) for c in range(2)],
        "j int, code int, ce array<double>",
    )
    subs = subvectors(e, 2)

    def total(cent):
        return sum(
            r["inertia"] for r in _inertia_per_j(subs, cent).collect()
        )

    i_seed, i_trained, i_bad = total(seed), total(trained), total(bad)
    assert i_trained <= i_seed + 1e-9
    assert i_bad > i_seed, "zero codebooks must regress the objective"


def _merges_df(spark, rows):
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, merged string, freq bigint"
    )


def test_bpe_train_bits_flip(spark):
    """train_certificate: a valid 2-merge table passes every bit on its
    ranks (and the exhausted-fallback bit correctly FAILS the untrained
    ranks while pairs remain); each class of corruption flips its bit."""
    from columnar_aware_dedup_spark.operators.bpe import train_certificate

    words = spark.createDataFrame([("abab", 2)], "word string, n long")
    good = [(1, "a", "b", "ab", 4), (2, "ab", "</w>", "ab</w>", 2)]

    def bits(rows):
        out = {
            r["merge_rank"]: r
            for r in train_certificate(
                spark, _merges_df(spark, rows), words
            ).collect()
        }
        return out

    g = bits(good)
    for rank in (1, 2):
        assert all(v for k, v in g[rank].asDict().items() if k.endswith("_ok")), g[rank]
    # untrained ranks with pairs remaining: the exhausted fallback is FALSE
    assert not g[3]["parts_known_ok"]

    bad_concat = bits([good[0], (2, "ab", "</w>", "xx", 2)])
    assert not bad_concat[2]["merged_is_concat_ok"]

    bad_parts = bits([good[0], (2, "qq", "</w>", "qq</w>", 2)])
    assert not bad_parts[2]["parts_known_ok"]

    bad_order = bits([good[0], (2, "ab", "</w>", "ab</w>", 5)])
    assert not bad_order[2]["freq_nonincreasing_by_rank_ok"]

    bad_budget = bits([(1, "a", "b", "ab", 100), good[1]])
    assert not bad_budget[1]["freq_within_pair_budget_ok"]

    bad_zero = bits([good[0], (2, "ab", "</w>", "ab</w>", 0)])
    assert not bad_zero[2]["freq_positive_ok"]


def test_bpe_segment_bits_flip(spark):
    """segment_certificate: a correct segmentation passes; a dropped symbol
    flips roundtrip_ok; an impossible subword count flips bounds."""
    from columnar_aware_dedup_spark.operators.bpe import segment_certificate

    seg = spark.createDataFrame(
        [
            ("ab", 1, "a b </w>", 3),
            ("cd", 1, "c </w>", 2),
            ("ef", 1, "e f </w>", 5),
        ],
        "word string, n long, segmentation string, n_subwords bigint",
    )
    out = {r["word"]: r for r in segment_certificate(seg).collect()}
    assert out["ab"]["roundtrip_ok"] and out["ab"]["subword_bounds_ok"]
    assert not out["cd"]["roundtrip_ok"], "dropped symbol must flip"
    assert not out["ef"]["subword_bounds_ok"], "n_subwords > len+1 must flip"


def test_pagerank_bits_flip(spark):
    """pagerank_certificate: the real rank vector passes; halved mass flips
    rank_sum_ok, a negative rank flips rank_floor_ok for its row."""
    from columnar_aware_dedup_spark.operators.clustering import (
        connected_components_star,
        pagerank,
        pagerank_certificate,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    labels = connected_components_star(edges)
    good = pagerank(edges)
    ok = pagerank_certificate(edges, labels, good).collect()
    assert all(r["rank_floor_ok"] and r["rank_sum_ok"] for r in ok)

    halved = good.select("doc_id", (F.col("rank") / 2).alias("rank"))
    lost = pagerank_certificate(edges, labels, halved).collect()
    assert all(not r["rank_sum_ok"] for r in lost), "lost mass must flip"

    doctored = good.select(
        "doc_id",
        F.when(F.col("doc_id") == 1, F.lit(-0.1)).otherwise(
            F.col("rank")
        ).alias("rank"),
    )
    neg = {r["doc_id"]: r for r in pagerank_certificate(edges, labels, doctored).collect()}
    assert not neg[1]["rank_floor_ok"], "negative rank must flip its row"


def test_pca_model_bits_flip(spark):
    """model_bits: a well-formed model passes; non-unit axis, non-orthogonal
    axes, inverted eigenvalue order, and trace-exceeding lam1 each flip
    their bit."""
    from columnar_aware_dedup_spark.operators.pca import model_bits

    schema = (
        "mu array<double>, n long, ragged_ok boolean, v1 array<double>,"
        " lam1 double, v2 array<double>, lam2 double"
    )
    # coalesce(1): a 1-row local relation is otherwise parallelized to
    # defaultParallelism partitions, and the model x tvar join then fans
    # out to |model| x |tvar| partitions (r12 — this test was 61 s of
    # 1024-task stages for five 1-row collects).
    tvar = spark.createDataFrame([(3.0,)], "total_var double").coalesce(1)
    mu = [0.0, 0.0, 0.0, 0.0]

    def bits(v1, lam1, v2, lam2):
        model = spark.createDataFrame(
            [(mu, 10, True, v1, lam1, v2, lam2)], schema
        ).coalesce(1)
        return model_bits(model, tvar).collect()[0]

    good = bits([1.0, 0.0, 0.0, 0.0], 2.0, [0.0, 1.0, 0.0, 0.0], 1.0)
    assert all(v for k, v in good.asDict().items() if k.endswith("_ok")), good

    assert not bits([2.0, 0.0, 0.0, 0.0], 2.0, [0.0, 1.0, 0.0, 0.0], 1.0)[
        "axes_unit_ok"
    ]
    assert not bits([1.0, 0.0, 0.0, 0.0], 2.0, [1.0, 0.0, 0.0, 0.0], 1.0)[
        "axes_orthogonal_ok"
    ]
    assert not bits([1.0, 0.0, 0.0, 0.0], 1.0, [0.0, 1.0, 0.0, 0.0], 2.0)[
        "eigval_order_ok"
    ]
    assert not bits([1.0, 0.0, 0.0, 0.0], 9.0, [0.0, 1.0, 0.0, 0.0], 1.0)[
        "eigval_bounded_ok"
    ]


def test_cover_certificate_bits_flip(spark):
    """cover_certificate: an exact gap-free footer-terminated cover passes
    all four structural bits; a gap, a size mismatch, a missing structural
    chunk, and a doubled footer each flip theirs."""
    from columnar_aware_dedup_spark.sources.chunkers import cover_certificate

    schema = "file string, start long, size long, chunk_type string"

    def bits(rows):
        df = spark.createDataFrame(rows, schema)
        return cover_certificate(df, "Column", "Footer").collect()[0]

    good = bits([("f", 0, 10, "Column"), ("f", 10, 5, "Footer")])
    assert all(v for k, v in good.asDict().items() if k.endswith("_ok")), good

    gap = bits([("f", 0, 10, "Column"), ("f", 12, 5, "Footer")])
    assert not gap["cover_contiguous_ok"]

    overlap = bits([("f", 0, 10, "Column"), ("f", 8, 7, "Footer")])
    assert not overlap["cover_contiguous_ok"]

    no_structure = bits([("f", 0, 10, "Other"), ("f", 10, 5, "Footer")])
    assert not no_structure["structure_parsed_ok"]

    two_footers = bits(
        [("f", 0, 10, "Footer"), ("f", 10, 5, "Footer")]
    )
    assert not two_footers["footer_ok"]


def test_reconstruction_bit_flips(spark):
    """reconstruct_files: a complete chunk cover reassembles byte-identical;
    a chunker that drops the tail flips ``identical``, and a single-chunk
    cover flips the derived ``chunked_ok`` (n_chunks >= 2)."""
    from columnar_aware_dedup_spark.sources.chunkers import reconstruct_files

    files = spark.createDataFrame(
        [("f1", bytearray(b"hello world, twelve bytes plus"))],
        "path string, content binary",
    )

    def full_cover(data):
        mid = len(data) // 2
        return [
            {"start": 0, "size": mid},
            {"start": mid, "size": len(data) - mid},
        ]

    def drops_tail(data):
        return [{"start": 0, "size": len(data) // 2}]

    ok = reconstruct_files(files, chunker=full_cover).collect()[0]
    assert ok["identical"] and ok["n_chunks"] == 2

    bad = reconstruct_files(files, chunker=drops_tail).collect()[0]
    assert not bad["identical"], "a dropped chunk must flip identity"
    assert bad["n_chunks"] < 2, "and fails the chunked_ok derivation"
