#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE compact JSON line (the LAST line of stdout)::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the ``noop`` sink (all columns
computed, nothing collected to the driver) so timings reflect the real plan,
not a count-pruned one.

Artifact contract (VERDICT r06 "Next round" #1): BENCH_r06.json shipped
``"parsed": null`` because the bench stdout outgrew the driver's tail
capture and the single JSON line was truncated mid-stream. Three defenses:

* the dual-SF scaling block — the biggest and fastest-growing section — is
  written to ``BENCH_SCALING.md`` (human table + one JSON line) instead of
  being inlined in stdout;
* timings are rounded to 2 dp (10 ms resolution, well under the VM noise
  floor) and the JSON is emitted with compact separators;
* the JSON line is printed LAST, after every other write to stdout.

Noise discipline (VERDICT r06 "Next round" #8): every timing is the MIN of
5 runs (this VM's host-scheduling noise swings identical plans 2x between
consecutive runs; the minimum is the reproducible steady-state cost of the
plan, which is what the engine controls), and the JSON carries a 3-PROBE
calibration (r11, VERDICT r10 "Next round" #1) — fixed synthetic plans
pinning the three resource classes the suite actually exercises: JVM
whole-stage codegen (``range(50M) -> sum``), Python workers (a fixed
``mapInPandas`` fold), and parquet-scan I/O (a fixed file written untimed,
scanned timed) — so cross-round comparisons normalize by the probe
matching each query's bottleneck instead of assuming one VM-speed scalar
(the r10 driver artifact proved the single codegen probe does not track
the suite: it read "fast VM" while the suite ran at slow-VM speed).
In-suite vs isolated discrepancies are pinned by ``tools/isolation_ab.py``
(committed artifact: BENCH_ISOLATION.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from columnar_aware_dedup_spark.session import get_spark  # noqa: E402

#: timed runs per query; the recorded number is the minimum (see module doc).
RUNS = 5

#: the queries that define the engine: dedup core, macro relational shapes,
#: text/near-dup pipeline, vector search, event windows, binary chunker.
HEADLINE = [
    "dedup_hit_miss",
    "dedup_hierarchical",
    "chunk_simulate",
    "transfer_stats_rollup",
    "groupby_sum_count",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_rank",
    "text_exact_dedup",
    "minhash_near_dup",
    "token_topk",
    "embedding_cosine_topk",
    "event_session_window",
    "parquet_file_chunks",
    # r02 additions: the reference's ORC-first flagship path over real ORC
    # bytes (binaryFile -> mapInPandas chunker -> linked s+p probe).
    "orc_file_chunks",
    "orc_hierarchical_dedup",
    # r03 additions: the event-analytics surface (sequential-pattern scans
    # over the events stream) gets a perf signal.
    "event_funnel",
    "cohort_retention",
    # r03 additions: semantic dedup (cell-bounded pairwise cosine), the
    # hashing-trick text->vector bridge, and corpus tf-idf.
    "semantic_dedup",
    "doc_hash_embedding",
    "tfidf_top_terms",
    # real WAV encode -> parse -> features (the mapInPandas audio path).
    "multimodal_audio_features",
    # r04 additions: the iterative label-propagation clustering and the ANN
    # recall gate were the last major families with no perf signal, plus the
    # end-to-end curation pipeline and the now-hash-checked image decode.
    "near_dup_clusters",
    "ann_recall_report",
    "pipeline_curate",
    "multimodal_decode",
    # r04 new operators: substring-span dedup, bigram-LM quality score, and
    # the PQ/ADC compressed-vector ANN path.
    "dup_span_fraction",
    "bigram_logprob_score",
    "ann_pq_topk",
    # late-r04 data-selection surface: DSIR importance weights (zero-shuffle
    # broadcast-lambda fold over the corpus), the Zipf-fit diagnostic, and
    # the in-plan Naive Bayes domain classifier (20-class fold, zero-shuffle
    # apply).
    "dsir_importance_weights",
    "token_zipf_slope",
    "naive_bayes_source_classify",
    # sketch surface: the CMS frequency audit and the Bloom store pre-filter
    # (broadcast word-packed bitset over the flagship's chunk signatures).
    "token_heavy_hitters_cms",
    "dedup_bloom_prefilter",
    # r06 additions: the only families that landed without a perf signal —
    # SQ8 scalar-quantized ANN, the perceptual-hash image near-dup, and the
    # 64-bit banded all-corpus SimHash near-dup.
    "ann_sq8_topk",
    "image_ahash_near_dup",
    "simhash_band_near_dup",
    "minhash_recall_report",
    # late-r06 additions: the composed IVF+PQ index (FAISS IVFADC shape),
    # the acoustic-fingerprint audio near-dup, and the four-config LSH
    # banding sweep.
    "ann_ivfpq_topk",
    "audio_fingerprint_near_dup",
    "lsh_parameter_sweep",
    # r06 batch 4: the curation-decision trio (admission gate, per-cell
    # prototypicality prune, perplexity-bucket partition) — new families,
    # so they need a perf signal from their first round.
    "crawl_admission_report",
    "embedding_prototypicality",
    "perplexity_bucket_report",
    "doc_length_outliers",
    "edit_distance_verify",
    "doc_ngram_novelty",
    # r07 additions: the exact substring-duplicate REMOVAL operator (cut
    # ranges + applied corpus) and its crawl-delta twin.
    "substring_dedup_ranges",
    "substring_dedup_apply",
    "substring_dedup_delta",
    # session-2 r07: the content-defined-chunking baselines (FastCDC cover
    # certificate + the fixed-vs-CDC-vs-structural thesis report) — new
    # family, first perf signal.
    "cdc_file_chunks",
    "cdc_dedup_report",
    # session-2 r07 batch 2: the zero-shuffle passage extractor and the
    # exact-k balanced sampler.
    "passage_split",
    "balanced_sample_exact_k",
    # session-2 r07 batch 3: the walker-vs-footer parquet storage census.
    "parquet_column_census",
    # session-2 r07 batch 4: the ORC zone-map pruning certificate.
    "orc_zone_map_pruning",
    # session-2 r07 batch 5: the boilerplate hot-span census.
    "hot_span_census",
    # r08: the passage-level banded near-dup (the passage table's consumer),
    # the CDC thesis measurement's parquet twin, and the exact passage
    # retrieval top-k — new families, so they need a perf signal from
    # their first round.
    "passage_near_dup",
    "cdc_dedup_report_parquet",
    "passage_topk_retrieval",
    "passage_ann_ivf_topk",
    # r08 batch 6: the parquet zone-map certificate (other-format twin).
    "parquet_zone_map_pruning",
    # r08 batch 7 (session 3): the ranked-retrieval pair (BM25 + RRF
    # hybrid) and the cross-format value-vs-byte dedup certificate — new
    # families, first perf signal.
    "bm25_doc_ranking",
    "hybrid_rrf_fusion",
    "cross_format_dedup",
    # r09: the BM25/RRF streaming-index parity certificates (two-wave fold
    # + replay + index-served ranking — the maintenance path's cost is the
    # signal) and the zone-map dedup consumer (stats-pruned incremental
    # chunking) — new families, first perf signal.
    "streaming_bm25_parity",
    "streaming_rrf_parity",
    "orc_stats_pruned_dedup",
    "parquet_stats_pruned_dedup",
    # r10: the column-level stats-pruned fallback (both formats), the
    # passage-level hybrid retrieval family, and the 9th streaming-index
    # family (the persisted stats-key index maintainer) — new
    # registrations, first perf signal.
    "orc_stats_pruned_columns",
    "parquet_stats_pruned_columns",
    "passage_bm25_scores",
    "passage_rrf_fusion",
    "passage_rrf_from_index",
    "streaming_statsprune_parity",
    # r11: the stats-key index family's parquet + two-level legs, the
    # metadata-pruned hierarchical probe, and the pinned-census numeric
    # drift gate — new registrations, first perf signal.
    "streaming_statsprune_parquet_parity",
    "streaming_statsprune_columns_parity",
    "orc_hierarchical_pruned",
    "orc_stats_census_drift",
    # r11 late batch: the winnowing fingerprint family (MOSS selection +
    # capped overlap join), the sampled shingle-redundancy census, the
    # b-bit minhash storage-trade report, and the JSONL source leg — new
    # registrations, first perf signal.
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "shingle_dup_sample_estimate",
    "minhash_bbit_near_dup",
    "jsonl_ingest_dedup",
    "streaming_winnow_parity",
    "retrieval_rbo_report",
    # r12 additions (VERDICT r11 "Next round" #3 — additions ONLY, no
    # existing line removed or renamed): the heaviest sweep-only paths the
    # headline suite was blind to. The r11 round's biggest wins
    # (apply_in_pandas_group 53x, the fold-family init/append hygiene that
    # took the driver's full-registry sweep 714 -> 460 s) landed where no
    # bench line could see them; these five lines give the maintained-fold
    # families (lsh / spans / sketches / the signature store) and the UDF
    # profile a direct perf signal at the bench SF. (streaming_cluster
    # _parity was measured too — 17 s at sf0.1, which would add ~85 s of
    # bench wall-clock alone — left sweep-only, documented in
    # OPTIMIZATION_r12.md.)
    "apply_in_pandas_group",
    "streaming_lsh_parity",
    "streaming_spans_parity",
    "streaming_sketch_parity",
    "streaming_store_parity",
]

#: the dual-SF scaling probes: the structurally heaviest / most diverse
#: plans (two-snapshot dedup joins, banded LSH, iterative CC, cell-bounded
#: quadratic semantic dedup, fused multimodal kernels, TPC-H join+agg,
#: broadcast-model scoring). Each runs at sf0.01 AND the main SF; the
#: per-query wall-clock ratios land in BENCH_SCALING.md (NOT in the stdout
#: JSON — artifact-size contract, see module doc).
SCALING_QUERIES = [
    "dedup_hit_miss",
    "dedup_hierarchical",
    "chunk_simulate",
    "minhash_near_dup",
    "near_dup_clusters",
    "semantic_dedup",
    "multimodal_audio_features",
    "token_topk",
    "q3_shipping_priority",
    "bigram_logprob_score",
    # r06 late additions: the composed IVF+PQ index and the four-config
    # banding sweep are the two heaviest new plans — both carry candidate
    # stages whose growth rate is exactly what the ratio probe watches.
    "ann_ivfpq_topk",
    "lsh_parameter_sweep",
    # r06 batch 4: the admission gate's banded probe volume grows with the
    # corpus side — exactly the growth the ratio probe watches.
    "crawl_admission_report",
    # r07 (VERDICT r06 "Next round" #4): the banded-join near-dup heavies
    # that landed in r06 without a 10x-data ratio — exactly the shapes where
    # a quadratic would hide — plus the cell-bounded prototypicality prune.
    "simhash_band_near_dup",
    "minhash_recall_report",
    "audio_fingerprint_near_dup",
    "embedding_prototypicality",
    # r07 new heavy: the k-gram-anchored substring-duplicate cutter.
    "substring_dedup_ranges",
    # session-2 r07: the three-mode chunking comparison — its Gear kernel
    # cost is linear in file bytes by construction; the ratio probe pins it.
    "cdc_dedup_report",
    # session-2 r07 batch 5: the span-keyed census — the one new shape
    # whose candidate volume grows with corpus duplication, exactly what
    # the ratio probe watches.
    "hot_span_census",
    # r08: the passage-level banded self-join — candidate volume grows with
    # cross-doc passage duplication, the classic LSH growth the probe pins.
    "passage_near_dup",
    # r08 session 3: the hybrid fusion (two TakeOrdered lists + a constant
    # fusion join — the ratio should approach the scan cost alone) and the
    # cross-format certificate (two structural parses + per-column decimal
    # sums, linear in bytes by construction).
    "hybrid_rrf_fusion",
    "cross_format_dedup",
    # r09: the stats-pruned incremental chunker — candidate volume tracks
    # how much of the incoming snapshot stats-collides with the store,
    # exactly the growth the ratio probe watches.
    "orc_stats_pruned_dedup",
    # r10: the column-level fallback (its candidate volume is columns of
    # region-missed stripes — the fan-out the ratio probe watches) and the
    # passage hybrid (two TakeOrdered lists over passage-sized corpora).
    "orc_stats_pruned_columns",
    "passage_rrf_fusion",
    # r11: the two-level maintained-index parity (its fold volume is the
    # store's stripes x columns — the growth the ratio probe watches) and
    # the metadata-pruned hierarchical probe (subchunk fan-out under
    # stripe misses).
    "streaming_statsprune_columns_parity",
    "orc_hierarchical_pruned",
    # r11 late batch: the winnowing overlap join — candidate volume grows
    # with shared selected fingerprints (the capped-bucket growth the
    # ratio probe watches) — and the b-bit banding, whose low-bit
    # collision inflation is itself a function of corpus size.
    "winnowing_overlap_pairs",
    "minhash_bbit_near_dup",
]


def _best_of(fn, spark, sf_dir: str, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    import __spark_entry__ as entrymod

    spark = get_spark("cawd-bench")
    # Stdout-tail discipline (VERDICT r07 "What's wrong" #4): the bounded
    # literal-partition windows (bpe/kmeans/curation/selection) each emit a
    # "WindowExec: No Partition Defined" WARN; dozens of them inflated r06's
    # captured tail until the JSON line truncated. ERROR level keeps the
    # bench's stdout to the one contract line.
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM: run every headline query once at the smallest SF so the
    # timed runs measure steady-state plan execution, not C2 compilation of
    # each query's freshly generated whole-stage code (measured: first run of
    # a query is 2-10x its steady state purely from JIT).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # VM-speed calibration, 3-probe (r11, VERDICT r10 "Next round" #1: the
    # single range->sum probe is pure JVM codegen and provably failed to
    # track the suite's actual bottleneck across VMs — the r10 driver run
    # measured a "fast VM" by range-sum while the suite ran at slow-VM
    # speed). One fixed, data-independent probe per resource class, each
    # min-of-N: JVM whole-stage codegen (range->sum), Python workers
    # (a fixed mapInPandas fold — Arrow + worker fork + numpy), and
    # parquet scan I/O (a fixed file written untimed, scanned timed).
    # Cross-round deltas are stated NET OF THE PROBE THAT MOVED: a suite
    # dominated by mapInPandas chunkers normalizes by the python-worker
    # line, not the codegen line.
    calibrations = _calibrate(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(_best_of(queries[name], spark, sf_dir), 2)

    total = round(sum(timings.values()), 2)

    # Second scale point: run the structurally heaviest queries at sf0.01
    # AND the main SF and record the wall-clock ratio per query. Data grows
    # 10x between the two points, so a ratio well above ~10 flags a
    # super-linear plan long before a real 100x scale-up would; ratios far
    # below 10 just mean fixed overhead (JVM, Python workers, per-stage
    # latency) still dominates at these sizes.
    # The scaling block is OPT-IN (VERDICT r07 "Next round" #3): the driver's
    # per-round bench runs execute concurrently with its other jobs, and an
    # unconditional write here clobbered the committed solo-run min-of-5
    # calibration in r07. Only a deliberate `SPARK_GRAFT_WRITE_SCALING=1`
    # solo run measures the dual-SF ratios and touches BENCH_SCALING.md.
    scaling: dict[str, dict[str, float]] = {}
    small_dir = "/root/testdata/sf0.01"
    write_scaling = os.environ.get("SPARK_GRAFT_WRITE_SCALING") == "1"
    if write_scaling and os.path.isdir(small_dir) and small_dir != sf_dir:
        for name in SCALING_QUERIES:
            best_small = _best_of(queries[name], spark, small_dir, runs=3)
            big = timings[name]
            scaling[name] = {
                "sf0.01_sec": round(best_small, 3),
                f"sf{sf}_sec": big,
                "ratio": round(big / best_small, 2) if best_small > 0 else -1.0,
            }
        _write_scaling_artifact(scaling, sf, calibrations)

    # The one-line contract: compact, LAST line of stdout, nothing after.
    # scaling_artifact is advertised ONLY when this run actually measured
    # the ratios and wrote the file — a plain run pointing at the committed
    # solo numbers would misattribute them to itself.
    # Key order is part of the artifact's crash-resilience (r11): the
    # driver's tail capture keeps the END of the line and r10's
    # BENCH JSON outgrew the window — "metric"/"value" led the line and
    # were cut, so the round shipped parsed:null. The per-query dict
    # (the only unboundedly growing part) now goes FIRST and every
    # scalar the judge needs (totals + the 3-probe calibration) LAST,
    # so any suffix of the line still carries them; json.loads is
    # order-blind when the whole line survives.
    contract = {
        "queries": timings,
        "sf": float(sf),
        "runs": RUNS,
        # legacy key kept so r06-r10 tooling still parses; the two new
        # probes complete the 3-probe calibration (module doc).
        "calibration_range_agg_sec": calibrations["jvm"],
        "calibration_python_worker_sec": calibrations["python_worker"],
        "calibration_parquet_scan_sec": calibrations["parquet_scan"],
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
    }
    if scaling:
        contract["scaling_artifact"] = "BENCH_SCALING.md"
    print(json.dumps(contract, separators=(",", ":")))


def _time_once(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def _min_of(thunk, runs: int = RUNS) -> float:
    return round(min(_time_once(thunk) for _ in range(runs)), 3)


def _calibrate(spark) -> dict[str, float]:
    """The 3-probe VM-speed calibration (see main's comment): fixed,
    data-independent plans, one per resource class, each min-of-RUNS."""
    import shutil
    import tempfile

    import pandas as _pd

    def _jvm():
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1) as v").collect()

    def _py_batches(batches):
        import numpy as _np

        for pdf in batches:
            v = _np.sqrt(pdf["id"].to_numpy(dtype="float64")).sum()
            yield _pd.DataFrame({"v": [float(v)]})

    def _python_worker():
        spark.range(0, 2_000_000, 1, 8).mapInPandas(
            _py_batches, "v double"
        ).selectExpr("sum(v)").collect()

    # the I/O probe's file is written once, untimed, with a fixed row
    # count and schema; only the scan+aggregate is timed.
    tmp = tempfile.mkdtemp(prefix="cawd_bench_cal_")
    path = f"{tmp}/cal.parquet"
    spark.range(0, 4_000_000, 1, 8).selectExpr(
        "id", "id * 7 as a", "cast(id % 97 as double) as b",
        "repeat('x', 8) as s",
    ).write.mode("overwrite").parquet(path)

    def _parquet_scan():
        spark.read.parquet(path).selectExpr(
            "sum(a) as sa", "sum(b) as sb", "count(s) as cs"
        ).collect()

    try:
        return {
            "jvm": _min_of(_jvm),
            "python_worker": _min_of(_python_worker),
            "parquet_scan": _min_of(_parquet_scan),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_scaling_artifact(
    scaling: dict[str, dict[str, float]], sf: str,
    calibrations: dict[str, float],
) -> None:
    """Write the dual-SF scaling table to BENCH_SCALING.md: a markdown table
    for the judge plus the raw block as one JSON line for tooling. The
    solo run's own 3-probe calibration is embedded (VERDICT r09 "What's
    wrong" #3 and r10 #1: absolute cross-run comparisons need the
    per-resource normalization constants; RATIOS never do — both SFs run
    in one process). Notes are limited to claims derivable from THIS
    artifact or explicitly dated A/Bs (VERDICT r10 "What's wrong" #2:
    draft text with numbers contradicting the committed table shipped in
    r10; anything quantitative below must come from the run that wrote
    the table)."""
    lines = [
        "# Dual-SF scaling probes",
        "",
        f"min-of-3 wall-clock at sf0.01 vs min-of-{RUNS} at sf{sf} "
        "(10x data); a ratio well above ~10 flags a super-linear plan, "
        "ratios below 10 mean fixed overhead still dominates.",
        "",
        "This solo run's 3-probe calibration (min-of-"
        f"{RUNS} each): JVM codegen `range(50M)->sum` "
        f"**{calibrations['jvm']} s**, Python-worker fixed `mapInPandas` "
        f"**{calibrations['python_worker']} s**, fixed parquet scan "
        f"**{calibrations['parquet_scan']} s**. Compare absolute seconds "
        "across runs/rounds only after dividing by the probe matching the "
        "query's bottleneck resource (mapInPandas chunkers -> the "
        "python-worker line; scan-bound -> the parquet line; codegen "
        "aggregation -> the JVM line); the ratio column needs no "
        "normalization (both SFs share this process).",
        "",
        f"| query | sf0.01 (s) | sf{sf} (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, row in sorted(scaling.items()):
        lines.append(
            f"| {name} | {row['sf0.01_sec']} | {row[f'sf{sf}_sec']} "
            f"| {row['ratio']} |"
        )
    blob = dict(scaling)
    blob["_calibration_range_agg_sec"] = calibrations["jvm"]
    blob["_calibration_python_worker_sec"] = calibrations["python_worker"]
    blob["_calibration_parquet_scan_sec"] = calibrations["parquet_scan"]
    lines += ["", "```json", json.dumps(blob, separators=(",", ":")), "```", ""]
    lines += [
        "## Notes",
        "",
        "- `token_topk` (board max 3.17 in r08, VERDICT r08 brief #8):",
        "  fixed-overhead amortization, not a plan defect. The plan is the",
        "  canonical explode -> map-side-combined count -> TakeOrdered; at",
        "  sf0.01 most of the cost is per-job overhead (calibration floor",
        "  + two stage launches), so the DATA term grows sublinearly for",
        "  10x tokens, as map-side combine predicts. An A/B with a",
        "  parallelism repartition before the explode (r09 probe) was",
        "  SLOWER at both SFs (0.76 -> 1.10 s at sf0.1): the shuffle of",
        "  raw text outweighs tokenize parallelism at these sizes, and at",
        "  real scale the multi-file scan parallelizes the explode",
        "  naturally. Plan kept as-is; ratio explained.",
        "- `minhash_near_dup` / `simhash_band_near_dup` /",
        "  `passage_near_dup` — and their consumers `near_dup_clusters`",
        "  etc.: absolute times carry the exact-duplicate pre-collapse's",
        "  extra class shuffle + (doc-level) member-pair expansion joins —",
        "  a deliberate trade: the band bucket join is quadratic in",
        "  DISTINCT texts instead of duplicate multiplicity, which is what",
        "  survives a boilerplate-heavy 100x corpus. Since r10",
        "  `minhash_recall_report` runs the whole gate over signature",
        "  classes and expands to member pairs only at report time; its",
        "  current absolute seconds and dual-SF ratio are IN THE TABLE",
        "  ABOVE — the table is the source of truth, prose states no",
        "  second copy of the numbers (r10's Notes shipped stale draft",
        "  figures next to the regenerated table; this rule is the fix).",
        "- `semantic_dedup` (board max in most r08-r11 runs, ~3.4-3.8):",
        "  the cell-bounded quadratic — within-cell pairwise cosine —",
        "  grows with cell occupancy, which 10x data raises toward the",
        "  cap; the r08 cap fix bounds the cell size, so the term is",
        "  O(cells x cap^2) at any corpus scale (r08 A/B evidence; code",
        "  unchanged since). Sub-linear at 10x, by design bounded at",
        "  100x.",
        "- `winnowing_overlap_pairs` / `minhash_bbit_near_dup` (r11",
        "  late): both are banded-family shapes — candidate volume is",
        "  the growth term (shared SELECTED fingerprints under the",
        "  frequency cap; low-bit band collisions under the b-bit",
        "  truncation) — and both inherit the class collapse, so the",
        "  joins are quadratic in distinct texts only. Ratios in the",
        "  table; no second copy here.",
        "- Cross-run absolute comparisons: divide by the matching",
        "  calibration probe first (header). Ratios compare directly.",
        "",
    ]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_SCALING.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
