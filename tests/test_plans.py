"""Physical-plan regression tests: the 100 TB story, enforced.

Each assertion pins a plan property that must survive scale-up: predicate
pushdown to the parquet scan, column pruning, broadcast of dimension sides,
heap-based top-k, and bounded shuffle counts in the dedup dataflow.
"""

from __future__ import annotations

from columnar_aware_dedup_spark.operators import dedup, relational
from columnar_aware_dedup_spark.plans import explain

from tests.conftest import rows_equal


def test_filter_pushdown(spark, sf_dir):
    df = relational.filter_pred(spark, sf_dir)
    assert explain.has_pushed_filter(df, "l_quantity"), explain.plan_string(df)
    assert explain.has_pushed_filter(df, "l_shipdate"), explain.plan_string(df)


def test_column_pruning(spark, sf_dir):
    df = relational.scan_project(spark, sf_dir)
    cols = explain.read_schema_columns(df)
    assert cols == {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    }, cols


def test_dim_join_broadcasts(spark, sf_dir):
    assert explain.has_broadcast_join(relational.join_inner(spark, sf_dir))
    assert explain.has_broadcast_join(relational.q5_local_supplier(spark, sf_dir))


def test_topk_is_take_ordered(spark, sf_dir):
    """orderBy().limit() must plan as a per-partition heap + merge, never a
    full sort (the scale-critical difference)."""
    assert explain.has_take_ordered(relational.orderby_limit_topk(spark, sf_dir))
    assert explain.has_take_ordered(relational.q3_shipping_priority(spark, sf_dir))


def test_flagship_shuffle_budget(spark, sf_dir):
    """classified_chunks r02 shape: chunk agg (repartition), semi-join store
    derivation + distinct, probe join, rollup agg. Only TWO of those
    exchanges move the full chunk table (the chunk agg and the probe join);
    the rest carry the distinct signature set / per-file keys. More than 5
    total means a regression re-shuffling full-table data."""
    df = dedup.dedup_hit_miss(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n <= 5, f"flagship grew to {n} shuffles:\n{explain.plan_string(df)}"


def test_chunk_simulate_single_shuffle(spark, sf_dir):
    df = dedup.chunk_simulate(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n == 1, f"chunking must be one shuffle, got {n}"


def test_macro_joins_broadcast(spark, sf_dir):
    """Every macro query's small side must broadcast — a shuffle of the fact
    table keyed on a dimension would be the 100 TB bottleneck."""
    from columnar_aware_dedup_spark.operators import macro

    for q in (
        macro.q10_returned_item,
        macro.q14_promo_effect,
        macro.q19_bracketed_or,
    ):
        assert explain.has_broadcast_join(q(spark, sf_dir)), q.__name__


def test_macro_date_pushdown(spark, sf_dir):
    """Q10/Q14 date windows must reach the parquet scan."""
    from columnar_aware_dedup_spark.operators import macro

    assert explain.has_pushed_filter(
        macro.q10_returned_item(spark, sf_dir), "o_orderdate"
    )
    assert explain.has_pushed_filter(
        macro.q14_promo_effect(spark, sf_dir), "l_shipdate"
    )


def test_q10_topk_is_take_ordered(spark, sf_dir):
    from columnar_aware_dedup_spark.operators import macro

    assert explain.has_take_ordered(macro.q10_returned_item(spark, sf_dir))
    assert explain.has_take_ordered(macro.q18_large_volume(spark, sf_dir))


def test_pipeline_curate_shuffle_budget(spark, sf_dir):
    """filter/normalize fuse into the scan; dedup = one window shuffle;
    rollup = one agg shuffle (+ final sort)."""
    from columnar_aware_dedup_spark.operators import macro

    df = macro.pipeline_curate(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n <= 3, f"curation pipeline grew to {n} shuffles:\n{explain.plan_string(df)}"


def test_ann_ivf_assignment_broadcasts(spark, sf_dir):
    """IVF cell assignment must be a broadcast of the centroid set (narrow
    map over the collection), never a shuffle of the embeddings."""
    from columnar_aware_dedup_spark.operators import similarity

    assert explain.has_broadcast_join(similarity.ann_ivf_topk(spark, sf_dir))


def test_ivf_assignment_zero_shuffle(spark, sf_dir):
    """The r03 assignment contract (VERDICT r02 finding #2): between the
    embeddings scan and the (vec_id, cid) projection there is NO exchange of
    the collection — no window, no hash partitioning. The only exchange
    allowed anywhere in the plan is the single-row centroid-array aggregate
    on the broadcast build side."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.io import table
    from columnar_aware_dedup_spark.operators import kmeans, similarity

    e = table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id").between(20, 27)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    for assign in (
        similarity.ivf_assign(e, cent),
        kmeans.assign_cells(
            e, cent.select(F.col("cid").alias("cell"), "ce")
        ),
    ):
        plan = explain.plan_string(assign)
        assert "Window" not in plan, plan
        assert "hashpartitioning" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan


def test_ntile_has_no_global_order_window(spark, sf_dir):
    """window_ntile_dist must never plan a window ordered over the whole
    table without a partition key (the single-reducer funnel); every window
    spec must lead with a partition column. The order key appearing first in
    a windowspecdefinition means an unpartitioned global sort."""
    from columnar_aware_dedup_spark.operators import relational_fns

    df = relational_fns.window_ntile_dist(spark, sf_dir)
    plan = explain.plan_string(df, "extended")
    assert "windowspecdefinition(o_totalprice" not in plan, plan
    assert "windowspecdefinition(" in plan  # the bucket-local windows exist


def test_lsh_bucket_population_bounded(spark, sf_dir):
    """The banded LSH self-join must never approach quadratic: with 16-bit
    band buckets the largest (band, bucket) population must stay a small
    fraction of N (r01's single 8-plane band put ~N/256 in a bucket)."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.io import table
    from columnar_aware_dedup_spark.operators import similarity

    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    top = (
        similarity.lsh_buckets(e)
        .groupBy("bucket")
        .count()
        .agg(F.max("count").alias("max_pop"))
        .collect()[0]["max_pop"]
    )
    assert top <= max(16, n * 0.05), f"max bucket {top} of {n} vectors"


def test_lsh_planes_distinct():
    """The affine hyperplane family must not repeat within the 64 planes the
    banded construction uses (a small modulus would alias planes and
    correlate band bits)."""
    from columnar_aware_dedup_spark.operators import similarity

    n_planes = similarity._N_BANDS * similarity._PLANES_PER_BAND
    dim = 64
    seen = set()
    for j in range(n_planes):
        w = tuple((i * 37 + j * 101) % 97 - 48 for i in range(1, dim + 1))
        assert w not in seen, f"plane {j} duplicates an earlier plane"
        seen.add(w)


def test_q21_semi_anti_and_topk(spark, sf_dir):
    """The EXISTS / NOT-EXISTS self-joins must plan as semi/anti hash joins
    (never a row-exploding inner join + dedup), and the final top-100 as a
    heap, not a full sort."""
    from columnar_aware_dedup_spark.operators import macro2

    df = macro2.q21_waiting_supplier(spark, sf_dir)
    plan = explain.plan_string(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert explain.has_take_ordered(df), plan


def test_q16_distinct_reduces_before_part_join(spark, sf_dir):
    """The supply relation must reduce lineitem to distinct (partkey,
    suppkey) pairs and read ONLY those two columns — the fact table never
    reaches the part join at line granularity or full width."""
    from columnar_aware_dedup_spark.operators import macro2

    df = macro2.q16_parts_supplier_cnt(spark, sf_dir)
    assert explain.read_schema_columns(df) >= {"l_partkey", "l_suppkey"}
    cols = explain.read_schema_columns(df)
    assert "l_extendedprice" not in cols and "l_quantity" not in cols, cols
    assert explain.has_broadcast_join(df)


def test_line_dedup_keeper_has_no_window_sort(spark, sf_dir):
    """The corpus line-dedup keeper must be a partial-aggregated min(struct)
    groupBy, never a window over the exploded segment table (window = shuffle
    + sort of ~10x the corpus; the dedup core's r02 lesson)."""
    from columnar_aware_dedup_spark.operators import curation

    df = curation.line_dedup_corpus(spark, sf_dir)
    plan = explain.plan_string(df)
    assert "Window" not in plan, plan


def test_hierarchical_dedup_single_big_shuffle(spark, sf_dir):
    """The r02 rewrite's contract: the full chunk table crosses the wire
    exactly once for classification — the plan may shuffle the chunking
    aggregate, the small stripe table, and tiny final aggregates, but there
    is no store-derivation + probe-join pair re-shuffling chunk-table-sized
    data (bounded total exchange count)."""
    from columnar_aware_dedup_spark.operators import dedup

    df = dedup.dedup_hierarchical(spark, sf_dir)
    # chunking repartition + stripe window + column groupBy + 2 scalar aggs
    # + final order: the old formulation planned 8+.
    assert explain.n_exchanges(df) <= 7, explain.plan_string(df)


def test_domain_mix_rates_broadcast(spark, sf_dir):
    """The data-dependent mixture rates must attach as broadcasts (tiny
    aggregated frames), never shuffle the corpus side on source."""
    from columnar_aware_dedup_spark.operators import curation

    df = curation.domain_mix_sample(spark, sf_dir)
    plan = explain.plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_ann_recall_report_joins_stay_topk_sized(spark, sf_dir):
    """The recall comparison must semi-join top-k sets; collection-sized
    scans appear only inside the underlying index/baseline subplans, never
    in the comparison joins themselves."""
    from columnar_aware_dedup_spark.operators import similarity

    df = similarity.ann_recall_report(spark, sf_dir)
    plan = explain.plan_string(df)
    assert "LeftSemi" in plan, plan


def test_search_prunes_terms_before_shuffle(spark, sf_dir):
    """inverted_index_search: the query-term filter must run map-side (before
    the aggregation exchange) so only searched postings shuffle, and the
    final ranking must be a heap top-k, not a full sort."""
    from columnar_aware_dedup_spark.operators import search

    df = search.inverted_index_search(spark, sf_dir)
    assert explain.has_take_ordered(df), explain.plan_string(df)
    # simple mode inlines conditions: the IN-list filter must sit BELOW the
    # first exchange (closer to the scan = later in the printed tree)
    plan = explain.plan_string(df, mode="simple")
    post_exchange = plan.split("Exchange", 1)[1]
    assert "vector" in post_exchange and "stream" in post_exchange, plan


def test_tfidf_count_broadcast_df_unhinted(spark, sf_dir):
    """tfidf_top_terms: the one-row corpus count joins as a broadcast, but
    the term->df join carries NO explicit broadcast hint — at web-corpus
    vocabulary the df table does not fit the driver, so strategy choice is
    left to AQE (broadcast when small, term-keyed shuffle join when not)."""
    import inspect

    from columnar_aware_dedup_spark.operators import search

    assert explain.has_broadcast_join(search.tfidf_top_terms(spark, sf_dir))
    src = inspect.getsource(search.tfidf_top_terms)
    assert "broadcast(df" not in src, "df broadcast hint is vocabulary-unsafe"


def test_hash_embedding_is_pure_builtin(spark, sf_dir):
    """doc_hash_embedding: no Python evaluation anywhere in the plan — the
    text->vector bridge must stay JVM-side (hashing, map fold, normalize)."""
    from columnar_aware_dedup_spark.operators import search

    plan = explain.plan_string(search.doc_hash_embedding(spark, sf_dir))
    assert "EvalPython" not in plan, plan


def test_semantic_dedup_shuffle_budget(spark, sf_dir):
    """semantic_dedup: cell assignment is the zero-shuffle broadcast argmin
    (shared with IVF), so the only data-sized exchanges are the within-cell
    self-join sides and the final flag join."""
    from columnar_aware_dedup_spark.operators import similarity

    df = similarity.semantic_dedup(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n <= 6, f"semantic_dedup grew to {n} shuffles:\n{explain.plan_string(df)}"


def test_gapfill_windows_are_keyed(spark, sf_dir):
    """event_gapfill_locf: every window spec must carry a partition key —
    the LOCF pass may never become a single-reducer global window."""
    from columnar_aware_dedup_spark.operators import events

    df = events.event_gapfill_locf(spark, sf_dir)
    plan = explain.plan_string(df, mode="extended")
    for frag in plan.split("windowspecdefinition(")[1:]:
        assert frag.split(",")[0].strip().startswith("event_type"), frag[:120]


def test_postings_index_probe_is_exchange_free_and_identical(spark, sf_dir):
    """The materialized term-bucketed postings index: searching it returns
    exactly what the scan-based search returns, and the index side of the
    plan contributes at most the tiny per-doc aggregation exchange — the
    postings themselves are never re-shuffled."""
    from columnar_aware_dedup_spark.operators import search

    tbl = "test_postings_idx"
    search.write_postings_index(spark, sf_dir, tbl)
    got = search.search_with_index(spark, tbl)
    want = search.inverted_index_search(spark, sf_dir)
    assert rows_equal(got, want)
    # one exchange total: the post-filter per-doc aggregation of the few
    # searched postings; zero on the bucketed index scan itself. Plan
    # inspected on a FRESH DataFrame — an executed AQE plan prints final +
    # initial sections and would double-count its exchanges.
    fresh = search.search_with_index(spark, tbl)
    n = explain.n_exchanges(fresh)
    assert n <= 1, explain.plan_string(fresh)
    assert explain.has_take_ordered(fresh)


def test_span_and_bigram_tables_unhinted(spark, sf_dir):
    """dup_span_fraction's span-count table and bigram_logprob_score's
    count tables are corpus/vocabulary-sized at web scale — neither may
    carry an explicit broadcast hint (the tfidf df lesson); AQE decides at
    runtime. Both plans must also stay EvalPython-free (pure built-ins)."""
    import inspect

    from columnar_aware_dedup_spark.operators import text

    for fn in (text.dup_span_fraction, text.bigram_logprob_score):
        src = inspect.getsource(fn)
        assert "F.broadcast(" not in src, (
            f"{fn.__name__}: vocabulary-unsafe broadcast hint"
        )
        plan = explain.plan_string(fn(spark, sf_dir))
        assert "EvalPython" not in plan, fn.__name__


def test_has_global_sort_detects_orderby(spark, sf_dir):
    """ADVICE r05: the formatted-mode regex never matched (node header and
    Arguments print on separate lines), making the no-global-sort guard
    vacuous. Pin the detector itself: positive on a genuine orderBy plan,
    negative on the same plan without it and on a top-k heap plan."""
    from columnar_aware_dedup_spark.io import table

    base = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    assert explain.has_global_sort(base.orderBy("r_name")), (
        "detector must fire on a global Sort:\n"
        + explain.plan_string(base.orderBy("r_name"), "simple")
    )
    assert not explain.has_global_sort(base)
    # TakeOrderedAndProject (heap top-k) is not a global sort
    topk = base.orderBy("r_name").limit(2)
    assert explain.has_take_ordered(topk)
    assert not explain.has_global_sort(topk)


def test_data_sized_outputs_carry_no_global_sort(spark, sf_dir):
    """VERDICT r04 "What's wrong" #3: the driver's value hash is
    order-insensitive, so a trailing global orderBy on a row-per-doc /
    row-per-pair output buys nothing and costs a full exchange at scale.
    The de-sorted r05 queries must stay sort-free (top-k/limit queries keep
    their TakeOrdered — that is a heap, not a global sort)."""
    from columnar_aware_dedup_spark.registry import QUERIES

    for name in [
        "minhash_near_dup",
        "simhash_hamming_pairs",
        "dup_span_fraction",
        "bigram_logprob_score",
        "doc_hash_embedding",
        "embedding_near_dup_pairs",
        "semantic_dedup",
        "sequence_pack",
        "near_dup_clusters",
        "cluster_quality_keeper",
        "multimodal_decode",
        "multimodal_audio_features",
        "multimodal_scene_cuts",
        "multimodal_frame_sample",
        "embedding_pca_project",
        "bpe_segment_corpus",
        # r06: the perceptual/acoustic signature families are row-per-doc /
        # row-per-pair outputs too
        "image_ahash_signature",
        "image_ahash_near_dup",
        "audio_fingerprint_signature",
        "audio_fingerprint_near_dup",
        "multimodal_dedup_report",
        # r06 batch 4/5: row-per-vector / row-per-incoming-doc / row-per-doc
        "embedding_prototypicality",
        "crawl_admission_report",
        "doc_length_outliers",
        "edit_distance_verify",
        "doc_ngram_novelty",
        "cluster_aware_split",
    ]:
        df = QUERIES[name](spark, sf_dir)
        assert not explain.has_global_sort(df), (
            f"{name} re-grew a global Sort:\n{explain.plan_string(df)}"
        )


def test_ivfpq_never_shuffles_the_collection(spark, sf_dir):
    """The composed IVF+PQ index keeps its parts' zero-shuffle claims: IVF
    assignment and PQ encoding are broadcast argmins, so NO exchange node
    may carry the raw embedding column of the collection — the shuffled
    rows are single-row codebook/centroid builds (constant-size metadata),
    ADC pair rows (codes + distances), and the shortlist-sized re-rank
    steps. The exchange COUNT varies with session config (partial-agg
    splits), so the pin is on what moves, not how many times: an exchange
    whose input includes the collection's ``embedding`` column means the
    collection started shuffling. (The query-side ``qe`` vector DOES ride
    the shortlist window — #queries x shortlist rows, bounded by the query
    set, which is the asymmetric-ADC contract.)"""
    import re

    from columnar_aware_dedup_spark.operators.pq import ann_ivfpq_topk

    df = ann_ivfpq_topk(spark, sf_dir)
    plan = explain.plan_string(df)
    offenders = []
    for m in re.finditer(r"\(\d+\) Exchange\b[^\n]*\n([^\n]*)", plan):
        if "embedding#" in m.group(1):
            offenders.append(m.group(0))
    assert not offenders, "collection vectors crossed an exchange:\n" + "\n".join(
        offenders
    )
    # and the collection is never hash-partitioned by its id
    assert "hashpartitioning(vec_id" not in plan, plan


def test_prototypicality_single_cell_exchange(spark, sf_dir):
    """embedding_prototypicality: assignment is the shared zero-shuffle
    broadcast-centroid argmin, so the collection crosses exactly ONE
    exchange (hashpartitioning by cid) and both window specs — rank and
    cell count — are keyed by cid, never corpus-global."""
    from columnar_aware_dedup_spark.operators import similarity

    df = similarity.embedding_prototypicality(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    ext = explain.plan_string(df, mode="extended")
    specs = ext.split("windowspecdefinition(")[1:]
    assert specs, "expected keyed windows in the plan"
    for frag in specs:
        # the parsed-plan section prints unresolved attrs as 'cid
        key = frag.split(",")[0].strip().lstrip("'")
        assert key.startswith("cid"), frag[:120]


def test_crawl_admission_never_goes_quadratic(spark, sf_dir):
    """crawl_admission_report: both probes key on content hashes (sig;
    band_key+band) — no cartesian product, no window, and a bounded
    shuffle budget (the band-hit distinct agg plus the final verdict
    join)."""
    from columnar_aware_dedup_spark.operators import text

    df = text.crawl_admission_report(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 5, f"crawl_admission_report grew to {n} shuffles:\n{plan}"


def test_perplexity_windows_run_on_the_histogram_only(spark, sf_dir):
    """perplexity_bucket_report: the unkeyed cumulative windows are legal
    ONLY because they run over the bounded 2-dp score histogram on the
    broadcast build side — the doc-sized probe side must stay a narrow
    broadcast-fold (one BroadcastNestedLoopJoin, no Window above the doc
    scan). In the simple-mode tree every Window line must therefore appear
    INSIDE the BroadcastExchange subtree (printed after it)."""
    from columnar_aware_dedup_spark.operators import selection

    df = selection.perplexity_bucket_report(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "BroadcastExchange" in plan and "Window" in plan, plan
    assert plan.index("Window") > plan.index("BroadcastExchange"), plan
    # the windows' input is the s2 histogram aggregate, not the corpus
    below_last_window = plan.rsplit("Window", 1)[1]
    assert "HashAggregate(keys=[s2" in below_last_window, below_last_window


def test_cdc_chunk_certificate_single_shuffle(spark, sf_dir):
    """cdc_file_chunks: the per-file cover windows and the certificate
    rollup share one file-keyed partitioning — chunking itself is a
    shuffle-free mapInPandas over the binaryFile scan, so the certificate
    costs ONE data exchange regardless of corpus size, plus the trailing
    range exchange of the convention orderBy (ADVICE r07 #2) over the
    fixture-file-count rows — bounded by the constant file list, never by
    corpus bytes."""
    from columnar_aware_dedup_spark.sources import cdc

    df = cdc.cdc_file_chunks(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n <= 2, f"cdc_file_chunks grew to {n} shuffles:\n" + explain.plan_string(df)


def test_cdc_report_shuffle_budget(spark, sf_dir):
    """cdc_dedup_report: one single-mode Arrow kernel per (snapshot scan,
    chunking mode) — 3 modes x 2 scans = 6 mapInPandas legs the scheduler
    runs concurrently (r12; the pre-r12 form fused the three chunkers
    into one serial pass per file) — then a bounded shuffle budget:
    store-side signature distinct, the probe join (AQE may broadcast the
    distinct store side at small SF; at scale it degrades to the
    signature-keyed shuffle join, which this bound also admits), the
    9-row rollup, the bounded-rollup window, and the final sort. Nothing
    pairwise, no corpus-sized window."""
    from columnar_aware_dedup_spark.sources import cdc

    df = cdc.cdc_dedup_report(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert plan.count("ArrowEvalPython") == 0, plan  # mapInPandas, not UDF
    assert plan.count("MapInPandas") == 6, plan  # (mode x snapshot scan)
    assert "CartesianProduct" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 6, f"cdc_dedup_report grew to {n} shuffles:\n{plan}"


def test_passage_split_zero_shuffle(spark, sf_dir):
    """passage_split is a pure map: sequence-explode + slice + hash, no
    exchange anywhere — at 100 TB the passage table is produced at scan
    parallelism."""
    from columnar_aware_dedup_spark.operators import curation

    df = curation.passage_split(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n == 0, f"passage_split must be map-only, got {n}:\n" + explain.plan_string(df)


def test_balanced_sample_single_window_shuffle(spark, sf_dir):
    """balanced_sample_exact_k costs exactly the one source-keyed window
    exchange (the rank); no second shuffle sneaks in behind the filter."""
    from columnar_aware_dedup_spark.operators import curation

    df = curation.balanced_sample_exact_k(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n == 1, f"expected one window shuffle, got {n}:\n" + explain.plan_string(df)


def test_passage_near_dup_stays_banded_and_collapsed(spark, sf_dir):
    """passage_near_dup after the r09 pre-collapse: the class table
    (ONE map-side-combined psig shuffle after the parallelism
    repartition — asserted on the class frame, whose lineage the
    operator's lazy checkpoint hides from the outer plan) feeds a
    (band, band_key) bucket self-join and a map-side-combined pair
    rollup; no cartesian product, no window, and no distinct-expand
    (shared_bands is a plain count — class rows are band-unique)."""
    from columnar_aware_dedup_spark.operators import curation

    cls = curation.passage_signature_classes(spark, sf_dir)
    n_cls = explain.n_exchanges(cls)
    assert n_cls <= 2, (
        f"class collapse grew to {n_cls} shuffles:\n"
        + explain.plan_string(cls)
    )
    df = curation.passage_near_dup(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "Expand" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 3, f"passage_near_dup grew to {n} shuffles:\n{plan}"


def test_cdc_parquet_report_shuffle_budget(spark, sf_dir):
    """cdc_dedup_report_parquet: the same per-(scan, mode) kernel plan
    contract as the ORC report (r12 — 3 modes x 2 scans, concurrent),
    bounded shuffles, nothing pairwise."""
    from columnar_aware_dedup_spark.sources import cdc

    df = cdc.cdc_dedup_report_parquet(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert plan.count("MapInPandas") == 6, plan
    assert "CartesianProduct" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 6, f"cdc_dedup_report_parquet grew to {n} shuffles:\n{plan}"


def test_bm25_plan_shape(spark, sf_dir):
    """bm25_doc_ranking: top-k is a TakeOrdered heap (never a global
    sort), there is NO window anywhere (ranking happens in the heap), and
    the shuffle budget holds — the only corpus-sized exchange is the
    term-filtered tf grouping; dl is a narrow array fold and avgdl/N are
    one-row aggregates."""
    from columnar_aware_dedup_spark.operators import retrieval

    df = retrieval.bm25_doc_ranking(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert explain.has_take_ordered(df), plan
    assert not explain.has_global_sort(df), plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 6, f"bm25 grew to {n} shuffles:\n{plan}"


def test_rrf_windows_only_after_limits(spark, sf_dir):
    """hybrid_rrf_fusion: both per-list rank windows run on ≤FUSE_N-row
    frames — structurally, every Window in the plan sits ABOVE a
    GlobalLimit (the TakeOrdered cut), so no unpartitioned window ever
    sees corpus-sized data; the list cuts themselves are heaps."""
    from columnar_aware_dedup_spark.operators import retrieval

    df = retrieval.hybrid_rrf_fusion(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert explain.has_take_ordered(df), plan
    assert not explain.has_global_sort(df), plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Window") == 2, plan
    # every Window operator must consume a limited (TakeOrdered) subtree:
    # in the simple-mode tree, each Window line is eventually followed by
    # the TakeOrderedAndProject that feeds it (children print below).
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" in line:
            below = "\n".join(lines[i + 1 :])
            assert "TakeOrdered" in below, (
                "Window without a TakeOrdered input:\n" + plan
            )
    n = explain.n_exchanges(df)
    assert n <= 7, f"rrf grew to {n} shuffles:\n{plan}"


def test_cross_format_shuffle_budget(spark, sf_dir):
    """cross_format_dedup: each format's signature sum pays one narrow
    11-column spread exchange before the hash work (r12 — the snapshot
    files are under the split size, so without it the 11 x md5 aggregation
    ran as ONE task) plus the partial-aggregate exchange at one row per
    column; chunk tables parse in one mapInPandas task per file, and the
    assembly joins 11-row frames — no window, nothing pairwise, bounded
    exchanges."""
    from columnar_aware_dedup_spark.sources import crossformat

    df = crossformat.cross_format_dedup(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the two repartition spreads must be present (the r12 optimization's
    # load-bearing shape) and the budget admits exactly them on top of
    # the pre-r12 bound of 8
    assert plan.count("REPARTITION_BY_NUM") >= 2, plan
    n = explain.n_exchanges(df)
    assert n <= 10, f"cross_format_dedup grew to {n} shuffles:\n{plan}"


def test_stats_pruned_dedup_plan_shape(spark, sf_dir):
    """Both stats-pruned dedup certificates: one mapInPandas parse per
    side (footer stats + spans in a single Arrow pass per file), the
    candidate/hit probes are two equi-joins (no cartesian product, no
    window), and the whole certificate stays inside a bounded shuffle
    budget — the metadata-only thesis must not smuggle in a corpus-sized
    exchange."""
    from columnar_aware_dedup_spark.operators import zonemap

    for fn in (
        zonemap.orc_stats_pruned_dedup,
        zonemap.parquet_stats_pruned_dedup,
    ):
        df = fn(spark, sf_dir)
        plan = explain.plan_string(df, mode="simple")
        assert "CartesianProduct" not in plan, plan
        assert "Window" not in plan, plan
        # incoming-side parse is visible; the store side sits behind the
        # lazy checkpoint (materialized once for keys + signatures)
        assert "MapInPandas" in plan, plan
        n = explain.n_exchanges(df)
        assert n <= 5, f"{fn.__name__} grew to {n} shuffles:\n{plan}"


def test_stats_pruned_columns_plan_shape(spark, sf_dir):
    """The r10 column-level fallback certificates: same discipline as the
    region level — one Arrow parse pass per side (column spans + stats in
    the same footer walk), the fallback set derives from an anti-join
    (never a window), the candidate/hit probes are equi-joins, and the
    shuffle budget stays bounded (the anti-join + the second granularity
    add a handful over the region level, never a corpus-sized blowup)."""
    from columnar_aware_dedup_spark.operators import zonemap

    for fn in (
        zonemap.orc_stats_pruned_columns,
        zonemap.parquet_stats_pruned_columns,
    ):
        df = fn(spark, sf_dir)
        plan = explain.plan_string(df, mode="simple")
        assert "CartesianProduct" not in plan, plan
        assert "Window" not in plan, plan
        # the one-pass two-granularity parse sits behind lazy checkpoints
        # (each directory's bytes read once for BOTH levels), so the plan
        # shows the checkpointed scans, not the MapInPandas itself
        assert "Scan ExistingRDD" in plan, plan
        n = explain.n_exchanges(df)
        assert n <= 9, f"{fn.__name__} grew to {n} shuffles:\n{plan}"


def test_passage_bm25_and_rrf_plan_shape(spark, sf_dir):
    """The r10 passage retrieval registrations inherit the document-level
    plan discipline: top-k through a TakeOrdered heap (never a global
    sort); the fusion's two rank windows each consume a ≤FUSE_N-row
    limited subtree; no cartesian products; bounded exchanges (passage
    granularity adds the window-explode but no new shuffle class)."""
    from columnar_aware_dedup_spark.operators import retrieval

    df = retrieval.passage_bm25_topk(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert explain.has_take_ordered(df), plan
    assert not explain.has_global_sort(df), plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    n = explain.n_exchanges(df)
    assert n <= 7, f"passage bm25 grew to {n} shuffles:\n{plan}"

    df = retrieval.passage_rrf_fusion(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert explain.has_take_ordered(df), plan
    assert not explain.has_global_sort(df), plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Window") == 2, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" in line:
            below = "\n".join(lines[i + 1 :])
            assert "TakeOrdered" in below, (
                "Window without a TakeOrdered input:\n" + plan
            )
    n = explain.n_exchanges(df)
    assert n <= 12, f"passage rrf grew to {n} shuffles:\n{plan}"


def test_recall_report_class_level_plan(spark, sf_dir):
    """The r10 recall-gate rewrite's load-bearing claims: no global sort,
    no window, no cartesian product anywhere in the class-level gate, and
    the verification joins are HASH joins (the SHUFFLE_HASH hint on the
    unique-keyed per-class sides — sorting array-payload rows was the r09
    cost), with the prefix table materialized once (InMemory/checkpoint
    scan visible)."""
    from columnar_aware_dedup_spark.operators import text

    df = text.minhash_recall_report(spark, sf_dir)
    plan = explain.plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert not explain.has_global_sort(df), plan
    assert "ShuffledHashJoin" in plan, plan


def test_lsh_bucket_rewrite_value_identical(spark, sf_dir):
    """The r12 single-fold plane-dot rewrite (one aggregate carrying a
    64-slot accumulator instead of 64 independent HOF folds) must render
    EXACTLY the bucket strings of the original per-bit spelling for every
    vector — same additions in the same order means bit-identical floats,
    means identical sign bits. This pins the equivalence the ann_lsh /
    near-dup-pairs oracles ride on."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.io import table
    from columnar_aware_dedup_spark.operators import similarity

    e = table(spark, sf_dir, "embeddings")
    old = e.select(
        "vec_id",
        F.expr(similarity._buckets_array_spark()).alias("b_old"),
    )
    new = similarity.lsh_buckets(e).groupBy("vec_id").agg(
        F.expr("array_sort(collect_list(bucket))").alias("b_new_sorted")
    )
    joined = old.select(
        "vec_id", F.expr("array_sort(b_old)").alias("b_old_sorted")
    ).join(new, "vec_id")
    n_bad = joined.filter(
        F.col("b_old_sorted") != F.col("b_new_sorted")
    ).count()
    assert n_bad == 0, f"{n_bad} vectors changed buckets under the rewrite"
    assert joined.count() == e.count()
