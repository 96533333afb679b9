"""CAWD-Spark: a PySpark-native engine with the query/data-processing
capabilities of castuardo/columnar-aware-dedup, re-designed Spark-first.

Importing this package populates the query registry (``registry.QUERIES`` /
``registry.ORACLES``) that ``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

from columnar_aware_dedup_spark import registry  # noqa: F401
from columnar_aware_dedup_spark.operators import dedup  # noqa: F401
from columnar_aware_dedup_spark.operators import events  # noqa: F401
from columnar_aware_dedup_spark.operators import relational  # noqa: F401
from columnar_aware_dedup_spark.operators import relational_ext  # noqa: F401
from columnar_aware_dedup_spark.operators import relational_fns  # noqa: F401
from columnar_aware_dedup_spark.operators import macro  # noqa: F401
from columnar_aware_dedup_spark.operators import macro2  # noqa: F401
from columnar_aware_dedup_spark.operators import scale  # noqa: F401
from columnar_aware_dedup_spark.operators import udf  # noqa: F401
from columnar_aware_dedup_spark.operators import similarity  # noqa: F401
from columnar_aware_dedup_spark.operators import stats  # noqa: F401
from columnar_aware_dedup_spark.operators import taxonomy  # noqa: F401
from columnar_aware_dedup_spark.operators import multimodal  # noqa: F401
from columnar_aware_dedup_spark.operators import search  # noqa: F401
from columnar_aware_dedup_spark.operators import text  # noqa: F401
from columnar_aware_dedup_spark.operators import clustering  # noqa: F401
from columnar_aware_dedup_spark.operators import kmeans  # noqa: F401
from columnar_aware_dedup_spark.operators import curation  # noqa: F401
from columnar_aware_dedup_spark.sources import binaryfile  # noqa: F401
from columnar_aware_dedup_spark.sources import chunkers  # noqa: F401
from columnar_aware_dedup_spark.sources import orcfixtures  # noqa: F401

#: the driver's CORRECTNESS window covers the first 50 registered queries —
#: keep the dedup core, every LLM-pipeline operator, the ORC family, and the
#: TPC-H macros inside it (see registry.reorder).
DRIVER_PRIORITY: list[str] = [
    # dedup core + stats
    "dedup_hit_miss",
    "chunk_simulate",
    "small_chunk_policy",
    "col_type_stats",
    "dedup_ratio",
    "dedup_hierarchical",
    "transfer_stats_taxonomy",
    "transfer_stats_rollup",
    "transfer_stats_rollup_approx",
    "grouped_percentile",
    "grouped_percentile_approx",
    "approx_distinct",
    # structural file chunkers (ORC + parquet)
    "orc_file_chunks",
    "orc_reconstruction",
    "orc_hierarchical_dedup",
    "orc_linked_reconstruction",
    "parquet_file_chunks",
    # text / LLM-curation suite
    "line_dedup_corpus",
    "text_normalize",
    "text_exact_dedup",
    "token_topk",
    "doc_token_stats",
    "doc_quality_score",
    "doc_quality_filter",
    "lang_id_heuristic",
    "token_count_bpe",
    "doc_fingerprint",
    "minhash_signature",
    "minhash_near_dup",
    "near_dup_clusters",
    "simhash_signature",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    # embeddings / ANN
    "embedding_norm_stats",
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # multimodal (frame_sample sits just past the window; R-checked + pytest)
    "multimodal_meta",
    "multimodal_decode",
    # TPC-H macros + curation pipeline (q1/q3/q5 shapes hold r01 PASS rows)
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_item",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_bracketed_or",
    "pipeline_curate",
    # scale techniques + pandas-UDF surface
    "salted_groupby",
    "pandas_udf_scalar",
    "apply_in_pandas_group",
]

#: r03 rotation (ACTIVE): the 41 queries with no driver CORRECTNESS row from
#: r01 or r02, the 8 queries registered this round (new registrations have no
#: prior row by construction), and one flagship re-check to fill the 50-slot
#: window.  With this window checked, every registered query has at least one
#: driver row.
#: ``tests/test_registry_oracles.py`` derives the never-checked set from the
#: recorded CORRECTNESS_r0*.json files and asserts this list covers it, so a
#: new registration fails the suite until it is rotated into a window.
ROTATION_R3: list[str] = [
    # never driver-checked (r01 window held relational/events; r02 holds
    # dedup core + LLM pipeline + ORC + macro batch 1)
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_priority_class",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q17_small_qty_revenue",
    "q20_part_promotion",
    "q21_waiting_supplier",
    "q22_global_sales",
    "correlated_subquery",
    "pandas_udf_grouped_agg",
    "ann_ivf_nprobe_topk",
    "ann_recall_report",
    "doc_repetition_score",
    "decontaminate_ngram_overlap",
    "pii_redaction",
    "sequence_pack",
    "stratified_sample",
    "corpus_shuffle",
    "corpus_split",
    "corpus_report",
    "domain_mix_sample",
    "union_all_counts",
    "intersect_all",
    "except_all",
    "posexplode_tokens",
    "null_fns",
    "like_rlike_pred",
    "cast_fns",
    "limit_offset",
    "ivf_train_kmeans",
    "multimodal_frame_sample",
    "file_inventory",
    "parquet_reconstruction",
    "file_parse_overhead",
    "event_funnel",
    "cohort_retention",
    # r03 additions (registered this round, so no prior driver row by
    # construction — they take 5 of the 9 re-check slots)
    "semantic_dedup",
    "tfidf_top_terms",
    "inverted_index_search",
    "event_gapfill_locf",
    "event_anomaly_zscore",
    "multimodal_audio_features",
    "doc_hash_embedding",
    "pipeline_dedup_all",
    # high-value re-check (the flagship stays exercised)
    "dedup_hit_miss",
]

#: r04 rotation (PREPARED, not active): once CORRECTNESS_r03 lands, every
#: registered query has a driver row and the window's job flips to
#: re-verification — the flagship dedup core, the LLM-pipeline surface, the
#: ORC family, the macro core, and the r03 additions. The r04 session
#: activates it by switching ``registry.reorder`` below; the window test
#: asserts (conditionally, once CORRECTNESS_r03.json exists) that any query
#: STILL lacking a driver row is in this list, so the list cannot go stale
#: the way the r02-prepared r03 window briefly did.
ROTATION_R4: list[str] = DRIVER_PRIORITY[:40] + [
    # r03 additions join the re-check core (displacing 10 scalar/macro
    # re-checks that keep their r01/r02 rows and the local oracle gate)
    "semantic_dedup",
    "tfidf_top_terms",
    "inverted_index_search",
    "event_gapfill_locf",
    "event_anomaly_zscore",
    "multimodal_audio_features",
    "doc_hash_embedding",
    "pipeline_dedup_all",
    "event_funnel",
    "cohort_retention",
]

registry.reorder(ROTATION_R3)

__all__ = ["registry"]
