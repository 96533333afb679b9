"""Winnowing fingerprints + sampled shingle-redundancy census.

Two corpus-census families the byte-level reference implies but never
states at document granularity:

- **Winnowing** (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
  algorithm): select, from every window of ``w`` consecutive k-gram
  hashes, the window minimum. The selected set is a document fingerprint
  with a POSITIONAL guarantee the plain MinHash family lacks: any shared
  substring of length ``w + k - 1`` tokens contributes at least one
  COMMON selected hash, at expected density ``2/(w+1)`` of the k-gram
  stream. It is the same min-of-a-region idea as the reference's
  content-defined chunk boundaries (``dedup/ChunkingAlgorithm.java``)
  applied to token k-grams instead of bytes.
- **Hash-range sampling**: estimate corpus-level shingle redundancy from
  the 1/16 of shingle-hash space with a fixed first hex digit. Sampling
  by CONTENT HASH (not by document) keeps every occurrence of a sampled
  shingle in the sample, so the shared-fraction estimator is unbiased —
  the sub-linear census a 100 TB corpus needs before anyone pays for a
  full dedup pass.

Scale notes: winnowing selection is a narrow per-document map (one md5
per positional k-gram, higher-order functions only — no UDF, stays in
WholeStageCodegen). The overlap join runs over DISTINCT normalized texts
(the exact-duplicate pre-collapse house rule) on the SELECTED hashes
only — ``2/(w+1)`` of the stream — with a class-frequency cap dropping
boilerplate fingerprints before the self-join, so bucket sizes stay
near-duplicate-sized at any corpus scale. The sampled census shuffles
one row per distinct (shingle-hash, doc) pair; its production form
filters to the sample range BEFORE the shuffle (1/16 of the traffic) —
the registered row also aggregates the full range because the exact
corpus numbers ARE the certificate for the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.text import (
    _NORM_SQL,
    _SHINGLES_SPARK,
    _SHINGLES_SQL,
    _expand_member_pairs,
    _fanned,
)
from columnar_aware_dedup_spark.registry import register

#: winnowing geometry: k = 3 tokens per gram (the corpus-wide shingle
#: width every near-dup family here uses), w = 4 grams per window.
#: Guarantee: a shared run of w + k - 1 = 6 tokens always yields a shared
#: selected hash; expected density 2/(w+1) = 0.4.
_W = 4

#: POSITIONAL k-gram hash stream — same 3-token grams and short-doc guard
#: as ``_SHINGLES_SPARK`` but WITHOUT ``array_distinct``: winnowing
#: windows are over the gram *sequence*, so repeats must keep their
#: positions.
_GRAMS_SPARK = (
    "CASE WHEN size(toks) >= 3 THEN"
    " transform(sequence(1, size(toks) - 2),"
    " i -> md5(concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
    " element_at(toks, i + 2))))"
    " ELSE array(md5(array_join(toks, ' '))) END"
)
_GRAMS_SQL = (
    "CASE WHEN len(toks) >= 3 THEN"
    " list_transform(generate_series(1, len(toks) - 2),"
    " i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    " ELSE [md5(array_to_string(toks, ' '))] END"
)

#: window-minimum selection over the gram stream ``g``: one min per
#: window of ``_W`` consecutive hashes, deduplicated. Lexicographic min
#: on fixed-width lowercase hex == numeric min (the minhash-slot
#: argument). Docs with fewer than ``_W`` grams get ONE window over all.
_SELECT_SPARK = (
    f"array_distinct(transform(sequence(1, greatest(size(g) - {_W - 1}, 1)),"
    f" j -> array_min(slice(g, j, {_W}))))"
)
_SELECT_SQL = (
    f"list_distinct(list_transform(generate_series(1,"
    f" greatest(len(g) - {_W - 1}, 1)),"
    f" j -> list_min(g[j:j+{_W - 1}])))"
)


def winnowed_rows(docs_with_toks: DataFrame) -> DataFrame:
    """(doc_id, tsig, n_kgrams, sel): per-document winnowing selection,
    with the exact-text signature for the class collapse, from any frame
    carrying ``doc_id``/``norm``/``toks`` (corpus scan or crawl delta —
    the streaming fold reuses this so the two derivations cannot drift).

    Lazily checkpointed (the ``_minhash_tagged_sigs`` discipline), and
    here it is CORRECTNESS-OF-COST, not just scan sharing: without the
    barrier, a consumer that FILTERS or JOINS on a derived column lets
    Catalyst substitute the whole nested higher-order chain into the
    predicate, where the gram stream re-evaluates PER WINDOW inside the
    selection lambda (no common-subexpression elimination across lambda
    scopes) — measured 100x on a 500-doc filter (230 s vs 2.5 s). The
    checkpoint hands every consumer a materialized ``sel`` array
    instead; the overlap query's two branches (fingerprint explode +
    member table) also stop paying the selection twice."""
    return (
        docs_with_toks.select(
            "doc_id",
            F.md5("norm").alias("tsig"),
            F.expr(_GRAMS_SPARK).alias("g"),
        )
        .select(
            "doc_id",
            "tsig",
            F.size("g").alias("n_kgrams"),
            F.expr(_SELECT_SPARK).alias("sel"),
        )
        .localCheckpoint(eager=False)
    )


def _winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnowed_rows(_fanned(spark, sf_dir))


@register(
    "winnowing_fingerprints",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
g AS (SELECT doc_id, {_GRAMS_SQL} AS g FROM t),
w AS (SELECT doc_id, len(g) AS n_kgrams,
             greatest(len(g) - {_W - 1}, 1) AS n_windows,
             {_SELECT_SQL} AS sel
      FROM g)
SELECT doc_id, CAST(n_kgrams AS BIGINT) AS n_kgrams,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(len(sel) AS BIGINT) AS n_fingerprints,
       list_min(sel) AS min_fp
FROM w
""",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing census: positional 3-gram hash stream ->
    window-of-:data:`_W` minima -> selected fingerprint set. Emits the
    stream/window/selection sizes (the density ``n_fingerprints /
    n_kgrams`` hovers at the paper's ``2/(w+1)``) and the global minimum
    fingerprint (always selected — it is the min of its own window; equal
    to :func:`~columnar_aware_dedup_spark.operators.text.doc_fingerprint`'s
    1-hash MinHash on 3-gram streams without repeats)."""
    return _winnowed(spark, sf_dir).select(
        "doc_id",
        F.col("n_kgrams").cast("bigint").alias("n_kgrams"),
        F.greatest(F.col("n_kgrams") - (_W - 1), F.lit(1))
        .cast("bigint")
        .alias("n_windows"),
        F.size("sel").cast("bigint").alias("n_fingerprints"),
        F.array_min("sel").alias("min_fp"),
    )


#: overlap-report knobs: a fingerprint selected by more than ``_CAP``
#: DISTINCT texts is boilerplate and never enters the pair join (the
#: band-bucket-size cap of the LSH families, restated for winnowing);
#: a pair must share at least ``_MIN_SHARED`` selected hashes to report.
_CAP = 20
_MIN_SHARED = 3


#: the ONE copy of the overlap-report oracle — the batch query and the
#: maintained-index parity certificate (``streaming_winnow_parity``) are
#: hash-checked against the same text, so they cannot drift.
WINNOW_OVERLAP_ORACLE = f"""
WITH t AS (SELECT doc_id, md5({_NORM_SQL}) AS tsig,
                  string_split({_NORM_SQL}, ' ') AS toks FROM documents),
g AS (SELECT doc_id, tsig, {_GRAMS_SQL} AS g FROM t),
w AS (SELECT doc_id, tsig, {_SELECT_SQL} AS sel FROM g),
classes AS (SELECT tsig, min(doc_id) AS rep, any_value(sel) AS sel,
                   CAST(any_value(len(sel)) AS BIGINT) AS nfp
            FROM w GROUP BY tsig),
fp AS (SELECT tsig, unnest(sel) AS fp FROM classes),
freq AS (SELECT fp, count(*) AS c FROM fp GROUP BY fp),
kept AS (SELECT f.tsig, f.fp FROM fp f JOIN freq q USING (fp)
         WHERE q.c <= {_CAP}),
rp AS (SELECT a.tsig AS ta, b.tsig AS tb,
              CAST(count(*) AS BIGINT) AS shared_fps
       FROM kept a JOIN kept b ON a.fp = b.fp AND a.tsig < b.tsig
       GROUP BY ta, tb
       HAVING count(*) >= {_MIN_SHARED}),
members AS (SELECT tsig, doc_id FROM t),
pairs AS (
  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         greatest(ma.doc_id, mb.doc_id) AS doc_b,
         rp.shared_fps
  FROM rp JOIN members ma ON ma.tsig = rp.ta
          JOIN members mb ON mb.tsig = rp.tb
  UNION ALL
  SELECT x.doc_id, y.doc_id, c.nfp
  FROM members x JOIN members y
         ON x.tsig = y.tsig AND x.doc_id < y.doc_id
       JOIN classes c ON c.tsig = x.tsig
)
SELECT doc_a, doc_b, shared_fps FROM pairs WHERE shared_fps >= {_MIN_SHARED}
"""


@register("winnowing_overlap_pairs", oracle=WINNOW_OVERLAP_ORACLE)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= :data:`_MIN_SHARED` winnowed
    fingerprints — MOSS-style overlap detection on the SELECTED set only
    (``2/(w+1)`` of the gram stream enters the join, never the full
    stream). Runs over distinct-text classes with a class-frequency cap
    of :data:`_CAP` on each fingerprint (boilerplate never inflates a
    bucket), then expands to member pairs at report time; an
    identical-text pair shares its whole selection by definition."""
    w = _winnowed(spark, sf_dir)
    classes = w.groupBy("tsig").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("sel").alias("sel"),  # identical text => identical selection
        F.first(F.size("sel")).cast("bigint").alias("nfp"),
    )
    class_fp = classes.select("tsig", F.explode("sel").alias("fp"))
    members = w.select("tsig", "doc_id").join(
        classes.select("tsig", "nfp"), "tsig"
    )
    return overlap_report(class_fp, members)


def overlap_report(class_fp: DataFrame, members: DataFrame) -> DataFrame:
    """The ONE copy of the overlap-pair chain — consumed by the batch
    query above and by the maintained-index serve
    (``streaming/winnow.py``), so the two cannot drift. ``class_fp`` is
    one (tsig, fp) row per class fingerprint; ``members`` carries
    (tsig, doc_id, nfp).

    r11 (optimization): the frequency cap is ONE count window over the
    bucket key instead of a groupBy + join-back (the
    ``lsh_parameter_sweep`` census discipline — the window's hash
    partitioning on ``fp`` is exactly the distribution the self-join
    below needs, so the cap costs no extra exchange; served from the
    fp-bucketed index table it costs none at all), and the capped set is
    lazily checkpointed so the self-join's two sides read ONE
    materialization instead of re-running the scan + window per side
    (plan: 2 scans + 2 aggregates + join-back -> 1 scan + 1 window)."""
    kept = (
        class_fp.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("c") <= _CAP)
        .select("tsig", "fp")
        .localCheckpoint(eager=False)
    )
    a, b = kept.alias("a"), kept.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.tsig") < F.col("b.tsig")),
        )
        .groupBy(
            F.col("a.tsig").alias("tsig_a"), F.col("b.tsig").alias("tsig_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _MIN_SHARED)
    )
    expanded = _expand_member_pairs(
        rep_pairs, members, "shared_fps", F.col("x.nfp")
    )
    return expanded.filter(F.col("shared_fps") >= _MIN_SHARED)


@register(
    "shingle_dup_sample_estimate",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
sh AS (SELECT doc_id, md5(unnest({_SHINGLES_SQL})) AS h FROM t),
per AS (SELECT h, count(*) AS nd FROM sh GROUP BY h),
s AS (SELECT
        CAST(count(*) AS BIGINT) AS n_distinct_shingles,
        CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_shared_shingles,
        CAST(sum(CASE WHEN h LIKE '0%' THEN 1 ELSE 0 END) AS BIGINT)
          AS sampled_distinct,
        CAST(sum(CASE WHEN h LIKE '0%' AND nd > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS sampled_shared
      FROM per)
SELECT n_distinct_shingles, n_shared_shingles, sampled_distinct,
       sampled_shared,
       100 * abs(sampled_shared * n_distinct_shingles
                 - n_shared_shingles * sampled_distinct)
         <= 2 * sampled_distinct * n_distinct_shingles AS est_within_2pct
FROM s
""",
)
def shingle_dup_sample_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus shingle-redundancy census + its 1/16 hash-range sample
    estimate, one row. ``sampled_*`` restrict to shingle hashes whose
    first hex digit is ``0`` — sampling signature SPACE, so a shingle's
    every occurrence is in or out together and the shared-fraction
    estimator is unbiased. The guard bit asserts the estimate lands
    within 2 percentage points of the exact fraction, in exact integer
    cross-multiplication (no float division on either engine). At 100 TB
    the production estimator is the sampled half alone with the range
    filter pushed BEFORE the shuffle — 1/16 of the census traffic for a
    corpus-level duplication read."""
    sh = _fanned(spark, sf_dir).select(
        "doc_id",
        F.explode(F.expr(f"transform({_SHINGLES_SPARK}, s -> md5(s))")).alias(
            "h"
        ),
    )
    per = sh.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    in_sample = F.col("h").startswith("0")
    shared = F.col("nd") > 1
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_shingles"),
        F.sum(shared.cast("long")).alias("n_shared_shingles"),
        F.sum(in_sample.cast("long")).alias("sampled_distinct"),
        F.sum((in_sample & shared).cast("long")).alias("sampled_shared"),
    )
    return s.select(
        "*",
        (
            100
            * F.abs(
                F.col("sampled_shared") * F.col("n_distinct_shingles")
                - F.col("n_shared_shingles") * F.col("sampled_distinct")
            )
            <= 2 * F.col("sampled_distinct") * F.col("n_distinct_shingles")
        ).alias("est_within_2pct"),
    )
