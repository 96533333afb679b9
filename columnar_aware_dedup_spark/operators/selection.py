"""Data-selection operators: DSIR importance weighting and Zipf diagnostics.

The reference decides what to KEEP by byte-identity (its dedup store answers
"have I seen this chunk?" — ``dedup/ColumnarChunkStore.java``); a training-data
pipeline additionally decides what to keep by *distribution*: score every raw
document by how target-like it is, then resample. This module adds the two
published, fully-columnar members of that family:

- :func:`dsir_importance_weights` — hashed-n-gram importance resampling
  (Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling"): fit unigram bucket distributions for a target domain and the
  raw corpus, score each document with its summed per-token log-likelihood
  ratio. Everything is seeded string hashing + exact decimal sums, so the
  query is DuckDB-hash-checkable like the rest of the text suite.
- :func:`token_zipf_slope` — the corpus-health diagnostic: weighted
  least-squares slope of ln(freq) against ln(rank) per source. Natural text
  sits near -1; templated/spam sources drift off. Rank is derived from a
  *frequency histogram* suffix-sum, never a vocabulary-sized sort.

Scale notes (100 TB):
- DSIR shuffles once to build the 256-row bucket-count table (map-side
  partial aggregation collapses each task to <=256 rows first); scoring is a
  zero-shuffle narrow map — the one-row smoothed log-ratio array is
  broadcast-nested-loop-joined onto the documents scan and folded per row,
  the same shape as the IVF centroid assignment
  (``similarity.centroid_array``). No vocabulary-sized state anywhere: the
  bucket table is B=256 rows by construction, independent of corpus size.
- Zipf shuffles once for (source, token) counts (again partial-agg first);
  the histogram is |distinct frequencies| rows — thousands at web scale, not
  vocabulary-sized — so its per-source window sort is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.text import _NORM_SQL, _fanned
from columnar_aware_dedup_spark.registry import register

#: number of hash buckets for the DSIR feature space: two md5 hex nibbles =
#: 256. The construction is B-independent (the paper uses 10k — still
#: driver-trivial, still one broadcast row).
_B = 256

#: the "target domain" whose distribution we upweight: fixture source src0
#: stands in for the curated/high-quality corpus of the DSIR paper.
_TARGET = "src0"

#: md5-derived bucket in [0, 256): two hex nibbles, engine-shared (the
#: ``search.py`` feature-hash pattern widened to two nibbles).
_BUCKET_SPARK = (
    "(instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substring(md5(tok), 2, 1)) - 1"
)
_BUCKET_SQL = (
    "(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1"
)

#: smoothed per-bucket log-likelihood ratio, rounded to 6 dp and carried as
#: DECIMAL(18,6) so per-document summation is EXACT and order-independent
#: (the ``bigram_logprob_score`` float discipline). Laplace add-one over the
#: B buckets on both numerators, so empty buckets are defined (they can only
#: matter for out-of-corpus scoring; every in-corpus token has a count).
_LAM_ARRAY_SPARK = f"""
transform(sequence(0, {_B - 1}), b -> cast(round(
    ln(cast(coalesce(element_at(m, b).t, 0L) + 1 as double)
       / cast(tt + {_B} as double))
  - ln(cast(coalesce(element_at(m, b).r, 0L) + 1 as double)
       / cast(tr + {_B} as double)), 6) as decimal(18,6)))
"""


@register(
    "dsir_importance_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split({_NORM_SQL}, ' ')) AS tok
  FROM documents
), bt AS (
  SELECT doc_id, {_BUCKET_SQL} AS b,
         source = '{_TARGET}' AS is_target
  FROM toks
), bc AS (
  SELECT b,
         CAST(COUNT(*) AS BIGINT) AS r_n,
         CAST(COUNT(*) FILTER (WHERE is_target) AS BIGINT) AS t_n
  FROM bt GROUP BY b
), tot AS (
  SELECT SUM(t_n) AS tt, SUM(r_n) AS tr FROM bc
), lam AS (
  SELECT b, CAST(round(
      ln(CAST(t_n + 1 AS DOUBLE) / CAST(tt + {_B} AS DOUBLE))
    - ln(CAST(r_n + 1 AS DOUBLE) / CAST(tr + {_B} AS DOUBLE)), 6)
    AS DECIMAL(18,6)) AS lam
  FROM bc, tot
)
SELECT bt.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(l.lam) AS DOUBLE), 6) AS logw,
       SUM(l.lam) >= 0 AS keep
FROM bt JOIN lam l USING (b)
GROUP BY bt.doc_id
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: per-document importance log-weight, target vs raw distribution.

    Two stages: *fit* (:func:`fit_dsir_lambda` — one 256-row-bounded
    shuffle) and *score* (:func:`score_documents` — zero-shuffle broadcast
    fold, the IVF-assignment shape).

    ``keep`` is the deterministic resampling stand-in: a document whose
    tokens look more target-like than raw-like (logw >= 0) survives; the
    paper's sampled selection is :func:`dsir_gumbel_resample`.
    """
    return score_documents(
        _fanned(spark, sf_dir), fit_dsir_lambda(spark, sf_dir)
    )


def fit_dsir_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE row holding the smoothed per-bucket log-ratio array ``lam``:
    explode tokens, hash each into one of 256 md5 buckets, count per bucket
    twice — within the target source and corpus-wide — then collapse with
    add-one smoothing. The frozen selection model (also consumed by the
    streaming scorer, ``streaming/selection.py``)."""
    bc = (
        _fanned(spark, sf_dir)
        .select("source", F.explode("toks").alias("tok"))
        .select(
            F.expr(_BUCKET_SPARK).cast("int").alias("b"),
            (F.col("source") == _TARGET).alias("is_target"),
        )
        .groupBy("b")
        .agg(
            F.count("*").alias("r_n"),
            F.count(F.when(F.col("is_target"), 1)).alias("t_n"),
        )
    )
    return bc.agg(
        F.expr(
            "map_from_entries(collect_list(struct(b, struct(t_n AS t, r_n AS r))))"
        ).alias("m"),
        F.sum("t_n").alias("tt"),
        F.sum("r_n").alias("tr"),
    ).select(F.expr(_LAM_ARRAY_SPARK).alias("lam"))


def score_documents(docs: DataFrame, lam: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, logw, keep) for any frame carrying ``doc_id`` +
    ``toks``, against a fitted one-row ``lam``. Broadcast nested-loop join
    of the single model row plus a per-row exact-decimal fold — zero
    shuffle of the corpus, and the SAME expression in batch and streaming
    (parity by construction, the shared-formula discipline)."""
    fold = F.expr(
        f"""aggregate(toks, cast(0 as decimal(18,6)),
            (acc, tok) -> cast(acc + element_at(lam, ({_BUCKET_SPARK}) + 1)
                           as decimal(18,6)))"""
    )
    return docs.select("doc_id", "toks").join(F.broadcast(lam)).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(fold.cast("double"), 6).alias("logw"),
        (fold >= F.lit(0).cast("decimal(18,6)")).alias("keep"),
    )


#: seeded uniform in (0, 1) from the doc id — six md5 hex digits via the
#: house conv/0x-cast pair (``curation.domain_mix_sample``), offset by 0.5
#: so ln(u) and ln(-ln(u)) are always defined.
_U_SPARK = (
    "(conv(substring(md5(concat('gum:', cast(doc_id as string))), 1, 6),"
    " 16, 10) + 0.5) / 16777216.0"
)
_U_SQL = (
    "(CAST(('0x' || substr(md5('gum:' || CAST(doc_id AS VARCHAR)), 1, 6))"
    " AS BIGINT) + 0.5) / 16777216.0"
)

#: resample size: the Gumbel-top-k cut. Fixture-scale constant; at corpus
#: scale k is the token-budget-derived sample size.
_RESAMPLE_K = 100


@register(
    "dsir_gumbel_resample",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split({_NORM_SQL}, ' ')) AS tok
  FROM documents
), bt AS (
  SELECT doc_id, {_BUCKET_SQL} AS b,
         source = '{_TARGET}' AS is_target
  FROM toks
), bc AS (
  SELECT b,
         CAST(COUNT(*) AS BIGINT) AS r_n,
         CAST(COUNT(*) FILTER (WHERE is_target) AS BIGINT) AS t_n
  FROM bt GROUP BY b
), tot AS (
  SELECT SUM(t_n) AS tt, SUM(r_n) AS tr FROM bc
), lam AS (
  SELECT b, CAST(round(
      ln(CAST(t_n + 1 AS DOUBLE) / CAST(tt + {_B} AS DOUBLE))
    - ln(CAST(r_n + 1 AS DOUBLE) / CAST(tr + {_B} AS DOUBLE)), 6)
    AS DECIMAL(18,6)) AS lam
  FROM bc, tot
), scored AS (
  SELECT bt.doc_id, round(CAST(SUM(l.lam) AS DOUBLE), 6) AS logw
  FROM bt JOIN lam l USING (b)
  GROUP BY bt.doc_id
)
SELECT doc_id, logw,
       round(logw - ln(-ln({_U_SQL})), 6) AS gumbel_key
FROM scored
ORDER BY gumbel_key DESC, doc_id
LIMIT {_RESAMPLE_K}
""",
)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection step: Gumbel-top-k sampling without
    replacement under the importance weights.

    Adding independent Gumbel noise ``-ln(-ln(u))`` to each log-weight and
    keeping the top k draws a weighted sample without replacement (the
    Gumbel-max trick); u comes from a seeded md5 of the doc id, so the
    "noise" — and therefore the sample — is a pure function of the corpus
    and stays hash-checkable. The cut ranks the ROUNDED key with doc_id as
    the tiebreak, so the boundary is engine-exact; the top-k itself plans
    as TakeOrdered, never a global sort.
    """
    scored = dsir_importance_weights(spark, sf_dir)
    key = F.round(F.col("logw") - F.log(-F.log(F.expr(_U_SPARK))), 6)
    return (
        scored.select("doc_id", "logw", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(_RESAMPLE_K)
    )


#: per-class smoothed token log-likelihood array + log-prior, built from the
#: per-(source, bucket) count map exactly like the DSIR lambda array.
_NB_CLASS_ARRAY_SPARK = f"""
array_sort(collect_list(struct(
    source,
    prior,
    transform(sequence(0, {_B - 1}), b -> cast(round(
        ln(cast(coalesce(element_at(m, b), 0L) + 1 as double)
           / cast(tt + {_B} as double)), 6) as decimal(18,6))) AS lam)))
"""

#: per-document class scores: log-prior + summed per-token log-likelihood,
#: folded with an exact decimal accumulator; negated so ``array_sort``'s
#: ascending lexicographic order yields (best score, lexicographically
#: smallest source) first — the IVF argmin idiom.
_NB_SCORES_SPARK = f"""
array_sort(transform(classes, cl -> struct(
    cast(-(cl.prior + aggregate(toks, cast(0 as decimal(18,6)),
        (acc, tok) -> cast(acc + element_at(cl.lam, ({_BUCKET_SPARK}) + 1)
                       as decimal(18,6)))) as decimal(28,6)) AS negs,
    cl.source AS s)))
"""


@register(
    "naive_bayes_source_classify",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split({_NORM_SQL}, ' ')) AS tok
  FROM documents
), bt AS (
  SELECT doc_id, source, {_BUCKET_SQL} AS b FROM toks
), cnt AS (
  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM bt GROUP BY source, b
), stot AS (
  SELECT source, SUM(c) AS tt FROM cnt GROUP BY source
), prior AS (
  SELECT source,
         CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
                       / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)),
                    6) AS DECIMAL(18,6)) AS prior
  FROM documents GROUP BY source
), lam AS (
  SELECT s.source, b.b, CAST(round(
      ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
         / CAST(s.tt + {_B} AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lam
  FROM stot s
  CROSS JOIN (SELECT unnest(generate_series(0, {_B - 1})) AS b) b
  LEFT JOIN cnt c ON c.source = s.source AND c.b = b.b
), score AS (
  SELECT bt.doc_id, l.source AS cls,
         ANY_VALUE(p.prior) + SUM(l.lam) AS s
  FROM bt
  JOIN lam l ON l.b = bt.b
  JOIN prior p ON p.source = l.source
  GROUP BY bt.doc_id, l.source
), pred AS (
  SELECT doc_id, cls AS pred_source
  FROM score
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY s DESC, cls) = 1
)
SELECT d.source AS true_source, p.pred_source,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.source, p.pred_source
""",
)
def naive_bayes_source_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes domain classifier, trained and applied
    in one plan — the closed-form stand-in for the fastText/CCNet-style
    domain tagger of production curation stacks. Output is the
    source-confusion matrix (true x predicted doc counts).

    Fit: one (source, bucket) partial-agg shuffle (<= #sources x 256 rows by
    construction) plus per-source token totals and doc-count priors, all
    collapsed into ONE row of per-class (prior, lambda-array) structs.
    Apply: broadcast that row and argmax a per-class decimal fold per
    document — zero shuffle of the corpus; only the #sources^2-bounded
    confusion matrix aggregates at the end. Ties break to the
    lexicographically smallest source on both engines.
    """
    fanned = _fanned(spark, sf_dir)
    bt = fanned.select(
        "source", F.explode("toks").alias("tok")
    ).select("source", F.expr(_BUCKET_SPARK).cast("int").alias("b"))
    cnt = bt.groupBy("source", "b").agg(F.count("*").alias("c"))
    stot = cnt.groupBy("source").agg(
        F.sum("c").alias("tt"),
        F.expr("map_from_entries(collect_list(struct(b, c)))").alias("m"),
    )
    n_docs = fanned.groupBy("source").agg(F.count("*").alias("nd"))
    total = fanned.agg(F.count("*").alias("ntot"))
    prior = (
        n_docs.join(F.broadcast(total))
        .select(
            "source",
            F.round(F.log(F.col("nd").cast("double") / F.col("ntot").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("prior"),
        )
    )
    one = (
        stot.join(prior, "source")
        .agg(F.expr(_NB_CLASS_ARRAY_SPARK).alias("classes"))
    )
    pred = (
        fanned.select("doc_id", F.col("source").alias("true_source"), "toks")
        .join(F.broadcast(one))
        .select(
            "true_source",
            F.expr(f"element_at({_NB_SCORES_SPARK}, 1).s").alias("pred_source"),
        )
    )
    return pred.groupBy("true_source", "pred_source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


#: count-min sketch geometry: D=4 independent rows x W=256 columns. The
#: per-row hash reads two md5 nibbles of a row-seeded digest — independent
#: across rows, engine-shared, and W-bounded by construction.
_CMS_D = 4
_CMS_W = 256


def _cms_bucket_spark(d: int, tok: str = "tok") -> str:
    return (
        f"(instr('0123456789abcdef', substring(md5(concat('cms{d}:', {tok})), 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substring(md5(concat('cms{d}:', {tok})), 2, 1)) - 1"
    )


def _cms_bucket_sql(d: int, tok: str = "tok") -> str:
    return (
        f"(strpos('0123456789abcdef', substr(md5('cms{d}:' || {tok}), 1, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(md5('cms{d}:' || {tok}), 2, 1)) - 1"
    )


_TOPK_HH = 20


TOKEN_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), cells AS (
  {" UNION ALL ".join(f"SELECT {d} AS d, {_cms_bucket_sql(d)} AS b, tok FROM toks" for d in range(_CMS_D))}
), sk AS (
  SELECT d, b, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY d, b
), exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY tok
  ORDER BY exact_n DESC, tok LIMIT {_TOPK_HH}
)
SELECT e.tok, e.exact_n,
       least({", ".join(
           f"(SELECT n FROM sk WHERE d = {d} AND b = {_cms_bucket_sql(d, 'e.tok')})"
           for d in range(_CMS_D))}) AS est_n,
       least({", ".join(
           f"(SELECT n FROM sk WHERE d = {d} AND b = {_cms_bucket_sql(d, 'e.tok')})"
           for d in range(_CMS_D))}) - e.exact_n AS overestimate
FROM exact e
"""


def heavy_hitters_from_cells(
    spark: SparkSession, sf_dir: str, sk_cells: DataFrame
) -> DataFrame:
    """The ``token_heavy_hitters_cms`` report served from an EXTERNAL
    ``(d, b, n)`` cell table — the serve path the streaming sketch
    maintainer's driver certificate goes through
    (``operators/streaming_parity.py``): the exact top-20 still comes from
    the corpus scan, but every estimate is answered by the supplied sketch,
    so hash equality proves the maintained cells equal the batch-built
    ones."""
    ex = _fanned(spark, sf_dir).select(F.explode("toks").alias("tok"))
    sk = sk_cells.agg(
        F.expr(
            f"map_from_entries(collect_list(struct(d * {_CMS_W} + b, n)))"
        ).alias("m")
    )
    exact = (
        ex.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(_TOPK_HH)
    )
    est = F.least(
        *[
            F.expr(f"element_at(m, {d} * {_CMS_W} + ({_cms_bucket_spark(d)}))")
            for d in range(_CMS_D)
        ]
    )
    return exact.join(F.broadcast(sk)).select(
        "tok",
        "exact_n",
        est.alias("est_n"),
        (est - F.col("exact_n")).alias("overestimate"),
    )


@register("token_heavy_hitters_cms", oracle=TOKEN_CMS_ORACLE)
def token_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation, audited against exact counts.

    The sketch is the bounded-memory answer to "how often does this token
    occur" at 100 TB: D x W = 1024 cells total, REGARDLESS of vocabulary.
    Each task partial-aggregates its tokens into <=1024 (row, bucket) cells
    before the shuffle, the folded sketch collapses into ONE broadcast row,
    and any candidate's estimate is the min over its D cells — here
    evaluated for the exact top-20 tokens so the output doubles as the
    overestimation audit (CMS never underestimates: est_n >= exact_n, an
    invariant the planted test asserts and the oracle reproduces
    cell-for-cell).

    Seeded md5 row hashes keep the sketch deterministic and engine-shared —
    the same discipline that makes MinHash/SimHash hash-checkable here.
    """
    ex = _fanned(spark, sf_dir).select(F.explode("toks").alias("tok"))
    sk_cells = (
        ex.select(
            F.explode(
                F.expr(
                    "array("
                    + ", ".join(
                        f"struct({d} AS d, ({_cms_bucket_spark(d)}) AS b)"
                        for d in range(_CMS_D)
                    )
                    + ")"
                )
            ).alias("c")
        )
        .select("c.d", "c.b")
        .groupBy("d", "b")
        .agg(F.count("*").alias("n"))
    )
    return heavy_hitters_from_cells(spark, sf_dir, sk_cells)


#: per-bucket KL term: smoothed p_s(b) * ln(p_s(b) / p_corpus(b)), rounded
#: to 10 dp and summed as DECIMAL so the 256-term reduction is
#: order-independent. ALL buckets contribute (an empty source bucket still
#: carries smoothed mass), hence the sequence(0,255) fold over maps — the
#: DSIR lambda-array construction, pointed at divergence instead of
#: selection.
_KL_PS = f"cast(coalesce(element_at(m, b), 0L) + 1 as double) / cast(ts + {_B} as double)"
_KL_PC = f"cast(coalesce(element_at(mc, b), 0L) + 1 as double) / cast(tc + {_B} as double)"
_KL_FOLD = f"""
aggregate(
  transform(sequence(0, {_B - 1}), b ->
    cast(round(({_KL_PS}) * ln(({_KL_PS}) / ({_KL_PC})), 10)
         as decimal(18,10))),
  cast(0 as decimal(18,10)),
  (acc, t) -> cast(acc + t as decimal(18,10)))
"""


@register(
    "source_mix_kl",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), bt AS (
  SELECT source, {_BUCKET_SQL} AS b FROM toks
), cs AS (
  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS n FROM bt GROUP BY source, b
), st AS (
  SELECT source, SUM(n) AS ts FROM cs GROUP BY source
), corpus AS (
  SELECT b, SUM(n) AS nc FROM cs GROUP BY b
), tc AS (
  SELECT SUM(nc) AS tcv FROM corpus
), grid AS (
  SELECT s.source, g.b
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT unnest(generate_series(0, {_B - 1})) AS b) g
), terms AS (
  SELECT grid.source,
         CAST(round(
           (CAST(COALESCE(cs.n, 0) + 1 AS DOUBLE) / CAST(st.ts + {_B} AS DOUBLE))
           * ln((CAST(COALESCE(cs.n, 0) + 1 AS DOUBLE) / CAST(st.ts + {_B} AS DOUBLE))
                / (CAST(COALESCE(c.nc, 0) + 1 AS DOUBLE) / CAST(t.tcv + {_B} AS DOUBLE))),
           10) AS DECIMAL(18,10)) AS term
  FROM grid
  LEFT JOIN cs ON cs.source = grid.source AND cs.b = grid.b
  JOIN st ON st.source = grid.source
  LEFT JOIN corpus c ON c.b = grid.b
  CROSS JOIN tc t
)
SELECT terms.source,
       CAST(ANY_VALUE(st.ts) AS BIGINT) AS n_tokens,
       round(CAST(SUM(term) AS DOUBLE), 6) AS kl_to_corpus
FROM terms JOIN st ON st.source = terms.source
GROUP BY terms.source
""",
)
def source_mix_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift report: smoothed KL divergence of each source's hashed
    unigram distribution from the corpus mixture — the quantitative answer
    to "which sources look different from the blend" that data-mixing
    decisions (`domain_mix_sample`) start from.

    Same scale shape as the DSIR fit: one B-bounded (source, bucket)
    shuffle, per-source maps + the one-row corpus map broadcast, and the
    256-term divergence folded per source with an exact decimal
    accumulator. Nothing vocabulary- or corpus-sized moves.
    """
    bt = (
        _fanned(spark, sf_dir)
        .select("source", F.explode("toks").alias("tok"))
        .select("source", F.expr(_BUCKET_SPARK).cast("int").alias("b"))
    )
    cs = bt.groupBy("source", "b").agg(F.count("*").alias("n"))
    per_source = cs.groupBy("source").agg(
        F.expr("map_from_entries(collect_list(struct(b, n)))").alias("m"),
        F.sum("n").alias("ts"),
    )
    corpus = (
        cs.groupBy("b")
        .agg(F.sum("n").alias("nc"))
        .agg(
            F.expr("map_from_entries(collect_list(struct(b, nc)))").alias("mc"),
            F.sum("nc").alias("tc"),
        )
    )
    kl = F.expr(_KL_FOLD)
    return (
        per_source.join(F.broadcast(corpus))
        .select(
            "source",
            F.col("ts").cast("bigint").alias("n_tokens"),
            F.round(kl.cast("double"), 6).alias("kl_to_corpus"),
        )
    )


#: HyperLogLog geometry: m=256 registers (p=8). Register = first two md5
#: nibbles; rank = leading-zero count of the NEXT 32 hash bits + 1 (via the
#: bit length of the integer — no float log2, so no boundary flips).
_HLL_M = 256
#: standard alpha_m for m >= 128, written as the same literal expression on
#: both engines so the double is identical.
_HLL_ALPHA = "(0.7213 / (1 + 1.079 / 256))"

_HLL_REG_SPARK = "cast(conv(substring(md5(tok), 1, 2), 16, 10) as int)"
_HLL_V_SPARK = "cast(conv(substring(md5(tok), 3, 8), 16, 10) as bigint)"
_HLL_RHO_SPARK = (
    f"CASE WHEN {_HLL_V_SPARK} = 0 THEN 33"
    f" ELSE 33 - length(bin({_HLL_V_SPARK})) END"
)
_HLL_REG_SQL = "CAST(('0x' || substr(md5(tok), 1, 2)) AS INTEGER)"
_HLL_V_SQL = "CAST(('0x' || substr(md5(tok), 3, 8)) AS BIGINT)"
_HLL_RHO_SQL = (
    f"CASE WHEN {_HLL_V_SQL} = 0 THEN 33"
    f" ELSE 33 - length(bin({_HLL_V_SQL})) END"
)

#: estimator from (sum of 2^-M_j over PRESENT registers, #present): add one
#: per empty register (2^0), harmonic raw estimate, linear-counting branch
#: for the small range. Every 2^-rho term is an exact dyadic double and the
#: bounded sum stays exact in ANY order, so plain SUM is engine-stable.
_HLL_EST = (
    f"CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}"
    f"          / (s_present + ({_HLL_M} - n_regs)) <= 2.5 * {_HLL_M}"
    f"      AND n_regs < {_HLL_M}"
    f" THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)"
    f"                    / ({_HLL_M} - n_regs))"
    f" ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}"
    f"      / (s_present + ({_HLL_M} - n_regs)) END"
)


@register(
    "token_vocab_hll",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), h AS (
  SELECT source, {_HLL_REG_SQL} AS reg, {_HLL_RHO_SQL} AS rho FROM toks
), regs AS (
  SELECT source, reg, MAX(rho) AS mr FROM h GROUP BY source, reg
), st AS (
  SELECT source,
         SUM(power(2.0, -mr)) AS s_present,
         CAST(COUNT(*) AS BIGINT) AS n_regs
  FROM regs GROUP BY source
), ex AS (
  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
  FROM toks GROUP BY source
)
SELECT st.source, ex.n_exact,
       round({_HLL_EST}, 4) AS n_hll,
       round(({_HLL_EST} - ex.n_exact) / ex.n_exact, 4) AS rel_err
FROM st JOIN ex USING (source)
""",
)
def token_vocab_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality via a hand-rolled HyperLogLog,
    audited against the exact distinct count.

    Unlike ``approx_count_distinct`` (whose sketch is engine-internal, so
    its twin queries are rows-only), this HLL is built from seeded md5 bits
    shared with DuckDB — the THIRD deterministic sketch in the engine (CMS,
    Bloom, HLL), all hash-checkable. State is m=256 registers per source
    regardless of cardinality; every task partial-aggregates to <=m rows
    (MAX combines), so at 100 TB the distinct-count costs one m-bounded
    shuffle instead of a vocabulary-sized one. The rank uses integer bit
    length, not float log2, and the harmonic sum's dyadic terms are exact
    in any order — both choices keep the estimate bit-stable across
    engines.
    """
    ex = _fanned(spark, sf_dir).select("source", F.explode("toks").alias("tok"))
    regs = (
        ex.select(
            "source",
            F.expr(_HLL_REG_SPARK).alias("reg"),
            F.expr(_HLL_RHO_SPARK).alias("rho"),
        )
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("mr"))
    )
    st = regs.groupBy("source").agg(
        F.sum(F.expr("power(2.0, -mr)")).alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    exact = ex.groupBy("source").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    est = F.expr(_HLL_EST)
    return st.join(exact, "source").select(
        "source",
        "n_exact",
        F.round(est, 4).alias("n_hll"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
    )


@register(
    "token_zipf_slope",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), vocab AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), hist AS (
  SELECT source, c, CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM vocab GROUP BY source, c
), ranked AS (
  SELECT source, c, n_terms,
         COALESCE(SUM(n_terms) OVER (
           PARTITION BY source ORDER BY c DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS r
  FROM hist
), pts AS (
  SELECT source, n_terms,
         CAST(round(n_terms * ln(CAST(r AS DOUBLE)), 8) AS DECIMAL(28,8)) AS sx,
         CAST(round(n_terms * ln(CAST(c AS DOUBLE)), 8) AS DECIMAL(28,8)) AS sy,
         CAST(round(n_terms * ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 8)
              AS DECIMAL(28,8)) AS sxy,
         CAST(round(n_terms * ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)), 8)
              AS DECIMAL(28,8)) AS sxx
  FROM ranked
)
SELECT source,
       CAST(SUM(n_terms) AS BIGINT) AS n_terms,
       CAST(COUNT(*) AS BIGINT) AS n_levels,
       round((CAST(SUM(n_terms) AS DOUBLE) * CAST(SUM(sxy) AS DOUBLE)
              - CAST(SUM(sx) AS DOUBLE) * CAST(SUM(sy) AS DOUBLE))
             / (CAST(SUM(n_terms) AS DOUBLE) * CAST(SUM(sxx) AS DOUBLE)
                - CAST(SUM(sx) AS DOUBLE) * CAST(SUM(sx) AS DOUBLE)),
             6) AS zipf_slope
FROM pts
GROUP BY source
""",
)
def token_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf fit: weighted least-squares slope of ln(freq) on
    ln(rank) over the token frequency distribution.

    Rank comes from the frequency HISTOGRAM, not a vocabulary sort: terms
    sharing a frequency share the min-rank (``rank()`` tie semantics), which
    is ``1 + suffix-sum(n_terms over strictly higher frequencies)`` — a
    window over |distinct frequencies| rows per source (bounded and tiny
    under any Zipfian distribution), never over the vocabulary.

    Float discipline: ln() of exact integers is engine-identical; every
    weighted product is rounded to 8 dp and summed as DECIMAL(28,8) (exact,
    order-independent); the final slope combines those exact sums in double
    on both engines.
    """
    ex = _fanned(spark, sf_dir).select("source", F.explode("toks").alias("tok"))
    vocab = ex.groupBy("source", "tok").agg(F.count("*").alias("c"))
    hist = vocab.groupBy("source", "c").agg(F.count("*").alias("n_terms"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "r", F.coalesce(F.sum("n_terms").over(w), F.lit(0)) + F.lit(1)
    )
    lnr = F.log(F.col("r").cast("double"))
    lnc = F.log(F.col("c").cast("double"))
    n = F.col("n_terms")
    dec = lambda col: F.round(col, 8).cast("decimal(28,8)")  # noqa: E731
    pts = ranked.select(
        "source",
        "n_terms",
        dec(n * lnr).alias("sx"),
        dec(n * lnc).alias("sy"),
        dec(n * lnr * lnc).alias("sxy"),
        dec(n * lnr * lnr).alias("sxx"),
    )
    W = F.sum("n_terms").cast("double")
    Sx = F.sum("sx").cast("double")
    Sy = F.sum("sy").cast("double")
    Sxy = F.sum("sxy").cast("double")
    Sxx = F.sum("sxx").cast("double")
    return pts.groupBy("source").agg(
        F.sum("n_terms").cast("bigint").alias("n_terms"),
        F.count("*").alias("n_levels"),
        F.round((W * Sxy - Sx * Sy) / (W * Sxx - Sx * Sx), 6).alias("zipf_slope"),
    )


# -- perplexity bucketing (CCNet-style head/middle/tail) ----------------------

#: number of quantile buckets for the perplexity partition (CCNet splits
#: into 3; deciles give the same mechanism at reporting granularity).
_PPL_BUCKETS = 10

PERPLEXITY_BUCKET_ORACLE = """
WITH lpdoc AS (
  SELECT doc_id, avg_logprob, keep FROM ({lm})
), h AS (
  SELECT floor(avg_logprob * 100) / 100 AS s2, count(*) AS c
  FROM lpdoc GROUP BY s2
), cum AS (
  SELECT s2, sum(c) OVER (ORDER BY s2) AS cc,
         sum(c) OVER () AS tot
  FROM h
), cuts AS (
  SELECT d, min(s2) AS cut
  FROM generate_series(1, {nb}) g(d) CROSS JOIN cum
  WHERE cc >= (d * tot + {nb} - 1) // {nb}
  GROUP BY d
), b AS (
  SELECT doc_id, avg_logprob, keep,
         (SELECT min(d) FROM cuts
          WHERE floor(avg_logprob * 100) / 100 <= cut) AS bucket
  FROM lpdoc
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(avg_logprob) AS lo_logprob,
       max(avg_logprob) AS hi_logprob,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM b GROUP BY bucket
""".format(lm="{lm}", nb=_PPL_BUCKETS)


def _perplexity_bucket_oracle() -> str:
    from columnar_aware_dedup_spark.operators.text import BIGRAM_LM_ORACLE

    return PERPLEXITY_BUCKET_ORACLE.format(lm=BIGRAM_LM_ORACLE)


@register("perplexity_bucket_report", oracle=_perplexity_bucket_oracle())
def perplexity_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity partition (Wenzek et al. 2020, arXiv:1911.00359):
    split the corpus into quantile buckets of the language-model score (the
    self-trained bigram LM of ``bigram_logprob_score``) and report each
    bucket's population, score range, and quality-filter agreement — the
    table behind keep-the-head / resample-the-middle / drop-the-tail
    curation decisions.

    Exact corpus quantiles without a corpus sort: scores quantize to a 2-dp
    grid via ``floor(x*100)/100`` — mode-free on both engines, unlike
    ``round(x, 2)`` whose HALF_UP (Spark, decimal-string) vs scaled-binary
    (DuckDB) semantics diverge on exact decimal halves, which the 6-dp
    pre-quantized avg_logprob can land on (ADVICE r06). Logprobs live in a
    few units, so the grid is a few hundred cells
    regardless of corpus size, ONE map-side-combined aggregation builds the
    grid histogram, a window over the histogram (bounded rows, never the
    data) derives cumulative counts, and the ``_PPL_BUCKETS`` cutoffs fold
    into one broadcast row — bucket assignment is then a zero-shuffle
    narrow map, the same broadcast-fold shape as the IVF centroid argmin.
    Integer-exact thresholds (``ceil(d*N/nb)`` via ``(d*N + nb-1) div nb``)
    keep both engines' cutoffs bit-identical; ties share a grid cell, so
    bucket membership is value-determined and reproducible.
    """
    from columnar_aware_dedup_spark.operators.text import bigram_logprob_score

    scores = (
        bigram_logprob_score(spark, sf_dir)
        .select("doc_id", "avg_logprob", "keep")
        .withColumn("s2", F.floor(F.col("avg_logprob") * 100) / 100)
        # feeds the histogram AND the assignment join: the lazy checkpoint
        # materializes the LM-score pass once. At 100 TB this table is the
        # pipeline's persisted product (per-doc quality scores), not a
        # data-sized cache of raw text — the crawl_admission_report rationale.
        .localCheckpoint(eager=False)
    )
    hist = scores.groupBy("s2").agg(F.count("*").alias("c"))
    # windows over the bounded score grid (a few hundred rows), NOT the data
    cum = hist.select(
        "s2",
        F.sum("c").over(Window.orderBy("s2")).alias("cc"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    cuts = (
        cum.select(
            F.explode(F.sequence(F.lit(1), F.lit(_PPL_BUCKETS))).alias("d"),
            "s2",
            "cc",
            "tot",
        )
        # ceil(d*N/nb) as exact integer division (matches DuckDB's `//`)
        .filter(
            F.expr(
                f"cc >= (CAST(d AS BIGINT) * tot + {_PPL_BUCKETS} - 1)"
                f" div {_PPL_BUCKETS}"
            )
        )
        .groupBy("d")
        .agg(F.min("s2").alias("cut"))
    )
    cuts_row = cuts.agg(
        F.expr("array_sort(collect_list(struct(cut, d)))").alias("cuts")
    )
    bucketed = (
        scores.join(F.broadcast(cuts_row))
        .withColumn(
            "bucket",
            F.expr("element_at(filter(cuts, c -> s2 <= c.cut), 1).d").cast(
                "int"
            ),
        )
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("avg_logprob").alias("lo_logprob"),
        F.max("avg_logprob").alias("hi_logprob"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
    )
