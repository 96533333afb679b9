"""Distributed BPE merge training — the tokenizer-side of the pipeline.

``text.token_count_bpe`` *applies* a BPE-ish segmentation; this module
*trains* the merge table (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") the way a distributed tokenizer trainer
decomposes the problem:

- the working set is the DISTINCT-WORD table with occurrence weights, never
  the corpus: one (word, n) aggregation up front, vocabulary-sized from then
  on (the classic trainer optimization — a 100 TB corpus has a few 10^8
  distinct words, not 10^13);
- each round is ONE pair-keyed partial aggregation (explode adjacent symbol
  pairs weighted by n, map-side combine collapses every task to its distinct
  pairs) followed by a TakeOrdered(1) — the argmax pair — and a broadcast of
  that single row back onto the word table, where an array fold applies the
  merge leftmost-non-overlapping. No ``collect()``: the argmax stays a
  DataFrame, exactly the ``kmeans`` trainer discipline, and
  ``localCheckpoint`` truncates the per-round lineage.

Determinism: ties on pair frequency break lexicographically on (left,
right), so the merge sequence is a pure function of the corpus. The trainer
is registered rows-only (iterative argmax is not SQL-expressible); the
planted-corpus pytest checks the exact merge sequence against an
independent pure-Python BPE reference.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.text import _fanned
from columnar_aware_dedup_spark.registry import register

#: adjacent symbol pairs of a word's current segmentation, weighted later by
#: the word's corpus count. Guarded by a size>=2 filter (a fully-merged word
#: contributes no pairs and leaves the working set).
_PAIRS_EXPR = (
    "transform(sequence(1, size(sym) - 1),"
    " i -> struct(element_at(sym, i) AS l, element_at(sym, i + 1) AS r))"
)

#: leftmost-non-overlapping merge of the (l, r) pair into one symbol, as a
#: linear array fold: append each symbol unless it completes the pair with
#: the accumulator's tail, in which case replace the tail with the merged
#: symbol. ``try_element_at`` keeps the empty-accumulator probe NULL-safe
#: under ANSI mode (AND is not guaranteed to short-circuit). Parameterized
#: over the symbol array and the pair expressions so the same fold serves
#: the trainer (broadcast-join columns) and the segmenter (nested-lambda
#: struct fields).
_MERGE_FOLD_T = """
aggregate({sym}, cast(array() as array<string>),
  (acc, s) -> CASE WHEN try_element_at(acc, -1) = {l} AND s = {r}
              THEN concat(slice(acc, 1, size(acc) - 1),
                          array(concat({l}, {r})))
              ELSE concat(acc, array(s)) END)
"""

_MERGE_FOLD = _MERGE_FOLD_T.format(sym="sym", l="l", r="r")

#: apply an ORDERED merge table to a word's raw symbol array: the outer
#: fold walks the merges in rank order, the inner fold is the same
#: leftmost-non-overlapping merge — exactly how a trained BPE tokenizer
#: segments at inference time.
_APPLY_MERGES = (
    "aggregate(merges, {sym0}, (sym, m) -> "
    + _MERGE_FOLD_T.format(sym="sym", l="m.l", r="m.r")
    + ")"
)


def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n): the weighted distinct-word working set over ``documents``."""
    return (
        _fanned(spark, sf_dir)
        .select(F.explode("toks").alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def train_merges_from(words: DataFrame, n_merges: int = 8) -> DataFrame:
    """Greedy BPE merge table from a (word, n) DataFrame.

    Returns (merge_rank, left, right, merged, freq) ordered by rank. If the
    corpus exhausts its pairs before ``n_merges`` rounds, later rounds
    produce no row and the table is simply shorter — the join against an
    empty argmax empties the working set, so no round can crash.
    """
    sym = (
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        " || array('</w>')"
    )
    work = words.select(F.expr(sym).alias("sym"), "n").localCheckpoint(eager=True)
    tops: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        pair_counts = (
            work.filter(F.size("sym") >= 2)
            .select("n", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("freq"))
        )
        top = (
            pair_counts.orderBy(F.desc("freq"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        tops.append(
            top.select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.concat("l", "r").alias("merged"),
                F.col("freq").cast("bigint").alias("freq"),
            )
        )
        work = (
            work.filter(F.size("sym") >= 2)
            .join(F.broadcast(top.select("l", "r")))
            .select(F.expr(_MERGE_FOLD).alias("sym"), "n")
            .localCheckpoint(eager=True)
        )
    return reduce(DataFrame.unionAll, tops).orderBy("merge_rank")


@register("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges over the normalized ``documents`` vocabulary."""
    return train_merges_from(word_counts(spark, sf_dir), n_merges=8)


_RAW_SYM = (
    "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    " || array('</w>')"
)


def segment_words(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Segment a (word, n) table with a trained (merge_rank, left, right)
    table: the merges collapse into ONE ordered broadcast row and each word
    applies them as a nested array fold — inference is a zero-shuffle
    narrow map, the trained-model twin of the DSIR/NB broadcast scorers."""
    mrow = merges.agg(
        F.expr(
            "transform(array_sort(collect_list(struct("
            "merge_rank, `left` AS l, `right` AS r))), t -> struct(t.l, t.r))"
        ).alias("merges")
    )
    seg = _APPLY_MERGES.format(sym0=_RAW_SYM)
    return (
        words.join(F.broadcast(mrow))
        .select(
            "word",
            "n",
            F.expr(seg).alias("sym"),
        )
        .select(
            "word",
            "n",
            F.array_join("sym", " ").alias("segmentation"),
            F.size("sym").cast("bigint").alias("n_subwords"),
        )
    )


@register("bpe_segment_corpus")
def bpe_segment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply: segment the corpus vocabulary with its own trained
    merge table. One row per distinct word — the tokenizer's view of the
    corpus (segmentation, subword count, occurrence weight)."""
    words = word_counts(spark, sf_dir)
    return segment_words(words, train_merges_from(words, n_merges=8)).orderBy(
        "word"
    )
