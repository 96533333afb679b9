"""Planted-signal tests for the round-4 operators: synthetic fixtures with
hand-computed answers, independent of the DuckDB oracles (an oracle match
proves both engines agree, not that the shared semantics are the intended
ones — these tests pin the intent)."""

from __future__ import annotations

import math

from tests.test_planted_round3 import _write_documents


def test_dup_span_fraction_flags_copied_passage(spark, tmp_path):
    """A doc sharing a verbatim 6-token passage with another doc shows the
    hand-computed duplicated-span fraction; a fully unique doc shows zero;
    a mostly-copied doc is dropped at the 50% threshold."""
    from columnar_aware_dedup_spark.operators.text import dup_span_fraction

    shared = "the quick brown fox jumps high"  # 6 tokens -> 2 spans of 5
    sf_dir = _write_documents(
        tmp_path,
        [
            f"{shared} and then something else entirely follows here",
            f"{shared} but this continuation differs from the other one",
            "completely unique words nowhere else repeated in this corpus",
            shared,  # 2 spans, both shared -> dup_frac 1.0 -> drop
        ],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"], r["keep"])
        for r in dup_span_fraction(spark, sf_dir).collect()
    }
    # doc 0: 13 tokens -> 9 spans; spans 1-2 (inside the shared passage)
    # also occur in docs 1 and 3
    assert got[0] == (9, 2, round(2 / 9, 6), True)
    assert got[1] == (10, 2, round(2 / 10, 6), True)
    assert got[2] == (5, 0, 0.0, True)
    assert got[3] == (2, 2, 1.0, False), "fully-copied doc must be dropped"


def test_dup_span_fraction_short_doc_whole_text_span(spark, tmp_path):
    """Docs under 5 tokens contribute their whole text as one span, so two
    identical short docs are 100% duplicated and a unique one is not."""
    from columnar_aware_dedup_spark.operators.text import dup_span_fraction

    sf_dir = _write_documents(tmp_path, ["tiny doc", "tiny doc", "other"])
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_frac"])
        for r in dup_span_fraction(spark, sf_dir).collect()
    }
    assert got[0] == (1, 1.0)
    assert got[1] == (1, 1.0)
    assert got[2] == (1, 0.0)


def test_bigram_logprob_prefers_fluent_text(spark, tmp_path):
    """Hand-computed MLE: in a corpus where 'the cat' always follows, the
    repeated phrasing scores ln(1)=0-ish probabilities while a doc with a
    one-off continuation pays ln(1/3) on the diverging bigram."""
    from columnar_aware_dedup_spark.operators.text import bigram_logprob_score

    sf_dir = _write_documents(
        tmp_path,
        [
            "the cat sat",  # bigrams: (the,cat) (cat,sat)
            "the cat sat",
            "the dog ran",  # (the,dog) (dog,ran)
        ],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob_score(spark, sf_dir).collect()
    }
    # counts: c(the)=3, c(the,cat)=2, c(cat)=2, c(cat,sat)=2,
    #         c(the,dog)=1, c(dog)=1, c(dog,ran)=1
    lp = lambda c2, c1: round(math.log(c2 / c1), 6)
    exp0 = round((lp(2, 3) + lp(2, 2)) / 2, 6)
    exp2 = round((lp(1, 3) + lp(1, 1)) / 2, 6)
    assert got[0] == (2, exp0)
    assert got[1] == (2, exp0)
    assert got[2] == (2, exp2)
    assert got[0][1] > got[2][1], "repeated phrasing must outscore one-offs"


def test_bigram_logprob_excludes_tokenless_docs(spark, tmp_path):
    """A doc with fewer than 2 tokens has no bigram and must be absent."""
    from columnar_aware_dedup_spark.operators.text import bigram_logprob_score

    sf_dir = _write_documents(tmp_path, ["hello world", "solo", "?!.."])
    got = {r["doc_id"] for r in bigram_logprob_score(spark, sf_dir).collect()}
    assert got == {0}


def test_containment_catches_embedded_quote(spark, tmp_path):
    """A short doc fully embedded in a long neighbor has containment 1.0 in
    one direction while Jaccard stays low — the asymmetric-dup case."""
    from columnar_aware_dedup_spark.operators.text import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(17))
    sf_dir = _write_documents(tmp_path, [short, long_])
    c = ngram_containment_pairs(spark, sf_dir).collect()[0]
    assert c["contain_a_in_b"] == 1.0, "short doc fully contained"
    assert c["contain_b_in_a"] == round(3 / 20, 6)
    j = ngram_jaccard_pairs(spark, sf_dir).collect()[0]
    assert j["jaccard"] == round(3 / 20, 6), "Jaccard misses the subset dup"
