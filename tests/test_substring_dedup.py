"""Planted-signal tests for the exact substring-duplicate REMOVAL pair
(``substring_dedup_ranges`` / ``substring_dedup_apply``): synthetic
boilerplate with hand-computed cut ranges, independent of the DuckDB oracle
(the oracle proves engine agreement; these pin that the shared semantics —
global first occurrence keeps, everything else is cut, ranges merge — are
the INTENDED ones)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from columnar_aware_dedup_spark.operators.text import (
    _SPAN_N,
    substring_dedup_apply,
    substring_dedup_ranges,
)


def _write_documents(tmp_path, rows):
    """rows = [(doc_id, text)] or [(doc_id, text, source)] -> fixture dir
    (source defaults to 's'; ONE builder so the schema cannot drift between
    the global-cutter and delta-cutter fixtures)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(
                [r[2] if len(r) > 2 else "s" for r in rows], pa.string()
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


#: 10-token boilerplate block planted into several docs.
_BOILER = "all rights reserved contact us for licensing terms and conditions"
#: unique fillers, one per doc, no token overlap with each other or _BOILER.
_U0 = "astrophysics neutron mergers emit gravitational"  # 5 tokens
_U1 = "sourdough rye honey starter ferment overnight bake"  # 7 tokens
_U2 = "completely unique prose about watercolor pigment chemistry basics"


def test_ranges_cut_non_first_occurrences_only(spark, tmp_path):
    """doc 0 carries the boilerplate first -> untouched; doc 1 carries the
    same 10-token block at offset 7 -> one merged cut range [7, 17); doc 2
    is unique -> no range."""
    sf = _write_documents(
        tmp_path,
        [
            (0, f"{_U0} {_BOILER}", ),
            (1, f"{_U1} {_BOILER}", ),
            (2, _U2, ),
        ],
    )
    rows = substring_dedup_ranges(spark, sf).collect()
    assert {(r["doc_id"], r["range_start"], r["range_end"]) for r in rows} == {
        (1, 7, 17)
    }


def test_self_repetition_is_cut(spark, tmp_path):
    """A block repeated INSIDE one document: the first occurrence keeps,
    the repeat is cut — Lee et al. semantics (any re-occurring k-gram goes),
    not merely cross-document dedup. Layout: boiler at 0..9, filler 10..16,
    boiler again at 17..26 -> cut range [17, 27)."""
    sf = _write_documents(tmp_path, [(0, f"{_BOILER} {_U1} {_BOILER}")])
    rows = substring_dedup_ranges(spark, sf).collect()
    assert {(r["doc_id"], r["range_start"], r["range_end"]) for r in rows} == {
        (0, 17, 27)
    }


def test_adjacent_overlapping_spans_merge(spark, tmp_path):
    """Each duplicated span is k wide; consecutive duplicated starts must
    merge into ONE range, never one row per span. The planted block yields
    duplicated starts 7..12 (six spans) and exactly one output row."""
    sf = _write_documents(
        tmp_path, [(0, f"{_U0} {_BOILER}"), (1, f"{_U1} {_BOILER}")]
    )
    rows = substring_dedup_ranges(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["range_start"], r["range_end"]) == (7, 17)
    assert r["range_end"] - r["range_start"] > _SPAN_N  # merged, not single


def test_apply_removes_exactly_the_ranges(spark, tmp_path):
    """The rewrite keeps the keeper doc byte-identical and cuts exactly the
    planted block (not the unique prefix) from the duplicate."""
    sf = _write_documents(
        tmp_path, [(0, f"{_U0} {_BOILER}"), (1, f"{_U1} {_BOILER}")]
    )
    out = {r["doc_id"]: r for r in substring_dedup_apply(spark, sf).collect()}
    assert out[0]["n_tokens_cut"] == 0
    assert out[0]["kept_text"] == f"{_U0} {_BOILER}"
    assert out[1]["n_tokens"] == 17
    assert out[1]["n_tokens_cut"] == 10
    assert out[1]["kept_text"] == _U1


def test_short_docs_are_untouched(spark, tmp_path):
    """Docs shorter than the span width produce no spans and no cuts even
    when byte-identical — whole-short-doc duplication is exact dedup's job
    (`text_exact_dedup`), and the cutter must not mangle it."""
    sf = _write_documents(tmp_path, [(0, "tiny dup text"), (1, "tiny dup text")])
    assert substring_dedup_ranges(spark, sf).count() == 0
    out = {r["doc_id"]: r for r in substring_dedup_apply(spark, sf).collect()}
    assert all(r["n_tokens_cut"] == 0 for r in out.values())
    assert out[1]["kept_text"] == "tiny dup text"


def test_every_span_survives_exactly_once(spark, sf_dir):
    """Corpus-level postcondition on the real fixture: after applying the
    cuts, NO 5-token span occurs twice anywhere (the paper's invariant).
    Re-shingling the kept text and counting span occurrences corpus-wide
    must find zero repeats that were cuttable."""
    from pyspark.sql import functions as F

    kept = substring_dedup_apply(spark, sf_dir).select(
        "doc_id", F.split("kept_text", " ").alias("toks")
    )
    spans = (
        kept.filter(F.size("toks") >= _SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
                    " i -> concat_ws(' ', element_at(toks, i),"
                    " element_at(toks, i + 1), element_at(toks, i + 2),"
                    " element_at(toks, i + 3), element_at(toks, i + 4)))"
                )
            ).alias("span"),
        )
    )
    # NOTE the cut is span-anchored, not suffix-exact: removing a later
    # occurrence SPLICES its doc, which can create NEW spans across the cut
    # seam. The invariant that must hold exactly: no span present in the
    # ORIGINAL corpus more than once survives more than once.
    from columnar_aware_dedup_spark.operators.text import _positioned_spans

    orig_dups = (
        _positioned_spans(spark, sf_dir)
        .groupBy("h").agg(F.count("*").alias("n")).filter("n >= 2")
    )
    survived = (
        spans.select(F.md5("span").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n_after"))
        .join(orig_dups, "h")
        .filter(F.col("n_after") >= 2)
    )
    assert survived.count() == 0


def test_plans_stay_jvm_side(spark, sf_dir):
    """All three cut stages must be pure built-ins (no Python eval) with no
    cartesian product, and their shuffle budgets must hold (the docstrings'
    scale claim, measured: ranges 2, apply 2, delta 3 — one slot of
    headroom so an optimizer-version wobble doesn't flake the suite, while
    a structural regression — an extra corpus-sized exchange — still
    fails)."""
    from columnar_aware_dedup_spark.operators.text import (
        substring_dedup_delta,
    )
    from columnar_aware_dedup_spark.plans import explain

    budgets = {
        substring_dedup_ranges: 3,
        substring_dedup_apply: 3,
        substring_dedup_delta: 4,
    }
    for fn, budget in budgets.items():
        df = fn(spark, sf_dir)
        plan = explain.plan_string(df)
        assert "EvalPython" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        assert explain.n_exchanges(df) <= budget, fn.__name__


def test_delta_cuts_incoming_against_corpus_only(spark, tmp_path):
    """The delta cutter rewrites ONLY the incoming side: a corpus block
    reappearing in an incoming doc is cut from the incoming doc (the corpus
    is history — all its occurrences outrank the delta's), and corpus
    documents never appear in the output even when they duplicate each
    other."""
    from columnar_aware_dedup_spark.operators.text import (
        _INCOMING_SOURCE,
        substring_dedup_delta,
    )

    sf = _write_documents(
        tmp_path,
        [
            (0, f"{_U0} {_BOILER}", "corpus_a"),
            (1, f"{_U2} {_BOILER}", "corpus_b"),  # corpus-internal dup
            (2, f"{_U1} {_BOILER}", _INCOMING_SOURCE),
        ],
    )
    rows = substring_dedup_delta(spark, sf).collect()
    assert {(r["doc_id"], r["range_start"], r["range_end"]) for r in rows} == {
        (2, 7, 17)
    }


def test_delta_dedups_within_the_crawl_too(spark, tmp_path):
    """Two incoming docs sharing a block the corpus has never seen: the
    earlier (doc_id, start) occurrence keeps, the later is cut — the
    intra-delta half of the rule."""
    from columnar_aware_dedup_spark.operators.text import (
        _INCOMING_SOURCE,
        substring_dedup_delta,
    )

    sf = _write_documents(
        tmp_path,
        [
            (0, _U2, "corpus_a"),
            (1, f"{_U0} {_BOILER}", _INCOMING_SOURCE),
            (2, f"{_U1} {_BOILER}", _INCOMING_SOURCE),
        ],
    )
    rows = substring_dedup_delta(spark, sf).collect()
    # doc 1 (5-token unique prefix): boiler at 5..14 keeps (first incoming
    # occurrence); doc 2 (7-token prefix): boiler spans at starts 7..12 cut
    assert {(r["doc_id"], r["range_start"], r["range_end"]) for r in rows} == {
        (2, 7, 17)
    }


def test_delta_admits_novel_incoming_text(spark, tmp_path):
    """An incoming doc with no span overlap anywhere yields no ranges."""
    from columnar_aware_dedup_spark.operators.text import (
        _INCOMING_SOURCE,
        substring_dedup_delta,
    )

    sf = _write_documents(
        tmp_path,
        [(0, f"{_U0} {_BOILER}", "corpus_a"), (1, _U2, _INCOMING_SOURCE)],
    )
    assert substring_dedup_delta(spark, sf).count() == 0
