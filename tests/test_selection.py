"""Planted-signal tests for the data-selection surface (DSIR, Zipf, BPE).

The oracle sweep in ``test_registry_oracles.py`` already hash-checks
``dsir_importance_weights`` and ``token_zipf_slope`` against DuckDB on the
shared fixtures; these tests instead verify the SEMANTICS on corpora
constructed so the right answer is known independently:

- DSIR must separate a target domain with a disjoint vocabulary (positive
  log-weights) from the background (negative);
- the Zipf slope must match a NumPy-free closed-form recomputation with the
  same min-rank tie convention on a geometric frequency ladder;
- the BPE trainer must reproduce, merge for merge, an independent
  pure-Python greedy BPE on the classic Sennrich-style toy corpus.
"""

from __future__ import annotations

import math

import pytest

from columnar_aware_dedup_spark.operators.bpe import train_merges_from
from columnar_aware_dedup_spark.registry import QUERIES


def _write_documents(spark, tmp_path, rows):
    """Write a planted documents.parquet shaped like the shared fixtures."""
    df = spark.createDataFrame(
        [(i, text, "en", source, len(text)) for i, (text, source) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dsir_separates_disjoint_vocabularies(spark, tmp_path):
    """Target docs (src0, vocab A) must score positive; background docs
    (vocab B) negative — with disjoint vocabularies the per-token log-ratio
    is positive exactly on target tokens."""
    rows = [("alpha beta gamma delta", "src0") for _ in range(6)] + [
        ("omega sigma tau kappa", "srcX") for _ in range(6)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["dsir_importance_weights"](spark, sf).collect()
    }
    assert len(out) == 12
    for i in range(6):
        assert out[i]["logw"] > 0 and out[i]["keep"] is True
    for i in range(6, 12):
        assert out[i]["logw"] < 0 and out[i]["keep"] is False
        assert out[i]["n_tokens"] == 4


def test_zipf_slope_matches_closed_form(spark, tmp_path):
    """Geometric frequency ladder: 1 word x8, 2 words x4, 4 words x2,
    8 words x1 — slope recomputed in pure Python with min-rank ties."""
    words = []
    vocab = 0
    ladder = [(8, 1), (4, 2), (2, 4), (1, 8)]  # (freq, n_terms)
    for freq, n_terms in ladder:
        for _ in range(n_terms):
            words.extend([f"w{vocab}"] * freq)
            vocab += 1
    rows = [(" ".join(words), "zipf")]
    sf = _write_documents(spark, tmp_path, rows)
    row = QUERIES["token_zipf_slope"](spark, sf).collect()
    assert len(row) == 1 and row[0]["source"] == "zipf"
    assert row[0]["n_terms"] == 15 and row[0]["n_levels"] == 4

    # min-rank per level: 1, 2, 4, 8 (suffix-sum of higher-freq term counts +1)
    pts, rank = [], 1
    for freq, n_terms in ladder:
        x8 = lambda v: round(v, 8)
        x, y = math.log(rank), math.log(freq)
        pts.append((n_terms, x8(n_terms * x), x8(n_terms * y),
                    x8(n_terms * x * y), x8(n_terms * x * x)))
        rank += n_terms
    W = sum(p[0] for p in pts)
    Sx, Sy, Sxy, Sxx = (sum(p[k] for p in pts) for k in (1, 2, 3, 4))
    expect = round((W * Sxy - Sx * Sy) / (W * Sxx - Sx * Sx), 6)
    assert row[0]["zipf_slope"] == pytest.approx(expect, abs=1e-6)
    assert row[0]["zipf_slope"] < 0  # frequency falls with rank


def test_gumbel_resample_key_matches_recomputation(spark, tmp_path):
    """Gumbel keys recomputed independently (hashlib md5 -> uniform ->
    -ln(-ln u)) must match the engine's, and the ordering with them."""
    import hashlib

    rows = [("alpha beta gamma delta", "src0") for _ in range(4)] + [
        ("omega sigma tau kappa", "srcX") for _ in range(4)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    logw = {
        r["doc_id"]: r["logw"]
        for r in QUERIES["dsir_importance_weights"](spark, sf).collect()
    }
    got = QUERIES["dsir_gumbel_resample"](spark, sf).collect()
    assert len(got) == 8  # k=100 > corpus, so everything is returned
    expect = []
    for i, lw in logw.items():
        v = int(hashlib.md5(f"gum:{i}".encode()).hexdigest()[:6], 16)
        u = (v + 0.5) / 16777216.0
        expect.append((i, round(lw - math.log(-math.log(u)), 6)))
    expect.sort(key=lambda t: (-t[1], t[0]))
    assert [(r["doc_id"], r["gumbel_key"]) for r in got] == pytest.approx(expect)


def test_naive_bayes_diagonal_on_disjoint_vocab(spark, tmp_path):
    """Disjoint per-source vocabularies must classify perfectly: the
    confusion matrix is exactly diagonal."""
    rows = (
        [("apple banana cherry", "srcA") for _ in range(5)]
        + [("dog elephant fox", "srcB") for _ in range(4)]
        + [("gold silver copper", "srcC") for _ in range(3)]
    )
    sf = _write_documents(spark, tmp_path, rows)
    got = {
        (r["true_source"], r["pred_source"]): r["n_docs"]
        for r in QUERIES["naive_bayes_source_classify"](spark, sf).collect()
    }
    assert got == {("srcA", "srcA"): 5, ("srcB", "srcB"): 4, ("srcC", "srcC"): 3}


def test_dsir_scoring_is_zero_shuffle(spark, sf_dir):
    """The DSIR plan contract: the corpus is scored by a broadcast
    nested-loop join of the ONE-row lambda array plus a per-row fold —
    never a window, and the only exchanges are the B-bounded bucket
    aggregation (hash + single-partition collapse). A hashpartitioning on
    doc_id or a Window would mean the corpus itself shuffles."""
    from columnar_aware_dedup_spark.plans import explain

    df = QUERIES["dsir_importance_weights"](spark, sf_dir)
    plan = explain.plan_string(df)
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    _assert_doc_exchanges_are_explicit_fanouts(plan)
    assert explain.n_exchanges(df) <= 4, plan


def _assert_doc_exchanges_are_explicit_fanouts(plan: str) -> None:
    """Any doc_id-keyed exchange must be ``_fanned``'s REPARTITION_BY_NUM
    (the fixture-scale CPU fan-out of a single-file scan — at 100 TB the
    scan's own splits provide the parallelism and the repartition is
    dropped); an ENSURE_REQUIREMENTS doc-keyed exchange would mean the
    PLAN demands a corpus shuffle, which is the bug being pinned."""
    for line in plan.splitlines():
        if "hashpartitioning(doc_id" in line:
            assert "REPARTITION_BY_NUM" in line, plan


def test_gumbel_resample_plans_take_ordered(spark, sf_dir):
    """The k-cut must plan as TakeOrdered (per-partition heap, k rows to
    the driver), never a global Sort."""
    from columnar_aware_dedup_spark.plans import explain

    df = QUERIES["dsir_gumbel_resample"](spark, sf_dir)
    assert explain.has_take_ordered(df), explain.plan_string(df)


def test_naive_bayes_apply_is_zero_shuffle(spark, sf_dir):
    """NB scoring is the same broadcast-fold shape: no Window anywhere, and
    the documents scan reaches the per-class argmax through a broadcast
    nested-loop join, not a doc-keyed exchange."""
    from columnar_aware_dedup_spark.plans import explain

    df = QUERIES["naive_bayes_source_classify"](spark, sf_dir)
    plan = explain.plan_string(df)
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    _assert_doc_exchanges_are_explicit_fanouts(plan)


def test_zipf_windows_are_histogram_partitioned(spark, sf_dir):
    """The only window in the Zipf plan runs over the per-source frequency
    histogram: every windowspecdefinition must lead with the source
    partition key (an order key first would be a global sort)."""
    from columnar_aware_dedup_spark.plans import explain

    df = QUERIES["token_zipf_slope"](spark, sf_dir)
    plan = explain.plan_string(df, "extended")
    assert "windowspecdefinition(source" in plan, plan
    assert "windowspecdefinition(c" not in plan, plan


def test_cms_estimates_bound_planted_counts(spark, tmp_path):
    """On a corpus with known token counts the CMS top-20 must report the
    exact counts exactly, and every estimate must respect the one-sided CMS
    error bound (never under, over only by colliding mass)."""
    from collections import Counter

    words = (["alpha"] * 30 + ["beta"] * 20 + ["gamma"] * 10
             + [f"rare{i}" for i in range(15)])
    rows = [(" ".join(words), "srcZ")]
    sf = _write_documents(spark, tmp_path, rows)
    got = QUERIES["token_heavy_hitters_cms"](spark, sf).collect()
    truth = Counter(words)
    assert len(got) == 18  # 3 heavy + 15 rare = whole vocabulary (< top-20)
    for r in got:
        assert r["exact_n"] == truth[r["tok"]]
        assert r["est_n"] >= r["exact_n"]
        assert r["overestimate"] == r["est_n"] - r["exact_n"]
    total = sum(truth.values())
    for r in got:
        # CMS bound with W=256: overestimate <= corpus mass (loose sanity)
        assert r["overestimate"] <= total


def test_hll_tracks_planted_cardinality(spark, tmp_path):
    """High-cardinality corpus (raw-estimate branch): the deterministic HLL
    must land within the m=256 error envelope of the true 5000; and a tiny
    source (linear-counting branch) must be near-exact."""
    big = " ".join(f"tok{i}" for i in range(5000))
    rows = [(big, "big"), ("alpha beta gamma", "small")]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["source"]: r for r in QUERIES["token_vocab_hll"](spark, sf).collect()}
    assert got["big"]["n_exact"] == 5000
    assert abs(got["big"]["rel_err"]) < 0.2  # ~3 sigma for m=256
    assert got["small"]["n_exact"] == 3
    assert abs(got["small"]["n_hll"] - 3) < 0.5  # linear counting regime
    for r in got.values():
        assert r["rel_err"] == pytest.approx(
            (r["n_hll"] - r["n_exact"]) / r["n_exact"], abs=1e-3
        )


def test_pmi_surfaces_planted_collocation(spark, tmp_path):
    """A phrase whose halves only ever occur together must out-PMI the
    independent filler pairs."""
    import random

    filler = "the a of to in and is on at by".split()
    rows = []
    for i in range(20):
        words = filler[:]
        random.Random(i).shuffle(words)  # break filler adjacencies
        rows.append((" ".join(words) + " san francisco", "srcP"))
    sf = _write_documents(spark, tmp_path, rows)
    got = QUERIES["pmi_collocations"](spark, sf).collect()
    assert got, "planted corpus must yield collocations"
    assert (got[0]["w1"], got[0]["w2"]) == ("san", "francisco")
    pmi_by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in got}
    top = pmi_by_pair[("san", "francisco")]
    assert all(top >= v for v in pmi_by_pair.values())


def test_kl_flags_the_divergent_source(spark, tmp_path):
    """Sources sharing a vocabulary must sit near zero divergence; a
    disjoint-vocabulary source must stand far above them."""
    # long docs so real token mass dominates the add-one smoothing prior
    rows = (
        [(" ".join(["alpha", "beta", "gamma", "delta"] * 50), "srcA")] * 5
        + [(" ".join(["beta", "alpha", "delta", "gamma"] * 50), "srcB")] * 5
        + [(" ".join(["omega", "sigma", "tau", "kappa"] * 50), "srcO")] * 5
    )
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["source"]: r for r in QUERIES["source_mix_kl"](spark, sf).collect()}
    assert set(got) == {"srcA", "srcB", "srcO"}
    for r in got.values():
        assert r["kl_to_corpus"] >= 0  # Gibbs: KL of smoothed dists
        assert r["n_tokens"] == 1000
    assert got["srcA"]["kl_to_corpus"] == got["srcB"]["kl_to_corpus"]
    # the divergent source clears the shared smoothing noise floor (the
    # empty-bucket terms ~ ln(T/T_s) every source pays) by a wide margin
    assert got["srcO"]["kl_to_corpus"] > 2 * got["srcA"]["kl_to_corpus"]
    assert got["srcO"]["kl_to_corpus"] - got["srcA"]["kl_to_corpus"] > 0.3


def _ref_bpe(words: list[tuple[str, int]], n_merges: int):
    """Independent greedy BPE: argmax pair by (freq, lexicographic), merged
    leftmost-non-overlapping — the semantics the Spark fold must match."""
    syms = [(list(w) + ["</w>"], n) for w, n in words]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, n in syms:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        freq = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == freq)
        merges.append((rank, left, right, left + right, freq))
        nxt = []
        for s, n in syms:
            acc: list[str] = []
            for x in s:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            if len(acc) >= 2:
                nxt.append((acc, n))
        syms = nxt
    return merges


def test_bpe_trainer_matches_reference(spark):
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    wdf = spark.createDataFrame(words, "word string, n long")
    got = sorted((tuple(r) for r in train_merges_from(wdf, 10).collect()))
    assert got == sorted(_ref_bpe(words, 10))
    # sanity on the classic corpus: 'es' then 'est' merge early
    assert got[0][3] == "es" and got[1][3] == "est"


def test_bpe_segmentation_matches_reference(spark):
    """Applying the trained merge table in-plan must segment every word the
    way the pure-Python tokenizer does (fold the ordered merges over the
    raw character sequence, leftmost-non-overlapping)."""
    from columnar_aware_dedup_spark.operators.bpe import segment_words

    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("lowest", 1)]
    wdf = spark.createDataFrame(words, "word string, n long")
    merges = _ref_bpe(words, 6)

    def seg(w):
        sym = list(w) + ["</w>"]
        for _, left, right, _, _ in merges:
            acc = []
            for x in sym:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            sym = acc
        return sym

    got = {
        r["word"]: (r["segmentation"], r["n_subwords"])
        for r in segment_words(wdf, train_merges_from(wdf, 6)).collect()
    }
    assert got == {w: (" ".join(seg(w)), len(seg(w))) for w, _ in words}


def test_bpe_trainer_survives_pair_exhaustion(spark):
    """A corpus whose pairs run out before n_merges must yield a short
    table, not a crash (the empty-argmax join empties the working set)."""
    wdf = spark.createDataFrame([("ab", 3)], "word string, n long")
    got = sorted(tuple(r) for r in train_merges_from(wdf, 6).collect())
    assert got == sorted(_ref_bpe([("ab", 3)], 6))
    assert 0 < len(got) < 6
