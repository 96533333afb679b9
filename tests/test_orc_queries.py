"""Goldens for the registered binary-ORC query family (sources/orcfixtures).

Pins the semantics the rows-only driver check can't see: append-layout
stripe hits, column-level fallback dedup, byte-exact reconstruction, and
store-side linked-subchunk reconstruction of every stripe hit.
"""

from __future__ import annotations

from columnar_aware_dedup_spark.sources import orcfixtures


def test_orc_reconstruction_identity(spark, sf_dir):
    rows = orcfixtures.orc_reconstruction(spark, sf_dir).collect()
    assert len(rows) == 4  # store/lineitem + 3 incoming files
    assert all(r["identical"] for r in rows)


def test_linked_chunker_exact_cover(sf_dir):
    """Linked chunks (and each stripe's subchunks) cover the file exactly."""
    store, _ = orcfixtures.orc_fixture_dirs(sf_dir)
    data = open(f"{store}/lineitem.orc", "rb").read()
    chunks = orcfixtures.chunk_orc_stripes_linked(data)
    pos = 0
    for c in chunks:
        assert c["start"] == pos, f"gap/overlap at {pos}"
        if c["chunk_type"] == "Stripe":
            sub_pos = c["start"]
            for s in c["subchunks"]:
                assert s["start"] == sub_pos, f"subchunk gap at {sub_pos}"
                sub_pos += s["size"]
            assert sub_pos == c["start"] + c["size"]
        pos += c["size"]
    assert pos == len(data)


def test_hierarchical_levels(spark, sf_dir):
    """Append layout -> stripe hits exist; the one-column-modified file ->
    column-level hits exist even though its stripes miss; new file -> misses."""
    rows = {r["level"]: r for r in orcfixtures.orc_hierarchical_dedup_full(spark, sf_dir).collect()}
    assert rows["stripe"]["hits"] > 0, "append-layout prefix stripes must hit"
    assert rows["stripe"]["misses"] > 0, "new content must miss"
    assert rows["column"]["hits"] > 0, "modified file's unchanged columns must hit"
    assert rows["stripe"]["dedup_bytes"] > 0


def test_linked_reconstruction_all_hits_ok(spark, sf_dir):
    """Every stripe hit must be reconstructable from the store's subchunks."""
    rows = orcfixtures.orc_linked_reconstruction_full(spark, sf_dir).collect()
    assert sum(r["n_hit"] for r in rows) > 0
    for r in rows:
        assert r["n_hit"] == r["n_reconstructed_ok"], r


def test_hierarchical_pruned_matches_unpruned_accounting(spark, sf_dir):
    """The r11 metadata-pruned hierarchical probe changes NOTHING about
    the hit/miss accounting — per-level (hits, misses, dedup_bytes,
    transfer_bytes) must equal the unpruned rollup exactly — while the
    prune itself is real: bytes_hashed strictly below bytes_total at the
    stripe and column levels, equal at the footer level (no statistics
    to prune on), and zero pruned-but-hit items anywhere."""
    pruned = {
        r["level"]: r
        for r in orcfixtures.orc_hierarchical_pruned_full(
            spark, sf_dir
        ).collect()
    }
    unpruned = {
        r["level"]: r
        for r in orcfixtures.orc_hierarchical_dedup_full(
            spark, sf_dir
        ).collect()
    }
    assert set(pruned) == set(unpruned) == {"stripe", "column", "footer"}
    for level, u in unpruned.items():
        p = pruned[level]
        for col in ("hits", "misses", "dedup_bytes", "transfer_bytes"):
            assert p[col] == u[col], (level, col, p[col], u[col])
        assert p["n_unsound"] == 0, (level, p)
        assert p["dedup_bytes_pruned"] == p["dedup_bytes"], (level, p)
    for level in ("stripe", "column"):
        p = pruned[level]
        assert p["bytes_hashed"] < p["bytes_total"], (level, p)
    assert (
        pruned["footer"]["bytes_hashed"] == pruned["footer"]["bytes_total"]
    )


def test_linked_stats_keys_flag_off_emits_nulls(sf_dir):
    """``with_stats_keys=False`` (the default every pre-r11 consumer
    takes) must emit NULL keys everywhere — the walk is unchanged; and
    with the flag on, stripe chunks and column subchunks carry keys
    while index/pad/footer subchunks stay NULL (never pruned)."""
    import glob as _glob

    from columnar_aware_dedup_spark.sources.orcfixtures import (
        chunk_orc_stripes_linked,
        orc_fixture_dirs,
    )

    store_dir, _ = orc_fixture_dirs(sf_dir)
    path = sorted(_glob.glob(f"{store_dir}/*.orc"))[0]
    data = open(path, "rb").read()
    off = chunk_orc_stripes_linked(data)
    assert all(c["stats_key"] is None for c in off)
    assert all(
        s["stats_key"] is None
        for c in off
        if c["subchunks"]
        for s in c["subchunks"]
    )
    on = chunk_orc_stripes_linked(data, with_stats_keys=True)
    stripes = [c for c in on if c["chunk_type"] == "Stripe"]
    assert stripes and all(c["stats_key"] for c in stripes)
    for c in stripes:
        for s in c["subchunks"]:
            if s["column_name"].startswith("col"):
                assert s["stats_key"], s
            else:
                assert s["stats_key"] is None, s
    # identical spans/signatures either way — INCLUDING inside the
    # subchunk arrays (r11 review: stripping the whole array would let a
    # keyed-walk perturbation of a span or ordering slip through): the
    # flag only annotates, so removing the stats_key fields must yield
    # deep-equal chunk lists.
    def strip(cs):
        out = []
        for c in cs:
            c = {k: v for k, v in c.items() if k != "stats_key"}
            if c["subchunks"] is not None:
                c["subchunks"] = [
                    {k: v for k, v in s.items() if k != "stats_key"}
                    for s in c["subchunks"]
                ]
            out.append(c)
        return out

    assert strip(on) == strip(off)


def test_hierarchical_pruned_bits_flip(spark):
    """Falsifiability of the r11 pruned-hierarchical certificate: each
    bit flips on the corruption it exists to catch, through the SAME
    derivation the registered query ships."""
    schema = (
        "level string, hits bigint, misses bigint, dedup_bytes bigint,"
        " transfer_bytes bigint, bytes_total bigint, bytes_hashed bigint,"
        " dedup_bytes_pruned bigint, n_unsound bigint"
    )
    good = [
        ("stripe", 2, 2, 200, 200, 400, 250, 200, 0),
        ("column", 1, 3, 50, 120, 170, 100, 50, 0),
        ("footer", 0, 4, 0, 40, 40, 40, 0, 0),
    ]

    def bits(rows):
        df = orcfixtures.hierarchical_pruned_bits(
            spark.createDataFrame(rows, schema)
        )
        return {r["level"]: r.asDict() for r in df.collect()}

    base = bits(good)
    assert all(
        r["prune_sound_ok"] and r["dedup_match_full_ok"]
        for r in base.values()
    )
    assert base["stripe"]["hashed_lt_total_ok"]
    assert not base["footer"]["hashed_lt_total_ok"]
    assert base["column"]["hierarchy_ok"]

    # a pruned-but-hit stripe flips soundness
    bad = [list(r) for r in good]
    bad[0][8] = 1
    assert not bits([tuple(r) for r in bad])["stripe"]["prune_sound_ok"]
    # a dedup byte only the full probe found flips the match bit
    bad = [list(r) for r in good]
    bad[1][7] = 40
    assert not bits([tuple(r) for r in bad])["column"]["dedup_match_full_ok"]
    # an all-candidate level flips the savings bit
    bad = [list(r) for r in good]
    bad[0][6] = 400
    assert not bits([tuple(r) for r in bad])["stripe"]["hashed_lt_total_ok"]
    # column bytes exceeding the stripe transfer flips the hierarchy bit
    bad = [list(r) for r in good]
    bad[1][2], bad[1][4] = 3, 300
    assert not bits([tuple(r) for r in bad])["column"]["hierarchy_ok"]
    # hits with zero dedup bytes flips the accounting bit
    bad = [list(r) for r in good]
    bad[0][3] = 0
    assert not bits([tuple(r) for r in bad])["stripe"]["bytes_account_ok"]
