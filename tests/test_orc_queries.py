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
