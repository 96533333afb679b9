"""ORC walker fuzz across writer codecs and stripe shapes.

The fixtures exercise one pyarrow writer configuration; these tests pin
the ORC structural walk (cover), the column chunker round-trip, and the
stripe-statistics parse against files written under every codec the
walker's block decoder supports (NONE / ZLIB / SNAPPY), with small
stripes so multi-stripe paths really run. Unsupported codecs must fail
LOUDLY (ValueError), never return wrong spans.
"""

from __future__ import annotations

import io
import random

import pytest

SUPPORTED = ["uncompressed", "zlib", "snappy"]


def _write_orc(tmp_path, codec: str, seed: int = 3) -> bytes:
    import pyarrow as pa
    import pyarrow.orc as orc

    rng = random.Random(seed)
    n = 20000
    t = pa.table(
        {
            "k": pa.array(sorted(rng.randrange(0, 10**6) for _ in range(n))),
            "v": pa.array([rng.random() for _ in range(n)]),
            "s": pa.array([f"row-{rng.randrange(0, 500)}" for _ in range(n)]),
        }
    )
    path = tmp_path / f"fuzz_{codec}.orc"
    orc.write_table(t, path, stripe_size=64 * 1024, compression=codec)
    return path.read_bytes()


@pytest.mark.parametrize("codec", SUPPORTED)
def test_structure_and_cover_across_codecs(tmp_path, codec):
    """The stripe walk must cover the file gap-free under every codec —
    reassembling the chunk spans byte-for-byte reproduces the file."""
    from columnar_aware_dedup_spark.functions.orcmeta import (
        read_orc_structure,
    )
    from columnar_aware_dedup_spark.sources.chunkers import chunk_orc_bytes

    data = _write_orc(tmp_path, codec)
    s = read_orc_structure(data)
    assert len(s.stripes) >= 2, "fuzz file must be multi-stripe"
    chunks = sorted(chunk_orc_bytes(data), key=lambda c: c["start"])
    rebuilt = b"".join(
        data[c["start"] : c["start"] + c["size"]] for c in chunks
    )
    assert rebuilt == data


@pytest.mark.parametrize("codec", SUPPORTED)
def test_column_chunker_roundtrip_across_codecs(tmp_path, codec):
    from columnar_aware_dedup_spark.sources.chunkers import (
        chunk_orc_columns_bytes,
    )

    data = _write_orc(tmp_path, codec)
    chunks = sorted(
        chunk_orc_columns_bytes(data), key=lambda c: c["start"]
    )
    rebuilt = b"".join(
        data[c["start"] : c["start"] + c["size"]] for c in chunks
    )
    assert rebuilt == data
    assert any(c["column_name"] == "col1" for c in chunks)


@pytest.mark.parametrize("codec", SUPPORTED)
def test_stripe_stats_match_truth_across_codecs(tmp_path, codec):
    """The Metadata-section statistics parse (zone maps) agrees with
    pyarrow's per-stripe recomputation under every codec, and the sorted
    key column makes the zone-map bits hold end-to-end."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        zone_map_bits,
        zone_map_stripe_table,
    )

    data = _write_orc(tmp_path, codec)
    rows = zone_map_stripe_table(f"fuzz_{codec}.orc", data)
    assert len(rows) >= 2
    bits = zone_map_bits(rows)
    assert bits == {
        "stats_match_truth_ok": True,
        "pruning_sound_ok": True,
        "pruning_effective_ok": True,
    }, (codec, rows[:2])


def test_unsupported_codec_fails_loudly(tmp_path):
    """ZSTD blocks are not silently misparsed: the decoder raises, the
    walker never emits wrong spans."""
    import pyarrow.orc as orc

    from columnar_aware_dedup_spark.functions.orcmeta import (
        read_stripe_column_stats,
    )

    try:
        data = _write_orc(tmp_path, "zstd")
    except Exception:
        pytest.skip("pyarrow cannot write zstd ORC here")
    with pytest.raises(ValueError, match="compression kind"):
        read_stripe_column_stats(data)
