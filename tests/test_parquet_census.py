"""Parquet column census: pyarrow pins, corruption flip tests, fixture map.

The census bits are only meaningful if they flip on broken bytes THROUGH
the same kernel the registered query runs (`column_census_rows`), and the
fixture leaf-column map (the oracle's constant VALUES list) must match
what the files actually contain.
"""

from __future__ import annotations

import glob

import pytest

from columnar_aware_dedup_spark.sources.parquetcensus import (
    FIXTURE_LEAF_COLUMNS,
    column_census_rows,
)

SF = "/root/testdata/sf0.001"


def _read(name: str) -> bytes:
    return open(f"{SF}/{name}", "rb").read()


def test_fixture_leaf_map_matches_files():
    """The oracle's constant (file, column) list is derived from
    FIXTURE_LEAF_COLUMNS — pin it to the real files so a fixture-writer
    change fails here before it fails the driver hash."""
    files = sorted(p.rsplit("/", 1)[-1] for p in glob.glob(f"{SF}/*.parquet"))
    assert files == sorted(FIXTURE_LEAF_COLUMNS)
    for name in files:
        rows = column_census_rows(name, _read(name))
        assert [r["column_name"] for r in rows] == sorted(
            FIXTURE_LEAF_COLUMNS[name]
        ), name


def test_census_verifies_on_clean_files_and_pins_magnitudes():
    for name in sorted(FIXTURE_LEAF_COLUMNS):
        data = _read(name)
        rows = column_census_rows(name, data)
        assert rows, name
        for r in rows:
            assert r["compressed_matches_footer_ok"], r
            assert r["uncompressed_matches_footer_ok"], r
            assert r["dict_at_most_one_ok"], r
            assert 1 <= r["n_pages"]
            assert 0 <= r["n_dict_pages"] <= r["n_pages"]
        # page payloads + headers live inside the file
        assert sum(r["compressed_bytes"] for r in rows) < len(data)


def _first_column_offsets(data: bytes) -> tuple[int, int]:
    """(first page-header offset, data-page offset) of row group 0 col 0."""
    import io

    import pyarrow.parquet as pq

    col = pq.ParquetFile(io.BytesIO(data)).metadata.row_group(0).column(0)
    start = col.data_page_offset
    if col.dictionary_page_offset is not None:
        start = min(start, col.dictionary_page_offset)
    return start, col.data_page_offset


def test_byte_bits_flip_on_corrupted_page_header():
    """Smashing the first page header makes the walk fail or disagree with
    the footer — both byte bits go false for that column, others survive."""
    data = bytearray(_read("region.parquet"))
    start, _ = _first_column_offsets(bytes(data))
    data[start] = 0xFF  # garbage compact-protocol field header
    rows = {
        r["column_name"]: r
        for r in column_census_rows("region.parquet", bytes(data))
    }
    broken = rows["r_regionkey"]  # physical column 0 (the corrupted one)
    assert not broken["compressed_matches_footer_ok"]
    assert not broken["uncompressed_matches_footer_ok"]
    assert rows["r_name"]["compressed_matches_footer_ok"]  # untouched


def test_dict_bit_flips_on_double_dict_page():
    """Rewriting the data page's type enum to DictPage yields two dict
    pages in one column chunk — the format-invariant bit flips while the
    byte totals (unchanged) keep verifying."""
    data = bytearray(_read("region.parquet"))
    _, dp_off = _first_column_offsets(bytes(data))
    # PageHeader first field: id 1 (type, i32) -> compact header 0x15,
    # then zigzag varint of the enum (DataPageV1=0 -> 0x00; DictPage=2 -> 0x04)
    assert data[dp_off : dp_off + 2] == b"\x15\x00", "fixture layout moved"
    data[dp_off + 1] = 0x04
    rows = {
        r["column_name"]: r
        for r in column_census_rows("region.parquet", bytes(data))
    }
    broken = rows["r_regionkey"]  # physical column 0 (the patched one)
    assert not broken["dict_at_most_one_ok"]
    assert broken["compressed_matches_footer_ok"]
    assert broken["uncompressed_matches_footer_ok"]
    assert rows["r_name"]["dict_at_most_one_ok"]


def test_registered_census_matches_oracle(spark, sf_dir):
    from columnar_aware_dedup_spark.sources.parquetcensus import (
        PARQUET_CENSUS_ORACLE,
        parquet_column_census,
    )
    from tests.oracle import compare

    compare(parquet_column_census(spark, sf_dir), PARQUET_CENSUS_ORACLE, sf_dir)


def test_census_full_zero_shuffle_plan(spark, sf_dir):
    """The numeric census is a map-only pass: no exchange anywhere (the
    registered twin adds only the presentation sort)."""
    from columnar_aware_dedup_spark.plans import explain
    from columnar_aware_dedup_spark.sources.parquetcensus import (
        parquet_column_census_full,
    )

    df = parquet_column_census_full(spark, sf_dir)
    assert explain.n_exchanges(df) == 0, explain.plan_string(df)


@pytest.mark.parametrize("codec", ["NONE", "SNAPPY", "ZSTD", "GZIP"])
@pytest.mark.parametrize("dictionary", [True, False])
def test_census_verifies_across_writer_configs(tmp_path, codec, dictionary):
    """Fuzz the walker against pyarrow writer shapes the fixtures never
    produce: multiple row groups, multiple data pages per chunk (tiny
    data_page_size), dictionary on/off, four codecs. Every configuration
    must verify walker-vs-footer exactly — the census claim is about the
    FORMAT, not about one writer's defaults."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        rng = random.Random(codec + str(dictionary))
        n = 5000
        t = pa.table(
            {
                "k": pa.array([rng.randrange(0, 50) for _ in range(n)]),
                "v": pa.array([rng.random() for _ in range(n)]),
                "s": pa.array(
                    [f"row-{rng.randrange(0, 200)}" for _ in range(n)]
                ),
            }
        )
        path = tmp_path / f"fuzz_{codec}_{dictionary}.parquet"
        pq.write_table(
            t,
            path,
            compression=codec,
            use_dictionary=dictionary,
            row_group_size=1200,      # 5 row groups
            data_page_size=2048,      # several pages per chunk
        )
    except (OSError, pa.lib.ArrowNotImplementedError) as e:
        pytest.skip(f"codec {codec} unavailable: {e}")

    rows = column_census_rows(path.name, path.read_bytes())
    assert {r["column_name"] for r in rows} == {"k", "v", "s"}
    for r in rows:
        assert r["compressed_matches_footer_ok"], (codec, dictionary, r)
        assert r["uncompressed_matches_footer_ok"], (codec, dictionary, r)
        assert r["dict_at_most_one_ok"], (codec, dictionary, r)
        # 5 row groups, >=1 page each — the multi-page path really ran
        assert r["n_pages"] >= 5, r
        if dictionary:
            assert r["n_dict_pages"] >= 1, r
        else:
            assert r["n_dict_pages"] == 0, r
