"""Structural chunker goldens (ports of the reference's implicit checks):

1. chunk coverage / round-trip identity — reassembled chunks byte-equal the
   input (``main/TestMain.java:48-59``);
2. re-transfer of an identical copy dedups all content chunks
   (``README.md:66-78``).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from columnar_aware_dedup_spark.sources import chunkers


@pytest.fixture(scope="module")
def orc_bytes(tmp_path_factory, sf_dir):
    """lineitem as a multi-stripe ORC file (the reference's native format)."""
    out = tmp_path_factory.mktemp("orc") / "lineitem.orc"
    tbl = duckdb.sql(f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')").arrow()
    orc.write_table(tbl, str(out), stripe_size=64 * 1024)
    return out.read_bytes()


def _assert_cover(chunks, n):
    pos = 0
    for c in chunks:
        assert c["start"] == pos, f"gap/overlap at {pos}: {c}"
        pos += c["size"]
    assert pos == n


def test_orc_roundtrip(orc_bytes):
    chunks = chunkers.chunk_orc_bytes(orc_bytes)
    assert sum(1 for c in chunks if c["chunk_type"] == "Data") >= 2  # multi-stripe
    _assert_cover(chunks, len(orc_bytes))
    assert chunkers.reassemble(orc_bytes, chunks) == orc_bytes


def test_orc_zlib_footer(sf_dir):
    """ZLIB-compressed footers go through the ORC block decoder."""
    tbl = pa.table({"a": list(range(50000)), "b": [f"v{i}" for i in range(50000)]})
    import io as _io

    buf = _io.BytesIO()
    orc.write_table(tbl, buf, compression="zlib", stripe_size=64 * 1024)
    data = buf.getvalue()
    chunks = chunkers.chunk_orc_bytes(data)
    _assert_cover(chunks, len(data))
    assert chunkers.reassemble(data, chunks) == data


def test_parquet_roundtrip(sf_dir):
    data = open(f"{sf_dir}/lineitem.parquet", "rb").read()
    chunks = chunkers.chunk_parquet_bytes(data)
    kinds = [c["chunk_type"] for c in chunks]
    # page granularity (r03): every page header + payload its own chunk,
    # no ColumnChunk fallback on a well-formed file.
    assert kinds.count("PageHeader") >= 11
    assert kinds.count("DataPageV1") + kinds.count("DataPageV2") >= 11
    assert kinds.count("DictPage") >= 1  # deduped, unlike the ref (§8.10)
    assert "ColumnChunk" not in kinds
    assert kinds[0] == "ParquetHeader" and kinds[-1] == "AfterFooter"
    _assert_cover(chunks, len(data))
    assert chunkers.reassemble(data, chunks) == data


def test_parquet_page_walk_stress():
    """The Thrift compact-protocol page walker must handle v1/v2 data pages,
    every common codec, multi-row-group layouts, and page indexes without
    falling back to column-chunk granularity."""
    import io as _io

    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "a": list(range(60000)),
            "b": [f"s{i % 997}" for i in range(60000)],
            "c": [float(i) for i in range(60000)],
        }
    )
    cases = [
        dict(compression="snappy", data_page_size=8 * 1024, row_group_size=20000),
        dict(
            compression="zstd",
            data_page_version="2.0",
            data_page_size=4 * 1024,
            row_group_size=15000,
        ),
        dict(compression="none", use_dictionary=False, data_page_size=16 * 1024),
        dict(compression="gzip", write_page_index=True, row_group_size=10000),
    ]
    for kw in cases:
        buf = _io.BytesIO()
        pq.write_table(tbl, buf, **kw)
        data = buf.getvalue()
        chunks = chunkers.chunk_parquet_bytes(data)
        kinds = {c["chunk_type"] for c in chunks}
        assert "ColumnChunk" not in kinds, (kw, kinds)
        assert "PageHeader" in kinds
        _assert_cover(chunks, len(data))
        assert chunkers.reassemble(data, chunks) == data


def test_parquet_page_walk_falls_back_on_garbage():
    """A column chunk whose page walk fails must degrade to one ColumnChunk
    span (never a broken cover): simulate by walking garbage bytes."""
    import pytest as _pytest

    from columnar_aware_dedup_spark.functions import parquetmeta

    with _pytest.raises((ValueError, IndexError)):
        parquetmeta.page_spans(b"\xff" * 64, 0, 64)


def test_orc_column_chunks_roundtrip(orc_bytes):
    """Stripe+column mode: per-column spans cover each stripe's data region
    exactly and the whole file reassembles byte-identically."""
    chunks = chunkers.chunk_orc_columns_bytes(orc_bytes)
    col_chunks = [c for c in chunks if c["chunk_type"] == "Column"]
    assert len(col_chunks) >= 2 * 11, "expect per-column chunks per stripe"
    assert len({c["column_name"] for c in col_chunks}) >= 11
    _assert_cover(chunks, len(orc_bytes))
    assert chunkers.reassemble(orc_bytes, chunks) == orc_bytes


def test_orc_column_level_dedup_on_modified_file(sf_dir):
    """Change one column's values: other columns' chunks still dedup
    (the point of the s+p mode — ``StripePlusColumnORCStreamer.java:130-209``)."""
    import io as _io

    base_tbl = duckdb.sql(
        f"SELECT l_orderkey, l_partkey, l_returnflag FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') ORDER BY l_orderkey, l_partkey, l_linenumber"
    ).arrow()
    mod_tbl = duckdb.sql(
        f"SELECT l_orderkey, l_partkey + 7 AS l_partkey, l_returnflag FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') ORDER BY l_orderkey, l_partkey, l_linenumber"
    ).arrow()
    bufs = []
    for t in (base_tbl, mod_tbl):
        b = _io.BytesIO()
        orc.write_table(t, b, stripe_size=512 * 1024)
        bufs.append(b.getvalue())
    store = {
        c["signature"]
        for c in chunkers.chunk_orc_columns_bytes(bufs[0])
        if c["chunk_type"] == "Column"
    }
    incoming = [
        c
        for c in chunkers.chunk_orc_columns_bytes(bufs[1])
        if c["chunk_type"] == "Column"
    ]
    hits = [c for c in incoming if c["signature"] in store]
    misses = [c for c in incoming if c["signature"] not in store]
    assert hits, "unchanged columns should dedup"
    assert misses, "modified column should miss"


def test_overlapping_spans_rejected():
    """Malformed metadata declaring intersecting spans must raise, not
    silently duplicate bytes on reassembly (ADVICE r01)."""
    spans = [
        {"chunk_type": "A", "column_name": None, "start": 0, "size": 10},
        {"chunk_type": "B", "column_name": None, "start": 5, "size": 10},
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunkers._gap_fill(spans, 20)
    with pytest.raises(ValueError, match="EOF"):
        chunkers._gap_fill(
            [{"chunk_type": "A", "column_name": None, "start": 0, "size": 99}], 20
        )


def test_corrupt_parquet_footer_rejected():
    """A tail declaring an impossible footer length must be a clean parse
    error, not a negative-index span (ADVICE r01)."""
    bogus = b"PAR1" + b"\x00" * 16 + (2**31 - 1).to_bytes(4, "little") + b"PAR1"
    with pytest.raises(ValueError, match="footer length"):
        chunkers.chunk_parquet_bytes(bogus)


def test_spark_reconstruction_query(spark, sf_dir):
    from columnar_aware_dedup_spark.sources.chunkers import parquet_reconstruction

    rows = parquet_reconstruction(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["identical"] for r in rows)


def test_identical_copy_fully_dedups(orc_bytes):
    """Second transfer of the same file: every content chunk hits the store
    (the README.md:75-78 scenario: TransferBytes collapses to overhead)."""
    first = chunkers.chunk_orc_bytes(orc_bytes)
    store = {c["signature"] for c in first}
    second = chunkers.chunk_orc_bytes(orc_bytes)
    assert all(c["signature"] in store for c in second)


def test_modified_file_partial_dedup(orc_bytes, sf_dir):
    """A file with one extra stripe of data still dedups its unchanged
    stripes (hierarchical value of structural chunking)."""
    tbl = duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).arrow()
    import io as _io

    buf = _io.BytesIO()
    orc.write_table(
        pa.concat_tables([tbl, tbl.slice(0, 500)]), buf, stripe_size=64 * 1024
    )
    modified = buf.getvalue()
    # same writer params => common prefix stripes are byte-identical
    base_io = _io.BytesIO()
    orc.write_table(tbl, base_io, stripe_size=64 * 1024)
    base = base_io.getvalue()

    store = {c["signature"] for c in chunkers.chunk_orc_bytes(base)}
    incoming = [
        c for c in chunkers.chunk_orc_bytes(modified) if c["chunk_type"] == "Data"
    ]
    hits = [c for c in incoming if c["signature"] in store]
    assert hits, "expected at least one deduped stripe"


def test_binary_transfer_simulation(spark, sf_dir, tmp_path, orc_bytes):
    """Distributed binary dedup session (the README.md:66-78 golden, as one
    Spark job): warm store from snapshot A; incoming = identical copy + a
    genuinely new file. The copy's content chunks must all hit; totals must
    show real byte elimination."""
    import io as _io

    from pyspark.sql import functions as SF

    from columnar_aware_dedup_spark.operators.dedup import dedup_classify
    from columnar_aware_dedup_spark.sources.chunkers import (
        binary_transfer_stats,
        chunk_files,
    )

    store_dir = tmp_path / "store_files"
    in_dir = tmp_path / "incoming_files"
    store_dir.mkdir()
    in_dir.mkdir()
    (store_dir / "snap_a.orc").write_bytes(orc_bytes)
    (in_dir / "copy_of_a.orc").write_bytes(orc_bytes)
    new_tbl = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    ).arrow()
    buf = _io.BytesIO()
    orc.write_table(new_tbl, buf, stripe_size=64 * 1024)
    (in_dir / "brand_new.orc").write_bytes(buf.getvalue())

    rollup = {
        r["chunk_type"]: r
        for r in binary_transfer_stats(
            spark, str(store_dir), str(in_dir), glob="*.orc"
        ).collect()
    }
    assert rollup["Column"]["dedup_bytes"] > 0
    assert rollup["Column"]["transfer_bytes"] > 0  # the new file must miss

    # per-file: the identical copy's column chunks all hit
    store = chunk_files(spark, str(store_dir), "*.orc", "columns").select(
        "signature"
    )
    incoming = chunk_files(spark, str(in_dir), "*.orc", "columns")
    classified = dedup_classify(incoming, store)
    copy_misses = classified.filter(
        SF.col("file").contains("copy_of_a") & ~SF.col("hit")
    ).count()
    assert copy_misses == 0


def test_spark_chunk_files(spark, sf_dir):
    """Distributed chunker: chunk every fixture parquet via mapInPandas."""
    chunks = chunkers.chunk_files(spark, sf_dir, glob="*.parquet").cache()
    per_file = {
        r["file"].rsplit("/", 1)[-1]: r["total"]
        for r in chunks.groupBy("file")
        .agg({"size": "sum"})
        .withColumnRenamed("sum(size)", "total")
        .collect()
    }
    import os

    for name, total in per_file.items():
        assert total == os.path.getsize(f"{sf_dir}/{name}")
    assert len(per_file) == 10
    chunks.unpersist()


def test_orc_walker_handles_spark_written_files(spark, sf_dir, tmp_path):
    """The from-scratch ORC walker must parse files from the JAVA ORC writer
    (Spark's), not just pyarrow's C++ writer — different postscript layout,
    stripe planning, and codec defaults. Structural chunking, column-stream
    spans, and byte-identical reassembly all have to hold per codec."""
    import glob as _glob

    from columnar_aware_dedup_spark.functions import orcmeta
    from columnar_aware_dedup_spark.io import table

    df = table(spark, sf_dir, "supplier")
    for codec in ("snappy", "zlib", "none"):
        out = tmp_path / f"orc_{codec}"
        df.coalesce(1).write.option("compression", codec).orc(str(out))
        (path,) = _glob.glob(str(out / "*.orc"))
        data = open(path, "rb").read()
        chunks = chunkers.chunk_orc_bytes(data)
        assert any(c["chunk_type"] == "Data" for c in chunks), codec
        _assert_cover(chunks, len(data))
        assert chunkers.reassemble(data, chunks) == data, codec
        # column-stream walk: spans must be in-bounds and non-overlapping
        structure = orcmeta.read_orc_structure(data)
        assert structure.stripes, codec
        col_chunks = chunkers.chunk_orc_columns_bytes(data)
        _assert_cover(col_chunks, len(data))
        assert chunkers.reassemble(data, col_chunks) == data, codec


def test_parquet_walker_handles_spark_written_files(spark, sf_dir, tmp_path):
    """The Thrift compact-protocol page walker must handle parquet-mr output
    (Spark's Java writer) — different header layout/encodings than the
    pyarrow-written fixtures — at page granularity, per codec."""
    import glob as _glob

    from columnar_aware_dedup_spark.io import table

    df = table(spark, sf_dir, "supplier")
    for codec in ("snappy", "gzip", "zstd", "none"):
        out = tmp_path / f"pq_{codec}"
        df.coalesce(1).write.option("compression", codec).parquet(str(out))
        (path,) = _glob.glob(str(out / "*.parquet"))
        data = open(path, "rb").read()
        chunks = chunkers.chunk_parquet_bytes(data)
        kinds = {c["chunk_type"] for c in chunks}
        assert "ColumnChunk" not in kinds, (
            f"{codec}: page walk fell back to column-chunk spans"
        )
        assert any(k.startswith("DataPage") for k in kinds), (codec, kinds)
        _assert_cover(chunks, len(data))
        assert chunkers.reassemble(data, chunks) == data, codec


def test_parquet_walker_handles_duckdb_written_files(sf_dir, tmp_path):
    """Third writer family: DuckDB's own parquet writer (independent of
    pyarrow and parquet-mr). Page-granularity walk + byte-identical
    reassembly per codec."""
    for codec in ("snappy", "zstd", "gzip", "uncompressed"):
        out = tmp_path / f"duck_{codec}.parquet"
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/supplier.parquet')) "
            f"TO '{out}' (FORMAT parquet, COMPRESSION {codec})"
        )
        data = out.read_bytes()
        chunks = chunkers.chunk_parquet_bytes(data)
        kinds = {c["chunk_type"] for c in chunks}
        assert "ColumnChunk" not in kinds, (codec, kinds)
        _assert_cover(chunks, len(data))
        assert chunkers.reassemble(data, chunks) == data, codec


def test_inventory_bits_flip(spark):
    """Falsifiability for the r08 `file_inventory` R→H promotion: corrupt
    each scan fact and the matching certificate bit goes false through
    `inventory_bits` itself; an honest fact row passes all four."""
    from columnar_aware_dedup_spark.sources.binaryfile import inventory_bits

    def bits(rows):
        facts = spark.createDataFrame(
            rows,
            "file_name string, length long, n_bytes long, "
            "head4 string, tail4 string",
        )
        return inventory_bits(facts).collect()[0]

    good = bits([("region.parquet", 100, 100, "PAR1", "PAR1")])
    assert (
        good.scan_nonempty_ok
        and good.length_equals_bytes_read_ok
        and good.parquet_magic_ok
        and good.ext_filter_ok
    )

    empty = bits([("region.parquet", 0, 0, "PAR1", "PAR1")])
    assert not empty.scan_nonempty_ok

    short_read = bits([("region.parquet", 100, 96, "PAR1", "PAR1")])
    assert not short_read.length_equals_bytes_read_ok

    not_parquet = bits([("region.parquet", 100, 100, "ORC\x00", "PAR1")])
    assert not not_parquet.parquet_magic_ok
    truncated = bits([("region.parquet", 100, 100, "PAR1", "\x00\x00\x00\x00")])
    assert not truncated.parquet_magic_ok

    leaked = bits([("region.orc", 100, 100, "PAR1", "PAR1")])
    assert not leaked.ext_filter_ok


def test_file_inventory_full_matches_certificate_files(spark, sf_dir):
    """The numeric twin lists exactly the certificate's constant file set,
    with the real on-disk byte sizes."""
    import os

    from columnar_aware_dedup_spark.sources.binaryfile import (
        file_inventory_full,
    )
    from columnar_aware_dedup_spark.sources.chunkers import FIXTURE_TABLES

    rows = {r["file_name"]: r["length"] for r in file_inventory_full(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.parquet" for t in FIXTURE_TABLES}
    for name, length in rows.items():
        assert length == os.path.getsize(os.path.join(sf_dir, name))
