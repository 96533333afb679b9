"""Property-based tests (hypothesis): chunk-cover invariants and dedup edge
cases the example-based goldens don't reach."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators import dedup
from columnar_aware_dedup_spark.sources import chunkers


@settings(max_examples=20, deadline=None)
@given(
    n_rows=st.integers(min_value=1, max_value=5000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    compression=st.sampled_from(["uncompressed", "zlib"]),
)
def test_orc_chunk_cover_property(n_rows, seed, compression):
    """Any ORC file we can write chunks into an exact cover and reassembles
    byte-identically, at both stripe and column granularity."""
    import random

    rng = random.Random(seed)
    tbl = pa.table(
        {
            "a": [rng.randint(-(2**40), 2**40) for _ in range(n_rows)],
            "b": [f"s{rng.randint(0, 999)}" for _ in range(n_rows)],
            "c": [rng.random() for _ in range(n_rows)],
        }
    )
    buf = io.BytesIO()
    orc.write_table(tbl, buf, compression=compression, stripe_size=32 * 1024)
    data = buf.getvalue()
    for chunker in (chunkers.chunk_orc_bytes, chunkers.chunk_orc_columns_bytes):
        chunks = chunker(data)
        pos = 0
        for c in chunks:
            assert c["start"] == pos and c["size"] >= 0
            pos += c["size"]
        assert pos == len(data)
        assert chunkers.reassemble(data, chunks) == data


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_parquet_chunk_cover_property(seed):
    import random

    import pyarrow.parquet as pq

    rng = random.Random(seed)
    n = rng.randint(1, 3000)
    tbl = pa.table(
        {
            "x": [rng.randint(0, 10**9) for _ in range(n)],
            "y": [rng.choice(["aa", "bb", None]) for _ in range(n)],
        }
    )
    buf = io.BytesIO()
    pq.write_table(tbl, buf, row_group_size=max(1, n // 3))
    data = buf.getvalue()
    chunks = chunkers.chunk_parquet_bytes(data)
    assert chunkers.reassemble(data, chunks) == data


def test_shingle_short_doc_parity(spark):
    """Docs with <3 tokens must shingle identically on both engines (ADVICE
    r01: unguarded element_at threw under ANSI mode / silently diverged with
    ANSI off). The guard maps a short doc to its whole text as one shingle."""
    import duckdb

    from columnar_aware_dedup_spark.operators.text import (
        _SHINGLES_SPARK,
        _SHINGLES_SQL,
    )

    docs = ["", "one", "one two", "one two three", "a b c d e", "x x x x"]
    sdf = spark.createDataFrame([(d,) for d in docs], ["text"]).selectExpr(
        "text", "split(text, ' ') AS toks"
    )
    spark_out = {
        r["text"]: sorted(r["sh"])
        for r in sdf.selectExpr("text", f"{_SHINGLES_SPARK} AS sh").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(d,) for d in docs])
    duck_out = {
        text: sorted(sh)
        for text, sh in con.execute(
            "SELECT text, "
            + _SHINGLES_SQL.replace("toks", "string_split(text, ' ')")
            + " FROM t"
        ).fetchall()
    }
    con.close()
    assert spark_out == duck_out
    assert spark_out["one two"] == ["one two"]  # whole-text single shingle
    assert len(spark_out["a b c d e"]) == 3


def test_empty_store_all_miss(spark, sf_dir):
    """Cutoff before the earliest order => empty store => zero dedup
    (the first-transfer scenario, README.md:73-74)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    incoming = dedup.lineitem_chunks(li)
    empty_store = incoming.filter(F.lit(False))
    classified = dedup.dedup_classify(incoming, empty_store)
    assert classified.filter(F.col("hit")).count() == 0


def test_chunk_table_and_fast_path_agree(spark, sf_dir):
    """The spec formulation (unpivot -> groupBy) and the optimized
    narrow-first formulation must produce identical chunk tables."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spec = dedup.chunk_table(dedup.unpivot_lineitem(li))
    fast = dedup.lineitem_chunks(li)
    assert spec.exceptAll(fast).count() == 0
    assert fast.exceptAll(spec).count() == 0


def test_repetition_score_planted_docs(spark):
    """Repetition fractions on hand-computable docs, both engines; the
    fixture corpus has no repetitive docs, so the drop branch and the
    short-doc guards are only exercised here."""
    import duckdb

    from columnar_aware_dedup_spark.operators.text import (
        _DUP_FRAC_SPARK,
        _DUP_FRAC_SQL,
        _TOP_FRAC_SPARK,
        _TOP_FRAC_SQL,
        _grams_spark,
        _grams_sql,
    )

    docs = [
        "",                          # empty -> all-zero fractions
        "one",                       # 1 token: no bigrams
        "spam spam spam spam spam",  # fully repetitive: top=1.0, dup=1.0
        "a b c d e f",               # all distinct: top=1/5, dup=0
        "a b a b a b x",             # 'a b' 3 of 6 bigrams
    ]
    sdf = spark.createDataFrame([(d,) for d in docs], ["text"]).selectExpr(
        "text", "split(text, ' ') AS toks"
    )
    got = {
        r["text"]: (r["topf"], r["dupf"])
        for r in sdf.selectExpr(
            "text",
            f"{_TOP_FRAC_SPARK.format(gs=_grams_spark(2))} AS topf",
            f"{_DUP_FRAC_SPARK.format(gs=_grams_spark(3))} AS dupf",
        ).collect()
    }
    assert got[""] == (0.0, 0.0)
    assert got["one"] == (0.0, 0.0)
    assert got["spam spam spam spam spam"] == (1.0, 1.0)
    assert got["a b c d e f"] == (0.2, 0.0)
    assert got["a b a b a b x"][0] == 0.5  # 'a b' x3 of 6 bigrams

    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(d,) for d in docs])
    duck = {
        text: (topf, dupf)
        for text, topf, dupf in con.execute(
            "SELECT text, "
            + _TOP_FRAC_SQL.format(gs=_grams_sql(2)).replace(
                "toks", "string_split(text, ' ')"
            )
            + ", "
            + _DUP_FRAC_SQL.format(gs=_grams_sql(3)).replace(
                "toks", "string_split(text, ' ')"
            )
            + " FROM t"
        ).fetchall()
    }
    con.close()
    assert duck == got


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=1,
        max_size=512,
    )
)
def test_wav_codec_roundtrips_any_pcm(samples):
    """write_wav -> parse_wav is the identity on arbitrary 16-bit PCM."""
    from columnar_aware_dedup_spark.functions import audiocodec

    rate, ch, bits, out = audiocodec.parse_wav(audiocodec.write_wav(samples))
    assert (rate, ch, bits) == (8000, 1, 16)
    assert out.tolist() == samples


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=20000),
    rep=st.integers(min_value=1, max_value=6),
)
def test_cdc_kernel_properties(data, rep):
    """FastCDC invariants on ARBITRARY bytes (incl. highly repetitive ones
    hypothesis shrinks toward, the Gear hash's worst case): the vectorized
    kernel judges identically to the scalar rolling definition, and the
    resulting cover is gap-free with every bound honored."""
    from columnar_aware_dedup_spark.sources.cdc import (
        _MAX,
        _MIN,
        cdc_cut_points,
        chunk_cdc_bytes,
    )
    from tests.test_cdc import _scalar_cuts

    blob = data * rep
    assert cdc_cut_points(blob) == _scalar_cuts(blob)
    chunks = chunk_cdc_bytes(blob)
    assert b"".join(
        blob[c["start"] : c["start"] + c["size"]] for c in chunks
    ) == blob
    sizes = [c["size"] for c in chunks]
    if blob:
        assert max(sizes) <= _MAX
        assert all(s >= _MIN for s in sizes[:-1])
    else:
        assert chunks == [] or sizes == [0]


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=400),
)
def test_passage_arithmetic_covers_any_length(n):
    """The passage count/slice arithmetic reconstructs a doc of ANY token
    count: stride-prefixes of all but the last window plus the last window
    equal the token stream, with every non-final window full-width."""
    from columnar_aware_dedup_spark.operators.curation import (
        _PASSAGE_S,
        _PASSAGE_W,
    )

    toks = [f"t{i}" for i in range(n)]
    if n <= _PASSAGE_W:
        starts = [0]
    else:
        p = 1 + (n - _PASSAGE_W + _PASSAGE_S - 1) // _PASSAGE_S
        starts = [i * _PASSAGE_S for i in range(p)]
    windows = [toks[s : s + _PASSAGE_W] for s in starts]
    rebuilt = []
    for w in windows[:-1]:
        rebuilt.extend(w[:_PASSAGE_S])
    rebuilt.extend(windows[-1])
    assert rebuilt == toks
    assert all(len(w) == _PASSAGE_W for w in windows[:-1])


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_hex_sum_engines_agree_on_any_value(payload):
    """The cross-format value signature folds the first 14 md5 hex chars
    into an integer via Spark ``conv(h, 16, 10)`` on one side and DuckDB
    ``CAST('0x' || h AS BIGINT)`` on the other. Pin the two conversions
    (and the 56-bit no-overflow assumption) to each other for arbitrary
    payloads — a silent divergence here would desynchronize every
    signature downstream."""
    import duckdb
    import hashlib

    h = hashlib.md5(payload).hexdigest()[:14]
    expect = int(h, 16)
    got = duckdb.connect().execute(
        f"SELECT CAST(('0x' || '{h}') AS BIGINT)"
    ).fetchone()[0]
    assert got == expect
    assert expect < 2**63  # 14 hex chars always fit a signed BIGINT


def test_hex_sum_spark_side_matches_python(spark):
    """Spark half of the same pin: conv+DECIMAL over a handful of known
    md5 prefixes must equal Python's int(h, 16) (hypothesis drives the
    DuckDB half; one Spark job covers the engine half without paying a
    session per example)."""
    import hashlib

    vals = [hashlib.md5(bytes([i])).hexdigest()[:14] for i in range(32)]
    df = spark.createDataFrame([(v,) for v in vals], "h string").select(
        F.conv("h", 16, 10).cast("decimal(38,0)").cast("string").alias("n")
    )
    assert [r["n"] for r in df.collect()] == [str(int(v, 16)) for v in vals]
