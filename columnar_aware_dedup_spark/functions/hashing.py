"""Canonicalization + content-signature helpers.

The reference signs every chunk with SHA-1 over raw bytes
(``/root/reference/src/main/java/vmware/speedup/cawd/dedup/ChunkingAlgorithm.java:13-18``).
Our chunks are *sets of column values*, so the signature must be computed over
a canonical, deterministic string rendering that Spark and the DuckDB oracle
agree on byte-for-byte. Rules (FIXTURES.md "Determinism rules"):

- hash = ``md5`` (Spark ``F.md5`` == DuckDB ``md5``; SHA-1 is not in DuckDB core);
- doubles go through ``DECIMAL(28,6)`` first — fixed-scale rendering sidesteps
  shortest-round-trip float formatting differences AND makes aggregation exact
  (decimal sums are associative, so Spark's partial/final agg order can't
  perturb the value);
- multiset hashing = md5 over the ','-joined *sorted* value list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark dtypes that need fixed-point canonicalization before hashing.
_FLOATY = ("double", "float")


def canon_col(name: str, dtype: str) -> Column:
    """Canonical string rendering of a column (Spark side)."""
    col = F.col(name)
    if dtype in _FLOATY:
        col = col.cast("decimal(28,6)")
    return col.cast("string")


def canon_sql(name: str, dtype: str) -> str:
    """Canonical string rendering of a column (DuckDB oracle side).

    Must produce the same bytes as :func:`canon_col` for every value in the
    fixtures (verified by ``tests/test_canon.py``).
    """
    if dtype in _FLOATY:
        return f"CAST(CAST({name} AS DECIMAL(28,6)) AS VARCHAR)"
    return f"CAST({name} AS VARCHAR)"


def row_signature(cols: list[tuple[str, str]], sep: str = "|") -> Column:
    """md5 over the '|'-joined canonical rendering of one row's columns.

    Spark analogue of signing a row-chunk; NULLs render as the literal
    ``'\\N'`` so ``(NULL, 'a')`` and ``('a', NULL)`` differ. Matches
    :func:`row_signature_sql`.
    """
    parts = [F.coalesce(canon_col(n, t), F.lit("\\N")) for n, t in cols]
    return F.md5(F.concat_ws(sep, *parts))


def row_signature_sql(cols: list[tuple[str, str]], sep: str = "|") -> str:
    parts = [f"COALESCE({canon_sql(n, t)}, '\\N')" for n, t in cols]
    joined = f" || '{sep}' || ".join(parts)
    return f"md5({joined})"


def multiset_signature(value_col: str = "val") -> Column:
    """md5 of the sorted, ','-joined values of a group (chunk signature).

    Spark: ``md5(array_join(array_sort(collect_list(val)), ','))``
    DuckDB: ``md5(string_agg(val, ',' ORDER BY val))``
    """
    return F.md5(F.array_join(F.array_sort(F.collect_list(value_col)), ","))


def multiset_signature_sql(value_expr: str = "val") -> str:
    return f"md5(string_agg({value_expr}, ',' ORDER BY {value_expr}))"


def exact_sum(name: str) -> Column:
    """Deterministic double aggregation: sum in DECIMAL, surface as DOUBLE.

    Plain ``SUM(double)`` is order-dependent in the last ulps (Spark partial
    aggregation vs DuckDB's single-threaded sum), which breaks value-hash
    parity. Decimal sums are exact, and the final decimal->double conversion
    is deterministic on both engines.
    """
    return F.sum(F.col(name).cast("decimal(28,6)")).cast("double")


def exact_sum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
