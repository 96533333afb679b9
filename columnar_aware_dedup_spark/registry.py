"""Query registry: the single source of truth for ``__spark_entry__.py``.

Every operator module registers its runnable queries here with
:func:`register`. A query is a callable ``(spark, sf_dir) -> DataFrame``;
when an ANSI-SQL oracle string is supplied the driver hash-checks the Spark
result against DuckDB at sf0.01 (H check); without one the driver records a
weaker rows-only check (R) — reserve that for genuinely non-SQL-expressible
ops (float-ranked ANN, seeded MinHash, pandas-UDF chunkers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add ``fn`` to the query registry under ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent; alias every computed
    column identically on both sides (the driver sorts columns by name before
    hashing values).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
