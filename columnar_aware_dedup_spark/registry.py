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


def reorder(priority: list[str]) -> None:
    """Rebuild the registry dicts with ``priority`` names first, in order.

    The driver records CORRECTNESS rows for the first N registered queries in
    dict order, so registration order is part of the driver contract: the
    priority window must hold the queries whose driver verification matters
    most (the dedup core, every LLM-pipeline operator, the TPC-H macros);
    the long tail of scalar-function variants stays registered — and covered
    by ``tests/test_registry_oracles.py`` — behind them.
    """
    missing = [n for n in priority if n not in QUERIES]
    if missing:
        raise ValueError(f"priority list names unregistered queries: {missing}")
    if len(set(priority)) != len(priority):
        raise ValueError("priority list contains duplicates")
    rest = [n for n in QUERIES if n not in set(priority)]
    for order in (priority, rest):
        for n in order:
            QUERIES[n] = QUERIES.pop(n)
            if n in ORACLES:
                ORACLES[n] = ORACLES.pop(n)
