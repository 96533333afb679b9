"""The commit-marker protocol's shared machinery: attempt-tagged partial
tables, a commits table appended last, committed-only reads, and a
debris sweep — ONE copy serving every multi-table maintainer
(``streaming/sketches.py`` originated the protocol for the CMS/HLL
tables; ``streaming/bm25.py`` adopted it for the BM25 index; any future
index whose merge spans several plain-parquet tables plugs in here).

The protocol: plain parquet gives no cross-table atomicity, so every row
of a merge carries a fresh ``attempt_id`` and readers only honor rows
whose attempt reached the commits table — the single-table publication
point. A crash between appends leaves invisible debris; the sweep
physically reclaims it at the next merge."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def committed_rows(
    spark: SparkSession, table: str, commits_table: str
) -> DataFrame:
    """``table`` rows restricted to COMMITTED attempts (the broadcast
    semi-join every reader of a protocol-guarded table goes through)."""
    return spark.table(table).join(
        F.broadcast(spark.table(commits_table)), "attempt_id", "left_semi"
    )


def sweep_uncommitted(
    spark: SparkSession, tables: list[str], commits_table: str
) -> int:
    """Physically remove crash debris from ``tables``: rows whose
    ``attempt_id`` never reached ``commits_table``. Call under the store
    lock at the start of a merge. Debris is invisible to readers
    regardless (the commits semi-join), so this is a space reclaim, not a
    correctness step — but without it an often-crashing writer accretes
    dead rows forever. The rewrite localCheckpoints the committed subset
    first (materialize-before-overwrite: Spark cannot overwrite a table
    from a plan still reading it), then overwrites in place through
    ``insertInto``, which honors any catalog bucketing spec; a crash
    mid-overwrite loses only already-invisible rows plus committed rows
    the NEXT stream replay re-derives under a fresh attempt. Returns
    debris rows removed."""
    removed = 0
    commits = F.broadcast(spark.table(commits_table))
    for name in tables:
        tbl = spark.table(name)
        n_debris = tbl.join(commits, "attempt_id", "left_anti").count()
        if not n_debris:
            continue
        kept = tbl.join(commits, "attempt_id", "left_semi").localCheckpoint(
            eager=True
        )
        kept.select(*tbl.columns).write.format("parquet").mode(
            "overwrite"
        ).insertInto(name, overwrite=True)
        spark.catalog.refreshTable(name)
        removed += n_debris
    return removed
