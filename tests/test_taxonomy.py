"""TransferStats taxonomy goldens.

Pins the README worked-example *shape* (``/root/reference/README.md:73-78``):
re-transferring content the store has already seen collapses TransferBytes to
pure protocol overhead while DedupBytes carries the full content size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators import taxonomy


def _per_file_vals(spark, sf_dir):
    pf = taxonomy._per_file(spark, sf_dir)
    return pf.select("file_id", "in_a", "stripe_hit", *taxonomy._stat_exprs())


def test_retransfer_collapses_to_overhead(spark, sf_dir):
    """Snapshot-A files are byte-identical on re-transfer: every one is a
    stripe hit + footer hit, so TransferBytes == two 24 B offers and
    DedupBytes == the whole file (the ``copy-of-o1.orc`` log line)."""
    vals = _per_file_vals(spark, sf_dir).filter(F.col("in_a"))
    n = vals.count()
    assert n > 0
    collapsed = vals.filter(
        (F.col("StripeHit") == 1)
        & (F.col("FooterHit") == 1)
        & (F.col("TransferBytes") == 2 * taxonomy.OFFER_BYTES)
        & (F.col("DedupBytes") == F.col("FileBytes"))
    ).count()
    assert collapsed == n, f"{n - collapsed}/{n} store files did not fully dedup"


def test_new_file_pays_content_plus_overhead(spark, sf_dir):
    """A stripe-missed file with zero column hits ships the whole stripe:
    TransferBytes >= FileBytes (content + protocol framing) minus any footer
    dedup, and StripeMiss is counted exactly for the all-failed branch
    (``StripePlusColumnORCStreamer.java:216-238``)."""
    vals = _per_file_vals(spark, sf_dir).filter(~F.col("in_a"))
    bad = vals.filter(
        (F.col("StripeMiss") == 1)
        & (
            F.col("TransferBytes")
            < F.col("StripeSize") + taxonomy.WHOLE_STRIPE_HDR
        )
    ).count()
    assert bad == 0


def test_taxonomy_internal_consistency(spark, sf_dir):
    """Cross-stat invariants: TotalBytes decomposes, stripe hit/miss/partial
    partition the file population, and per-type column counters never exceed
    the type-agnostic ones."""
    rows = {
        r["stat_type"]: r["total"]
        for r in taxonomy.transfer_stats_taxonomy(spark, sf_dir).collect()
    }
    n_files = _per_file_vals(spark, sf_dir).count()
    assert len(rows) == 21  # full reference taxonomy (TransferStats.java:86-108)
    # modeled time stats: per-file sums of ceil(bytes/rate) bound the totals.
    assert rows["TransferTime"] >= rows["TotalBytes"] // taxonomy.WIRE_BYTES_PER_MS
    assert rows["ParsingOverhead"] >= rows["FileBytes"] // taxonomy.PARSE_BYTES_PER_MS
    assert rows["TotalBytes"] == rows["TransferBytes"] + rows["ExtraTransferBytes"]
    assert rows["StripeHit"] + rows["StripeMiss"] <= n_files  # partial-hit files count neither
    assert rows["DoubleColumnHit"] <= rows["ColumnHit"]
    assert rows["DoubleColumnMiss"] + rows["StringColumnMiss"] <= rows["ColumnMiss"]
    assert rows["FooterHit"] + rows["FooterMiss"] == n_files
    assert rows["FileBytes"] == rows["StripeSize"] + rows["FooterSize"]
