"""Distributed gaps-and-islands over a monotonic sequence column.

The CDC engine's audit primitive: given the set of LSNs (or event ids)
actually applied, report the contiguous runs present and the holes between
them — the check a binlog consumer runs to prove it missed nothing
(reference analog: the harness's from-scratch/continuity decision around
complaints/ccdb/index_ccdb.py — it rebuilds when continuity is in doubt;
this engine measures the discontinuity instead).

The classic single-window formulation (``seq - row_number() OVER (ORDER BY
seq)``) is a total order — one reducer at scale. This is the two-level
distributed form:

1. rows are hash-free range-blocked by ``floor(seq / block_size)`` so the
   row_number window is PARTITIONED (parallel, no global sort of the data);
2. block-local islands (at most gaps + blocks of them — orders of magnitude
   fewer rows than the input) are then merged where they abut across block
   seams with one tiny ordered pass over the island summaries.

Step 2's global window runs over island summaries only, which is exactly
the audit's output size; a 10^10-row sequence with a thousand holes makes
step 2 a thousand-row job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sequence_islands(df: DataFrame, seq_col: str, block_size: int = 1 << 20) -> DataFrame:
    """Contiguous runs of ``seq_col`` (distinct integers) with the gap to
    the next run: ``(island_start, island_end, n_present, gap_to_next)``,
    one row per maximal contiguous island, ``gap_to_next = 0`` on the last.
    """
    seq = F.col(seq_col)
    blocked = df.select(seq.cast("long").alias("_seq")).withColumn(
        "_block", F.floor(F.col("_seq") / block_size)
    )
    w_blk = W.partitionBy("_block").orderBy("_seq")
    local = (
        blocked.withColumn("_grp", F.col("_seq") - F.row_number().over(w_blk))
        .groupBy("_block", "_grp")
        .agg(
            F.min("_seq").alias("island_start"),
            F.max("_seq").alias("island_end"),
            F.count(F.lit(1)).alias("n_present"),
        )
    )
    # seam merge: islands abut iff start == previous end + 1 (only possible
    # across block boundaries — within a block islands are maximal)
    w_all = W.orderBy("island_start")
    w_run = W.orderBy("island_start").rowsBetween(W.unboundedPreceding, W.currentRow)
    runs = local.withColumn(
        "_new",
        F.when(
            F.col("island_start")
            == F.lag("island_end").over(w_all) + F.lit(1),
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn("_run", F.sum("_new").over(w_run))
    merged = runs.groupBy("_run").agg(
        F.min("island_start").alias("island_start"),
        F.max("island_end").alias("island_end"),
        F.sum("n_present").alias("n_present"),
    )
    w_gap = W.orderBy("island_start")
    return merged.select(
        "island_start",
        "island_end",
        "n_present",
        F.coalesce(
            F.lead("island_start").over(w_gap) - F.col("island_end") - 1,
            F.lit(0),
        ).alias("gap_to_next"),
    )
