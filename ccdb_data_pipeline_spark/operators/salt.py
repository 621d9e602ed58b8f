"""Skew handling: hot-key detection, salted repartition, AQE configuration.

The change stream's conv_id distribution is Zipf (FIXTURES.md: top key >=5%
of events). Three layers of defense, in the order they engage:

1. The LWW dedup is a partial-aggregating groupBy (operators/dedupe.py) —
   map-side combine collapses hot-key duplicates BEFORE the shuffle, so the
   reducer for a hot (conv_id, turn_idx) receives <= one row per map task.
   This is structurally equivalent to salting and needs no tuning.
2. AQE skew-join splitting (enabled in session.py) re-splits oversized
   join partitions of the MERGE resolve at runtime.
3. For pathological cases (one conv_id = one bucket overwhelming a single
   writer task) this module salts the *shuffle* key only — MERGE join keys
   stay (conv_id, turn_idx), so semantics never change (SURVEY.md 4, "hard
   parts": salting must not break MERGE key uniqueness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(64 * 1024 * 1024),
}


def detect_hot_keys(
    df: DataFrame, key_col: str, threshold_frac: float = 0.01, sample_frac: float | None = None
) -> list[tuple]:
    """Keys holding more than threshold_frac of rows (optionally estimated on
    a sample — at 10^10 events sample 0.1% and the Zipf head is still exact
    to within noise). Driver-side result is tiny (only the head)."""
    d = df.sample(sample_frac) if sample_frac else df
    total = d.count()
    if total == 0:
        return []
    hot = (
        d.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= total * threshold_frac)
        .orderBy(F.desc("n"))
        .collect()
    )
    return [(r[key_col], r["n"] / total) for r in hot]


def salted_repartition(
    df: DataFrame, key_col: str, n_partitions: int, n_salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Spread a hot key over n_salt shuffle partitions by repartitioning on
    (key, salt). Use before per-row heavy work (normalization, enrichment)
    when input files are few/fat; drop the salt column afterwards.

    The salt is a hash of ``salt_cols`` (default: every column), so row
    placement is a pure function of row content — deterministic across
    retries and runs, unlike a rand()-based salt. Rows identical in
    salt_cols co-locate, which is harmless (they are duplicates there)."""
    cols = salt_cols or df.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
    out = df.withColumn("_salt", salt).repartition(n_partitions, F.col(key_col), F.col("_salt"))
    return out.drop("_salt")


def log_skew_metrics(df: DataFrame, key_col: str, top_n: int = 5) -> dict:
    """Skew telemetry for the lineage ledger: top-key share + partition-size
    spread (max/mean) — what you'd watch on the Spark UI, captured to data."""
    sizes = df.groupBy(F.spark_partition_id().alias("pid")).agg(F.count(F.lit(1)).alias("n"))
    rows = sizes.collect()
    ns = sorted((r["n"] for r in rows), reverse=True) or [0]
    top = (
        df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n")).orderBy(F.desc("n")).limit(top_n).collect()
    )
    total = sum(ns)
    return {
        "n_partitions": len(ns),
        "partition_max": ns[0],
        "partition_mean": total / max(len(ns), 1),
        "top_keys": [(r[key_col], r["n"]) for r in top],
        "top_key_frac": (top[0]["n"] / total) if top and total else 0.0,
    }
