"""Last-writer-wins dedup + malformed-row guard (the CDC heart, pre-MERGE).

Semantics: for a set of change events, the winner per key is the event with
the greatest ``(coalesce(ts, epoch), lsn)`` — LWW by event time, monotonic
LSN as tie-break (FIXTURES.md section 4). This dominance order is a total
order per key, so applying batches in ANY arrival order converges to the
same final table state; exact replays (duplicate LSNs) are no-ops because
dominance is strict.

Re-creates, Spark-natively:
- within-batch key collapse: reference builds ``new_ids[row[15]] = 1`` while
  merging archives (/root/reference/common/s3_utils.py:43-45);
- the null-key guard: reference skips docs with no complaint id
  (/root/reference/complaints/ccdb/index_ccdb.py:104).

Scale note: dedup uses ``groupBy().agg(max_by(...))`` rather than a
row_number window. HashAggregate gets a map-side partial pass (each task
pre-reduces its local rows per key) so a Zipf-hot key arrives at the final
shuffle already collapsed to <= one row per map task — the partial agg *is*
the salting. A window would instead sort-shuffle every duplicate of the hot
key to one reducer. An explicit salted two-phase variant is provided for
plan comparison and for engines without max_by partial-agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TableSpec

EPOCH = "1970-01-01 00:00:00"


def lww_order(ts_col: str = "ts", lsn_col: str = "lsn") -> Column:
    """The dominance key: null event-times lose to any real event-time."""
    return F.struct(
        F.coalesce(F.col(ts_col), F.to_timestamp(F.lit(EPOCH))).alias("_o_ts"),
        F.col(lsn_col).alias("_o_lsn"),
    )


def drop_malformed(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Drop rows with a null key part (index_ccdb.py:104 guard)."""
    cond = None
    for k in spec.key_cols:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def lww_latest(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Collapse a change set to one winning event per key (map-side-combining)."""
    others = [c for c in df.columns if c not in spec.key_cols]
    row = F.max_by(F.struct(*[F.col(c) for c in others]), lww_order(spec.ts_col, spec.lsn_col))
    out = df.groupBy(*[F.col(k) for k in spec.key_cols]).agg(row.alias("_win"))
    return out.select(*spec.key_cols, *[F.col(f"_win.{c}").alias(c) for c in others])


def lww_latest_salted(df: DataFrame, spec: TableSpec, n_salt: int = 16) -> DataFrame:
    """Explicit two-phase (salted) variant: pre-reduce per (key, salt), then
    finalize per key. Plan-equivalent to what partial aggregation does
    implicitly; kept for skew experiments and as the documented pattern for
    sort-based fallbacks."""
    others = [c for c in df.columns if c not in spec.key_cols]
    ordk = lww_order(spec.ts_col, spec.lsn_col)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(spec.lsn_col)), F.lit(n_salt)))
    phase1 = (
        salted.groupBy(*spec.key_cols, "_salt")
        .agg(F.max_by(F.struct(*[F.col(c) for c in others]), ordk).alias("_win"))
        .select(*spec.key_cols, *[F.col(f"_win.{c}").alias(c) for c in others])
    )
    return lww_latest(phase1, spec)
