"""Per-batch lineage/metrics ledger, derived from committed manifests.

Lineage is embedded in each snapshot manifest at commit time (same atomic
rename that publishes the data — no window where data is committed but
lineage isn't, the failure mode called out in SURVEY.md section 4.4). This
module materializes it as DataFrames for audit queries:

- ``lineage_df``: one row per committed merge batch (FIXTURES.md section 5
  schema: batch_id, lsn range, op counts, n_partitions, snapshot_id, ...);
- ``lineage_detail_df``: per-bucket (per-partition) breakdown — source LSN
  range and row counts per storage bucket per batch.

Generalizes the reference's sink-side watermark (`get_last_indexed`,
/root/reference/common/es_proxy.py:26-38) into a full audit ledger.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from ..schemas import LINEAGE_SCHEMA
from .lake import SnapshotParquetTable


def lineage_rows(table: SnapshotParquetTable) -> list[dict]:
    rows = []
    for m in table.history():
        s = m.get("summary", {})
        if s.get("op") != "merge" or s.get("internal"):
            # internal = maintenance/DML commits in their own id space —
            # including them would interleave a second batch-id sequence
            # into the stream ledger and break its gap/continuity audits;
            # they stay visible through table.history()
            continue
        rows.append(
            {
                "batch_id": int(s["batch_id"]),
                "lsn_min": s.get("lsn_min"),
                "lsn_max": s.get("lsn_max"),
                "n_insert": int(s.get("n_insert", 0)),
                "n_update": int(s.get("n_update", 0)),
                "n_delete": int(s.get("n_delete", 0)),
                "n_malformed": int(s.get("n_malformed", 0)),
                "n_partitions": len(s.get("per_bucket", [])),
                "snapshot_id": m["snapshot_id"],
                "committed_at": _dt.datetime.fromtimestamp(
                    m["committed_at"], tz=_dt.timezone.utc
                ).replace(tzinfo=None),
            }
        )
    return rows


def lineage_df(spark: SparkSession, table: SnapshotParquetTable) -> DataFrame:
    return spark.createDataFrame(lineage_rows(table), LINEAGE_SCHEMA)


def lineage_detail_rows(table: SnapshotParquetTable) -> list[dict]:
    rows = []
    for m in table.history():
        s = m.get("summary", {})
        if s.get("internal"):
            continue
        for pb in s.get("per_bucket", []) or []:
            rows.append({"batch_id": int(s["batch_id"]), "snapshot_id": m["snapshot_id"], **pb})
    return rows


def last_committed_lsn(table: SnapshotParquetTable) -> int:
    """Resume cutoff — `SELECT max(lsn) FROM lineage` analog."""
    return table.last_lsn


def ingest_rate_report(table: SnapshotParquetTable) -> list[dict]:
    """Ops dashboard feed, manifest-only: per committed batch the applied
    event count, the wall seconds since the PREVIOUS commit (an upper bound
    on the batch's processing time that needs no extra instrumentation),
    the implied events/sec floor, and the cumulative totals. The first
    batch has no predecessor and reports rate=None."""
    out = []
    prev_ts = None
    cum = 0
    for r in lineage_rows(table):
        n = r["n_insert"] + r["n_update"] + r["n_delete"]
        cum += n
        secs = None
        if prev_ts is not None:
            secs = max((r["committed_at"] - prev_ts).total_seconds(), 0.0)
        out.append(
            {
                "batch_id": r["batch_id"],
                "n_events": n,
                "n_malformed": r["n_malformed"],
                "secs_since_prev_commit": round(secs, 3) if secs is not None else None,
                "events_per_sec_floor": (
                    round(n / secs) if secs else None
                ),
                "cumulative_events": cum,
                "lsn_max": r["lsn_max"],
            }
        )
        prev_ts = r["committed_at"]
    return out


class SizeRegressionError(AssertionError):
    """The published table shrank more than its commit's deletes explain."""


def check_size_sentinel(table: SnapshotParquetTable, version: int | None = None) -> dict:
    """A5 regression sentinel — the reference keeps a prev_json_size.txt and
    fails a publish whose output shrank (complaints/ccdb/tests/__fixtures__).
    Lake analog: live rows of snapshot v must satisfy
    ``rows(v) >= rows(parent) - n_delete(v)`` (attempted deletes upper-bound
    effective ones, so any deeper shrink means silent data loss). Audit
    tool — runs two snapshot counts, off the ingest critical path."""
    m = table.manifest(version)
    v = m["version"]
    if m.get("parent_snapshot_id") is None or v == 0:
        return {"version": v, "ok": True, "reason": "no parent snapshot"}
    parent_v = v - 1
    n_delete = int(m.get("summary", {}).get("n_delete", 0) or 0)
    rows_now = table.read(version=v).count()
    rows_prev = table.read(version=parent_v).count()
    ok = rows_now >= rows_prev - n_delete
    out = {
        "version": v,
        "rows": rows_now,
        "parent_rows": rows_prev,
        "n_delete": n_delete,
        "ok": ok,
    }
    if not ok:
        raise SizeRegressionError(
            f"snapshot v{v} has {rows_now} live rows < parent {rows_prev} - "
            f"{n_delete} deletes — output shrank unexplained"
        )
    return out


def ingest_lag_report(spark: SparkSession, binlog_dir: str,
                      table: SnapshotParquetTable) -> dict:
    """Consumer-lag / freshness probe (the Kafka ``consumer group lag``
    analog for the file-tailed binlog): how far the table's applied
    watermark trails the source log, measured EXACTLY.

    Because the log's LSN is globally monotone and the ledger's
    ``last_lsn`` is the exactly-once cutoff (every event at or below it is
    committed, none above it is), pending work is precisely the source rows
    with ``lsn > last_lsn`` — no heuristics, no per-key bookkeeping.

    Scale path: the ``lsn > cutoff`` predicate pushes to the parquet scan,
    so fully-applied segments are skipped from their row-group stats alone
    (footer reads only) — probing a 10^10-event log history costs IO
    proportional to the UNREAD tail, not the log. One job, one row back.

    Returns: applied_lsn, source_lsn_max, pending_events,
    oldest_pending_ts / newest_pending_ts (event-time staleness bounds of
    the unapplied tail), seconds_since_last_commit (wall-clock commit
    recency from the manifest; None before the first merge commit).
    """
    from pyspark.sql import functions as F

    cutoff = int(table.last_lsn)
    spec = table.spec
    row = (
        spark.read.parquet(binlog_dir)
        .filter(F.col(spec.lsn_col) > cutoff)
        .agg(
            F.count("*").alias("pending"),
            F.max(spec.lsn_col).alias("src_max"),
            F.min(spec.ts_col).alias("oldest_ts"),
            F.max(spec.ts_col).alias("newest_ts"),
        )
        .collect()[0]
    )
    committed_at = table.manifest().get("committed_at")
    now = _dt.datetime.now(tz=_dt.timezone.utc)
    return {
        "applied_lsn": cutoff,
        "source_lsn_max": int(row["src_max"]) if row["src_max"] is not None else cutoff,
        "pending_events": int(row["pending"]),
        "oldest_pending_ts": row["oldest_ts"],
        "newest_pending_ts": row["newest_ts"],
        "seconds_since_last_commit": (
            round(now.timestamp() - committed_at, 3) if committed_at else None
        ),
    }
