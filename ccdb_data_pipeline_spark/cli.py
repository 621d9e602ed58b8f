"""spark-submit entry point: init | ingest | replay | compact | bench.

Usage (production: spark-submit --py-files engine.zip -m or a thin runner;
locally: python -m ccdb_data_pipeline_spark.cli <cmd> ...):

  init    --table DIR [--buckets N] [--stats-cols C1,C2]   create empty lake table
  seed    --table DIR --parquet PATH               bootstrap initial snapshot
  ingest  --table DIR --binlog DIR --checkpoint DIR [--max-files N] [--v2]
                                                   tail segments -> MERGE
  replay  --table DIR --binlog DIR                 batch replay (no stream)
  compact --table DIR                              rewrite + drop tombstones
  lineage --table DIR                              print the batch ledger
  delete  --table DIR --where PRED                 predicate DELETE (tombstones)
  update  --table DIR --where PRED --set COL=EXPR [--set ...]   predicate UPDATE
  retention --table DIR --max-age-days N           TTL sweep (rows older than N days)
  txn-recover --table DIR --txn-log DIR            roll forward unfinished multi-table txns
  txn-expire  --table DIR --txn-log DIR [--keep-last N]   fold old sealed txn records into a checkpoint
  vacuum  --table DIR [--retain-last N]            expire old snapshots + GC orphan files
  stats   --table DIR                              manifest-only health report (read amp, compaction advice)
  tag     --table DIR --name N [--version V]       pin a snapshot (GC-immune, immutable name)
  untag   --table DIR --name N                     release a pinned snapshot
  rate    --table DIR                              per-batch ingest rate report from the ledger
  rename  --table DIR --from OLD --to NEW          metadata-only column rename (field-id analog)
  drop-column --table DIR --name COL               metadata-only column drop (re-add reads null for old rows)
  add-column  --table DIR --name COL --type DDL [--default V]   explicit ADD COLUMN with initial default
  fsck    --table DIR                              metadata/disk integrity audit (exit 1 on violations)
  purge   --table DIR --where PRED [--drop-tags]   hard purge: rewrite files, expire history, GC bytes
  export  --table DIR --out DIR [--shards N] [--salt S]   render conversations -> deterministic training shards
  maintain --table DIR [--retain-last N] [--max-depth D] [--budget B]
           [--ttl-column COL --ttl-days D [--ttl-mode dv|cdc]] [--dry-run] [--declare]
                                                   condition-driven table services (compact/expire/GC/row TTL)
  feed-floor --table DIR                           oldest retained change-feed startingVersion
  resume-gap --table SRC --out TGT                 recover a gapped replication consumer
                                                   (re-bootstrap target from the floor snapshot)
  replicate-sync --table SRC --out DST --txn-log DIR --replica-log DIR
                 [--map SRC2=DST2 ...] [--to-head]
                                                   apply the source txn log's sealed cuts to the
                                                   replica set (consistent cuts; exactly-once)
  replicate-lag  --table SRC --out DST --txn-log DIR --replica-log DIR [--map ...]
                                                   metadata-only lag report (no Spark job)
  replicate-expire --table SRC --out DST --txn-log DIR --replica-log DIR [--keep-last N]
                                                   fold old replica cut records into a checkpoint
"""

from __future__ import annotations

import argparse
import json
import sys

from .plans.apply import apply_changes, bootstrap_seed
from .plans.lake import SnapshotParquetTable
from .plans.lineage import lineage_rows
from .schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_V2, TRANSCRIPT_SCHEMA, TableSpec
from .session import build_session
from .streaming.stream import run_ingest


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="transcript-cdc-engine")
    ap.add_argument("cmd", choices=["init", "seed", "ingest", "replay", "compact",
                                    "lineage", "delete", "update", "retention",
                                    "txn-recover", "txn-expire", "vacuum", "history", "stats",
                                    "tag", "untag", "rate", "lag", "rename", "drop-column",
                                    "add-column", "fsck", "purge", "export",
                                    "maintain", "feed-floor", "resume-gap",
                                    "replicate-sync", "replicate-lag",
                                    "replicate-expire"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--binlog")
    ap.add_argument("--checkpoint")
    ap.add_argument("--parquet")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--max-files", type=int, default=16)
    ap.add_argument("--v2", action="store_true", help="read binlog with the evolved v2 schema")
    ap.add_argument("--full", action="store_true",
                    help="compact: force a full rewrite (default is incremental/dirty-only)")
    ap.add_argument("--keep-tombstones", action="store_true",
                    help="compact: retain tombstones (lateness horizon not yet passed)")
    ap.add_argument("--where", help="delete/update: SQL predicate over the table")
    ap.add_argument("--set", action="append",
                    help="update: COL=SQL-EXPR assignment (repeatable)")
    ap.add_argument("--max-age-days", type=float,
                    help="retention: tombstone rows older than this many days")
    ap.add_argument("--fast", action="store_true",
                    help="retention: metadata fast path — drop wholly-expired "
                         "files from the manifest before tombstoning stragglers")
    ap.add_argument("--txn-log",
                    help="txn-recover/txn-expire: transaction log directory")
    ap.add_argument("--keep-last", type=int, default=100,
                    help="txn-expire/replicate-expire: sealed records to keep unfolded")
    ap.add_argument("--retain-last", type=int, default=2,
                    help="vacuum: snapshots to retain before expiry")
    ap.add_argument("--name", help="tag/untag: tag name")
    ap.add_argument("--zorder-by", help="compact: comma-separated columns for "
                    "Morton-curve clustering instead of the key sort")
    ap.add_argument("--version", type=int, default=None,
                    help="tag: version to pin (default: current)")
    ap.add_argument("--from", dest="rename_from", help="rename: current column name")
    ap.add_argument("--to", dest="rename_to", help="rename: new column name")
    ap.add_argument("--type", dest="col_type", help="add-column: DDL type (e.g. string, bigint)")
    ap.add_argument("--default", dest="col_default", default=None,
                    help="add-column: initial default for pre-existing rows")
    ap.add_argument("--drop-tags", action="store_true",
                    help="purge: also drop tags pinning pre-purge snapshots")
    ap.add_argument("--out", help="export: output directory for shard dirs + MANIFEST.json")
    ap.add_argument("--shards", type=int, default=64, help="export: number of shards")
    ap.add_argument("--salt", default="", help="export: epoch salt — changes the shuffle without touching data")
    ap.add_argument("--max-depth", type=int, default=8,
                    help="maintain: compact when any bucket's delta depth reaches this")
    ap.add_argument("--budget", type=int, default=64,
                    help="maintain: max buckets rewritten per compaction sweep")
    ap.add_argument("--dry-run", action="store_true",
                    help="maintain: print the plan without executing")
    ap.add_argument("--stats-cols", default=None,
                    help="init: comma-separated columns to record per-file "
                         "min/max stats for (file pruning + TTL trigger)")
    ap.add_argument("--ttl-column", default=None,
                    help="maintain: event-time column for row-level TTL ageing")
    ap.add_argument("--ttl-days", type=float, default=None,
                    help="maintain: age out rows older than this many days")
    ap.add_argument("--declare", action="store_true",
                    help="maintain: PERSIST the policy on the table "
                         "(set_table_policy) instead of running it — later "
                         "policy-less maintain runs and in-stream "
                         "maintain_every hooks apply the declared policy")
    ap.add_argument("--ttl-mode", choices=["dv", "cdc"], default="dv",
                    help="maintain: dv = position-delete maintenance "
                         "(feed-invisible); cdc = tombstone events that "
                         "replicate through the change feed")
    ap.add_argument("--replica-log",
                    help="replicate-*: the replica's cut-record directory")
    ap.add_argument("--map", action="append", default=[],
                    help="replicate-*: additional SRC=DST table pair (repeatable)")
    ap.add_argument("--to-head", action="store_true",
                    help="replicate-sync: also catch each table up past the "
                         "last sealed cut to the source head (per-table cuts)")
    ap.add_argument("--master", default=None)
    a = ap.parse_args(argv)
    if a.cmd == "add-column" and not a.col_type:
        ap.error("add-column requires --type (a DDL type, e.g. string, bigint)")

    spark = build_session(app_name=f"cdc-{a.cmd}", master=a.master)
    scols = tuple(
        c.strip() for c in (a.stats_cols or "").split(",") if c.strip()
    )
    table = SnapshotParquetTable(
        spark, a.table, TableSpec(num_buckets=a.buckets, stats_cols=scols)
    )

    if a.cmd == "init":
        table.create(TRANSCRIPT_SCHEMA)
        print(json.dumps({"created": a.table, "buckets": a.buckets,
                          "stats_cols": list(scols)}))
    elif a.cmd == "seed":
        bootstrap_seed(table, spark.read.parquet(a.parquet))
        print(json.dumps({"seeded_rows": table.read().count()}))
    elif a.cmd == "ingest":
        schema = CHANGE_SCHEMA_V2 if a.v2 else CHANGE_SCHEMA
        run_ingest(
            spark, a.binlog, table, a.checkpoint,
            schema=schema, max_files_per_trigger=a.max_files,
            on_batch=lambda s: print(
                json.dumps({"batch": s.batch_id, "skipped": s.skipped, "rows": s.n_source,
                            "lsn": [s.lsn_min, s.lsn_max], "snapshot": s.snapshot_id[:12]}),
                file=sys.stderr,
            ),
        )
        print(json.dumps({"table_rows": table.read().count(), "last_lsn": table.last_lsn}))
    elif a.cmd == "replay":
        batch = spark.read.schema(CHANGE_SCHEMA_V2 if a.v2 else CHANGE_SCHEMA).parquet(a.binlog)
        stats = apply_changes(table, batch, batch_id=table.last_batch_id + 1)
        print(json.dumps({"applied": stats.n_source, "lsn": [stats.lsn_min, stats.lsn_max]}))
    elif a.cmd == "compact":
        zo = tuple(s.strip() for s in a.zorder_by.split(",")) if a.zorder_by else ()
        table.compact(
            drop_tombstones=not a.keep_tombstones, only_dirty=not a.full,
            zorder_by=zo,
        )
        m = table.manifest()
        print(json.dumps({
            "compacted": True,
            "version": table.current_version(),
            "summary": m.get("summary", {}),
        }))
    elif a.cmd == "lineage":
        for r in lineage_rows(table):
            r["committed_at"] = str(r["committed_at"])
            print(json.dumps(r))
    elif a.cmd == "delete":
        from .plans.dml import delete_where

        stats = delete_where(table, a.where)
        print(json.dumps({"deleted": stats.n_source, "batch": stats.batch_id}))
    elif a.cmd == "update":
        from .plans.dml import update_where

        sets = dict(s.split("=", 1) for s in (a.set or []))
        stats = update_where(table, a.where, sets)
        print(json.dumps({"updated": stats.n_source, "batch": stats.batch_id}))
    elif a.cmd == "retention":
        import datetime as dt

        from .plans.dml import apply_retention, apply_retention_fast

        if a.fast:
            rep = apply_retention_fast(table, dt.timedelta(days=a.max_age_days))
            print(json.dumps({
                "files_dropped": rep["metadata"]["files_dropped"],
                "rows_dropped": rep["metadata"]["rows_dropped"],
                "expired": rep["tombstoned"].n_delete,
                "batch": rep["tombstoned"].batch_id,
            }))
        else:
            stats = apply_retention(table, dt.timedelta(days=a.max_age_days))
            print(json.dumps({"expired": stats.n_delete, "batch": stats.batch_id}))
    elif a.cmd == "txn-recover":
        from .plans.txn import TransactionLog

        done = TransactionLog(a.txn_log).recover(spark)
        print(json.dumps({"rolled_forward": done}))
    elif a.cmd == "txn-expire":
        from .plans.txn import TransactionLog

        print(json.dumps(TransactionLog(a.txn_log).expire(keep_last=a.keep_last)))
    elif a.cmd == "vacuum":
        expired = table.expire_snapshots(retain_last=a.retain_last)
        orphans = table.remove_orphans()
        print(json.dumps({"expired": expired, "orphans": orphans}))
    elif a.cmd == "fsck":
        from .plans.fsck import fsck

        rep = fsck(table)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1
    elif a.cmd == "purge":
        from .plans.dml import purge_where

        print(json.dumps(purge_where(table, a.where, drop_tags=a.drop_tags)))
    elif a.cmd == "export":
        from .operators.export import export_shards
        from .plans.ivm import render_docs

        docs = render_docs(table.read())
        print(json.dumps(export_shards(docs, a.out, "conv_id", a.shards, salt=a.salt)))
    elif a.cmd == "feed-floor":
        from .plans.datasource import feed_floor

        print(json.dumps({
            "feed_floor": feed_floor(a.table),
            "head": table.current_version(),
        }))
    elif a.cmd == "resume-gap":
        # recover a replication consumer that hit ChangeFeedGapError:
        # re-bootstrap TARGET (--out) from this source's retained floor
        # snapshot, then restart the feed with the printed startingVersion
        # and batchIdOffset (fresh checkpoint)
        from .plans.datasource import register, resume_from_gap

        if not a.out:
            ap.error("resume-gap requires --out (the target table root)")
        register(spark)
        tgt = SnapshotParquetTable(None, a.out)
        offset = tgt.last_batch_id + 1
        floor = resume_from_gap(table, a.out, batch_id=offset)
        print(json.dumps({
            "resumed_from_floor": floor,
            "target_last_batch_id": offset,
            "restart_with": {
                "startingVersion": floor,
                "batchIdOffset": offset + 1,
                "checkpointLocation": "<a FRESH directory>",
            },
        }))
    elif a.cmd in ("replicate-sync", "replicate-lag", "replicate-expire"):
        from .plans.datasource import register
        from .plans.replicate import ReplicaSet

        if not (a.out and a.txn_log and a.replica_log):
            ap.error(f"{a.cmd} requires --out, --txn-log and --replica-log")
        tables = {a.table: a.out}
        for pair in a.map:
            src, _, dst = pair.partition("=")
            if not dst:
                ap.error(f"--map expects SRC=DST, got {pair!r}")
            tables[src] = dst
        register(spark)
        rs = ReplicaSet(spark, a.txn_log, a.replica_log, tables)
        if a.cmd == "replicate-lag":
            print(json.dumps({"lag": rs.lag_report()}))
        elif a.cmd == "replicate-expire":
            print(json.dumps(rs.expire(keep_last=a.keep_last)))
        else:
            applied = rs.sync()
            out = {"applied_txns": applied}
            if a.to_head:
                out["head_synced"] = rs.sync_to_head()
            out["lag"] = rs.lag_report()
            print(json.dumps(out))
    elif a.cmd == "maintain":
        from .plans.maintenance import MaintenancePolicy, auto_maintain

        if (a.ttl_column is None) != (a.ttl_days is None):
            ap.error("--ttl-column and --ttl-days must be given together")
        from datetime import timedelta

        pol = MaintenancePolicy(
            max_delta_depth=a.max_depth,
            compact_budget_buckets=a.budget,
            retain_snapshots=a.retain_last,
            ttl_column=a.ttl_column,
            ttl_max_age=timedelta(days=a.ttl_days) if a.ttl_days is not None else None,
            ttl_mode=a.ttl_mode,
        )
        if a.declare:
            from .plans.maintenance import set_table_policy

            v = set_table_policy(table, pol)
            print(json.dumps({"declared": True, "version": v}))
        else:
            print(json.dumps(auto_maintain(table, pol, dry_run=a.dry_run)))
    elif a.cmd == "stats":
        print(json.dumps(table.stats()))
    elif a.cmd == "rate":
        from .plans.lineage import ingest_rate_report

        for r in ingest_rate_report(table):
            print(json.dumps(r))
    elif a.cmd == "lag":
        from .plans.lineage import ingest_lag_report

        if not a.binlog:
            ap.error("lag requires --binlog (the source log directory)")
        rep = ingest_lag_report(spark, a.binlog, table)
        for k in ("oldest_pending_ts", "newest_pending_ts"):
            if rep[k] is not None:
                rep[k] = rep[k].isoformat()
        print(json.dumps(rep))
    elif a.cmd == "tag":
        v = table.create_tag(a.name, version=a.version)
        print(json.dumps({"tag": a.name, "version": v}))
    elif a.cmd == "untag":
        table.drop_tag(a.name)
        print(json.dumps({"dropped": a.name}))
    elif a.cmd == "rename":
        v = table.rename_column(a.rename_from, a.rename_to)
        print(json.dumps({"renamed": [a.rename_from, a.rename_to], "version": v}))
    elif a.cmd == "drop-column":
        v = table.drop_column(a.name)
        print(json.dumps({"dropped_column": a.name, "version": v}))
    elif a.cmd == "add-column":
        v = table.add_column(a.name, a.col_type, default=a.col_default)
        print(json.dumps({"added_column": a.name, "type": a.col_type,
                          "default": a.col_default, "version": v}))
    elif a.cmd == "history":
        for m in table.history():
            print(json.dumps({
                "version": m["version"],
                "snapshot_id": m["snapshot_id"][:12],
                "committed_at": m["committed_at"],
                "op": m.get("summary", {}).get("op"),
                "batch_id": m.get("summary", {}).get("batch_id"),
            }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
