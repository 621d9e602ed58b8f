"""Transactionally-consistent multi-table replication (lake -> lake).

A CDC pipeline's output is rarely consumed where it lands: the transcript
table and its sibling tables are replicated to other regions/stores. The
reference replicates implicitly — its S3 archive is a second copy of the
index state, rebuilt per run (/root/reference/common/s3_utils.py:29-52) —
with no notion of cross-table consistency because it has one table. This
module replicates a SET of tables through their public change feeds while
preserving the source's transactional cut points (plans/txn.py):

* **Cuts, not tails.** The source's sealed transaction log is the
  replication schedule: each sealed record pins ``{table -> version}``.
  ``sync()`` applies, per sealed transaction in SEAL ORDER, each member
  table's change feed window ``(last_applied, pinned]``, then seals a
  replica-side cut record. A replica reader using
  :meth:`ReplicaSet.consistent_versions` therefore sees exactly the
  version sets the source's own consistent readers saw — never a mix of
  table A past a cut and table B before it.
* **Zero engine imports on the wire.** Reads are the
  ``transcript_changes`` feed, writes the ``transcript_lake`` facade —
  the same public surface an external (non-Python, non-engine) consumer
  would use. Events-mode feeds replay with the SOURCE dominance pair
  (``_ts_applied``, ``_lsn_applied``) as write-side ordering riders, so
  the replica's fold resolves exactly as the source's did; resolved-mode
  feeds (aggregation and copy-on-write sources) order by
  ``_commit_version`` — commit order, NOT event time, because a
  delete-reset followed by a refold of older events can make a key's
  resolved ``_ts_applied`` go BACKWARDS, and event-time LWW would then
  discard the newer state (test_replicate pins this case).
* **Exactly-once, crash-resumable.** The replica apply batch id is the
  source commit version (monotone per table across cuts); the facade
  writer's replay gate makes re-applies no-ops. The replica's own cut
  log is the cursor: a crash between a table's apply and the cut seal
  re-runs the cut, already-applied members skip, the seal lands. No
  separate state file — the log IS the checkpoint.

Scale notes: the feed read is one task per change file / per changed
bucket (no full-table scan), the wire is pre-shuffled onto the target's
bucket grid (``bucket_partitioned``) so a cut writes at most
``num_buckets`` delta files, and nothing data-sized touches the driver —
the sealed-log walk is O(transactions) metadata.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TableSpec
from . import fsio
from .datasource import (
    _change_file_partitions,
    _resolved_change_partitions,
    _TableMeta,
    bucket_partitioned,
    feed_floor,
)
from .lake import SnapshotParquetTable, _atomic_write_exclusive

def _struct(schema_json: dict) -> T.StructType:
    return T.StructType.fromJson(schema_json)


WIRE_TS = "_wire_ts"
WIRE_LSN = "_wire_lsn"
WIRE_OP = "_wire_op"
_FEED_META = ("_ts_applied", "_lsn_applied", "_change_type", "_commit_version")


def sealed_records(log_dir: str) -> list[dict]:
    """Sealed transaction records in SEAL order (``sealed_at``, filename
    tiebreak). Filename order alone is wrong: txn ids are random hex, so
    lexicographic filename order is unrelated to commit order."""
    if not os.path.isdir(log_dir):
        return []
    recs = []
    for fn in sorted(os.listdir(log_dir)):
        if not fn.endswith(".committed.json"):
            continue
        with open(os.path.join(log_dir, fn)) as f:
            rec = json.load(f)
        rec["_file"] = fn
        recs.append(rec)
    recs.sort(key=lambda r: (r.get("sealed_at", 0.0), r["_file"]))
    return recs


def replica_spec(src_manifest: dict, feed_mode: str) -> TableSpec:
    """Derive the replica table's spec from the SOURCE manifest alone (no
    source TableSpec in hand — manifests carry key/bucket/engine/normalize
    blocks exactly so spec-less consumers can do this).

    Events-mode sources replicate onto the SAME merge engine (the feed
    emits the engine's own typed events; identical folds give identical
    state). Resolved-mode sources (aggregation, copy-on-write) emit
    per-commit state diffs, which are plain upsert/delete facts — the
    replica is a last-writer-wins MoR table regardless of source engine
    (an agg replica must NOT re-aggregate already-resolved values)."""
    eng = src_manifest.get("engine", {})
    norm = src_manifest.get("normalize", {})
    seq = eng.get("seq_groups") or None
    events = feed_mode == "events"
    return TableSpec(
        key_cols=tuple(src_manifest.get("key_cols", ("conv_id", "turn_idx"))),
        bucket_col=src_manifest.get("bucket_col", "conv_id"),
        ts_col=WIRE_TS,
        lsn_col=WIRE_LSN,
        op_col=WIRE_OP,
        num_buckets=int(src_manifest.get("num_buckets", 16)),
        merge_mode="mor",
        partial_updates=bool(events and eng.get("partial_updates")),
        sequence_groups=(
            {s: tuple(m) for s, m in seq.items()} if events and seq else None
        ),
        first_row=bool(events and eng.get("first_row")),
        normalize_ws_cols=tuple(norm.get("ws_cols", ())),
        empty_to_null_exempt=tuple(norm.get("empty_to_null_exempt", ())),
        stats_cols=tuple(src_manifest.get("stats_cols", ())),
    )


def spec_from_manifest(m: dict) -> TableSpec:
    """Faithful engine spec for READ paths reconstructed from a manifest
    (key/bucket/engine/normalize blocks; the event-column names — ts/lsn/op
    — are not manifest state and stay at their defaults, which no read
    path consults). Used to open a SOURCE table whose creating TableSpec
    is not in hand — e.g. the floor-bootstrap read, where folding an agg
    table through a default LWW spec would silently mis-resolve."""
    eng = m.get("engine", {})
    norm = m.get("normalize", {})
    seq = eng.get("seq_groups") or None
    if eng.get("agg_spec") and not eng.get("agg_fns"):
        raise ValueError(
            "manifest flags an aggregation engine but predates engine "
            "params (no engine.agg_fns) — commit once through the creating "
            "TableSpec (which backfills them) before opening spec-less"
        )
    return TableSpec(
        key_cols=tuple(m.get("key_cols", ("conv_id", "turn_idx"))),
        bucket_col=m.get("bucket_col", "conv_id"),
        num_buckets=int(m.get("num_buckets", 16)),
        merge_mode=m.get("mode", "cow"),
        partial_updates=bool(eng.get("partial_updates")),
        sequence_groups={s: tuple(v) for s, v in seq.items()} if seq else None,
        first_row=bool(eng.get("first_row")),
        agg_spec=dict(eng["agg_fns"]) if eng.get("agg_fns") else None,
        normalize_ws_cols=tuple(norm.get("ws_cols", ())),
        empty_to_null_exempt=tuple(norm.get("empty_to_null_exempt", ())),
        stats_cols=tuple(m.get("stats_cols", ())),
    )


def replica_handle(spark, root: str) -> SnapshotParquetTable:
    """Engine handle for an existing replica table with the spec its own
    manifest declares (key/bucket/engine blocks) and the wire ordering
    columns — the engine read path folds by the HANDLE's spec, so a
    default-spec handle would group by the wrong keys."""
    m = SnapshotParquetTable(spark, root).manifest()
    return SnapshotParquetTable(spark, root, replica_spec(m, "events"))


class ReplicaSet:
    """Replicate ``tables`` (source root -> replica root) along the source
    transaction log's sealed cut chain. See module docstring.

    ``register(spark)`` (plans.datasource) must have been called — both
    wire endpoints are the registered Python data sources."""

    def __init__(self, spark, src_log_dir: str, dst_log_dir: str,
                 tables: dict[str, str]):
        self.spark = spark
        self.src_log_dir = src_log_dir
        self.dst_log_dir = dst_log_dir
        self.tables = dict(tables)
        fsio.makedirs(dst_log_dir)

    # ------------------------------------------------------------ state

    CHECKPOINT = "replica-checkpoint.json"

    def _ckpt(self) -> dict | None:
        p = os.path.join(self.dst_log_dir, self.CHECKPOINT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _live_records(self) -> list[dict]:
        """Sealed replica cut records, minus any folded-but-undeleted
        leftover below the checkpoint's fold horizon (crash mid-expire)."""
        recs = sealed_records(self.dst_log_dir)
        cp = self._ckpt()
        if not cp or not cp.get("horizon"):
            return recs
        horizon = tuple(cp["horizon"])
        return [
            r for r in recs
            if (r.get("sealed_at", 0.0), r["_file"]) > horizon
        ]

    def expire(self, keep_last: int = 100) -> dict:
        """Bound the replica cut-log size — the replica-side analog of
        ``TransactionLog.expire`` (one record per cut means the same
        unbounded-metadata growth). All but the newest ``keep_last``
        records fold into one checkpoint carrying the folded interval's
        final cursor (per-source version floor), pinned replica versions,
        and last seal times, so ``cursor`` / ``consistent_versions`` /
        ``lag_report`` are unchanged across a fold. Folded txn IDS are
        dropped: ``sync`` treats a source record whose every member is at
        or below the cursor floor as already applied (subsumption), so an
        unexpired source log replayed against an expired replica log
        neither re-applies nor re-seals. Crash-safe the same way: the
        checkpoint lands atomically before any delete; leftovers below
        the recorded horizon are skipped and reclaimed on re-run. What is
        lost is cut-level time travel INSIDE the folded interval."""
        base = self._ckpt() or {
            "kind": "checkpoint", "cursor": {}, "versions": {},
            "last_seal": {}, "sealed_at": 0.0, "folded": 0,
            "txn_ids_tail": [],
        }
        # reclaim folded-but-undeleted leftovers from a crash mid-expire
        # (below the recorded horizon: already accounted for in the
        # checkpoint, so delete WITHOUT re-folding)
        reclaimed = 0
        if base.get("horizon"):
            horizon = tuple(base["horizon"])
            for r in sealed_records(self.dst_log_dir):
                if (r.get("sealed_at", 0.0), r["_file"]) <= horizon:
                    os.remove(os.path.join(self.dst_log_dir, r["_file"]))
                    reclaimed += 1
        recs = self._live_records()
        fold = recs[:-keep_last] if keep_last > 0 else recs
        if not fold:
            return {"folded": 0, "kept": len(recs),
                    **({"reclaimed": reclaimed} if reclaimed else {})}
        for rec in fold:
            for t in rec.get("replica", {}).get("tables", []):
                sr = t["src_root"]
                base["cursor"][sr] = max(
                    int(base["cursor"].get(sr, 0)), int(t["src_version"])
                )
                base["last_seal"][sr] = rec.get("sealed_at")
            for t in rec["tables"]:
                base["versions"][t["root"]] = t["target_version"]
            base["sealed_at"] = max(base["sealed_at"], rec.get("sealed_at", 0.0))
            base["folded"] += 1
        base["txn_ids_tail"] = (
            base.get("txn_ids_tail", []) + [r["txn_id"] for r in fold]
        )[-16:]
        base["horizon"] = [fold[-1].get("sealed_at", 0.0), fold[-1]["_file"]]
        tmp = os.path.join(self.dst_log_dir, self.CHECKPOINT + ".tmp")
        with open(tmp, "w") as f:
            json.dump({k: v for k, v in base.items() if k != "_file"}, f, indent=1)
        os.replace(tmp, os.path.join(self.dst_log_dir, self.CHECKPOINT))
        for rec in fold:
            os.remove(os.path.join(self.dst_log_dir, rec["_file"]))
        return {"folded": len(fold), "kept": len(recs) - len(fold),
                **({"reclaimed": reclaimed} if reclaimed else {})}

    def applied_ids(self) -> set[str]:
        return {r["txn_id"] for r in self._live_records()}

    def cursor(self) -> dict[str, int]:
        """source root -> last source version applied to the replica
        (0 = nothing yet; the feed window is ``(cursor, pinned]``).
        Reconstructed from the replica's own cut log — a pure function of
        durable state, so crash recovery needs no extra bookkeeping.
        History folded by ``expire`` contributes through the checkpoint."""
        cur = {root: 0 for root in self.tables}
        cp = self._ckpt()
        if cp:
            for sr, v in cp.get("cursor", {}).items():
                if sr in cur:
                    cur[sr] = int(v)
        for rec in self._live_records():
            for t in rec.get("replica", {}).get("tables", []):
                if t["src_root"] in cur:
                    cur[t["src_root"]] = max(cur[t["src_root"]], t["src_version"])
        return cur

    def consistent_versions(self) -> dict[str, int]:
        """replica root -> version pinned by the latest sealed cut touching
        it (the replica-side analog of TransactionLog.consistent_versions)."""
        out: dict[str, int] = {}
        cp = self._ckpt()
        if cp:
            out.update({r: int(v) for r, v in cp.get("versions", {}).items()})
        for rec in self._live_records():
            for t in rec["tables"]:
                out[t["root"]] = t["target_version"]
        return out

    def lag_report(self) -> list[dict]:
        """Per-table replication lag from metadata alone (readdir + JSON —
        no Spark job, safe to poll): source head version vs the replica's
        cursor, commits behind, sealed source transactions not yet
        applied, and the last replica seal time. The numbers an operator
        alerts on (the reference's analog is the size-regression sentinel
        check before an alias swap, index_ccdb.py:74-84)."""
        cur = self.cursor()
        done = self.applied_ids()
        # a source record whose members are all at or below the cursor is
        # SUBSUMED (its window was applied inside an interval the replica
        # log has since folded) — not pending, even though its id is gone
        pending_txns = {
            root: sum(
                1
                for rec in sealed_records(self.src_log_dir)
                if rec["txn_id"] not in done
                and any(
                    t["root"] == root
                    and int(t["target_version"]) > cur.get(t["root"], 0)
                    for t in rec["tables"]
                )
            )
            for root in self.tables
        }
        last_seal: dict[str, float] = {}
        cp = self._ckpt()
        if cp:
            for sr, at in cp.get("last_seal", {}).items():
                if sr in self.tables:
                    last_seal[sr] = at
        for rec in self._live_records():
            for t in rec.get("replica", {}).get("tables", []):
                if t["src_root"] in self.tables:
                    last_seal[t["src_root"]] = rec.get("sealed_at")
        out = []
        for src_root, dst_root in sorted(self.tables.items()):
            head = SnapshotParquetTable(self.spark, src_root).current_version()
            out.append(
                {
                    "src_root": src_root,
                    "dst_root": dst_root,
                    "src_head": head,
                    "cursor": cur[src_root],
                    "commits_behind": max(0, head - cur[src_root]),
                    "pending_txns": pending_txns[src_root],
                    "last_seal_at": last_seal.get(src_root),
                }
            )
        return out

    # ------------------------------------------------------------ setup

    def ensure_created(self) -> list[str]:
        """Create any replica table that does not exist yet, with a spec
        derived from its source's manifest (same keys/buckets/engine for
        events-mode sources, LWW for resolved-mode)."""
        created = []
        for src_root, dst_root in self.tables.items():
            if SnapshotParquetTable(self.spark, dst_root).exists():
                continue
            meta = _TableMeta.load(src_root)
            src_m = SnapshotParquetTable(self.spark, src_root).manifest()
            spec = replica_spec(src_m, self._feed_mode(meta))
            t = SnapshotParquetTable(self.spark, dst_root, spec)
            t.create(meta.user_schema())
            created.append(dst_root)
        return created

    # ------------------------------------------------------------ sync

    def sync(self) -> list[str]:
        """Apply every source sealed transaction not yet on the replica, in
        seal order; returns the applied txn ids. Idempotent: re-runs skip
        sealed cuts wholly, and re-runs after a crash mid-cut skip the
        already-applied member tables via the facade batch-id gate."""
        self.ensure_created()
        done = self.applied_ids()
        cur = self.cursor()
        applied = []
        for rec in sealed_records(self.src_log_dir):
            members = [t for t in rec["tables"] if t["root"] in self.tables]
            if not members:
                continue
            if rec["txn_id"] in done:
                for t in members:  # advance the in-memory cursor past it
                    cur[t["root"]] = max(cur[t["root"]], t["target_version"])
                continue
            if all(int(t["target_version"]) <= cur[t["root"]] for t in members):
                # subsumed: every member window sits at or below the cursor
                # — its cut was applied inside an interval the replica log
                # folded into its checkpoint (expire dropped the id).
                # Re-applying would be an empty window; re-sealing would
                # duplicate a cut the fold already accounts for.
                continue
            sealed = []
            for t in members:
                src_root, hi = t["root"], int(t["target_version"])
                lo = cur[src_root]
                dst_v = self._apply_window(src_root, lo, hi)
                sealed.append((src_root, max(lo, hi), dst_v))
                cur[src_root] = max(lo, hi)
            self._seal(rec["txn_id"], sealed, kind="txn")
            applied.append(rec["txn_id"])
        return applied

    def sync_to_head(self) -> dict[str, int]:
        """Catch each table up PAST the last sealed cut to its current
        source head — single-table cuts (explicitly weaker: consistent per
        table, not across tables; use after the txn chain when sources also
        take out-of-band commits). Returns source versions synced to."""
        self.ensure_created()
        cur = self.cursor()
        out = {}
        for src_root in self.tables:
            head = SnapshotParquetTable(self.spark, src_root).current_version()
            lo = cur[src_root]
            if head > lo:
                digest = hashlib.md5(src_root.encode()).hexdigest()[:8]
                txn_id = f"head-v{head}-{digest}"
                if txn_id not in self.applied_ids():
                    dst_v = self._apply_window(src_root, lo, head)
                    self._seal(txn_id, [(src_root, head, dst_v)], kind="head")
            out[src_root] = max(lo, head)
        return out

    # ------------------------------------------------------------ internals

    @staticmethod
    def _feed_mode(meta: _TableMeta) -> str:
        if meta.engine.get("agg_spec") or meta.mode != "mor":
            return "resolved"
        return "events"

    def _apply_window(self, src_root: str, lo: int, hi: int) -> int:
        """Apply the source's change feed over ``(lo, hi]`` to the replica;
        returns the replica version afterwards. Empty windows (maintenance
        commits only) are detected from manifests — no Spark job.

        When ``lo`` predates the source's retained history (``feed_floor``
        > lo — expire_snapshots removed early commits), the replica is
        first converged to the floor snapshot (snapshot-then-tail, the
        standard CDC bootstrap) and the feed resumes from there; cuts
        entirely below the floor are unreconstructable and their records
        pin the floor state instead."""
        dst_root = self.tables[src_root]
        dst = SnapshotParquetTable(self.spark, dst_root)
        if hi <= lo:
            return dst.current_version()
        self._mirror_ddl(src_root, dst_root)
        meta = _TableMeta.load(src_root)
        mode = self._feed_mode(meta)
        floor = feed_floor(src_root)
        if lo < floor:
            self._bootstrap_floor(src_root, dst_root, floor, mode)
            lo = floor
            if hi <= lo:
                return dst.refresh().current_version()
        parts = (
            _change_file_partitions(src_root, lo, hi)
            if mode == "events"
            else _resolved_change_partitions(src_root, lo, hi)
        )
        if not parts:
            return dst.current_version()
        feed = (
            self.spark.read.format("transcript_changes")
            .option("startingVersion", lo)
            .option("endingVersion", hi)
            .option("mode", mode)
            .load(src_root)
        )
        user_cols = [c for c in feed.columns if c not in _FEED_META]
        if mode == "events":
            wire = feed.select(
                *user_cols,
                F.when(F.col("_change_type") == "delete", "D")
                .when(F.col("_change_type") == "patch", "P")
                .otherwise("U")
                .alias(WIRE_OP),
                F.col("_lsn_applied").alias(WIRE_LSN),
                F.col("_ts_applied").alias(WIRE_TS),
            )
        else:
            # resolved diffs are per-commit state facts: order by commit
            # version (monotone per key), never by event time — see module
            # docstring for the delete-then-refold-older-events hazard
            wire = feed.select(
                *user_cols,
                F.when(F.col("_change_type") == "delete", "D")
                .otherwise("U")
                .alias(WIRE_OP),
                F.col("_commit_version").alias(WIRE_LSN),
                F.col("_commit_version").cast("timestamp").alias(WIRE_TS),
            )
        (
            bucket_partitioned(wire, dst_root)
            .write.format("transcript_lake")
            .mode("append")
            .option("batchId", hi)
            .option("tsColumn", WIRE_TS)
            .option("lsnColumn", WIRE_LSN)
            .option("opColumn", WIRE_OP)
            .save(dst_root)
        )
        return dst.refresh().current_version()

    def _mirror_ddl(self, src_root: str, dst_root: str) -> None:
        """Mirror the source's schema DDL (rename/drop/add-with-default —
        metadata-only commits the change feed deliberately skips) onto the
        replica, in schema-id order, BEFORE applying window data: feed rows
        arrive in the source's HEAD schema, so the replica's schema must be
        brought to head first or a rename would union-evolve in as a brand
        new column while the retired name kept the old rows' values.

        Idempotent by schema inspection (a rename whose retired name is
        gone, a drop whose column is absent, an add that already exists all
        skip), so no mirror ledger is needed — crash anywhere and re-run."""
        src_m = SnapshotParquetTable(self.spark, src_root).manifest()
        events = sorted(
            [("rename", r) for r in src_m.get("renames", [])]
            + [("drop", d) for d in src_m.get("drops", [])]
            + [("add", a) for a in src_m.get("adds", [])
               if a.get("default") is not None],
            key=lambda e: int(e[1]["sid"]),
        )
        if not events:
            return
        rep = replica_handle(self.spark, dst_root)
        src_schema = _struct(src_m["schema"])
        for kind, r in events:
            names = [f.name for f in _struct(rep.manifest()["schema"]).fields]
            if kind == "rename" and r["from"] in names and r["to"] not in names:
                rep.rename_column(r["from"], r["to"])
            elif kind == "drop" and r["name"] in names:
                rep.drop_column(r["name"])
            elif kind == "add" and r["name"] not in names:
                cur = {f.name: f.dataType for f in src_schema.fields}
                if r["name"] in cur:  # dtype comes from the source's head
                    rep.add_column(r["name"], cur[r["name"]], default=r["default"])
            rep.refresh()

    def _bootstrap_floor(self, src_root: str, dst_root: str, floor: int,
                         mode: str) -> None:
        """Converge the replica to the source's floor snapshot through the
        facade writer (batch id = floor; a replayed bootstrap is a no-op).

        Events mode (LWW/first-row): ``replay_events(floor)`` — the floor
        state WITH tombstones, each row carrying its original dominance
        pair, so this is exactly-once sound even for a NON-empty replica
        (stale rows are dominated, expired-commit deletes land as
        tombstones) and composes with later feed events. Patch sources
        cannot replay state as whole-row events (column partials) —
        refused with the clone() pointer, same contract as replay_events.

        Resolved mode (agg/CoW source): the resolved read at the floor has
        no tombstones, so only a FRESH (never-written) replica can
        bootstrap from it; a stale replica would leak keys deleted inside
        the expired range and must be rebuilt."""
        src_m = SnapshotParquetTable(self.spark, src_root).manifest()
        src = SnapshotParquetTable(self.spark, src_root, spec_from_manifest(src_m))
        if mode == "events":
            if src.spec.partial_updates:
                raise ValueError(
                    f"replica of {src_root} is behind the feed floor "
                    f"(v{floor}) and patch-engine state cannot be replayed "
                    "as whole-row events — rebuild the replica from "
                    "clone() and restart the cut sync from there"
                )
            replay = src.replay_events(version=floor)
            wire = replay.select(
                "*",
                F.col("op").alias(WIRE_OP),
                F.col("_lsn_applied").alias(WIRE_LSN),
                F.col("_ts_applied").alias(WIRE_TS),
            ).drop("op", "_lsn_applied", "_ts_applied")
            dst = SnapshotParquetTable(self.spark, dst_root)
            if dst.exists() and dst.last_batch_id >= 0:
                # a STALE replica may hold keys whose deletion happened
                # inside the expired range AND whose tombstone the source
                # has since reclaimed (compact(drop_tombstones=True)) —
                # absent from the replay entirely. Kill each one with a
                # synthetic tombstone at the stale row's OWN dominance
                # pair: the weakest delete that still wins (the engine
                # breaks (ts, lsn) ties toward the tombstone), so any
                # strictly-newer feed event — including a legitimate
                # re-insert — still lands. With tombstones retained across
                # the gap (the sound operating contract, Kafka's
                # delete.retention analog) this anti-join matches nothing.
                keys = list(src.spec.key_cols)
                stale = (
                    replica_handle(self.spark, dst_root)
                    .read(include_internal=True)
                    .select(
                        *keys,
                        F.col("_ts_applied").alias(WIRE_TS),
                        F.col("_lsn_applied").alias(WIRE_LSN),
                    )
                    .join(replay.select(*keys), on=keys, how="left_anti")
                )
                payload = [c for c in wire.columns
                           if c not in (*keys, WIRE_TS, WIRE_LSN, WIRE_OP)]
                synth = stale.select(
                    *keys,
                    *[
                        F.lit(None).cast(wire.schema[c].dataType).alias(c)
                        for c in payload
                    ],
                    F.lit("D").alias(WIRE_OP),
                    WIRE_LSN,
                    WIRE_TS,
                )
                wire = wire.unionByName(synth)
        else:
            dst = SnapshotParquetTable(self.spark, dst_root)
            if dst.exists() and dst.last_batch_id >= 0:
                raise ValueError(
                    f"replica of {src_root} is behind the feed floor "
                    f"(v{floor}) and the resolved snapshot carries no "
                    "tombstones for keys deleted in the expired range — "
                    "drop and recreate this replica (fresh replicas "
                    "bootstrap from the floor automatically)"
                )
            wire = src.read(version=floor).select(
                "*",
                F.lit("U").alias(WIRE_OP),
                F.lit(floor).cast("long").alias(WIRE_LSN),
                F.lit(floor).cast("timestamp").alias(WIRE_TS),
            )
        (
            bucket_partitioned(wire, dst_root)
            .write.format("transcript_lake")
            .mode("append")
            .option("batchId", floor)
            .option("tsColumn", WIRE_TS)
            .option("lsnColumn", WIRE_LSN)
            .option("opColumn", WIRE_OP)
            .save(dst_root)
        )

    def _seal(self, txn_id: str, sealed: list[tuple[str, int, int]],
              kind: str) -> None:
        rec = {
            "txn_id": txn_id,
            "kind": kind,
            "sealed_at": time.time(),
            "tables": [
                {"root": self.tables[sr], "target_version": dv}
                for sr, _sv, dv in sealed
            ],
            "replica": {
                "tables": [
                    {"src_root": sr, "src_version": sv, "dst_root": self.tables[sr]}
                    for sr, sv, _dv in sealed
                ],
            },
        }
        path = os.path.join(self.dst_log_dir, f"txn-{txn_id}.committed.json")
        try:
            _atomic_write_exclusive(path, json.dumps(rec, indent=1))
        except Exception:
            if not fsio.exists(path):  # pragma: no cover - real write error
                raise
