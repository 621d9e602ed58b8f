"""Predicate DML over a CDC-maintained lake table: ``DELETE FROM ... WHERE``
and ``UPDATE ... SET ... WHERE`` compiled to ordinary change events and
applied through the same exactly-once MERGE path as the binlog stream.

This is how Iceberg/Delta express row-level maintenance (GDPR erasure,
backfill corrections) without a second write protocol: the DML batch is
just another LSN-stamped change batch — it replays idempotently by
batch_id, survives crash-resume, and shows up in the change feed
(``table_changes``) like any upstream write. DML batch ids live in the
MAINTENANCE id space (``last_dml_batch_id``, internal-marked commits kept
out of the stream lineage ledger): consuming ``last_batch_id + 1`` would
collide with a live stream's next checkpointed epoch, whose replay gate
would then silently drop that micro-batch.

Scale shape: the predicate scan is a normal pruned snapshot read (filter
pushdown applies; on patch tables the MoR resolve runs first — you delete
what the reader sees, not raw delta rows). Event construction needs unique
LSNs above the table's watermark: the gap-free two-pass global index
(operators/index.py) assigns them without a single-reducer window.

Reference analog: the eligibility->op routing that turns rows into
DELETE/UPDATE bulk actions (/root/reference/complaints/ccdb/index_ccdb.py:
103-105), generalized from a fixed eligibility rule to an arbitrary
predicate.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators.index import release_caches, with_global_index
from ..schemas import DELETED, TableSpec
from .apply import apply_changes
from .lake import MergeStats, SnapshotParquetTable


def _as_events(table: SnapshotParquetTable, rows, op: str, ts: dt.datetime):
    """Stamp matched rows as op-tagged change events with fresh unique LSNs
    (gap-free, starting at last_lsn + 1, ordered by the table key). The
    event-time stamp casts to the TABLE's ts column type — a TIMESTAMP_NTZ
    table must not receive a TIMESTAMP literal (schema-union would refuse
    the widening)."""
    spec: TableSpec = table.spec
    ts_type = next(
        (f.dataType for f in table.schema.fields if f.name == spec.ts_col),
        None,
    )
    stamp = F.lit(ts) if ts_type is None else F.lit(ts).cast(ts_type)
    idx = with_global_index(rows, order_by=list(spec.key_cols), index_col="_i")
    return idx.select(
        (F.lit(table.last_lsn) + F.col("_i")).cast("long").alias(spec.lsn_col),
        F.lit(op).alias(spec.op_col),
        *[F.col(c) for c in rows.columns],
    ).withColumn(spec.ts_col, stamp)


def delete_where(
    table: SnapshotParquetTable,
    predicate,
    ts: dt.datetime | None = None,
    read_columns: list[str] | None = None,
) -> MergeStats:
    """Tombstone every currently-visible row matching ``predicate`` — a
    SQL string, or a pyspark ``Column`` (use ``lake._where_term`` for
    datetime comparisons: SQL ``TIMESTAMP '...'`` literals parse in the
    SESSION timezone, so a string predicate built from a naive-UTC cutoff
    silently shifts the horizon on non-UTC sessions).

    ``ts`` stamps the deleting writer's event time (defaults to now, UTC);
    it must be >= the rows' current event times for the tombstones to win
    LWW — pass an explicit value to replay deterministic maintenance.

    ``read_columns``: optional scan projection (must cover every column the
    predicate references; keys are added automatically). On MoR tables the
    resolve fold can't be column-pruned through its max_by struct by
    Catalyst alone, so passing this keeps a wide-table sweep reading 2-3
    columns instead of all of them."""
    ts = ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    # filter BEFORE the key projection so the predicate may reference any
    # payload column
    cols = None
    if read_columns is not None:
        cols = list(dict.fromkeys([*table.spec.key_cols, *read_columns]))
    matched = table.read(columns=cols).filter(predicate).select(*table.spec.key_cols)
    events = _as_events(table, matched, "D", ts)
    try:
        return apply_changes(
                table, events, batch_id=table.last_dml_batch_id + 1, internal=True
            )
    finally:
        release_caches()


def update_where(
    table: SnapshotParquetTable,
    predicate: str,
    set_exprs: dict[str, str],
    ts: dt.datetime | None = None,
) -> MergeStats:
    """Rewrite every currently-visible row matching ``predicate`` with the
    given SQL ``set_exprs`` (column -> expression over the current row),
    emitted as full-image 'U' events — correct on both plain-LWW and
    partial-update tables."""
    ts = ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    schema_cols = [f.name for f in table.schema.fields]
    unknown = sorted(set(set_exprs) - set(schema_cols))
    if unknown:
        raise ValueError(f"SET targets {unknown} not in table schema {schema_cols}")
    if set(set_exprs) & set(table.spec.key_cols):
        raise ValueError("cannot SET a key column (delete + insert instead)")
    matched = table.read().filter(predicate)
    updated = matched.select(
        *[
            (F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c))
            for c in schema_cols
            if c != table.spec.ts_col
        ]
    )
    events = _as_events(table, updated, "U", ts)
    try:
        return apply_changes(
                table, events, batch_id=table.last_dml_batch_id + 1, internal=True
            )
    finally:
        release_caches()


def reconcile_to(
    table: SnapshotParquetTable,
    desired,
    ts: dt.datetime | None = None,
    dry_run: bool = False,
):
    """Reconciliation repair: diff the table's visible state against an
    authoritative snapshot (a re-exported source dump, a peer engine's
    state) and emit the MINIMAL I/U/D change batch that makes the table
    equal to it — then apply it through the same exactly-once path as any
    other batch. The anti-entropy tool that pairs with the CDC relay and
    clone: when drift is detected (lost upstream events, a bad manual fix),
    you repair with a change batch, not a table rebuild.

    Comparison is null-safe over every payload column EXCEPT the event-time
    column (repair events are stamped ``ts``, so including it would make
    reconcile non-convergent); like update_where, ``ts`` must be >= the
    drifted rows' current event times for the repairs to win LWW. Desired
    must be key-unique and carry normalized text (the apply path's
    normalization is idempotent on normalized input). ``dry_run`` returns
    the op-tagged diff without applying.

    Scale shape: one full-outer join on the table key between two resolved
    snapshots — the unavoidable all-to-all for set reconciliation — with
    everything else map-side; the emitted batch is proportional to the
    DRIFT, not the table."""
    ts = ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    spec = table.spec
    keys = list(spec.key_cols)
    payload = [
        f.name for f in table.schema.fields
        if f.name not in keys and f.name != spec.ts_col
    ]
    cur = table.read().select(*keys, *[F.col(c).alias(f"_c_{c}") for c in payload]) \
        .withColumn("_in_c", F.lit(True))
    des = desired.select(*keys, *payload).withColumn("_in_d", F.lit(True))
    j = des.join(cur, on=keys, how="full_outer")
    same = None
    for c in payload:
        eq = F.col(c).eqNullSafe(F.col(f"_c_{c}"))
        same = eq if same is None else (same & eq)
    op = (
        F.when(F.col("_in_d").isNotNull() & F.col("_in_c").isNull(), F.lit("I"))
        .when(F.col("_in_d").isNull() & F.col("_in_c").isNotNull(), F.lit("D"))
        .when(~same, F.lit("U"))
    )
    diff = (
        j.withColumn(spec.op_col, op)
        .filter(F.col(spec.op_col).isNotNull())
        .select(spec.op_col, *keys, *payload)
    )
    idx = with_global_index(diff, order_by=[spec.op_col, *keys], index_col="_i")
    events = idx.select(
        (F.lit(table.last_lsn) + F.col("_i")).cast("long").alias(spec.lsn_col),
        spec.op_col,
        *keys,
        *payload,
    ).withColumn(spec.ts_col, F.lit(ts))
    if dry_run:
        return events
    try:
        return apply_changes(
                table, events, batch_id=table.last_dml_batch_id + 1, internal=True
            )
    finally:
        release_caches()


def apply_retention(
    table: SnapshotParquetTable,
    max_age: dt.timedelta,
    now: dt.datetime | None = None,
) -> MergeStats:
    """Declarative row-level TTL: tombstone every visible row whose event
    time is older than ``now - max_age`` — the data-retention sweep
    (compliance / storage policy) as one exactly-once change batch. Rows
    with a NULL event time are RETAINED (age unknowable; they need an
    explicit ``delete_where`` decision, not a silent sweep). Pass ``now``
    for deterministic replays; tombstone space itself is reclaimed later by
    ``compact(drop_tombstones=True)``."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    cutoff = now - max_age
    # Column predicate, not a SQL TIMESTAMP literal: string literals parse
    # in the SESSION timezone while the engine's naive datetimes mean UTC,
    # so a literal would shift the retention horizon by the tz offset on
    # non-UTC sessions (lake._residual_lit documents the same hazard for
    # the pruning tiers)
    from .lake import _where_term

    ts_col = table.spec.ts_col
    dtype = {f.name: f.dataType for f in table.schema.fields}.get(ts_col)
    return delete_where(
        table,
        _where_term(ts_col, "<", cutoff, dtype),
        ts=now,
        read_columns=[ts_col],
    )


def apply_retention_fast(
    table: SnapshotParquetTable,
    max_age: dt.timedelta,
    now: dt.datetime | None = None,
) -> dict:
    """Retention sweep with the metadata fast path: first drop whole data
    files every one of whose rows provably expired (manifest edit, no data
    IO — ``SnapshotParquetTable.drop_expired_files``; on a ts-clustered
    table this covers the bulk), then tombstone the straggler rows in
    partially-covered / delta-dirty / stat-less files through the normal
    exactly-once change-batch path. Same final state as
    :func:`apply_retention` — proven in test_metadata_delete.py — at a
    fraction of the write amplification: the slow path rewrites ALL
    expired rows as tombstones; this rewrites only the stragglers.

    Returns ``{"metadata": drop-report, "tombstoned": MergeStats}``."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    cutoff = now - max_age
    dropped = table.drop_expired_files(cutoff)
    stats = apply_retention(table, max_age, now=now)
    return {"metadata": dropped, "tombstoned": stats}


class PurgeVerificationError(RuntimeError):
    """Raised when a hard purge's post-scan still finds payload bytes for a
    purged key in any retained data file."""


def purge_where(
    table: SnapshotParquetTable,
    predicate: str,
    ts: dt.datetime | None = None,
    read_columns: list[str] | None = None,
    drop_tombstones: bool = False,
    drop_tags: bool = False,
) -> dict:
    """Right-to-erasure HARD purge (GDPR Art. 17 / Iceberg "purge" pattern):
    make every byte of the matched rows' payload physically unreachable in
    the table directory — not just logically deleted — and prove it.

    A ``delete_where`` alone is a LOGICAL delete: the tombstone wins LWW but
    the old row images stay in earlier snapshots (time travel) and in
    not-yet-compacted base/delta files. This runs the full erasure pipeline
    as one workflow, then attests the result:

    1. tombstone matched rows (normal exactly-once change batch, so the
       erasure itself is in the ledger + change feed — auditable);
    2. ``compact`` the affected buckets (rewrites every layer; the LWW
       winner for a purged key is the tombstone, whose payload is null);
    3. ``expire_snapshots(retain_last=1)`` — drops every pre-purge manifest
       and the data files only they referenced (this is inherent: hard
       erasure and unlimited time travel are mutually exclusive);
    4. ``remove_orphans`` — reclaims uncommitted crash debris too;
    5. VERIFY: re-read every data file still referenced by any retained
       manifest (era-aligned, tombstones included) and broadcast-semi-join
       against the purged key set. Payload rows found -> raise
       :class:`PurgeVerificationError`; key-only tombstone rows are
       reported (``n_key_tombstones``) and expected unless
       ``drop_tombstones=True``.

    ``drop_tombstones=False`` (default) keeps the key-only tombstone row so
    a late, lower-dominance pre-purge event cannot resurrect the payload;
    ``True`` erases even the keys (resurrection protection gone — only safe
    once the upstream retry window has passed).

    Refuses to run while staging branches exist, or while tags pin old
    snapshots (their manifests would keep pre-purge files alive); pass
    ``drop_tags=True`` to drop all tags first. The malformed-row quarantine
    dir (plans/apply.py) is OUTSIDE the table root and not touched here —
    purge it separately if it may hold the subject's rows.

    Scale shape: steps 1-2 cost O(matched buckets); step 5 is a full scan
    of the retained table ONCE, as a pure map-side job (pushdown scan +
    broadcast hash semi-join on the keys, no shuffle) — the unavoidable
    price of an attestation, run off the ingest path.

    Returns the attestation dict (counts, bytes reclaimed, files scanned).
    """
    ts = ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    branches = table.branches()
    if branches:
        raise ValueError(
            f"cannot hard-purge with staging branches alive {sorted(branches)}: "
            "their manifests pin pre-purge files — publish or drop them first"
        )
    tags = table.tags()
    if tags and not drop_tags:
        raise ValueError(
            f"cannot hard-purge with tags pinning old snapshots {sorted(tags)}: "
            "pass drop_tags=True to drop them"
        )
    for name in list(tags):
        table.drop_tag(name)

    keys = list(table.spec.key_cols)
    cols = None
    if read_columns is not None:
        cols = list(dict.fromkeys([*keys, *read_columns]))
    # materialize the matched key set OUTSIDE the table before mutating it
    # (a lazy plan would re-read post-delete state and verify nothing)
    key_dir = tempfile.mkdtemp(prefix="purge-keys-")
    try:
        (table.read(columns=cols).filter(predicate)
         .select(*keys).distinct().write.mode("overwrite").parquet(key_dir))
        key_df = table.spark.read.parquet(key_dir)
        n_keys = key_df.count()

        stats: MergeStats | None = None
        if n_keys:
            events = _as_events(table, key_df, "D", ts)
            try:
                stats = apply_changes(
                table, events, batch_id=table.last_dml_batch_id + 1, internal=True
            )
            finally:
                release_caches()
        # first-row tables refuse plain drop_tombstones=True (claim-once
        # semantics); the caller asked for full erasure, so force it there
        dt_mode: bool | str = drop_tombstones
        if drop_tombstones and table.spec.first_row:
            dt_mode = "force"
        table.compact(drop_tombstones=dt_mode, only_dirty=True)
        reclaim = table.expire_snapshots(retain_last=1)
        orphans = table.remove_orphans()

        # --- attestation scan over every retained data file ---
        n_files = 0
        n_payload = 0
        n_tomb = 0
        seen: set[str] = set()
        bkeys = F.broadcast(key_df)
        mdir = os.path.join(table.root, "manifests")
        for fn in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
            if not (fn.startswith("m-") and fn.endswith(".json")):
                continue
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
            entries = [
                e for fs in m["buckets"].values() for e in fs
                if e["path"] not in seen
            ]
            seen.update(e["path"] for e in entries)
            # apply_dv=False: DV-deleted rows are LOGICALLY gone but their
            # bytes are still present — the attestation must see them
            df = table._read_files(entries, m, apply_dv=False)
            if df is None:
                continue
            n_files += len(entries)
            hit = df.join(bkeys, on=keys, how="left_semi")
            row = hit.agg(
                F.count(F.when(F.col(DELETED), True)).alias("tomb"),
                F.count(F.when(~F.col(DELETED), True)).alias("live"),
            ).collect()[0]
            n_tomb += row["tomb"]
            n_payload += row["live"]

        out = {
            "n_keys": n_keys,
            "n_deleted": stats.n_delete if stats is not None else 0,
            "n_files_scanned": n_files,
            "n_residual_payload_rows": n_payload,
            "n_key_tombstones": n_tomb,
            "bytes_reclaimed": reclaim["bytes_reclaimed"] + orphans["bytes_reclaimed"],
            "n_data_files_deleted": (
                reclaim["n_data_files_deleted"] + orphans["n_data_files_deleted"]
            ),
            "clean": n_payload == 0 and (n_tomb == 0 or not drop_tombstones),
        }
        if not out["clean"]:
            raise PurgeVerificationError(f"purge attestation failed: {out}")
        return out
    finally:
        shutil.rmtree(key_dir, ignore_errors=True)
