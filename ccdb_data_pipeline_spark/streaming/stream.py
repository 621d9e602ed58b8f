"""Structured Streaming wiring: binlog-segment tail -> foreachBatch MERGE.

The file source's checkpointed offset log replaces the reference's
watermark-driven delta pull (`LastModifiedDate >= watermark`,
/root/reference/salesforce/query.py:32-33 + harness.py:50-52): only unseen
segments are read after a restart, and the last in-flight micro-batch is
replayed with the SAME batch_id, which the table's ledger turns into a
no-op — exactly-once effects end-to-end.

``maxFilesPerTrigger`` bounds micro-batch size (the reference's
BATCH_SIZE=5000 chunking, index_ccdb.py:12,108-118); Trigger.AvailableNow
drains the backlog respecting that bound, then stops.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.apply import apply_changes
from ..plans.lake import MergeStats, SnapshotParquetTable
from ..schemas import CHANGE_SCHEMA


def _emit_batch_changes(
    table: SnapshotParquetTable, feed_dir: str, batch_id: int, version: int
) -> None:
    """Write the typed change feed for one applied batch to
    ``<feed_dir>/b-<batch_id>`` (idempotent: mode=overwrite + Spark's own
    _SUCCESS marker makes a half-written replay self-healing)."""
    import os

    out = os.path.join(feed_dir, f"b-{batch_id:010d}")
    table.table_changes(version - 1, version).write.mode("overwrite").parquet(out)


def _feed_complete(feed_dir: str, batch_id: int) -> bool:
    import os

    return os.path.exists(os.path.join(feed_dir, f"b-{batch_id:010d}", "_SUCCESS"))


def start_ingest(
    spark: SparkSession,
    segments_dir: str,
    table: SnapshotParquetTable,
    checkpoint_dir: str,
    schema: T.StructType = CHANGE_SCHEMA,
    max_files_per_trigger: int | None = 2,
    available_now: bool = True,
    normalize: bool = True,
    on_batch: Callable[[MergeStats], None] | None = None,
    emit_changes_dir: str | None = None,
    dedupe_within_watermark: str | None = None,
    quarantine_dir: str | None = None,
    source_format: str = "parquet",
    compact_every: int | None = None,
    compact_budget: int | None = 64,
    maintain_every: int | None = None,
    maintain_policy=None,
):
    """Start the CDC ingest stream; returns the StreamingQuery.

    compact_every: when set, run an IO-budgeted incremental compaction
    after every N applied (non-replayed) micro-batches — Hudi's inline
    compaction analog. The budget (``compact_budget`` buckets per sweep,
    dirtiest first) bounds the pause it injects between batches, and
    repeated sweeps converge, so MoR read amplification stays flat on a
    long-running stream without any external maintenance scheduler. For
    latency-critical ingest keep this unset and run compaction from a
    SEPARATE process instead — concurrent commits reconcile via the
    lost-CAS validate-and-rebase path (plans/lake.py).

    maintain_every: the full-service generalization of ``compact_every``
    — after every N applied micro-batches run ``auto_maintain`` with
    ``maintain_policy`` (None = the table's DECLARED policy via
    ``set_table_policy``, else the defaults), so a
    long-running stream also gets snapshot expiry, orphan GC, the
    bucket-count advisor, and row-level TTL ageing without an external
    scheduler. Safe at any cadence: every auto_maintain decision is
    manifest-only, so an all-skip round costs one JSON read. When both
    knobs are set they tick independently (compact_every for a tight
    read-amp bound, maintain_every for the slower hygiene loop).

    dedupe_within_watermark: when set (e.g. ``"2 hours"``), suppress
    re-delivered change events in-stream with
    ``dropDuplicatesWithinWatermark`` keyed on the LSN — checkpointed
    dedup state shared ACROSS micro-batches, sized by the watermark delay
    instead of growing forever. This covers the at-least-once upstream the
    offset log can't: the same events re-published under a NEW segment
    file (a binlog tailer retrying an upload) look like fresh input to the
    file source. The MERGE's (ts, lsn) dominance already makes such
    replays value-idempotent — this knob stops them from burning a shuffle
    + write per duplicate and from inflating per-batch lineage counts.
    Duplicates older than the watermark horizon fall through to that
    dominance check (documented Spark semantics: dedup is guaranteed only
    within the delay), so correctness never depends on the delay chosen.

    emit_changes_dir: when set, each applied micro-batch also publishes its
    Delta-CDF-style typed change feed (insert / delete / update pre+post
    images, via ``table_changes`` over the batch's snapshot pair) to
    ``<dir>/b-<batch_id>`` — the CDC-out leg for downstream consumers.
    Exactly-once composes with the ingest's: a crash between table commit
    and feed write leaves the batch skipped-on-replay, and the replay
    re-emits the missing feed from the committed snapshots (manifest lookup
    by batch_id), so the feed converges to exactly one complete dir per
    applied batch."""
    if isinstance(segments_dir, dict):
        # multi-shard upstream: {shard_id: segments_dir} — one file-source
        # per shard (independent offsets inside this query's ONE checkpoint),
        # per-shard LSNs bit-packed into the global LSN (sources/shards.py)
        if source_format != "parquet":
            raise ValueError("sharded ingest supports parquet segments only")
        from ..sources.shards import sharded_segments_stream

        changes = sharded_segments_stream(
            spark, segments_dir, schema, max_files_per_trigger
        )
    elif source_format == "parquet":
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        # segments are parquet; latestFirst stays False so arrival order == mtime order
        changes = reader.parquet(segments_dir)
    elif source_format == "debezium-json":
        # NDJSON segments of Debezium envelopes (a Kafka-topic dump / connect
        # file sink). Parse is a pure JVM projection (sources/debezium.py), so
        # the same checkpointed-offset exactly-once applies; unparseable lines
        # surface as null-key rows and take the malformed/quarantine path.
        from ..sources.debezium import from_debezium

        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        changes = from_debezium(reader.text(segments_dir), change_schema=schema)
    else:
        raise ValueError(f"unknown source_format: {source_format!r}")
    if dedupe_within_watermark is not None:
        spec = table.spec
        # Null event-time rows can't be compared to a watermark, and the
        # stateful operator would drop them as late — route them around the
        # dedup (their replays fall through to the MERGE's (ts, lsn)
        # dominance, which is value-idempotent).
        timed = (
            changes.filter(F.col(spec.ts_col).isNotNull())
            .withWatermark(spec.ts_col, dedupe_within_watermark)
            .dropDuplicatesWithinWatermark([spec.lsn_col])
        )
        changes = timed.unionByName(changes.filter(F.col(spec.ts_col).isNull()))

    applied_since_compact = [0]
    applied_since_maintain = [0]

    def _fb(batch_df, batch_id: int) -> None:
        stats = apply_changes(
            table, batch_df, batch_id, normalize=normalize,
            quarantine_dir=quarantine_dir,
        )
        if compact_every and not stats.skipped:
            applied_since_compact[0] += 1
            if applied_since_compact[0] >= compact_every:
                applied_since_compact[0] = 0
                table.compact(drop_tombstones=False, max_buckets=compact_budget)
        if emit_changes_dir is not None:
            if not stats.skipped:
                _emit_batch_changes(table, emit_changes_dir, batch_id, stats.version)
            elif not _feed_complete(emit_changes_dir, batch_id):
                # replayed batch whose feed never landed (crash between the
                # table commit and the feed write): recover the batch's
                # version from the committed manifests and re-emit
                for m in table.history():
                    s = m.get("summary", {})
                    if s.get("op") == "merge" and int(s.get("batch_id", -1)) == batch_id:
                        _emit_batch_changes(
                            table, emit_changes_dir, batch_id, m["version"]
                        )
                        break
        # maintenance runs LAST: auto_maintain's snapshot expiry may
        # reclaim the parent manifest that this batch's feed emit
        # (table_changes(version-1, version)) still needs — emitting first
        # keeps any retention policy safe at any cadence
        if maintain_every and not stats.skipped:
            applied_since_maintain[0] += 1
            if applied_since_maintain[0] >= maintain_every:
                applied_since_maintain[0] = 0
                from ..plans.maintenance import auto_maintain

                # None resolves to the TABLE's declared policy
                # (set_table_policy), else the defaults
                auto_maintain(table, maintain_policy)
        if on_batch is not None:
            on_batch(stats)

    writer = (
        changes.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("transcript-cdc-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ingest(spark, segments_dir, table, checkpoint_dir, **kw) -> None:
    """Blocking convenience: drain all available segments and stop."""
    q = start_ingest(spark, segments_dir, table, checkpoint_dir, **kw)
    q.awaitTermination()


def start_ingest_txn(
    spark: SparkSession,
    segments_dir: str,
    sinks: list,
    txn_log_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = CHANGE_SCHEMA,
    max_files_per_trigger: int | None = 2,
    available_now: bool = True,
    normalize: bool = True,
    on_batch: Callable[[int, list], None] | None = None,
):
    """One stream fanning ATOMICALLY into several tables: each micro-batch
    applies to every sink and publishes all-or-nothing through the
    intent-log 2PC (plans/txn.py). The consistent-materialized-views shape:
    a primary transcript table plus derived tables (per-conversation
    rollups, routing splits) that can never be observed out of step — a
    reader pinning `TransactionLog.consistent_versions()` sees every table
    at the same batch frontier.

    ``sinks``: list of ``(table, derive)`` pairs; ``derive(batch_df)``
    produces that table's change frame from the micro-batch (``None`` =
    the raw batch). Derivations must be deterministic: a replayed batch
    re-derives the same frames, and each table's ledger turns the replay
    into a no-op.

    Crash model: torn commits (intent written, not all tables published)
    are rolled FORWARD by ``TransactionLog.recover`` — called here before
    the stream starts — so on restart either every sink has the in-flight
    batch (replay skips everywhere) or none does (replay applies
    everywhere). A crash before the intent leaves only dangling WAP
    branches, which staging drops."""
    from ..plans.txn import TransactionLog

    log = TransactionLog(txn_log_dir)
    log.recover(spark)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    changes = reader.parquet(segments_dir)

    def _fb(batch_df, batch_id: int) -> None:
        txn = log.begin()
        stats = []
        for table, derive in sinks:
            branch = txn.stage(table)
            df = derive(batch_df) if derive is not None else batch_df
            stats.append(apply_changes(branch, df, batch_id, normalize=normalize))
        skipped = [s.skipped for s in stats]
        if all(skipped):
            txn.abort()  # replayed batch: every ledger already has it
        elif any(skipped):
            txn.abort()
            raise RuntimeError(
                f"batch {batch_id} partially applied across sinks before this "
                "transaction — ledgers diverge; run TransactionLog.recover"
            )
        else:
            txn.commit()
        if on_batch is not None:
            on_batch(batch_id, stats)

    writer = (
        changes.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("transcript-cdc-ingest-txn")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ingest_txn(spark, segments_dir, sinks, txn_log_dir, checkpoint_dir, **kw) -> None:
    """Blocking convenience for :func:`start_ingest_txn`."""
    q = start_ingest_txn(spark, segments_dir, sinks, txn_log_dir, checkpoint_dir, **kw)
    q.awaitTermination()
