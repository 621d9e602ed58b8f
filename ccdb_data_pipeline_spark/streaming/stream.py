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
from pyspark.sql import types as T

from ..plans.apply import apply_changes
from ..plans.lake import MergeStats, SnapshotParquetTable
from ..schemas import CHANGE_SCHEMA


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
):
    """Start the CDC ingest stream; returns the StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # segments are parquet; latestFirst stays False so arrival order == mtime order
    changes = reader.parquet(segments_dir)

    def _fb(batch_df, batch_id: int) -> None:
        stats = apply_changes(table, batch_df, batch_id, normalize=normalize)
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
