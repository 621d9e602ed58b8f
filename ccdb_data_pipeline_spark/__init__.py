"""transcript-cdc-engine: a PySpark-native CDC / incremental-ingest engine.

Brand-new engine (not a port) with the data-processing capabilities of
cfpb/ccdb-data-pipeline recast as idiomatic Spark: binlog/WAL tail ->
lake-table upsert keyed on (conv_id, turn_idx), last-writer-wins by (ts, lsn),
monotonic-LSN dedup for exactly-once, schema evolution, Structured Streaming
foreachBatch, skew-aware shuffles, per-batch lineage, checkpoint resume.

Reference parity map lives in SURVEY.md; each module cites the reference
behavior (file:line under /root/reference) it re-creates Spark-natively.
"""

__version__ = "0.1.0"
