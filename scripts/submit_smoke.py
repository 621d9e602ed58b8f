"""Thin spark-submit runner: full ingest cycle with the engine resolved
from the --py-files zip (no repo on sys.path).

spark-submit --master local[4] --py-files engine.zip scripts/submit_smoke.py \
    <table_dir> <seed_parquet> <binlog_dir> <checkpoint_dir>

Prints ONE JSON line: {"rows": N, "last_lsn": L, "batches": [...]}.
"""

import json
import sys

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.session import build_session
from ccdb_data_pipeline_spark.streaming.stream import run_ingest


def main(argv):
    table_dir, seed_parquet, binlog_dir, ckpt = argv
    spark = build_session(app_name="cdc-submit-smoke", master="local[4]",
                          shuffle_partitions=8)
    t = SnapshotParquetTable(spark, table_dir, TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.read.schema(TRANSCRIPT_SCHEMA).parquet(seed_parquet))
    run_ingest(spark, binlog_dir, t, ckpt, max_files_per_trigger=2)
    print(json.dumps({
        "rows": t.read().count(),
        "last_lsn": t.last_lsn,
        "batches": [r["batch_id"] for r in lineage_rows(t)],
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
