"""End-to-end quickstart: create a transcript lake table, stream a binlog
into it exactly-once, then query it — point lookup, SQL view, full-text
search, and a GC-immune snapshot tag.

    python examples/quickstart.py [workdir]

Everything is deterministic synthetic data; no external services.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.search import search_bm25
from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import ingest_rate_report
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.session import build_session
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="quickstart-")
    spark = build_session(master="local[4]", shuffle_partitions=8, app_name="quickstart")

    # 1. a keyed lake table (merge-on-read: O(batch) apply cost)
    table = SnapshotParquetTable(
        spark, os.path.join(work, "table"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)

    # 2. initial snapshot + a binlog to tail (insert/update/delete events)
    bootstrap_seed(table, spark.createDataFrame(gen_seed_pandas(n_convs=100), TRANSCRIPT_SCHEMA))
    write_segments(gen_changes_pandas(5000, n_convs=100), os.path.join(work, "binlog"), n_segments=10)

    # 3. stream it in: checkpointed offsets + per-batch ledger = exactly-once
    run_ingest(spark, os.path.join(work, "binlog"), table,
               os.path.join(work, "ckpt"), max_files_per_trigger=3)
    print("rows:", table.read().count())
    for r in ingest_rate_report(table):
        print("batch", r["batch_id"], "events", r["n_events"], "cum", r["cumulative_events"])

    # 4. query it
    print("point lookup:", table.read_keys(["conv-00000001"]).count(), "turn(s)")
    table.register_view("transcripts")
    spark.sql(
        "SELECT role, COUNT(*) AS n FROM transcripts GROUP BY role ORDER BY n DESC"
    ).show()
    docs = table.read().withColumn(
        "doc", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    )
    search_bm25(docs, ["spark", "shuffle"], text_col="text", id_col="doc") \
        .orderBy(F.desc("score")).limit(5).show(truncate=60)

    # 5. the same table through plain Spark formats — no engine imports
    #    needed on the consuming side (plans/datasource.py)
    from ccdb_data_pipeline_spark.plans.datasource import register

    register(spark)
    facade = spark.read.format("transcript_lake").load(table.root)
    print("facade read:", facade.filter(F.col("conv_id") == "conv-00000001").count(),
          "turn(s) via pushed-filter bucket pruning")
    changes = (
        spark.read.format("transcript_changes")
        .option("startingVersion", 0).load(table.root)
    )
    print("change feed rows:", changes.count(), "across",
          changes.select("_commit_version").distinct().count(), "commits")

    # 6. pin this exact state for reproducibility (survives vacuum/GC)
    v = table.create_tag("quickstart-v1")
    print("tagged version", v, "| stats:", table.stats())
    spark.stop()


if __name__ == "__main__":
    main()
