"""End-to-end: Debezium NDJSON topic dump -> streaming ingest -> lake table."""

import os
import time

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from ccdb_data_pipeline_spark.sources.debezium import to_debezium
from ccdb_data_pipeline_spark.streaming.stream import run_ingest

from tests.oracle import assert_tables_equal, replay, table_to_pandas


def _write_envelope_segments(spark, changes_pdf, out_dir, n_segments, extra_lines=()):
    """NDJSON segments with increasing mtimes (file-source arrival order)."""
    os.makedirs(out_dir)
    lines = [
        r["value"]
        for r in to_debezium(
            spark.createDataFrame(changes_pdf, CHANGE_SCHEMA)
        ).collect()
    ]
    per = (len(lines) + n_segments - 1) // n_segments
    now = time.time() - n_segments
    for i in range(n_segments):
        chunk = lines[i * per : (i + 1) * per]
        if i == n_segments - 1:
            chunk = list(chunk) + list(extra_lines)
        p = os.path.join(out_dir, f"seg-{i:05d}.json")
        with open(p, "w") as f:
            f.write("\n".join(chunk) + "\n")
        os.utime(p, (now + i, now + i))


def test_debezium_topic_ingest_matches_replay_oracle(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=40, seed=7)
    changes = gen_changes_pandas(1500, n_convs=40, seed=7)
    _write_envelope_segments(
        spark, changes, str(tmp_path / "topic"), n_segments=6,
        extra_lines=["this is not an envelope"],  # a poison-pill record
    )
    table = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    run_ingest(
        spark,
        str(tmp_path / "topic"),
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        source_format="debezium-json",
        quarantine_dir=str(tmp_path / "dlq"),
    )
    out = table.read()
    assert_tables_equal(table_to_pandas(out), replay(seed, [changes]))
    # the poison pill: counted malformed, dead-lettered, not applied
    assert sum(r["n_malformed"] for r in lineage_rows(table)) >= 1
    from ccdb_data_pipeline_spark.plans.apply import read_quarantine

    dlq = read_quarantine(spark, str(tmp_path / "dlq"))
    assert dlq.filter(dlq.conv_id.isNull()).count() >= 1
