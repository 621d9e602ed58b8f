"""Stream-stream enrichment join == its batch equivalent, state bounded."""

import os
import time

import pandas as pd

from ccdb_data_pipeline_spark.streaming.enrich import enrich_stream


def _write_parquet_files(spark, pdf, schema, out_dir, n_files):
    from pyspark.sql.types import _parse_datatype_string

    from ccdb_data_pipeline_spark.sources.binlog import _to_parquet

    os.makedirs(out_dir)
    struct = _parse_datatype_string(schema)
    per = (len(pdf) + n_files - 1) // n_files
    now = time.time() - n_files
    for i in range(n_files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        p = os.path.join(out_dir, f"f-{i:04d}.parquet")
        _to_parquet(chunk, p, struct)
        os.utime(p, (now + i, now + i))


TURNS = "conv_id string, turn_idx int, role string, ts timestamp"
TOOLS = "conv_id string, turn_idx int, tool string, latency_ms long, ts timestamp"


def _data():
    base = pd.Timestamp("2025-01-01 00:00:00")
    turns = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "c"],
            "turn_idx": [0, 1, 0, 0],
            "role": ["assistant"] * 4,
            "ts": [base, base + pd.Timedelta(minutes=2), base, base],
        }
    )
    tools = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "c", "zz"],
            "turn_idx": [0, 1, 0, 0, 9],
            "tool": ["search", "sql", "code", "late", "orphan"],
            "latency_ms": [10, 20, 30, 40, 50],
            # 'late' lands 30 min after its turn -> outside the join window
            "ts": [
                base + pd.Timedelta(minutes=1),
                base + pd.Timedelta(minutes=3),
                base + pd.Timedelta(seconds=30),
                base + pd.Timedelta(minutes=30),
                base,
            ],
        }
    )
    return turns, tools


def test_batch_semantics_window_and_keys(spark):
    turns, tools = _data()
    out = enrich_stream(
        spark.createDataFrame(turns, TURNS),
        spark.createDataFrame(tools, TOOLS),
        on=["conv_id", "turn_idx"],
        window="10 minutes",
    ).collect()
    got = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in out}
    # 'late' (outside window) and 'orphan' (no matching turn) excluded
    assert got == {("a", 0): "search", ("a", 1): "sql", ("b", 0): "code"}
    assert all(r["ts_right"] >= r["ts"] for r in out)


def test_streaming_equals_batch(spark, tmp_path):
    turns, tools = _data()
    _write_parquet_files(spark, turns, TURNS, str(tmp_path / "turns"), 2)
    _write_parquet_files(spark, tools, TOOLS, str(tmp_path / "tools"), 2)
    st = spark.readStream.schema(TURNS).option("maxFilesPerTrigger", "1").parquet(
        str(tmp_path / "turns")
    )
    se = spark.readStream.schema(TOOLS).parquet(str(tmp_path / "tools"))
    joined = enrich_stream(st, se, on=["conv_id", "turn_idx"], window="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["turn_idx"]): r["tool"]
        for r in spark.sql("select * from enriched").collect()
    }
    assert got == {("a", 0): "search", ("a", 1): "sql", ("b", 0): "code"}
