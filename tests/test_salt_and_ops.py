"""Skew tooling, salted-dedup equivalence, Iceberg gating, CLI smoke."""

import json
import subprocess
import sys

import pytest

from ccdb_data_pipeline_spark.operators.dedupe import lww_latest, lww_latest_salted
from ccdb_data_pipeline_spark.operators.salt import detect_hot_keys, log_skew_metrics
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas


@pytest.fixture(scope="module")
def changes(spark):
    return spark.createDataFrame(gen_changes_pandas(4000, n_convs=50, seed=42), CHANGE_SCHEMA)


def test_salted_dedup_equals_plain(spark, changes):
    spec = TableSpec()
    a = {tuple(r) for r in lww_latest(changes.dropna(subset=["conv_id"]), spec).collect()}
    b = {tuple(r) for r in lww_latest_salted(changes.dropna(subset=["conv_id"]), spec, n_salt=4).collect()}
    assert a == b


def test_detect_hot_keys_finds_zipf_head(spark, changes):
    hot = detect_hot_keys(changes.dropna(subset=["conv_id"]), "conv_id", threshold_frac=0.04)
    assert hot, "generator plants a >=5%-share hot conv"
    top_key, frac = hot[0]
    assert top_key == "conv-00000000" and frac >= 0.04


def test_skew_metrics_shape(spark, changes):
    m = log_skew_metrics(changes.dropna(subset=["conv_id"]), "conv_id")
    assert m["n_partitions"] >= 1
    assert m["top_key_frac"] > 0
    assert m["top_keys"][0][0] == "conv-00000000"


def test_iceberg_self_disables(spark):
    from ccdb_data_pipeline_spark.plans.iceberg import iceberg_available

    assert iceberg_available(spark, "lake") is False  # no jar in this sandbox


def test_cli_end_to_end(tmp_path):
    """init -> seed -> ingest -> lineage -> compact through the real CLI."""
    import pandas as pd

    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas, write_segments
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas as gcp

    seedp = tmp_path / "seed.parquet"
    seed = gen_seed_pandas(n_convs=10, seed=42)
    seed["ts"] = seed["ts"].astype("datetime64[us]")  # Spark rejects ns parquet
    seed.to_parquet(seedp)
    write_segments(gcp(300, n_convs=10, seed=42), str(tmp_path / "binlog"), n_segments=2, replay_segment=None)

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "ccdb_data_pipeline_spark.cli", *args,
             "--master", "local[2]"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]

    t = str(tmp_path / "table")
    assert cli("init", "--table", t, "--buckets", "4")[0]["buckets"] == 4
    assert cli("seed", "--table", t, "--parquet", str(seedp))[0]["seeded_rows"] > 0
    out = cli("ingest", "--table", t, "--binlog", str(tmp_path / "binlog"),
              "--checkpoint", str(tmp_path / "ckpt"))[0]
    assert out["last_lsn"] == 300
    ledger = cli("lineage", "--table", t)
    assert len(ledger) >= 1 and ledger[0]["batch_id"] == 0
    assert cli("compact", "--table", t)[0]["compacted"] is True


def test_salted_repartition_deterministic(spark, changes):
    """Salt is a pure function of row content: two runs place every row in
    the same partition (no rand() in the engine's placement anywhere)."""
    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.operators.salt import salted_repartition

    df = changes.dropna(subset=["conv_id"])
    a = salted_repartition(df, "conv_id", 16, n_salt=4).withColumn(
        "pid", F.spark_partition_id()
    )
    b = salted_repartition(df, "conv_id", 16, n_salt=4).withColumn(
        "pid", F.spark_partition_id()
    )
    pa = {r["lsn"]: r["pid"] for r in a.select("lsn", "pid").collect()}
    pb = {r["lsn"]: r["pid"] for r in b.select("lsn", "pid").collect()}
    assert pa == pb


def test_strict_to_timestamp_raises_on_malformed(spark):
    """F1: reference ensure_date raises on bad input (salesforce/query.py:28);
    nulls pass, parseable strings parse, garbage fails the job."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from ccdb_data_pipeline_spark.operators.evolve import strict_to_timestamp

    ok = spark.createDataFrame([("2025-06-01 10:00:00",), (None,)], "s string")
    got = ok.select(strict_to_timestamp("s").alias("ts")).collect()
    assert got[0]["ts"] is not None and got[1]["ts"] is None

    bad = spark.createDataFrame([("not-a-date",)], "s string")
    with pytest.raises(Exception) as ei:
        bad.select(strict_to_timestamp("s").alias("ts")).collect()
    assert "unparseable timestamp" in str(ei.value)


def test_size_sentinel(spark, tmp_path):
    """A5: live rows must not shrink beyond a commit's deletes; a doctored
    manifest (hiding its deletes) trips the sentinel."""
    import numpy as np
    import pandas as pd

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.plans.lineage import SizeRegressionError, check_size_sentinel
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    t = SnapshotParquetTable(spark, str(tmp_path / "t"), TableSpec(num_buckets=4))
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=20, seed=1)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    conv, turn = seed.iloc[0]["conv_id"], int(seed.iloc[0]["turn_idx"])
    pdf = pd.DataFrame(
        {
            "lsn": [1],
            "op": ["D"],
            "conv_id": [conv],
            "turn_idx": np.array([turn], dtype=np.int32),
            "role": [None],
            "text": [None],
            "tool": [None],
            "ts": [pd.Timestamp("2025-06-01")],
        }
    )
    apply_changes(t, spark.createDataFrame(pdf, CHANGE_SCHEMA), batch_id=0)
    assert check_size_sentinel(t)["ok"]  # delete explains the shrink

    # doctor the committed manifest to hide the delete -> sentinel trips
    m = t.manifest()
    path = t._manifest_path(m["version"])
    doc = json.loads(open(path).read())
    doc["summary"]["n_delete"] = 0
    open(path, "w").write(json.dumps(doc))
    t._manifest = None
    with pytest.raises(SizeRegressionError):
        check_size_sentinel(t)


def test_with_global_index_strict_gap_free(spark):
    from ccdb_data_pipeline_spark.operators.index import release_caches, with_global_index

    # values deliberately unsorted + skewed so range partitions differ in size
    vals = [(v,) for v in [5, 1, 9, 3, 3, 7, 2, 8, 100, 0, 4, 6] * 50]
    df = spark.createDataFrame(vals, "v long").repartition(7)
    got = with_global_index(df, ["v"], num_partitions=5).collect()
    release_caches()
    assert sorted(r["row_idx"] for r in got) == list(range(1, len(vals) + 1))
    by_idx = sorted(got, key=lambda r: r["row_idx"])
    assert [r["v"] for r in by_idx] == sorted(v for (v,) in vals)


def test_cli_maintain_row_ttl(tmp_path):
    """init --stats-cols -> seed -> maintain --ttl-column/--ttl-days ages
    out the (old) seed rows through the real CLI: the seed handle records
    ts stats because stats_cols is manifest-authoritative (a later CLI
    invocation never re-passes it), and the TTL sweep's whole-file drops
    take the recorded row floor to zero."""
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    seedp = tmp_path / "seed.parquet"
    seed = gen_seed_pandas(n_convs=10, seed=42)  # ts all in 2024
    seed["ts"] = seed["ts"].astype("datetime64[us]")
    seed.to_parquet(seedp)

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "ccdb_data_pipeline_spark.cli", *args,
             "--master", "local[2]"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]

    t = str(tmp_path / "table")
    assert cli("init", "--table", t, "--buckets", "4", "--stats-cols", "ts")[0][
        "stats_cols"] == ["ts"]
    assert cli("seed", "--table", t, "--parquet", str(seedp))[0]["seeded_rows"] > 0
    rep = cli("maintain", "--table", t, "--ttl-column", "ts", "--ttl-days", "365")[0]
    assert rep["actions"]["ttl"]["run"] is True
    res = rep["actions"]["ttl"]["result"]
    assert res["n_files_dropped"] > 0 or res["n_dv_positions"] > 0
    assert cli("stats", "--table", t)[0]["base_rows_recorded"] == 0
