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
