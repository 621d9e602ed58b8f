"""Deterministic training-shard export (operators/export.py): layout is a
pure function of keys; shard dirs hold one sorted file each; manifest
reconciles."""

import glob
import json
import os

from ccdb_data_pipeline_spark.operators.export import export_shards, shard_layout


def _layout(df, n=4, salt=""):
    return {
        r["k"]: (r["shard"], r["pos"])
        for r in shard_layout(df, "k", n, salt=salt).collect()
    }


def test_layout_partitioning_invariant(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = _layout(df)
    b = _layout(df.repartition(13))
    c = _layout(df.coalesce(1))
    assert a == b == c
    # gap-free 1..n positions per shard
    by_shard = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # md5 uniformity: no shard is empty or dominant at 500 keys / 4 shards
    sizes = {s: len(p) for s, p in by_shard.items()}
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2.2 * min(sizes.values())


def test_salt_is_an_epoch_reshuffle(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "k")
    a = _layout(df, salt="")
    b = _layout(df, salt="epoch1")
    assert a != b
    assert _layout(df, salt="epoch1") == b  # but each salt is stable


def test_export_one_sorted_file_per_shard(spark, tmp_path):
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    out = str(tmp_path / "shards")
    manifest = export_shards(df, out, "k", n_shards=4)
    assert manifest["n_rows"] == 400
    assert sum(manifest["rows_per_shard"].values()) == 400
    with open(os.path.join(out, "MANIFEST.json")) as f:
        assert json.load(f) == manifest

    seen = set()
    for s in range(4):
        files = glob.glob(os.path.join(out, f"shard={s}", "*.parquet"))
        assert len(files) == 1  # one sequential file per shard
        import pyarrow.parquet as pq

        t = pq.read_table(files[0])
        poss = t.column("pos").to_pylist()
        assert poss == sorted(poss) == list(range(1, len(poss) + 1))
        seen.update(t.column("k").to_pylist())
    assert seen == set(range(400))  # exhaustive, no dup, no loss
