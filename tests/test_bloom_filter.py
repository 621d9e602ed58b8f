"""Point-lookup bloom filters: bucket files carry a parquet bloom on the
bucket column so row groups inside a pruned bucket can be skipped too."""

import glob
import os

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TableSpec, TRANSCRIPT_SCHEMA
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable


def _bloom_offsets(spark, root, col):
    """Bloom-filter offset of ``col`` in every data file (-1 = absent)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = []
    for f in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True):
        inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
        try:
            blocks = reader.getFooter().getBlocks()
            for bi in range(blocks.size()):
                cols = blocks.get(bi).getColumns()
                for ci in range(cols.size()):
                    c = cols.get(ci)
                    if c.getPath().toDotString() == col:
                        out.append(c.getBloomFilterOffset())
        finally:
            reader.close()
    return out


def _changes(n):
    return pd.DataFrame(
        {
            "lsn": range(1, n + 1),
            "op": ["I"] * n,
            "conv_id": [f"conv-{i:06d}" for i in range(n)],
            "turn_idx": [0] * n,
            "role": ["user"] * n,
            "text": [f"t{i}" for i in range(n)],
            "tool": [None] * n,
            "ts": pd.Timestamp("2025-01-01"),
        }
    )


@pytest.mark.parametrize("enabled", [True, False])
def test_bloom_on_compacted_files_not_mor_deltas(spark, tmp_path, enabled):
    hconf = spark._jsc.hadoopConfiguration()
    # force plain encoding so the bloom isn't elided in favor of the
    # dictionary (parquet-mr skips blooms for fully dict-encoded chunks)
    hconf.set("parquet.enable.dictionary", "false")
    try:
        spec = TableSpec(num_buckets=2, merge_mode="mor", bloom_filter=enabled)
        t = SnapshotParquetTable(spark, str(tmp_path / "t"), spec)
        t.create(TRANSCRIPT_SCHEMA)
        t.merge(spark.createDataFrame(_changes(4000), CHANGE_SCHEMA), batch_id=0)
        # delta appends are the apply hot path: never bloomed
        assert all(o == -1 for o in _bloom_offsets(spark, t.root, "conv_id"))
        t.compact()
        offs = _bloom_offsets(spark, t.root, "conv_id")
        assert offs, "no data files written"
        if enabled:
            # compaction output (the long-lived base files) carries the bloom
            assert any(o >= 0 for o in offs)
        else:
            assert all(o == -1 for o in offs)
    finally:
        hconf.unset("parquet.enable.dictionary")

    # the read path is unchanged either way
    got = t.read_keys(["conv-000007", "conv-003999"]).orderBy("conv_id").collect()
    assert [r["conv_id"] for r in got] == ["conv-000007", "conv-003999"]


def test_bloom_also_on_cow_rewrite(spark, tmp_path):
    hconf = spark._jsc.hadoopConfiguration()
    hconf.set("parquet.enable.dictionary", "false")
    try:
        spec = TableSpec(num_buckets=2, merge_mode="cow")
        t = SnapshotParquetTable(spark, str(tmp_path / "t"), spec)
        t.create(TRANSCRIPT_SCHEMA)
        t.merge(spark.createDataFrame(_changes(4000), CHANGE_SCHEMA), batch_id=0)
        assert all(o >= 0 for o in _bloom_offsets(spark, t.root, "conv_id"))
    finally:
        hconf.unset("parquet.enable.dictionary")
