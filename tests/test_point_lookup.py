"""Point-lookup read path: key->bucket pruning + sorted-compaction stats.

The reference serves single-complaint lookups through its search index
(complaints/ccdb/five_year.py / index_ccdb.py:103-105 doc-id routing); the
Spark-native analog is bucket-partition pruning: hash the requested key with
the same xxhash64 the writer used, scan only those buckets, and let the
pushed IN predicate skip row groups (tight after sorted compaction).
"""

import numpy as np
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ptlookup")
    t = SnapshotParquetTable(
        spark, str(root / "table"), TableSpec(num_buckets=16, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=80, seed=11)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    changes = gen_changes_pandas(2000, n_convs=80, seed=11)
    for i, p in enumerate(np.array_split(changes, 2)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    return t


def test_read_keys_matches_full_scan_filter(lake):
    keys = ["conv-00000003", "conv-00000040", "conv-00000077"]
    got = lake.read_keys(keys).orderBy("conv_id", "turn_idx").collect()
    want = (
        lake.read()
        .filter("conv_id IN ('conv-00000003','conv-00000040','conv-00000077')")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_read_keys_prunes_buckets(lake):
    """The pruned plan must open strictly fewer files than the full scan."""
    full_files = set(lake.read().inputFiles())
    pruned_files = set(lake.read_keys(["conv-00000003"]).inputFiles())
    assert pruned_files
    assert pruned_files < full_files
    # one key -> exactly one bucket's files. Bucket identity comes from the
    # manifest (flat-layout delta files carry no _bucket= path segment).
    m = lake.manifest()
    path_to_bucket = {
        e["path"]: int(b) for b, fs in m["buckets"].items() for e in fs
    }
    buckets = {
        path_to_bucket[p.replace("file:", "").split(lake.root + "/", 1)[1]]
        for p in pruned_files
    }
    assert len(buckets) == 1


def test_read_keys_empty_and_missing(lake):
    assert lake.read_keys([]).count() == 0
    assert lake.read_keys(["conv-99999999"]).count() == 0


def test_sorted_compaction_preserves_state_and_sorts_files(spark, lake):
    before = sorted(
        lake.read().collect(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    lake.compact(sort_within_bucket=True)
    after = sorted(
        lake.read().collect(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    assert before == after
    # every compacted file is internally sorted by (conv_id, turn_idx)
    import pyarrow.parquet as pq

    for path in lake.read().inputFiles():
        local = path.replace("file:", "")
        pdf = pq.read_table(local, columns=["conv_id", "turn_idx"]).to_pandas()
        assert (
            pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            .equals(pdf.reset_index(drop=True))
        )
    # point lookup still correct post-compaction
    assert lake.read_keys(["conv-00000040"]).count() > 0
