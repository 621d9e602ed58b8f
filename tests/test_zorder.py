"""Z-order clustering: interleave correctness vs the driver-side reference,
string-prefix monotonicity, measured row-group skipping vs a plain key sort,
and the lake-level compact(zorder_by=...) path."""

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.zorder import (
    interleave_bits,
    str_prefix_long,
    zorder_key,
    zvalue_py,
)


def test_interleave_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == zvalue_py([r["x"], r["y"]])


def test_str_prefix_is_order_preserving(spark):
    vals = ["", "a", "ab", "abc", "abd", "b", "conv-00001", "conv-00002", "zz"]
    df = spark.createDataFrame([(v,) for v in vals], "s: string")
    got = df.select("s", str_prefix_long(F.col("s")).alias("p")).collect()
    by_s = sorted(got, key=lambda r: r["s"])
    ps = [r["p"] for r in by_s]
    assert ps == sorted(ps)  # non-strict monotone: equal only on shared prefix
    # strings that differ within the 7-char prefix map to distinct longs
    distinct_prefix = {r["s"][:7] for r in got}
    assert len(set(ps)) == len(distinct_prefix)


def _overlaps(path, col, lo, hi):
    """Row groups in a parquet dir whose [min,max] for col intersects [lo,hi]."""
    total = hit = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, fn)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[col]).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
    return hit, total


def test_zorder_skips_row_groups_on_both_dims(spark, tmp_path):
    """Key-sorted files keep ts stats wide in every row group; z-ordered
    files must let a narrow second-dimension window skip most groups while
    key point-lookups still skip most groups."""
    n = 200_000
    df = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(4096)).alias("x"),
            F.pmod(F.xxhash64(F.col("id") + 1_000_000), F.lit(4096)).alias("y"),
        )
        .coalesce(1)
    )
    opts = {"parquet.block.size": "65536"}
    p_sort = str(tmp_path / "keysorted")
    df.sortWithinPartitions("x").write.options(**opts).parquet(p_sort)
    z = zorder_key(df, ["x", "y"], bits=12)
    p_z = str(tmp_path / "zordered")
    (
        df.withColumn("_z", z)
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.options(**opts)
        .parquet(p_z)
    )

    # narrow y window: 64/4096 of the space
    hit_sort, total_sort = _overlaps(p_sort, "y", 2000, 2063)
    hit_z, total_z = _overlaps(p_z, "y", 2000, 2063)
    assert total_sort > 10 and total_z > 10  # several row groups exist
    assert hit_sort == total_sort  # key sort cannot skip on y
    assert hit_z < 0.5 * total_z  # z-order skips most groups on y

    # x point lookup still prunes under z-order (partial tightness)
    hx_z, _ = _overlaps(p_z, "x", 1234, 1234)
    assert hx_z < 0.5 * total_z


def test_compact_zorder_lake(spark, tmp_path):
    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(gen_seed_pandas(n_convs=40, seed=7), TRANSCRIPT_SCHEMA))
    before = sorted(
        tuple(r) for r in t.read().select("conv_id", "turn_idx", "text").collect()
    )
    t.compact(only_dirty=False, zorder_by=("conv_id", "ts"))
    after = sorted(
        tuple(r) for r in t.read().select("conv_id", "turn_idx", "text").collect()
    )
    assert before == after
    m = t.manifest()
    assert m["summary"]["op"] == "compact"
    assert m["summary"]["zorder_by"] == ["conv_id", "ts"]
    # the transient _zorder column never reaches the files
    assert "_zorder" not in t.read().columns
