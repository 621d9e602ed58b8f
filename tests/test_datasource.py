"""Spark 4 Python DataSource facade (plans/datasource.py).

The batch format must read byte-identically to SnapshotParquetTable.read()
— across MoR delta layers, schema evolution (rename + add-with-default),
tombstones, and time travel — with bucket pruning driven by pushed key
filters (pure-Python xxhash64 pinned equal to the JVM's). The streaming
format must tail committed versions such that folding the change feed
reproduces the table's final state exactly-once.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.datasource import (
    LakeReader,
    register,
    xxhash64,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

N_CONVS = 40
N_EVENTS = 1500


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=11)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=11)


def _mk(spark, tmp_path, seed_pdf, changes_pdf, n_batches=2, **spec_kw):
    spec = TableSpec(num_buckets=8, merge_mode="mor", **spec_kw)
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    for i, p in enumerate(np.array_split(changes_pdf, n_batches)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    return t


def _pdf(df) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df.select(*cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_python_xxhash_matches_jvm(spark):
    """The planner-side bucket routing must equal F.xxhash64 exactly —
    short strings, >32-byte strings (the 4-lane path), and unicode."""
    vals = (
        [f"conv-{i:04d}" for i in range(20)]
        + ["", "a", "ab", "abc", "abcd" * 3, "x" * 31, "y" * 32, "z" * 100]
        + ["naïve-ütf8-ключ", "日本語のテキスト行"]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    jvm = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert xxhash64(v.encode("utf-8")) == jvm[v], v
    # integer bucket columns: int64 hashes its 8 LE bytes, int32 its 4
    longs = [0, 1, 7, 42, -5, 2**40 + 3, -(2**62)]
    dfl = spark.createDataFrame([(v,) for v in longs], "v long")
    jl = {r["v"]: r["h"] for r in dfl.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in longs:
        assert xxhash64(int(v).to_bytes(8, "little", signed=True)) == jl[v], v
    dfi = spark.createDataFrame([(v,) for v in [0, 7, -3, 2**30]], "v int")
    ji = {r["v"]: r["h"] for r in dfi.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in ji:
        assert xxhash64(int(v).to_bytes(4, "little", signed=True)) == ji[v], v


def test_vectorized_xxhash_matches_jvm(spark):
    """The writer's batch bucket routing (functions/xxh.py numpy lanes over
    Arrow buffers) must equal pmod(F.xxhash64(col), n) bit-for-bit."""
    import pyarrow as pa

    from ccdb_data_pipeline_spark.functions.xxh import bucket_of

    import random

    random.seed(5)
    strs = (
        ["", "a", "conv-0001", "x" * 31, "y" * 32, "z" * 100, "naïve-ütf8", "日本語"]
        + ["".join(random.choices("abc-012", k=random.randint(0, 60))) for _ in range(150)]
    )
    df = spark.createDataFrame([(v,) for v in strs], "v string")
    jvm = [
        r["b"]
        for r in df.select(F.pmod(F.xxhash64("v"), F.lit(16)).alias("b")).collect()
    ]
    assert list(bucket_of(pa.array(strs), 16, "string")) == jvm
    longs = [0, 1, -5, 2**40 + 3] + [random.randint(-(2**62), 2**62) for _ in range(150)]
    dfl = spark.createDataFrame([(v,) for v in longs], "v long")
    jvml = [
        r["b"]
        for r in dfl.select(F.pmod(F.xxhash64("v"), F.lit(16)).alias("b")).collect()
    ]
    assert list(bucket_of(pa.array(longs, pa.int64()), 16, "long")) == jvml


def test_batch_read_matches_table_read(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf)
    # leave delta layers in place (no compact) so the reader's fold runs
    assert any(e.get("delta") for fs in t.manifest()["buckets"].values() for e in fs)
    register(spark)
    got = spark.read.format("transcript_lake").load(t.root)
    assert got.schema == t.read().schema
    pd.testing.assert_frame_equal(_pdf(got), _pdf(t.read()))


def test_batch_read_after_schema_evolution(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf)
    t.rename_column("tool", "tool_name")
    t.add_column("priority", "int", default=7)
    register(spark)
    got = spark.read.format("transcript_lake").load(t.root)
    exp = t.read()
    assert got.schema == exp.schema
    pd.testing.assert_frame_equal(_pdf(got), _pdf(exp))
    assert _pdf(got)["priority"].eq(7).all()  # initial default visible


def test_columns_option_prunes_payload(spark, tmp_path, seed_pdf, changes_pdf):
    """option('columns', ...) prunes at the parquet reads (keys always
    ride) and survives a rename between eras."""
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf)
    register(spark)
    got = (
        spark.read.format("transcript_lake")
        .option("columns", "text")
        .load(t.root)
    )
    assert got.columns == ["conv_id", "turn_idx", "text"]
    exp = t.read().select("conv_id", "turn_idx", "text")
    pd.testing.assert_frame_equal(_pdf(got), _pdf(exp))
    # rename text -> body: old files' physical column is still 'text';
    # the pruned read must back-map through the rename event
    t.rename_column("text", "body")
    got2 = (
        spark.read.format("transcript_lake")
        .option("columns", "body")
        .load(t.root)
    )
    exp2 = t.read().select("conv_id", "turn_idx", "body")
    pd.testing.assert_frame_equal(_pdf(got2), _pdf(exp2))
    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("transcript_lake").option("columns", "nope").load(t.root).schema


def test_time_travel_version_option(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf)
    v_mid = t.current_version() - 1
    register(spark)
    got = (
        spark.read.format("transcript_lake")
        .option("version", v_mid)
        .load(t.root)
    )
    pd.testing.assert_frame_equal(_pdf(got), _pdf(t.read(version=v_mid)))


def test_filter_pushdown_prunes_buckets(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf)
    register(spark)
    key = seed_pdf["conv_id"].iloc[0]
    key2 = seed_pdf["conv_id"].iloc[1]

    # planner-level: pushed equality keeps only the key's bucket
    r = LakeReader({"path": t.root})
    n_all = len(r.partitions())
    r2 = LakeReader({"path": t.root})
    r2.pushFilters([EqualTo(("conv_id",), key)])
    assert len(r2.partitions()) == 1
    r3 = LakeReader({"path": t.root})
    r3.pushFilters([In(("conv_id",), (key, key2))])
    assert 1 <= len(r3.partitions()) <= 2 < n_all

    # end-to-end: the pruned read returns exactly the filtered table
    got = (
        spark.read.format("transcript_lake")
        .load(t.root)
        .filter(F.col("conv_id") == key)
    )
    exp = t.read().filter(F.col("conv_id") == key)
    pd.testing.assert_frame_equal(_pdf(got), _pdf(exp))


def test_first_row_table_resolves_min_pair(spark, tmp_path, seed_pdf, changes_pdf):
    """A first-row table through the facade must resolve the MINIMUM
    (ts, lsn) writer with permanent-erase deletes — NOT max-LWW (files are
    schema-identical to LWW tables; the manifest engine flag routes the
    fold). Checked against the engine's own read across delta layers and
    after compaction."""
    spec = TableSpec(num_buckets=8, merge_mode="mor", first_row=True)
    t = SnapshotParquetTable(spark, str(tmp_path / "fr"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    for i, h in enumerate(np.array_split(changes_pdf, 3)):
        t.merge_events(spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
    register(spark)
    got = spark.read.format("transcript_lake").load(t.root)
    pd.testing.assert_frame_equal(_pdf(got), _pdf(t.read()))
    # the facade result must actually differ from a max-LWW reading
    # (guards against silently falling back to the wrong fold)
    lww = SnapshotParquetTable(
        spark, str(tmp_path / "frlww"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    lww.create(TRANSCRIPT_SCHEMA)
    for i, h in enumerate(np.array_split(changes_pdf, 3)):
        lww.merge_events(spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
    assert not _pdf(got).equals(_pdf(lww.read()))
    t.compact()  # tombstone reclaim auto-downgraded on first-row
    pd.testing.assert_frame_equal(
        _pdf(spark.read.format("transcript_lake").load(t.root)), _pdf(t.read())
    )


def test_patch_table_served_by_facade(spark, tmp_path, seed_pdf):
    """Round 4: the facade READ resolves partial-update tables too (the
    per-column compose, params from the manifest engine block) — the old
    refusal is gone; parity with the engine read on the transcript shape."""
    spec = TableSpec(num_buckets=4, merge_mode="mor", partial_updates=True)
    t = SnapshotParquetTable(spark, str(tmp_path / "ptable"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, seed_pdf.pipe(lambda p: t.spark.createDataFrame(p, TRANSCRIPT_SCHEMA)))
    register(spark)
    got = (
        spark.read.format("transcript_lake").load(t.root)
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    want = t.read().orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(got, want)


def test_writer_commit_conflict_rebases(spark, tmp_path, seed_pdf, changes_pdf):
    """Two facade writers planned against the SAME snapshot: the CAS loser
    must retry onto the winner's head and BOTH batches' entries survive
    (MoR appends are rebase-safe)."""
    import pyarrow as pa

    from ccdb_data_pipeline_spark.plans.datasource import LakeWriter

    spec = TableSpec(num_buckets=4, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "cw"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))

    halves = np.array_split(changes_pdf, 2)

    def batches(pdf):
        return spark.createDataFrame(pdf, CHANGE_SCHEMA).toArrow().to_batches()

    # both writers plan against the SAME manifest version
    wa = LakeWriter({"path": t.root, "batchid": "0"}, overwrite=False)
    wb = LakeWriter({"path": t.root, "batchid": "1"}, overwrite=False)
    ma = wa.write(iter(batches(halves[0])))
    mb = wb.write(iter(batches(halves[1])))
    wa.commit([ma])          # A wins the CAS
    wb.commit([mb])          # B's expected_ref is stale -> retry onto A's head
    t.refresh()
    assert t.last_batch_id == 1
    # both batches' delta entries present
    m = t.manifest()
    deltas = [e for fs in m["buckets"].values() for e in fs if e.get("delta")]
    lsns = set()
    for e in deltas:
        lsns.add((e["lsn_min"], e["lsn_max"]))
    lo_all = min(x[0] for x in lsns)
    hi_all = max(x[1] for x in lsns)
    assert lo_all == int(changes_pdf["lsn"].min())
    assert hi_all == int(changes_pdf["lsn"].max())
    # and the state equals the engine applying the same two batches
    ref = SnapshotParquetTable(spark, str(tmp_path / "cwref"), spec)
    ref.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(ref, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    for i, h in enumerate(halves):
        apply_changes(ref, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
    pd.testing.assert_frame_equal(_pdf(t.read()), _pdf(ref.read()))


def test_streaming_changes_rebuild_state(spark, tmp_path, seed_pdf, changes_pdf):
    """Fold the streamed change feed (latest _lsn_applied per key; drop
    deletes) — must reproduce the table's final state exactly."""
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf, n_batches=3)
    register(spark)
    feed = (
        spark.readStream.format("transcript_changes")
        .option("startingVersion", 0)
        .load(t.root)
    )
    qname = "ds_changes_feed"
    q = (
        feed.writeStream.format("memory")
        .queryName(qname)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(qname)
    assert rows.count() > 0
    assert set(r["_change_type"] for r in rows.select("_change_type").distinct().collect()) <= {
        "upsert",
        "delete",
    }
    # versions on the feed are committed merge/bootstrap versions only
    user_cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    dom = F.struct(
        F.coalesce(F.col("_ts_applied"), F.to_timestamp(F.lit("1970-01-01"))),
        F.coalesce(F.col("_lsn_applied"), F.lit(-1)),
    )
    latest = (
        rows.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("_change_type", *[c for c in user_cols if c not in ("conv_id", "turn_idx")]),
                dom,
            ).alias("w")
        )
        .select("conv_id", "turn_idx", "w.*")
        .filter(F.col("_change_type") == "upsert")
        .drop("_change_type")
    )
    pd.testing.assert_frame_equal(_pdf(latest), _pdf(t.read()))


def test_streaming_resume_no_duplicates(spark, tmp_path, seed_pdf, changes_pdf):
    """Version offsets checkpoint across restarts: a second availableNow run
    from the same checkpoint must emit ONLY commits made after the first."""
    spec = TableSpec(num_buckets=8, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    halves = np.array_split(changes_pdf, 2)
    apply_changes(t, spark.createDataFrame(halves[0], CHANGE_SCHEMA), batch_id=0)
    register(spark)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "feed_out")

    def run():
        feed = (
            spark.readStream.format("transcript_changes")
            .option("startingVersion", 0)
            .load(t.root)
        )
        q = (
            feed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    first = run()
    versions_a = {r["_commit_version"] for r in first.select("_commit_version").distinct().collect()}
    assert versions_a
    apply_changes(t, spark.createDataFrame(halves[1], CHANGE_SCHEMA), batch_id=1)
    all_rows = run()
    versions_b = {
        r["_commit_version"]
        for r in all_rows.select("_commit_version").distinct().collect()
    } - versions_a
    assert versions_b, "second run saw the new commit"
    # exactly-once across the restart: no (key, lsn, version) row duplicated
    dups = (
        all_rows.groupBy("conv_id", "turn_idx", "_lsn_applied", "_commit_version")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0, "restart replayed already-committed versions"
    user_cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    dom = F.struct(
        F.coalesce(F.col("_ts_applied"), F.to_timestamp(F.lit("1970-01-01"))),
        F.coalesce(F.col("_lsn_applied"), F.lit(-1)),
    )
    latest = (
        all_rows.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("_change_type", *[c for c in user_cols if c not in ("conv_id", "turn_idx")]),
                dom,
            ).alias("w")
        )
        .select("conv_id", "turn_idx", "w.*")
        .filter(F.col("_change_type") == "upsert")
        .drop("_change_type")
    )
    pd.testing.assert_frame_equal(_pdf(latest), _pdf(t.read()))


def test_writer_matches_engine_apply(spark, tmp_path, seed_pdf, changes_pdf):
    """df.write.format('transcript_lake') must land the same final state as
    the engine's own apply_changes over the identical change batches."""
    register(spark)
    halves = np.array_split(changes_pdf, 2)

    spec = TableSpec(num_buckets=8, merge_mode="mor")
    ref = SnapshotParquetTable(spark, str(tmp_path / "ref"), spec)
    ref.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(ref, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    for i, h in enumerate(halves):
        apply_changes(ref, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)

    t = SnapshotParquetTable(spark, str(tmp_path / "viaw"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    for i, h in enumerate(halves):
        (
            spark.createDataFrame(h, CHANGE_SCHEMA)
            .write.format("transcript_lake")
            .option("batchId", i)
            .mode("append")
            .save(t.root)
        )
    t.refresh()  # the facade committed outside this handle
    # NOTE the engine normalizes payload text on apply; the facade writer
    # appends raw events — compare the LWW-resolved KEY/dominance state and
    # raw-vs-raw text through a raw-append reference instead when normalize
    # differs. The default generator emits already-normal text, so full
    # frame equality holds.
    pd.testing.assert_frame_equal(_pdf(t.read()), _pdf(ref.read()))

    # exactly-once: replaying an already-committed batchId is a no-op
    v_before = t.current_version()
    (
        spark.createDataFrame(halves[1], CHANGE_SCHEMA)
        .write.format("transcript_lake")
        .option("batchId", 1)
        .mode("append")
        .save(t.root)
    )
    assert t.current_version() == v_before
    pd.testing.assert_frame_equal(_pdf(t.refresh().read()), _pdf(ref.read()))

    # the engine's own compaction folds the facade's delta files cleanly
    t.compact()
    pd.testing.assert_frame_equal(_pdf(t.read()), _pdf(ref.read()))


def test_bucket_partitioned_write_caps_file_count(spark, tmp_path, seed_pdf, changes_pdf):
    """bucket_partitioned pre-shuffles onto the bucket grid: the facade
    write then emits at most num_buckets files (not tasks x buckets), and
    the state is unchanged."""
    from ccdb_data_pipeline_spark.plans.datasource import bucket_partitioned

    register(spark)
    spec = TableSpec(num_buckets=8, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "bp"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    df = spark.createDataFrame(changes_pdf, CHANGE_SCHEMA).repartition(16)
    (
        bucket_partitioned(df, t.root)
        .write.format("transcript_lake")
        .option("batchId", 0)
        .mode("append")
        .save(t.root)
    )
    m = t.refresh().manifest()
    deltas = [e for fs in m["buckets"].values() for e in fs if e.get("delta")]
    assert 0 < len(deltas) <= spec.num_buckets

    # same input unshuffled on many partitions exceeds the cap
    t2 = SnapshotParquetTable(spark, str(tmp_path / "bp2"), spec)
    t2.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t2, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    df.write.format("transcript_lake").option("batchId", 0).mode("append").save(t2.root)
    m2 = t2.refresh().manifest()
    deltas2 = [e for fs in m2["buckets"].values() for e in fs if e.get("delta")]
    assert len(deltas2) > len(deltas)
    # both land the identical state
    pd.testing.assert_frame_equal(_pdf(t.read()), _pdf(t2.read()))


def test_writer_requires_batch_id_and_refuses_overwrite(spark, tmp_path, seed_pdf):
    register(spark)
    spec = TableSpec(num_buckets=4, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "w2"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    df = spark.createDataFrame(seed_pdf.head(5), TRANSCRIPT_SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("lsn", F.monotonically_increasing_id())
    with pytest.raises(Exception, match="batchId"):
        df.write.format("transcript_lake").mode("append").save(t.root)
    with pytest.raises(Exception, match="append"):
        (
            df.write.format("transcript_lake")
            .option("batchId", 0)
            .mode("overwrite")
            .save(t.root)
        )


def test_batch_cdf_read(spark, tmp_path, seed_pdf, changes_pdf):
    """spark.read.format('transcript_changes') with version bounds: the
    full-range batch read folds to the final state; a bounded read stops
    at endingVersion (== the table state AS OF that version)."""
    t = _mk(spark, tmp_path, seed_pdf, changes_pdf, n_batches=3)
    register(spark)
    full = (
        spark.read.format("transcript_changes")
        .option("startingVersion", 0)
        .load(t.root)
    )
    user_cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    dom = F.struct(
        F.coalesce(F.col("_ts_applied"), F.to_timestamp(F.lit("1970-01-01"))),
        F.coalesce(F.col("_lsn_applied"), F.lit(-1)),
    )

    def fold(rows):
        return (
            rows.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct(
                        "_change_type",
                        *[c for c in user_cols if c not in ("conv_id", "turn_idx")],
                    ),
                    dom,
                ).alias("w")
            )
            .select("conv_id", "turn_idx", "w.*")
            .filter(F.col("_change_type") == "upsert")
            .drop("_change_type")
        )

    pd.testing.assert_frame_equal(_pdf(fold(full)), _pdf(t.read()))
    v_mid = t.current_version() - 1
    bounded = (
        spark.read.format("transcript_changes")
        .option("startingVersion", 0)
        .option("endingVersion", v_mid)
        .load(t.root)
    )
    assert bounded.agg(F.max("_commit_version")).collect()[0][0] <= v_mid
    pd.testing.assert_frame_equal(_pdf(fold(bounded)), _pdf(t.read(version=v_mid)))


def test_lake_to_lake_replication_via_facade(spark, tmp_path, seed_pdf, changes_pdf):
    """A full replication pipeline with ZERO engine imports on the wire:
    table A's change feed (readStream transcript_changes) streamed into
    table B (writeStream transcript_lake) must make B == A. Deletes ride
    the feed's _ts_applied so tombstone dominance replicates exactly."""
    register(spark)
    spec = TableSpec(num_buckets=8, merge_mode="mor")
    a = SnapshotParquetTable(spark, str(tmp_path / "a"), spec)
    a.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(a, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    for i, h in enumerate(np.array_split(changes_pdf, 3)):
        apply_changes(a, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)

    b = SnapshotParquetTable(spark, str(tmp_path / "b"), spec)
    b.create(TRANSCRIPT_SCHEMA)

    feed = (
        spark.readStream.format("transcript_changes")
        .option("startingVersion", 0)
        .load(a.root)
    )
    user_cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    wire = feed.select(
        *user_cols,
        F.when(F.col("_change_type") == "delete", "D").otherwise("U").alias("op"),
        F.col("_lsn_applied").alias("lsn"),
        F.col("_ts_applied"),
    )
    q = (
        wire.writeStream.format("transcript_lake")
        .option("path", b.root)
        .option("tsColumn", "_ts_applied")
        .option("checkpointLocation", str(tmp_path / "repl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pd.testing.assert_frame_equal(_pdf(b.refresh().read()), _pdf(a.read()))


def test_streaming_requires_mor(spark, tmp_path, seed_pdf):
    spec = TableSpec(num_buckets=4, merge_mode="cow")
    t = SnapshotParquetTable(spark, str(tmp_path / "cowt"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    register(spark)
    with pytest.raises(Exception, match="merge-on-read"):
        spark.readStream.format("transcript_changes").load(t.root).schema
