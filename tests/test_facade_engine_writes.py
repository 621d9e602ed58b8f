"""DataSource facade write path for ALL FOUR merge engines (round-3 verdict
item #1): LakeWriter projects the engine-correct delta layout — LWW and
first-row as raw dominance rows (schema-identical files; the read resolve
differs), patch with the ``_patch`` marker and within-task
``_fold_patches_arrow``, agg with ``(_agg_reset, _n_contrib)`` partials and
``_fold_agg_arrow`` — so ``df.write.format("transcript_lake")`` serves any
engine. The manifest's engine block carries the full PARAMS (agg_fns,
seq_groups), backfilled by ``_commit``, so the facade needs no TableSpec.

Done-criteria from the verdict: facade-written state == apply_changes-written
state per engine (including after compaction folds the facade deltas), plus
an exactly-once replay no-op per engine."""

import datetime as dt

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.datasource import LakeWriter, register
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TableSpec

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

BASE_SPEC = dict(
    key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
    op_col="op", num_buckets=4, merge_mode="mor",
)

T0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


# (k, v, note, ts_minutes, lsn, op) — exercises same-batch collisions,
# out-of-order dominance, deletes, patches with partial columns, and a
# patch+delete-in-one-batch orphan case
BATCHES = [
    [
        ("a", 1, "a-one", 0, 1, "I"),
        ("b", 2, "b-one", 0, 2, "I"),
        ("c", 3, "c-one", 0, 3, "I"),
        ("a", 10, "a-two", 5, 4, "U"),      # same-batch collision on a
        ("d", 4, "d-one", 1, 5, "I"),
    ],
    [
        ("b", 20, None, 10, 6, "P"),         # patch: v only (note unwritten)
        ("c", None, "c-patched", 9, 7, "P"),  # patch: note only
        ("d", None, None, 11, 8, "D"),        # delete d
        ("e", 50, "e-one", 2, 9, "I"),        # late-ts insert
        ("e", None, "e-patch", 12, 10, "P"),  # patch e in same batch
        ("a", 99, "a-three", 3, 11, "U"),     # OLDER ts than a's (5min) row
    ],
    [
        ("c", None, None, 20, 12, "D"),       # delete c
        ("c", 300, None, 21, 13, "P"),        # patch AFTER delete (orphan)
        ("f", 6, "  spaced   out  ", 22, 14, "I"),  # ws normalization
        ("b", None, "", 23, 15, "U"),         # ""->null normalization (full image)
    ],
]


def _events_df(spark, rows):
    data = [(k, v, note, _ts(m), lsn, op) for (k, v, note, m, lsn, op) in rows]
    sch = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    )
    return spark.createDataFrame(data, sch)


def _events_batch(rows):
    ks, vs, notes, ms, lsns, ops = zip(*rows)
    return pa.record_batch({
        "k": pa.array(ks, pa.string()),
        "v": pa.array(vs, pa.int64()),
        "note": pa.array(notes, pa.string()),
        "ts": pa.array([_ts(m) for m in ms], pa.timestamp("us", tz="UTC")),
        "lsn": pa.array(lsns, pa.int64()),
        "op": pa.array(ops, pa.string()),
    })


def _mk(spark, tmp_path, name, **eng_kw):
    spec = TableSpec(**BASE_SPEC, **eng_kw)
    t = SnapshotParquetTable(spark, str(tmp_path / name), spec)
    t.create(SCHEMA)
    return t


def _state(t):
    t.refresh()
    rows = t.read().collect()
    return sorted((r["k"], r["v"], r["note"]) for r in rows)


def _facade_apply(root, rows, batch_id):
    w = LakeWriter({"path": root, "batchid": str(batch_id)}, overwrite=False)
    msg = w.write(iter([_events_batch(rows)]))
    w.commit([msg])


ENGINES = {
    "lww": {},
    "first_row": {"first_row": True},
    "patch": {"partial_updates": True},
    "agg": {"agg_spec": {"v": "sum", "note": "last"}},
}


def _batches_for(kind):
    if kind in ("patch",):
        return BATCHES
    # non-patch engines have no 'P' op: route patches as updates
    return [[(k, v, n, m, lsn, "U" if op == "P" else op) for (k, v, n, m, lsn, op) in b]
            for b in BATCHES]


@pytest.mark.parametrize("kind", list(ENGINES))
def test_facade_write_equals_engine_apply(spark, tmp_path, kind):
    eng_kw = ENGINES[kind]
    a = _mk(spark, tmp_path, f"eng-{kind}", **eng_kw)
    b = _mk(spark, tmp_path, f"fac-{kind}", **eng_kw)
    for i, rows in enumerate(_batches_for(kind)):
        a.merge_events(_events_df(spark, rows), batch_id=i)
        _facade_apply(b.root, rows, batch_id=i)
        assert _state(a) == _state(b), (kind, i)
    # exactly-once: replaying the last batch through the facade is a no-op
    head = SnapshotParquetTable(None, b.root).current_version()
    _facade_apply(b.root, _batches_for(kind)[-1], batch_id=len(BATCHES) - 1)
    assert SnapshotParquetTable(None, b.root).current_version() == head
    # compaction folds the facade-written deltas to the same state
    b.refresh().compact(only_dirty=False)
    assert _state(a) == _state(b), (kind, "post-compaction")
    m = b.refresh().manifest()
    assert not any(e.get("delta") for fs in m["buckets"].values() for e in fs)


def test_facade_write_patch_with_sequence_groups(spark, tmp_path):
    """Sequence-group columns fold atomically by their OWN (seq, lsn)
    order — the facade fold must honor the manifest's seq_groups params."""
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("other", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    spec_kw = dict(
        key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
        op_col="op", num_buckets=2, merge_mode="mor",
        partial_updates=True, sequence_groups={"seq": ("val",)},
    )
    a = SnapshotParquetTable(spark, str(tmp_path / "sga"), TableSpec(**spec_kw))
    b = SnapshotParquetTable(spark, str(tmp_path / "sgb"), TableSpec(**spec_kw))
    a.create(schema)
    b.create(schema)
    assert b.manifest()["engine"]["seq_groups"] == {"seq": ["val"]}

    rows = [
        # (k, seq, val, other, ts_min, lsn, op) — group winner is seq=9
        ("g", 5, "five", "x", 0, 1, "I"),
        ("g", 9, "nine", None, 1, 2, "P"),   # higher seq, earlier lsn wins group
        ("g", 7, "seven", "y", 2, 3, "P"),   # lower seq loses despite later lsn
        ("h", None, None, "h0", 0, 4, "I"),
    ]
    sch = T.StructType(list(schema.fields) + [
        T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())
    ])
    df = spark.createDataFrame(
        [(k, s, v, o, _ts(m), lsn, op) for (k, s, v, o, m, lsn, op) in rows], sch
    )
    a.merge_events(df, batch_id=0)

    ks, seqs, vals, others, ms, lsns, ops = zip(*rows)
    batch = pa.record_batch({
        "k": pa.array(ks, pa.string()),
        "seq": pa.array(seqs, pa.int64()),
        "val": pa.array(vals, pa.string()),
        "other": pa.array(others, pa.string()),
        "ts": pa.array([_ts(m) for m in ms], pa.timestamp("us", tz="UTC")),
        "lsn": pa.array(lsns, pa.int64()),
        "op": pa.array(ops, pa.string()),
    })
    w = LakeWriter({"path": b.root, "batchid": "0"}, overwrite=False)
    w.commit([w.write(iter([batch]))])

    sa = sorted(map(tuple, a.read().select("k", "seq", "val", "other").collect()))
    sb = sorted(map(tuple, b.refresh().read().select("k", "seq", "val", "other").collect()))
    assert sa == sb
    assert ("g", 9, "nine", "y") in sa


def test_facade_write_agg_through_spark_writer(spark, tmp_path):
    """The real distributed path: df.write.format('transcript_lake') onto an
    aggregation-engine table — one green end-to-end write per the verdict's
    done-criterion, checked against the engine apply."""
    eng_kw = ENGINES["agg"]
    a = _mk(spark, tmp_path, "spark-agg-a", **eng_kw)
    b = _mk(spark, tmp_path, "spark-agg-b", **eng_kw)
    register(spark)
    for i, rows in enumerate(_batches_for("agg")):
        a.merge_events(_events_df(spark, rows), batch_id=i)
        (
            _events_df(spark, rows)
            .write.format("transcript_lake")
            .option("batchId", str(i))
            .mode("append")
            .save(b.root)
        )
        assert _state(a) == _state(b), i


def test_facade_agg_refuses_paramless_manifest(spark, tmp_path):
    """An agg table whose manifest predates engine params must be refused
    with a backfill hint, never mis-folded with default fns."""
    import json
    import os

    t = _mk(spark, tmp_path, "noparams", **ENGINES["agg"])
    mpath = os.path.join(t.root, "manifests", f"m-{t.current_version():010d}.json")
    m = json.loads(open(mpath).read())
    m["engine"].pop("agg_fns", None)
    open(mpath, "w").write(json.dumps(m))
    with pytest.raises(ValueError, match="agg_fns"):
        LakeWriter({"path": t.root, "batchid": "0"}, overwrite=False)


def test_facade_write_schema_evolution(spark, tmp_path):
    """A replication sink whose SOURCE evolved must not silently drop the
    new columns: the facade writer applies the engine's schema-union rules
    (column add + widen) and allocates the schema era at commit. Twin
    check against merge_events on the same batches."""
    a = _mk(spark, tmp_path, "evo-a")
    b = _mk(spark, tmp_path, "evo-b")
    rows0 = [("a", 1, "a-one", 0, 1, "I"), ("b", 2, "b-one", 0, 2, "I")]
    a.merge_events(_events_df(spark, rows0), batch_id=0)
    _facade_apply(b.root, rows0, batch_id=0)

    # batch 1 adds a column and widens v long->long (add only here)
    evo_schema = T.StructType(
        list(SCHEMA.fields)
        + [
            T.StructField("tool", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    data = [
        ("a", 10, "a-two", "bash", _ts(5), 3, "U"),
        ("c", 3, "c-one", None, _ts(5), 4, "I"),
    ]
    df = spark.createDataFrame(
        [(k, v, n, tool, ts, lsn, op) for (k, v, n, tool, ts, lsn, op) in data],
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("note", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
        ]),
    )
    a.merge_events(df, batch_id=1)

    batch = pa.record_batch({
        "k": pa.array([d[0] for d in data], pa.string()),
        "v": pa.array([d[1] for d in data], pa.int64()),
        "note": pa.array([d[2] for d in data], pa.string()),
        "tool": pa.array([d[3] for d in data], pa.string()),
        "ts": pa.array([d[4] for d in data], pa.timestamp("us", tz="UTC")),
        "lsn": pa.array([d[5] for d in data], pa.int64()),
        "op": pa.array([d[6] for d in data], pa.string()),
    })
    w = LakeWriter({"path": b.root, "batchid": "1"}, overwrite=False,
                   batch_schema=df.schema)
    w.commit([w.write(iter([batch]))])

    bt = SnapshotParquetTable(spark, b.root, TableSpec(**BASE_SPEC))
    assert "tool" in [f.name for f in bt.schema.fields]
    sa = sorted(map(tuple, a.read().select("k", "v", "note", "tool").collect()))
    sb = sorted(map(tuple, bt.read().select("k", "v", "note", "tool").collect()))
    assert sa == sb
    assert ("a", 10, "a-two", "bash") in sb
    assert ("b", 2, "b-one", None) in sb  # pre-evolution row null-fills
    # the evolved commit allocated a new schema era
    m = bt.manifest()
    assert int(m["current_schema_id"]) >= 1
    assert str(m["current_schema_id"]) in m["schemas"]


def test_bucket_widening_refused_everywhere(spark, tmp_path):
    """Widening the BUCKET column re-hashes keys (xxhash64 is
    width-dependent) — both the engine and the facade must refuse."""
    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    spec = TableSpec(
        key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
        op_col="op", num_buckets=2, merge_mode="mor",
        empty_to_null_exempt=(), normalize_ws_cols=(),
    )
    t = SnapshotParquetTable(spark, str(tmp_path / "bw"), spec)
    t.create(schema)
    seed = spark.createDataFrame(
        [(1, 10, _ts(0))], schema
    ).select("*", F.lit(1).cast("long").alias("lsn"), F.lit("I").alias("op"))
    t.merge_events(seed, batch_id=0)
    wide = spark.createDataFrame(
        [(2, 20, _ts(1))],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]),
    ).select("*", F.lit(2).cast("long").alias("lsn"), F.lit("U").alias("op"))
    with pytest.raises(ValueError, match="bucket column"):
        t.merge_events(wide, batch_id=1)
    with pytest.raises(ValueError, match="bucket column"):
        LakeWriter({"path": t.root, "batchid": "1"}, overwrite=False,
                   batch_schema=wide.schema)
    # widening a NON-bucket column stays allowed
    ok = spark.createDataFrame(
        [(3, 30, _ts(2))], schema
    ).select("*", F.lit(3).cast("long").alias("lsn"), F.lit("I").alias("op"))
    t.merge_events(ok, batch_id=1)
    assert t.read().count() == 2


@pytest.mark.parametrize("kind", list(ENGINES))
def test_facade_read_serves_every_engine(spark, tmp_path, kind):
    """Round 4: the facade READ resolves all four engines too (params from
    the manifest engine block) — spark.read.format('transcript_lake') must
    equal the engine read before AND after compaction, with and without
    column pruning."""
    register(spark)
    t = _mk(spark, tmp_path, f"fr-{kind}", **ENGINES[kind])
    for i, rows in enumerate(_batches_for(kind)):
        t.merge_events(_events_df(spark, rows), batch_id=i)

    def facade_state(**opts):
        r = spark.read.format("transcript_lake").options(**opts).load(t.root)
        return sorted(map(tuple, r.select("k", "v", "note").collect()))

    want = sorted(map(tuple, t.read().select("k", "v", "note").collect()))
    assert facade_state() == want, kind
    # column pruning through the engine folds
    pruned = spark.read.format("transcript_lake").option("columns", "v").load(t.root)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, t.read(columns=["k", "v"]).collect())
    ), kind
    # post-compaction (base files carry the folded state; patch orphans ride)
    t.compact(only_dirty=False)
    assert facade_state() == sorted(
        map(tuple, t.refresh().read().select("k", "v", "note").collect())
    ), kind


def test_facade_streaming_write_evolves_schema(spark, tmp_path):
    """writeStream.format('transcript_lake') with a source that carries a
    NEW column: the stream writer (constructed once with the stream's
    schema) evolves the target instead of silently dropping it."""
    import numpy as np

    register(spark)
    t = _mk(spark, tmp_path, "sevo")
    rows0 = [("a", 1, "a-one", 0, 1, "I")]
    t.merge_events(_events_df(spark, rows0), batch_id=0)

    src_dir = str(tmp_path / "src")
    evo = spark.createDataFrame(
        [("b", 2, "b-one", "t0", _ts(1), 2, "I"),
         ("a", 9, "a-two", "t1", _ts(2), 3, "U")],
        "k string, v long, note string, tool string, ts timestamp, lsn long, op string",
    )
    evo.repartition(2).write.parquet(src_dir)
    stream = spark.readStream.schema(evo.schema).parquet(src_dir)
    q = (
        stream.writeStream.format("transcript_lake")
        .option("path", t.root)
        .option("batchIdOffset", "1")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t2 = SnapshotParquetTable(spark, t.root, TableSpec(**BASE_SPEC))
    assert "tool" in [f.name for f in t2.schema.fields]
    got = sorted(map(tuple, t2.read().select("k", "v", "tool").collect()))
    assert got == [("a", 9, "t1"), ("b", 2, "t0")]


def test_patch_replication_through_typed_feed(spark, tmp_path):
    """Patch-table lake->lake replication with ZERO engine imports on the
    wire: the change feed emits TYPED 'patch' rows (a partial is not a full
    image — untyped it would replicate as an upsert whose nulls overwrite),
    the wire maps patch->'P', and the facade sink's patch projection keeps
    the semantics. B must equal A, including a patch whose full image only
    exists on A's side of the boundary."""
    register(spark)
    a = _mk(spark, tmp_path, "repl-a", partial_updates=True)
    b = _mk(spark, tmp_path, "repl-b", partial_updates=True)
    for i, rows in enumerate(BATCHES):
        a.merge_events(_events_df(spark, rows), batch_id=i)

    feed = (
        spark.readStream.format("transcript_changes")
        .option("startingVersion", 0)
        .load(a.root)
    )
    user_cols = [f.name for f in SCHEMA.fields]
    wire = feed.select(
        *user_cols,
        F.when(F.col("_change_type") == "delete", "D")
        .when(F.col("_change_type") == "patch", "P")
        .otherwise("U")
        .alias("op"),
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
    assert _state(b.refresh()) == _state(a)


def test_agg_feed_events_mode_refused_resolved_serves(spark, tmp_path):
    """An agg table's delta rows are partials — explicit ``mode=events``
    must refuse with the resolved-mode pointer, for both batch and
    streaming forms. The DEFAULT (auto) now serves agg tables in RESOLVED
    mode (round-4 verdict item #2): per-commit resolved-state U/D diffs
    whose fold-by-latest-commit equals the engine read."""
    register(spark)
    t = _mk(spark, tmp_path, "aggfeed", **ENGINES["agg"])
    for i, rows in enumerate(_batches_for("agg")):
        t.merge_events(_events_df(spark, rows), batch_id=i)
    with pytest.raises(Exception, match="resolved"):
        spark.read.format("transcript_changes").options(
            startingVersion=0, mode="events"
        ).load(t.root).collect()
    from ccdb_data_pipeline_spark.plans.datasource import ChangesStreamReader

    with pytest.raises(ValueError, match="resolved"):
        ChangesStreamReader({"path": t.root, "mode": "events"})
    # the engine's resolved-state diff still serves it
    assert t.table_changes(0).count() > 0
    # default (auto) feed: fold to the latest commit's image per key,
    # drop deletes -> must equal the engine read exactly
    feed = spark.read.format("transcript_changes").option(
        "startingVersion", 0
    ).load(t.root)
    from pyspark.sql.window import Window

    w = F.row_number().over(
        Window.partitionBy("k").orderBy(F.col("_commit_version").desc())
    )
    latest = feed.withColumn("_rn", w).filter("_rn = 1 AND _change_type = 'upsert'")
    got = sorted(map(tuple, latest.select("k", "v", "note").collect()))
    assert got == _state(t)
    # every resolved upsert carries dominance markers
    assert feed.filter(
        (F.col("_change_type") == "upsert")
        & (F.col("_lsn_applied").isNull() | F.col("_ts_applied").isNull())
    ).count() == 0


def test_cow_table_served_by_resolved_feed(spark, tmp_path):
    """mode=resolved extends the change feed to COPY-ON-WRITE tables —
    previously unservable (a CoW commit's new files are a whole-bucket
    rewrite, not a change set). The resolved diff works off manifests and
    resolved states, so per-commit U/D rows come out exactly like the
    engine's table_changes: folding to the latest commit per key equals
    the table read, and deletes surface as tombstone rows."""
    register(spark)
    spec_kw = dict(BASE_SPEC)
    spec_kw["merge_mode"] = "cow"
    t = SnapshotParquetTable(spark, str(tmp_path / "cowfeed"), TableSpec(**spec_kw))
    t.create(SCHEMA)
    from ccdb_data_pipeline_spark.operators.dedupe import lww_latest

    for i, rows in enumerate(_batches_for("lww")):
        t.merge(lww_latest(_events_df(spark, rows), TableSpec(**spec_kw)), batch_id=i)
    # events mode still refuses CoW, with the resolved-mode pointer
    with pytest.raises(Exception, match="resolved"):
        spark.read.format("transcript_changes").options(
            startingVersion=0, mode="events"
        ).load(t.root).collect()
    feed = spark.read.format("transcript_changes").options(
        startingVersion=0, mode="resolved"
    ).load(t.root)
    from pyspark.sql.window import Window

    w = F.row_number().over(
        Window.partitionBy("k").orderBy(F.col("_commit_version").desc())
    )
    latest = feed.withColumn("_rn", w).filter("_rn = 1 AND _change_type = 'upsert'")
    got = sorted(map(tuple, latest.select("k", "v", "note").collect()))
    assert got == _state(t)
    # the mid-stream delete of 'd' surfaced as a delete row
    assert feed.filter(
        (F.col("k") == "d") & (F.col("_change_type") == "delete")
    ).count() == 1


def test_agg_replication_through_resolved_feed(spark, tmp_path):
    """Round-4 verdict item #2 done-criterion: lake->lake replication of
    an AGGREGATION table with zero engine imports on the wire. The
    resolved feed emits full resolved images whose markers (max ts, max
    lsn over contributions) are strictly increasing per key, so an LWW
    mirror applying upsert/delete ops converges to the source's resolved
    state — including a key deleted mid-stream (reset tombstone carries
    the dominating markers)."""
    register(spark)
    a = _mk(spark, tmp_path, "aggrepl-a", **ENGINES["agg"])
    for i, rows in enumerate(_batches_for("agg")):
        a.merge_events(_events_df(spark, rows), batch_id=i)
    # LWW mirror with the same user schema/keys
    b = _mk(spark, tmp_path, "aggrepl-b")

    feed = (
        spark.readStream.format("transcript_changes")
        .option("startingVersion", 0)
        .load(a.root)
    )
    user_cols = [f.name for f in SCHEMA.fields]
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
        .option("checkpointLocation", str(tmp_path / "aggrepl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _state(b.refresh()) == _state(a)


def test_resolved_feed_streaming_resume_exactly_once(spark, tmp_path):
    """Streaming RESOLVED feed (agg table) across a checkpoint restart:
    the first availableNow run drains the first commits, two more merges
    land, the resumed stream (same checkpoint) serves ONLY the new
    versions — union equals the batch resolved feed exactly (no dupes,
    no holes), the version-offset exactly-once contract in resolved
    mode."""
    register(spark)
    t = _mk(spark, tmp_path, "aggfeedstream", **ENGINES["agg"])
    batches = _batches_for("agg")
    t.merge_events(_events_df(spark, batches[0]), batch_id=0)

    out = str(tmp_path / "feed_out")
    ckpt = str(tmp_path / "feed_ckpt")

    def drain():
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

    first = drain()
    v_first = {r["_commit_version"] for r in first.select("_commit_version").distinct().collect()}
    assert v_first

    t.merge_events(_events_df(spark, batches[1]), batch_id=1)
    t.merge_events(_events_df(spark, batches[2]), batch_id=2)
    all_rows = drain()

    batch_feed = spark.read.format("transcript_changes").option(
        "startingVersion", 0
    ).load(t.root)
    key = lambda r: (r["_commit_version"], r["k"], r["_change_type"], r["v"], r["note"])  # noqa: E731
    got = sorted(map(key, all_rows.collect()))
    want = sorted(map(key, batch_feed.collect()))
    assert got == want  # no dupes, no holes across the restart
    # the resumed run really was incremental (new versions only)
    v_all = {r["_commit_version"] for r in all_rows.select("_commit_version").distinct().collect()}
    assert v_first < v_all
