"""TIMESTAMP_NTZ-aware probe/residual encoding (round-3 ADVICE, both mediums):

1. Pushed-filter literals for a ``timestamp_ntz`` column materialize as the
   stored WALL CLOCK (TimestampNTZType.fromInternal), not a machine-local
   round trip — the facade's probe encoding must interpret naive-as-UTC for
   NTZ columns and naive-as-LOCAL for ``timestamp`` columns, or manifest
   pruning on a non-UTC host drops files that hold matching rows.
2. The engine's ``read(where=)`` residual built datetime literals with
   ``F.lit(datetime)`` — SESSION-timezone dependent — while the prune tier
   encodes naive-as-UTC (plans.lake._stat_scalar): under a non-UTC session
   timezone the two tiers disagreed and a file could be "provably
   non-matching" by stats yet hold rows the residual would keep. The
   residual now shares the prune encoding (plans.lake._residual_lit).
"""

import datetime as dt
import os
import time as _time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from ccdb_data_pipeline_spark.plans.datasource import (
    LakeReader,
    _probe_scalar,
    _ts_bounds_us,
    register,
)
from ccdb_data_pipeline_spark.plans.lake import (
    SnapshotParquetTable,
    _residual_lit,
    _ts_micros,
)
from ccdb_data_pipeline_spark.schemas import TableSpec


def _with_tz(tz: str):
    old = os.environ.get("TZ")
    os.environ["TZ"] = tz
    _time.tzset()
    return old


def _restore_tz(old):
    if old is None:
        os.environ.pop("TZ", None)
    else:
        os.environ["TZ"] = old
    _time.tzset()


NTZ_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
])

NTZ_SPEC = dict(
    key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
    op_col="op", num_buckets=2, merge_mode="mor",
    empty_to_null_exempt=(), normalize_ws_cols=(),
)


def _mk_ntz(spark, tmp_path, stats_cols=()):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "ntz"), TableSpec(stats_cols=stats_cols, **NTZ_SPEC)
    )
    t.create(NTZ_SCHEMA)
    # two batches in disjoint wall-clock eras (Jan vs Jun 2025)
    b0 = spark.createDataFrame(
        [(f"k{i}", i, dt.datetime(2025, 1, 1, i % 24)) for i in range(20)], NTZ_SCHEMA
    ).select("*", F.col("v").alias("lsn"), F.lit("I").alias("op"))
    t.merge_events(b0, batch_id=0)
    b1 = spark.createDataFrame(
        [(f"j{i}", 100 + i, dt.datetime(2025, 6, 1, i % 24)) for i in range(20)],
        NTZ_SCHEMA,
    ).select("*", F.col("v").alias("lsn"), F.lit("I").alias("op"))
    t.merge_events(b1, batch_id=1)
    return t


# ------------------------------------------ 1. probe encoding unit round-trip


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Tokyo", "UTC"])
def test_ntz_probe_encoding_is_tz_invariant(tz):
    """NTZ fromInternal's shape (the stored wall clock, naive) must encode to
    the SAME wall-clock-as-UTC micros on any host timezone — the manifest
    stats encoding (_ts_micros: naive = UTC). The old .timestamp() inversion
    shifted it by the UTC offset."""
    old = _with_tz(tz)
    try:
        for epoch_us in (1_700_000_000_000_000, 0, 1_735_689_600_123_456):
            wall = T.TimestampNTZType().fromInternal(epoch_us)  # naive wall clock
            assert _probe_scalar(wall, ntz=True) == epoch_us, (tz, epoch_us)
            lo, hi = _ts_bounds_us(
                [GreaterThanOrEqual(("ts",), wall), LessThan(("ts",), wall)],
                ntz=True,
            )
            assert lo == epoch_us and hi == epoch_us, (tz, epoch_us)
        # the timestamp (non-NTZ) path still inverts machine-local naive
        inst = T.TimestampType().fromInternal(1_700_000_000_000_000)
        assert _probe_scalar(inst, ntz=False) == 1_700_000_000_000_000
    finally:
        _restore_tz(old)


def test_lakereader_ntz_ts_bounds_on_shifted_host(spark, tmp_path):
    """pushFilters on an NTZ ts column: the recorded (_ts_lo, _ts_hi) must be
    the wall-clock micros — identical under UTC and a 9h-shifted host."""
    t = _mk_ntz(spark, tmp_path)
    cut = dt.datetime(2025, 3, 1)  # between the two eras
    want = _ts_micros(cut)

    bounds = {}
    for tz in ("UTC", "Asia/Tokyo"):
        old = _with_tz(tz)
        try:
            r = LakeReader({"path": t.root})
            r.pushFilters([GreaterThanOrEqual(("ts",), cut)])
            bounds[tz] = r._ts_lo
        finally:
            _restore_tz(old)
    assert bounds["UTC"] == want
    assert bounds["Asia/Tokyo"] == want  # old code: want - 9h in micros


def test_facade_equals_engine_on_ntz_table(spark, tmp_path):
    """End-to-end: facade read of a TIMESTAMP_NTZ table, with and without a
    ts predicate, equals the engine read."""
    t = _mk_ntz(spark, tmp_path)
    register(spark)
    facade = spark.read.format("transcript_lake").load(t.root)
    assert facade.count() == t.read().count() == 40
    cut = "2025-03-01 00:00:00"
    got = facade.filter(f"ts >= timestamp_ntz'{cut}'").count()
    want = t.read().filter(f"ts >= timestamp_ntz'{cut}'").count()
    assert got == want == 20


# --------------------------- 2. read(where=) residual under non-UTC session tz


def _session_tz(spark, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    return old


def test_read_where_residual_matches_prune_under_session_tz(spark, tmp_path):
    """A datetime where= predicate on a TIMESTAMP stats column must return
    the same rows under any session timezone (naive = UTC, the engine-wide
    convention). The old F.lit(datetime) residual shifted by the session
    offset, disagreeing with the manifest prune tier."""
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = SnapshotParquetTable(
        spark, str(tmp_path / "tzt"),
        TableSpec(stats_cols=("ts",), **{**NTZ_SPEC, "num_buckets": 2}),
    )
    t.create(schema)
    # rows every hour around the cutoff so a +/-5h shift changes the count
    rows = [
        (f"k{i}", i, dt.datetime(2025, 1, 1) + dt.timedelta(hours=i))
        for i in range(24)
    ]
    seed = spark.createDataFrame(rows, schema).select(
        "*", F.col("v").alias("lsn"), F.lit("I").alias("op")
    )
    t.merge_events(seed, batch_id=0)
    cut = dt.datetime(2025, 1, 1, 12)  # naive = UTC by engine convention

    base = t.read(where=[("ts", ">=", cut)]).count()
    assert base == 12
    old = _session_tz(spark, "America/New_York")
    try:
        assert t.read(where=[("ts", ">=", cut)]).count() == 12
        assert t.read(where=[("ts", "in", (cut, cut + dt.timedelta(hours=1)))]).count() == 2
    finally:
        _session_tz(spark, old)


def test_read_where_residual_ntz_column_under_session_tz(spark, tmp_path):
    """Same invariance for a TIMESTAMP_NTZ column: the residual compares
    wall clock via a tz-free cast, never the session zone."""
    t = _mk_ntz(spark, tmp_path, stats_cols=("ts",))
    cut = dt.datetime(2025, 3, 1)
    assert t.read(where=[("ts", ">=", cut)]).count() == 20
    old = _session_tz(spark, "Asia/Tokyo")
    try:
        assert t.read(where=[("ts", ">=", cut)]).count() == 20
        assert t.read(where=[("ts", "<", cut)]).count() == 20
    finally:
        _session_tz(spark, old)


def test_dv_delete_datetime_predicate_under_session_tz(spark, tmp_path):
    """delete_where_dv with a structured datetime predicate: the stats tiers
    (whole-file drop + candidate pruning) and the positional scan must agree
    under a non-UTC session timezone."""
    t = _mk_ntz(spark, tmp_path, stats_cols=("ts",))
    t.compact()  # DV path applies to base files
    old = _session_tz(spark, "America/New_York")
    try:
        rep = t.delete_where_dv([("ts", "<", dt.datetime(2025, 3, 1))])
        total = rep["n_rows_dropped"] + rep["n_dv_positions"] + rep["n_tombstoned"]
        assert total == 20
        assert t.read().count() == 20
        assert t.read().filter("ts < timestamp_ntz'2025-03-01 00:00:00'").count() == 0
    finally:
        _session_tz(spark, old)


def test_residual_lit_shares_stat_encoding():
    """_residual_lit(datetime) must encode through _ts_micros (naive = UTC),
    for both column types — the single-encoding invariant."""
    naive = dt.datetime(2025, 5, 1, 12, 30, 15, 250_000)
    us = _ts_micros(naive)
    inst = _residual_lit(naive, T.TimestampType())
    wall = _residual_lit(naive, T.TimestampNTZType())
    # plan-level check: the instant literal embeds the exact micros; the
    # ntz literal embeds the exact wall-clock string
    assert str(us) in str(inst._jc)
    assert "2025-05-01" in str(wall._jc)


def test_facade_write_on_ntz_table(spark, tmp_path):
    """The facade WRITER serves TIMESTAMP_NTZ tables: the NTZ payload
    column survives the Arrow round trip as wall clock and the engine
    read equals a merge_events twin."""
    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.datasource import LakeWriter

    a = SnapshotParquetTable(spark, str(tmp_path / "na"), TableSpec(**NTZ_SPEC))
    b = SnapshotParquetTable(spark, str(tmp_path / "nb"), TableSpec(**NTZ_SPEC))
    a.create(NTZ_SCHEMA)
    b.create(NTZ_SCHEMA)
    rows = [("k1", 1, dt.datetime(2025, 1, 1, 12)), ("k2", 2, dt.datetime(2025, 6, 1, 6))]
    df = spark.createDataFrame(rows, NTZ_SCHEMA).select(
        "*", F.col("v").alias("lsn"), F.lit("I").alias("op")
    )
    a.merge_events(df, batch_id=0)
    w = LakeWriter({"path": b.root, "batchid": "0"}, overwrite=False,
                   batch_schema=df.schema)
    w.commit([w.write(iter(df.toArrow().to_batches()))])
    sa = sorted(map(tuple, a.read().collect()))
    sb = sorted(map(tuple, b.refresh().read().collect()))
    assert sa == sb
    assert sa[0][2] == dt.datetime(2025, 1, 1, 12)  # wall clock preserved
