"""Patch-chain stress bound (round-4 verdict item #7): the survivor-set
fold (plans/lake._patch_survivor_mask, round-4 R4-17) is per-bucket numpy
lexsort — O(n log n) in layer rows. A pathological hot key accumulating
10^5 patches, with sequence groups on, must stay bounded on BOTH write
paths:

* raw (``dedupe_on_write=False``): layers physically hold the whole
  chain — compaction must SHED the dominated patches (measured parquet
  footer row counts, not a claim) and repeated sweeps must converge;
* fused (default): every apply folds its batch to a survivor set, so
  layer rows stay bounded as the chain grows — measured too.

Both resolve to the single-batch twin's state (the batch-split
invariance the engine promises for late CDC)."""

import datetime as dt
import random

import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TableSpec

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("other", T.StringType()),
    T.StructField("extra", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

SPEC_KW = dict(
    key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
    op_col="op", num_buckets=4, merge_mode="mor",
    partial_updates=True, sequence_groups={"seq": ("val",)},
    empty_to_null_exempt=(), normalize_ws_cols=(),
)

T0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
N_EVENTS = 100_000
N_LAYERS = 10


def _events(n):
    """One hot key takes ~97% of the events as column-partial patches with
    OUT-OF-ORDER event times (the late-CDC shape the survivor fold
    exists for); a handful of cold keys ride along. Deterministic."""
    rng = random.Random(7)
    rows = [("hot", 0, "v0", "o0", "e0", T0, 0, "I")]
    for cold in range(5):
        rows.append((f"cold{cold}", 0, "c", "c", "c", T0, len(rows), "I"))
    while len(rows) < n:
        lsn = len(rows)
        i = lsn
        ts = T0 + dt.timedelta(seconds=rng.randrange(0, 500_000))
        which = rng.random()
        if which < 0.45:  # seq-group patch: (seq, val) move together
            rows.append(("hot", i % 50, f"v{i}", None, None, ts, lsn, "P"))
        elif which < 0.75:  # other-column patch
            rows.append(("hot", None, None, f"o{i}", None, ts, lsn, "P"))
        elif which < 0.95:  # extra-column patch
            rows.append(("hot", None, None, None, f"e{i}", ts, lsn, "P"))
        else:  # occasional full image
            rows.append(("hot", i % 50, f"v{i}", f"o{i}", f"e{i}", ts, lsn, "U"))
    return rows


def _df(spark, rows):
    sch = T.StructType(list(SCHEMA.fields) + [
        T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())
    ])
    return spark.createDataFrame(rows, sch)


def _layer_rows(t):
    """Physical layer rows from the referenced files' parquet footers —
    ground truth for what every future fold must lexsort."""
    import os

    import pyarrow.parquet as pq

    m = t.refresh().manifest()
    return sum(
        pq.read_metadata(os.path.join(t.root, e["path"])).num_rows
        for fs in m["buckets"].values()
        for e in fs
    )


def _state(t):
    return sorted(
        map(tuple, t.refresh().read().select("k", "seq", "val", "other", "extra").collect())
    )


def _build(spark, root, rows, n_batches, **extra):
    t = SnapshotParquetTable(spark, root, TableSpec(**SPEC_KW, **extra))
    t.create(SCHEMA)
    per = len(rows) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per] if b < n_batches - 1 else rows[b * per :]
        t.merge_events(_df(spark, chunk), batch_id=b)
    return t


@pytest.mark.slow
def test_hot_key_patch_chain_bounded_and_convergent(spark, tmp_path):
    rows = _events(N_EVENTS)

    # single-batch twin: one 10^5-patch fold in one apply — the oracle
    # state, and itself the in-batch O(n log n) stress
    one = _build(spark, str(tmp_path / "one"), rows, 1)

    # RAW write path: layers physically hold the whole chain
    raw = _build(spark, str(tmp_path / "raw"), rows, N_LAYERS,
                 dedupe_on_write=False)
    before = _layer_rows(raw)
    assert before >= N_EVENTS * 0.9, before  # the layers really hold it
    assert _state(raw) == _state(one)

    # first sweep: dominated patches are SHED — measured, not claimed.
    # The survivor set per key is bounded by O(columns + seq-group
    # winners), so 10^5 hot-key patches must collapse by >100x.
    raw.compact(only_dirty=False)
    after1 = _layer_rows(raw)
    assert after1 < before * 0.01, (before, after1)
    assert after1 < 2_000, after1
    assert _state(raw) == _state(one)

    # second sweep: converged (no further shedding, state stable)
    raw.compact(only_dirty=False)
    assert _layer_rows(raw) == after1
    assert _state(raw) == _state(one)

    # FUSED write path (default): every apply folds its batch, so the
    # accumulated layers stay bounded even before any compaction
    fused = _build(spark, str(tmp_path / "fused"), rows, N_LAYERS)
    assert _layer_rows(fused) < 5_000, _layer_rows(fused)
    assert _state(fused) == _state(one)
    fused.compact(only_dirty=False)
    assert _layer_rows(fused) < 2_000
    assert _state(fused) == _state(one)

    # the twin compacts to the same bounded size and state
    one.compact(only_dirty=False)
    assert _state(one) == _state(raw)
    assert _layer_rows(one) < 2_000
