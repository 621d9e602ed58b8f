"""The Arrow partial-update fold (_fold_patches_arrow) must match the pandas
fold value-for-value — winners, tombstones, patch flags, sequence-group
argmax — on randomized streams, and a patch table under fold_engine="arrow"
must replay to the same state as fold_engine="pandas"."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ccdb_data_pipeline_spark.plans.lake import (
    SnapshotParquetTable,
    _fold_patches_arrow,
    _fold_patches_pandas,
)
from ccdb_data_pipeline_spark.schemas import TableSpec
from tests.test_sequence_groups import (
    CHANGE_SEQ_SCHEMA,
    EVENTS,
    SEQ_SCHEMA,
    GROUPS,
    _batch,
    _read_state,
)

KEYS = ["k1", "k2"]
SORT = ["_ts_applied", "_lsn_applied"]
PAYLOAD = ["role", "text", "tool", "meta_seq"]


def _rand_frame(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    patch = rng.random(n) < 0.5
    deleted = (~patch) & (rng.random(n) < 0.2)

    def maybe(vals, p_null):
        out = rng.choice(vals, n).astype(object)
        out[rng.random(n) < p_null] = None
        return out

    pdf = pd.DataFrame(
        {
            "k1": rng.integers(0, 25, n).astype(str),
            "k2": rng.integers(0, 3, n),
            "role": maybe(["user", "assistant"], 0.4),
            "text": maybe(["alpha", "beta", "gamma"], 0.4),
            "tool": maybe(["calc", "search"], 0.6),
            "meta_seq": pd.array(
                [None if rng.random() < 0.4 else int(rng.integers(0, 6)) for _ in range(n)],
                dtype="Int64",
            ),
            "_ts_applied": pd.to_datetime(rng.integers(0, 30, n), unit="s"),
            "_lsn_applied": np.arange(n, dtype=np.int64),
            "_deleted": deleted,
            "_patch": patch,
            "_bucket": np.zeros(n, dtype=np.int64),
            "_op": np.where(deleted, "D", np.where(patch, "P", "U")),
        }
    )
    # mirror the delta-row projection: deletes carry no payload
    for c in PAYLOAD:
        pdf.loc[deleted, c] = None
    return pdf


def _canon(df: pd.DataFrame) -> list:
    """Row tuples normalized across dtype representations (Int64 vs float64
    nullables, numpy vs python bools) so the comparison is value-level."""
    df = df.sort_values(KEYS).reset_index(drop=True)
    rows = []
    for _, r in df.iterrows():
        row = []
        for c in sorted(df.columns):
            v = r[c]
            if pd.isna(v):
                row.append((c, None))
            elif isinstance(v, (bool, np.bool_)):
                row.append((c, bool(v)))
            elif isinstance(v, (int, np.integer)):
                row.append((c, int(v)))
            elif isinstance(v, float) and float(v).is_integer():
                row.append((c, int(v)))
            else:
                row.append((c, v))
        rows.append(tuple(row))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("groups", [None, GROUPS])
def test_arrow_patch_fold_matches_pandas(seed, groups):
    pdf = _rand_frame(seed)
    exp = _fold_patches_pandas(pdf.copy(), KEYS, PAYLOAD, SORT, groups)
    got = _fold_patches_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False), KEYS, PAYLOAD, SORT, groups
    ).to_pandas()
    assert sorted(exp.columns) == sorted(got.columns)
    assert _canon(exp) == _canon(got)


def test_patch_table_arrow_engine_matches_pandas_engine(spark, tmp_path):
    states = {}
    for engine in ("arrow", "pandas"):
        spec = TableSpec(
            num_buckets=4,
            merge_mode="mor",
            partial_updates=True,
            sequence_groups=GROUPS,
            fold_engine=engine,
        )
        t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), engine), spec)
        t.create(SEQ_SCHEMA)
        t.merge_events(_batch(spark, EVENTS[:6]), batch_id=0)
        t.merge_events(_batch(spark, EVENTS[6:]), batch_id=1)
        states[engine] = _read_state(t)
    assert states["arrow"] == states["pandas"]
    assert len(states["arrow"]) > 0
