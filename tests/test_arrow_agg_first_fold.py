"""The Arrow aggregation fold (_fold_agg_arrow) and first-row fold
(_fold_first_arrow) must match their pandas twins value-for-value on
randomized streams — accumulator values, delete-reset cuts, tombstone
dominance — and the lake engines must replay to identical states under
fold_engine="arrow" vs "pandas"."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ccdb_data_pipeline_spark.plans.lake import (
    SnapshotParquetTable,
    _fold_agg_arrow,
    _fold_agg_pandas,
    _fold_first_arrow,
    _fold_first_pandas,
)
from ccdb_data_pipeline_spark.schemas import TableSpec

KEYS = ["uid"]
SORT = ["_ts_applied", "_lsn_applied"]
PAYLOAD = ["ts", "spend", "hi", "lo", "tag"]
AGG_SPEC = {"spend": "sum", "hi": "max", "lo": "min", "tag": "last"}


def _rand_frame(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    deleted = rng.random(n) < 0.25

    def maybe_f(p_null):
        out = rng.normal(size=n).round(3)
        return pd.array([None if rng.random() < p_null else float(v) for v in out],
                        dtype="Float64")

    pdf = pd.DataFrame(
        {
            "uid": rng.integers(0, 20, n),
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
            "spend": pd.array(
                [None if rng.random() < 0.3 else int(v)
                 for v in rng.integers(-5, 100, n)],
                dtype="Int64",
            ),
            "hi": maybe_f(0.4),
            "lo": maybe_f(0.4),
            "tag": np.where(rng.random(n) < 0.5, None,
                            rng.choice(["a", "b", "c"], n)).astype(object),
            "_ts_applied": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
            "_lsn_applied": np.arange(n, dtype=np.int64),
            "_deleted": deleted,
            "_bucket": np.zeros(n, dtype=np.int64),
            "_op": np.where(deleted, "D", "U"),
        }
    )
    for c in PAYLOAD:
        pdf.loc[deleted, c] = None
    return pdf


def _canon(df: pd.DataFrame, keys) -> list:
    df = df.sort_values(keys).reset_index(drop=True)
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
            elif isinstance(v, (float, np.floating)):
                row.append((c, round(float(v), 6)))
            else:
                row.append((c, v))
        rows.append(tuple(row))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_arrow_agg_fold_matches_pandas(seed):
    pdf = _rand_frame(seed)
    exp = _fold_agg_pandas(
        pdf.copy(), KEYS, PAYLOAD, AGG_SPEC, {"spend"}, {"hi", "lo"}
    ).drop(columns=["_delpos"], errors="ignore")
    got = _fold_agg_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False), KEYS, PAYLOAD, AGG_SPEC
    ).to_pandas()
    common = sorted(set(exp.columns) & set(got.columns))
    assert set(got.columns) >= set(common)
    assert _canon(exp[common], KEYS) == _canon(got[common], KEYS)


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_arrow_first_fold_matches_pandas(seed):
    pdf = _rand_frame(seed)
    exp = _fold_first_pandas(pdf.copy(), KEYS, SORT)
    got = _fold_first_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False), KEYS, SORT
    ).to_pandas()
    assert sorted(exp.columns) == sorted(got.columns)
    assert _canon(exp, KEYS) == _canon(got, KEYS)


def test_agg_table_arrow_engine_matches_pandas_engine(spark, tmp_path):
    from tests.test_agg_merge import EV_SCHEMA, SCHEMA, _ev

    events = [
        _ev(1, 1, "I", spend=5, hi=2.0, tag="a"),
        _ev(1, 2, "U", spend=3, lo=1.0),
        _ev(2, 3, "I", spend=7, tag="b"),
        _ev(1, 4, "D"),
        _ev(1, 5, "U", spend=11, hi=9.0, tag="c"),
        _ev(2, 6, "U", spend=-2, lo=-4.5),
        _ev(3, 7, "D"),
    ]
    states = {}
    for engine in ("arrow", "pandas"):
        spec = TableSpec(
            key_cols=("uid",), bucket_col="uid", num_buckets=4,
            merge_mode="mor", agg_spec=dict(AGG_SPEC), fold_engine=engine,
        )
        t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), engine), spec)
        t.create(SCHEMA)
        t.merge_events(spark.createDataFrame(events[:4], EV_SCHEMA), batch_id=0)
        t.merge_events(spark.createDataFrame(events[4:], EV_SCHEMA), batch_id=1)
        states[engine] = sorted(
            (tuple(r) for r in t.read().collect()), key=lambda r: str(r)
        )
    assert states["arrow"] == states["pandas"]
    assert len(states["arrow"]) > 0
