"""The mapInArrow fused fold (fold_engine="arrow") must be byte-identical to
the mapInPandas fold (fold_engine="pandas"): same LWW winners, same
normalization (""->null with carve-out, unicode whitespace collapse), same
final table state through a multi-batch replay with deletes and late data.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ccdb_data_pipeline_spark.functions.normalize import (
    _normalize_ws_series,
    normalize_arrow_table,
    normalize_pandas_frame,
)
from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable, _fold_lww_arrow
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas

NASTY = [
    None,
    "",
    "already normal",
    "  leading and trailing  ",
    "double  space",
    "tab\tand\nnewline",
    "nbsp\xa0em\u2003ideographic\u3000space",
    "line\u2028paragraph\u2029narrow\u202fsep",
    " \t\xa0 ",  # whitespace-only -> ""
    "ends with nbsp\xa0",
]


def test_ws_parity_pandas_vs_arrow_kernels():
    """normalize_arrow_table's RE2 pass == pandas " ".join(s.split())."""
    spec = TableSpec(empty_to_null_exempt=(), normalize_ws_cols=("text",))
    pdf = pd.DataFrame({"text": NASTY * 3, "other": [""] * len(NASTY) * 3})
    expected = normalize_pandas_frame(pdf.copy(), spec, ["text", "other"])
    tbl = normalize_arrow_table(pa.Table.from_pandas(pdf), spec, ["text", "other"])
    got = tbl.to_pandas()
    assert list(got["text"].fillna("<null>")) == list(expected["text"].fillna("<null>"))
    # ""->null applied to the non-exempt column on both paths
    assert got["other"].isna().all() and expected["other"].isna().all()


def test_fold_lww_arrow_picks_same_winners():
    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "k1": rng.integers(0, 40, n).astype(str),
            "k2": rng.integers(0, 5, n),
            "_ts_applied": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
            "_lsn_applied": np.arange(n, dtype=np.int64),  # unique tie-break
            "payload": [f"v{i}" for i in range(n)],
        }
    )
    keys, sort_cols = ["k1", "k2"], ["_ts_applied", "_lsn_applied"]
    exp = pdf.sort_values(sort_cols, kind="stable").drop_duplicates(keys, keep="last")
    got = _fold_lww_arrow(pa.Table.from_pandas(pdf), keys, sort_cols).to_pandas()
    left = exp.sort_values(keys).reset_index(drop=True)
    right = got.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(left, right, check_like=True)


@pytest.mark.parametrize("n_convs,n_events", [(50, 4000)])
def test_arrow_fold_end_to_end_matches_pandas_fold(spark, tmp_path, n_convs, n_events):
    seed = gen_seed_pandas(n_convs=n_convs, seed=11)
    changes = gen_changes_pandas(n_events, n_convs=n_convs, seed=11)
    # splice nasty text into a slice of the updates so normalization runs
    upd = changes.index[changes["op"] != "D"][: len(NASTY) * 4]
    changes.loc[upd, "text"] = (NASTY * 4)[: len(upd)]

    finals = {}
    for engine in ("arrow", "pandas"):
        spec = TableSpec(num_buckets=8, merge_mode="mor", fold_engine=engine)
        t = SnapshotParquetTable(spark, str(tmp_path / engine), spec)
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
        for i, p in enumerate(np.array_split(changes, 3)):
            apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
        finals[engine] = table_to_pandas(t.read())

    assert_tables_equal(finals["arrow"], finals["pandas"])
    # and both match the pure-pandas replay oracle (normalization included)
    assert_tables_equal(finals["arrow"], replay(seed, [changes]))
