"""asof_join vs the pandas merge_asof oracle (backward, per-key)."""

import numpy as np
import pandas as pd

from ccdb_data_pipeline_spark.operators.asof import asof_join


def _frames(seed=0, n_left=400, n_right=300, n_keys=7):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, n_keys, n_left),
            "lts": rng.randint(0, 500, n_left).astype("datetime64[s]"),
            "lval": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, n_keys, n_right),
            "rts": rng.randint(0, 500, n_right).astype("datetime64[s]"),
            "lsn": np.arange(n_right, dtype="int64"),
            "rval": rng.rand(n_right),
        }
    )
    # force equal-ts collisions on the right (tiebreak path) and exact
    # left==right ts hits (<= boundary)
    right.loc[1, ["k", "rts"]] = right.loc[0, ["k", "rts"]]
    left.loc[0, ["k", "lts"]] = [right.loc[0, "k"], right.loc[0, "rts"]]
    return left, right


def _expected(left, right):
    # per (k, rts) keep max lsn (the tiebreak winner), then backward asof
    r = (
        right.sort_values("lsn")
        .groupby(["k", "rts"], as_index=False)
        .last()
        .sort_values("rts", kind="mergesort")
    )
    out = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        r.rename(columns={"rts": "asof_ts"}),
        left_on="lts",
        right_on="asof_ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    return out.sort_values(["lval"]).reset_index(drop=True)


def test_asof_join_matches_pandas(spark):
    left, right = _frames()
    l_sdf = spark.createDataFrame(left)
    r_sdf = spark.createDataFrame(right)
    got = (
        asof_join(
            l_sdf, r_sdf, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["lsn", "rval"], right_tiebreak="lsn",
        )
        .toPandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    exp = _expected(left, right)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["asof_lsn"].astype("float64"), exp["lsn"].astype("float64"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        got["asof_ts"].astype("datetime64[ns]"),
        exp["asof_ts"].astype("datetime64[ns]"),
        check_names=False,
    )
    # unmatched lefts exist and carry nulls
    assert got["asof_lsn"].isna().any()


def test_asof_join_exact_boundary_and_left_only_key(spark):
    left = pd.DataFrame(
        {"k": [1, 1, 2], "lts": pd.to_datetime(["2025-01-01 00:00:10",
                                                "2025-01-01 00:00:05",
                                                "2025-01-01 00:00:10"]),
         "lid": [0, 1, 2]}
    )
    right = pd.DataFrame(
        {"k": [1, 1], "rts": pd.to_datetime(["2025-01-01 00:00:05",
                                             "2025-01-01 00:00:08"]),
         "lsn": [10, 11], "rv": ["a", "b"]}
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on=["k"], left_ts="lts", right_ts="rts",
                  right_cols=["lsn", "rv"], right_tiebreak="lsn")
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    # lid 0 at :10 -> right :08 ("b"); lid 1 at :05 -> exact match :05 ("a");
    # lid 2 key 2 -> no right rows at all -> nulls
    assert list(got["asof_rv"]) == ["b", "a", None]


def test_asof_tolerance_discards_stale_matches(spark):
    from datetime import datetime

    from ccdb_data_pipeline_spark.operators.asof import asof_join

    T = lambda s: datetime(2025, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("k", T(10), "fresh"), ("k", T(50), "stale"), ("k", T(5), "none")],
        ["key", "ts", "tag"],
    )
    right = spark.createDataFrame([("k", T(8), "state")], ["key", "ts", "payload"])
    got = {
        r["tag"]: r["asof_payload"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            tolerance_seconds=10,
        ).collect()
    }
    # within 10s -> attached; 42s gap -> discarded; before any state -> null
    assert got == {"fresh": "state", "stale": None, "none": None}


def test_asof_forward_direction(spark):
    from datetime import datetime

    from ccdb_data_pipeline_spark.operators.asof import asof_join

    T = lambda s: datetime(2025, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("k", T(10), "mid"), ("k", T(30), "late"), ("k", T(20), "exact")],
        ["key", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [("k", T(20), "first"), ("k", T(40), "second")], ["key", "ts", "payload"]
    )
    got = {
        r["tag"]: r["asof_payload"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            direction="forward",
        ).collect()
    }
    # nearest FUTURE right; equal ts matches (inclusive); after last -> null
    assert got == {"mid": "first", "exact": "first", "late": "second"}

    # forward tolerance: a next-event further than T seconds is discarded
    got = {
        r["tag"]: r["asof_payload"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            direction="forward", tolerance_seconds=5,
        ).collect()
    }
    assert got == {"mid": None, "exact": "first", "late": None}
