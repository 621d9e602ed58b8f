"""Sequential pandas replay oracle — the referee for CDC correctness.

Applies change events one at a time with the engine's declared semantics
(FIXTURES.md section 4): upsert/delete by (conv_id, turn_idx); an event takes
effect iff its dominance key (coalesce(ts, epoch), lsn) is strictly greater
than the current row's; deletes tombstone; malformed (null-key) rows drop;
payload normalization mirrors the engine (""->null except text; whitespace
collapse on text). Mirrors the reference's replayed-final-state test style
(golden end-to-end fixtures, complaints/ccdb/tests/test_index_ccdb.py:103-151).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd

EPOCH = datetime(1970, 1, 1)
TOMB = object()


def _norm_text(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return " ".join(str(v).split())


def _norm_opt(v):
    if v is None or (isinstance(v, float) and pd.isna(v)) or v == "":
        return None
    return v


def _ts(v):
    if v is None or pd.isna(v):
        return None
    return pd.Timestamp(v).to_pydatetime()


def replay(seed: pd.DataFrame, change_frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Return the expected final table as a pandas DataFrame sorted by key."""
    payload_cols: list[str] = ["role", "text", "tool", "ts"]
    extra_cols: list[str] = []
    state: dict = {}

    for _, r in seed.iterrows():
        key = (r["conv_id"], int(r["turn_idx"]))
        ts = _ts(r["ts"])
        row = {
            "role": _norm_opt(r["role"]),
            "text": _norm_text(r["text"]),
            "tool": _norm_opt(r["tool"]),
            "ts": ts,
        }
        state[key] = ((ts or EPOCH, -1), row)

    for frame in change_frames:
        has_args = "tool_args" in frame.columns
        if has_args and "tool_args" not in extra_cols:
            extra_cols.append("tool_args")
        for _, r in frame.iterrows():
            if r["conv_id"] is None or (isinstance(r["conv_id"], float) and pd.isna(r["conv_id"])):
                continue
            key = (r["conv_id"], int(r["turn_idx"]))
            ts = _ts(r["ts"])
            dom = (ts or EPOCH, int(r["lsn"]))
            cur = state.get(key)
            if cur is not None and dom <= cur[0]:
                continue
            if r["op"] == "D":
                state[key] = (dom, TOMB)
            else:
                row = {
                    "role": _norm_opt(r["role"]),
                    "text": _norm_text(r["text"]),
                    "tool": _norm_opt(r["tool"]),
                    "ts": ts,
                }
                if has_args:
                    row["tool_args"] = _norm_opt(r["tool_args"])
                state[key] = (dom, row)

    out = []
    for (conv, turn), (_dom, row) in state.items():
        if row is TOMB:
            continue
        rec = {"conv_id": conv, "turn_idx": turn}
        rec.update({c: row.get(c) for c in payload_cols + extra_cols})
        out.append(rec)
    df = pd.DataFrame(out, columns=["conv_id", "turn_idx"] + payload_cols + extra_cols)
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def table_to_pandas(df_spark) -> pd.DataFrame:
    """Engine table -> comparable pandas frame (stable key order)."""
    pdf = df_spark.toPandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int64")
    return pdf


def assert_tables_equal(engine: pd.DataFrame, oracle: pd.DataFrame) -> None:
    assert len(engine) == len(oracle), f"row count {len(engine)} != {len(oracle)}"
    ek = list(zip(engine["conv_id"], engine["turn_idx"]))
    ok = list(zip(oracle["conv_id"], oracle["turn_idx"]))
    assert ek == ok, "key sets differ"
    for col in oracle.columns:
        if col in ("conv_id", "turn_idx"):
            continue
        e = engine[col] if col in engine.columns else pd.Series([None] * len(engine))
        o = oracle[col]
        for i in range(len(oracle)):
            ev, ov = e.iloc[i], o.iloc[i]
            e_null = ev is None or (not isinstance(ev, str) and pd.isna(ev))
            o_null = ov is None or (not isinstance(ov, str) and pd.isna(ov))
            if e_null and o_null:
                continue
            if col == "ts":
                assert pd.Timestamp(ev) == pd.Timestamp(ov), f"ts mismatch @{ok[i]}: {ev} != {ov}"
            else:
                assert ev == ov, f"{col} mismatch @{ok[i]}: {ev!r} != {ov!r}"
