"""Deterministic synthetic binlog/WAL generator (seed table + change stream).

This is the engine's test/bench *source* — the analog of the reference's
Salesforce full/delta export (/root/reference/salesforce/query.py:25,32-33)
replaced by an append-only stream of op-tagged change events
(generalizing the index|delete bulk actions at
/root/reference/complaints/ccdb/index_ccdb.py:103-105).

Every field is a pure function of (lsn, seed) via splitmix64-style hashing —
NOT a sequential RNG — so the stream is identical regardless of how it is
generated (driver pandas vs distributed mapInPandas) or partitioned. That
makes local[8] vs local[32] bench runs byte-identical inputs.

Edge content per FIXTURES.md: Zipf-hot conv_ids (top key >=5% of events),
20/70/10 I/U/D mix, ~5% out-of-order ts, equal-ts/different-lsn pairs,
duplicate-LSN segment replay, delete-vs-late-lower-lsn-update,
insert->update->delete->insert chains, malformed null-key rows, empty-string
and UTF-8 and whitespace-mess text, null timestamps.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta
from typing import Iterator

import numpy as np
import pandas as pd

from ..schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_V2

BASE_TS = datetime(2025, 1, 1, 0, 0, 0)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "calculator", "browser", "code", "sql"])

# Deterministic sentence pool (vocab mirrors conversational/agent text).
_VOCAB = (
    "the quick model agent replied with a plan to search parse filter join "
    "merge sort group window stream batch table row key value fast slow big "
    "small data query tool call result user asked about spark shuffle skew"
).split()


def _pool(n: int = 512) -> np.ndarray:
    out = []
    for i in range(n):
        h = i * 2654435761 % 2**32
        ln = 4 + h % 14
        words = [_VOCAB[(h // (j + 1) + j * 31) % len(_VOCAB)] for j in range(ln)]
        out.append(" ".join(words))
    return np.array(out)


_POOL = _pool()

UTF8_TEXT = "Ḟōö Ƀàŕ 😀 — résumé naïve 中文 тест"
WS_MESS = "  leading\n\nand\t\ttrailing   runs \r\n of  whitespace  "


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 hash."""
    z = x.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) % 2**64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _unit(x: np.ndarray, salt: int) -> np.ndarray:
    return (_mix(x, salt) >> np.uint64(11)).astype(np.float64) * 2.0**-53


def change_fields_for_lsns(
    lsns: np.ndarray, n_convs: int, seed: int = 42, v2: bool = False,
    text_words: int | None = None,
) -> pd.DataFrame:
    """Compute the full change-event row for each LSN (pure hash function).

    ``text_words`` scales the text payload to ~that many words per turn by
    concatenating deterministically-chosen pool sentences (default: one
    sentence, ~10 words). Realistic transcript turns are 100-500 words —
    bench runs should use a realistic size so per-event compute, shuffle
    and write bytes reflect the production workload, not a toy one."""
    lsns = lsns.astype(np.int64)
    u = lsns.astype(np.uint64) ^ np.uint64(seed * 0x5851F42D4C957F2D % 2**64)

    # conv assignment: 6% hot key (skew target: top key >=5%), else power law.
    u_hot = _unit(u, 1)
    u_conv = _unit(u, 2)
    conv_rank = np.minimum((u_conv**3.0 * n_convs).astype(np.int64), n_convs - 1)
    conv_rank = np.where(u_hot < 0.06, 0, conv_rank)
    turn = (_mix(u, 3) % np.uint64(50)).astype(np.int32)

    u_op = _unit(u, 4)
    op = np.where(u_op < 0.20, "I", np.where(u_op < 0.90, "U", "D"))

    # event time: base + lsn seconds; 3% share ts in runs of 4 (equal-ts,
    # different-lsn LWW tie-break); 5% pulled backwards (out-of-order).
    sec = lsns.astype(np.float64)
    u_tie = _unit(u, 5)
    sec = np.where(u_tie < 0.03, (lsns // 4 * 4).astype(np.float64), sec)
    u_ooo = _unit(u, 6)
    sec = np.where(u_ooo < 0.05, sec - (_mix(u, 7) % np.uint64(7200)).astype(np.float64), sec)

    role = ROLES[(_mix(u, 8) % np.uint64(len(ROLES))).astype(np.int64)]
    tool = TOOLS[(_mix(u, 9) % np.uint64(len(TOOLS))).astype(np.int64)]
    tool = np.where(_unit(u, 10) < 0.7, None, tool)

    text = _POOL[(_mix(u, 11) % np.uint64(len(_POOL))).astype(np.int64)].copy()
    if text_words:
        extra_sentences = max(0, round(text_words / 10) - 1)
        for j in range(extra_sentences):
            part = _POOL[(_mix(u, 1009 + 101 * j) % np.uint64(len(_POOL))).astype(np.int64)]
            text = np.char.add(np.char.add(text, " "), part)
    suffix = (_mix(u, 12) % np.uint64(1_000_000)).astype(np.int64).astype(str)
    text = np.char.add(np.char.add(text.astype(str), " t"), suffix)
    text = np.where(lsns % 97 == 0, "", text)
    text = np.where(lsns % 101 == 0, UTF8_TEXT + " t" + pd.Series(suffix).astype(str), text)
    text = np.where(lsns % 103 == 0, WS_MESS, text)

    conv = np.array([f"conv-{r:08d}" for r in conv_rank], dtype=object)
    conv = np.where(lsns % 499 == 0, None, conv)  # malformed: null key, must drop

    ts = pd.Series(pd.Timestamp(BASE_TS) + pd.to_timedelta(sec, unit="s"))
    ts = ts.where(pd.Series(lsns % 211 != 0), pd.NaT)  # null-ts edge

    pdf = pd.DataFrame(
        {
            "lsn": lsns,
            "op": op,
            "conv_id": conv,
            "turn_idx": turn,
            "role": pd.Series(role, dtype=object),
            "text": pd.Series(text, dtype=object),
            "tool": pd.Series(tool, dtype=object),
            "ts": ts,
        }
    )
    # deletes carry no payload (reference delete action is id-only,
    # index_ccdb.py:104-105)
    is_d = pdf["op"] == "D"
    for c in ("role", "text", "tool"):
        pdf.loc[is_d, c] = None
    if v2:
        pdf["turn_idx"] = pdf["turn_idx"].astype(np.int64)
        args = np.where(
            _unit(u, 13) < 0.5, None, np.char.add('{"q": ', np.char.add(suffix, "}"))
        )
        pdf["tool_args"] = pd.Series(args, dtype=object)
        pdf.loc[is_d, "tool_args"] = None
        pdf = pdf[["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "tool_args", "ts"]]
    return pdf


# ------------------------------------------------------------- edge overrides


def _edge_overrides(start_lsn: int, n_events: int) -> list[dict]:
    """Handcrafted rows overriding generated ones at fixed LSNs, building the
    FIXTURES.md scenarios on key ('conv-edge', 1) / ('conv-chain', 2)."""
    if n_events < 400:
        return []
    a = start_lsn + n_events // 2  # late low-lsn update (lands in a LATER segment)
    b = a + 37  # the delete it must NOT resurrect
    t = BASE_TS + timedelta(seconds=float(n_events))
    chain0 = start_lsn + n_events // 4
    rows = [
        # delete-vs-late-lower-lsn-update: equal ts, delete has higher lsn -> D wins.
        dict(lsn=a, op="U", conv_id="conv-edge", turn_idx=1, role="user",
             text="late update must stay dead", tool=None, ts=t),
        dict(lsn=b, op="D", conv_id="conv-edge", turn_idx=1, role=None,
             text=None, tool=None, ts=t),
        # insert -> update -> delete -> insert chain on one key.
        dict(lsn=chain0, op="I", conv_id="conv-chain", turn_idx=2, role="user",
             text="chain v1", tool=None, ts=t + timedelta(seconds=1)),
        dict(lsn=chain0 + 1, op="U", conv_id="conv-chain", turn_idx=2, role="user",
             text="chain v2", tool=None, ts=t + timedelta(seconds=2)),
        dict(lsn=chain0 + 2, op="D", conv_id="conv-chain", turn_idx=2, role=None,
             text=None, tool=None, ts=t + timedelta(seconds=3)),
        dict(lsn=chain0 + 3, op="I", conv_id="conv-chain", turn_idx=2, role="assistant",
             text="chain v4 final", tool="search", ts=t + timedelta(seconds=4)),
    ]
    return rows


def gen_changes_pandas(
    n_events: int,
    n_convs: int = 200,
    seed: int = 42,
    start_lsn: int = 1,
    v2: bool = False,
) -> pd.DataFrame:
    lsns = np.arange(start_lsn, start_lsn + n_events, dtype=np.int64)
    pdf = change_fields_for_lsns(lsns, n_convs, seed, v2=v2)
    over = _edge_overrides(start_lsn, n_events)
    if over and not v2:
        idx = {int(r["lsn"]): r for r in over}
        mask = pdf["lsn"].isin(list(idx))
        for i in pdf.index[mask]:
            for k, v in idx[int(pdf.at[i, "lsn"])].items():
                pdf.at[i, k] = v
    return pdf


def gen_seed_pandas(n_convs: int = 200, seed: int = 42) -> pd.DataFrame:
    """Initial transcript table state: ~n_convs conversations x 1-50 turns,
    monotone ts per conversation (FIXTURES.md section 1)."""
    conv_ids, turns, conv_idx = [], [], []
    rng_u = np.arange(n_convs, dtype=np.uint64) ^ np.uint64(seed + 777)
    n_turns = 1 + (_mix(rng_u, 21) % np.uint64(50)).astype(np.int64)
    for c in range(n_convs):
        k = int(n_turns[c])
        conv_ids.extend([f"conv-{c:08d}"] * k)
        turns.extend(range(k))
        conv_idx.extend([c] * k)
    n = len(conv_ids)
    u = np.arange(n, dtype=np.uint64) ^ np.uint64(seed)
    role = ROLES[(_mix(u, 22) % np.uint64(len(ROLES))).astype(np.int64)]
    tool = np.where(_unit(u, 23) < 0.7, None, TOOLS[(_mix(u, 24) % np.uint64(len(TOOLS))).astype(np.int64)])
    text = _POOL[(_mix(u, 25) % np.uint64(len(_POOL))).astype(np.int64)].astype(object)
    text[::131] = ""
    text[1::131] = None
    text[2::131] = UTF8_TEXT
    text[3::131] = WS_MESS
    conv_h = (_mix(np.array(conv_idx, dtype=np.uint64), 26) % np.uint64(3600)).astype(np.int64)
    ts = pd.Series(
        pd.Timestamp(BASE_TS)
        - pd.to_timedelta(10_000_000, unit="s")
        + pd.to_timedelta(np.array(turns) * 60 + conv_h, unit="s")
    )
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": np.array(turns, dtype=np.int32),
            "role": pd.Series(role, dtype=object),
            "text": pd.Series(text, dtype=object),
            "tool": pd.Series(tool, dtype=object),
            "ts": ts,
        }
    )


# --------------------------------------------------------- segment materializer


def write_segments(
    pdf: pd.DataFrame,
    out_dir: str,
    n_segments: int = 10,
    replay_segment: int | None = 2,
    late_lsns: tuple[int, ...] = (),
    v2: bool = False,
    start_segment: int = 0,
) -> list[str]:
    """Write the change stream as ordered parquet segment files.

    ``replay_segment``: also emit an exact duplicate of that segment later in
    the stream (duplicate-LSN replay — must apply once). ``late_lsns``: rows
    moved from their natural segment into the LAST segment (out-of-lsn-order
    arrival across batches). File mtimes are set strictly increasing so the
    Spark streaming file source processes segments in order.
    ``start_segment`` offsets the segment numbering (and mtimes), so a later
    arrival can be appended to a directory already holding segments.
    """
    os.makedirs(out_dir, exist_ok=True)
    pdf = pdf.sort_values("lsn").reset_index(drop=True)
    late = pdf[pdf["lsn"].isin(late_lsns)]
    rest = pdf[~pdf["lsn"].isin(late_lsns)]
    parts = np.array_split(rest, n_segments)
    if len(late):
        parts[-1] = pd.concat([parts[-1], late]).sort_values("lsn")
    schema = CHANGE_SCHEMA_V2 if v2 else CHANGE_SCHEMA
    paths, t0 = [], 1_700_000_000
    seq = start_segment
    for i, part in enumerate(parts):
        p = os.path.join(out_dir, f"segment-{seq:05d}.parquet")
        _to_parquet(part, p, schema)
        os.utime(p, (t0 + seq, t0 + seq))
        paths.append(p)
        seq += 1
        if replay_segment is not None and i == replay_segment + 1:
            # exact replay of an already-delivered segment (dup LSNs)
            p = os.path.join(out_dir, f"segment-{seq:05d}.parquet")
            _to_parquet(parts[replay_segment], p, schema)
            os.utime(p, (t0 + seq, t0 + seq))
            paths.append(p)
            seq += 1
    return paths


def _to_parquet(pdf: pd.DataFrame, path: str, spark_schema) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = []
    for f in spark_schema.fields:
        t = {
            "bigint": pa.int64(),
            "int": pa.int32(),
            "string": pa.string(),
            "timestamp": pa.timestamp("us"),
        }[f.dataType.simpleString()]
        fields.append(pa.field(f.name, t))
    table = pa.Table.from_pandas(pdf, schema=pa.schema(fields), preserve_index=False)
    pq.write_table(table, path)


# --------------------------------------------------------- distributed generator


def gen_changes_spark(spark, n_events: int, n_convs: int, seed: int = 42,
                      start_lsn: int = 1, v2: bool = False,
                      text_words: int | None = None):
    """Distributed generation of the same (hash-deterministic) stream — for
    bench-scale inputs. mapInPandas keeps it vectorized end-to-end."""
    schema = CHANGE_SCHEMA_V2 if v2 else CHANGE_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lsns = b["id"].to_numpy(dtype=np.int64) + start_lsn
            yield change_fields_for_lsns(lsns, n_convs, seed, v2=v2,
                                         text_words=text_words)

    return spark.range(0, n_events).mapInPandas(gen, schema=schema)
