"""Spark 4 Python DataSource facade over the snapshot-parquet lake.

Gives plain-`spark.read` users first-class access to the engine's tables
without importing the engine — the PySpark-native analog of handing an
Iceberg catalog name to a SQL user (the reference's published ES alias is
its version of this surface, index_ccdb.py:45-71):

    from ccdb_data_pipeline_spark.plans.datasource import register
    register(spark)
    df = spark.read.format("transcript_lake").load("/path/to/table")
    feed = (spark.readStream.format("transcript_changes")
                 .option("startingVersion", 0).load("/path/to/table"))

Scale design, in DataSourceV2 terms:

* ``partitions()`` emits one ``InputPartition`` per storage bucket, so a
  1000-executor cluster reads 4096 buckets with full parallelism and
  per-bucket MoR resolution runs where the data is — never on the driver.
* ``pushFilters`` prunes BEFORE the scan: an equality/IN filter on the
  bucket column keeps only the matching buckets (the same
  ``pmod(xxhash64(key), n)`` routing the write path uses, recomputed here
  in pure Python and pinned equal to the JVM in tests), and event-time
  range filters drop files via the manifest's per-file ts min/max footer
  stats. Every filter is *also* returned as unhandled so Spark re-applies
  it post-scan — pruning is a performance contract, correctness stays
  with Catalyst.
* ``read(partition)`` resolves the bucket's base + delta layers to LWW
  winners with the same zero-pandas Arrow kernel the write path uses
  (``plans.lake._fold_lww_arrow``), then drops tombstones and internal
  columns. Buckets with no delta layers stream file batches straight
  through (no fold, bounded memory).
* The streaming source tails the manifest chain: offsets are committed
  table versions, each micro-batch reads only the data files ADDED by
  merge commits in ``(start, end]`` — O(new data) per trigger, and the
  version offset checkpoint makes restarts exactly-once downstream.

Since round 4 the facade is ENGINE-COMPLETE in both directions: all four
merge engines (last-writer-wins, first-row, partial-update, aggregation)
read through per-engine Arrow resolves and write through per-engine
delta projections, with the engine PARAMS (agg_fns, seq_groups) carried
by the manifest so no TableSpec is needed. The change feed emits TYPED
``patch`` rows for partial-update tables (the wire consumer maps them to
op 'P'); aggregation tables are served in RESOLVED mode (round-4 verdict
item #2) — their delta rows are accumulator partials the event feed
cannot carry, so the feed emits per-commit resolved-state U/D diffs (the
facade twin of the engine's ``table_changes()``), making agg tables
replicable through public APIs like every other engine (``mode`` option:
auto | events | resolved). The streaming source additionally requires
merge-on-read mode: CoW merge commits rewrite whole buckets, so "files
added this commit" is not a change set there.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from . import fsio
from ..schemas import AGG_N, AGG_RESET, BUCKET, DELETED, LSN_APPLIED, PATCH, TS_APPLIED

_MASK = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 producing the SIGNED value of Spark's
    ``F.xxhash64`` on the same bytes (Spark seeds with 42). Used only at
    plan time to map a pushed key-equality filter to its storage bucket —
    a handful of hashes per query, never per row. Pinned equal to the JVM
    implementation in tests/test_datasource.py."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _xxh_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ _xxh_round(0, v)) * _P1 + _P4) & _MASK
    else:
        acc = (seed + _P5) & _MASK
    acc = (acc + n) & _MASK
    while i + 8 <= n:
        acc = ((_rotl(acc ^ _xxh_round(0, int.from_bytes(data[i : i + 8], "little")), 27)) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        acc = ((_rotl(acc ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK, 23)) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        acc = (_rotl(acc ^ (data[i] * _P5) & _MASK, 11) * _P1) & _MASK
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _MASK
    acc ^= acc >> 29
    acc = (acc * _P3) & _MASK
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def _key_bucket(value, num_buckets: int, spark_type: str = "string") -> int | None:
    """``pmod(xxhash64(key), n)`` — the write path's routing, in Python.

    Spark's xxhash64 hashes a string's UTF-8 bytes, an int32's 4
    little-endian bytes, an int64's 8 (pinned equal to the JVM in
    tests/test_datasource.py). Unknown types return None = don't prune."""
    if spark_type == "string":
        data = str(value).encode("utf-8")
    elif spark_type in ("long", "bigint"):
        data = int(value).to_bytes(8, "little", signed=True)
    elif spark_type in ("integer", "int"):
        data = int(value).to_bytes(4, "little", signed=True)
    else:
        return None
    return xxhash64(data) % num_buckets


# --------------------------------------------------------------- manifest IO


def _head_version(root: str) -> int:
    return int(fsio.read_text(os.path.join(root, "HEAD")).strip())


def _manifest(root: str, version: int) -> dict:
    return json.loads(
        fsio.read_text(os.path.join(root, "manifests", f"m-{version:010d}.json"))
    )


def _pushed_dt_us(v, ntz: bool) -> int:
    """Pushed tz-naive datetime literal -> the epoch-micros encoding the
    manifest stats use (plans.lake._ts_micros records naive-as-UTC).

    The inverse depends on the COLUMN's Spark type, because the two
    timestamp types materialize pushed literals differently:

    * ``timestamp`` (TimestampType): ``fromInternal`` runs
      ``datetime.fromtimestamp`` — naive in MACHINE-LOCAL time — so the
      exact inverse is ``.timestamp()`` (interprets naive as local).
    * ``timestamp_ntz`` (TimestampNTZType): ``fromInternal`` materializes
      the stored WALL CLOCK directly (no local-time round trip), and the
      manifest stats recorded that same wall clock naive-as-UTC — so the
      inverse interprets naive as UTC. Using ``.timestamp()`` here shifted
      the probe by the UTC offset on non-UTC hosts, and manifest pruning
      dropped files holding matching rows (unrecoverable: Spark's
      re-applied filter never sees the pruned files).
    """
    import datetime as _dt

    if v.tzinfo is not None:
        return int(v.timestamp() * 1_000_000)
    if ntz:
        return int(v.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
    return int(v.timestamp() * 1_000_000)


def _ts_bounds_us(filters: list, ntz: bool = False) -> tuple[int | None, int | None]:
    """Fold pushed ts-range filters into (lo, hi) epoch-micros bounds.
    ``ntz`` = the ts column's declared type is timestamp_ntz (see
    _pushed_dt_us for why the encoding branches on it)."""
    lo = hi = None

    def _us(v) -> int | None:
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            return _pushed_dt_us(v, ntz)
        return None

    for f in filters:
        v = _us(getattr(f, "value", None))
        if v is None:
            continue
        if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            lo = v if lo is None else max(lo, v)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            hi = v if hi is None else min(hi, v)
    return lo, hi


def _probe_scalar(v, ntz: bool = False):
    """Pushed-filter literal -> the encoding manifest column stats use
    (plans.lake._stat_scalar): datetimes as epoch micros with the
    column-type-aware naive interpretation (``ntz`` — see _pushed_dt_us),
    dates as ISO strings, numbers/strings/bools as-is; unencodable ->
    None (no pruning on that predicate)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return _pushed_dt_us(v, ntz)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


# ------------------------------------------------------------- batch reader


class _BucketPartition(InputPartition):
    def __init__(self, bucket: int, entries: list[dict], has_delta: bool):
        self.bucket = bucket
        self.entries = entries
        self.has_delta = has_delta


def _ship_token(path: str | None):
    """Worker-registration token for factory-registered filesystem schemes
    (plans/fsio). DataSource reader/writer INSTANCES are pickled into
    Python worker processes, where the driver's fsio registrations do not
    exist — capturing the token at driver-side __init__ and re-registering
    at read()/write() entry makes the whole facade (lake read, lake write,
    change feed, resolved feed) work on factory schemes through REAL
    Spark jobs. Factory-less registrations still serve driver-side
    consumers (the facade classes called directly)."""
    if path and "://" in path:
        return fsio.shippable(path.split("://", 1)[0])
    return None


@dataclass
class _TableMeta:
    root: str
    version: int
    key_cols: list[str]
    bucket_col: str
    num_buckets: int
    schema_json: dict
    schemas: dict
    renames: list
    drops: list
    adds: list
    buckets: dict
    mode: str
    engine: dict
    has_engine_flag: bool = True
    stats_cols: tuple = ()
    current_schema_id: int = 0

    @classmethod
    def load(cls, root: str, version: int | None = None) -> "_TableMeta":
        v = _head_version(root) if version is None else version
        m = _manifest(root, v)
        return cls(
            root=root,
            version=v,
            key_cols=list(m.get("key_cols", ["conv_id", "turn_idx"])),
            bucket_col=m.get("bucket_col", "conv_id"),
            num_buckets=int(m.get("num_buckets", 64)),
            schema_json=m["schema"],
            schemas=m.get("schemas", {"0": m["schema"]}),
            renames=m.get("renames", []),
            drops=m.get("drops", []),
            adds=m.get("adds", []),
            buckets=m["buckets"],
            mode=m.get("mode", "cow"),
            engine=m.get("engine", {}),
            has_engine_flag="engine" in m,
            stats_cols=tuple(m.get("stats_cols", ())),
            current_schema_id=int(m.get("current_schema_id", 0)),
        )

    def user_schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)


def _apply_schema_events_arrow(tbl, meta: _TableMeta, after_sid: int):
    """Arrow twin of plans.lake._apply_schema_events: replay rename/drop
    events NEWER than the file's schema era onto a pyarrow table so
    field-id semantics hold (a dropped-then-re-added name is a different
    field and must read null from pre-drop files). Add-with-default is
    handled by _align_arrow (the default constant is stamped there)."""
    import pyarrow as pa

    events = sorted(
        [("rename", r) for r in meta.renames] + [("drop", d) for d in meta.drops],
        key=lambda e: int(e[1]["sid"]),
    )
    for kind, r in events:
        if int(r["sid"]) <= after_sid:
            continue
        names = tbl.column_names
        if kind == "rename" and r["from"] in names:
            tbl = tbl.rename_columns(
                [r["to"] if c == r["from"] else c for c in names]
            )
        elif kind == "drop" and r["name"] in names:
            tbl = tbl.drop_columns([r["name"]])
    return tbl


def _add_defaults(meta: _TableMeta, after_sid: int) -> dict:
    """Column -> initial default for add-column events newer than the era."""
    return {
        a["name"]: a["default"]
        for a in meta.adds
        if int(a["sid"]) > after_sid and a.get("default") is not None
    }


def _align_arrow(tbl, target, defaults: dict):
    """Project/cast a pyarrow table onto the target arrow schema: present
    columns cast (widen), absent columns fill with the declared initial
    default (add-column events) or null — the Arrow twin of
    operators.evolve.align_to_schema for the read path."""
    import pyarrow as pa

    cols = []
    names = set(tbl.column_names)
    for field in target:
        if field.name in names:
            cols.append(tbl.column(field.name).cast(field.type))
        elif field.name in defaults:
            cols.append(pa.array([defaults[field.name]] * len(tbl)).cast(field.type))
        else:
            cols.append(pa.nulls(len(tbl), field.type))
    return pa.table(dict(zip([f.name for f in target], cols)))


def _target_arrow_schema(meta: _TableMeta, user_schema=None):
    """Current user schema (or an explicit one — the writer's evolved
    union) + LWW marker columns, as arrow types."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    fields = [
        pa.field(f.name, to_arrow_type(f.dataType))
        for f in (user_schema or meta.user_schema()).fields
    ]
    fields += [
        pa.field(TS_APPLIED, pa.timestamp("us", tz="UTC")),
        pa.field(LSN_APPLIED, pa.int64()),
        pa.field(DELETED, pa.bool_()),
    ]
    if meta.engine.get("partial_updates"):
        fields.append(pa.field(PATCH, pa.bool_()))
    elif meta.engine.get("agg_spec"):
        fields += [
            pa.field(AGG_RESET, pa.bool_()),
            pa.field(AGG_N, pa.int64()),
        ]
    return pa.schema(fields)


def _fold_first_read_arrow(tbl, keys: list[str], sort_cols: list[str]):
    """First-row read resolve on a pyarrow Table: a key ANY layer deleted
    is dead (permanent erasure — the tombstone survives so the facade must
    honor it), otherwise the MINIMUM (ts, lsn) writer wins. The twin of
    plans.lake._resolve_first for the facade's per-bucket reader; the
    tombstone filter downstream then drops the dead keys' rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    order = pc.sort_indices(
        tbl.select(sort_cols), sort_keys=[(c, "ascending") for c in sort_cols]
    ).to_numpy(zero_copy_only=False)
    ktbl = (
        tbl.select(keys)
        .take(pa.array(order))
        .append_column("_rank", pa.array(np.arange(order.size, dtype=np.int64)))
        .append_column(
            "_dead",
            pc.fill_null(tbl.column(DELETED), False).take(pa.array(order)).cast(pa.int8()),
        )
    )
    gb = ktbl.group_by(keys, use_threads=False).aggregate(
        [("_rank", "min"), ("_dead", "max")]
    )
    alive = gb.column("_dead_max").to_numpy(zero_copy_only=False) == 0
    winners = gb.column("_rank_min").to_numpy(zero_copy_only=False)[alive]
    return tbl.take(pa.array(np.sort(order[winners])))


def _read_bucket(meta: _TableMeta, part: _BucketPartition, columns: list | None = None,
                 internal: bool = False):
    """Read one bucket's layers, align each file to the current schema,
    resolve by the table's MERGE ENGINE if delta layers exist (LWW /
    first-row row folds; patch per-column compose; agg partial merge —
    params from the manifest engine block), drop tombstones + internal
    cols. Patch tables additionally drop orphan-patch carrier rows on
    EVERY path (they are not rows until an insert arrives).

    ``columns`` prunes the payload BEFORE the per-file read and the fold
    (key and marker columns always ride) — the facade twin of
    ``table.read(columns=...)``; the Python DataSource API has no
    projection-pushdown hook, so this is surfaced as a read option.

    ``internal=True`` keeps resolved TOMBSTONES and the dominance markers
    (``_ts_applied``, ``_lsn_applied``, ``_deleted``) in the output — the
    resolved change feed diffs two such states and needs a dead key's
    dominating markers to emit a replayable delete. Patch orphan carriers
    stay hidden (they are not rows on any path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .lake import _fold_lww_arrow, _merge_agg_arrow, _resolve_patches_arrow

    is_patch = bool(meta.engine.get("partial_updates"))
    is_agg = bool(meta.engine.get("agg_spec"))
    engine_cols = {PATCH} if is_patch else ({AGG_RESET, AGG_N} if is_agg else set())
    target = _target_arrow_schema(meta)
    user_cols = [f.name for f in meta.user_schema().fields]
    if columns:
        keep = list(dict.fromkeys(list(meta.key_cols) + list(columns)))
        user_cols = [c for c in user_cols if c in keep]
        target = pa.schema(
            [f for f in target if f.name in keep or f.name.startswith("_")]
        )
    pieces = []
    for e in part.entries:
        pf = pq.ParquetFile(fsio.open_input(os.path.join(meta.root, e["path"])))
        phys = list(pf.schema_arrow.names)
        if (PATCH in phys and not is_patch) or ("_agg_reset" in phys and not is_agg):
            raise ValueError(
                "file carries merge-engine columns the manifest's engine "
                "block does not declare — refusing a mis-resolved read; "
                "commit once through SnapshotParquetTable with the true "
                "TableSpec to repair the flags"
            )
        sid = int(e.get("schema_id", 0))
        if columns:
            # map each wanted current name back through renames NEWER than
            # this file's era to its stored physical name, so pruning
            # reaches the parquet read (column chunks never decoded)
            wanted = {TS_APPLIED, LSN_APPLIED, DELETED, *engine_cols}
            newer = sorted(
                (r for r in meta.renames if int(r["sid"]) > sid),
                key=lambda r: -int(r["sid"]),
            )
            for c in user_cols:
                for r in newer:
                    if c == r["to"]:
                        c = r["from"]
                wanted.add(c)
            tbl = pf.read(columns=[n for n in phys if n in wanted])
        else:
            tbl = pf.read()
            if BUCKET in tbl.column_names:
                tbl = tbl.drop_columns([BUCKET])
        if e.get("dv"):
            # deletion-vector sidecar: drop the recorded row positions with
            # a plain numpy bitmap over the file — O(bitmap), no resolve
            # (the facade twin of _read_files' anti-join)
            import numpy as np
            import pyarrow.compute as pc

            dv_fs, dv_p = fsio.resolve(os.path.join(meta.root, e["dv"]["path"]))
            dvt = pq.read_table(dv_p, filesystem=dv_fs)
            base = "/".join(e["path"].replace(os.sep, "/").split("/")[-2:])
            positions = (
                dvt.filter(pc.equal(dvt.column("path"), base))
                .column("pos")
                .to_numpy(zero_copy_only=False)
            )
            if positions.size:
                mask = np.ones(len(tbl), dtype=bool)
                mask[positions] = False
                tbl = tbl.filter(pa.array(mask))
        tbl = _apply_schema_events_arrow(tbl, meta, after_sid=sid)
        tbl = _align_arrow(tbl, target, _add_defaults(meta, sid))
        pieces.append(tbl)
    if not pieces:
        return
    out = pa.concat_tables(pieces)
    payload_cols = [c for c in user_cols if c not in meta.key_cols]
    if part.has_delta and len(out):
        if meta.engine.get("first_row"):
            out = _fold_first_read_arrow(out, meta.key_cols, [TS_APPLIED, LSN_APPLIED])
        elif is_patch:
            # one-shot whole-set materializer: every layer of the bucket is
            # present in `out`, so per-column provenance cannot be lost —
            # the composition caveat that split resolve from fold (round 4)
            # does not apply here; seq groups come from the manifest params
            seq_groups = {
                s: tuple(m) for s, m in (meta.engine.get("seq_groups") or {}).items()
                if s in set(user_cols)
            } or None
            out = _resolve_patches_arrow(
                out, list(meta.key_cols), payload_cols,
                [TS_APPLIED, LSN_APPLIED], seq_groups,
            )
        elif is_agg:
            fns = meta.engine.get("agg_fns")
            if fns is None:
                raise ValueError(
                    "aggregation table's manifest predates engine params "
                    "(no engine.agg_fns); commit once through "
                    "SnapshotParquetTable to backfill, then retry"
                )
            out = _merge_agg_arrow(out, list(meta.key_cols), payload_cols, fns)
            out = out.select([f.name for f in target])
        else:
            out = _fold_lww_arrow(out, meta.key_cols, [TS_APPLIED, LSN_APPLIED])
    if len(out):
        import pyarrow.compute as pc

        live = pc.fill_null(pc.invert(out.column(DELETED)), True)
        if is_patch and PATCH in out.column_names:
            # orphan patch carriers are not rows (compaction carries them
            # so a later insert recomposes) — hide on every path, like the
            # engine's read()
            carrier_free = pc.fill_null(pc.invert(out.column(PATCH)), True)
            live = pc.and_(live, carrier_free)
            if internal:
                out = out.filter(carrier_free)
        if not internal:
            out = out.filter(live)
    out = out.select(
        user_cols + ([TS_APPLIED, LSN_APPLIED, DELETED] if internal else [])
    )
    for batch in out.to_batches(max_chunksize=65536):
        yield batch


class LakeReader(DataSourceReader):
    """Batch reader: bucket-parallel, filter-pruned, MoR-resolving."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("transcript_lake requires .load(<table root>)")
        version = options.get("version")
        self._fs_token = _ship_token(path)
        self.meta = _TableMeta.load(path, int(version) if version is not None else None)
        if not self.meta.has_engine_flag:
            # a flag-less manifest predates the engine block; first-row
            # tables are file-schema-identical to LWW, so sniffing cannot
            # prove plain LWW — refuse rather than risk a silent
            # max-(ts,lsn) resolve of a min-with-permanent-erase table.
            # Any engine commit (even an empty batch) backfills the flag.
            raise ValueError(
                "transcript_lake cannot serve a table whose manifest lacks the "
                "'engine' block (pre-flag table): first-row tables are "
                "indistinguishable from LWW by file schema. Commit once through "
                "SnapshotParquetTable (which backfills the flag) and retry."
            )
        if self.meta.engine.get("agg_spec") and "agg_fns" not in self.meta.engine:
            # round 4: every engine reads through the facade; an agg table
            # additionally needs its PARAMS in the manifest (backfilled by
            # any SnapshotParquetTable commit)
            raise ValueError(
                "transcript_lake cannot resolve this aggregation table: its "
                "manifest predates engine params (no engine.agg_fns). Commit "
                "once through SnapshotParquetTable (which backfills) and retry."
            )
        self.read_optimized = str(options.get("readoptimized", "false")).lower() == "true"
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] if cols else None
        self._key_buckets: set[int] | None = None
        self._ts_lo = None
        self._ts_hi = None
        self._col_preds: list = []  # (col, op, encoded) for stats skipping

    def pushFilters(self, filters):
        bcol = self.meta.bucket_col
        coltypes = {
            f["name"]: f["type"]
            for f in self.meta.schema_json.get("fields", [])
            if isinstance(f["type"], str)
        }
        btype = coltypes.get(bcol)

        def _ntz(col: str) -> bool:
            # column-type-aware naive-datetime encoding (see _pushed_dt_us)
            return coltypes.get(col) == "timestamp_ntz"

        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if isinstance(f, EqualTo) and col == bcol and btype:
                b = _key_bucket(f.value, self.meta.num_buckets, btype)
                if b is not None:
                    self._key_buckets = {b}
            elif isinstance(f, In) and col == bcol and btype:
                bs = {_key_bucket(v, self.meta.num_buckets, btype) for v in f.value}
                if None not in bs:
                    self._key_buckets = bs
            elif col == "ts" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                lo, hi = _ts_bounds_us([f], ntz=_ntz("ts"))
                if lo is not None:
                    self._ts_lo = lo if self._ts_lo is None else max(self._ts_lo, lo)
                if hi is not None:
                    self._ts_hi = hi if self._ts_hi is None else min(self._ts_hi, hi)
            elif col in self.meta.stats_cols:
                # generic column-stats file skipping on declared stat
                # columns (performance-only: Spark re-applies the filter)
                op = None
                ntz = _ntz(col)
                if isinstance(f, EqualTo):
                    op, val = "=", _probe_scalar(f.value, ntz)
                elif isinstance(f, GreaterThan):
                    op, val = ">", _probe_scalar(f.value, ntz)
                elif isinstance(f, GreaterThanOrEqual):
                    op, val = ">=", _probe_scalar(f.value, ntz)
                elif isinstance(f, LessThan):
                    op, val = "<", _probe_scalar(f.value, ntz)
                elif isinstance(f, LessThanOrEqual):
                    op, val = "<=", _probe_scalar(f.value, ntz)
                elif isinstance(f, In):
                    vs = tuple(_probe_scalar(v, ntz) for v in f.value)
                    op, val = ("in", vs) if None not in vs else (None, None)
                if op is not None and val is not None:
                    self._col_preds.append((col, op, val))
            remaining.append(f)  # Spark re-applies everything: pruning only
        return remaining

    def _overlaps(self, e: dict) -> bool:
        if self._col_preds:
            from .lake import _file_may_match

            if not _file_may_match(e, self._col_preds):
                return False
        if self._ts_lo is None and self._ts_hi is None:
            return True
        tl, th = e.get("ts_min"), e.get("ts_max")
        if tl is None or th is None:
            return True  # no stats: read conservatively
        if self._ts_lo is not None and th < self._ts_lo:
            return False
        if self._ts_hi is not None and tl > self._ts_hi:
            return False
        return True

    def partitions(self):
        parts = []
        is_patch = bool(self.meta.engine.get("partial_updates"))
        for b, files in self.meta.buckets.items():
            bi = int(b)
            if self._key_buckets is not None and bi not in self._key_buckets:
                continue
            has_delta = any(e.get("delta") for e in files) or (
                # patch tables: compacted base files keep the survivor set;
                # any file that may hold patch rows needs the resolve
                is_patch and any(not e.get("all_live") for e in files)
            )
            if self.read_optimized:
                keep = [e for e in files if not e.get("delta") and self._overlaps(e)]
                has_delta = False
            elif has_delta:
                # all-or-nothing: the LWW resolve needs every layer
                keep = files if any(self._overlaps(e) for e in files) else []
            else:
                keep = [e for e in files if self._overlaps(e)]
            if keep:
                parts.append(_BucketPartition(bi, keep, has_delta))
        return parts or [_BucketPartition(-1, [], False)]

    def read(self, partition: _BucketPartition):
        if not partition.entries:
            return iter(())
        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        return _read_bucket(self.meta, partition, columns=self.columns)


class TranscriptLakeDataSource(DataSource):
    """``spark.read.format("transcript_lake").load(root)``.

    Options: ``version`` (time travel), ``readOptimized`` (base files
    only — the Hudi RO-view analog), ``columns`` (comma-separated payload
    prune applied at the parquet reads; key columns always ride)."""

    @classmethod
    def name(cls):
        return "transcript_lake"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("transcript_lake requires .load(<table root>)")
        version = self.options.get("version")
        meta = _TableMeta.load(path, int(version) if version is not None else None)
        schema = meta.user_schema()
        cols = self.options.get("columns")
        if cols:
            keep = list(meta.key_cols) + [c.strip() for c in cols.split(",") if c.strip()]
            missing = sorted(set(keep) - {f.name for f in schema.fields})
            if missing:
                raise ValueError(f"columns option names unknown columns: {missing}")
            schema = T.StructType([f for f in schema.fields if f.name in keep])
        return schema

    def reader(self, schema):
        return LakeReader(self.options)

    def writer(self, schema, overwrite):
        return LakeWriter(self.options, overwrite, batch_schema=schema)

    def streamWriter(self, schema, overwrite):
        return LakeStreamWriter(self.options, overwrite, batch_schema=schema)


# --------------------------------------------------------------- batch writer


@dataclass
class _WriteMessage(WriterCommitMessage):
    entries: list  # [(bucket:int, manifest entry dict), ...]
    n_rows: int
    n_deletes: int
    n_malformed: int
    lsn_min: int | None
    lsn_max: int | None


class LakeWriter(DataSourceArrowWriter):
    """Exactly-once MERGE append through plain ``df.write``: each task
    routes its rows to storage buckets with the vectorized numpy xxhash64
    (functions/xxh.py — bit-equal to the JVM write path, zero per-row
    Python), projects change events into the engine's internal delta
    layout (payload nulled on delete, ``(_ts_applied, _lsn_applied)``
    dominance pair, tombstone flag), and writes ONE single-bucket parquet
    file per bucket it holds — the same flat MoR delta shape the engine's
    own apply emits, with per-file footer metrics computed in-task from
    the arrays (no second read). The driver-side ``commit`` appends the
    entries to the manifest under the engine's CAS protocol with the
    ledger's batch-id gate, so a Spark task retry never double-writes and
    a replayed batchId is a no-op — the same exactly-once contract as
    ``apply_changes`` (plans/apply.py)."""

    def __init__(self, options: dict, overwrite: bool, streaming: bool = False,
                 batch_schema=None):
        if overwrite:
            raise ValueError(
                "transcript_lake write supports mode('append') only — rows are "
                "CDC change events applied through the MERGE path, not file dumps"
            )
        path = options.get("path")
        if not path:
            raise ValueError("transcript_lake requires .save(<table root>)")
        if options.get("batchid") is None and not streaming:
            raise ValueError(
                "transcript_lake write requires .option('batchId', <monotone int>) "
                "— the exactly-once replay gate"
            )
        self.batch_id = (
            int(options["batchid"]) if options.get("batchid") is not None else None
        )
        # streaming resume-after-gap: a FRESH checkpoint restarts epoch ids
        # at 0, which the exactly-once ledger would replay-skip; the offset
        # lands them above the target's watermark (see resume_from_gap)
        self.batch_offset = int(options.get("batchidoffset", 0))
        self._fs_token = _ship_token(path)
        self.meta = _TableMeta.load(path)
        m = _manifest(path, self.meta.version)
        if not self.meta.has_engine_flag:
            raise ValueError(
                "transcript_lake cannot write a table whose manifest lacks the "
                "'engine' block (pre-flag table): the LWW delta layout this "
                "writer emits would corrupt a legacy first-row/patch/agg table. "
                "Commit once through SnapshotParquetTable (which backfills the "
                "flag) and retry."
            )
        eng = self.meta.engine
        # engine routing: every merge engine has a facade delta projection.
        # first-row files are schema-identical to LWW (raw dominance rows;
        # the read resolve differs); patch/agg project their own internal
        # columns and within-task fold (their manifests carry the full
        # engine PARAMS — agg_fns/seq_groups — backfilled by _commit).
        if eng.get("agg_spec"):
            self.engine_kind = "agg"
            self.agg_fns = eng.get("agg_fns")
            if self.agg_fns is None:
                raise ValueError(
                    "transcript_lake write: this aggregation table's manifest "
                    "predates engine params (no engine.agg_fns). Commit once "
                    "through SnapshotParquetTable with its TableSpec (which "
                    "backfills the params) and retry."
                )
        elif eng.get("partial_updates"):
            self.engine_kind = "patch"
            self.seq_groups = eng.get("seq_groups") or None
        elif eng.get("first_row"):
            self.engine_kind = "first_row"
        else:
            self.engine_kind = "lww"
        if self.meta.mode != "mor":
            raise ValueError(
                "transcript_lake write appends merge-on-read delta layers; "
                "CoW tables apply batches via SnapshotParquetTable.merge()"
            )
        self.ts_col = options.get("tscolumn", "ts")
        self.lsn_col = options.get("lsncolumn", "lsn")
        self.op_col = options.get("opcolumn", "op")
        self.sid = int(m.get("current_schema_id", 0))
        norm = m.get("normalize", {})
        self.norm_ws = tuple(norm.get("ws_cols", ("text",)))
        self.norm_exempt = tuple(norm.get("empty_to_null_exempt", ("text",)))
        # schema evolution (column add / widen) from the batch schema — the
        # merge_events rules (operators/evolve.py schema-union), so a
        # replication pipeline whose SOURCE evolved doesn't silently drop
        # the new columns at the sink. Files are written in the union
        # schema; commit() allocates the schema era against the manifest
        # it actually lands on (CAS-retry safe).
        cur_schema = self.meta.user_schema()
        self.write_schema = cur_schema
        self.evolved = False
        if batch_schema is not None:
            from ..operators.evolve import evolve_schema

            skip = {self.op_col, self.lsn_col}
            cur_names = {f.name for f in cur_schema.fields}
            if self.ts_col not in cur_names:
                skip.add(self.ts_col)  # dominance rider (e.g. _ts_applied)
            payload = T.StructType(
                [f for f in batch_schema.fields if f.name not in skip]
            )
            union = evolve_schema(cur_schema, payload)
            if union != cur_schema:
                bcol = self.meta.bucket_col
                if union[bcol].dataType != cur_schema[bcol].dataType:
                    raise ValueError(
                        f"cannot widen bucket column {bcol!r}: Spark's "
                        "xxhash64 is width-dependent — existing keys would "
                        "re-bucket (plans/lake._guard_bucket_widening)"
                    )
                self.write_schema = union
                self.evolved = True

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..functions.xxh import bucket_of

        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        meta = self.meta
        batches = list(iterator)
        if not batches:  # empty shuffle partition (pre-bucketed input)
            return _WriteMessage([], 0, 0, 0, None, None)
        tbl = pa.Table.from_batches(batches)
        user_fields = self.write_schema.fields
        user_cols = [f.name for f in user_fields]
        need = set(user_cols) | {self.lsn_col}
        have = set(tbl.column_names)
        missing = sorted(need - have)
        if missing:
            raise ValueError(f"transcript_lake write: missing columns {missing}")
        op = (
            tbl.column(self.op_col)
            if self.op_col in have
            else pa.chunked_array([pa.array(["U"] * len(tbl))])
        )
        # malformed = null key or null LSN: dropped and counted, the apply
        # path's drop_malformed contract
        ok = pc.is_valid(tbl.column(self.lsn_col))
        for k in meta.key_cols:
            ok = pc.and_(ok, pc.is_valid(tbl.column(k)))
        n_malformed = len(tbl) - pc.sum(pc.cast(ok, pa.int64())).as_py()
        if n_malformed:
            keep = ok.combine_chunks() if isinstance(ok, pa.ChunkedArray) else ok
            op = op.filter(keep)
            tbl = tbl.filter(keep)
        if len(tbl) == 0:
            return _WriteMessage([], 0, 0, n_malformed, None, None)
        # the table's recorded normalization policy — the SAME arrow kernel
        # the engine's fused apply runs (functions/normalize.py). For the
        # row-selection engines (LWW, first-row) normalization commutes
        # with the fold, so raw rows normalize at write; for the
        # column-composing engines (patch, agg) the engine normalizes the
        # FOLDED output (merge_events._fold_arrow order) — mirrored below,
        # after the per-bucket fold.
        from ..functions.normalize import normalize_arrow_table
        from ..schemas import TableSpec

        str_payload = [
            f.name
            for f in self.write_schema.fields
            if f.name not in meta.key_cols and f.dataType.simpleString() == "string"
        ]
        norm_spec = TableSpec(
            normalize_ws_cols=self.norm_ws,
            empty_to_null_exempt=self.norm_exempt,
        )
        tbl = tbl.combine_chunks()
        if self.engine_kind in ("lww", "first_row"):
            tbl = normalize_arrow_table(tbl, norm_spec, str_payload)
        is_del = pc.equal(op, pa.scalar("D"))
        target = _target_arrow_schema(meta, self.write_schema)
        epoch = pa.scalar(0, pa.timestamp("us", tz="UTC"))
        null_of = {f.name: pa.scalar(None, f.type) for f in target}
        cols = {}
        for f in user_fields:
            c = tbl.column(f.name).cast(dict(zip(target.names, target.types))[f.name])
            if f.name not in meta.key_cols:
                # tombstones carry no payload — only the dominance pair
                # (patch rows, op 'P', keep theirs: null there means
                # "column not written")
                c = pc.if_else(is_del, null_of[f.name], c)
            cols[f.name] = c
        ts_src = tbl.column(self.ts_col).cast(pa.timestamp("us", tz="UTC"))
        cols[TS_APPLIED] = pc.fill_null(ts_src, epoch)
        cols[LSN_APPLIED] = tbl.column(self.lsn_col).cast(pa.int64())
        cols[DELETED] = pc.fill_null(is_del, False)
        if self.engine_kind == "patch":
            cols[PATCH] = pc.fill_null(pc.equal(op, pa.scalar("P")), False)
        elif self.engine_kind == "agg":
            # raw rows are single-event partials (plans/lake._as_delta_rows):
            # a delete is its own reset layer, any other event contributes 1
            cols[AGG_RESET] = pc.fill_null(is_del, False)
            cols[AGG_N] = pc.if_else(
                pc.fill_null(is_del, False), pa.scalar(0, pa.int64()), pa.scalar(1, pa.int64())
            )
        out = pa.table(cols)
        bvals = tbl.column(meta.bucket_col).combine_chunks()
        btype = next(
            f["type"] for f in meta.schema_json["fields"] if f["name"] == meta.bucket_col
        )
        buckets = bucket_of(bvals, meta.num_buckets, btype)
        out = out.append_column(BUCKET, pa.array(buckets, pa.int32()))
        if self.engine_kind in ("patch", "agg"):
            # the folds carry an op rider column (dropped before the write,
            # like the engine's fused path)
            out = out.append_column("_op", op.combine_chunks() if isinstance(op, pa.ChunkedArray) else op)
        canonical = [c for c in out.column_names if c != "_op"]
        payload_cols = [f.name for f in user_fields if f.name not in meta.key_cols]
        keys = list(meta.key_cols)

        def _fold_part(part):
            """Within-task per-bucket fold for the column-composing engines
            (the facade twin of merge_events._fold_arrow): patch/agg partials
            compose with other layers under the read-side resolve, so a key
            split across write tasks still converges."""
            from .lake import _fold_agg_arrow, _fold_patches_arrow

            if self.engine_kind == "patch":
                part = _fold_patches_arrow(
                    part, keys, payload_cols, [TS_APPLIED, LSN_APPLIED], self.seq_groups
                )
            else:
                part = _fold_agg_arrow(part, keys, payload_cols, self.agg_fns)
            part = part.drop_columns(["_op"]).select(canonical)
            return normalize_arrow_table(part, norm_spec, str_payload)

        rel_dir = os.path.join("data", f"wds-{uuid.uuid4().hex[:12]}")
        fsio.makedirs(os.path.join(meta.root, rel_dir))
        entries = []
        import numpy as np

        for b in np.unique(buckets):
            part = out.filter(pa.array(buckets == b))
            if self.engine_kind in ("patch", "agg"):
                part = _fold_part(part)
            fn = f"b{int(b):05d}-{uuid.uuid4().hex[:8]}.parquet"
            rel = os.path.join(rel_dir, fn)
            w_fs, w_p = fsio.resolve(os.path.join(meta.root, rel))
            pq.write_table(part, w_p, filesystem=w_fs, compression="zstd")
            # per-file metrics straight from the arrays (Iceberg per-file
            # stats analog; no footer re-read)
            lsn = part.column(LSN_APPLIED)
            ts_user = part.column(self.ts_col) if self.ts_col in part.column_names else None
            e = {
                "path": rel,
                "schema_id": self.sid,
                "delta": True,
                "n_rows": len(part),
                "lsn_min": pc.min(lsn).as_py(),
                "lsn_max": pc.max(lsn).as_py(),
                "all_live": not pc.any(part.column(DELETED)).as_py(),
            }
            if ts_user is not None and pc.count(ts_user).as_py():
                e["ts_min"] = pc.min(ts_user).cast(pa.int64()).as_py()
                e["ts_max"] = pc.max(ts_user).cast(pa.int64()).as_py()
            cstats = {}
            for sc_name in meta.stats_cols:
                if sc_name not in part.column_names:
                    continue
                col = part.column(sc_name)
                if pc.count(col).as_py() == 0:
                    continue
                from .lake import _stat_scalar

                mm = pc.min_max(col)
                a = _stat_scalar(mm["min"].as_py())
                z = _stat_scalar(mm["max"].as_py())
                if a is not None and z is not None:
                    nulls = len(part) - pc.count(col).as_py()
                    cstats[sc_name] = [a, z, int(nulls)]
            if cstats:
                e["stats"] = cstats
            entries.append((int(b), e))
        lsn_all = out.column(LSN_APPLIED)
        return _WriteMessage(
            entries=entries,
            n_rows=len(out),
            n_deletes=pc.sum(pc.cast(out.column(DELETED), pa.int64())).as_py(),
            n_malformed=n_malformed,
            lsn_min=pc.min(lsn_all).as_py(),
            lsn_max=pc.max(lsn_all).as_py(),
        )

    def commit(self, messages):
        from .lake import CommitConflictError, SnapshotParquetTable

        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        msgs = [m for m in messages if m is not None and m.entries]
        t = SnapshotParquetTable(None, self.meta.root)
        for _attempt in range(5):
            t._manifest = None
            m0 = t.manifest()
            if self.batch_id <= m0.get("last_batch_id", -1):
                return  # replay of a committed batch: exactly-once no-op
            m = dict(m0)
            if self.evolved:
                # allocate the schema era against the manifest this commit
                # actually lands on (a CAS loser re-derives): files were
                # written in the union schema, so their era must cover it —
                # either a NEW era, or the current one when a concurrent
                # writer already evolved to a superset (alignment null-fills
                # and widens, so a wider era is always safe for these files)
                from ..operators.evolve import evolve_schema

                tgt = T.StructType.fromJson(m0["schema"])
                union = evolve_schema(tgt, self.write_schema)
                if union != tgt:
                    new_sid = max(int(k) for k in m0.get("schemas", {"0": 0})) + 1
                    m["schemas"] = {
                        **m0.get("schemas", {"0": m0["schema"]}),
                        str(new_sid): union.jsonValue(),
                    }
                    m["schema"] = union.jsonValue()
                    m["current_schema_id"] = new_sid
                    sid = new_sid
                else:
                    sid = int(m0.get("current_schema_id", 0))
                for msg in msgs:
                    for _b, e in msg.entries:
                        e["schema_id"] = sid
            buckets = dict(m0["buckets"])
            for msg in msgs:
                for b, e in msg.entries:
                    buckets[str(b)] = list(buckets.get(str(b), [])) + [e]
            lsn_max = max((msg.lsn_max for msg in msgs), default=None)
            m["version"] = t._alloc_version()
            m["parent_snapshot_id"] = m0["snapshot_id"]
            m["snapshot_id"] = uuid.uuid4().hex
            m["buckets"] = buckets
            m["last_batch_id"] = self.batch_id
            m["last_lsn"] = max(m0["last_lsn"], lsn_max if lsn_max is not None else -1)
            m["summary"] = {
                "op": "merge",
                "batch_id": self.batch_id,
                "writer": "datasource",
                "n_source": sum(msg.n_rows for msg in msgs),
                "n_delete": sum(msg.n_deletes for msg in msgs),
                "n_malformed": sum(msg.n_malformed for msg in msgs),
                "lsn_min": min((msg.lsn_min for msg in msgs), default=None),
                "lsn_max": lsn_max,
            }
            m["committed_at"] = time.time()
            try:
                t._commit(m, expected_ref=m0["version"])
                return
            except CommitConflictError:
                continue  # MoR appends are rebase-safe: re-read, re-append
        raise RuntimeError("transcript_lake write: commit lost the CAS 5 times")

    def abort(self, messages):
        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        for msg in messages:
            if msg is None:
                continue
            for _b, e in msg.entries:
                try:
                    fsio.remove(os.path.join(self.meta.root, e["path"]))
                except (OSError, FileNotFoundError):
                    pass


class LakeStreamWriter(LakeWriter, DataSourceStreamArrowWriter):
    """Streaming sink form of the facade writer: the micro-batch epoch id
    IS the ledger batch id, so the checkpointed stream gets the engine's
    exactly-once replay gate with no user-managed option — the same
    contract as the engine's own foreachBatch apply (plans/apply.py).
    Enables e.g. lake→lake replication entirely through plain
    ``spark.readStream.format("transcript_changes")`` →
    ``writeStream.format("transcript_lake")``."""

    def __init__(self, options: dict, overwrite: bool, batch_schema=None):
        super().__init__(options, overwrite, streaming=True, batch_schema=batch_schema)

    def commit(self, messages, batchId: int):  # noqa: N803 (Spark API name)
        self.batch_id = self.batch_offset + int(batchId)
        super().commit(messages)

    def abort(self, messages, batchId: int):  # noqa: N803
        super().abort(messages)


# ---------------------------------------------------------- streaming source


class _ChangeFilePartition(InputPartition):
    def __init__(self, version: int, path: str, schema_id: int = 0):
        self.version = version
        self.path = path
        self.schema_id = schema_id


class ChangeFeedGapError(RuntimeError):
    """The parent chain from `hi` back to `lo` crosses an expired snapshot:
    serving the feed would silently drop the expired commits' changes.
    Recovery: :func:`resume_from_gap` (re-bootstrap from the oldest
    retained snapshot, then continue the feed from there)."""


def feed_floor(root: str) -> int:
    """The OLDEST RETAINED version on the current ref's parent chain — the
    change-feed recovery anchor: the snapshot a gapped consumer
    re-bootstraps from, and the ``startingVersion`` it resumes the feed
    with (``_main_chain(floor, head)`` then covers exactly the retained
    commits; everything older is subsumed by the floor snapshot's state)."""
    idx = _snapshot_index(root)
    cur = _manifest(root, _head_version(root))
    while True:
        parent = cur.get("parent_snapshot_id")
        if parent is None:
            return cur["version"]  # full history retained
        nxt = idx.get(parent)
        if nxt is None:
            return cur["version"]  # parent expired: cur is the floor
        cur = nxt


def resume_from_gap(
    src, target_root: str, batch_id: int | None = None
) -> int:
    """Recover a lake->lake replication consumer that hit
    :class:`ChangeFeedGapError` (its checkpointed feed position predates
    what ``expire_snapshots`` retained on the source), EXACTLY-ONCE:

    1. ``floor = feed_floor(src.root)`` — the oldest retained snapshot;
    2. re-bootstrap: merge ``src.replay_events(floor)`` (the floor
       snapshot's full resolved state, live rows + tombstones, original
       dominance pairs) into the target through the facade writer's
       ledger gate — state the target already applied is a dominance
       no-op, state it missed (including deletes whose commits expired)
       lands with its true ``(ts, lsn)``;
    3. the caller restarts the stream with
       ``.option("startingVersion", <returned floor>)``, a FRESH
       checkpoint dir, and ``.option("batchIdOffset",
       <target.last_batch_id + 1>)`` so the new stream's epoch ids land
       above the ledger watermark instead of replay-skipping.

    ``src`` is the source SnapshotParquetTable handle; ``batch_id``
    defaults to the target's ``last_batch_id + 1``. Returns the floor
    version. Tested end-to-end in tests/test_gap_recovery.py (expire past
    a checkpoint -> gap -> recover -> state equals the replay oracle)."""
    from .lake import SnapshotParquetTable

    floor = feed_floor(src.root)
    if batch_id is None:
        batch_id = SnapshotParquetTable(None, target_root).last_batch_id + 1
    (
        src.replay_events(version=floor)
        .write.format("transcript_lake")
        .option("batchId", str(batch_id))
        .option("tsColumn", TS_APPLIED)
        .option("lsnColumn", LSN_APPLIED)
        .mode("append")
        .save(target_root)
    )
    return floor


def _snapshot_index(root: str) -> dict:
    """snapshot_id -> manifest over every retained slot: ONE readdir +
    one pass over the manifests (was a per-commit v-1..0 rescan, O(V^2)
    manifest reads per change-feed batch on long histories)."""
    idx = {}
    mdir = os.path.join(root, "manifests")
    for fn in fsio.listdir(mdir):
        if fn.startswith("m-") and fn.endswith(".json"):
            m = json.loads(fsio.read_text(os.path.join(mdir, fn)))
            idx[m["snapshot_id"]] = m
    return idx


def _main_chain(root: str, lo: int, hi: int, idx: dict | None = None) -> list[int]:
    """Versions on the current ref's ancestry within (lo, hi], oldest
    first — branch commits allocate global slots too, so walking
    ``parent_snapshot_id`` links is the only correct lineage.

    Raises :class:`ChangeFeedGapError` when the walk cannot be followed
    all the way back to ``lo`` because ``expire_snapshots`` deleted a
    manifest inside the range — a silent partial chain here meant a
    streaming resume from an old checkpoint (or batch CDF from version 0)
    lost the older changes with no error."""
    if hi <= lo:
        return []
    by_sid = idx if idx is not None else _snapshot_index(root)
    chain = []
    cur = _manifest(root, hi)
    while cur and cur["version"] > lo:
        chain.append(cur["version"])
        parent = cur.get("parent_snapshot_id")
        if parent is None:
            break  # reached table creation: full history served
        nxt = by_sid.get(parent)
        if nxt is None:
            pv = cur.get("parent_version")
            if pv is not None and int(pv) <= lo:
                break  # parent is at/below the requested floor: no gap
            raise ChangeFeedGapError(
                f"change feed cannot reach version {lo}: snapshot "
                f"m-{cur['version']:010d}'s parent ({parent}) was removed by "
                "expire_snapshots — changes between the expired history and "
                f"version {cur['version']} are unrecoverable from this table; "
                "restart the feed from a retained startingVersion"
            )
        cur = nxt
    return sorted(chain)


def _change_file_partitions(root: str, lo: int, hi: int):
    """One partition per data file ADDED by a merge/bootstrap commit in
    (lo, hi] on the current ref's ancestry — shared by the streaming
    offsets walk and the batch from/to-version read. Each partition
    carries its manifest entry's schema_id so the change-file read
    replays only schema events NEWER than the file's era (mirroring
    _read_bucket; after_sid=0 mis-read post-evolution files whose
    column names were reused)."""
    parts: list[_ChangeFilePartition] = []
    idx = _snapshot_index(root)
    by_ver = {m["version"]: m for m in idx.values()}
    for v in _main_chain(root, lo, hi, idx=idx):
        m = by_ver[v]
        op = m.get("summary", {}).get("op")
        if op not in ("merge", "bootstrap"):
            continue  # compaction/DDL/retention: no logical change
        pm = idx.get(m.get("parent_snapshot_id"))
        parent_paths = (
            {e["path"] for fs in pm["buckets"].values() for e in fs} if pm else set()
        )
        for files in m["buckets"].values():
            for e in files:
                if e["path"] not in parent_paths:
                    parts.append(
                        _ChangeFilePartition(v, e["path"], int(e.get("schema_id", 0)))
                    )
    return parts


def _read_change_file(meta: _TableMeta, partition: _ChangeFilePartition):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    _cf_fs, _cf_p = fsio.resolve(os.path.join(meta.root, partition.path))
    tbl = pq.read_table(_cf_p, filesystem=_cf_fs)
    if BUCKET in tbl.column_names:
        tbl = tbl.drop_columns([BUCKET])
    target = _target_arrow_schema(meta)
    sid = int(partition.schema_id)
    tbl = _apply_schema_events_arrow(tbl, meta, after_sid=sid)
    tbl = _align_arrow(tbl, target, _add_defaults(meta, sid))
    deleted = pc.fill_null(tbl.column(DELETED), False)
    ct = pc.if_else(deleted, pa.scalar("delete"), pa.scalar("upsert"))
    if meta.engine.get("partial_updates") and PATCH in tbl.column_names:
        # typed patch rows: a column-partial event is NOT a full image —
        # untyped it would replicate as an upsert whose nulls overwrite
        # (the wire consumer maps patch -> op 'P', and the facade sink's
        # patch projection keeps the partial semantics end-to-end).
        # (patch AND deleted) is a GROUP CARRIER — a re-flagged original
        # full image the survivor fold kept for its group write; replaying
        # it as a plain upsert with its original (ts, lsn) is exactly the
        # original event (argmax-idempotent).
        p = pc.fill_null(tbl.column(PATCH), False)
        ct = pc.if_else(
            pc.and_(p, pc.invert(deleted)),
            pa.scalar("patch"),
            pc.if_else(
                pc.and_(p, deleted), pa.scalar("upsert"), ct
            ),
        )
    user_cols = [f.name for f in meta.user_schema().fields]
    out = tbl.select(user_cols + [TS_APPLIED, LSN_APPLIED])
    out = out.append_column("_change_type", ct)
    out = out.append_column(
        "_commit_version", pa.array([partition.version] * len(tbl), pa.int64())
    )
    for batch in out.to_batches(max_chunksize=65536):
        yield batch


def _feed_mode(options: dict, meta: _TableMeta) -> str:
    """Resolve the change feed's ``mode`` option: ``events`` | ``resolved``
    | ``auto`` (default — aggregation tables take ``resolved``, everything
    else ``events``). Explicit ``events`` on an agg table refuses with the
    resolved-mode pointer: an agg delta row is a PARTIAL (its
    ``_n_contrib`` may fold many events) — op codes cannot carry it, so a
    facade re-apply would mis-count."""
    mode = str(options.get("mode", "auto")).lower()
    if mode not in ("auto", "events", "resolved"):
        raise ValueError(
            f"transcript_changes mode must be auto|events|resolved, got {mode!r}"
        )
    is_agg = bool(meta.engine.get("agg_spec"))
    if mode == "auto":
        return "resolved" if is_agg else "events"
    if mode == "events" and is_agg:
        raise ValueError(
            "transcript_changes mode=events cannot serve aggregation-engine "
            "tables: delta rows are accumulator partials, not replayable "
            "events; use mode=resolved (the default for agg tables — the "
            "facade twin of SnapshotParquetTable.table_changes()) instead"
        )
    return mode


class _ResolvedDiffPartition(InputPartition):
    """(commit, touched bucket) — the resolved feed's unit of work."""

    def __init__(self, version: int, parent_version: int, bucket: int):
        self.version = version
        self.parent_version = parent_version
        self.bucket = bucket
        self.path = "resolved"  # non-empty: the shared empty-sentinel check


def _resolved_change_partitions(root: str, lo: int, hi: int):
    """One partition per (commit in (lo, hi] on the current ref's
    ancestry, bucket whose file list changed vs the parent) — only
    touched buckets resolve, so a commit's feed cost is O(touched bucket
    data), the same class as the engine's ``table_changes()``.
    State-preserving rewrites are skipped outright: compaction folds
    layers bit-stably and rebucket changes the bucket GRID itself (a
    per-bucket diff across grids would be meaningless). Raises
    :class:`ChangeFeedGapError` when a needed parent manifest was
    expired (same contract as the event feed — resume via
    ``resume_from_gap``)."""
    parts: list[_ResolvedDiffPartition] = []
    idx = _snapshot_index(root)
    by_ver = {m["version"]: m for m in idx.values()}
    for v in _main_chain(root, lo, hi, idx=idx):
        m = by_ver[v]
        if m.get("summary", {}).get("op") in ("compact", "rebucket"):
            continue
        pv = m.get("parent_version")
        if pv is None:
            pm = {"buckets": {}}
        else:
            pm = by_ver.get(int(pv))
            if pm is None:
                try:
                    pm = _manifest(root, int(pv))
                except FileNotFoundError:
                    raise ChangeFeedGapError(
                        f"resolved change feed cannot diff version {v}: its "
                        f"parent manifest m-{int(pv):010d} was removed by "
                        "expire_snapshots; restart the feed from a retained "
                        "startingVersion (see feed_floor/resume_from_gap)"
                    )
        for b in sorted(set(m["buckets"]) | set(pm["buckets"]), key=int):
            if m["buckets"].get(b) != pm["buckets"].get(b):
                parts.append(_ResolvedDiffPartition(v, int(pv or 0), int(b)))
    return parts


def _internal_arrow_schema(meta: _TableMeta):
    """user columns + the dominance/tombstone markers, as arrow types —
    the shape ``_read_bucket(internal=True)`` emits."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    return pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in meta.user_schema().fields]
        + [
            pa.field(TS_APPLIED, pa.timestamp("us", tz="UTC")),
            pa.field(LSN_APPLIED, pa.int64()),
            pa.field(DELETED, pa.bool_()),
        ]
    )


def _resolved_diff_batches(root: str, partition: _ResolvedDiffPartition):
    """``table_changes()``-equivalent resolved U/D rows for one bucket of
    one commit (round-4 verdict item #2): resolve the bucket's state at
    the commit and at its parent through the per-engine facade resolve,
    then diff on the dominance markers — a key whose ``(_ts_applied,
    _lsn_applied, _deleted)`` triple is unchanged is a carry-over and
    emits nothing. Emitted rows are FULL RESOLVED IMAGES (upsert) or
    tombstones (delete) carrying the resolving fold's markers, so an LWW
    mirror applying the feed converges to the source's resolved state —
    this is what makes aggregation tables replicable through the public
    facade (their delta rows are accumulator partials the event feed
    cannot carry). Rows that vanish WITHOUT a tombstone (DV/purge
    physical erasure) emit a delete with the OLD image's markers — the
    same best-effort the engine's ``table_changes()`` gives; exactly-once
    mirrors of purge-heavy tables should re-sync from a snapshot."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    meta_new = _TableMeta.load(root, partition.version)
    meta_old = _TableMeta.load(root, partition.parent_version)
    keys = list(meta_new.key_cols)
    user_cols = [f.name for f in meta_new.user_schema().fields]

    def state(meta):
        files = meta.buckets.get(str(partition.bucket), [])
        if not files:
            return None
        part = _BucketPartition(
            partition.bucket, files, any(e.get("delta") for e in files)
        )
        batches = list(_read_bucket(meta, part, internal=True))
        return pa.Table.from_batches(batches) if batches else None

    new_t, old_t = state(meta_new), state(meta_old)
    if old_t is not None:
        # align the parent state to the commit's schema (adds / renames /
        # drops between the two versions must not break the diff)
        old_t = _apply_schema_events_arrow(
            old_t, meta_new, after_sid=meta_old.current_schema_id
        )
        old_t = _align_arrow(
            old_t, _internal_arrow_schema(meta_new),
            _add_defaults(meta_new, meta_old.current_schema_id),
        )

    def key_frame(tbl):
        import pandas as pd

        return pd.DataFrame({k: tbl.column(k).to_pandas() for k in keys})

    def emit(tbl, positions, force_delete: bool):
        if positions.size == 0:
            return
        sel = tbl.take(pa.array(positions))
        deleted = pc.fill_null(sel.column(DELETED), False)
        ct = (
            pa.array(["delete"] * len(sel))
            if force_delete
            else pc.if_else(deleted, pa.scalar("delete"), pa.scalar("upsert"))
        )
        out = sel.select(user_cols + [TS_APPLIED, LSN_APPLIED])
        out = out.append_column("_change_type", ct)
        out = out.append_column(
            "_commit_version", pa.array([partition.version] * len(sel), pa.int64())
        )
        yield from out.to_batches(max_chunksize=65536)

    if new_t is None and old_t is None:
        return
    if old_t is None:
        yield from emit(new_t, np.arange(len(new_t)), force_delete=False)
        return
    markers = [TS_APPLIED, LSN_APPLIED, DELETED]
    if new_t is None:
        # bucket vanished: every previously-live key is a delete
        old_alive = np.flatnonzero(
            ~pc.fill_null(old_t.column(DELETED), False).to_numpy(zero_copy_only=False)
        )
        yield from emit(old_t, old_alive, force_delete=True)
        return
    import pandas as pd

    def marker_np(tbl, mcol):
        # epoch-int / int8 encodings dodge tz-aware pandas equality quirks
        col = tbl.column(mcol)
        if mcol == TS_APPLIED:
            col = pc.cast(col, pa.int64())
        elif mcol == DELETED:
            col = pc.cast(pc.fill_null(col, False), pa.int8())
        return col.to_pandas()

    newk, oldk = key_frame(new_t), key_frame(old_t)
    for i, mcol in enumerate(markers):
        oldk[f"_m{i}"] = marker_np(old_t, mcol)
    j = newk.merge(oldk, on=keys, how="left")
    same = pd.Series(True, index=j.index)
    for i, mcol in enumerate(markers):
        a = pd.Series(marker_np(new_t, mcol).values, index=j.index)
        b = j[f"_m{i}"]
        same &= (a == b) | (a.isna() & b.isna())
    yield from emit(new_t, np.flatnonzero(~same.to_numpy()), force_delete=False)
    gone = oldk.merge(newk.assign(_in_new=1), on=keys, how="left")
    dead_old = pc.fill_null(old_t.column(DELETED), False).to_numpy(zero_copy_only=False)
    gone_pos = np.flatnonzero(gone["_in_new"].isna().to_numpy() & ~dead_old)
    yield from emit(old_t, gone_pos, force_delete=True)


class ChangesBatchReader(DataSourceReader):
    """Batch CDF read (Delta `table_changes` analog through plain
    ``spark.read``): every change committed in
    (startingVersion, endingVersion]. ``mode`` option: ``events``
    (default for row-event engines — files added by merge commits),
    ``resolved`` (per-commit resolved-state diff, the
    ``table_changes()`` twin), or ``auto`` (the default: aggregation
    tables take ``resolved`` — their delta rows are accumulator
    partials the event feed cannot carry — everything else
    ``events``)."""

    def __init__(self, options: dict):
        path = options.get("path")
        self._fs_token = _ship_token(path)
        self.meta = _TableMeta.load(path)
        self.feed_mode = _feed_mode(options, self.meta)
        if self.meta.mode != "mor" and self.feed_mode != "resolved":
            # a CoW commit rewrites whole buckets, so "files added this
            # commit" is not a change set — but the RESOLVED diff works
            # off manifests + resolved states on any mode
            raise ValueError(
                "transcript_changes mode=events serves merge-on-read tables "
                "only; use mode=resolved for copy-on-write tables (per-commit "
                "resolved-state diff)"
            )
        self.lo = int(options.get("startingversion", 0))
        hi = options.get("endingversion")
        self.hi = int(hi) if hi is not None else _head_version(path)

    def partitions(self):
        if self.feed_mode == "resolved":
            return _resolved_change_partitions(self.meta.root, self.lo, self.hi) or [
                _ChangeFilePartition(-1, "")
            ]
        return _change_file_partitions(self.meta.root, self.lo, self.hi) or [
            _ChangeFilePartition(-1, "")
        ]

    def read(self, partition):
        if not partition.path:
            return iter(())
        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        if isinstance(partition, _ResolvedDiffPartition):
            return _resolved_diff_batches(self.meta.root, partition)
        return _read_change_file(self.meta, partition)


class ChangesStreamReader(DataSourceStreamReader):
    """Version-offset change tail: each micro-batch serves the data files
    ADDED by merge/bootstrap commits since the last offset. MoR only —
    a merge-on-read commit's new files hold exactly the applied rows."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("transcript_changes requires .load(<table root>)")
        self.root = path
        self._fs_token = _ship_token(path)
        meta = _TableMeta.load(path)
        self.feed_mode = _feed_mode(options, meta)
        if meta.mode != "mor" and self.feed_mode != "resolved":
            raise ValueError(
                "transcript_changes mode=events streams merge-on-read tables "
                "only: a CoW commit rewrites whole buckets, so its new files "
                "are not a change set; use mode=resolved (per-commit "
                "resolved-state diff) for copy-on-write tables"
            )
        self.meta = meta
        sv = options.get("startingversion")
        self._start = int(sv) if sv is not None else _head_version(path)

    def initialOffset(self):
        return {"version": self._start}

    def latestOffset(self):
        return {"version": _head_version(self.root)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if self.feed_mode == "resolved":
            return _resolved_change_partitions(self.root, lo, hi) or [
                _ChangeFilePartition(-1, "")
            ]
        return _change_file_partitions(self.root, lo, hi) or [
            _ChangeFilePartition(-1, "")
        ]

    def read(self, partition):
        if not partition.path:
            return iter(())
        if self._fs_token:
            fsio.ensure_registered(self._fs_token)
        if isinstance(partition, _ResolvedDiffPartition):
            return _resolved_diff_batches(self.root, partition)
        return _read_change_file(self.meta, partition)

    def commit(self, end):
        pass

    def stop(self):
        pass


class TranscriptChangesDataSource(DataSource):
    """``spark.readStream.format("transcript_changes").load(root)``.

    Also batch-readable (`spark.read.format("transcript_changes")` with
    ``startingVersion``/``endingVersion`` — the Delta `table_changes`
    batch-CDF analog).

    Options: ``startingVersion`` (streaming: replay from an old snapshot;
    default = tail from the current version. batch: default 0),
    ``endingVersion`` (batch only; default = current), ``mode``
    (``auto`` default — aggregation tables serve per-commit RESOLVED
    state diffs, everything else raw change events; ``resolved`` opts
    ANY table into the diff form — including copy-on-write tables,
    which the event feed cannot serve at all; ``events`` refuses agg
    and CoW tables).
    Output = user columns + the applied LWW dominance pair
    (``_ts_applied``, ``_lsn_applied`` — fold the feed on it to rebuild
    state), ``_change_type`` (upsert|delete, plus patch in events mode),
    ``_commit_version``."""

    @classmethod
    def name(cls):
        return "transcript_changes"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("transcript_changes requires .load(<table root>)")
        meta = _TableMeta.load(path)
        mode = _feed_mode(self.options, meta)
        if meta.mode != "mor" and mode != "resolved":
            raise ValueError(
                "transcript_changes mode=events streams merge-on-read tables "
                "only: a CoW commit rewrites whole buckets, so its new files "
                "are not a change set; use mode=resolved (per-commit "
                "resolved-state diff) for copy-on-write tables"
            )
        return T.StructType(
            meta.user_schema().fields
            + [
                T.StructField(TS_APPLIED, T.TimestampType()),
                T.StructField(LSN_APPLIED, T.LongType()),
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def reader(self, schema):
        return ChangesBatchReader(self.options)

    def streamReader(self, schema):
        return ChangesStreamReader(self.options)


def bucket_partitioned(df, root: str):
    """Pre-shuffle a change frame onto the table's bucket grid before a
    facade write: ``repartition(n, pmod(xxhash64(bucket_col), n))`` —
    the JVM's xxhash64 IS the table's routing function, so every bucket
    lands wholly in one task and the write emits at most ``num_buckets``
    files instead of tasks × buckets. Optional but essential at scale:
    an unshuffled 1000-task write against a 4096-bucket table would emit
    millions of delta files per batch; this one shuffle caps it at 4096
    (the same discipline as the engine's exact-placement apply stage)."""
    from pyspark.sql import functions as F

    meta = _TableMeta.load(root)
    b = F.pmod(F.xxhash64(F.col(meta.bucket_col)), F.lit(meta.num_buckets))
    return df.repartition(meta.num_buckets, b)


def register(spark) -> None:
    """Register both formats and enable Python-source filter pushdown.

    Factory-registered filesystem schemes (plans/fsio
    ``register_filesystem(..., factory=...)``) are captured HERE, by
    value: Spark pickles the DataSource class eagerly at registration,
    and every facade stage — including ``schema()`` and reader/writer
    CONSTRUCTION — runs in fresh Python worker processes where the
    driver's fsio registrations do not exist. The dynamic subclasses
    below are pickled by value (cloudpickle serializes non-importable
    classes wholesale), carrying a snapshot of the current factory
    tokens; each worker entry point re-registers them before touching
    any path. Consequence, stated plainly: register filesystems BEFORE
    ``register(spark)``, and re-call it after adding a scheme — a
    re-registration by the same format name replaces the old one."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    tokens = [fsio.shippable(s) for s in fsio._FACTORY]

    # the DataSource INSTANCE is pickled between worker processes (schema
    # in one, reader construction possibly in another), so __init__ alone
    # cannot carry the registration — every entry method bootstraps
    def _boot(self):
        for t in type(self)._fsio_tokens:
            fsio.ensure_registered(t)

    class _Lake(TranscriptLakeDataSource):
        _fsio_tokens = tokens

        def __init__(self, options):
            _boot(self)
            super().__init__(options)

        def schema(self):
            _boot(self)
            return super().schema()

        def reader(self, schema):
            _boot(self)
            return super().reader(schema)

        def writer(self, schema, overwrite):
            _boot(self)
            return super().writer(schema, overwrite)

        def streamWriter(self, schema, overwrite):
            _boot(self)
            return super().streamWriter(schema, overwrite)

    class _Changes(TranscriptChangesDataSource):
        _fsio_tokens = tokens

        def __init__(self, options):
            _boot(self)
            super().__init__(options)

        def schema(self):
            _boot(self)
            return super().schema()

        def reader(self, schema):
            _boot(self)
            return super().reader(schema)

        def streamReader(self, schema):
            _boot(self)
            return super().streamReader(schema)

    spark.dataSource.register(_Lake)
    spark.dataSource.register(_Changes)
