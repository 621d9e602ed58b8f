"""Storage-partitioned join: shuffle-FREE equi-join of two co-bucketed
lake tables (the Iceberg SPJ / Hive sort-merge-bucket join, for the
offline snapshot-parquet backend).

Joining two 100 TB tables with a vanilla ``df.join`` shuffles BOTH sides
on the key — ~200 TB over the network — even though both tables were
already hash-bucketed on that key at write time. When the two tables share
the bucket function (same ``xxhash64(bucket_col) % num_buckets``, same
column type, same bucket count), bucket *i* of A can only ever match
bucket *i* of B, so the join decomposes into ``num_buckets`` independent
bucket-local joins with ZERO data movement.

Physical plan: one tiny metadata row per bucket (the two file lists) is
distributed to ``num_buckets`` tasks; each task reads its bucket pair
straight from storage with pyarrow, resolves MoR delta layers to LWW
winners arrow-side (the same fold kernel the fused apply path uses —
``plans.lake._fold_lww_arrow``), drops tombstones, and joins the two
bucket states with Arrow's hash join. The only exchange in the plan moves
``num_buckets`` metadata rows (~KB); every data byte stays in the task
that read it. The whole join runs one stage.

This is the pattern Iceberg v2 executes natively when
``spark.sql.sources.v2.bucketing.enabled`` is on and both tables share a
bucket transform; the reference (single-node ES pipeline) has no analog.

Preconditions (validated):
- identical ``num_buckets`` at the two chosen versions, identical
  bucket-column NAME and TYPE (the bucket hash is type-sensitive);
- every live file written under the CURRENT schema era (run ``compact()``
  after a schema DDL to rewrite old-era files — era re-mapping is a
  Spark-side concern this arrow-path does not duplicate);
- plain LWW tables (partial-update / agg / first-row merge engines have
  custom resolves and route through ``read()`` instead).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schemas import DELETED, LSN_APPLIED, TS_APPLIED
from .lake import SnapshotParquetTable

_INTERNAL = (TS_APPLIED, LSN_APPLIED, DELETED)


def _check_spec(t: SnapshotParquetTable, side: str) -> None:
    if t.spec.partial_updates or t.spec.agg_spec or t.spec.first_row:
        raise ValueError(
            f"{side}: storage-partitioned join supports plain LWW tables only; "
            "this table uses a custom merge engine — read() it instead"
        )


def _side_meta(t: SnapshotParquetTable, version: int | None):
    m = t.manifest(version)
    sid = int(m.get("current_schema_id", 0))
    for b, entries in m["buckets"].items():
        for e in entries:
            if int(e["schema_id"]) != sid:
                raise ValueError(
                    f"bucket {b} holds a file from schema era {e['schema_id']} "
                    f"(current {sid}); run compact() before a storage-partitioned join"
                )
    schema = T.StructType.fromJson(m["schema"])
    files = {
        int(b): {
            "paths": [os.path.join(t.root, e["path"]) for e in entries],
            # >1 file, or ANY delta layer (raw-append deltas can hold several
            # versions of one key in a single file) -> LWW fold required
            "fold": len(entries) > 1 or any(e.get("delta") for e in entries),
        }
        for b, entries in m["buckets"].items()
        if entries
    }
    return m, schema, files


def join_cobucketed(
    ta: SnapshotParquetTable,
    tb: SnapshotParquetTable,
    on: Sequence[str],
    how: str = "inner",
    version_a: int | None = None,
    version_b: int | None = None,
    columns_a: Sequence[str] | None = None,
    columns_b: Sequence[str] | None = None,
) -> DataFrame:
    """Bucket-local equi-join of two co-bucketed tables on ``on`` (column
    names present in both; must include the shared bucket column).
    ``columns_a`` / ``columns_b`` prune payload columns at the parquet
    read (keys are always read). ``how`` ∈ {inner, left}."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    _check_spec(ta, "left table")
    _check_spec(tb, "right table")
    on = list(on)
    if ta.spec.bucket_col != tb.spec.bucket_col:
        raise ValueError(
            f"bucket columns differ: {ta.spec.bucket_col!r} vs {tb.spec.bucket_col!r}"
        )
    if ta.spec.bucket_col not in on:
        raise ValueError(
            f"join keys {on} must include the bucket column {ta.spec.bucket_col!r} "
            "— co-location only holds on the bucketed key"
        )
    ma, schema_a, files_a = _side_meta(ta, version_a)
    mb, schema_b, files_b = _side_meta(tb, version_b)
    na = int(ma.get("num_buckets", ta.spec.num_buckets))
    nb = int(mb.get("num_buckets", tb.spec.num_buckets))
    if na != nb:
        raise ValueError(
            f"bucket counts differ ({na} vs {nb}); rebucket() one side first"
        )
    fa = {f.name: f for f in schema_a.fields}
    fb = {f.name: f for f in schema_b.fields}
    for c in on:
        if c not in fa or c not in fb:
            raise ValueError(f"join column {c!r} missing from a side's schema")
        if fa[c].dataType != fb[c].dataType:
            raise ValueError(
                f"join column {c!r} type mismatch: {fa[c].dataType} vs {fb[c].dataType}"
            )

    def _cols(schema, want, side):
        names = [f.name for f in schema.fields]
        if want is None:
            return [c for c in names if c not in on]
        unknown = sorted(set(want) - set(names))
        if unknown:
            raise ValueError(f"{side}: unknown columns {unknown}")
        return [c for c in names if c in set(want) and c not in on]

    pay_a = _cols(schema_a, columns_a, "left")
    pay_b = _cols(schema_b, columns_b, "right")
    clash = sorted(set(pay_a) & set(pay_b))
    if clash:
        raise ValueError(
            f"payload columns {clash} exist on both sides; prune or rename first"
        )
    out_fields = (
        [fa[c] for c in on]
        + [fa[c] for c in pay_a]
        + [T.StructField(f.name, f.dataType, True) for f in schema_b.fields if f.name in pay_b]
    )
    out_schema = T.StructType(out_fields)
    keys_a, keys_b = list(ta.spec.key_cols), list(tb.spec.key_cols)

    # inner: only bucket pairs BOTH sides populate can produce output;
    # left: every A bucket (a B-less bucket yields null-extended A rows)
    buckets = sorted(files_a) if how == "left" else sorted(set(files_a) & set(files_b))
    spark = ta.spark
    if not buckets:
        return spark.createDataFrame([], out_schema)
    meta = spark.createDataFrame(
        [
            (b, json.dumps(files_a.get(b)), json.dumps(files_b.get(b)))
            for b in buckets
        ],
        "bucket int, fa string, fb string",
    ).repartition(len(buckets), "bucket")

    join_type = {"inner": "inner", "left": "left outer"}[how]
    read_a = list(dict.fromkeys([*on, *keys_a, *pay_a, *_INTERNAL]))
    read_b = list(dict.fromkeys([*on, *keys_b, *pay_b, *_INTERNAL]))
    out_names = [f.name for f in out_schema.fields]

    def _gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from ccdb_data_pipeline_spark.plans.lake import _fold_lww_arrow

        target = to_arrow_schema(out_schema)

        def _bucket_state(side, read_cols, keys):
            """Read one bucket's file set and resolve to live LWW winners."""
            if side is None:
                return None
            parts = [pq.read_table(p, columns=read_cols) for p in side["paths"]]
            tbl = pa.concat_tables(parts, promote_options="default")
            if side["fold"]:
                tbl = _fold_lww_arrow(tbl, keys, [TS_APPLIED, LSN_APPLIED])
            live = pc.invert(pc.fill_null(tbl.column(DELETED), False))
            return tbl.filter(live).drop_columns(list(_INTERNAL))

        for batch in batches:
            for row in batch.to_pylist():
                left = _bucket_state(json.loads(row["fa"]), read_a, keys_a)
                if left is None:
                    continue
                right = _bucket_state(json.loads(row["fb"]), read_b, keys_b)
                if right is None:
                    import pyarrow as _pa

                    if join_type == "inner":
                        continue
                    joined = left
                    for name in pay_b:
                        idx = target.get_field_index(name)
                        joined = joined.append_column(
                            target.field(idx),
                            _pa.nulls(len(joined), type=target.field(idx).type),
                        )
                else:
                    # single-file bucket states may still hold several rows
                    # per key only when deltas exist; they were folded above.
                    joined = left.select([*on, *pay_a]).join(
                        right.select([*on, *pay_b]),
                        keys=on,
                        join_type=join_type,
                        use_threads=False,
                    )
                out = joined.select(out_names).cast(target)
                if len(out):
                    yield from out.to_batches(max_chunksize=65536)

    return meta.mapInArrow(_gen, out_schema)
