"""Lake-table backends: bucketed snapshot-parquet MERGE with atomic commits.

``SnapshotParquetTable`` is the sandbox backend (no Iceberg jar offline —
``IcebergTable`` in iceberg.py is the production path with the identical
interface). It re-creates, Spark-natively, the reference's whole sink layer:

- keyed upsert/delete apply (index_ccdb.py:103-105,121-147)  -> bucket-scoped
  MERGE: read ONLY the buckets the batch touches, full-outer resolve with
  LWW dominance, rewrite only those buckets;
- blue/green alias swap atomic publish (index_ccdb.py:45-71) -> manifest
  pointer (HEAD) swapped by atomic rename; readers always see a complete
  snapshot, never a partial write;
- rollback on failure (index_ccdb.py:170-178)                -> uncommitted
  data files are simply unreferenced; ``rollback()`` re-points HEAD;
- archive merge/compaction (s3_utils.py:21-59)               -> ``compact()``
  rewrites buckets dropping tombstones and merging small files.

Scale design: the table is hash-bucketed on ``conv_id`` (all turns of a
conversation co-locate). A micro-batch's MERGE cost is O(size of affected
buckets), not O(table): at 10^10 rows / 4096 buckets each bucket is ~2.4M
rows — one executor's worth of work. Deletes are kept as tombstones carrying
the deleting writer's (ts, lsn) so a late, lower-dominance update can never
resurrect a deleted key (FIXTURES.md: "stays deleted"); compaction reclaims
them once the stream's lateness horizon passes.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fsio
from ..operators.dedupe import EPOCH, lww_order
from ..operators.evolve import align_to_schema, evolve_schema
from ..schemas import (
    AGG_N,
    AGG_RESET,
    BUCKET,
    DELETED,
    LSN_APPLIED,
    PATCH,
    TS_APPLIED,
    TableSpec,
)


@dataclass
class MergeStats:
    batch_id: int
    skipped: bool
    n_source: int = 0
    n_insert: int = 0
    n_update: int = 0
    n_delete: int = 0
    n_malformed: int = 0
    n_buckets: int = 0
    lsn_min: int | None = None
    lsn_max: int | None = None
    snapshot_id: str = ""
    version: int = -1
    # expectation name -> violation count (write-time data-quality gates)
    expectations: dict | None = None


def _patch_survivor_mask(kid, rank, grank_list, patch, deleted):
    """Shared numpy core of the SURVIVOR-SET patch fold (see
    _fold_patches_pandas): boolean keep-mask over the rows.

    ``kid``: dense per-row key ids; ``rank``: row rank under the global
    (ts, lsn) order; ``grank_list``: [(writer_mask, grank)] per sequence
    group, grank ranking (coalesce(seq, MIN), lsn); ``patch``/``deleted``:
    row flags. Keeps: the key's LAST full image (existence + its columns,
    at its ORIGINAL version), every sequence-group winner, and every patch
    not provably dead — i.e. patches above the image's (ts, lsn), all
    patches of image-less (orphan) keys, and all patches of tombstoned
    keys (recomposition with a later insert, the round-3 R3-10 contract).
    Dropping is safe exactly when dominated: the per-column/per-group
    argmax is monotone under adding events, so an event beaten by a kept
    in-batch writer for everything it writes can never win in any
    superset of the event stream.

    Returns ``(keep, promote)``: ``promote`` marks kept NON-last-image
    full rows (old images surviving only as group winners) that must be
    re-flagged ``_patch`` — they are hidden carrier rows, preserving the
    invariant that a file has at most ONE visible (non-patch) row per
    key, which the plain-scan path, ``count_fast`` and the ``all_live``
    routing all rely on. Sound because a non-last image can never win an
    ungrouped column (the last image writes every column at a higher
    (ts, lsn)), so losing its image-writer status changes no outcome."""
    import numpy as np

    n = kid.size
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep, keep.copy()
    nk = int(kid.max()) + 1
    inv = np.empty(n, dtype=np.int64)
    inv[rank] = np.arange(n, dtype=np.int64)  # rank -> row index
    img_rank = np.full(nk, -1, dtype=np.int64)
    base_rows = np.flatnonzero(~patch)
    np.maximum.at(img_rank, kid[base_rows], rank[base_rows])
    has_img = img_rank >= 0
    img_row = np.where(has_img, inv[np.maximum(img_rank, 0)], -1)
    is_last_img = np.zeros(n, dtype=bool)
    is_last_img[img_row[has_img]] = True
    keep[img_row[has_img]] = True
    img_dead = np.zeros(nk, dtype=bool)
    img_dead[has_img] = deleted[img_row[has_img]]
    p_rows = np.flatnonzero(patch)
    if p_rows.size:
        k = kid[p_rows]
        alive_cond = (~has_img[k]) | (rank[p_rows] > img_rank[k]) | img_dead[k]
        keep[p_rows[alive_cond]] = True
    for writers, grank in grank_list:
        gmax = np.full(nk, -1, dtype=np.int64)
        w_rows = np.flatnonzero(writers)
        if not w_rows.size:
            continue
        np.maximum.at(gmax, kid[w_rows], grank[w_rows])
        win = w_rows[grank[w_rows] == gmax[kid[w_rows]]]
        keep[win] = True
    promote = keep & (~patch) & (~is_last_img)
    return keep, promote


def _fold_patches_pandas(pdf, keys: list[str], payload_cols: list[str],
                         sort_cols: list[str], seq_groups: dict | None = None):
    """SURVIVOR-SET compression for a partial-update batch (one Arrow batch
    = one bucket partition) — round 4 replaced the old single-row overlay
    fold, which was WRONG under out-of-order event times across fold
    boundaries: collapsing a key to one row stamps every column with the
    row's max (ts, lsn) even when a column's true writer was older, so a
    cross-layer resolve misorders that column against writers from other
    batches (found by the seqgroup hypothesis search, like R3-10).

    Instead the fold keeps a SUBSET of the original event rows, verbatim —
    per-column provenance intact, so composition under the read-side
    argmax (plans/lake._resolve_versions, operators/patch.py) is exact by
    construction: (1) the key's last full image by (ts, lsn) — existence +
    all its columns; (2) each sequence group's winner by (coalesce(seq,
    MIN), lsn); (3) every patch above the image (or all patches when the
    key has no image / a tombstoned image — the orphan and R3-10
    recomposition carries). Everything else is DOMINATED: beaten by a
    kept in-batch writer for every column/group it writes, and argmax is
    monotone under adding events, so it can never win in any extension of
    the stream. Compression: the common CDC shape (full images, few
    trailing patches) still folds to ~1 row per key; patch-heavy orphan
    keys stay raw — correctness over compression."""
    import numpy as np

    n = len(pdf)
    if n == 0:
        return pdf
    import pandas as _pd

    kid = pdf.groupby(keys, sort=False).ngroup().to_numpy()
    # asi8 handles naive AND tz-aware timestamps (TS_APPLIED is coalesced
    # non-null upstream, so no NaT ambiguity)
    ts = _pd.DatetimeIndex(pdf[sort_cols[0]]).asi8
    lsn = pdf[sort_cols[1]].to_numpy(dtype=np.int64)
    order = np.lexsort((lsn, ts))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    patch = pdf[PATCH].to_numpy().astype(bool)
    deleted = pdf[DELETED].to_numpy().astype(bool)
    eff_patch = patch & ~deleted  # carriers (patch & deleted) are writers
    grank_list = []
    for s, _members in (seq_groups or {}).items():
        s_valid = pdf[s].notna().to_numpy()
        s_fill = pdf[s].astype("Int64").fillna(-(2 ** 63)).to_numpy(dtype=np.int64)
        gorder = np.lexsort((lsn, s_fill))
        grank = np.empty(n, dtype=np.int64)
        grank[gorder] = np.arange(n, dtype=np.int64)
        grank_list.append(((~eff_patch) | s_valid, grank))
    keep, promote = _patch_survivor_mask(kid, rank, grank_list, patch, deleted)
    out = pdf[keep].copy()
    if promote.any():
        # GROUP-CARRIER flag (round 4): (_patch AND _deleted) — hidden from
        # every visibility path, full writer under the effective-patch
        # resolve predicates (see _resolve_versions)
        out.loc[promote[keep], PATCH] = True
        out.loc[promote[keep], DELETED] = True
    return out


def _fold_agg_pandas(pdf, keys: list[str], payload_cols: list[str],
                     agg_spec: dict, int_cols: set[str], float_cols: set[str]):
    """Within-batch fold for an aggregation-engine table (one Arrow batch =
    one bucket partition): one PARTIAL row per key — accumulators over the
    key's events AFTER its last in-batch delete, in log (LSN) order. A batch
    containing a delete marks its partial ``_agg_reset`` so the read-time
    merge discards older layers (operators/aggmerge.py has the algebra).

    Vectorized: positional delete masks + two groupbys — no per-row Python.
    Integer/float agg outputs use pandas nullable dtypes so a missing
    accumulator survives the Arrow hop as NULL, not NaN/0."""
    import numpy as np

    pdf = pdf.sort_values(LSN_APPLIED, kind="stable").reset_index(drop=True)
    pos = np.arange(len(pdf), dtype=np.int64)
    deleted = pdf[DELETED].to_numpy()
    pdf["_delpos"] = np.where(deleted, pos, -1)
    last_del = pdf.groupby(keys, sort=False)["_delpos"].transform("max").to_numpy()
    contrib_mask = (~deleted) & (pos > last_del)

    g_all = pdf.groupby(keys, sort=False)
    out = g_all.agg(
        **{
            TS_APPLIED: (TS_APPLIED, "max"),
            LSN_APPLIED: (LSN_APPLIED, "max"),
            AGG_RESET: (DELETED, "any"),
            BUCKET: (BUCKET, "max"),
        }
    )
    gc = pdf[contrib_mask].groupby(keys, sort=False)
    out[AGG_N] = gc.size().reindex(out.index).fillna(0).astype("int64")
    for c in payload_cols:
        fn = agg_spec.get(c, "last")
        if fn == "sum":
            s = gc[c].sum(min_count=1)
        elif fn == "min":
            s = gc[c].min()
        elif fn == "max":
            s = gc[c].max()
        else:  # last non-null, log order (pdf is LSN-sorted; .last skips NA)
            s = gc[c].last()
        s = s.reindex(out.index)
        if c in int_cols:
            s = s.astype("Int64")
        elif c in float_cols:
            s = s.astype("Float64")
        out[c] = s
    out[DELETED] = (out[AGG_N] == 0).to_numpy()
    out["_op"] = None
    return out.reset_index()


def _fold_first_pandas(pdf, keys: list[str], sort_cols: list[str]):
    """Within-batch collapse for a first-row table: per key, the FIRST
    non-delete writer in (ts, lsn) order — unless the batch deletes the key,
    in which case the (dominant, permanent) tombstone wins. Vectorized:
    one stable sort + two drop_duplicates."""
    import pandas as _pd

    pdf = pdf.sort_values(sort_cols, kind="stable")
    dels = pdf[pdf[DELETED]].drop_duplicates(keys, keep="last").set_index(keys)
    firsts = pdf[~pdf[DELETED]].drop_duplicates(keys, keep="first").set_index(keys)
    keep_first = firsts[~firsts.index.isin(dels.index)]
    return _pd.concat([dels, keep_first]).reset_index()


def _fold_lww_arrow(tbl, keys: list[str], sort_cols: list[str]):
    """LWW winner per key over a pyarrow Table — the zero-pandas analog of
    ``sort_values(sort_cols).drop_duplicates(keys, keep="last")``. The sort
    ranks only the two int64/timestamp dominance columns; key columns are
    gathered once in rank order for the group-by; the (large) payload strings
    are gathered exactly once, for the winner rows only. Ties on
    (ts, lsn) cannot occur (LSN is unique per event)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    order = pc.sort_indices(
        tbl.select(sort_cols), sort_keys=[(c, "ascending") for c in sort_cols]
    ).to_numpy(zero_copy_only=False)
    ktbl = tbl.select(keys).take(pa.array(order)).append_column(
        "_rank", pa.array(np.arange(order.size, dtype=np.int64))
    )
    gb = ktbl.group_by(keys, use_threads=False).aggregate([("_rank", "max")])
    winners = order[gb.column("_rank_max").to_numpy(zero_copy_only=False)]
    return tbl.take(pa.array(np.sort(winners)))


def _fold_patches_arrow(tbl, keys: list[str], payload_cols: list[str],
                        sort_cols: list[str], seq_groups: dict | None = None):
    """Arrow twin of the SURVIVOR-SET patch fold (see
    ``_fold_patches_pandas`` for the semantics and the round-4 provenance
    rationale): keeps a subset of the original event rows verbatim — the
    last full image, each sequence group's winner, and every
    non-dominated patch — via one boolean mask over numpy rank arrays;
    a single ``tbl.filter`` gathers the survivors."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        return tbl
    parts = [pc.cast(tbl.column(k), pa.string()).combine_chunks() for k in keys]
    comb = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    kid = pc.dictionary_encode(comb).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ts = pc.cast(tbl.column(sort_cols[0]), pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    lsn = tbl.column(sort_cols[1]).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((lsn, ts))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    patch = pc.fill_null(tbl.column(PATCH), False).combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(bool)
    deleted = pc.fill_null(tbl.column(DELETED), False).combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(bool)
    eff_patch = patch & ~deleted  # carriers (patch & deleted) are writers
    grank_list = []
    for s, _members in (seq_groups or {}).items():
        s_col = tbl.column(s).combine_chunks()
        s_valid = pc.is_valid(s_col).to_numpy(zero_copy_only=False)
        s_fill = pc.fill_null(pc.cast(s_col, pa.int64()), -(2 ** 63)).to_numpy(
            zero_copy_only=False
        )
        gorder = np.lexsort((lsn, s_fill))
        grank = np.empty(n, dtype=np.int64)
        grank[gorder] = np.arange(n, dtype=np.int64)
        grank_list.append(((~eff_patch) | s_valid, grank))
    keep, promote = _patch_survivor_mask(kid, rank, grank_list, patch, deleted)
    if promote.any():
        # GROUP-CARRIER flag (round 4): (_patch AND _deleted)
        tbl = tbl.set_column(
            tbl.schema.get_field_index(PATCH), PATCH,
            pa.array((patch | promote), type=pa.bool_()),
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index(DELETED), DELETED,
            pa.array((deleted | promote), type=pa.bool_()),
        )
    return tbl.filter(pa.array(keep))


def _resolve_patches_arrow(tbl, keys: list[str], payload_cols: list[str],
                           sort_cols: list[str], seq_groups: dict | None = None):
    """ONE-SHOT whole-set patch resolve on a pyarrow Table — the facade
    read's materializer over a key's CONCATENATED layers (exact there:
    with every event present, per-column provenance cannot be lost). Per
    key, one output row: existence/tombstone from the last full image,
    each payload column from its last writer (full images write every
    column, patches their non-NULL columns), sequence groups atomically
    from their own (seq, lsn) argmax. NOT a layer fold — round 4 split
    this from ``_fold_patches_arrow`` (survivor compression) because the
    collapsed row stamps every column with the row's max version, which
    only composes when nothing else will ever be compared against it.

    All selection runs on int64 rank arrays (numpy); each payload column's
    (large) values are gathered ONCE, for winner rows only — the same
    no-strings-through-the-sort property that made the plain-LWW Arrow fold
    +10% over pandas."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    order = pc.sort_indices(
        tbl.select(sort_cols), sort_keys=[(c, "ascending") for c in sort_cols]
    ).to_numpy(zero_copy_only=False)
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n, dtype=np.int64)

    # dense per-row key ids via dictionary encoding of the composite key
    # (key columns are non-null: malformed rows were filtered upstream)
    parts = [pc.cast(tbl.column(k), pa.string()).combine_chunks() for k in keys]
    comb = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    kid = pc.dictionary_encode(comb).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_keys = int(kid.max()) + 1 if n else 0

    def last_rows(mask: np.ndarray, rk: np.ndarray) -> np.ndarray:
        """Per key: the row index maximizing rank ``rk`` among ``mask`` rows
        (-1 = no such row). Plain fancy assignment after an ascending rank
        sort — numpy stores the LAST value for a repeated index."""
        w = np.full(n_keys, -1, dtype=np.int64)
        rows = np.flatnonzero(mask)
        if rows.size:
            rows = rows[np.argsort(rk[rows], kind="stable")]
            w[kid[rows]] = rows
        return w

    def np_bool(name: str) -> np.ndarray:
        return tbl.column(name).combine_chunks().to_numpy(zero_copy_only=False).astype(bool)

    patch = np_bool(PATCH)
    deleted = np_bool(DELETED)
    # GROUP CARRIERS (round 4: patch & deleted — old images the survivor
    # fold kept for their group writes) are FULL writers for the resolve
    # but never existence candidates or visible rows
    eff_patch = patch & ~deleted
    w_all = last_rows(np.ones(n, dtype=bool), ranks)
    w_base = last_rows(~patch, ranks)
    has_base = w_base >= 0
    out_deleted = np.where(has_base, deleted[np.maximum(w_base, 0)], False)
    out_patch = ~has_base  # no full image in batch -> patch row

    def gather(name: str, w: np.ndarray, null_on_delete: bool = False):
        wm = np.where(out_deleted, -1, w) if null_on_delete else w
        idx = pa.array(wm, type=pa.int64(), mask=(wm < 0))
        return pc.take(tbl.column(name).combine_chunks(), idx)

    grouped: dict[str, np.ndarray] = {}  # payload col -> its winner rows
    if seq_groups:
        lsn = tbl.column(LSN_APPLIED).combine_chunks().to_numpy(zero_copy_only=False)
        for s, members in seq_groups.items():
            s_col = tbl.column(s).combine_chunks()
            s_valid = pc.is_valid(s_col).to_numpy(zero_copy_only=False)
            s_fill = pc.fill_null(pc.cast(s_col, pa.int64()), -(2 ** 63)).to_numpy(
                zero_copy_only=False
            )
            order_g = np.lexsort((lsn, s_fill))  # primary s, tie-break lsn
            ranks_g = np.empty(n, dtype=np.int64)
            ranks_g[order_g] = np.arange(n, dtype=np.int64)
            w_g = last_rows((~eff_patch) | s_valid, ranks_g)
            for c in (s, *members):
                grouped[c] = w_g

    arrays, names = [], tbl.column_names
    for c in names:
        if c == PATCH:
            arrays.append(pa.array(out_patch))
        elif c == DELETED:
            arrays.append(pa.array(out_deleted))
        elif c in grouped:
            arrays.append(gather(c, grouped[c], null_on_delete=True))
        elif c in payload_cols:
            valid = pc.is_valid(tbl.column(c).combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            arrays.append(gather(c, last_rows((~eff_patch) | valid, ranks),
                                 null_on_delete=True))
        else:
            # keys, dominance pair, bucket, op rider: from the last event
            arrays.append(gather(c, w_all))
    res = pa.Table.from_arrays(arrays, names=names)
    # tombstoned keys' patch rows resolve into an EXTRA orphan patch row
    # (hidden by the ~_patch read filter) so a later-batch insert
    # recomposes; the recursive call sees a patch-only subset
    dead_rows = patch & out_deleted[kid] if n else patch
    if dead_rows.any():
        sub = tbl.filter(pa.array(dead_rows))
        res = pa.concat_tables(
            [res, _resolve_patches_arrow(sub, keys, payload_cols, sort_cols, seq_groups)]
        )
    return res


def _fold_first_arrow(tbl, keys: list[str], sort_cols: list[str]):
    """Zero-pandas within-batch collapse for a first-row table — the Arrow
    twin of ``_fold_first_pandas`` (byte-parity pytest-pinned). Per key:
    the batch's LAST delete row if any (the tombstone is permanent and
    dominates), else the FIRST non-delete writer in (ts, lsn) order.
    Rank arithmetic only; winner rows are taken once, in file order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    order = pc.sort_indices(
        tbl.select(sort_cols), sort_keys=[(c, "ascending") for c in sort_cols]
    ).to_numpy(zero_copy_only=False)
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n, dtype=np.int64)
    parts = [pc.cast(tbl.column(k), pa.string()).combine_chunks() for k in keys]
    comb = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    kid = pc.dictionary_encode(comb).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_keys = int(kid.max()) + 1 if n else 0
    deleted = tbl.column(DELETED).combine_chunks().to_numpy(zero_copy_only=False).astype(bool)

    w_del = np.full(n_keys, -1, dtype=np.int64)  # max rank among deletes
    rows = np.flatnonzero(deleted)
    np.maximum.at(w_del, kid[rows], ranks[rows])
    w_first = np.full(n_keys, n, dtype=np.int64)  # min rank among live rows
    rows = np.flatnonzero(~deleted)
    np.minimum.at(w_first, kid[rows], ranks[rows])
    winner_rank = np.where(w_del >= 0, w_del, w_first)
    winners = order[winner_rank]
    return tbl.take(pa.array(np.sort(winners)))


def _fold_agg_arrow(tbl, keys: list[str], payload_cols: list[str], agg_spec: dict):
    """Zero-pandas within-batch fold for an aggregation-engine table — the
    Arrow twin of ``_fold_agg_pandas`` (byte-parity pytest-pinned): one
    PARTIAL row per key, accumulators over the key's events AFTER its last
    in-batch delete in log (LSN) order, ``_agg_reset`` when the batch
    deletes the key. Accumulation runs in pyarrow's hash aggregation
    (sum/min/max/last all null-skipping with min_count=1, matching the
    pandas nullable-dtype semantics); the delete-cut mask is numpy
    positional arithmetic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    lsn = tbl.column(LSN_APPLIED).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(lsn, kind="stable")
    tbl = tbl.take(pa.array(order))

    parts = [pc.cast(tbl.column(k), pa.string()).combine_chunks() for k in keys]
    comb = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    kid = pc.dictionary_encode(comb).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_keys = int(kid.max()) + 1 if n else 0
    pos = np.arange(n, dtype=np.int64)
    deleted = tbl.column(DELETED).combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
    last_del = np.full(n_keys, -1, dtype=np.int64)
    rows = np.flatnonzero(deleted)
    np.maximum.at(last_del, kid[rows], pos[rows])
    contrib = (~deleted) & (pos > last_del[kid])

    t2 = tbl.append_column("_kid", pa.array(kid))
    base = t2.group_by("_kid", use_threads=False).aggregate(
        [(TS_APPLIED, "max"), (LSN_APPLIED, "max"), (DELETED, "any"), (BUCKET, "max")]
    )
    gkid = base.column("_kid").to_numpy(zero_copy_only=False).astype(np.int64)
    # representative row per kid (keys are constant within a kid)
    rep = np.full(n_keys, n, dtype=np.int64)
    np.minimum.at(rep, kid, pos)
    rep_take = pa.array(rep[gkid], type=pa.int64())

    fns = {c: agg_spec.get(c, "last") for c in payload_cols}
    ct = t2.filter(pa.array(contrib))  # LSN order preserved -> 'last' is log order
    cagg = ct.group_by("_kid", use_threads=False).aggregate(
        [("_kid", "count")] + [(c, fns[c]) for c in payload_cols]
    )
    ckid = cagg.column("_kid").to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.full(n_keys, -1, dtype=np.int64)
    if ckid.size:
        idx[ckid] = np.arange(ckid.size, dtype=np.int64)
    take_c = idx[gkid]
    c_take = pa.array(take_c, type=pa.int64(), mask=(take_c < 0))

    agg_n = pc.fill_null(
        pc.cast(pc.take(cagg.column("_kid_count").combine_chunks(), c_take), pa.int64()), 0
    )
    arrays = [pc.take(tbl.column(k).combine_chunks(), rep_take) for k in keys]
    names = list(keys)
    for c in payload_cols:
        col = pc.take(cagg.column(f"{c}_{fns[c]}").combine_chunks(), c_take)
        arrays.append(pc.cast(col, tbl.schema.field(c).type))
        names.append(c)
    arrays += [
        base.column(f"{TS_APPLIED}_max").combine_chunks(),
        base.column(f"{LSN_APPLIED}_max").combine_chunks(),
        pc.equal(agg_n, 0),
        base.column(f"{DELETED}_any").combine_chunks(),
        agg_n,
        base.column(f"{BUCKET}_max").combine_chunks(),
        pa.nulls(len(gkid), type=tbl.schema.field("_op").type),
    ]
    names += [TS_APPLIED, LSN_APPLIED, DELETED, AGG_RESET, AGG_N, BUCKET, "_op"]
    return pa.Table.from_arrays(arrays, names=names)


def _merge_agg_arrow(tbl, keys: list[str], payload_cols: list[str], agg_spec: dict):
    """Cross-LAYER aggregation-partial merge on a pyarrow Table — the
    facade-read twin of :meth:`SnapshotParquetTable._resolve_agg`
    (operators/aggmerge.py algebra), distinct from ``_fold_agg_arrow``
    (which folds RAW single events within a batch). Per key: the newest
    reset layer's LSN is the cutoff (its partial already excludes the
    pre-delete events), older layers are discarded, survivors merge with
    each column's aggregate function; liveness is sum(_n_contrib) > 0.
    Closed over both stored forms (fused partials and raw rows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    lsn = tbl.column(LSN_APPLIED).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(lsn, kind="stable")
    tbl = tbl.take(pa.array(order))  # LSN order -> pyarrow 'last' = log order
    lsn = lsn[order]

    parts = [pc.cast(tbl.column(k), pa.string()).combine_chunks() for k in keys]
    comb = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    kid = pc.dictionary_encode(comb).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_keys = int(kid.max()) + 1 if n else 0
    reset = pc.fill_null(tbl.column(AGG_RESET), False).combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(bool)
    cut = np.full(n_keys, np.iinfo(np.int64).min, dtype=np.int64)
    rows = np.flatnonzero(reset)
    np.maximum.at(cut, kid[rows], lsn[rows])
    keep = lsn >= cut[kid]
    t2 = tbl.append_column("_kid", pa.array(kid)).filter(pa.array(keep))

    fns = {c: agg_spec.get(c, "last") for c in payload_cols}
    gb = t2.group_by("_kid", use_threads=False).aggregate(
        [(c, fns[c]) for c in payload_cols]
        + [
            (TS_APPLIED, "max"),
            (LSN_APPLIED, "max"),
            (AGG_N, "sum"),
            (AGG_RESET, "any"),
        ]
    )
    gkid = gb.column("_kid").to_numpy(zero_copy_only=False).astype(np.int64)
    rep = np.full(n_keys, n, dtype=np.int64)
    pos = np.arange(len(kid), dtype=np.int64)
    np.minimum.at(rep, kid, pos)
    rep_take = pa.array(rep[gkid], type=pa.int64())

    agg_n = pc.fill_null(pc.cast(gb.column(f"{AGG_N}_sum").combine_chunks(), pa.int64()), 0)
    dead = pc.equal(agg_n, 0)
    arrays, names = [], []
    for k in keys:
        arrays.append(pc.take(tbl.column(k).combine_chunks(), rep_take))
        names.append(k)
    for c in payload_cols:
        col = pc.cast(
            gb.column(f"{c}_{fns[c]}").combine_chunks(), tbl.schema.field(c).type
        )
        # tombstones carry no accumulator state
        arrays.append(pc.if_else(dead, pa.scalar(None, tbl.schema.field(c).type), col))
        names.append(c)
    arrays += [
        gb.column(f"{TS_APPLIED}_max").combine_chunks(),
        gb.column(f"{LSN_APPLIED}_max").combine_chunks(),
        dead,
        gb.column(f"{AGG_RESET}_any").combine_chunks(),
        agg_n,
    ]
    names += [TS_APPLIED, LSN_APPLIED, DELETED, AGG_RESET, AGG_N]
    return pa.Table.from_arrays(arrays, names=names)


def _ts_micros(v):
    """Parquet timestamp statistic -> int epoch micros (naive = UTC)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def _range_bound_us(v) -> int:
    """time_range bound (datetime | ISO string | epoch micros int) -> micros."""
    import datetime as _dt

    if isinstance(v, str):
        v = _dt.datetime.fromisoformat(v)
    if isinstance(v, _dt.datetime):
        return _ts_micros(v)
    return int(v)


def _ts_nullfree(pairs, ts_col: str):
    """(tag, path) -> (tag, ok): ok iff every row group records parquet
    statistics for ``ts_col`` with null_count == 0. The whole-file-drop
    safety probe (see drop_expired_files): min/max stats ignore nulls, so a
    NULL-ts row — exempt from retention — could hide inside a file whose
    stats say "all old". Footer-only IO; module-level so Spark can ship it
    to executors without capturing the table object."""
    import pyarrow.parquet as _pq

    out = []
    for tag, path in pairs:
        md = _pq.read_metadata(path if "://" not in path else fsio.open_input(path))
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if ts_col not in cols:
            out.append((tag, False))
            continue
        ci = cols[ts_col]
        ok = md.num_row_groups > 0
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or st.null_count is None or st.null_count > 0:
                ok = False
                break
        out.append((tag, ok))
    return out


def _stat_scalar(v):
    """Parquet footer min/max -> JSON-storable, order-preserving scalar:
    timestamps as epoch micros (ints), dates as ISO strings (lexicographic
    == chronological), numbers/strings/bools as-is; unencodable -> None
    (the file then reads conservatively for that column)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return _ts_micros(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return None
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


_SKIP_PRED = object()  # sentinel: predicate unusable for stats pruning


def _encode_in_list(val):
    """Encode an in-list for the stats prune tier. SQL-NULL members encode
    to None (``_file_may_match`` skips them — a NULL matches no row); a
    NON-null member that ``_stat_scalar`` cannot encode poisons the whole
    predicate (returns ``_SKIP_PRED`` so the caller drops it from pruning
    — it could match anything) rather than masquerading as NULL."""
    enc = tuple(_stat_scalar(v) for v in val)
    if any(e is None and v is not None for e, v in zip(enc, val)):
        return _SKIP_PRED
    return enc


def _guard_bucket_widening(spec, old_schema: T.StructType, new_schema: T.StructType):
    """Refuse schema evolution that changes the BUCKET column's type:
    Spark's xxhash64 is width-dependent for integrals (xxhash64(int32 5)
    != xxhash64(int64 5)), so widening the bucket key would silently hash
    existing conversations into DIFFERENT storage buckets — the per-bucket
    fold then misses their prior versions and the table corrupts without
    an error. (Iceberg avoids this by SPEC: its bucket transform hashes
    int and long identically; Spark's hash does not.) Widening any other
    key/payload column is safe — folds group by aligned VALUES, not
    hashes. Re-keying goes through rebucket()."""
    old_t = old_schema[spec.bucket_col].dataType
    new_t = new_schema[spec.bucket_col].dataType
    if old_t != new_t:
        raise ValueError(
            f"schema evolution cannot widen bucket column {spec.bucket_col!r} "
            f"({old_t.simpleString()} -> {new_t.simpleString()}): Spark's "
            "xxhash64 is width-dependent, so existing keys would re-bucket "
            "and their prior versions would be missed by the per-bucket "
            "fold. Re-key through rebucket() instead."
        )


def _residual_lit(val, dtype=None):
    """Residual-filter literal sharing the prune tier's datetime encoding
    (``_stat_scalar``: naive = UTC), so manifest-level file skipping and
    the exact row filter can never disagree. ``F.lit(datetime)`` is
    SESSION-TIMEZONE dependent — under ``spark.sql.session.timeZone !=
    UTC`` it drifts from the stats encoding and a file could be "provably
    non-matching" by stats yet hold rows the residual would keep (silent
    row loss). Instead: a Timestamp column compares the instant via
    ``timestamp_micros`` on the SAME encoded micros (mirroring the
    time_range filter); a TimestampNTZ column compares the wall clock via
    a tz-free string->ntz cast of those micros."""
    import datetime as _dt

    if isinstance(val, _dt.datetime):
        us = _ts_micros(val)
        if isinstance(dtype, T.TimestampNTZType):
            sec, rem = divmod(us, 1_000_000)
            wall = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=sec, microseconds=rem)
            return F.lit(wall.isoformat(sep=" ")).cast(T.TimestampNTZType())
        return F.timestamp_micros(F.lit(us))
    return F.lit(val)


def _where_term(col: str, op: str, val, dtype=None):
    """One ``where=[(col, op, value)]`` predicate as a Column, with
    datetime literals routed through :func:`_residual_lit`."""
    c = F.col(col)
    if op == "in":
        import datetime as _dt

        if any(isinstance(v, _dt.datetime) for v in val):
            term = F.lit(False)
            for v in val:
                term = term | (c == _residual_lit(v, dtype))
            return term
        return c.isin(list(val))
    lit = _residual_lit(val, dtype)
    if op in ("=", "=="):
        return c == lit
    if op == ">":
        return c > lit
    if op == ">=":
        return c >= lit
    if op == "<":
        return c < lit
    return c <= lit


def _reclaim_dv_dirs(root: str, kept: set[str]) -> tuple[int, int]:
    """Delete every deletion-vector sidecar directory under ``root``/dv
    whose relative path (``dv/dv-<hex>``) is in NO retained manifest —
    superseded sidecars (re-deletes union positions into a NEW sidecar)
    and compaction-shed ones otherwise leak forever, since the data walks
    only cover data/. Returns (n_files_deleted, bytes_reclaimed)."""
    dv_root = os.path.join(root, "dv")
    prefix = root.rstrip("/") + "/"
    n = freed = 0
    doomed_dirs: set[str] = set()
    for full, size in fsio.walk_files(dv_root):
        rel = full[len(prefix):] if full.startswith(prefix) else os.path.relpath(full, root)
        rel = rel.replace(os.sep, "/")
        sidecar = "/".join(rel.split("/")[:2])  # dv/dv-<hex>
        if sidecar not in kept:
            freed += size
            fsio.remove(full)
            n += 1
            doomed_dirs.add(sidecar)
    for d in doomed_dirs:
        fsio.rmtree(os.path.join(root, d))
    return n, freed


def _dv_key(rel_path: str) -> str:
    """Deletion-vector file key: the last two path components (bucket dir +
    part basename). A bare basename is NOT unique — one Spark write job
    reuses the same part-XXXXX-<job-uuid> name in every bucket directory
    it writes."""
    return "/".join(rel_path.replace(os.sep, "/").split("/")[-2:])


def _file_may_match(e: dict, preds: list) -> bool:
    """Conjunctive predicates vs a manifest entry's recorded column stats:
    False only when some predicate PROVES the file holds no matching row
    (min/max disjoint from the probed range). Files without stats for a
    column — legacy entries, undeclared columns, stat-less row groups —
    always read conservatively; comparisons across incompatible types do
    too. Null rows never match a comparison predicate, and min/max stats
    ignore nulls, so skipping on stats alone is sound."""
    st = e.get("stats") or {}
    for col, op, val in preds:
        rng = st.get(col)
        if not rng or val is None:
            continue
        mn, mx = rng[0], rng[1]  # entries may carry [min, max, null_count]
        try:
            if op in ("=", "=="):
                if val < mn or val > mx:
                    return False
            elif op == ">":
                if mx <= val:
                    return False
            elif op == ">=":
                if mx < val:
                    return False
            elif op == "<":
                if mn >= val:
                    return False
            elif op == "<=":
                if mn > val:
                    return False
            elif op == "in":
                # a NULL member matches no row (SQL semantics), so it is
                # SKIPPED, not conservative: prune when every non-null
                # member misses the range (all-null member lists prove
                # zero matches outright)
                if all(v is None or v < mn or v > mx for v in val):
                    return False
        except TypeError:
            continue  # incomparable probe value: read conservatively
    return True


def _file_all_match(e: dict, preds: list) -> bool:
    """True only when the entry's recorded stats PROVE every LIVE row
    matches every predicate — the whole-file-drop condition for a
    metadata-only DELETE. Requires per-column [min, max, null_count] with
    zero nulls (a null row never matches), all_live footer stats (no
    tombstones / orphan patches hiding in the file), and a range fully
    inside the predicate. Anything unknown -> False (fall back to the
    positional path)."""
    if not preds or not e.get("all_live"):
        return False
    st = e.get("stats") or {}
    for col, op, val in preds:
        rng = st.get(col)
        if not rng or len(rng) < 3 or rng[2] != 0 or val is None:
            return False
        mn, mx = rng[0], rng[1]
        try:
            if op in ("=", "=="):
                if not (mn == mx == val):
                    return False
            elif op == ">":
                if not (mn > val):
                    return False
            elif op == ">=":
                if not (mn >= val):
                    return False
            elif op == "<":
                if not (mx < val):
                    return False
            elif op == "<=":
                if not (mx <= val):
                    return False
            elif op == "in":
                if not (mn == mx and mn in val):
                    return False
            else:
                return False
        except TypeError:
            return False
    return True


def _footer_stats(pairs, with_bucket: bool = False, ts_col: str | None = None,
                  stats_cols: tuple = ()):
    """(tag, path) -> (tag, n_rows, lsn_min, lsn_max, ts_min, ts_max,
    all_live, col_stats[, bucket]) from parquet footers only (no data
    pages). Module-level so Spark can ship it to executors without
    capturing the table object.

    ``ts_col`` adds the event-time range (epoch micros; None when the column
    is absent or all-null) — the per-file metric manifest-level time-range
    pruning reads. ``stats_cols`` adds {col: [min, max]} for each declared
    stat column present in the file with usable row-group statistics (the
    Iceberg per-file column-metrics analog; drives generic predicate file
    skipping). With ``with_bucket=True`` the file's bucket is recovered
    from the ``_bucket`` column's row-group statistics (flat-layout delta
    files carry the bucket as a data column instead of a hive directory;
    exact shuffle placement guarantees min == max)."""
    import pyarrow.parquet as _pq

    out = []
    for b, full in pairs:
        md = _pq.read_metadata(full if "://" not in full else fsio.open_input(full))
        if md.num_rows == 0:
            # flat writes emit a 0-row part file for empty shuffle partitions
            # (partitionBy never did — no dir, no file); skip it so it is
            # never referenced by the manifest (orphan GC reclaims the bytes)
            continue
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lsn_idx = cols[LSN_APPLIED]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(lsn_idx).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        tlo = thi = None
        if ts_col is not None and ts_col in cols:
            t_idx = cols[ts_col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(t_idx).statistics
                if st is not None and st.has_min_max:
                    mn, mx = _ts_micros(st.min), _ts_micros(st.max)
                    tlo = mn if tlo is None else min(tlo, mn)
                    thi = mx if thi is None else max(thi, mx)
        # tombstone-free? the _deleted bool column's stats answer without
        # reading data: max == False -> every row is live (drives the
        # metadata-only COUNT fast path)
        all_live = None
        if DELETED in cols:
            d_idx = cols[DELETED]
            all_live = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(d_idx).statistics
                if st is None or not st.has_min_max:
                    all_live = None
                    break
                if st.max:
                    all_live = False
                    break
        if all_live and PATCH in cols:
            # orphan patch rows (compaction carry-through) are not live rows;
            # a file containing any must not take the metadata-count fast path
            p_idx = cols[PATCH]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(p_idx).statistics
                if st is None or not st.has_min_max:
                    all_live = None
                    break
                if st.max:
                    all_live = False
                    break
        cstats = {}
        for sc_name in stats_cols:
            if sc_name not in cols:
                continue
            s_idx = cols[sc_name]
            smn = smx = None
            nulls = 0
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(s_idx).statistics
                if st is None or not st.has_min_max:
                    ok = False  # any stat-less row group -> no file bound
                    break
                a, z = _stat_scalar(st.min), _stat_scalar(st.max)
                if a is None or z is None:
                    ok = False
                    break
                smn = a if smn is None else min(smn, a)
                smx = z if smx is None else max(smx, z)
                if nulls is not None:
                    nc = st.null_count
                    nulls = None if nc is None else nulls + int(nc)
            if ok and smn is not None:
                # [min, max, null_count] — the null count is what lets an
                # ALL-rows-match proof hold (null never matches a
                # comparison); None/absent = unknown, proof unavailable
                cstats[sc_name] = (
                    [smn, smx] if nulls is None else [smn, smx, nulls]
                )
        if not with_bucket:
            out.append((b, md.num_rows, lo, hi, tlo, thi, all_live, cstats))
            continue
        b_idx = cols[BUCKET]
        bkt_lo = bkt_hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(b_idx).statistics
            if st is not None and st.has_min_max:
                bkt_lo = st.min if bkt_lo is None else min(bkt_lo, st.min)
                bkt_hi = st.max if bkt_hi is None else max(bkt_hi, st.max)
        if bkt_lo is None or bkt_lo != bkt_hi:
            raise AssertionError(
                f"flat delta file {full} spans buckets {bkt_lo}..{bkt_hi}; "
                "exact shuffle placement should make this impossible"
            )
        out.append((b, md.num_rows, lo, hi, tlo, thi, all_live, cstats, int(bkt_lo)))
    return out


def _footer_stats_shipped(pairs, token, **kw):
    """Executor-side :func:`_footer_stats` for factory-registered schemes:
    the worker re-registers the filesystem first so ``fsio.open_input``
    resolves the scheme inside the task process."""
    fsio.ensure_registered(token)
    return _footer_stats(list(pairs), **kw)


def _dist_write_dir(df: DataFrame, out_dir: str, token, flat: bool,
                    sort_cols: tuple = (), pre_partitioned: bool = False) -> list[int]:
    """Distributed Arrow parquet writer for factory-registered schemes
    (round-4 verdict item #1): each ``mapInArrow`` task re-registers the
    filesystem in its worker process, splits its partition by bucket,
    sorts/strips exactly like the driver twin, and streams each bucket's
    rows straight to the store — the driver sees only O(files) entry rows
    (bucket, n_rows, task), never the data. File names carry the task id
    (``part-{task:05d}[-b{bucket:05d}]``) so retries overwrite their own
    deterministic output and concurrent buckets never collide; layouts
    (flat single-bucket files / hive ``_bucket=N/`` dirs) are identical to
    the driver plane, so footer recovery, DV keys, and manifests are
    byte-compatible. Returns the sorted distinct task ids that wrote files
    (the multi-task guard the lifecycle test asserts on).

    ``pre_partitioned=True`` skips the bucket shuffle when the caller's
    plan already hash-distributed rows by bucket (compaction's fold) —
    the per-task bucket split keeps correctness either way; partitioning
    only shapes file counts."""
    sort_cols = tuple(sort_cols)
    drop_after_sort = [c for c in sort_cols if c.startswith("_zorder")]

    def write_part(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        batches = [b for b in it if b.num_rows]
        if not batches:
            return
        fsio.ensure_registered(token)
        tid = TaskContext.get().partitionId()
        tbl = pa.Table.from_batches(batches)
        bucket = tbl.column(BUCKET).to_numpy(zero_copy_only=False)
        out = []
        for b in np.unique(bucket):
            part = tbl.filter(pa.array(bucket == b))
            if sort_cols:
                part = part.sort_by([(c, "ascending") for c in sort_cols])
                if drop_after_sort:
                    part = part.drop_columns(drop_after_sort)
            if flat:
                path = fsio.join(out_dir, f"part-{tid:05d}-b{int(b):05d}.parquet")
            else:
                d = fsio.join(out_dir, f"{BUCKET}={int(b)}")
                fsio.makedirs(d)
                part = part.drop_columns([BUCKET])
                path = fsio.join(d, f"part-{tid:05d}.parquet")
            w_fs, w_p = fsio.resolve(path)
            pq.write_table(part, w_p, filesystem=w_fs, compression="zstd")
            out.append((int(b), len(part), tid))
        import pyarrow as _pa

        yield _pa.record_batch({
            "bucket": _pa.array([r[0] for r in out], _pa.int32()),
            "n_rows": _pa.array([r[1] for r in out], _pa.int64()),
            "task": _pa.array([r[2] for r in out], _pa.int32()),
        })

    fsio.makedirs(out_dir)
    part = df if pre_partitioned else df.repartition(F.col(BUCKET))
    rows = part.mapInArrow(
        write_part, schema="bucket int, n_rows long, task int"
    ).collect()
    return sorted({int(r["task"]) for r in rows})


def _dist_read_files(spark, paths: list[str], token,
                     schema: str = "path string, pos long") -> DataFrame:
    """Distributed parquet read of explicit file paths on a
    factory-registered scheme: the file LIST (O(files)) is parallelized,
    each task re-registers the filesystem and streams its files' row
    batches — no driver materialization of the data."""
    names = [f.strip().split()[0] for f in schema.split(",")]

    def read_part(it):
        import pyarrow.parquet as pq

        fsio.ensure_registered(token)
        for batch in it:
            for p in batch.column("path").to_pylist():
                with fsio.open_input(p) as f:
                    t = pq.read_table(f)
                yield from t.select(names).to_batches()

    n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(n)
    return fdf.mapInArrow(read_part, schema=schema)


def _dist_read_era(spark, root: str, group: list[dict], era,
                   need_pos: bool, token) -> DataFrame:
    """Distributed twin of ``_arrow_read_era`` for factory-registered
    schemes: per-file cast/null-alignment to the era's internal schema and
    the DV position columns happen inside the tasks; the driver only ships
    the file list."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    target = pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in era.fields]
    )
    out_schema = T.StructType(list(era.fields))
    if need_pos:
        out_schema = out_schema.add("_dv_base", T.StringType()).add("_dv_pos", T.LongType())

    def read_part(it):
        import numpy as np
        import pyarrow as _pa
        import pyarrow.parquet as pq

        fsio.ensure_registered(token)
        for batch in it:
            for rel in batch.column("path").to_pylist():
                with fsio.open_input(fsio.join(root, rel)) as f:
                    t = pq.read_table(f)
                cols, names = [], []
                for fld in target:
                    names.append(fld.name)
                    if fld.name in t.column_names:
                        cols.append(t.column(fld.name).cast(fld.type))
                    else:
                        cols.append(_pa.nulls(len(t), fld.type))
                t2 = _pa.table(dict(zip(names, cols)))
                if need_pos:
                    t2 = t2.append_column(
                        "_dv_base", _pa.array([_dv_key(rel)] * len(t2), _pa.string())
                    ).append_column(
                        "_dv_pos", _pa.array(np.arange(len(t2), dtype=np.int64))
                    )
                yield from t2.to_batches()

    paths = [(e["path"],) for e in group]
    n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(paths, "path string").repartition(n)
    return fdf.mapInArrow(read_part, schema=out_schema)


def _dist_write_dv(df: DataFrame, out_dir: str, token) -> dict[str, int]:
    """Distributed DV sidecar writer: each task writes its partition's
    (path, pos) rows as one parquet file through the worker-registered
    filesystem and returns per-file position counts; the driver folds the
    O(files) partial counts — never the positions themselves."""

    def write_part(it):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        batches = [b for b in it if b.num_rows]
        if not batches:
            return
        fsio.ensure_registered(token)
        tid = TaskContext.get().partitionId()
        tbl = pa.Table.from_batches(batches)
        w_fs, w_p = fsio.resolve(fsio.join(out_dir, f"part-{tid:05d}.parquet"))
        pq.write_table(tbl, w_p, filesystem=w_fs, compression="zstd")
        g = tbl.group_by("path").aggregate([("path", "count")])
        yield pa.record_batch({
            "path": g.column("path").combine_chunks(),
            "n": g.column("path_count").cast(pa.int64()).combine_chunks(),
        })

    fsio.makedirs(out_dir)
    rows = df.mapInArrow(write_part, schema="path string, n long").collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["path"]] = counts.get(r["path"], 0) + int(r["n"])
    return counts


_PARTITION_PROBE_CACHE: dict[int, list[int]] = {}
_PROBE_ARRAY_CACHE: dict[int, object] = {}


def _partition_probes(spark, n: int) -> list[int]:
    """For each shuffle partition id 0..n-1, an int64 whose Murmur3 hash —
    the same ``pmod(hash(col), n)`` Spark's HashPartitioning applies — lands
    exactly on that partition. ``repartition(n, probe_col)`` then becomes
    EXACT placement: one (bucket, salt) combo per partition, no hash-scatter
    collisions (which leave ~1/e of partitions empty and stack 2-3 combos on
    others) and single-bucket output files without the dynamic-partition
    writer. Probes come from a one-off Spark job (hashing with the engine
    that will partition, so the two can never disagree) and are cached per
    session lifetime — the mapping is pure arithmetic, valid for any data."""
    probes = _PARTITION_PROBE_CACHE.get(n)
    if probes is not None:
        return probes
    got: dict[int, int] = {}
    lo = 0
    while len(got) < n:
        # 40n uniform samples miss a given residue w.p. (1-1/n)^(40n) ~ e^-40
        rows = (
            spark.range(lo, lo + 40 * n)
            .select(F.col("id"), F.pmod(F.hash(F.col("id")), F.lit(n)).alias("p"))
            .groupBy("p")
            .agg(F.min("id").alias("x"))
            .collect()
        )
        for r in rows:
            got.setdefault(int(r["p"]), int(r["x"]))
        lo += 40 * n
    probes = [got[p] for p in range(n)]
    _PARTITION_PROBE_CACHE[n] = probes
    return probes


def _probe_array(spark, n: int):
    """The probe table as ONE cached array-literal Column. Building it from
    n individual ``F.lit`` calls costs n py4j round-trips per batch (~0.4s
    driver time at n=256); a single list literal is one call, and the Column
    (an unbound expression) is reusable across every batch's plan."""
    col = _PROBE_ARRAY_CACHE.get(n)
    if col is None:
        probes = _partition_probes(spark, n)
        col = F.lit(probes).cast(T.ArrayType(T.LongType()))
        _PROBE_ARRAY_CACHE[n] = col
    return col


def _apply_schema_events(df: DataFrame, m: dict, after_sid: int) -> DataFrame:
    """Replay the manifest's rename/drop log onto a frame written under
    schema era ``after_sid``: only events with a NEWER sid apply, in sid
    order (so chains compose — drop x then rename y->x is legal). This is
    how field-id semantics fall out of name-keyed parquet files: an era
    older than a drop loses that column here, so a later re-add of the same
    name (a different field) aligns to null instead of resurrecting stale
    values."""
    events = sorted(
        [("rename", r) for r in m.get("renames", [])]
        + [("drop", d) for d in m.get("drops", [])]
        + [("add", a) for a in m.get("adds", []) if a.get("default") is not None],
        key=lambda e: int(e[1]["sid"]),
    )
    for kind, r in events:
        if int(r["sid"]) <= after_sid:
            continue
        if kind == "rename" and r["from"] in df.columns:
            if r["to"] in df.columns:
                raise RuntimeError(
                    f"rename {r['from']}->{r['to']} collides with an existing "
                    f"column in schema era {after_sid}"
                )
            df = df.withColumnRenamed(r["from"], r["to"])
        elif kind == "drop" and r["name"] in df.columns:
            df = df.drop(r["name"])
        elif kind == "add" and r["name"] not in df.columns:
            # initial-default (Iceberg v3 analog): rows that predate the
            # column read the declared default, not null — metadata-only,
            # constant-folded by Catalyst, no file rewritten
            dt_ = T.StructType.fromJson({"type": "struct", "fields": [
                {"name": r["name"], "type": r["type"], "nullable": True, "metadata": {}},
            ]}).fields[0].dataType
            df = df.withColumn(r["name"], F.lit(r["default"]).cast(dt_))
    return df


def _atomic_write(path: str, data: str) -> None:
    if "://" in path:
        fsio.write_atomic(path, data)  # one object PUT: atomic per key
        return
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX — the alias-swap analog


class _RebaseUnsafe(RuntimeError):
    """Internal: a lost-CAS compaction cannot be rebased (tombstones were
    reclaimed while concurrent deltas landed in the rewritten buckets) and
    must be redone against fresh state."""


class CommitConflictError(RuntimeError):
    """Another writer already committed this snapshot version. The caller's
    manifest view is stale: re-read the table state and retry the operation
    (Iceberg's optimistic-concurrency CommitFailedException analog)."""


def _atomic_write_exclusive(path: str, data: str) -> None:
    """Compare-and-swap on a version slot: write a temp file, then ``link``
    it to the final name — link(2) fails atomically if the slot is taken, so
    two racing writers can never both believe they own one version.
    Remote schemes route through fsio.write_exclusive (probe-then-put;
    see plans/fsio.py for the object-store conditional-put discussion)."""
    if "://" in path:
        try:
            fsio.write_exclusive(path, data)
        except fsio.ExclusiveCreateError:
            raise CommitConflictError(
                f"snapshot version slot already committed by another writer: {path}"
            ) from None
        return
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise CommitConflictError(
            f"snapshot version slot already committed by another writer: {path}"
        ) from None
    finally:
        os.unlink(tmp)


class AuditFailedError(RuntimeError):
    """A write-audit-publish audit rejected the staged snapshot; the branch
    stays unpublished (main is untouched)."""


class ExpectationFailedError(RuntimeError):
    """A fail-action expectation saw violations: the batch is aborted BEFORE
    the manifest commit (any files the apply job wrote stay unreferenced and
    are reclaimed by orphan GC). Carries {expectation_name: violation_count}
    in ``counts``."""

    def __init__(self, batch_id: int, counts: dict):
        self.batch_id = batch_id
        self.counts = counts
        super().__init__(
            f"batch {batch_id} violates fail expectation(s) {counts}; not committed"
        )


def _expectation_cols(spec: TableSpec, op_col):
    """(name, action, violation_expr) per expectation. A violation is a
    non-delete event whose predicate is FALSE or NULL (DLT semantics) —
    deletes carry no payload to validate."""
    out = []
    for name, pred, action in spec.expectations:
        if action not in ("warn", "drop", "fail"):
            raise ValueError(f"expectation {name!r}: unknown action {action!r}")
        viol = (op_col != "D") & ~F.coalesce(F.expr(pred), F.lit(False))
        out.append((name, action, viol))
    return out


class PublishConflictError(RuntimeError):
    """The branch cannot fast-forward onto main: main has commits the branch
    is not descended from. Rebase (re-apply the batches on a fresh branch) or
    drop the branch."""


class SnapshotParquetTable:
    """Bucket-partitioned parquet table with JSON manifests + named refs.

    ``ref`` selects which pointer this handle reads and advances: ``"main"``
    is the published table (the ``HEAD`` file — the reference's live ES
    alias, index_ccdb.py:45-71); any other name is a staging branch under
    ``refs/`` (the not-yet-aliased new index). Version slots are GLOBAL and
    append-only — every commit CAS-allocates the next free slot regardless
    of ref — so branches and main can never clobber each other's manifests;
    only the ref files differ."""

    def __init__(self, spark: SparkSession, root: str, spec: TableSpec | None = None,
                 ref: str = "main"):
        self.spark = spark
        self.root = root
        self.spec = spec or TableSpec()
        self.ref = ref
        self._manifest: dict | None = None

    # ------------------------------------------------------------ manifest IO

    @property
    def _head_path(self) -> str:
        if self.ref == "main":
            return os.path.join(self.root, "HEAD")
        return os.path.join(self.root, "refs", self.ref)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"m-{version:010d}.json")

    def exists(self) -> bool:
        return fsio.exists(os.path.join(self.root, "HEAD"))

    def _max_slot(self) -> int:
        """Highest allocated version slot across ALL refs (one readdir —
        the Iceberg metadata-listing analog). The CAS in ``_commit`` makes
        slot allocation race-safe; this makes it race-FREE in the common
        case so writers don't burn a conflict-retry per contended commit."""
        mdir = os.path.join(self.root, "manifests")
        mx = -1
        for fn in fsio.listdir(mdir):
            if fn.startswith("m-") and fn.endswith(".json"):
                mx = max(mx, int(fn[2:12]))
        return mx

    def _alloc_version(self) -> int:
        return max(self._max_slot(), self.manifest()["version"]) + 1

    def current_version(self) -> int:
        return int(fsio.read_text(self._head_path).strip())

    def refresh(self) -> "SnapshotParquetTable":
        """Drop the cached manifest so the next read sees commits made by
        OTHER writers (the DataSource facade, a concurrent maintenance
        job, another process). The handle caches the manifest for plan
        stability within one batch; external commits need this poke —
        the Iceberg table.refresh() analog."""
        self._manifest = None
        return self

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            if self._manifest is not None:
                return self._manifest
            version = self.current_version()
            self._manifest = json.loads(fsio.read_text(self._manifest_path(version)))
            return self._manifest
        return json.loads(fsio.read_text(self._manifest_path(version)))

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest()["schema"])

    @property
    def mode(self) -> str:
        return self.manifest().get("mode", "cow")

    @property
    def last_batch_id(self) -> int:
        return self.manifest()["last_batch_id"]

    @property
    def last_dml_batch_id(self) -> int:
        """High-water mark of the MAINTENANCE/DML id space (engine-originated
        writes: DELETE/UPDATE WHERE, retention/TTL sweeps) — disjoint from
        the stream epoch sequence gated by ``last_batch_id``."""
        return self.manifest().get("last_dml_batch_id", -1)

    @property
    def last_lsn(self) -> int:
        return self.manifest()["last_lsn"]

    def _ref_lock(self, timeout: float = 30.0, stale_after: float = 120.0):
        """Tiny mkdir-based mutex guarding the read-check-write of this
        handle's ref file (mkdir is atomic on POSIX and most object-store
        FUSE layers). Held for microseconds per commit; a lock older than
        ``stale_after`` is presumed crashed and stolen."""
        import contextlib

        lock_dir = f"{self._head_path}.lock"
        remote = "://" in lock_dir

        @contextlib.contextmanager
        def _cm():
            deadline = time.time() + timeout
            while True:
                try:
                    if remote:
                        # marker-object mutex: probe-then-put (production
                        # object-store deployments CAS the ref through a
                        # catalog instead; see plans/fsio.py)
                        fsio.write_exclusive(lock_dir, str(time.time()))
                    else:
                        os.mkdir(lock_dir)
                    break
                except (FileExistsError, fsio.ExclusiveCreateError):
                    try:
                        if remote:
                            held = time.time() - float(fsio.read_text(lock_dir))
                        else:
                            held = time.time() - os.path.getmtime(lock_dir)
                        if held > stale_after:
                            (fsio.remove if remote else os.rmdir)(lock_dir)
                            continue
                    except (OSError, ValueError):
                        pass
                    if time.time() > deadline:
                        raise TimeoutError(f"ref lock busy: {lock_dir}")
                    time.sleep(0.01)
            try:
                yield
            finally:
                try:
                    (fsio.remove if remote else os.rmdir)(lock_dir)
                except OSError:
                    pass

        return _cm()

    def _commit(self, m: dict, expected_ref: int | None = None) -> None:
        """Two-phase commit, Iceberg-style: (1) persist the snapshot manifest
        into a globally-unique version slot (exclusive-create; a slot taken
        by another ref's concurrent writer just means we take the next one);
        (2) compare-and-swap THIS ref to the new version — if the ref no
        longer points at ``expected_ref``, a concurrent writer on the same
        ref won, our snapshot is retracted and :class:`CommitConflictError`
        tells the caller to re-read and retry (the loser's data files are
        unreferenced; remove_orphans reclaims them)."""
        # Backfill the engine/normalize blocks on EVERY commit, not only
        # create(): a table created before these keys existed would
        # otherwise stay flag-less forever, and the DataSource facade
        # (which routes the per-bucket fold by engine.first_row and is
        # schema-blind to first-row-vs-LWW) could silently mis-resolve it.
        # The handle's spec declares the table's true engine.
        if "engine" not in m:
            m["engine"] = {
                "partial_updates": bool(self.spec.partial_updates),
                "agg_spec": bool(self.spec.agg_spec),
                "first_row": bool(self.spec.first_row),
            }
        # engine PARAMS (not just flags) ride the manifest so spec-less
        # consumers — the DataSource facade writer, a plain SQL user —
        # can project/fold the engine-correct delta layout without the
        # creating TableSpec in hand. Backfilled on every commit like the
        # flags (a pre-params manifest gains them on its next commit).
        if self.spec.agg_spec and "agg_fns" not in m["engine"]:
            m["engine"]["agg_fns"] = dict(self.spec.agg_spec)
        if self.spec.sequence_groups and "seq_groups" not in m["engine"]:
            m["engine"]["seq_groups"] = {
                s: list(members) for s, members in self.spec.sequence_groups.items()
            }
        if "normalize" not in m:
            m["normalize"] = {
                "ws_cols": list(self.spec.normalize_ws_cols),
                "empty_to_null_exempt": list(self.spec.empty_to_null_exempt),
            }
        if "stats_cols" not in m:
            m["stats_cols"] = list(self.spec.stats_cols)
        fsio.makedirs(os.path.join(self.root, "manifests"))
        while True:
            try:
                _atomic_write_exclusive(
                    self._manifest_path(m["version"]), json.dumps(m, indent=1)
                )
                break
            except CommitConflictError:
                m["version"] = self._max_slot() + 1
        if expected_ref is None:
            _atomic_write(self._head_path, str(m["version"]))
            self._manifest = m
            return
        with self._ref_lock():
            cur = self.current_version()
            if cur != expected_ref:
                # stale snapshot: based on a parent this ref moved past
                fsio.remove(self._manifest_path(m["version"]))
                self._manifest = None
                raise CommitConflictError(
                    f"ref {self.ref} moved {expected_ref} -> {cur} during commit; "
                    "re-read and retry"
                )
            _atomic_write(self._head_path, str(m["version"]))
        self._manifest = m

    # ------------------------------------------------------------ create / read

    def create(self, schema: T.StructType) -> None:
        """DDL analog of index create w/ mapping (index_ccdb.py:150-168)."""
        if self.exists():
            raise ValueError(f"table already exists at {self.root}")
        if self.spec.agg_spec:
            from ..operators.aggmerge import validate_agg_spec

            validate_agg_spec(self.spec.agg_spec)
            if self.spec.merge_mode != "mor":
                raise ValueError("agg_spec requires merge_mode='mor'")
            if self.spec.partial_updates:
                raise ValueError("agg_spec and partial_updates are mutually exclusive")
            if self.spec.first_row:
                raise ValueError("agg_spec and first_row are mutually exclusive")
            unknown = sorted(
                set(self.spec.agg_spec)
                - {f.name for f in schema.fields if f.name not in self.spec.key_cols}
            )
            if unknown:
                raise ValueError(f"agg_spec names non-payload columns: {unknown}")
        if self.spec.first_row:
            if self.spec.merge_mode != "mor":
                raise ValueError("first_row requires merge_mode='mor'")
            if self.spec.partial_updates:
                raise ValueError("first_row and partial_updates are mutually exclusive")
        if self.spec.sequence_groups:
            if not self.spec.partial_updates:
                raise ValueError("sequence_groups requires partial_updates=True")
            payload = {f.name for f in schema.fields if f.name not in self.spec.key_cols}
            seen: set[str] = set()
            for s, members in self.spec.sequence_groups.items():
                cols = (s, *members)
                bad = sorted(c for c in cols if c not in payload)
                if bad:
                    raise ValueError(f"sequence group columns not in payload: {bad}")
                dup = seen.intersection(cols)
                if dup:
                    raise ValueError(f"sequence groups overlap on: {sorted(dup)}")
                seen.update(cols)
                st = schema[s].dataType.simpleString()
                if st not in ("tinyint", "smallint", "int", "bigint"):
                    raise ValueError(
                        f"sequence column {s!r} must be an integer type, got {st}"
                    )
        fsio.makedirs(self.root)
        m = {
            "version": 0,
            "snapshot_id": uuid.uuid4().hex,
            "parent_snapshot_id": None,
            "schema": schema.jsonValue(),
            "schemas": {"0": schema.jsonValue()},
            "current_schema_id": 0,
            "mode": self.spec.merge_mode,
            "write_path": "fused" if self.spec.dedupe_on_write else "raw",
            "num_buckets": self.spec.num_buckets,
            "key_cols": list(self.spec.key_cols),
            "bucket_col": self.spec.bucket_col,
            "buckets": {},  # bucket -> [{path, schema_id}]
            # declared per-file column-statistics columns (see
            # TableSpec.stats_cols) — recorded so engine-less readers (the
            # DataSource facade) know which pushed filters can prune files
            "stats_cols": list(self.spec.stats_cols),
            # merge-engine flags for engine-less readers/writers (the
            # Python DataSource facade routes its fold/projection by
            # these; _commit backfills the full PARAMS — agg_fns,
            # seq_groups — alongside)
            "engine": {
                "partial_updates": bool(self.spec.partial_updates),
                "agg_spec": bool(self.spec.agg_spec),
                "first_row": bool(self.spec.first_row),
            },
            # normalization policy is TABLE semantics (the ""->null carve-out
            # and ws-collapse set) — recorded so external writers (the
            # DataSource facade) apply the identical kernel
            "normalize": {
                "ws_cols": list(self.spec.normalize_ws_cols),
                "empty_to_null_exempt": list(self.spec.empty_to_null_exempt),
            },
            "last_batch_id": -1,
            "last_dml_batch_id": -1,
            "last_lsn": -1,
            "summary": {"op": "create"},
            "committed_at": time.time(),
        }
        self._commit(m)

    @property
    def num_buckets(self) -> int:
        """Bucket count is TABLE state (manifest), not handle config — after
        ``rebucket`` partition evolution every handle must hash with the new
        count or writes land in the wrong bucket."""
        if self.exists():
            return int(self.manifest().get("num_buckets", self.spec.num_buckets))
        return self.spec.num_buckets

    def _bucket_expr(self, n: int | None = None):
        return F.pmod(
            F.xxhash64(F.col(self.spec.bucket_col)), F.lit(n or self.num_buckets)
        )

    def _internal_schema(self, schema: T.StructType) -> T.StructType:
        fields = list(schema.fields) + [
            T.StructField(TS_APPLIED, T.TimestampType(), True),
            T.StructField(LSN_APPLIED, T.LongType(), True),
            T.StructField(DELETED, T.BooleanType(), False),
        ]
        if self.spec.partial_updates:
            fields.append(T.StructField(PATCH, T.BooleanType(), False))
        if self.spec.agg_spec:
            fields.append(T.StructField(AGG_RESET, T.BooleanType(), False))
            fields.append(T.StructField(AGG_N, T.LongType(), False))
        return T.StructType(fields)

    def _read_files(self, entries: list[dict], m: dict,
                    apply_dv: bool = True, with_pos: bool = False) -> DataFrame | None:
        """Read data files grouped by their written schema era, align each era
        to the current schema (evolution: old int32 files -> current int64),
        and union. Returns None when there are no files.

        Entries carrying a deletion-vector sidecar (``e["dv"]`` — written by
        :meth:`delete_where_dv`) have those positions dropped here, so every
        consumer (read, compaction, count_fast's scan path, merge's CoW
        target) sees DV-deleted rows as gone. ``apply_dv=False`` is for the
        purge attestation, which must see the bytes that are still
        physically present. ``with_pos=True`` keeps the per-row
        ``(_dv_base, _dv_pos)`` file-position columns (parquet ``_metadata``
        — basename + row index) for the DV writer itself."""
        if not entries:
            return None
        cur = self._internal_schema(T.StructType.fromJson(m["schema"]))
        by_sid: dict[int, list[dict]] = {}
        for e in entries:
            by_sid.setdefault(e["schema_id"], []).append(e)
        dv_dirs = sorted(
            {e["dv"]["path"] for e in entries if e.get("dv")}
        ) if apply_dv else []
        dv_total = sum(e["dv"]["n_deleted"] for e in entries if e.get("dv")) if apply_dv else 0
        parts = []
        arrow_plane = self._arrow_plane()
        for sid, group in by_sid.items():
            era = self._internal_schema(T.StructType.fromJson(m["schemas"][str(sid)]))
            need_pos = with_pos or (apply_dv and any(e.get("dv") for e in group))
            if arrow_plane:
                df = self._arrow_read_era(group, era, need_pos)
            else:
                paths = [os.path.join(self.root, e["path"]) for e in group]
                df = self.spark.read.schema(era).parquet(*paths)
                if need_pos:
                    # hidden parquet metadata: the last TWO path components
                    # (bucket dir + part basename) are unique per table — a
                    # bare basename is NOT (one write job reuses the same
                    # part-XXXXX name in every bucket dir it touches);
                    # row_index is the in-file position. Selected at the scan
                    # so it survives renames/alignment.
                    fp = F.split(F.col("_metadata.file_path"), "/")
                    df = df.select(
                        "*",
                        F.concat_ws(
                            "/", F.element_at(fp, -2), F.element_at(fp, -1)
                        ).alias("_dv_base"),
                        F.col("_metadata.row_index").alias("_dv_pos"),
                    )
            # rename/drop events that postdate this era rewrite its column
            # names BEFORE alignment (Iceberg field-id semantics: the stored
            # column IS the renamed field; a dropped-then-re-added name is a
            # DIFFERENT field, so pre-drop values must not resurface).
            # Applied in sid order so chains (a->b then b->c; drop x then
            # rename y->x) compose.
            df = _apply_schema_events(df, m, after_sid=sid)
            aligned = align_to_schema(df, cur)
            if not need_pos and (with_pos or dv_dirs):
                # keep the union's shape consistent across era groups
                aligned = aligned.withColumn(
                    "_dv_base", F.lit(None).cast("string")
                ).withColumn("_dv_pos", F.lit(None).cast("long"))
            parts.append(aligned)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if dv_dirs:
            if arrow_plane:
                dv = self._dv_positions_df(dv_dirs).select(
                    F.col("path").alias("_dv_base"), F.col("pos").alias("_dv_pos")
                )
            else:
                dv = self.spark.read.parquet(
                    *[os.path.join(self.root, d) for d in dv_dirs]
                ).select(
                    F.col("path").alias("_dv_base"), F.col("pos").alias("_dv_pos")
                )
            # the DV side is positions-only (16 bytes/row); broadcast while
            # small, fall back to an AQE-planned join for huge delete sets
            if dv_total <= 5_000_000:
                dv = F.broadcast(dv)
            out = out.join(dv, ["_dv_base", "_dv_pos"], "left_anti")
        if not with_pos and (dv_dirs or any(
            c in out.columns for c in ("_dv_base", "_dv_pos")
        )):
            out = out.drop("_dv_base", "_dv_pos")
        return out

    def read(self, version: int | None = None, include_internal: bool = False,
             buckets: list[int] | None = None,
             columns: list[str] | None = None,
             time_range: tuple | None = None,
             where: list | None = None,
             read_optimized: bool = False) -> DataFrame:
        """Snapshot read (time travel via ``version``). Excludes tombstones.

        ``read_optimized=True`` is the Hudi RO-view analog: serve ONLY base
        (compacted) files — delta layers are skipped entirely, so no
        per-key resolve runs and every bucket takes the plain-scan path.
        The result is stale by at most the compaction lag (rows merged
        since the last compact() are invisible; their pre-compaction base
        versions serve instead) but the plan is a pure pushdown scan —
        the right trade for latency-insensitive analytical readers on a
        hot table. Default (real-time view) folds delta layers per key.

        ``time_range=(lo, hi)`` (datetimes or ISO strings, naive = UTC,
        inclusive) returns only rows whose ``ts_col`` falls in the window
        (null ts excluded — SQL BETWEEN semantics), pruning with the
        per-file ts min/max the footer scan recorded at write time:
        all-base buckets drop non-overlapping files individually; a bucket
        holding delta layers is all-or-nothing (the LWW resolve needs every
        layer of a bucket it reads). Files without recorded ts stats are
        read conservatively. On a compacted, z-ordered table a narrow
        window reads a handful of files, then parquet row-group pruning
        takes over inside them.

        ``where=[(col, op, value), ...]`` (ops ``= > >= < <= in``, ANDed)
        returns only matching rows (SQL comparison semantics — nulls never
        match), skipping at the MANIFEST level every file whose recorded
        per-file min/max (declared via ``TableSpec.stats_cols``) proves it
        holds no match — the Iceberg column-metrics file-skipping analog,
        generalized beyond event time. Works on any column; prunes only
        where stats were declared/recorded (undeclared columns fall back
        to the residual filter + parquet row-group stats). Same
        all-or-nothing rule as ``time_range`` for buckets holding delta
        layers, and composes with it.

        In merge-on-read mode, buckets holding unfolded delta files are
        LWW-resolved per key at read time (buckets whose files are all base
        files scan straight through — compaction restores the cheap path).

        ``columns`` prunes the payload BEFORE the MoR resolve. Catalyst
        cannot do this on its own: the resolve's ``max_by`` packs every
        payload column into one struct aggregate, which blocks projection
        pushdown through the groupBy — a caller's ``.select("text")`` after
        ``read()`` still shuffles the full row width. Pruning here means
        the resolve shuffle (and the parquet ReadSchema) carry only the
        requested columns + keys + LWW markers — on a wide 10^10-row table
        a 2-of-40-column read shrinks the shuffle ~20×. Key columns are
        always read (the resolve groups on them) but appear in the output
        only if requested."""
        m = self.manifest(version)
        schema_fields = [f.name for f in T.StructType.fromJson(m["schema"]).fields]
        tr_us: tuple[int, int] | None = None
        if time_range is not None:
            tr_us = (_range_bound_us(time_range[0]), _range_bound_us(time_range[1]))
        preds: list = []  # (col, op, encoded probe) — manifest-level pruning
        if where:
            ops = {"=", "==", ">", ">=", "<", "<=", "in"}
            for col, op, val in where:
                if col not in schema_fields:
                    raise ValueError(
                        f"where references unknown column {col!r}; "
                        f"table has {schema_fields}"
                    )
                if op not in ops:
                    raise ValueError(f"where op {op!r} not in {sorted(ops)}")
                enc = (
                    _encode_in_list(val) if op == "in" else _stat_scalar(val)
                )
                if enc is not _SKIP_PRED:
                    preds.append((col, op, enc))
        prune: list[str] | None = None
        if columns is not None:
            unknown = sorted(set(columns) - set(schema_fields))
            if unknown:
                raise ValueError(f"unknown columns {unknown}; table has {schema_fields}")
            want = set(columns)
            if tr_us is not None:
                want.add(self.spec.ts_col)  # the window filter needs it
            for col, _op, _v in (where or ()):
                want.add(col)  # the residual predicate needs it
            prune = list(dict.fromkeys(
                [*self.spec.key_cols,
                 *[c for c in schema_fields if c in want]]
            ))

        def _ts_overlaps(e: dict) -> bool:
            if preds and not _file_may_match(e, preds):
                return False
            if tr_us is None:
                return True
            tl, th = e.get("ts_min"), e.get("ts_max")
            if tl is None or th is None:
                return True  # no stats recorded: read conservatively
            return th >= tr_us[0] and tl <= tr_us[1]

        clean: list[dict] = []
        dirty: list[dict] = []
        for b, files in m["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            if read_optimized:
                clean.extend(
                    e for e in files if not e.get("delta") and _ts_overlaps(e)
                )
                continue
            if any(e.get("delta") for e in files) or (
                self.spec.partial_updates
                and any(not e.get("all_live") for e in files)
            ):
                # all-or-nothing: resolving winners needs every layer.
                # Patch tables additionally resolve any bucket whose BASE
                # files may still hold patch rows (all_live is False when a
                # file carries patches or tombstones — round 4: compaction
                # keeps the survivor set, so overlays materialize at read)
                if any(_ts_overlaps(e) for e in files):
                    dirty.extend(files)
            else:
                clean.extend(e for e in files if _ts_overlaps(e))

        def _prune(part: DataFrame) -> DataFrame:
            if prune is None:
                return part
            keep = prune + [c for c in part.columns if c not in schema_fields]
            return part.select(*keep)

        parts = []
        df_clean = self._read_files(clean, m)
        if df_clean is not None:
            parts.append(_prune(df_clean))
        df_dirty = self._read_files(dirty, m)
        if df_dirty is not None:
            resolved = self._resolve_versions(_prune(df_dirty))
            if m.get("write_path", "fused") == "raw":
                # raw write path: normalization deferred to materialization —
                # applied to WINNERS only (idempotent, so a compacted row
                # passing through again is unchanged)
                from ..functions.normalize import normalize_payload

                resolved = normalize_payload(resolved, self.spec)
            parts.append(resolved)
        if not parts:
            df = self.spark.createDataFrame([], self._internal_schema(T.StructType.fromJson(m["schema"])))
            if prune is not None:
                df = df.select(*prune, *[c for c in df.columns if c not in schema_fields])
        else:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df = df.filter(~F.col(DELETED))
        if PATCH in df.columns:
            # compaction carries ORPHAN patch rows (keys with no full image
            # yet — out-of-order patch-before-insert) through into base
            # files so a later insert still composes with them; they are
            # not rows until that insert arrives, so every read path (incl.
            # the plain clean-bucket scan and the RO view) must hide them
            df = df.filter(~F.col(PATCH))
        if tr_us is not None:
            # pushed-down range predicate: inside the surviving files,
            # parquet row-group stats (tight after z-order/sorted compaction)
            # prune further
            ts = F.col(self.spec.ts_col)
            df = df.filter(
                (ts >= F.timestamp_micros(F.lit(tr_us[0])))
                & (ts <= F.timestamp_micros(F.lit(tr_us[1])))
            )
        if where:
            # residual predicate (exact semantics; Catalyst pushes it into
            # the clean-bucket parquet scans, where row-group stats prune
            # further inside the files the manifest kept). Datetime
            # literals share the prune tier's encoding via _residual_lit —
            # F.lit(datetime) would drift under a non-UTC session timezone.
            dtypes = {f.name: f.dataType for f in T.StructType.fromJson(m["schema"]).fields}
            for col, op, val in where:
                df = df.filter(_where_term(col, op, val, dtypes.get(col)))
        if not include_internal:
            out_cols = schema_fields if columns is None else list(columns)
            df = df.select(*out_cols)
        return df

    def read_time_range(self, lo, hi, **kw) -> DataFrame:
        """Event-time window read — ``read(time_range=(lo, hi))``."""
        return self.read(time_range=(lo, hi), **kw)

    def delete_where_dv(self, predicate: str, ts=None) -> dict:
        """Bulk ``DELETE WHERE`` via POSITION-DELETE sidecars — the Delta
        deletion-vector / Iceberg positional-delete analog (round-2 verdict
        item #5). The tombstone path (plans/dml.delete_where) writes one
        delta ROW per deleted row and flips its whole bucket into the
        resolve-at-read state: O(deleted rows) write amplification and a
        per-key fold on every subsequent read until compaction. This writes
        one sidecar of (file-basename, row-position) pairs — O(positions),
        16 bytes each — and the affected buckets STAY on the plain-scan
        path: the read drops the positions with an anti-join (engine) or a
        numpy bitmap mask per file (DataSource facade), never a resolve.

        Scope and semantics (the same trade Delta/Iceberg make):
        * applies to BASE files in delta-free buckets; matched rows living
          in buckets with unfolded delta layers fall back to the tombstone
          path automatically (a position into an unresolved layer is
          meaningless) — the report says how many went each way;
        * a DV delete is TABLE-level maintenance, not a CDC event: it does
          not enter the lineage ledger or the change feed, and it carries
          no LWW dominance — a later upstream upsert for a DV-deleted key
          re-inserts it. For CDC-correct deletes (resurrection protection,
          feed visibility) use delete_where;
        * time travel to pre-DV snapshots still sees the rows (the sidecar
          is referenced only by the new manifest); a hard purge must still
          run purge_where — the attestation scan reads with apply_dv=False
          precisely so DV'd bytes are not mistaken for erased ones;
        * re-deleting from a file that already carries a DV unions the old
          positions into the new sidecar (one sidecar pointer per entry);
          compaction/CoW rewrites drop the positions physically and shed
          the pointer.

        ``predicate`` is a SQL string, or — the structured form —
        ``[(col, op, value), ...]`` tuples (same ops as ``read(where=)``),
        which additionally unlock the stats tiers:

        * METADATA-ONLY whole-file drops: a file whose recorded
          [min, max, null_count] stats PROVE every live row matches every
          predicate (zero nulls, range fully inside, all_live) is dropped
          from the manifest with ZERO data IO — the Iceberg
          delete-by-partition analog generalized to column stats, and the
          bulk of a stats-clustered sweep;
        * candidate pruning: the positional scan then reads ONLY the files
          whose stats admit a match (``_file_may_match``), not every clean
          file.

        Returns {"n_dv_positions", "n_files_with_dv", "n_files_dropped",
        "n_rows_dropped", "n_tombstoned", "version"}."""
        import datetime as _dt

        ts = ts or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        preds = None
        cond = None
        if not isinstance(predicate, str):
            ops = {"=", "==", ">", ">=", "<", "<=", "in"}
            dtypes = {f.name: f.dataType for f in self.schema.fields}
            preds = []
            for col, op, val in predicate:
                if col not in dtypes:
                    raise ValueError(f"unknown column {col!r} in predicate")
                if op not in ops:
                    raise ValueError(f"op {op!r} not in {sorted(ops)}")
                enc = (
                    _encode_in_list(val) if op == "in" else _stat_scalar(val)
                )
                if enc is not _SKIP_PRED:
                    preds.append((col, op, enc))
                # datetime literals share the prune tier's encoding (see
                # _residual_lit) — the stats tiers and the positional scan
                # must agree under any session timezone
                term = _where_term(col, op, val, dtypes.get(col))
                cond = term if cond is None else (cond & term)
        row_filter = predicate if isinstance(predicate, str) else cond
        m0 = dict(self.manifest())
        clean: list[dict] = []
        dirty_buckets: list[int] = []
        for b, files in m0["buckets"].items():
            if any(e.get("delta") for e in files):
                dirty_buckets.append(int(b))
            else:
                clean.extend(files)
        report = {"n_dv_positions": 0, "n_files_with_dv": 0,
                  "n_files_dropped": 0, "n_rows_dropped": 0,
                  "n_tombstoned": 0, "version": m0["version"]}
        dropped: set[str] = set()
        if preds:
            for e in clean:
                if _file_all_match(e, preds):
                    dropped.add(_dv_key(e["path"]))
                    report["n_files_dropped"] += 1
                    report["n_rows_dropped"] += (
                        e.get("n_rows", 0) - e.get("dv", {}).get("n_deleted", 0)
                    )
            clean = [e for e in clean if _dv_key(e["path"]) not in dropped]
            # candidate pruning: only files whose stats admit a match need
            # the positional scan at all
            clean = [e for e in clean if _file_may_match(e, preds)]
        counts: dict[str, int] = {}
        sidecar_rel = None
        if clean:
            df = self._read_files(clean, m0, with_pos=True)
            vis = df.filter(~F.col(DELETED))
            if PATCH in df.columns:
                vis = vis.filter(~F.col(PATCH))
            matched = vis.filter(row_filter).select(
                F.col("_dv_base").alias("path"), F.col("_dv_pos").alias("pos")
            )
            sidecar_rel = os.path.join("dv", f"dv-{uuid.uuid4().hex[:12]}")
            out_dir = os.path.join(self.root, sidecar_rel)
            to_write = matched
            old_dirs = sorted({e["dv"]["path"] for e in clean if e.get("dv")})
            if old_dirs:
                # carry forward prior positions of files touched again this
                # round (they were invisible to the predicate scan above)
                if self._arrow_plane():
                    old = self._dv_positions_df(old_dirs)
                else:
                    old = self.spark.read.parquet(
                        *[os.path.join(self.root, d) for d in old_dirs]
                    ).select("path", "pos")
                to_write = matched.unionByName(
                    old.join(matched.select("path").distinct(), "path", "left_semi")
                )
            if (token := self._plane_token()) is not None:
                # factory scheme: tasks write the sidecar files and return
                # only per-file partial counts — no driver toArrow()
                counts = _dist_write_dv(to_write, out_dir, token)
            elif self._arrow_plane():
                import pyarrow.parquet as _paq

                dv_tbl = to_write.toArrow()
                fsio.makedirs(out_dir)
                w_fs, w_p = fsio.resolve(fsio.join(out_dir, "part-00000.parquet"))
                _paq.write_table(dv_tbl, w_p, filesystem=w_fs, compression="zstd")
                g = dv_tbl.group_by("path").aggregate([("path", "count")])
                counts = dict(
                    zip(g.column("path").to_pylist(), g.column("path_count").to_pylist())
                )
            else:
                to_write.write.mode("overwrite").parquet(out_dir)
                counts = {
                    r["path"]: r["n"]
                    for r in self.spark.read.parquet(out_dir)
                    .groupBy("path")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            if not counts:
                fsio.rmtree(out_dir)  # scheme-routed (shutil no-ops remotely)
                sidecar_rel = None
        if counts or dropped:
            by_base = {_dv_key(e["path"]) for e in clean}
            unknown = sorted(set(counts) - by_base)
            if unknown:
                raise AssertionError(f"DV positions for unknown files: {unknown}")
            if counts:
                if self._plane_token() is not None:
                    # counts fold every position in the new sidecar (carried
                    # rows included) — the total needs no second read
                    new_total = sum(counts.values())
                elif self._arrow_plane():
                    new_total = len(self._arrow_read_table([sidecar_rel]))
                else:
                    new_total = self.spark.read.parquet(
                        os.path.join(self.root, sidecar_rel)
                    ).count()
                prior = sum(
                    e["dv"]["n_deleted"] for e in clean
                    if e.get("dv") and _dv_key(e["path"]) in counts
                )
                report["n_dv_positions"] = new_total - prior
                report["n_files_with_dv"] = len(counts)
        # Idempotent re-deletes are commit-free by construction, which is
        # what keeps a periodic caller (the TTL sweep in
        # plans/maintenance.py, whose trigger reads file min/max stats a DV
        # cannot refresh) from churning a snapshot per round: the
        # positional scan reads LIVE rows only (_read_files applies
        # existing DVs), so a predicate that matches nothing new yields an
        # empty ``matched``, the carried-positions semi-join keeps nothing,
        # ``counts`` stays empty, and the empty-sidecar branch above
        # already removed the directory.
        if counts or dropped:
            buckets = {}
            for b, files in m0["buckets"].items():
                out_files = []
                for e in files:
                    base = _dv_key(e["path"])
                    if base in dropped:
                        continue  # metadata-only whole-file delete
                    if base in counts:
                        e = dict(e)
                        e["dv"] = {"path": sidecar_rel, "n_deleted": counts[base]}
                    out_files.append(e)
                buckets[b] = out_files
            m = dict(m0)
            m["version"] = self._alloc_version()
            m["parent_snapshot_id"] = m0["snapshot_id"]
            m["parent_version"] = m0["version"]
            m["snapshot_id"] = uuid.uuid4().hex
            m["buckets"] = buckets
            m["summary"] = {
                "op": "dv_delete",
                "n_new_positions": report["n_dv_positions"],
                "n_files": len(counts),
                "n_files_dropped": report["n_files_dropped"],
                # whole-file drops REMOVE n_rows from the manifest floor
                # (positions do not — n_rows is physical); the WAP publish
                # audit credits this so a DV-deleting branch can publish
                "n_rows_dropped": report["n_rows_dropped"],
            }
            m["committed_at"] = time.time()
            self._commit(m, expected_ref=m0["version"])
            report["version"] = m["version"]
        if dirty_buckets:
            matched_d = self.read(buckets=dirty_buckets).filter(row_filter)
            n_d = matched_d.count()
            if n_d:
                from .apply import apply_changes
                from .dml import _as_events

                ev = _as_events(
                    self, matched_d.select(*self.spec.key_cols), "D", ts
                )
                st = apply_changes(
                    self, ev, batch_id=self.last_dml_batch_id + 1, internal=True
                )
                report["n_tombstoned"] = st.n_delete
                report["version"] = st.version
        return report

    def count_fast(self, version: int | None = None) -> int:
        """Exact live-row count, metadata-first (the Iceberg manifest-count
        analog): a bucket whose files are all base files with tombstone-free
        footer stats (``all_live``, from the _deleted column's bool min/max)
        contributes sum(n_rows) straight from the manifest — no Spark job.
        Buckets with delta layers, tombstoned files, or stat-less legacy
        entries fall back to a pruned scan of just those buckets. On a
        compacted, tombstone-reclaimed table COUNT(*) is O(manifest)."""
        m = self.manifest(version)
        total = 0
        scan_buckets: list[int] = []
        for b, files in m["buckets"].items():
            fast = not any(e.get("delta") for e in files) and all(
                e.get("all_live") and e.get("n_rows") is not None for e in files
            )
            if fast:
                total += sum(
                    e["n_rows"] - e.get("dv", {}).get("n_deleted", 0)
                    for e in files
                )
            else:
                scan_buckets.append(int(b))
        if scan_buckets:
            total += self.read(version=version, buckets=scan_buckets).count()
        return total

    def read_keys(self, values: list, version: int | None = None,
                  columns: list[str] | None = None) -> DataFrame:
        """Point lookup: scan only the buckets the given ``bucket_col`` values
        hash into (the Iceberg bucket-partition point-read). At 10^10 rows /
        4096 buckets a k-conversation lookup touches k buckets (~2.4M rows
        each) instead of the whole table, and the pushed ``IN`` predicate
        skips row groups within those buckets — tight row-group stats come
        from ``compact(sort_within_bucket=True)``.

        The key→bucket mapping runs through the same JVM ``xxhash64`` the
        writer uses (a tiny local DataFrame, one collect of ≤len(values)
        ints) so driver and executors can never disagree on the hash."""
        if not values:
            return self.read(version).limit(0)
        bcol = self.spec.bucket_col
        field = next(f for f in self.schema.fields if f.name == bcol)
        probe = self.spark.createDataFrame(
            [(v,) for v in values], T.StructType([field])
        )
        # hash with the bucket count THE TARGET SNAPSHOT was written under —
        # a pre-rebucket version maps keys with the old count
        n = int(self.manifest(version).get("num_buckets", self.spec.num_buckets))
        buckets = [
            r[0]
            for r in probe.select(F.pmod(F.xxhash64(F.col(bcol)), F.lit(n)))
            .distinct()
            .collect()
        ]
        if columns is None:
            return self.read(version, buckets=buckets).filter(F.col(bcol).isin(values))
        # the probe predicate needs bucket_col; read it, filter, then drop it
        # if the caller didn't ask for it
        inner = list(dict.fromkeys([bcol, *columns]))
        out = self.read(version, buckets=buckets, columns=inner).filter(
            F.col(bcol).isin(values)
        )
        return out.select(*columns)

    def _patch_survivors_df(self, df: DataFrame) -> DataFrame:
        """DataFrame form of the survivor-set patch fold (see
        _fold_patches_pandas): keep the key's last full image, each
        sequence group's winner, and every non-dominated patch — original
        rows, original versions. One hash exchange on the key (window
        aggregates, no ordering), acceptable for a maintenance job."""
        from pyspark.sql import Window

        keys = list(self.spec.key_cols)
        w = Window.partitionBy(*keys)
        ord_ = F.struct(F.col(TS_APPLIED), F.col(LSN_APPLIED))
        img_ord = F.max(F.when(~F.col(PATCH), ord_)).over(w)
        is_img = (~F.col(PATCH)) & ord_.eqNullSafe(img_ord)
        img_dead = F.max(F.when(is_img, F.col(DELETED))).over(w)
        keep = is_img | (
            F.col(PATCH)
            & (
                img_ord.isNull()
                | (ord_ > img_ord)
                | F.coalesce(img_dead, F.lit(False))
            )
        )
        eff_patch = F.col(PATCH) & ~F.col(DELETED)
        for s, _members in (self.spec.sequence_groups or {}).items():
            writer = (~eff_patch) | F.col(s).isNotNull()
            gord = F.struct(
                F.coalesce(F.col(s).cast("long"), F.lit(-(2 ** 63))),
                F.col(LSN_APPLIED),
            )
            gmax = F.max(F.when(writer, gord)).over(w)
            keep = keep | (writer & gord.eqNullSafe(gmax))
        # non-last-image survivors (old images kept only as group winners)
        # become GROUP CARRIERS — (_patch AND _deleted), hidden from every
        # visibility path, full writers under the effective-patch resolve
        # predicates — so a file keeps at most one VISIBLE row per key
        # (see _patch_survivor_mask)
        promote = keep & (~F.col(PATCH)) & (~is_img)
        # window expressions may not appear in WHERE: materialize the mask
        return (
            df.withColumn("_keep", keep)
            .withColumn("_promote", promote)
            .withColumn(PATCH, F.col(PATCH) | F.col("_promote"))
            .withColumn(DELETED, F.col(DELETED) | F.col("_promote"))
            .filter(F.col("_keep"))
            .drop("_keep", "_promote")
        )

    def _resolve_versions(self, df: DataFrame) -> DataFrame:
        """Collapse multi-version rows (base + delta layers) to the LWW winner
        per key: greatest ``(_ts_applied, _lsn_applied)`` — the read-side twin
        of the write-side resolve, map-side-combining like lww_latest.

        Partial-update tables resolve per COLUMN instead of per row: each
        payload column takes its latest writer (full images write every
        column; ``_patch`` rows write their non-NULL columns), existence is
        decided only by full images (operators/patch.py semantics), and the
        result carries the overall max version so a compaction rewrite still
        dominates every folded row. Same single map-side-combining aggregate
        shape — per-column max_by instead of one struct max_by."""
        keys = list(self.spec.key_cols)
        others = [c for c in df.columns if c not in keys]
        if self.spec.agg_spec:
            return self._resolve_agg(df)
        if self.spec.first_row:
            return self._resolve_first(df, keys, others)
        if PATCH in df.columns:
            ord_sql = f"struct({TS_APPLIED}, {LSN_APPLIED})"
            payload = [c for c in others if c not in (TS_APPLIED, LSN_APPLIED, DELETED, PATCH)]
            seqg = self.spec.sequence_groups or {}
            grouped = {c for s, ms in seqg.items() for c in (s, *ms)}
            aggs = [
                F.expr(f"max_by({TS_APPLIED}, {ord_sql})").alias(TS_APPLIED),
                F.expr(f"max_by({LSN_APPLIED}, {ord_sql})").alias(LSN_APPLIED),
                # a key with ONLY patch rows and no full image anywhere does
                # not exist (a patch cannot create a row) -> deleted
                F.expr(
                    f"coalesce(max_by({DELETED}, {ord_sql}) "
                    f"FILTER (WHERE NOT {PATCH}), true)"
                ).alias(DELETED),
            ]
            # GROUP-CARRIER rows (round 4): (_patch AND _deleted) marks an
            # old full image the survivor fold kept only for its sequence-
            # group write — hidden from every visibility path, but a FULL
            # writer for the resolve (its original semantics). The
            # effective-patch predicate reads real patches only.
            eff_patch = f"({PATCH} AND NOT {DELETED})"
            for c in payload:
                if c in grouped:
                    continue
                aggs.append(
                    F.expr(
                        f"max_by(`{c}`, {ord_sql}) "
                        f"FILTER (WHERE NOT {eff_patch} OR `{c}` IS NOT NULL)"
                    ).alias(c)
                )
            if seqg:
                # sequence-group columns order by their OWN (seq, lsn) —
                # atomically per group (operators/patch.py seq_group_aggs)
                from ..operators.patch import seq_group_aggs

                aggs.extend(
                    seq_group_aggs(seqg, LSN_APPLIED, patch_pred=eff_patch)
                )
            out = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
            sel = list(keys)
            for c in others:
                if c == PATCH:
                    sel.append(F.lit(False).alias(PATCH))
                elif c in payload:
                    # tombstone rows carry no payload (a patch landing after
                    # a delete must not smuggle values into the tombstone)
                    sel.append(
                        F.when(F.col(DELETED), F.lit(None)).otherwise(F.col(c)).alias(c)
                    )
                else:
                    sel.append(F.col(c))
            return out.select(*sel)
        ord_ = F.struct(F.col(TS_APPLIED), F.col(LSN_APPLIED))
        win = F.max_by(F.struct(*[F.col(c) for c in others]), ord_)
        out = df.groupBy(*[F.col(k) for k in keys]).agg(win.alias("_w"))
        return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])

    def _resolve_first(self, df: DataFrame, keys: list[str], others: list[str]) -> DataFrame:
        """First-row resolve: a key any layer deleted is dead (permanent
        erasure); otherwise the MINIMUM (ts, lsn) writer across layers wins
        (a late-arriving event with an earlier event time replaces a
        provisional base-row winner — event-time-correct claim-once). One
        map-side-combining aggregate, same shape as the LWW resolve."""
        ord_ = F.struct(F.col(TS_APPLIED), F.col(LSN_APPLIED))
        win = F.expr(
            "min_by(struct({cols}), struct({ts}, {lsn})) FILTER (WHERE NOT {d})".format(
                cols=", ".join(f"`{c}`" for c in others),
                ts=TS_APPLIED,
                lsn=LSN_APPLIED,
                d=DELETED,
            )
        )
        out = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.expr(f"bool_or({DELETED})").alias("_dead"),
            win.alias("_w"),
            F.max(F.col(TS_APPLIED)).alias("_ts_hi"),
            F.max(F.col(LSN_APPLIED)).alias("_lsn_hi"),
        )
        dead = F.col("_dead")
        sel = list(keys)
        for c in others:
            if c == TS_APPLIED:
                sel.append(F.when(dead, F.col("_ts_hi")).otherwise(F.col(f"_w.{c}")).alias(c))
            elif c == LSN_APPLIED:
                sel.append(F.when(dead, F.col("_lsn_hi")).otherwise(F.col(f"_w.{c}")).alias(c))
            elif c == DELETED:
                sel.append(dead.alias(DELETED))
            else:
                sel.append(F.when(dead, F.lit(None)).otherwise(F.col(f"_w.{c}")).alias(c))
        return out.select(*sel)

    def _resolve_agg(self, df: DataFrame) -> DataFrame:
        """Merge per-layer aggregation partials to final accumulator rows
        (operators/aggmerge.py algebra). Per key: the newest reset layer's
        LSN is the cutoff (its own partial already excludes the key's
        pre-delete events); older layers are discarded; surviving partials
        merge with each column's aggregate function. Liveness is
        sum(_n_contrib) > 0 — a reset layer nothing followed is a tombstone.

        Two map-side-combining aggregates + one key-local join (the cutoff
        frame holds only keys that ever saw a delete). Closed over both
        stored forms: fused per-batch partials and raw single-event rows
        (write_path='raw')."""
        from ..operators.aggmerge import merge_partial_exprs

        spec = self.spec
        keys = list(spec.key_cols)
        meta = {TS_APPLIED, LSN_APPLIED, DELETED, AGG_RESET, AGG_N}
        payload = [c for c in df.columns if c not in keys and c not in meta]
        cuts = (
            df.filter(F.col(AGG_RESET))
            .groupBy(*keys)
            .agg(F.max(F.col(LSN_APPLIED)).alias("_cut"))
        )
        kept = df.join(cuts, on=keys, how="left").filter(
            F.col("_cut").isNull() | (F.col(LSN_APPLIED) >= F.col("_cut"))
        )
        aggs = merge_partial_exprs(spec.agg_spec, payload, LSN_APPLIED)
        aggs += [
            F.max(F.col(TS_APPLIED)).alias(TS_APPLIED),
            F.max(F.col(LSN_APPLIED)).alias(LSN_APPLIED),
            F.sum(F.col(AGG_N)).alias(AGG_N),
            F.expr(f"bool_or({AGG_RESET})").alias(AGG_RESET),
        ]
        out = kept.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
        out = out.withColumn(DELETED, F.col(AGG_N) == F.lit(0))
        # tombstones carry no accumulator state
        return out.select(
            *keys,
            *[
                F.when(F.col(DELETED), F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in payload
            ],
            TS_APPLIED,
            LSN_APPLIED,
            DELETED,
            AGG_RESET,
            AGG_N,
        )

    # ------------------------------------------------------------ bootstrap

    def bootstrap(self, seed_df: DataFrame, schema: T.StructType | None = None) -> None:
        """Initial snapshot load (the reference's full reindex path,
        harness.py:107 -> index_ccdb.py:150-178). Seed rows get
        (_ts_applied=ts, _lsn_applied=-1) so any change event dominates a
        seed row at equal event time."""
        schema = schema or T.StructType.fromJson(self.manifest()["schema"])
        df = align_to_schema(seed_df, schema)
        df = (
            df.withColumn(TS_APPLIED, F.coalesce(F.col(self.spec.ts_col), F.to_timestamp(F.lit(EPOCH))))
            .withColumn(LSN_APPLIED, F.lit(-1).cast("long"))
            .withColumn(DELETED, F.lit(False))
        )
        if self.spec.partial_updates:
            df = df.withColumn(PATCH, F.lit(False))
        if self.spec.agg_spec:
            # each seed row is the key's first contribution
            df = df.withColumn(AGG_RESET, F.lit(False)).withColumn(
                AGG_N, F.lit(1).cast("long")
            )
        df = df.withColumn(BUCKET, self._bucket_expr())
        version = self._alloc_version()
        files = self._write_data(df, version=version)
        m = dict(self.manifest())
        m["parent_version"] = m["version"]
        m["version"] = version
        m["parent_snapshot_id"] = m["snapshot_id"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["buckets"] = {str(b): fs for b, fs in files.items()}
        m["summary"] = {"op": "bootstrap"}
        m["committed_at"] = time.time()
        self._commit(m, expected_ref=self.manifest()["version"])

    # ------------------------------------------- pyarrow data plane (S13)

    def _arrow_plane(self) -> bool:
        """True when the table root's scheme is served by a REGISTERED
        pyarrow filesystem (plans/fsio.register_filesystem): the Spark
        data plane — bootstrap / merge / compaction / DV parquet jobs —
        then routes through an Arrow writer/reader on that filesystem
        instead of Spark's Hadoop plane. Two tiers (round-4 verdict
        item #1): a scheme registered WITH a picklable ``factory`` runs
        the parquet jobs as distributed ``mapInArrow`` tasks — workers
        re-register the filesystem per process (fsio.ensure_registered)
        and stream their partitions straight to the store, no driver
        ``toArrow()`` on the data path; a scheme registered with only an
        in-process instance keeps the driver-side Arrow writer (sized
        for tests and small registered stores). Production object stores
        may also speak s3a:// / abfs:// through the Hadoop conf with
        Spark's native writers."""
        return "://" in self.root and self.root.split("://", 1)[0] in fsio._REGISTERED

    def _plane_token(self):
        """fsio worker-registration token when the root's scheme is
        executor-shippable (registered with a factory), else None."""
        if "://" not in self.root:
            return None
        return fsio.shippable(self.root.split("://", 1)[0])

    def _arrow_write_dir(self, df: DataFrame, out_dir: str, flat: bool,
                         sort_cols: tuple | list = (),
                         pre_partitioned: bool = False) -> None:
        """Arrow twin of the Spark parquet write for registered-scheme
        roots, in the SAME layouts the footer scans recover entries from —
        flat (single-bucket files, ``_bucket`` riding as a data column) or
        hive (``_bucket=N/`` dirs, column stripped). Distributed via
        ``mapInArrow`` when the scheme ships a filesystem factory (each
        task writes its buckets through a worker-registered fs and returns
        only O(files) entry rows); driver-side ``toArrow()`` otherwise."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        token = self._plane_token()
        if token is not None:
            self._last_write_tasks = _dist_write_dir(
                df, out_dir, token, flat=flat, sort_cols=tuple(sort_cols),
                pre_partitioned=pre_partitioned,
            )
            return
        tbl = df.toArrow()
        fsio.makedirs(out_dir)
        if len(tbl) == 0:
            return
        bucket = tbl.column(BUCKET).to_numpy(zero_copy_only=False)
        for b in np.unique(bucket):
            part = tbl.filter(pa.array(bucket == b))
            if sort_cols:
                part = part.sort_by([(c, "ascending") for c in sort_cols])
                drop = [c for c in sort_cols if c.startswith("_zorder")]
                if drop:
                    part = part.drop_columns(drop)
            if flat:
                path = fsio.join(out_dir, f"part-b{int(b):05d}.parquet")
            else:
                d = fsio.join(out_dir, f"{BUCKET}={int(b)}")
                fsio.makedirs(d)
                part = part.drop_columns([BUCKET])
                path = fsio.join(d, "part-00000.parquet")
            w_fs, w_p = fsio.resolve(path)
            pq.write_table(part, w_p, filesystem=w_fs, compression="zstd")

    def _arrow_read_table(self, rel_dirs_or_files: list[str]):
        """Concatenated pyarrow Table of every parquet file under the given
        table-relative dirs/files, via the scheme layer."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = []
        for rel in rel_dirs_or_files:
            full = fsio.join(self.root, rel)
            targets = (
                [p for p, _sz in fsio.walk_files(full) if p.endswith(".parquet")]
                if fsio.isdir(full)
                else [full]
            )
            for p in targets:
                with fsio.open_input(p) as f:
                    tables.append(pq.read_table(f))
        return pa.concat_tables(tables, promote_options="default")

    def _dv_positions_df(self, rel_dirs: list[str]) -> DataFrame:
        """DataFrame(path string, pos long) of the DV sidecar positions
        under the given table-relative dirs, scheme-routed: distributed
        ``mapInArrow`` read on factory-registered schemes, driver Arrow
        read otherwise."""
        token = self._plane_token()
        if token is not None:
            paths = [
                p
                for rel in rel_dirs
                for p, _sz in fsio.walk_files(fsio.join(self.root, rel))
                if p.endswith(".parquet")
            ]
            return _dist_read_files(self.spark, paths, token)
        return self.spark.createDataFrame(
            self._arrow_read_table(rel_dirs).select(["path", "pos"]),
            schema="path string, pos long",
        )

    def _arrow_read_era(self, group: list[dict], era: T.StructType,
                        need_pos: bool) -> DataFrame:
        """Arrow twin of ``spark.read.schema(era).parquet(*paths)`` for the
        registered-scheme plane: per-file read via fsio, cast/null-align to
        the era's internal schema, with the DV position columns
        (``_dv_base``, ``_dv_pos``) synthesized driver-side when asked
        (the Hadoop plane gets them from ``_metadata``). Distributed via
        ``mapInArrow`` when the scheme ships a filesystem factory."""
        token = self._plane_token()
        if token is not None:
            return _dist_read_era(self.spark, self.root, group, era, need_pos, token)
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        target = pa.schema(
            [pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in era.fields]
        )
        pieces = []
        for e in group:
            with fsio.open_input(fsio.join(self.root, e["path"])) as f:
                t = pq.read_table(f)
            cols, names = [], []
            for fld in target:
                names.append(fld.name)
                if fld.name in t.column_names:
                    cols.append(t.column(fld.name).cast(fld.type))
                else:
                    cols.append(pa.nulls(len(t), fld.type))
            t2 = pa.table(dict(zip(names, cols)))
            if need_pos:
                t2 = t2.append_column(
                    "_dv_base", pa.array([_dv_key(e["path"])] * len(t2), pa.string())
                ).append_column(
                    "_dv_pos", pa.array(np.arange(len(t2), dtype=np.int64))
                )
            pieces.append(t2)
        out = pa.concat_tables(pieces)
        schema = T.StructType(list(era.fields))
        if need_pos:
            schema = schema.add("_dv_base", T.StringType()).add("_dv_pos", T.LongType())
        return self.spark.createDataFrame(out, schema=schema)

    def _write_data(self, df: DataFrame, version: int, sid: int | None = None,
                    delta: bool = False, sort_cols: tuple[str, ...] = ()) -> dict[int, list[dict]]:
        """Write df (with BUCKET col) partitioned by bucket; return
        bucket -> file entries. One commit dir per version keeps uncommitted
        writes invisible (they're simply never referenced by a manifest).
        ``sort_cols`` sorts rows within each bucket partition before writing
        (no extra shuffle — rides the bucket repartition) so parquet
        row-group min/max stats on the keys become tight and point-lookup
        predicates skip row groups."""
        # unique per write ATTEMPT (not just per version): two optimistic
        # writers racing the same version slot must never share a directory,
        # or the CAS loser's overwrite clobbers the winner's data files
        rel = os.path.join("data", f"c{version:010d}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.root, rel)
        if sid is None:
            sid = self.manifest().get("current_schema_id", 0)
        if self._arrow_plane():
            # registered-scheme root: driver-side Arrow writer, same hive
            # layout (blooms/maxRecordsPerFile are Hadoop-plane features)
            self._arrow_write_dir(df, out_dir, flat=False, sort_cols=tuple(sort_cols))
        else:
            part = df.repartition(F.col(BUCKET))
            if sort_cols:
                part = part.sortWithinPartitions(BUCKET, *sort_cols)
                # transient cluster keys (e.g. the z-value) order the rows but
                # are not table columns — project them away after the sort (a
                # narrow op in the same stage: row order is preserved)
                drop = [c for c in sort_cols if c.startswith("_zorder")]
                if drop:
                    part = part.drop(*drop)
            # blooms go on long-lived files only (base/CoW/compaction output):
            # short-lived MoR delta files are folded away by compaction, and the
            # measured ~3-4% bloom write cost on the apply hot path buys little
            # row-group skipping before they are
            opts = {} if delta else self.spec.bloom_write_options()
            if delta and self.spec.delta_codec:
                opts["compression"] = self.spec.delta_codec
            if not delta and self.spec.max_file_rows:
                # target-file-size splitting for long-lived files (see TableSpec)
                opts["maxRecordsPerFile"] = str(self.spec.max_file_rows)
            (
                part.write.mode("overwrite")
                .options(**opts)
                .partitionBy(BUCKET)
                .parquet(out_dir)
            )
        files: dict[int, list[dict]] = {}
        flat: list[dict] = []
        pairs: list[tuple[int, str]] = []
        for full, _sz in fsio.walk_files(out_dir):
            posix = full.replace(os.sep, "/")
            base, fn = posix.split("/")[-2], posix.split("/")[-1]
            if not base.startswith(f"{BUCKET}=") or not fn.endswith(".parquet"):
                continue
            b = int(base.split("=", 1)[1])
            e = {"path": os.path.join(rel, base, fn), "schema_id": sid}
            if delta:
                e["delta"] = True
            files.setdefault(b, []).append(e)
            pairs.append((len(flat), full))
            flat.append(e)
        # per-file row counts + LSN ranges from the footers just written
        # (Iceberg per-file metrics analog) — drives the publish row-floor
        # audit and file-level pruning; footer-only reads, Spark-parallel
        # above the driver threshold
        for i, n, lo, hi, tlo, thi, live, cstats in self._footer_scan(pairs):
            flat[i].update(n_rows=n, lsn_min=lo, lsn_max=hi)
            if tlo is not None:
                flat[i].update(ts_min=tlo, ts_max=thi)
            if live is not None:
                flat[i].update(all_live=live)
            if cstats:
                flat[i]["stats"] = cstats
        return files

    def _stats_cols(self) -> tuple:
        """The table's declared stat columns: the UNION of the manifest's
        recorded list and this handle's spec. The manifest leg makes a
        maintenance or CLI handle constructed with a default spec keep
        recording the same per-file stats when it rewrites files (taking
        only the spec's empty tuple would make one ``compact`` silently
        shed the table's pruning / TTL-trigger coverage). The spec leg
        protects the other direction: ``_commit`` backfills
        ``stats_cols: []`` into legacy manifests from WHATEVER handle
        commits first, and a declaring writer must not lose its columns to
        an empty list a default-spec handle fabricated."""
        try:
            m = self.manifest()
        except Exception:
            return tuple(self.spec.stats_cols)
        recorded = m.get("stats_cols", [])
        return tuple(dict.fromkeys([*recorded, *self.spec.stats_cols]))

    def _footer_scan(self, pairs: list[tuple[int, str]]):
        """(tag, path) -> (tag, n_rows, lsn_min, lsn_max, ts_min, ts_max);
        driver-side for a handful of files, executor-parallel beyond
        _FOOTER_SCAN_DRIVER_MAX."""
        if not pairs:
            return []
        ts_col = self.spec.ts_col
        stats_cols = self._stats_cols()
        token = self._plane_token()
        # registered-scheme paths WITHOUT a shippable factory stay
        # driver-side (the fs registration is per-process); factory schemes
        # re-register per worker and scan executor-parallel like local paths
        if len(pairs) <= self._FOOTER_SCAN_DRIVER_MAX or (
            "://" in pairs[0][1] and token is None
        ):
            return _footer_stats(pairs, ts_col=ts_col, stats_cols=stats_cols)
        sc = self.spark.sparkContext
        n_slices = min(len(pairs), sc.defaultParallelism)
        if token is not None and "://" in pairs[0][1]:
            fn = lambda it: _footer_stats_shipped(  # noqa: E731
                it, token, ts_col=ts_col, stats_cols=stats_cols
            )
        else:
            fn = lambda it: _footer_stats(it, ts_col=ts_col, stats_cols=stats_cols)  # noqa: E731
        return sc.parallelize(pairs, n_slices).mapPartitions(fn).collect()

    # ------------------------------------------------------------ MERGE

    def merge(self, source: DataFrame, batch_id: int, summary_extra=None,
              internal: bool = False) -> MergeStats:
        """Apply one deduped change batch (unique per key) exactly-once.
        ``summary_extra`` may be a dict or a zero-arg callable evaluated after
        the stats job has run (so it can read Observations riding that job).

        ``internal=True`` places the commit in the MAINTENANCE id space
        (``last_dml_batch_id``): engine-originated writes (DELETE/UPDATE
        WHERE, retention/TTL sweeps) must not consume ids from the stream
        epoch sequence — a DML at ``last_batch_id + 1`` would collide with
        the stream's NEXT checkpointed epoch and the replay gate would
        silently drop that micro-batch. Internal commits leave
        ``last_batch_id`` untouched, gate against their own counter, and
        mark their summary ``internal`` so the stream lineage ledger stays
        a gapless record of stream batches alone.

        MERGE INTO semantics (J1/J2/J3 of SURVEY.md section 2.3):
        WHEN MATCHED AND src dominates AND op='D'   -> tombstone
        WHEN MATCHED AND src dominates              -> UPDATE *
        WHEN NOT MATCHED AND op != 'D'              -> INSERT *
        src dominates iff (ts,lsn) strictly > target's applied (ts,lsn) —
        stale replays and late losers are no-ops (exactly-once effects).
        """
        m0 = self.manifest()
        gate = m0.get("last_dml_batch_id", -1) if internal else m0["last_batch_id"]
        if batch_id <= gate:
            return MergeStats(batch_id=batch_id, skipped=True, version=m0["version"])
        spec = self.spec
        if spec.partial_updates:
            # the CoW full-outer resolve is row-image based; partial updates
            # are a merge-on-read feature (use merge_events), as in Paimon
            raise ValueError("partial_updates requires merge_mode='mor' (merge_events)")
        if spec.agg_spec:
            # merge() takes a PRE-DEDUPED batch (unique per key) — deduping
            # a change stream destroys aggregation contributions; the agg
            # engine folds every event via merge_events
            raise ValueError("agg_spec requires merge_events (MoR apply path)")
        if spec.first_row:
            # the upstream LWW dedup keeps the LAST writer — wrong engine;
            # first-row folds via merge_events
            raise ValueError("first_row requires merge_events (MoR apply path)")

        # --- schema evolution (column add / widen) before anything touches data
        source = self._apply_rename_map(source, m0)
        tgt_schema = T.StructType.fromJson(m0["schema"])
        data_cols = [c for c in source.columns if c not in (spec.op_col, spec.lsn_col)]
        batch_payload = T.StructType([source.schema[c] for c in data_cols])
        new_schema = evolve_schema(tgt_schema, batch_payload)
        schema_changed = new_schema != tgt_schema
        if schema_changed:
            _guard_bucket_widening(spec, tgt_schema, new_schema)

        # lsn/op ride along as extra (non-schema) columns through alignment
        src = align_to_schema(
            source.select(*data_cols, spec.lsn_col, spec.op_col), new_schema
        )
        src = src.withColumn(BUCKET, self._bucket_expr())
        # one materialization feeds both the stats agg and the resolve join —
        # without it the upstream normalize (pandas UDF) + dedup shuffle run
        # twice per batch
        from pyspark import StorageLevel

        src = src.persist(StorageLevel.MEMORY_AND_DISK)

        # --- per-bucket batch stats: one small agg drives lineage + the
        #     affected-bucket list (<= num_buckets rows to the driver).
        #     Expectation violation counts ride the same agg (no extra pass);
        #     drop-action rows are excluded AFTER counting, and the stats
        #     (n/lsn range) keep covering them — the LSNs were consumed.
        exps = _expectation_cols(spec, F.col(spec.op_col))
        exp_aggs = [
            F.sum(F.when(viol, 1).otherwise(0)).alias(f"exp_{name}")
            for name, _, viol in exps
        ]
        per_bucket = (
            src.groupBy(BUCKET)
            .agg(
                F.min(spec.lsn_col).alias("lsn_min"),
                F.max(spec.lsn_col).alias("lsn_max"),
                F.sum(F.when(F.col(spec.op_col) == "I", 1).otherwise(0)).alias("n_i"),
                F.sum(F.when(F.col(spec.op_col) == "U", 1).otherwise(0)).alias("n_u"),
                F.sum(F.when(F.col(spec.op_col) == "D", 1).otherwise(0)).alias("n_d"),
                F.count("*").alias("n"),
                *exp_aggs,
            )
            .collect()
        )
        exp_counts = {
            name: sum(int(r[f"exp_{name}"] or 0) for r in per_bucket)
            for name, _, _ in exps
        }
        failed = {
            name: exp_counts[name]
            for name, action, _ in exps
            if action == "fail" and exp_counts[name] > 0
        }
        if failed:
            src.unpersist()
            raise ExpectationFailedError(batch_id, failed)
        drop_pred = None
        for name, action, viol in exps:
            if action == "drop":
                drop_pred = viol if drop_pred is None else (drop_pred | viol)
        if drop_pred is not None:
            src = src.filter(~drop_pred)
        if not per_bucket:
            src.unpersist()
            return self._commit_empty(batch_id, summary_extra)
        affected = sorted(int(r[BUCKET]) for r in per_bucket)
        stats = MergeStats(
            batch_id=batch_id,
            skipped=False,
            n_source=sum(r["n"] for r in per_bucket),
            n_insert=sum(r["n_i"] for r in per_bucket),
            n_update=sum(r["n_u"] for r in per_bucket),
            n_delete=sum(r["n_d"] for r in per_bucket),
            n_buckets=len(affected),
            lsn_min=min(r["lsn_min"] for r in per_bucket),
            lsn_max=max(r["lsn_max"] for r in per_bucket),
            expectations=exp_counts or None,
        )

        # --- schema-era bookkeeping, then the mode-specific apply
        version = self._alloc_version()
        if schema_changed:
            # register the evolved schema era first so files get the new id
            new_sid = max(int(k) for k in m0["schemas"]) + 1
        else:
            new_sid = m0["current_schema_id"]
        m = dict(m0)
        m["schemas"] = dict(m0["schemas"])
        if schema_changed:
            m["schemas"][str(new_sid)] = new_schema.jsonValue()
            m["schema"] = new_schema.jsonValue()
            m["current_schema_id"] = new_sid

        buckets = dict(m0["buckets"])
        try:
            if m0.get("mode", "cow") == "mor":
                # merge-on-read: append LWW-versioned delta files — O(batch)
                # write, no target read, no resolve join; readers (and
                # compaction) fold layers via _resolve_versions
                delta = self._as_delta_rows(src, new_schema)
                files = self._write_data(delta, version, sid=new_sid, delta=True)
                for b in affected:
                    buckets[str(b)] = list(buckets.get(str(b), [])) + files.get(b, [])
            else:
                # copy-on-write: read ONLY affected buckets of the target,
                # resolve, rewrite those buckets
                entries = [e for b in affected for e in m0["buckets"].get(str(b), [])]
                tgt = self._read_files(entries, m0)
                if tgt is not None and schema_changed:
                    tgt = align_to_schema(
                        tgt.select(*[f.name for f in tgt.schema.fields if f.name not in (BUCKET,)]),
                        self._internal_schema(new_schema),
                    )
                resolved = self._resolve(tgt, src, new_schema)
                files = self._write_data(resolved, version, sid=new_sid)
                for b in affected:
                    buckets[str(b)] = files.get(b, [])
        finally:
            src.unpersist()
        m["version"] = version
        m["parent_snapshot_id"] = m0["snapshot_id"]
        m["parent_version"] = m0["version"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["buckets"] = buckets
        if internal:
            m["last_dml_batch_id"] = batch_id
        else:
            m["last_batch_id"] = batch_id
        m["last_lsn"] = max(m0["last_lsn"], stats.lsn_max or -1)
        m["summary"] = {
            "op": "merge",
            **({"internal": True} if internal else {}),
            "batch_id": batch_id,
            "n_source": stats.n_source,
            "n_insert": stats.n_insert,
            "n_update": stats.n_update,
            "n_delete": stats.n_delete,
            "lsn_min": stats.lsn_min,
            "lsn_max": stats.lsn_max,
            **({"expectations": exp_counts} if exps else {}),
            "affected_buckets": affected,
            "per_bucket": [
                {
                    "bucket": int(r[BUCKET]),
                    "lsn_min": r["lsn_min"],
                    "lsn_max": r["lsn_max"],
                    "n_i": r["n_i"],
                    "n_u": r["n_u"],
                    "n_d": r["n_d"],
                }
                for r in per_bucket
            ],
            **(summary_extra() if callable(summary_extra) else (summary_extra or {})),
        }
        m["committed_at"] = time.time()
        try:
            self._commit(m, expected_ref=m0["version"])
        except CommitConflictError:
            if m0.get("mode", "cow") != "mor":
                # CoW rewrote bucket contents read from a now-stale snapshot;
                # a rebase can't prove those reads still cover the table —
                # the caller (stream replay) redoes the batch
                raise
            # MoR delta appends are rebase-safe: stack onto the winner
            m = self._rebase_append(
                m0, files, affected, batch_id, stats,
                schema_changed, new_sid, new_schema, m["summary"],
                internal=internal,
            )
        stats.snapshot_id = m["snapshot_id"]
        stats.version = m["version"]
        return stats

    def merge_events(
        self,
        events: DataFrame,
        batch_id: int,
        normalize: bool = True,
        summary_extra=None,
        internal: bool = False,
    ) -> MergeStats:
        """Fused single-shuffle apply for merge-on-read mode — the high-rate
        streaming path.

        Plan shape (the one you'd want on a 1000-executor cluster):
          scan -> project to internal version rows (map)
               -> observe(batch stats incl. malformed count) -> filter bad keys
               -> repartition(num_buckets, _bucket)          [the ONE shuffle]
               -> mapInPandas: LWW winner per key + normalization, one Arrow
                  pass over each bucket partition (no per-row Python)
               -> write partitionBy(_bucket)
        Batch-level lineage comes from the observe() node attached BEFORE the
        fold and the malformed filter — computed inside the same job, no
        second pass, and the counts are SOURCE events (n_source/n_i/n_u/n_d
        pre-dedup, same semantics as merge()/CoW) with null-key rows counted
        as n_malformed then dropped. Per-bucket LSN ranges and row counts
        come from the written parquet footers (post-dedup winners — free
        column statistics, read in parallel on executors).

        Contrast with merge(): no pre-shuffle groupBy dedup and no second
        repartition for the write — two full-batch shuffles removed. The
        generic merge() remains for copy-on-write mode and for pre-deduped
        sources (the Iceberg MERGE contract).
        """
        import pandas as _pd
        from pyspark.sql import Observation

        from ..functions.normalize import normalize_pandas_frame, normalize_payload_jvm

        m0 = self.manifest()
        if m0.get("mode", "cow") != "mor":
            raise ValueError("merge_events requires merge_mode='mor'")
        # internal (maintenance/DML) commits gate against their own id
        # space — see merge()'s docstring for why they must not consume
        # stream epoch ids
        gate = m0.get("last_dml_batch_id", -1) if internal else m0["last_batch_id"]
        if batch_id <= gate:
            return MergeStats(batch_id=batch_id, skipped=True, version=m0["version"])
        spec = self.spec

        # --- schema evolution (column add / widen) from the raw batch schema
        events = self._apply_rename_map(events, m0)
        tgt_schema = T.StructType.fromJson(m0["schema"])
        data_cols = [c for c in events.columns if c not in (spec.op_col, spec.lsn_col)]
        batch_payload = T.StructType([events.schema[c] for c in data_cols])
        new_schema = evolve_schema(tgt_schema, batch_payload)
        schema_changed = new_schema != tgt_schema
        if schema_changed:
            _guard_bucket_widening(spec, tgt_schema, new_schema)

        src = align_to_schema(
            events.select(*data_cols, spec.lsn_col, spec.op_col), new_schema
        ).withColumn(BUCKET, self._bucket_expr())

        internal_schema = self._internal_schema(new_schema)
        out_schema = T.StructType(
            list(internal_schema.fields)
            + [T.StructField(BUCKET, T.LongType(), False), T.StructField("_op", T.StringType(), True)]
        )
        keys = list(spec.key_cols)
        payload_str_cols = [
            f.name
            for f in new_schema.fields
            if f.dataType.simpleString() == "string" and f.name not in keys
        ]
        sort_cols = [TS_APPLIED, LSN_APPLIED]

        out_cols = [f.name for f in out_schema.fields]

        payload_cols = [f.name for f in new_schema.fields if f.name not in keys]

        agg_int_cols = {
            f.name
            for f in new_schema.fields
            if f.name not in keys
            and f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
        }
        agg_float_cols = {
            f.name
            for f in new_schema.fields
            if f.name not in keys and f.dataType.simpleString() in ("float", "double")
        }

        def _fold(it):
            frames = list(it)
            if not frames:
                return
            pdf = frames[0] if len(frames) == 1 else _pd.concat(frames, ignore_index=True)
            if spec.agg_spec:
                pdf = _fold_agg_pandas(
                    pdf, keys, payload_cols, spec.agg_spec, agg_int_cols, agg_float_cols
                )
            elif spec.first_row:
                pdf = _fold_first_pandas(pdf, keys, sort_cols)
            elif spec.partial_updates:
                pdf = _fold_patches_pandas(
                    pdf, keys, payload_cols, sort_cols, spec.sequence_groups
                )
            else:
                pdf = pdf.sort_values(sort_cols, kind="stable").drop_duplicates(keys, keep="last")
            if normalize:
                pdf = normalize_pandas_frame(pdf, spec, payload_str_cols)
            yield pdf[out_cols]

        def _fold_arrow(it):
            import pyarrow as _pa

            from ..functions.normalize import normalize_arrow_table

            batches = list(it)
            if not batches:
                return
            tbl = _pa.Table.from_batches(batches)
            if tbl.num_rows:
                if spec.agg_spec:
                    tbl = _fold_agg_arrow(tbl, keys, payload_cols, spec.agg_spec)
                elif spec.first_row:
                    tbl = _fold_first_arrow(tbl, keys, sort_cols)
                elif spec.partial_updates:
                    tbl = _fold_patches_arrow(
                        tbl, keys, payload_cols, sort_cols, spec.sequence_groups
                    )
                else:
                    tbl = _fold_lww_arrow(tbl, keys, sort_cols)
                if normalize:
                    tbl = normalize_arrow_table(tbl, spec, payload_str_cols)
            yield from tbl.select(out_cols).to_batches()

        # batch lineage observation on the SOURCE rows — before the malformed
        # filter, the shuffle, and the fold, so it costs nothing extra (same
        # job as the write) and counts source events, with null-key rows
        # tallied as n_malformed and every other aggregate conditioned on the
        # row being well-formed
        bad = None
        for k in spec.key_cols:
            c = F.col(k).isNull()
            bad = c if bad is None else (bad | c)
        ok = ~bad
        with_op = self._as_delta_rows(src, new_schema, extra=[F.col(spec.op_col).alias("_op")])
        obs = Observation(f"cdc-batch-{batch_id}")
        # expectations ride the same observe/filter node — violation counts
        # and drop-action filtering cost no extra pass over the batch.
        # NOTE: evaluated on the delta-row projection, whose payload is
        # nulled for deletes; _expectation_cols gates on op != 'D'.
        exps = _expectation_cols(spec, F.col("_op"))
        obs_aggs = [
            F.sum(F.when(ok, 1).otherwise(0)).alias("n"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_malformed"),
            F.min(F.when(ok, F.col(LSN_APPLIED))).alias("lsn_min"),
            F.max(F.when(ok, F.col(LSN_APPLIED))).alias("lsn_max"),
            F.sum(F.when(ok & (F.col("_op") == "I"), 1).otherwise(0)).alias("n_i"),
            F.sum(F.when(ok & (F.col("_op") == "U"), 1).otherwise(0)).alias("n_u"),
            F.sum(F.when(ok & (F.col("_op") == "D"), 1).otherwise(0)).alias("n_d"),
        ]
        drop_pred = None
        for name, action, viol in exps:
            obs_aggs.append(
                F.sum(F.when(ok & viol, 1).otherwise(0)).alias(f"exp_{name}")
            )
            if action == "drop":
                drop_pred = viol if drop_pred is None else (drop_pred | viol)
        keep = ok if drop_pred is None else (ok & ~drop_pred)
        with_op = with_op.observe(obs, *obs_aggs).filter(keep)

        # the ONE shuffle: hash-distribute on bucket (plus, when the salt
        # fan > 1, hash(turn_idx) % salt — keys stay partition-local so
        # dedup is correct, but a Zipf-hot conversation's turns spread over
        # salt sub-partitions). "auto" sizes the fan so the stage runs
        # ~8x-cores partitions whatever the bucket count — see
        # TableSpec.write_salt for the measured basis.
        n_bkts = int(m0.get("num_buckets", spec.num_buckets))
        if spec.write_salt == "auto":
            cores = self.spark.sparkContext.defaultParallelism
            write_salt = min(16, max(1, -(-8 * cores // n_bkts)))
        else:
            write_salt = int(spec.write_salt)
        n_parts = n_bkts * write_salt
        if write_salt > 1:
            salt_id = F.pmod(F.xxhash64(F.col(spec.key_cols[-1])), F.lit(write_salt))
            pid = F.col(BUCKET) * F.lit(write_salt) + salt_id
        else:
            pid = F.col(BUCKET)
        # exact placement: map each (bucket, salt) combo to its own shuffle
        # partition via an inverse-hash probe column. vs hashing the combo
        # directly this removes scatter collisions (balanced tasks) and makes
        # every output file single-bucket, so the write needs no
        # dynamic-partition machinery (no per-task sort by partition value,
        # no per-dir committer work — a measured ~0.8-1.5s/batch constant).
        # Above the literal-array guard (a plan-size limit, not a semantic
        # one) fall back to hash scatter + hive dirs; a real cluster at 4096
        # buckets would broadcast the probe map instead.
        flat = n_parts <= self._EXACT_PLACEMENT_MAX
        part_cols: list[str] = []  # partition-helper cols, dropped post-fold
        if flat:
            arr = _probe_array(self.spark, n_parts)
            with_op = with_op.withColumn(
                "_probe", F.element_at(arr, pid.cast("int") + F.lit(1))
            ).repartition(n_parts, F.col("_probe"))
            part_cols = ["_probe"]
        elif write_salt > 1:
            with_op = with_op.withColumn("_salt", salt_id).repartition(
                n_parts, F.col(BUCKET), F.col("_salt")
            )
            part_cols = ["_salt"]
        else:
            with_op = with_op.repartition(n_bkts, F.col(BUCKET))
        plain_lww = (
            not spec.partial_updates and not spec.agg_spec and not spec.first_row
        )
        if m0.get("write_path", "fused") == "raw":
            # raw append: every version row, JVM-only apply path; dedup and
            # normalization defer to read-time resolve / compaction
            folded = with_op.drop(*part_cols)
        elif spec.fold_engine == "jvm" and plain_lww:
            # all-JVM fused fold: the groupBy clusters on the SAME columns
            # the repartition hashed (partition-helper col + keys), so
            # Catalyst's subset rule accepts the existing distribution — no
            # second exchange. max_by over one struct picks the LWW winner
            # with a single (ts, lsn) comparison per row (LSN uniqueness
            # makes it deterministic), map-side partials collapse hot keys
            # before the fetch, and normalization is Catalyst expressions —
            # no Python worker anywhere in the apply path.
            # group on EXACTLY the repartition columns + keys: flat probe
            # (-> [_probe]), salted hive (-> [BUCKET, _salt]), plain
            # (-> [BUCKET]); the subset rule needs every partitioning
            # expression inside the grouping set
            if flat:
                grp = ["_probe"]
            elif write_salt > 1:
                grp = [BUCKET, "_salt"]
            else:
                grp = [BUCKET]
            others = [c for c in with_op.columns if c not in keys and c not in grp]
            win = F.expr(
                "max_by(struct({cols}), struct({ts}, {lsn}))".format(
                    cols=", ".join(f"`{c}`" for c in others),
                    ts=TS_APPLIED, lsn=LSN_APPLIED,
                )
            )
            carry = [c for c in grp if c in out_cols]  # BUCKET when grouped on
            folded = (
                with_op.groupBy(*grp, *[F.col(k) for k in keys])
                .agg(win.alias("_w"))
                .select(*keys, *carry, *[F.col(f"_w.{c}").alias(c) for c in others])
            )
            if normalize:
                folded = normalize_payload_jvm(folded, spec, payload_str_cols)
            folded = folded.select(*out_cols)
        elif spec.fold_engine == "arrow":  # every merge engine has an Arrow fold
            folded = with_op.drop(*part_cols).mapInArrow(_fold_arrow, schema=out_schema)
        else:
            folded = with_op.drop(*part_cols).mapInPandas(_fold, schema=out_schema)
        folded = folded.drop("_op")

        # --- schema-era bookkeeping + write (no extra repartition: rows are
        #     already hash-distributed by bucket)
        version = self._alloc_version()
        new_sid = (
            max(int(k) for k in m0["schemas"]) + 1 if schema_changed else m0["current_schema_id"]
        )
        # attempt-unique dir — see _write_data: racing CAS writers must not
        # share a commit directory
        rel = os.path.join("data", f"c{version:010d}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.root, rel)
        # delta files are short-lived (compaction folds them): honor the
        # spec's cheaper delta codec when set (see TableSpec.delta_codec)
        w_opts = {"compression": self.spec.delta_codec} if self.spec.delta_codec else {}
        if self._arrow_plane():
            # registered-scheme root: Arrow writer (distributed on factory
            # schemes — see _arrow_plane), same flat/hive layouts; rows are
            # already hash-distributed by the fold, so no extra shuffle
            self._arrow_write_dir(folded, out_dir, flat=flat, pre_partitioned=True)
        elif flat:
            # one single-bucket file per task (bucket rides as a data column,
            # a run-length constant under the columnar codec; readers prune
            # it via their explicit schema) — recovered from footer stats in
            # _scan_written
            folded.write.mode("overwrite").options(**w_opts).parquet(out_dir)
        else:
            folded.write.mode("overwrite").options(**w_opts).partitionBy(BUCKET).parquet(out_dir)
        try:
            got = obs.get
        except Exception:
            # zero well-formed rows: AQE collapses the write plan to an empty
            # relation and the observe node never fires — recover the
            # malformed tally with a direct count (all surviving source rows
            # were bad by construction; pathological path, never hot)
            got = {"n": 0, "n_malformed": src.count(), "lsn_min": None,
                   "lsn_max": None, "n_i": 0, "n_u": 0, "n_d": 0}
        n_malformed = int(got["n_malformed"] or 0)
        exp_counts = {name: int(got.get(f"exp_{name}") or 0) for name, _, _ in exps}
        failed = {
            name: exp_counts[name]
            for name, action, _ in exps
            if action == "fail" and exp_counts[name] > 0
        }
        if failed:
            # abort BEFORE the manifest commit: the written delta files stay
            # unreferenced (orphan GC reclaims them); the ledger is untouched
            # so a repaired replay of this batch_id applies cleanly
            raise ExpectationFailedError(batch_id, failed)
        if not got["n"]:
            extra = dict(summary_extra() if callable(summary_extra) else (summary_extra or {}))
            extra.setdefault("n_malformed", n_malformed)
            return self._commit_empty(batch_id, extra)

        files, per_bucket = self._scan_written(out_dir, rel, new_sid, flat=flat)
        affected = sorted(files)
        stats = MergeStats(
            batch_id=batch_id,
            skipped=False,
            n_source=int(got["n"]),
            n_insert=int(got["n_i"] or 0),
            n_update=int(got["n_u"] or 0),
            n_delete=int(got["n_d"] or 0),
            n_malformed=n_malformed,
            n_buckets=len(affected),
            lsn_min=int(got["lsn_min"]),
            lsn_max=int(got["lsn_max"]),
            expectations=exp_counts or None,
        )

        m = dict(m0)
        m["schemas"] = dict(m0["schemas"])
        if schema_changed:
            m["schemas"][str(new_sid)] = new_schema.jsonValue()
            m["schema"] = new_schema.jsonValue()
            m["current_schema_id"] = new_sid
        buckets = dict(m0["buckets"])
        for b in affected:
            buckets[str(b)] = list(buckets.get(str(b), [])) + files.get(b, [])
        m["version"] = version
        m["parent_snapshot_id"] = m0["snapshot_id"]
        m["parent_version"] = m0["version"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["buckets"] = buckets
        if internal:
            m["last_dml_batch_id"] = batch_id
        else:
            m["last_batch_id"] = batch_id
        m["last_lsn"] = max(m0["last_lsn"], stats.lsn_max or -1)
        m["summary"] = {
            "op": "merge",
            **({"internal": True} if internal else {}),
            "batch_id": batch_id,
            "n_source": stats.n_source,
            "n_insert": stats.n_insert,
            "n_update": stats.n_update,
            "n_delete": stats.n_delete,
            "n_malformed": stats.n_malformed,
            "lsn_min": stats.lsn_min,
            "lsn_max": stats.lsn_max,
            "affected_buckets": affected,
            "per_bucket": per_bucket,
            **({"expectations": exp_counts} if exps else {}),
            **(summary_extra() if callable(summary_extra) else (summary_extra or {})),
        }
        m["committed_at"] = time.time()
        try:
            self._commit(m, expected_ref=m0["version"])
        except CommitConflictError:
            # a maintenance job (compaction / snapshot expiry) committed while
            # this batch was being written. The delta files are pure appends,
            # so rebase them onto the winner's manifest instead of failing the
            # micro-batch and forcing a stream restart+replay.
            m = self._rebase_append(
                m0, files, affected, batch_id, stats,
                schema_changed, new_sid, new_schema, m["summary"],
                internal=internal,
            )
        stats.snapshot_id = m["snapshot_id"]
        stats.version = m["version"]
        return stats

    def _rebase_append(self, m0: dict, files: dict, affected: list,
                       batch_id: int, stats: "MergeStats", schema_changed: bool,
                       new_sid: int, new_schema, summary: dict,
                       max_retries: int = 5, internal: bool = False) -> dict:
        """Rebase a lost-CAS MoR delta append onto the current manifest.
        Safe because delta files only ADD information: stacking them on top
        of whatever a concurrent maintenance commit produced (compaction
        output, snapshot expiry) preserves the resolve semantics. Unsafe —
        and re-raised — if the bucket layout changed (our files hash with the
        old count), a conflicting schema id was allocated, or another writer
        claimed this batch_id (single-ingest-writer contract)."""
        for _ in range(max_retries):
            self._manifest = None
            mc = self.manifest()
            gate = mc.get("last_dml_batch_id", -1) if internal else mc["last_batch_id"]
            if batch_id <= gate:
                raise CommitConflictError(
                    f"batch {batch_id} was committed by a concurrent writer; "
                    "single-ingest-writer contract violated"
                )
            if mc.get("num_buckets") != m0.get("num_buckets"):
                raise CommitConflictError(
                    "table was rebucketed mid-batch; replay the batch"
                )
            m2 = dict(mc)
            m2["schemas"] = dict(mc["schemas"])
            if schema_changed:
                prior = m2["schemas"].get(str(new_sid))
                if prior is not None and prior != new_schema.jsonValue():
                    raise CommitConflictError(
                        f"schema id {new_sid} was allocated concurrently with "
                        "a different schema; replay the batch"
                    )
                m2["schemas"][str(new_sid)] = new_schema.jsonValue()
                if new_sid >= int(mc["current_schema_id"]):
                    m2["schema"] = new_schema.jsonValue()
                    m2["current_schema_id"] = new_sid
            buckets = dict(mc["buckets"])
            for b in affected:
                buckets[str(b)] = list(buckets.get(str(b), [])) + files.get(b, [])
            m2["version"] = self._alloc_version()
            m2["parent_snapshot_id"] = mc["snapshot_id"]
            m2["parent_version"] = mc["version"]
            m2["snapshot_id"] = uuid.uuid4().hex
            m2["buckets"] = buckets
            if internal:
                m2["last_dml_batch_id"] = batch_id
            else:
                m2["last_batch_id"] = batch_id
            m2["last_lsn"] = max(mc["last_lsn"], stats.lsn_max or -1)
            m2["summary"] = {**summary, "rebased": True}
            m2["committed_at"] = time.time()
            try:
                self._commit(m2, expected_ref=mc["version"])
                return m2
            except CommitConflictError:
                continue
        raise CommitConflictError("merge append rebase exhausted retries")

    # below this file count the footer stats are read on the driver — a Spark
    # job's fixed scheduling cost (~50ms) isn't worth it for a handful of files
    _FOOTER_SCAN_DRIVER_MAX = 32
    # exact shuffle placement uses a literal probe array of num_buckets *
    # write_salt entries; beyond this the plan literal gets unwieldy and the
    # apply falls back to hash scatter + hive-dir writes (on a real cluster
    # you'd broadcast the probe map instead of inlining it)
    _EXACT_PLACEMENT_MAX = 16384

    def _scan_written(
        self, out_dir: str, rel: str, sid: int, flat: bool = False
    ) -> tuple[dict[int, list[dict]], list[dict]]:
        """Collect file entries + per-bucket lineage (rows, LSN range) from
        the parquet footers of a just-written commit dir — column statistics
        the writer already produced, no data read.

        ``flat=True`` is the exact-placement layout: files sit directly in
        the commit dir, each covering exactly one bucket, recovered from the
        ``_bucket`` column's footer stats (same footers the LSN range comes
        from — no extra IO).

        The directory walk is one listing; the footer reads (the expensive
        part at num_buckets*write_salt files per batch on object storage) run
        as a Spark job across executors, so commit latency is bounded by
        parallelism, not file count. Small batches stay driver-side."""
        files: dict[int, list[dict]] = {}
        if flat:
            entries: list[dict] = []
            pairs = []  # (index into entries, absolute path)
            for fn in fsio.listdir(out_dir):
                if not fn.endswith(".parquet"):
                    continue
                entries.append(
                    {"path": os.path.join(rel, fn), "schema_id": sid, "delta": True}
                )
                pairs.append((len(entries) - 1, fsio.join(out_dir, fn)))
            if not pairs:
                return files, []
            ts_col = self.spec.ts_col
            scols = self._stats_cols()
            token = self._plane_token()
            if len(pairs) <= self._FOOTER_SCAN_DRIVER_MAX or (
                "://" in pairs[0][1] and token is None
            ):
                fstats = _footer_stats(pairs, with_bucket=True, ts_col=ts_col,
                                       stats_cols=scols)
            else:
                sc = self.spark.sparkContext
                n_slices = min(len(pairs), sc.defaultParallelism)
                if token is not None and "://" in pairs[0][1]:
                    fn = lambda it: _footer_stats_shipped(  # noqa: E731
                        it, token, with_bucket=True, ts_col=ts_col, stats_cols=scols
                    )
                else:
                    fn = lambda it: _footer_stats(  # noqa: E731
                        it, with_bucket=True, ts_col=ts_col, stats_cols=scols
                    )
                fstats = sc.parallelize(pairs, n_slices).mapPartitions(fn).collect()
            stats = []
            for i, n, lo, hi, tlo, thi, live, cs, b in fstats:
                entries[i].update(n_rows=n)
                if tlo is not None:
                    entries[i].update(ts_min=tlo, ts_max=thi)
                if live is not None:
                    entries[i].update(all_live=live)
                if cs:
                    entries[i]["stats"] = cs
                files.setdefault(b, []).append(entries[i])
                stats.append((b, n, lo, hi))
        else:
            entries = []
            entry_bucket: list[int] = []
            pairs = []  # (index into entries, absolute path)
            for full, _sz in fsio.walk_files(out_dir):
                posix = full.replace(os.sep, "/")
                base, fn = posix.split("/")[-2], posix.split("/")[-1]
                if not base.startswith(f"{BUCKET}=") or not fn.endswith(".parquet"):
                    continue
                b = int(base.split("=", 1)[1])
                e = {"path": os.path.join(rel, base, fn), "schema_id": sid, "delta": True}
                files.setdefault(b, []).append(e)
                entries.append(e)
                entry_bucket.append(b)
                pairs.append((len(entries) - 1, full))
            if not pairs:
                return files, []
            ts_col = self.spec.ts_col
            scols = self._stats_cols()
            token = self._plane_token()
            if len(pairs) <= self._FOOTER_SCAN_DRIVER_MAX or (
                "://" in pairs[0][1] and token is None
            ):
                fstats = _footer_stats(pairs, ts_col=ts_col, stats_cols=scols)
            else:
                sc = self.spark.sparkContext
                n_slices = min(len(pairs), sc.defaultParallelism)
                if token is not None and "://" in pairs[0][1]:
                    fn = lambda it: _footer_stats_shipped(  # noqa: E731
                        it, token, ts_col=ts_col, stats_cols=scols
                    )
                else:
                    fn = lambda it: _footer_stats(it, ts_col=ts_col, stats_cols=scols)  # noqa: E731
                fstats = sc.parallelize(pairs, n_slices).mapPartitions(fn).collect()
            stats = []
            for i, n, lo, hi, tlo, thi, live, cs in fstats:
                entries[i].update(n_rows=n)
                if tlo is not None:
                    entries[i].update(ts_min=tlo, ts_max=thi)
                if live is not None:
                    entries[i].update(all_live=live)
                if cs:
                    entries[i]["stats"] = cs
                stats.append((entry_bucket[i], n, lo, hi))
        agg: dict[int, list] = {}
        for b, n, lo, hi in stats:
            cur = agg.get(b)
            if cur is None:
                agg[b] = [n, lo, hi]
            else:
                cur[0] += n
                cur[1] = lo if cur[1] is None else (cur[1] if lo is None else min(cur[1], lo))
                cur[2] = hi if cur[2] is None else (cur[2] if hi is None else max(cur[2], hi))
        per_bucket = [
            {"bucket": b, "n_rows": v[0], "lsn_min": v[1], "lsn_max": v[2]}
            for b, v in sorted(agg.items())
        ]
        return files, per_bucket

    def _commit_empty(self, batch_id: int, summary_extra=None) -> MergeStats:
        m = dict(self.manifest())
        parent_version = m["version"]
        m["version"] = self._alloc_version()
        m["parent_snapshot_id"] = m["snapshot_id"]
        m["parent_version"] = parent_version
        m["snapshot_id"] = uuid.uuid4().hex
        m["last_batch_id"] = batch_id
        extra = summary_extra() if callable(summary_extra) else (summary_extra or {})
        m["summary"] = {"op": "merge", "batch_id": batch_id, "n_source": 0, **extra}
        m["committed_at"] = time.time()
        self._commit(m, expected_ref=parent_version)
        return MergeStats(batch_id=batch_id, skipped=False, snapshot_id=m["snapshot_id"], version=m["version"])

    def _as_delta_rows(
        self, src: DataFrame, schema: T.StructType, extra: list | None = None
    ) -> DataFrame:
        """Project winning change events into internal-schema version rows:
        payload (nulled on delete — the tombstone carries only the deleting
        writer's dominance pair) + (_ts_applied, _lsn_applied, _deleted).
        ``extra`` appends rider columns (e.g. the op code for lineage)."""
        spec = self.spec
        epoch = F.to_timestamp(F.lit(EPOCH))
        is_del = F.col(spec.op_col) == "D"
        cols = [F.col(k) for k in spec.key_cols]
        for f in schema.fields:
            if f.name in spec.key_cols:
                continue
            cols.append(
                F.when(is_del, F.lit(None).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        cols += [
            F.coalesce(F.col(spec.ts_col), epoch).alias(TS_APPLIED),
            F.col(spec.lsn_col).cast("long").alias(LSN_APPLIED),
            is_del.alias(DELETED),
        ]
        if spec.partial_updates:
            cols.append((F.col(spec.op_col) == "P").alias(PATCH))
        if spec.agg_spec:
            # raw (unfused) rows are single-event partials: a delete is its
            # own reset layer with nothing folded in; any other event is one
            # contribution — the read-time merge is closed over this form
            cols.append(is_del.alias(AGG_RESET))
            cols.append(F.when(is_del, 0).otherwise(1).cast("long").alias(AGG_N))
        cols.append(F.col(BUCKET))
        return src.select(*cols, *(extra or []))

    def _resolve(self, tgt: DataFrame | None, src: DataFrame, schema: T.StructType) -> DataFrame:
        """Full-outer LWW resolve of target rows vs winning source events."""
        spec = self.spec
        payload = [f.name for f in schema.fields if f.name not in spec.key_cols]
        keys = list(spec.key_cols)

        if tgt is None:
            tgt = self.spark.createDataFrame([], self._internal_schema(schema))

        s = src.select(
            *keys,
            F.struct(
                *[F.col(c) for c in payload],
                F.col(spec.lsn_col),
                F.col(spec.op_col).alias("_op"),
            ).alias("_s"),
        )
        t = tgt.select(
            *keys,
            F.struct(
                *[F.col(c) for c in payload],
                F.col(TS_APPLIED),
                F.col(LSN_APPLIED),
                F.col(DELETED),
            ).alias("_t"),
        )
        j = t.join(s, on=keys, how="full_outer")

        epoch = F.to_timestamp(F.lit(EPOCH))
        s_ord = F.struct(
            F.coalesce(F.col(f"_s.{spec.ts_col}"), epoch), F.col(f"_s.{spec.lsn_col}")
        )
        t_ord = F.struct(F.col(f"_t.{TS_APPLIED}"), F.col(f"_t.{LSN_APPLIED}"))
        s_wins = F.col("_s").isNotNull() & (F.col("_t").isNull() | (s_ord > t_ord))
        is_del = F.col("_s._op") == "D"

        cols = [F.col(k) for k in keys]
        for c in payload:
            cols.append(
                F.when(s_wins & ~is_del, F.col(f"_s.{c}"))
                .when(s_wins & is_del, F.lit(None))
                .otherwise(F.col(f"_t.{c}"))
                .alias(c)
            )
        cols += [
            F.when(s_wins, F.coalesce(F.col(f"_s.{spec.ts_col}"), epoch))
            .otherwise(F.col(f"_t.{TS_APPLIED}"))
            .alias(TS_APPLIED),
            F.when(s_wins, F.col(f"_s.{spec.lsn_col}"))
            .otherwise(F.col(f"_t.{LSN_APPLIED}"))
            .alias(LSN_APPLIED),
            F.when(s_wins, is_del).otherwise(F.col(f"_t.{DELETED}")).alias(DELETED),
        ]
        out = j.select(*cols)
        # drop never-materialized keys: a D (or stale loser) arriving for a key
        # the table never saw -> tombstone it anyway IF it won (late lower-lsn
        # updates must stay dead), which the projection above already does.
        return out.withColumn(BUCKET, self._bucket_expr())

    # ------------------------------------------------------------ maintenance

    def rollback(self, version: int) -> None:
        """Restore an older snapshot (index_ccdb.py:170-178 alias-repoint
        analog) by committing a NEW version whose state equals the target —
        roll *forward*, never re-point HEAD backwards. Version slots stay
        append-only (required by the exclusive-create CAS in ``_commit``:
        a later writer must never target an already-taken slot), history
        stays linear, and the abandoned commits remain time-travel-readable
        until expired. Restoring the old ``last_batch_id`` / ``last_lsn``
        re-opens the exactly-once ledger so the rolled-back batches can be
        replayed."""
        if not fsio.exists(self._manifest_path(version)):
            raise ValueError(f"no manifest for version {version}")
        old, cur = self.manifest(version), self.manifest()
        if version == cur["version"]:
            return
        m = dict(old)
        m["version"] = self._alloc_version()
        m["snapshot_id"] = uuid.uuid4().hex
        m["parent_snapshot_id"] = cur["snapshot_id"]
        m["parent_version"] = cur["version"]
        m["summary"] = {"op": "rollback", "rolled_back_to": version}
        m["committed_at"] = time.time()
        self._commit(m, expected_ref=cur["version"])

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (Iceberg field-id rename analog): no
        data file is touched. The manifest gains a new schema era carrying
        the new name plus a rename-log entry ``{from, to, sid}``; at read
        time each OLDER era applies the renames that postdate it before
        aligning to the current schema (see ``_read_files``), so files
        written under the old name keep serving the renamed column — and a
        later re-add of the retired name is a distinct field (null in
        pre-rename files), exactly Iceberg's field-id behavior. The
        reference's rename mechanism is the positional header swap in
        /root/reference/common/csv2json.py:74-77 — edit the field file,
        rewrite the whole output; here a rename is O(manifest) at any table
        size. Key/bucket/ts/lsn columns are rejected: their names are wired
        into the TableSpec every writer constructs with (rename those by
        migrating the spec, a deliberate operational event)."""
        cur = self.manifest()
        schema = T.StructType.fromJson(cur["schema"])
        names = [f.name for f in schema.fields]
        # internal columns AND the change-batch wire names (op/lsn are
        # stripped from batches as flags — a payload column named after
        # them could never be written)
        reserved = {TS_APPLIED, LSN_APPLIED, DELETED, PATCH, BUCKET, AGG_RESET,
                    AGG_N, self.spec.op_col, self.spec.lsn_col}
        protected = {*self.spec.key_cols, self.spec.bucket_col, self.spec.ts_col,
                     self.spec.lsn_col, self.spec.op_col}
        if old not in names:
            raise ValueError(f"no column {old!r}; table has {names}")
        if old in protected:
            raise ValueError(f"{old!r} is a key/bucket/ts column — spec-wired, not renameable")
        if new in names or new in reserved or not new:
            raise ValueError(f"target name {new!r} already exists or is reserved")
        new_schema = T.StructType(
            [
                T.StructField(new, f.dataType, f.nullable, f.metadata) if f.name == old else f
                for f in schema.fields
            ]
        )
        return self._commit_schema_ddl(
            cur, new_schema, "renames", lambda sid: {"from": old, "to": new, "sid": sid},
            {"op": "rename_column", "from": old, "to": new},
        )

    def drop_column(self, name: str) -> int:
        """Metadata-only column drop (Iceberg DROP COLUMN analog): no data
        file is touched — the field leaves the schema, old files' bytes stay
        until compaction rewrites them, and the drop log keeps field-id
        semantics: if the same NAME is later re-added (a new field), rows
        written before the drop read as null for it instead of resurrecting
        stale values (see ``_apply_schema_events``). Key/bucket/ts columns
        are spec-wired and rejected. Lagging producers that keep emitting
        the dropped column re-union-evolve it as a NEW field (strict Iceberg
        behavior — stop the producer before dropping, or the re-add is
        intentional)."""
        cur = self.manifest()
        schema = T.StructType.fromJson(cur["schema"])
        names = [f.name for f in schema.fields]
        protected = {*self.spec.key_cols, self.spec.bucket_col, self.spec.ts_col,
                     self.spec.lsn_col, self.spec.op_col}
        if name not in names:
            raise ValueError(f"no column {name!r}; table has {names}")
        if name in protected:
            raise ValueError(f"{name!r} is a key/bucket/ts column — spec-wired, not droppable")
        if self.spec.agg_spec and name in self.spec.agg_spec:
            raise ValueError(f"{name!r} is an aggregation-engine column; amend agg_spec first")
        new_schema = T.StructType([f for f in schema.fields if f.name != name])
        return self._commit_schema_ddl(
            cur, new_schema, "drops", lambda sid: {"name": name, "sid": sid},
            {"op": "drop_column", "name": name},
        )

    def add_column(self, name: str, dtype, default=None) -> int:
        """Explicit ADD COLUMN DDL (columns also union-evolve implicitly from
        batches; the explicit form pre-declares the field before producers
        emit it and, unlike implicit evolution, can carry an INITIAL DEFAULT
        — the Iceberg v3 initial-default analog). With a default, rows
        written before the column existed read the default instead of null;
        metadata-only (the fill is a constant-folded literal per old schema
        era at read — see ``_apply_schema_events``), no file rewritten.
        Rows written AFTER the add keep whatever the producer sent (nulls
        stay null — no write-default). Defaults are restricted to JSON
        primitives so the manifest stays engine-portable."""
        cur = self.manifest()
        schema = T.StructType.fromJson(cur["schema"])
        names = [f.name for f in schema.fields]
        reserved = {TS_APPLIED, LSN_APPLIED, DELETED, PATCH, BUCKET, AGG_RESET,
                    AGG_N, self.spec.op_col, self.spec.lsn_col}
        if name in names or name in reserved or not name:
            raise ValueError(f"column {name!r} already exists or is reserved")
        if isinstance(dtype, str):
            dtype = T.DataType.fromDDL(dtype)
        if default is not None and not isinstance(default, (str, int, float, bool)):
            raise ValueError("default must be a JSON primitive (str/int/float/bool)")
        if default is not None:
            # eager cast check at DDL time — an invalid default would
            # otherwise surface only later: as null on every pre-add row
            # (non-ANSI) or as a read-time cast error (ANSI)
            try:
                chk = self.spark.range(1).select(
                    F.lit(default).cast(dtype).alias("v")
                ).first()["v"]
            except Exception:
                chk = None
            if chk is None:
                raise ValueError(
                    f"default {default!r} does not cast to {dtype.simpleString()}"
                )
        new_schema = T.StructType(list(schema.fields) + [T.StructField(name, dtype, True)])
        return self._commit_schema_ddl(
            cur, new_schema, "adds",
            lambda sid: {"name": name, "sid": sid, "type": dtype.jsonValue(),
                         "default": default},
            {"op": "add_column", "name": name, "default": default},
        )

    def _commit_schema_ddl(self, cur: dict, new_schema: T.StructType,
                           log_key: str, log_entry, summary: dict) -> int:
        """Commit a metadata-only schema DDL: new schema era + an append to
        the named event log, CAS-protected against concurrent writers."""
        new_sid = max(int(k) for k in cur["schemas"]) + 1
        m = dict(cur)
        m["version"] = self._alloc_version()
        m["snapshot_id"] = uuid.uuid4().hex
        m["parent_snapshot_id"] = cur["snapshot_id"]
        m["parent_version"] = cur["version"]
        m["schemas"] = dict(cur["schemas"])
        m["schemas"][str(new_sid)] = new_schema.jsonValue()
        m["schema"] = new_schema.jsonValue()
        m["current_schema_id"] = new_sid
        m[log_key] = list(cur.get(log_key, [])) + [log_entry(new_sid)]
        m["summary"] = summary
        m["committed_at"] = time.time()
        self._commit(m, expected_ref=cur["version"])
        return m["version"]

    def _apply_rename_map(self, df: DataFrame, m: dict) -> DataFrame:
        """Map a source batch's retired column names onto their current ones
        (producers lagging a rename DDL). Only the unambiguous case — the
        batch has the old name and NOT the new — is remapped; opt out with
        ``TableSpec.remap_renamed_columns=False`` for strictly literal
        names."""
        if not self.spec.remap_renamed_columns:
            return df
        live = {f.name for f in T.StructType.fromJson(m["schema"]).fields}
        for r in m.get("renames", []):
            # a retired name that was later legitimately reintroduced into
            # the CURRENT schema is a live field — incoming batches using it
            # mean the new field, never the pre-rename one
            if r["from"] in live:
                continue
            if r["from"] in df.columns and r["to"] not in df.columns:
                df = df.withColumnRenamed(r["from"], r["to"])
        return df

    # ------------------------------------------------------ write-audit-publish

    def create_branch(self, name: str) -> "SnapshotParquetTable":
        """Fork a staging branch at this handle's current snapshot (Iceberg
        WAP branch / the reference's build-the-new-index-before-alias-swap,
        index_ccdb.py:150-178). Returns a handle whose commits advance only
        ``refs/<name>`` — main's readers never see them until publish."""
        if name == "main":
            raise ValueError("'main' is the published ref, not a branch name")
        refs_dir = os.path.join(self.root, "refs")
        fsio.makedirs(refs_dir)
        _atomic_write_exclusive(
            os.path.join(refs_dir, name), str(self.current_version())
        )
        return SnapshotParquetTable(self.spark, self.root, self.spec, ref=name)

    def branches(self) -> dict[str, int]:
        refs_dir = os.path.join(self.root, "refs")
        return {
            fn: int(fsio.read_text(os.path.join(refs_dir, fn)).strip())
            for fn in fsio.listdir(refs_dir)
            if not fn.endswith(".lock")
        }

    # ------------------------------------------------------------ tags

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under an immutable name (Iceberg tag analog) —
        the reproducibility primitive: tag the exact table state a training
        run read, and ``expire_snapshots`` will never reclaim it while the
        tag lives. Unlike a branch, a tag can never advance; creating over
        an existing name raises. Returns the pinned version."""
        v = self.current_version() if version is None else int(version)
        if not fsio.exists(self._manifest_path(v)):
            raise ValueError(f"version {v} does not exist")
        tags_dir = os.path.join(self.root, "tags")
        fsio.makedirs(tags_dir)
        try:
            _atomic_write_exclusive(os.path.join(tags_dir, name), str(v))
        except CommitConflictError:
            raise ValueError(f"tag already exists (tags are immutable): {name}") from None
        return v

    def tags(self) -> dict[str, int]:
        tags_dir = os.path.join(self.root, "tags")
        return {
            fn: int(fsio.read_text(os.path.join(tags_dir, fn)).strip())
            for fn in fsio.listdir(tags_dir)
        }

    def drop_tag(self, name: str) -> None:
        """Release the pin; the tagged snapshot becomes reclaimable at the
        next expire_snapshots like any other out-of-retention version."""
        path = os.path.join(self.root, "tags", name)
        if not fsio.exists(path):
            raise ValueError(f"no such tag: {name}")
        fsio.remove(path)

    def read_tag(self, name: str, **kw) -> DataFrame:
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"no such tag: {name}")
        return self.read(version=tags[name], **kw)

    def drop_branch(self, name: str) -> None:
        """Abort a staged line of work. The branch's manifests stay readable
        (time travel) until expired; its data files become reclaimable once
        no retained manifest references them."""
        fsio.remove(os.path.join(self.root, "refs", name))

    def _snapshot_index(self) -> dict[str, dict]:
        """snapshot_id -> manifest over every allocated slot (one readdir +
        manifest reads — driver-side metadata, never data files)."""
        idx: dict[str, dict] = {}
        mdir = os.path.join(self.root, "manifests")
        for fn in fsio.listdir(mdir):
            if fn.startswith("m-") and fn.endswith(".json"):
                m = json.loads(fsio.read_text(os.path.join(mdir, fn)))
                idx[m["snapshot_id"]] = m
        return idx

    def _is_ancestor(self, ancestor_sid: str, head: dict, idx: dict[str, dict]) -> bool:
        sid = head["snapshot_id"]
        while sid is not None:
            if sid == ancestor_sid:
                return True
            m = idx.get(sid)
            sid = m["parent_snapshot_id"] if m else None
        return False

    def publish_branch(self, name: str, audits=(), default_audits: bool = True) -> int:
        """Atomically fast-forward main to a staged branch — the alias swap
        (index_ccdb.py:45-71) with the audit gate the reference lacks (its
        rollback fires only on TransportError; a *logically* bad index still
        published). Audits run against the BRANCH snapshot before main
        moves; any :class:`AuditFailedError` leaves main untouched.

        Preconditions: main's current snapshot must be an ancestor of the
        branch head (pure fast-forward — divergence raises
        :class:`PublishConflictError`). Single-publisher per table is
        assumed, as with Iceberg's registerTable-style ref swaps.

        Returns the published version."""
        if self.ref != "main":
            raise ValueError("publish from the main handle")
        branch_version = self.branches()[name]
        self._manifest = None  # re-read: publish must see the latest main
        main_m = self.manifest()
        if branch_version == main_m["version"]:
            self.drop_branch(name)
            return branch_version
        branch_m = self.manifest(branch_version)
        idx = self._snapshot_index()
        if not self._is_ancestor(main_m["snapshot_id"], branch_m, idx):
            raise PublishConflictError(
                f"main@v{main_m['version']} is not an ancestor of "
                f"{name}@v{branch_version}"
            )
        if default_audits:
            self._run_default_audits(branch_m, main_m, idx)
        branch_view = SnapshotParquetTable(self.spark, self.root, self.spec, ref=name)
        for audit in audits:
            audit(branch_view, branch_m, main_m)
        # fast-forward under the ref lock: a concurrent main commit between
        # the audit and the swap must conflict, not be silently overwritten
        with self._ref_lock():
            if self.current_version() != main_m["version"]:
                raise CommitConflictError("main advanced during publish; retry")
            _atomic_write(self._head_path, str(branch_version))
        self._manifest = None
        self.drop_branch(name)
        return branch_version

    def _run_default_audits(self, branch_m: dict, main_m: dict, idx: dict) -> None:
        """Built-in WAP invariants, all metadata-only (no table scan):

        - ledger monotonicity: the branch must not rewind the exactly-once
          ledger (batch_id / LSN high-water marks);
        - row floor (the A5 size-regression sentinel, FIXTURES.md
          prev_json_size.txt analog): live rows at the branch head must be
          >= main's live rows minus the deletes the branch itself applied —
          a shrunken table that deletes explain is a bad publish.
        """
        if branch_m["last_batch_id"] < main_m["last_batch_id"] or (
            branch_m["last_lsn"] < main_m["last_lsn"]
        ):
            raise AuditFailedError(
                "ledger rewind: branch last_batch_id/last_lsn behind main"
            )
        n_delete = 0
        sid = branch_m["snapshot_id"]
        while sid is not None and sid != main_m["snapshot_id"]:
            m = idx.get(sid)
            if m is None:
                break
            op = m.get("summary", {}).get("op")
            if op in ("compact", "rebucket", "rollback"):
                # compaction folds MoR version rows / reclaims tombstones and
                # rollback rewinds by design — physical file-row counts are
                # incomparable across such a commit, so the floor check would
                # false-positive; state preservation is compact()'s own
                # contract (test_compaction_preserves_state)
                return
            n_delete += int(m.get("summary", {}).get("n_delete", 0) or 0)
            # DV metadata-only whole-file drops remove n_rows from the
            # physical floor without an "n_delete" merge stat — credit them
            # or a legitimately DV-deleting branch false-positives the audit
            n_delete += int(m.get("summary", {}).get("n_rows_dropped", 0) or 0)
            sid = m["parent_snapshot_id"]
        rows_branch = self._live_row_floor(branch_m)
        rows_main = self._live_row_floor(main_m)
        if rows_branch < rows_main - n_delete:
            raise AuditFailedError(
                f"row-count regression: branch has {rows_branch} rows, main "
                f"{rows_main}, only {n_delete} deletes on the branch"
            )

    def _live_row_floor(self, m: dict) -> int:
        """Total committed rows from per-file lineage (file row counts are
        recorded at write time — no scan). MoR delta layers may multi-count
        a key's versions, identically for both sides of the audit compare,
        so the floor is conservative, never false-positive on clean data."""
        return sum(
            int(e.get("n_rows", 0) or 0) for fs in m["buckets"].values() for e in fs
        )

    def register_view(self, name: str, version: int | None = None,
                      at_timestamp: float | None = None) -> None:
        """SQL front door: expose the MoR-resolved current state (or a
        pinned snapshot / AS-OF timestamp) as a temp view so users can
        ``spark.sql`` against the lake table like any catalog table. The
        view captures the RESOLVED DataFrame at registration time — a
        stable snapshot for the session (re-register to follow new
        commits), which is exactly the repeatable-read behavior a pinned
        Iceberg snapshot gives."""
        if at_timestamp is not None:
            version = self.version_as_of(at_timestamp)
        self.read(version=version).createOrReplaceTempView(name)

    def stats(self, version: int | None = None) -> dict:
        """Table health report from the manifest alone — no Spark job, no
        file IO beyond the one manifest JSON, so it is O(buckets) at any
        table size (the DESCRIBE EXTENDED / files-metadata-table analog).
        Reports physical layout (file and delta-layer counts, per-file row
        floor), read amplification (max/mean delta depth per bucket — the
        number of layers a MoR read must resolve), and a compaction
        recommendation when depth exceeds the default read-amp budget."""
        m = self.manifest(version)
        per_bucket: dict[str, dict] = {}
        n_files = n_delta = 0
        for b, fs in m["buckets"].items():
            depth = sum(1 for e in fs if e.get("delta"))
            rows = sum(int(e.get("n_rows", 0) or 0) for e in fs)
            per_bucket[b] = {"files": len(fs), "delta_depth": depth, "rows": rows}
            n_files += len(fs)
            n_delta += depth
        depths = [v["delta_depth"] for v in per_bucket.values()] or [0]
        bucket_rows = [v["rows"] for v in per_bucket.values()] or [0]
        max_depth = max(depths)
        return {
            "version": m["version"],
            "snapshot_id": m["snapshot_id"],
            "mode": m.get("mode", "cow"),
            "num_buckets": int(m.get("num_buckets", self.spec.num_buckets)),
            "schema_id": m.get("current_schema_id"),
            "n_columns": len(m["schema"]["fields"]),
            "last_batch_id": m["last_batch_id"],
            "last_lsn": m["last_lsn"],
            "n_files": n_files,
            "n_delta_files": n_delta,
            # per-file recorded rows: exact for base/CoW/compaction files;
            # merge_events delta appends record rows per BUCKET in the commit
            # summary, not per file, so on an uncompacted MoR table this is a
            # base-files-only floor (equals live rows right after compact())
            "base_rows_recorded": self._live_row_floor(m),
            "delta_depth_max": max_depth,
            "delta_depth_mean": round(sum(depths) / len(depths), 2),
            "dirty_buckets": sum(1 for d in depths if d),
            # recorded-row floors per bucket (same semantics as
            # base_rows_recorded, bucket-resolved) — the bucket-count
            # advisor's manifest-only inputs (plans/maintenance.py)
            "bucket_rows_max": max(bucket_rows),
            "bucket_rows_mean": round(sum(bucket_rows) / max(1, len(bucket_rows)), 1),
            "compact_recommended": max_depth >= 8,
        }

    # ------------------------------------------------------------ maintenance

    def compact(self, drop_tombstones: bool = True,
                sort_within_bucket: bool = True,
                only_dirty: bool = True,
                buckets: list[int] | None = None,
                zorder_by: tuple[str, ...] = (),
                max_buckets: int | None = None,
                _retries: int = 2) -> None:
        """Fold merge-on-read layers and merge small files — the
        rewrite_data_files analog of the archive re-merge (s3_utils.py:21-59).

        INCREMENTAL by default (``only_dirty=True``): only buckets that need
        work are rewritten — a bucket is dirty when it holds delta layers or
        more than one file — and every clean bucket's file entries are
        carried into the new manifest untouched. At 10^10 rows with a 1%-hot
        key space this makes compaction cost O(dirty data), not O(table):
        the difference between a maintenance job and a nightly full rewrite.
        It also keeps the change feed cheap: ``table_changes`` prunes by
        per-bucket file-list diffs, so a full rewrite marks EVERY bucket
        touched across the compaction boundary while an incremental one
        marks only the buckets that actually changed.

        ``buckets`` restricts the rewrite to an explicit set (targeted
        maintenance); ``only_dirty=False`` forces a full rewrite (use to
        reclaim tombstones parked in single-file clean buckets, or to
        re-sort the whole table after changing the sort policy).

        ``sort_within_bucket`` clusters rows by the table key inside each
        rewritten bucket (Iceberg rewrite_data_files sort-order analog):
        free at write time (sort rides the existing bucket shuffle) and it
        makes parquet row-group key stats tight, so ``read_keys`` point
        lookups prune row groups, not just buckets.

        Tombstone reclaim (``drop_tombstones``) applies to the buckets this
        call rewrites; a tombstone in an untouched clean bucket survives
        until that bucket is next rewritten (standard Iceberg/Hudi
        behavior). On a FIRST-ROW table, ``drop_tombstones=True`` (the
        maintenance default) is downgraded to keep: the engine's contract is
        that a delete suppresses ANY later duplicate of the claim — not just
        late data inside an LWW horizon — so reclaiming the tombstone would
        let an at-least-once retry re-claim an erased key. Pass
        ``drop_tombstones="force"`` once the upstream's retry window has
        provably closed. No-op (no new snapshot) when nothing qualifies."""
        if self.spec.first_row and drop_tombstones is True:
            drop_tombstones = False
        elif drop_tombstones == "force":
            drop_tombstones = True
        m0 = self.manifest()
        carried: dict[str, list[dict]] = {}
        target: dict[str, list[dict]] = {}
        for b, fs in m0["buckets"].items():
            chosen = buckets is None or int(b) in buckets
            dirty = any(e.get("delta") for e in fs) or len(fs) > 1
            if chosen and (dirty or not only_dirty):
                target[b] = fs
            else:
                carried[b] = fs
        if max_buckets is not None and len(target) > max_buckets:
            # IO-budgeted maintenance (Iceberg rewrite_data_files
            # max-file-group / Hudi inline-compact-budget analog): rewrite
            # only the max_buckets DIRTIEST buckets this run — most delta
            # layers first (read amplification), then most files (small-file
            # pressure) — and carry the rest untouched for the next sweep.
            # Repeated budgeted calls converge: each rewrite makes its
            # buckets clean, so the next call picks the next-dirtiest set.
            def _dirt(fs: list) -> tuple:
                return (sum(1 for e in fs if e.get("delta")), len(fs))

            ranked = sorted(target.items(), key=lambda kv: _dirt(kv[1]), reverse=True)
            for b, fs in ranked[max_buckets:]:
                carried[b] = fs
            target = dict(ranked[:max_buckets])
        entries = [e for fs in target.values() for e in fs]
        df = self._read_files(entries, m0)
        if df is None:
            return
        version = self._alloc_version()
        m = dict(m0)
        if any(e.get("delta") for e in entries) or (
            self.spec.partial_updates and PATCH in df.columns
        ):
            # fold merge-on-read layers to one winner per key BEFORE any
            # tombstone filtering (a tombstone must first beat older versions)
            if PATCH in df.columns:
                # partial-update: compacted base files keep the SURVIVOR SET
                # (last image + group winners + non-dominated patches,
                # VERBATIM — round 4), never a collapsed row: collapsing
                # stamps every column with the row's max (ts, lsn), so a
                # LATE event with a version between a column's true writer
                # and that max would mis-resolve against the compacted row.
                # Survivors subsume the old orphan-patch and tombstoned-key
                # patch carries. Buckets whose files still hold patch rows
                # stay on the resolve-at-read path (all_live gate) until a
                # newer image dominates them and a later compaction drops
                # them — convergent.
                df = self._patch_survivors_df(df)
            else:
                df = self._resolve_versions(df)
            if m0.get("write_path", "fused") == "raw":
                # materialize the deferred normalization into the base files
                from ..functions.normalize import normalize_payload

                df = normalize_payload(df, self.spec)
        if drop_tombstones:
            dead = F.col(DELETED)
            if PATCH in df.columns:
                # (patch & deleted) rows are GROUP CARRIERS, not tombstones
                dead = dead & ~F.col(PATCH)
            df = df.filter(~dead)
        df = df.withColumn(BUCKET, self._bucket_expr())
        if zorder_by:
            # multi-dimensional clustering: interleave-bit key over the
            # requested columns (operators/zorder.py) replaces the plain key
            # sort — row-group stats become partially tight on EVERY
            # clustered column, so pushed-down non-key predicates (time
            # ranges) skip row groups too
            from ..operators.zorder import zorder_key

            df = df.withColumn("_zorder", zorder_key(df, list(zorder_by)))
            sort_cols: tuple[str, ...] = ("_zorder",)
        elif sort_within_bucket:
            sort_cols = self.spec.key_cols
        else:
            sort_cols = ()
        files = self._write_data(
            df, version, sid=m0["current_schema_id"], sort_cols=sort_cols,
        )
        if zorder_by:
            df = df.drop("_zorder")
        m["version"] = version
        m["parent_snapshot_id"] = m0["snapshot_id"]
        m["parent_version"] = m0["version"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["buckets"] = {**carried, **{str(b): fs for b, fs in files.items()}}
        m["summary"] = {
            "op": "compact",
            "n_buckets_rewritten": len(target),
            "n_buckets_carried": len(carried),
        }
        if zorder_by:
            m["summary"]["zorder_by"] = list(zorder_by)
        m["committed_at"] = time.time()
        try:
            self._commit(m, expected_ref=m0["version"])
        except CommitConflictError:
            # a writer (normally the ingest stream) committed while we were
            # rewriting: try to REBASE the finished rewrite onto the new
            # manifest instead of discarding hours of compaction work
            try:
                self._rebase_compaction(m0, target, files, drop_tombstones, m["summary"])
            except _RebaseUnsafe:
                if _retries <= 0:
                    raise
                # tombstones were reclaimed but concurrent deltas landed in
                # the rewritten buckets — a dropped tombstone could fail to
                # suppress a late lower-dominance update in those deltas, so
                # the rewrite itself is stale: redo against fresh state
                self._manifest = None
                self.compact(
                    drop_tombstones=drop_tombstones,
                    sort_within_bucket=sort_within_bucket,
                    only_dirty=only_dirty,
                    buckets=buckets,
                    zorder_by=zorder_by,
                    max_buckets=max_buckets,
                    _retries=_retries - 1,
                )

    def _rebase_compaction(self, m0: dict, consumed: dict, new_files: dict,
                           dropped_tombstones: bool, summary: dict,
                           max_retries: int = 5) -> None:
        """Iceberg-style validate-and-rebase for a compaction that lost the
        ref CAS: the rewrite of the files it READ is still correct as long as
        (a) those files are all still referenced (no concurrent compaction /
        rollback touched them), (b) the bucket layout didn't change, and (c)
        tombstone reclaim can't be invalidated by concurrently-appended delta
        layers. Then the new manifest is rebuilt FROM THE CURRENT one: the
        consumed entries are swapped for the compacted files, concurrent
        delta appends in the same buckets are kept stacked on top (the MoR
        resolve folds them at read time), and everything else — ledger
        high-water marks, schemas, other buckets — comes from the winner."""
        for _ in range(max_retries):
            self._manifest = None
            mc = self.manifest()
            if mc.get("num_buckets") != m0.get("num_buckets"):
                raise CommitConflictError(
                    "table was rebucketed during compaction; rerun compact"
                )
            extras: dict[str, list] = {}
            for b, cons in consumed.items():
                now = list(mc["buckets"].get(b, []))
                for e in cons:
                    if e not in now:
                        raise CommitConflictError(
                            f"files compacted from bucket {b} were removed "
                            "concurrently; rerun compact"
                        )
                extras[b] = [e for e in now if e not in cons]
            if dropped_tombstones and any(extras.values()):
                raise _RebaseUnsafe()
            buckets = dict(mc["buckets"])
            for b in consumed:
                merged = list(new_files.get(int(b), [])) + extras[b]
                if merged:
                    buckets[b] = merged
                else:
                    buckets.pop(b, None)
            m2 = dict(mc)
            m2["version"] = self._alloc_version()
            m2["parent_snapshot_id"] = mc["snapshot_id"]
            m2["parent_version"] = mc["version"]
            m2["snapshot_id"] = uuid.uuid4().hex
            m2["buckets"] = buckets
            m2["summary"] = {**summary, "rebased": True}
            m2["committed_at"] = time.time()
            try:
                self._commit(m2, expected_ref=mc["version"])
                return
            except CommitConflictError:
                continue
        raise CommitConflictError("compaction rebase exhausted retries")

    def rebucket(self, new_num_buckets: int) -> None:
        """Partition evolution (Iceberg partition-spec evolution, applied
        eagerly): rewrite the table under a new bucket count. At 10^10 rows
        a table bootstrapped with 512 buckets eventually needs 4096 — per
        bucket ~20M rows stops fitting one executor's scan, point lookups
        touch too many rows, and the single merge shuffle loses parallelism.

        One job: read all files -> fold MoR layers to winners (tombstones
        KEPT — a delete must survive the rewrite or a late lower-dominance
        update could resurrect the key) -> re-hash -> one shuffle into the
        new layout -> atomic commit. Old snapshots stay readable with their
        own bucket count (``read_keys`` hashes per-version); subsequent
        merges pick up the new count from the manifest."""
        m0 = self.manifest()
        old = int(m0.get("num_buckets", self.spec.num_buckets))
        if new_num_buckets == old:
            return
        if new_num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        entries = [e for fs in m0["buckets"].values() for e in fs]
        df = self._read_files(entries, m0)
        version = self._alloc_version()
        m = dict(m0)
        if df is not None:
            if any(e.get("delta") for e in entries) or (
                self.spec.partial_updates and PATCH in df.columns
            ):
                # patch tables fold to SURVIVORS, not collapsed rows —
                # per-column provenance must outlive the rewrite (round 4)
                if PATCH in df.columns:
                    df = self._patch_survivors_df(df)
                else:
                    df = self._resolve_versions(df)
                if m0.get("write_path", "fused") == "raw":
                    from ..functions.normalize import normalize_payload

                    df = normalize_payload(df, self.spec)
            df = df.withColumn(BUCKET, self._bucket_expr(new_num_buckets))
            files = self._write_data(
                df, version, sid=m0["current_schema_id"], sort_cols=self.spec.key_cols
            )
            m["buckets"] = {str(b): fs for b, fs in files.items()}
        else:
            m["buckets"] = {}
        m["version"] = version
        m["parent_snapshot_id"] = m0["snapshot_id"]
        m["parent_version"] = m0["version"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["num_buckets"] = new_num_buckets
        m["summary"] = {"op": "rebucket", "from": old, "to": new_num_buckets}
        m["committed_at"] = time.time()
        self._commit(m, expected_ref=m0["version"])

    def replay_events(self, version: int | None = None) -> DataFrame:
        """The snapshot's full resolved INTERNAL state — live rows AND
        tombstones, each with its exact ``(_ts_applied, _lsn_applied)``
        dominance pair — as a replayable change-event frame: user columns
        + that pair + ``op`` ('D' for tombstones, else 'U').

        This is the change-feed GAP-RECOVERY source
        (plans/datasource.resume_from_gap): merging these events into any
        LWW consumer converges it to this snapshot EXACTLY-ONCE — every
        event carries its original dominance, so state the consumer
        already applied re-merges as a no-op (equal pairs never dominate)
        and later feed events still win. LWW/first-row tables only: the
        patch/agg engines' internal rows are column partials, not
        replayable whole-row events."""
        if self.spec.partial_updates or self.spec.agg_spec:
            raise ValueError(
                "replay_events serves row-image engines (LWW/first-row); "
                "patch/agg state is column partials — recover those via "
                "clone() or a fresh bootstrap"
            )
        m = self.manifest(version)
        entries = [e for fs in m["buckets"].values() for e in fs]
        schema = T.StructType.fromJson(m["schema"])
        user_cols = [f.name for f in schema.fields]
        df = self._read_files(entries, m)
        if df is None:
            return self.spark.createDataFrame(
                [], self._internal_schema(schema)
            ).select(
                *user_cols, TS_APPLIED, LSN_APPLIED, F.lit("U").alias("op")
            ).limit(0)
        if any(e.get("delta") for e in entries):
            df = self._resolve_versions(df)
        return df.select(
            *user_cols,
            F.col(TS_APPLIED),
            F.col(LSN_APPLIED),
            F.when(F.col(DELETED), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        )

    def table_changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Change feed between two committed snapshots (the CDC-out twin of
        the CDC-in apply path — Delta CDF / Iceberg changelog analog; the
        reference has no equivalent, its sink is terminal at index_ccdb.py).

        Returns one row per change with ``_change_type`` in
        {insert, delete, update_preimage, update_postimage} plus
        ``_from_version`` / ``_to_version`` stamps.

        Scale design: only buckets whose file lists DIFFER between the two
        manifests are read (an untouched bucket cannot contain a change), so
        the cost is O(touched buckets), not O(table). Inside touched buckets
        the two visible states full-outer join on the key; rows whose LWW
        markers ``(_ts_applied, _lsn_applied)`` are identical on both sides
        are unchanged carry-overs of the CoW rewrite and are dropped
        map-side. The pre/post image pair is emitted via one conditional
        array + explode — a single join pass, no second scan."""
        m2v = self.current_version() if to_version is None else to_version
        if from_version > m2v:
            raise ValueError(f"from_version {from_version} > to_version {m2v}")
        m1, m2 = self.manifest(from_version), self.manifest(m2v)
        touched = sorted(
            int(b)
            for b in set(m1["buckets"]) | set(m2["buckets"])
            if m1["buckets"].get(b) != m2["buckets"].get(b)
        )
        schema = T.StructType.fromJson(m2["schema"])
        user_cols = [f.name for f in schema.fields]
        keys = list(self.spec.key_cols)
        payload = [c for c in user_cols if c not in keys]
        ct = T.StructField("_change_type", T.StringType())
        out_schema = T.StructType(
            [ct]
            + [f for f in schema.fields]
            + [
                T.StructField("_from_version", T.LongType()),
                T.StructField("_to_version", T.LongType()),
            ]
        )
        if not touched:
            return self.spark.createDataFrame([], out_schema)
        s1 = self.read(version=from_version, include_internal=True, buckets=touched)
        s2 = self.read(version=m2v, include_internal=True, buckets=touched)
        # align the older state to the newer schema (column adds / widens
        # between the two versions must not break the diff)
        tgt = T.StructType(
            schema.fields
            + [
                T.StructField(TS_APPLIED, T.TimestampType()),
                T.StructField(LSN_APPLIED, T.LongType()),
            ]
        )
        # renames/drops committed between the two versions: rewrite the older
        # state's column names before aligning (same chain rule as
        # _read_files, scoped to events m1 hasn't seen)
        s1 = _apply_schema_events(s1, m2, after_sid=int(m1.get("current_schema_id", 0)))
        s1 = align_to_schema(s1, tgt).select(*user_cols, TS_APPLIED, LSN_APPLIED)
        s2 = s2.select(*user_cols, TS_APPLIED, LSN_APPLIED)
        a, b = s1.alias("a"), s2.alias("b")
        j = a.join(b, on=keys, how="full_outer")
        def img(side: str, tag: str):
            return F.struct(
                F.lit(tag).alias("_change_type"),
                *[F.col(f"{side}.{c}").alias(c) for c in payload],
            )
        marker = lambda s: F.struct(F.col(f"{s}.{TS_APPLIED}"), F.col(f"{s}.{LSN_APPLIED}"))  # noqa: E731
        absent_a = F.col(f"a.{LSN_APPLIED}").isNull() & F.col(f"a.{TS_APPLIED}").isNull()
        absent_b = F.col(f"b.{LSN_APPLIED}").isNull() & F.col(f"b.{TS_APPLIED}").isNull()
        arr = (
            F.when(absent_a, F.array(img("b", "insert")))
            .when(absent_b, F.array(img("a", "delete")))
            .when(
                marker("a") != marker("b"),
                F.array(img("a", "update_preimage"), img("b", "update_postimage")),
            )
        )  # otherwise -> NULL; explode drops null arrays (unchanged rows)
        ex = j.select(*keys, F.explode(arr).alias("_c"))
        return ex.select(
            F.col("_c._change_type").alias("_change_type"),
            *keys,
            *[F.col(f"_c.{c}").alias(c) for c in payload],
            F.lit(from_version).cast("long").alias("_from_version"),
            F.lit(m2v).cast("long").alias("_to_version"),
        ).select(*[f.name for f in out_schema.fields])

    def drop_expired_files(self, cutoff, _retries: int = 3) -> dict:
        """Metadata-only retention (Iceberg metadata-delete analog): remove
        whole data files whose EVERY row provably satisfies
        ``ts_col < cutoff`` — a manifest edit, zero data pages read or
        written. On a 10^10-row table with ts-clustered files (compaction
        with ``zorder_by=(ts,)`` + ``max_file_rows``) the bulk of a
        retention sweep becomes O(manifest) instead of a table-scale
        tombstone merge; ``plans/dml.py apply_retention_fast`` runs this
        first and tombstones only the straggler rows in partially-covered
        files.

        Eligibility per file (every check is conservative — fail = leave
        the file for the tombstone path):

        - its bucket holds NO delta layers (a base row under a delta could
          be the dominance floor a late event must beat; removing it
          silently would change resolve outcomes);
        - the entry is base, ``all_live`` (tombstone-free by footer stats),
          with recorded ``n_rows`` and ts stats, and ``ts_max < cutoff``;
        - a footer probe proves the ts column has ZERO nulls in every row
          group: parquet min/max ignore nulls, and a NULL-ts row is exempt
          from retention (apply_retention contract) so it must never ride
          a whole-file drop.

        Old manifests keep referencing dropped files, so time travel is
        intact and the bytes are reclaimed later by ``expire_snapshots`` +
        ``remove_orphans`` (same lifecycle as compaction's rewritten
        inputs). The change feed reports the drop as deletes for free:
        ``table_changes`` diffs buckets whose file lists differ across the
        boundary. Commit is the standard CAS; on conflict the (cheap)
        candidate scan simply reruns against the fresh manifest."""
        cutoff_us = _range_bound_us(cutoff)
        m0 = self.manifest()
        cand: list[tuple[str, dict]] = []
        for b, files in m0["buckets"].items():
            if any(e.get("delta") for e in files):
                continue
            for e in files:
                if (
                    e.get("all_live")
                    and e.get("n_rows") is not None
                    and e.get("ts_min") is not None
                    and e.get("ts_max") is not None
                    and e["ts_max"] < cutoff_us
                ):
                    cand.append((b, e))
        none = {"files_dropped": 0, "rows_dropped": 0, "version": m0["version"]}
        if not cand:
            return none
        pairs = [
            (i, os.path.join(self.root, e["path"])) for i, (_b, e) in enumerate(cand)
        ]
        ts_col = self.spec.ts_col
        if len(pairs) <= self._FOOTER_SCAN_DRIVER_MAX or "://" in pairs[0][1]:
            checks = _ts_nullfree(pairs, ts_col)
        else:
            sc = self.spark.sparkContext
            checks = (
                sc.parallelize(pairs, min(len(pairs), sc.defaultParallelism))
                .mapPartitions(lambda it: _ts_nullfree(it, ts_col))
                .collect()
            )
        okset = {tag for tag, ok in checks if ok}
        drop = [cand[i] for i in okset]
        if not drop:
            return none
        rows = sum(e["n_rows"] for _b, e in drop)
        dropped_paths = {e["path"] for _b, e in drop}
        buckets = {}
        for b, files in m0["buckets"].items():
            kept = [e for e in files if e["path"] not in dropped_paths]
            if kept:
                buckets[b] = kept
        m = dict(m0)
        m["version"] = self._alloc_version()
        m["parent_snapshot_id"] = m0["snapshot_id"]
        m["parent_version"] = m0["version"]
        m["snapshot_id"] = uuid.uuid4().hex
        m["buckets"] = buckets
        m["summary"] = {
            "op": "metadata_delete",
            "n_delete": rows,
            "files_dropped": len(drop),
            "cutoff_us": cutoff_us,
        }
        m["committed_at"] = time.time()
        try:
            self._commit(m, expected_ref=m0["version"])
        except CommitConflictError:
            if _retries <= 0:
                raise
            self._manifest = None
            return self.drop_expired_files(cutoff, _retries=_retries - 1)
        return {
            "files_dropped": len(drop),
            "rows_dropped": rows,
            "version": m["version"],
        }

    def expire_snapshots(self, retain_last: int = 2) -> dict:
        """Retention maintenance (Iceberg ``expire_snapshots`` analog):
        keep the newest ``retain_last`` snapshots reachable from each live
        ref (main + staging branches); expire every other manifest —
        including entire dropped-branch chains — and delete data files no
        retained manifest references.

        Files are reference-counted across ALL retained manifests before
        deletion — MoR base files written at version k stay live as long as
        any retained manifest still lists them, so time travel within the
        retention window is untouched. Returns reclaim stats."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        # reachability-based retention (Iceberg expire_snapshots): keep the
        # newest ``retain_last`` snapshots of EACH live ref's parent chain
        # (published main + every staging branch). Commits reachable from no
        # ref — dropped/aborted branches — expire regardless of age.
        idx = self._snapshot_index()
        by_version = {m["version"]: m for m in idx.values()}
        heads = {int(fsio.read_text(os.path.join(self.root, "HEAD")).strip())}
        heads.update(self.branches().values())
        kept_versions: set[int] = set()
        for head_v in heads:
            m = by_version.get(head_v)
            depth = 0
            while m is not None and depth < retain_last:
                kept_versions.add(m["version"])
                depth += 1
                m = idx.get(m["parent_snapshot_id"]) if m["parent_snapshot_id"] else None
        # tags pin EXACTLY their version (no ancestry): a tagged snapshot is
        # readable forever — reads need only its own manifest + the data
        # files it lists, both of which retention now refuses to reclaim
        kept_versions.update(v for v in self.tags().values() if v in by_version)
        kept_refs: set[str] = set()
        for v in sorted(kept_versions):
            m = by_version[v]
            for fs in m["buckets"].values():
                for e in fs:
                    kept_refs.add(e["path"])
        kept_dv: set[str] = set()
        for v in sorted(kept_versions):
            for fs in by_version[v]["buckets"].values():
                for e in fs:
                    if e.get("dv"):
                        kept_dv.add(e["dv"]["path"].replace(os.sep, "/"))
        min_keep = min(kept_versions)
        n_files = n_manifests = bytes_reclaimed = 0
        data_root = os.path.join(self.root, "data")
        prefix = self.root.rstrip("/") + "/"
        for full, size in fsio.walk_files(data_root):
            if not full.endswith(".parquet"):
                continue
            rel = full[len(prefix):] if full.startswith(prefix) else os.path.relpath(full, self.root)
            if rel not in kept_refs:
                bytes_reclaimed += size
                fsio.remove(full)
                n_files += 1
        # deletion-vector sidecars: superseded by re-deletes and shed by
        # compaction/CoW rewrites — reclaim every dv/ directory no retained
        # manifest references (they leaked forever before round 4)
        n_dv, dv_bytes = _reclaim_dv_dirs(self.root, kept_dv)
        n_files += n_dv
        bytes_reclaimed += dv_bytes
        # prune now-empty commit/bucket dirs (bottom-up; no-op on flat
        # object-store namespaces)
        fsio.remove_empty_dirs(data_root)
        for v in by_version:
            if v not in kept_versions:
                fsio.remove(self._manifest_path(v))
                n_manifests += 1
        return {
            "n_data_files_deleted": n_files,
            "n_manifests_deleted": n_manifests,
            "bytes_reclaimed": bytes_reclaimed,
            "min_retained_version": min_keep,
        }

    def remove_orphans(self) -> dict:
        """Delete data files referenced by NO manifest (crash debris from
        writes whose commit never happened — the rollback-by-omission design
        makes them invisible but they still hold bytes). DV sidecar
        directories referenced by no manifest (crashed delete_where_dv
        runs) are reclaimed the same way."""
        refs: set[str] = set()
        dv_refs: set[str] = set()
        mdir = os.path.join(self.root, "manifests")
        for fn in fsio.listdir(mdir):
            if fn.startswith("m-") and fn.endswith(".json"):
                m = json.loads(fsio.read_text(os.path.join(mdir, fn)))
                for fs in m["buckets"].values():
                    for e in fs:
                        refs.add(e["path"])
                        if e.get("dv"):
                            dv_refs.add(e["dv"]["path"].replace(os.sep, "/"))
        n_files = bytes_reclaimed = 0
        data_root = os.path.join(self.root, "data")
        prefix = self.root.rstrip("/") + "/"
        for full, size in fsio.walk_files(data_root):
            if not full.endswith(".parquet"):
                continue
            rel = full[len(prefix):] if full.startswith(prefix) else os.path.relpath(full, self.root)
            if rel not in refs:
                bytes_reclaimed += size
                fsio.remove(full)
                n_files += 1
        n_dv, dv_bytes = _reclaim_dv_dirs(self.root, dv_refs)
        n_files += n_dv
        bytes_reclaimed += dv_bytes
        fsio.remove_empty_dirs(data_root)
        return {"n_data_files_deleted": n_files, "bytes_reclaimed": bytes_reclaimed}

    def version_as_of(self, ts: float) -> int:
        """Version this ref pointed at, at wall-clock ``ts`` (epoch seconds) —
        TIMESTAMP AS OF time travel (Iceberg/Delta analog): the newest
        ancestor snapshot whose commit time is <= ts. Walks this ref's
        ancestry (metadata only), so snapshots on other branches or already
        expired don't confuse the answer."""
        best = None
        for m in self.history():
            if m["committed_at"] <= ts and (best is None or m["version"] > best):
                best = m["version"]
        if best is None:
            raise ValueError(
                f"no snapshot on ref {self.ref!r} committed at or before {ts}"
            )
        return best

    def read_as_of(self, ts: float, **kw) -> DataFrame:
        """``SELECT ... TIMESTAMP AS OF``: snapshot read at the version
        current as of wall-clock ``ts``. Accepts read()'s kwargs."""
        return self.read(version=self.version_as_of(ts), **kw)

    def changes_since(self, ts, to_version: int | None = None) -> DataFrame:
        """Timestamp-addressed incremental view (Hudi incremental-query /
        Delta CDF timestamp form): all changes committed strictly AFTER
        wall-clock ``ts`` (datetime or unix seconds), resolved to the last
        snapshot at-or-before ``ts`` on this ref's ancestry and delegated to
        ``table_changes``. Commits are wall-clock-stamped at manifest write
        (``committed_at``), so consumers can poll with a remembered
        timestamp instead of tracking version numbers. Naive datetimes are
        UTC (the engine-wide convention — same as read(time_range=...))."""
        if hasattr(ts, "timestamp"):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            ts = ts.timestamp()
        return self.table_changes(self.version_as_of(ts), to_version)

    def history(self) -> list[dict]:
        """This ref's committed snapshots (oldest first), following the
        parent-snapshot chain — version slots are global across refs, so
        slot N-1 may belong to another branch; ancestry is the truth."""
        idx = self._snapshot_index()
        out = []
        sid = self.manifest()["snapshot_id"]
        while sid is not None:
            m = idx.get(sid)
            if m is None:
                break  # older snapshots expired (expire_snapshots)
            out.append(m)
            sid = m["parent_snapshot_id"]
        return list(reversed(out))

    def clone_to(self, dst_root: str, version: int | None = None,
                 mode: str = "hardlink") -> "SnapshotParquetTable":
        """Export one snapshot as a brand-new single-snapshot table (Delta
        SHALLOW/DEEP CLONE analog; the reference's whole-index reindex copy,
        index_ccdb.py:150-178, without re-writing a row).

        ``mode="hardlink"`` is zero-copy: data files are immutable once
        committed (every write creates a new attempt-unique dir), so a
        hardlinked clone shares bytes safely — ``remove_orphans`` on either
        side only unlinks its own path, the inode lives while any clone
        references it. Use ``mode="copy"`` across filesystems.

        The clone keeps the source's ledger high-water marks
        (last_batch_id / last_lsn), so a CDC tail can RESUME against the
        clone from exactly where the snapshot was cut — the
        dev-fork-of-production workflow. History is not carried: the clone
        has one snapshot and its own future."""
        import shutil

        if mode not in ("hardlink", "copy"):
            raise ValueError(f"unknown clone mode: {mode!r}")
        remote = "://" in self.root or "://" in dst_root
        if remote and mode == "hardlink":
            raise ValueError(
                "hardlink clone requires local POSIX roots on both sides; "
                "use mode='copy' for scheme-routed filesystems"
            )
        src_m = self.manifest(version)
        if fsio.exists(fsio.join(dst_root, "HEAD")):
            raise ValueError(f"table already exists at {dst_root}")
        fsio.makedirs(dst_root)

        def xfer(src, dst):
            if remote:
                fsio.makedirs(dst.rsplit("/", 1)[0])
                fsio.write_atomic(dst, fsio.read_bytes(src))
            else:
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                (os.link if mode == "hardlink" else shutil.copy2)(src, dst)

        dv_dirs: set[str] = set()
        for fs in src_m["buckets"].values():
            for e in fs:
                xfer(
                    fsio.join(self.root, e["path"]),
                    fsio.join(dst_root, e["path"].replace(os.sep, "/")),
                )
                if e.get("dv"):
                    dv_dirs.add(e["dv"]["path"].replace(os.sep, "/"))
        # deletion-vector sidecars ride with the files that reference them —
        # without this a cloned table's DV'd reads referenced missing
        # sidecars (crash) or, post-repair, resurrected deleted rows
        prefix = self.root.rstrip("/") + "/"
        for d in sorted(dv_dirs):
            for full, _sz in fsio.walk_files(fsio.join(self.root, d)):
                rel = (
                    full[len(prefix):] if full.startswith(prefix)
                    else os.path.relpath(full, self.root)
                ).replace(os.sep, "/")
                xfer(full, fsio.join(dst_root, rel))
        m = json.loads(json.dumps(src_m))  # deep copy
        m["version"] = 0
        m["parent_snapshot_id"] = None
        m["parent_version"] = None
        m["snapshot_id"] = uuid.uuid4().hex
        m["summary"] = {
            "op": "clone",
            "source_root": self.root,
            "source_version": src_m["version"],
            "source_snapshot_id": src_m["snapshot_id"],
            "mode": mode,
        }
        m["committed_at"] = time.time()
        dst = SnapshotParquetTable(self.spark, dst_root, self.spec)
        dst._commit(m)
        return dst
