"""Partial-update (column-level patch) resolve — the 'partial-update merge
engine' of Hudi/Paimon, for CDC upstreams that emit patch events carrying
only the columns that changed (Debezium with incomplete row images).

Event ops: 'I'/'U' full row images, 'D' delete, 'P' patch (NULL payload
column = "don't touch", non-NULL = "set"). Resolution per key:

- existence is decided ONLY by full-image ops: the latest non-patch op
  must exist and not be 'D' (a patch can never create or resurrect a row);
- each payload column independently takes its value from the latest event
  that WRITES it — full images write every column, patches write exactly
  their non-NULL columns. A patch older than the latest full image is
  dead by construction (the full image rewrote the row).

The whole resolve is ONE groupBy aggregate of `max_by(col, version) FILTER
(WHERE writes-col)` expressions — map-side combining, no window sort, the
same skew-tolerant shape as the LWW dedup (operators/dedupe.py). Caveat
(shared with Paimon's partial-update engine): a FULL image that explicitly
sets a column to NULL is indistinguishable from "unchanged" to any later
patch-resolve over that column; upstreams that need set-to-NULL patch
semantics must send a sentinel or a full image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


LONG_MIN_SQL = "CAST(-9223372036854775808 AS BIGINT)"


def seq_group_aggs(
    sequence_groups: dict, ver_col: str, op_col: str = "op", patch_pred: str | None = None
) -> list:
    """Aggregate expressions for sequence-group columns (shared by the
    standalone resolve below and the lake table's read-side resolve).

    A *sequence group* (Paimon ``fields.<seq>.sequence-group`` analog) is a
    set of payload columns versioned by their OWN integer sequence column
    instead of the row's global order — the multi-writer partial-update
    shape: upstream A owns columns g1 and stamps ``a_seq``, upstream B owns
    g2 and stamps ``b_seq``; arrival order (LSN) must not let A's late
    replay clobber B's newer values or vice versa.

    Semantics (deliberately NOT Paimon's gate-on-stored-seq, which makes
    the result depend on batch boundaries for out-of-order arrivals):

    - an event WRITES group g iff it is a full image, or a patch whose seq
      column is non-NULL (a patch with a NULL seq never touches the group,
      Paimon's null-sequence rule);
    - the group updates ATOMICALLY: seq col + every member column are taken
      together from the single group-writer with the greatest
      ``(coalesce(seq, LONG_MIN), version)`` — so a group value pair can
      never be stitched from two different writers, and the stored seq is
      exactly the winning writer's stamp;
    - the argmax is associative/commutative: the resolved table is a pure
      function of the event set, identical under any batching or replay
      order (pytest-pinned in test_sequence_groups.py).

    ``patch_pred`` overrides the "is a patch" SQL predicate (the lake's
    internal rows carry a boolean ``_patch`` instead of an op code).
    """
    is_patch = patch_pred if patch_pred is not None else f"({op_col} = 'P')"
    aggs = []
    for s, members in sequence_groups.items():
        ord_g = f"struct(coalesce(`{s}`, {LONG_MIN_SQL}), `{ver_col}`)"
        writes_g = f"(NOT {is_patch} OR `{s}` IS NOT NULL)"
        for c in (s, *members):
            aggs.append(
                F.expr(f"max_by(`{c}`, {ord_g}) FILTER (WHERE {writes_g})").alias(c)
            )
    return aggs


def resolve_with_patches(
    df: DataFrame,
    key_cols: list[str],
    ver_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    sequence_groups: dict | None = None,
) -> DataFrame:
    """One live row per key from a mixed full/patch/delete change stream.

    ``ver_col`` must be a monotonic, per-key-unique version (the LSN).
    Output: key columns, resolved payload columns, ``last_full_op``,
    ``last_lsn`` (max version over ALL events for the key, patches
    included — the watermark a resumed reader needs).

    ``sequence_groups`` (optional, ``{seq_col: (member, ...)}``) switches
    the listed columns to per-group atomic versioning by their own seq
    column — see :func:`seq_group_aggs` for the exact rules. Seq columns
    and members must all be in ``payload_cols`` and pairwise disjoint.
    """
    grouped: set[str] = set()
    if sequence_groups:
        for s, members in sequence_groups.items():
            cols = (s, *members)
            bad = [c for c in cols if c not in payload_cols]
            if bad:
                raise ValueError(f"sequence group columns not in payload: {bad}")
            dup = grouped.intersection(cols)
            if dup:
                raise ValueError(f"sequence groups overlap on: {sorted(dup)}")
            grouped.update(cols)
    aggs = [
        F.expr(
            f"max_by({op_col}, {ver_col}) FILTER (WHERE {op_col} <> 'P')"
        ).alias("last_full_op"),
        F.max(ver_col).alias("last_lsn"),
    ]
    for c in payload_cols:
        if c in grouped:
            continue
        aggs.append(
            F.expr(
                f"max_by({c}, {ver_col}) "
                f"FILTER (WHERE {op_col} <> 'P' OR {c} IS NOT NULL)"
            ).alias(c)
        )
    if sequence_groups:
        aggs.extend(seq_group_aggs(sequence_groups, ver_col, op_col))
    out = df.groupBy(*key_cols).agg(*aggs)
    return out.filter(
        F.col("last_full_op").isNotNull() & (F.col("last_full_op") != "D")
    ).select(*key_cols, *payload_cols, "last_full_op", "last_lsn")
