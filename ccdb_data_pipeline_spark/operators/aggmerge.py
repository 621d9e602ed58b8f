"""Aggregation merge engine — the table itself is the accumulator.

The Paimon ``merge-engine = aggregation`` / Hudi custom-payload analog the
reference's upsert pipeline cannot express: instead of last-writer-wins on
whole rows, each non-key column carries an aggregate function (``sum`` /
``min`` / ``max`` / ``last``) and every change event FOLDS INTO the stored
row — per-conversation token counters, per-user spend, per-doc view counts
maintained by the CDC stream itself, no separate rollup job. (Related but
distinct from plans/ivm.py: IVM maintains a DERIVED view of a normal table;
the aggregation engine makes the PRIMARY table row the running aggregate.)

Semantics (log order = LSN order, the apply order of the change stream):

- an ``I``/``U`` event CONTRIBUTES its non-null column values to the key's
  accumulators (``sum`` adds, ``min``/``max`` fold, ``last`` takes the
  latest non-null);
- a ``D`` event RESETS the key: contributions at or before the delete are
  discarded; the key is absent until a later event contributes again, at
  which point accumulation restarts from identity;
- a key whose log ends in an un-followed delete is deleted.

Scale shape: aggregation state is decomposable (every supported function is
a commutative/associative fold with a mergeable partial), so the engine
stores PARTIAL aggregates per (key, batch layer) and merges partials at
read/compaction time — the same partial-aggregate algebra Spark's own
HashAggregate uses, lifted to the storage layer. The only subtlety is the
delete-reset: a layer that contains a delete marks itself ``_agg_reset``,
and the merge discards every older layer for that key (its own partial
already excludes pre-delete events). That keeps the resolve two map-side-
combining aggregates + one key-local join — no windows, no per-row Python.

Reference semantics anchor: the reference pipeline re-upserts full documents
(complaints/ccdb/index_ccdb.py:150-178); aggregation-on-merge is a round-2
engine extension (SURVEY.md section 2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED = ("sum", "min", "max", "last")


def validate_agg_spec(agg_spec: dict[str, str]) -> None:
    bad = {c: f for c, f in agg_spec.items() if f not in SUPPORTED}
    if bad:
        raise ValueError(
            f"unsupported aggregate function(s) {bad}; supported: {SUPPORTED}"
        )


def merge_partial_exprs(
    agg_spec: dict[str, str], payload_cols: list[str], ord_col: str
) -> list[F.Column]:
    """Column expressions that MERGE per-key partial aggregates (one input
    row per layer/event) into the final value. Columns not named in
    ``agg_spec`` default to ``last`` (latest non-null), Paimon-style.
    ``ord_col`` orders ``last`` merges — the applied LSN, i.e. log order."""
    exprs = []
    for c in payload_cols:
        fn = agg_spec.get(c, "last")
        if fn == "sum":
            exprs.append(F.sum(F.col(c)).alias(c))
        elif fn == "min":
            exprs.append(F.min(F.col(c)).alias(c))
        elif fn == "max":
            exprs.append(F.max(F.col(c)).alias(c))
        else:  # last non-null in log order
            exprs.append(
                F.expr(
                    f"max_by(`{c}`, `{ord_col}`) FILTER (WHERE `{c}` IS NOT NULL)"
                ).alias(c)
            )
    return exprs


def resolve_aggregate(
    events: DataFrame,
    keys: list[str],
    lsn_col: str,
    agg_spec: dict[str, str],
    op_col: str = "op",
) -> DataFrame:
    """Fold a raw change-event stream into final aggregate rows — the
    standalone (batch) form of the engine, and the read-time resolve the
    lake table applies to its stored partials (a stored partial row is just
    a pre-folded run of events, so the same resolve is closed over both).

    Output: one row per LIVE key (keys, aggregated payload cols,
    ``last_lsn``, ``n_contrib``). Deleted keys (log ends in a delete) are
    absent.

    Plan: one filtered partial-agg for the per-key reset cutoff (only keys
    that ever saw a delete — typically a small fraction), joined back on the
    group key, then one map-side-combining aggregate. Both aggregates
    partial-combine before the shuffle; the join key equals the aggregation
    key so AQE shares/broadcasts the exchange.
    """
    validate_agg_spec(agg_spec)
    payload = [c for c in events.columns if c not in (*keys, lsn_col, op_col)]
    is_del = F.col(op_col) == "D"

    cuts = (
        events.filter(is_del)
        .groupBy(*keys)
        .agg(F.max(F.col(lsn_col)).alias("_cut"))
    )
    j = events.join(cuts, on=keys, how="left")
    kept = j.filter(
        F.col("_cut").isNull() | (F.col(lsn_col) > F.col("_cut"))
    ).filter(~is_del)

    aggs = merge_partial_exprs(agg_spec, payload, lsn_col)
    aggs += [
        F.max(F.col(lsn_col)).alias("last_lsn"),
        F.count(F.lit(1)).alias("n_contrib"),
    ]
    return kept.groupBy(*keys).agg(*aggs)
