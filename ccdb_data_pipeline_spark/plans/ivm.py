"""Incremental view maintenance over the lake table's change feed.

A downstream consumer (dashboard, feature store, training-data stats) that
wants ``SELECT group, count(*), sum(x) ... GROUP BY group`` over a
10^10-row table cannot afford a rescan per refresh. This maintains the
aggregate INCREMENTALLY from ``table_changes``: each refresh reads only
the changes between the last-applied snapshot and the current one, turns
them into signed per-group deltas (+1 insert / +post, -1 delete / -pre),
and folds them into the stored aggregate state with one small join.

Cost per refresh: O(changed rows) + O(|groups|) — never O(table). The
signed pre/post-image algebra makes group migrations (an update that moves
a row between groups) correct for free: the preimage decrements the old
group, the postimage increments the new one.

Crash safety mirrors the lake's commit design: a refresh writes the new
state under a version directory, then atomically swaps a MARKER file
recording which table snapshot the state reflects. A crashed refresh
leaves the marker (and therefore the visible state) at the previous
snapshot; re-running refresh() replays the same change window
idempotently (the orphaned state dir is overwritten).

The reference has no equivalent — its sink is terminal; aggregate views
over the CCDB index are recomputed by Elasticsearch per query.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import SnapshotParquetTable, _atomic_write

def _sign() -> F.Column:
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


class IncrementalAggView:
    """A persistent ``GROUP BY`` aggregate of a :class:`SnapshotParquetTable`,
    maintained from the change feed.

    ``sum_exprs`` maps output column names to SQL expressions evaluated per
    changed row (e.g. ``{"n_chars": "length(text)"}``). A ``n_rows`` count
    column is always maintained. Groups whose count reaches zero drop out
    of the view (a fully-deleted conversation disappears, matching the
    batch ``GROUP BY`` it shadows).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: Sequence[str],
        sum_exprs: Mapping[str, str] | None = None,
        explode_cols: Mapping[str, str] | None = None,
        row_filter: str | None = None,
    ):
        """``explode_cols`` maps derived group columns to SQL ARRAY
        expressions evaluated per changed row and exploded BEFORE grouping —
        one changed row contributes one signed delta per array element. With
        ``{"token": "split(lower(text), '[^a-z0-9]+')"}`` this view IS an
        incrementally-maintained inverted index: an update's preimage
        retracts the old text's tokens, its postimage adds the new ones
        (the reference's core loop — keep a text index fresh from delta
        pulls, index_ccdb.py:121-147 — without ever rescanning the corpus).
        ``row_filter`` is a SQL predicate applied after the explode (e.g.
        ``"token <> ''"``)."""
        self.spark = spark
        self.root = root
        self.group_cols = list(group_cols)
        self.sum_exprs = dict(sum_exprs or {})
        self.explode_cols = dict(explode_cols or {})
        self.row_filter = row_filter

    # ------------------------------------------------------------ state IO

    @property
    def _marker_path(self) -> str:
        return os.path.join(self.root, "MARKER")

    def applied_version(self) -> int:
        """Table snapshot version the visible state reflects (-1 = empty)."""
        if not os.path.exists(self._marker_path):
            return -1
        with open(self._marker_path) as f:
            return int(json.load(f)["table_version"])

    def _state_dir(self) -> str | None:
        if not os.path.exists(self._marker_path):
            return None
        with open(self._marker_path) as f:
            return os.path.join(self.root, json.load(f)["state"])

    def read(self) -> DataFrame:
        """The maintained aggregate as of the last refresh."""
        d = self._state_dir()
        if d is None:
            return self.spark.createDataFrame([], self._schema())
        return self.spark.read.parquet(d)

    def _schema(self):
        from pyspark.sql import types as T

        fields = [T.StructField(c, T.StringType()) for c in self.group_cols]
        fields.append(T.StructField("n_rows", T.LongType()))
        fields += [T.StructField(n, T.LongType()) for n in self.sum_exprs]
        return T.StructType(fields)

    # ------------------------------------------------------------ refresh

    def refresh(self, table: SnapshotParquetTable) -> dict:
        """Fold all changes since the last refresh into the view. Returns
        stats. A call with nothing new to apply is a no-op."""
        target = table.current_version()
        applied = self.applied_version()
        if applied >= target:
            return {"applied_from": applied, "applied_to": applied, "n_changes": 0}

        if applied < 0:
            # first build: one full aggregate of the CURRENT snapshot —
            # the only table-sized scan this view ever performs
            base = table.read(version=target)
            new_state = self._aggregate(base, signed=False)
            n_changes = -1
        else:
            feed = table.table_changes(applied, target)
            deltas = self._aggregate(feed, signed=True)
            old = self.read()
            merged = old.unionByName(deltas).groupBy(*self.group_cols).agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(n).alias(n) for n in self.sum_exprs],
            )
            new_state = merged.filter(F.col("n_rows") > 0)
            n_changes = feed.count()

        rel = f"state-{target:010d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, rel)
        new_state.write.mode("overwrite").parquet(out)
        old_dir = self._state_dir()
        _atomic_write(
            self._marker_path, json.dumps({"table_version": target, "state": rel})
        )
        if old_dir and os.path.isdir(old_dir):
            shutil.rmtree(old_dir, ignore_errors=True)
        return {"applied_from": applied, "applied_to": target, "n_changes": n_changes}

    def _aggregate(self, df: DataFrame, signed: bool) -> DataFrame:
        w = _sign() if signed else F.lit(1)
        for name, expr in self.explode_cols.items():
            df = df.withColumn(name, F.explode(F.expr(expr)))
        if self.row_filter:
            df = df.filter(self.row_filter)
        sums = [
            F.sum(w * F.expr(expr).cast("long")).alias(name)
            for name, expr in self.sum_exprs.items()
        ]
        return df.groupBy(*self.group_cols).agg(
            F.sum(w).cast("long").alias("n_rows"), *sums
        )
