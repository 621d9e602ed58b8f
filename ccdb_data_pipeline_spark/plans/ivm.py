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


class IncrementalJoinView:
    """A materialized equi-join of two lake tables — ``fact ⋈ dim`` on
    ``on`` (fact_col → dim_col) — maintained incrementally from BOTH
    tables' change feeds.

    The delta-join algebra (DBSP / Materialize's bilinear rule): with
    ``A₁ = A₀ + ΔA`` and ``B₁ = B₀ + ΔB``,

        ``A₁⋈B₁ = A₀⋈B₀ + ΔA⋈B₁ + A₀⋈ΔB``

    so one refresh folds exactly two delta joins into the stored state —
    never a full re-join. Pre/post images from ``table_changes`` carry the
    signs (+1 insert/postimage, -1 delete/preimage); consolidation is a
    groupBy over the full output row with ``SUM(sign)``, keeping net-count
    > 0. Group migrations, payload updates on either side, and deletes all
    fall out of the signed algebra with no special cases — including a fact
    row AND its dim row changing in the same window (the cross term
    ``ΔA⋈ΔB`` is absorbed by joining ΔA against B at its NEW version).

    Scale shape per refresh: O(ΔA · dim-lookup) + O(ΔB · fact-lookup) +
    O(|state ∩ touched|) — never O(fact table). When a join column is the
    other table's bucket column the lookup side is served by ``read_keys``
    (bucket-pruned point reads: k changed keys touch k buckets of a
    10^10-row table); otherwise the delta side broadcasts into a pruned
    scan. Only INNER equi-joins with a unique dim key are supported — the
    FK-enrichment shape (transcript turns ⋈ conversation metadata) that
    dominates real pipelines.

    Crash safety mirrors :class:`IncrementalAggView`: state dirs are
    written first, then a MARKER file recording BOTH applied table
    versions swaps atomically; a crashed refresh replays idempotently.

    The reference has no equivalent — its join-shaped enrichment is done
    per-request in Elasticsearch; here the joined view stays fresh from
    the CDC feed at O(changes) cost.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        on: Mapping[str, str] | Sequence[str],
        max_lookup: int = 5000,
    ):
        self.spark = spark
        self.root = root
        self.on = dict(on) if isinstance(on, Mapping) else {c: c for c in on}
        self.max_lookup = int(max_lookup)

    # ------------------------------------------------------------ state IO

    @property
    def _marker_path(self) -> str:
        return os.path.join(self.root, "MARKER")

    def applied_versions(self) -> tuple[int, int]:
        """(fact_version, dim_version) the visible state reflects; (-1, -1)
        before the first refresh."""
        if not os.path.exists(self._marker_path):
            return (-1, -1)
        with open(self._marker_path) as f:
            m = json.load(f)
        return (int(m["fact_version"]), int(m["dim_version"]))

    def _state_dir(self) -> str | None:
        if not os.path.exists(self._marker_path):
            return None
        with open(self._marker_path) as f:
            return os.path.join(self.root, json.load(f)["state"])

    def read(self, with_multiplicity: bool = False) -> DataFrame:
        """The maintained join as of the last refresh."""
        d = self._state_dir()
        if d is None:
            raise ValueError("view has no state yet; call refresh() first")
        df = self.spark.read.parquet(d)
        return df if with_multiplicity else df.drop("_n")

    # ------------------------------------------------------------ refresh

    def _out_cols(self, fact, dim) -> tuple[list[str], list[str]]:
        fact_cols = [f.name for f in fact.schema.fields]
        dim_cols = [f.name for f in dim.schema.fields]
        dim_out = [c for c in dim_cols if c not in self.on.values()]
        clash = sorted(set(fact_cols) & set(dim_out))
        if clash:
            raise ValueError(
                f"dim payload columns {clash} collide with fact columns; "
                "rename them on the dim table first"
            )
        missing = sorted(set(self.on) - set(fact_cols))
        if missing:
            raise ValueError(f"join columns {missing} not in fact schema")
        return fact_cols, dim_out

    def _dim_side(self, dim, version: int, key_vals: list | None) -> DataFrame:
        """dim state at ``version`` with join cols renamed to fact names,
        bucket-pruned to ``key_vals`` when the join key is dim's bucket col."""
        jcols = list(self.on.items())
        if (
            key_vals is not None
            and len(jcols) == 1
            and jcols[0][1] == dim.spec.bucket_col
            and len(key_vals) <= self.max_lookup
        ):
            d = dim.read_keys(key_vals, version=version)
        else:
            d = dim.read(version=version)
        return d.select(
            *[F.col(dc).alias(fc) for fc, dc in jcols],
            *[c for c in d.columns if c not in self.on.values()],
        )

    def _fact_side(self, fact, version: int, key_vals: list | None) -> DataFrame:
        jcols = list(self.on.keys())
        if (
            key_vals is not None
            and len(jcols) == 1
            and jcols[0] == fact.spec.bucket_col
            and len(key_vals) <= self.max_lookup
        ):
            return fact.read_keys(key_vals, version=version)
        return fact.read(version=version)

    def _collect_keys(self, df: DataFrame, col: str) -> list | None:
        """Distinct join-key values of a delta frame, for bucket pruning;
        None when the delta is too wide to prune (fall back to a scan)."""
        rows = df.select(col).distinct().limit(self.max_lookup + 1).collect()
        if len(rows) > self.max_lookup:
            return None
        return [r[0] for r in rows if r[0] is not None]

    def refresh(self, fact, dim) -> dict:
        """Fold all changes on either table since the last refresh."""
        vf, vd = fact.current_version(), dim.current_version()
        af, ad = self.applied_versions()
        if (af, ad) == (vf, vd):
            return {"fact_version": vf, "dim_version": vd, "n_changes": 0}

        fact_cols, dim_out = self._out_cols(fact, dim)
        out_cols = fact_cols + dim_out
        fkeys = list(self.on.keys())

        if af < 0:
            # first build: the only full-join this view ever performs
            new_state = (
                fact.read(version=vf)
                .join(self._dim_side(dim, vd, None), on=fkeys, how="inner")
                .select(*out_cols)
                .withColumn("_n", F.lit(1).cast("long"))
            )
            n_changes = -1
        else:
            da = fact.table_changes(af, vf)
            db = dim.table_changes(ad, vd)
            fact_jcol = fkeys[0]
            # ΔA ⋈ B₁ : signed fact deltas against the dim's NEW state
            part1 = (
                da.withColumn("_n", _sign().cast("long"))
                .select(*fact_cols, "_n")
                .join(
                    self._dim_side(dim, vd, self._collect_keys(da, fact_jcol)),
                    on=fkeys,
                    how="inner",
                )
                .select(*out_cols, "_n")
            )
            # A₀ ⋈ ΔB : signed dim deltas against the fact's OLD state
            db_signed = db.withColumn("_n", _sign().cast("long")).select(
                *[F.col(dc).alias(fc) for fc, dc in self.on.items()],
                *dim_out,
                "_n",
            )
            part2 = (
                self._fact_side(fact, af, self._collect_keys(db_signed, fact_jcol))
                .join(db_signed, on=fkeys, how="inner")
                .select(*out_cols, "_n")
            )
            old = self.read(with_multiplicity=True)
            new_state = (
                old.unionByName(part1)
                .unionByName(part2)
                .groupBy(*out_cols)
                .agg(F.sum("_n").cast("long").alias("_n"))
                .filter(F.col("_n") > 0)
            )
            n_changes = da.count() + db.count()

        rel = f"state-{vf:010d}-{vd:010d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, rel)
        new_state.write.mode("overwrite").parquet(out)
        old_dir = self._state_dir()
        _atomic_write(
            self._marker_path,
            json.dumps({"fact_version": vf, "dim_version": vd, "state": rel}),
        )
        if old_dir and os.path.isdir(old_dir):
            shutil.rmtree(old_dir, ignore_errors=True)
        return {"fact_version": vf, "dim_version": vd, "n_changes": n_changes}


def render_docs(
    df: DataFrame,
    group_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    segment_sql: str = "concat(coalesce(role, ''), ': ', coalesce(text, ''))",
    sep: str = "\n",
) -> DataFrame:
    """Render one document per group from its rows in stable order:
    groupBy -> collect_list(struct(order, segment)) -> array_sort ->
    transform -> array_join. ONE map-side-combining agg; the per-group
    sort happens after collection (no window, no second shuffle). Used by
    IncrementalDocView per refresh and by the CLI export path for a
    one-shot full render."""
    seg = F.expr(segment_sql)
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, seg.alias("_seg")))
    )
    return df.groupBy(group_col).agg(
        F.array_join(F.transform(ordered, lambda s: s["_seg"]), sep).alias("doc"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
    )


class IncrementalDocView:
    """One rendered DOCUMENT per group (a conversation's turns concatenated
    in order), maintained from the change feed by re-rendering ONLY the
    changed groups — with the state stored AS A LAKE TABLE, so state I/O
    is O(changed docs) too.

    The signed-delta algebra of :class:`IncrementalAggView` cannot maintain
    an order-sensitive concatenation — a turn edited in the middle of a
    conversation is not a commutative group delta. But the group is the
    natural re-render unit: each refresh collects the conv_ids touched by
    the change window, point-reads exactly those conversations from the
    source (``read_keys`` — bucket-pruned, O(changed convs) never
    O(table)), renders them fresh, and MERGES them into the derived lake
    table: re-rendered docs as upserts, conversations whose turns all
    disappeared as tombstones. Because the state is a MoR lake table, a
    refresh writes delta files proportional to the change set — not a full
    state rewrite, the property that keeps a 10^10-conversation view
    maintainable — and inherits compaction, time travel, and the
    exactly-once batch ledger (batch_id = source snapshot version, so a
    crashed refresh replays as a no-op).

    This is the reference's CDC→document-store loop (delta pull →
    re-index changed complaints, index_ccdb.py:121-147) generalized to
    multi-row documents: the ES doc was one source row; a conversation
    document is ALL its turns in stable order — exactly the
    transcript-to-training-text step run incrementally.

    ``segment_sql`` renders one turn (SQL expression over the table's
    columns); ``order_cols`` give the stable within-group order (struct
    compare = lexicographic, ties broken by later order cols). A change
    window wider than ``max_lookup`` distinct groups falls back to a full
    re-render + full key diff (the IN-list would stop pruning anyway).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_col: str = "conv_id",
        order_cols: Sequence[str] = ("turn_idx",),
        segment_sql: str = "concat(coalesce(role, ''), ': ', coalesce(text, ''))",
        sep: str = "\n",
        max_lookup: int = 10_000,
        num_buckets: int = 16,
    ):
        from ..schemas import TableSpec

        self.spark = spark
        self.root = root
        self.group_col = group_col
        self.order_cols = list(order_cols)
        self.segment_sql = segment_sql
        self.sep = sep
        self.max_lookup = max_lookup
        self.table = SnapshotParquetTable(
            spark,
            os.path.join(root, "table"),
            TableSpec(
                key_cols=(group_col,),
                bucket_col=group_col,
                ts_col="_dv_ts",
                lsn_col="_dv_lsn",
                op_col="op",
                num_buckets=num_buckets,
                merge_mode="mor",
                empty_to_null_exempt=(),
                normalize_ws_cols=(),
            ),
        )

    # ------------------------------------------------------------ state IO

    def applied_version(self) -> int:
        """Source snapshot version the view reflects (-1 = not built)."""
        if not self.table.exists():
            return -1
        return self.table.last_batch_id

    def read(self) -> DataFrame:
        """The rendered documents as of the last refresh:
        (group, doc, n_turns)."""
        if not self.table.exists():
            from pyspark.sql import types as T

            return self.spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(self.group_col, T.StringType()),
                        T.StructField("doc", T.StringType()),
                        T.StructField("n_turns", T.LongType()),
                    ]
                ),
            )
        return self.table.read(columns=[self.group_col, "doc", "n_turns"])

    # ------------------------------------------------------------- render

    def _render(self, df: DataFrame) -> DataFrame:
        return render_docs(df, self.group_col, self.order_cols,
                           self.segment_sql, self.sep)

    def _stamp(self, rendered: DataFrame, version: int, op: str) -> DataFrame:
        return rendered.select(
            self.group_col,
            "doc",
            "n_turns",
            F.lit(None).cast("timestamp").alias("_dv_ts"),
            F.lit(version).cast("long").alias("_dv_lsn"),
            F.lit(op).alias("op"),
        )

    def _tombstones(self, keys_df: DataFrame, version: int) -> DataFrame:
        return keys_df.select(
            self.group_col,
            F.lit(None).cast("string").alias("doc"),
            F.lit(None).cast("long").alias("n_turns"),
            F.lit(None).cast("timestamp").alias("_dv_ts"),
            F.lit(version).cast("long").alias("_dv_lsn"),
            F.lit("D").alias("op"),
        )

    # ------------------------------------------------------------ refresh

    def refresh(self, table: SnapshotParquetTable) -> dict:
        target = table.current_version()
        applied = self.applied_version()
        if applied >= target:
            return {"applied_from": applied, "applied_to": applied, "n_changes": 0}

        if applied < 0:
            # first build: the only table-sized render this view performs
            batch = self._stamp(self._render(table.read(version=target)), target, "U")
            self.table.create(batch.drop("op", "_dv_lsn").schema)
            self.table.merge(batch, batch_id=target)
            return {"applied_from": -1, "applied_to": target, "n_changes": -1}

        feed = table.table_changes(applied, target)
        rows = (
            feed.select(self.group_col)
            .distinct()
            .limit(self.max_lookup + 1)
            .collect()
        )
        n_changes = feed.count()
        if len(rows) > self.max_lookup:
            # wide window: full re-render; tombstone docs that vanished
            fresh = self._render(table.read(version=target))
            gone = self.read().select(self.group_col).join(
                fresh.select(self.group_col), self.group_col, "left_anti"
            )
        else:
            keys = [r[0] for r in rows if r[0] is not None]
            if not keys:
                # changes touched no renderable group (all-null keys):
                # an empty merge still advances the batch ledger
                fresh = self._render(table.read(version=target).limit(0))
                gone = fresh.select(self.group_col)
            else:
                fresh = self._render(table.read_keys(keys, version=target))
                keys_df = self.spark.createDataFrame(
                    [(k,) for k in keys], [self.group_col]
                )
                gone = keys_df.join(
                    fresh.select(self.group_col), self.group_col, "left_anti"
                )
        batch = self._stamp(fresh, target, "U").unionByName(
            self._tombstones(gone, target)
        )
        self.table.merge(batch, batch_id=target)
        return {
            "applied_from": applied,
            "applied_to": target,
            "n_changes": n_changes,
        }
