"""apply_changes — the foreachBatch body (reference: update_index_with_data,
/root/reference/complaints/ccdb/index_ccdb.py:121-147, minus its sin of
swallowing bulk errors at :143-144 — here any failure aborts the batch and
the commit never happens, so replay is safe).

Pipeline per micro-batch:
  1. idempotence gate: batch_id <= table.last_batch_id -> skip (the ledger
     generalizes the reference's watermark read, es_proxy.py:26-38);
  2. malformed-key drop (index_ccdb.py:104 guard);
  3. payload normalization: ""->null with text carve-out (index_ccdb.py:32-36)
     + whitespace collapse via Arrow pandas UDF (s3_utils.py:144-145);
  4. LWW dedup to one winner per key (correctness-critical: MERGE requires a
     unique source key);
  5. bucket-scoped LWW MERGE + atomic snapshot commit with embedded lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_payload
from ..operators.dedupe import drop_malformed, lww_latest
from .lake import MergeStats, SnapshotParquetTable


def bootstrap_seed(table: SnapshotParquetTable, seed_df: DataFrame, normalize: bool = True) -> None:
    """Initial snapshot load with the same normalization policy as the change
    path (the reference normalizes every row it writes to the archive,
    s3_utils.py:139-148)."""
    if normalize:
        seed_df = normalize_payload(seed_df, table.spec)
    table.bootstrap(seed_df)


def _bad_key_pred(spec):
    bad = None
    for k in spec.key_cols:
        c = F.col(k).isNull()
        bad = c if bad is None else (bad | c)
    return bad


def quarantine_malformed(
    batch_df: DataFrame, spec, quarantine_dir: str, batch_id: int
) -> None:
    """Dead-letter sink: park the batch's malformed rows (null key parts)
    AND drop-action expectation violations (TableSpec.expectations) under
    ``<dir>/b-<batch_id>`` with the failing reason(s), instead of losing
    them to the drop filter. Idempotent (overwrite per batch dir) so a
    replayed batch rewrites, never duplicates, its quarantine shard. The
    reference silently skips these rows (index_ccdb.py:104); a production
    CDC tail needs them inspectable."""
    import os

    from .lake import _expectation_cols

    drops = [
        (name, viol)
        for name, action, viol in _expectation_cols(spec, F.col(spec.op_col))
        if action == "drop"
    ]
    pred = _bad_key_pred(spec)
    for _, viol in drops:
        pred = pred | viol
    reason = F.concat_ws(
        ",",
        *[
            F.when(F.col(k).isNull(), F.lit(f"null:{k}"))
            for k in spec.key_cols
        ],
        *[F.when(viol, F.lit(f"exp:{name}")) for name, viol in drops],
    )
    (
        batch_df.filter(pred)
        .withColumn("_reason", reason)
        .withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .parquet(os.path.join(quarantine_dir, f"b-{batch_id:010d}"))
    )


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """All dead-lettered rows across batches (glob over the batch dirs)."""
    return spark.read.parquet(f"{quarantine_dir}/b-*")


def requeue_quarantined(
    table: SnapshotParquetTable,
    quarantine_dir: str,
    repair,
    batch_id: int,
    normalize: bool = True,
) -> MergeStats:
    """Re-ingest dead-lettered rows after an upstream fix: read every
    quarantine shard, run the caller's ``repair`` transform (DataFrame ->
    DataFrame over the original change columns — fill keys from a sidecar,
    correct a mapping, etc.), apply the now-well-formed rows as a normal
    exactly-once batch, and rewrite the quarantine to hold only the rows
    repair could not fix.

    Semantics:
    - Requeued rows get FRESH LSNs above ``table.last_lsn`` (their original
      LSNs were consumed when the batch that dead-lettered them committed),
      ordered by original (_batch_id, lsn) so intra-quarantine order is
      preserved. LWW still applies: a requeued row only wins a key if its
      (ts, new_lsn) dominates.
    - Idempotent by ``batch_id``: a crash between the merge and the
      quarantine rewrite replays as a skipped merge + a redone rewrite
      (repair must be deterministic for the rewrite to converge).
    """
    import glob as _glob
    import os
    import shutil

    spark = table.spark
    shards = sorted(_glob.glob(os.path.join(quarantine_dir, "b-*")))
    if not shards:
        return table._commit_empty(batch_id) if batch_id > table.last_batch_id else MergeStats(
            batch_id=batch_id, skipped=True, version=table.manifest()["version"]
        )
    q = read_quarantine(spark, quarantine_dir)
    meta_cols = ["_reason", "_batch_id"]
    fixed = repair(q.drop(*meta_cols))
    bad = _bad_key_pred(table.spec)
    still_bad = fixed.filter(bad)
    good = fixed.filter(~bad)

    from ..operators.index import release_caches, with_global_index

    lsn_col = table.spec.lsn_col
    # mint above BOTH the applied high-water mark and the quarantined rows'
    # original (source-issued, never-applied) LSNs, so requeued LSNs never
    # collide with either space — a gap/overlap audit against the source
    # stream stays unambiguous. The gap-free ordinal comes from the
    # two-pass range-partitioned indexer, not ROW_NUMBER over an
    # unpartitioned window — that form funnels the whole requeue batch
    # through one task, which matters when a poisoned upstream quarantines
    # millions of rows, not dozens.
    qmax = fixed.agg(F.max(F.col(lsn_col))).first()[0]
    base = max(table.last_lsn, int(qmax) if qmax is not None else -1)
    good = (
        with_global_index(good, order_by=[lsn_col], index_col="_rq_idx")
        .withColumn(lsn_col, (F.lit(base) + F.col("_rq_idx")).cast("long"))
        .drop("_rq_idx")
    )
    stats = apply_changes(table, good, batch_id, normalize=normalize,
                          count_malformed=False)
    release_caches()

    # consolidate the un-repairable remainder into one FRESH shard (never a
    # dir this job is lazily reading), deduped by source LSN so a
    # crash-between-write-and-cleanup replay converges instead of
    # multiplying remainder rows; then drop the consumed shards
    import uuid as _uuid

    keep = still_bad.dropDuplicates([lsn_col]).withColumn(
        "_reason",
        F.concat_ws(",", *[F.when(F.col(k).isNull(), F.lit(f"null:{k}"))
                           for k in table.spec.key_cols]),
    ).withColumn("_batch_id", F.lit(batch_id))
    rest_dir = os.path.join(
        quarantine_dir, f"b-{batch_id:010d}-rest-{_uuid.uuid4().hex[:8]}"
    )
    keep.write.mode("overwrite").parquet(rest_dir)
    for s in shards:
        shutil.rmtree(s, ignore_errors=True)
    return stats


def apply_changes(
    table: SnapshotParquetTable,
    batch_df: DataFrame,
    batch_id: int,
    normalize: bool = True,
    count_malformed: bool = True,
    quarantine_dir: str | None = None,
    internal: bool = False,
) -> MergeStats:
    spec = table.spec
    # internal = engine-originated maintenance/DML write: gates against and
    # advances last_dml_batch_id, NOT the stream epoch sequence (see
    # SnapshotParquetTable.merge docstring — a DML at last_batch_id + 1
    # would collide with the stream's next checkpointed epoch and the
    # replay gate would silently drop that micro-batch)
    gate = table.last_dml_batch_id if internal else table.last_batch_id
    if batch_id <= gate:
        return MergeStats(batch_id=batch_id, skipped=True, version=table.manifest()["version"])
    raw_df = batch_df

    if table.mode == "mor":
        # fused single-shuffle apply: malformed counting+dropping, dedup and
        # normalization all happen inside the ONE write job (the observe node
        # sits before the bad-key filter — see merge_events docstring); no
        # separate pre-pass over the batch
        stats = table.merge_events(batch_df, batch_id, normalize=normalize,
                                   internal=internal)
    else:
        obs = None
        if count_malformed:
            # ride the malformed count on merge()'s own stats job via an
            # observe node attached BEFORE the filter — no extra pass
            from pyspark.sql import Observation

            bad = _bad_key_pred(spec)
            obs = Observation(f"malformed-{batch_id}")
            batch_df = batch_df.observe(
                obs, F.sum(F.when(bad, 1).otherwise(0)).alias("n_malformed")
            )
        df = drop_malformed(batch_df, spec)
        deduped = lww_latest(df, spec)
        # normalize AFTER dedup: winners only (payload-independent LWW makes
        # the reorder semantics-preserving) — at a 70%-update event mix this
        # cuts the Arrow UDF work ~3x, and it runs post-shuffle at full
        # parallelism even when the batch arrives as a few fat segment files
        if normalize:
            deduped = normalize_payload(deduped, spec)
        # lazily evaluated after merge()'s stats job has run the plan (and
        # therefore populated the observation) but before the manifest commit
        extra = None
        if obs is not None:
            got: dict = {}

            def extra():
                try:
                    got["n_malformed"] = int(obs.get["n_malformed"] or 0)
                except Exception:
                    # when EVERY row is malformed the stats job can collapse
                    # to an empty relation (AQE empty propagation) without
                    # ever firing the observe node — count directly; this
                    # extra pass happens only on the pathological all-bad
                    # batch, never on the hot path
                    got["n_malformed"] = raw_df.where(_bad_key_pred(spec)).count()
                return dict(got)

        stats = table.merge(deduped, batch_id, summary_extra=extra,
                            internal=internal)
        if obs is not None and not stats.skipped:
            if "n_malformed" not in got:
                extra()
            stats.n_malformed = got["n_malformed"]
    # dead-letter the malformed rows AFTER the commit decided the batch is
    # fresh; the write runs only when the (already-computed) count is
    # non-zero, so the common clean batch pays nothing
    _drop_exps = {n for n, _p, a in spec.expectations if a == "drop"}
    n_exp_dropped = sum(
        c for n, c in (stats.expectations or {}).items() if n in _drop_exps
    )
    if (
        quarantine_dir is not None
        and not stats.skipped
        and (stats.n_malformed > 0 or n_exp_dropped > 0)
    ):
        quarantine_malformed(raw_df, spec, quarantine_dir, batch_id)
    # merge-on-read maintenance: fold delta layers periodically so read
    # amplification stays bounded (tombstones retained — reclaiming them is
    # an explicit, lateness-horizon-aware compact(drop_tombstones=True))
    if (
        spec.compact_every
        and table.mode == "mor"
        and not stats.skipped
        and (batch_id + 1) % spec.compact_every == 0
    ):
        table.compact(drop_tombstones=False)
    return stats
