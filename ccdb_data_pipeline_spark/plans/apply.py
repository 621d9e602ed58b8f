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
    under ``<dir>/b-<batch_id>`` with the failing reason, instead of losing
    them to the drop filter. Idempotent (overwrite per batch dir) so a
    replayed batch rewrites, never duplicates, its quarantine shard. The
    reference silently skips these rows (index_ccdb.py:104); a production
    CDC tail needs them inspectable."""
    import os

    reason = F.concat_ws(
        ",",
        *[
            F.when(F.col(k).isNull(), F.lit(f"null:{k}"))
            for k in spec.key_cols
        ],
    )
    (
        batch_df.filter(_bad_key_pred(spec))
        .withColumn("_reason", reason)
        .withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .parquet(os.path.join(quarantine_dir, f"b-{batch_id:010d}"))
    )


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """All dead-lettered rows across batches (glob over the batch dirs)."""
    return spark.read.parquet(f"{quarantine_dir}/b-*")


def apply_changes(
    table: SnapshotParquetTable,
    batch_df: DataFrame,
    batch_id: int,
    normalize: bool = True,
    count_malformed: bool = True,
    quarantine_dir: str | None = None,
) -> MergeStats:
    spec = table.spec
    if batch_id <= table.last_batch_id:
        return MergeStats(batch_id=batch_id, skipped=True, version=table.manifest()["version"])
    raw_df = batch_df

    if table.mode == "mor":
        # fused single-shuffle apply: malformed counting+dropping, dedup and
        # normalization all happen inside the ONE write job (the observe node
        # sits before the bad-key filter — see merge_events docstring); no
        # separate pre-pass over the batch
        stats = table.merge_events(batch_df, batch_id, normalize=normalize)
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

        stats = table.merge(deduped, batch_id, summary_extra=extra)
        if obs is not None and not stats.skipped:
            if "n_malformed" not in got:
                extra()
            stats.n_malformed = got["n_malformed"]
    # dead-letter the malformed rows AFTER the commit decided the batch is
    # fresh; the write runs only when the (already-computed) count is
    # non-zero, so the common clean batch pays nothing
    if quarantine_dir is not None and not stats.skipped and stats.n_malformed > 0:
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
