"""Phase-level profile of the merge_events per-batch constant.

Runs a short CDC replay at a given parallelism and batch size, with the
merge_events internals wrapped so each phase's wall time is reported:
  - spark_write : the one Spark job (shuffle + fold + parquet write)
  - scan_written: commit-dir walk + footer-stat job
  - commit      : manifest JSON serialize + atomic rename
  - other       : everything else in the batch (plan build, schema evolve,
                  observation fetch, ledger write)

Usage: python scripts/profile_commit.py [--cores 8] [--events 250000]
       [--batches 4] [--text-words 100] [--salt auto]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.session import build_session
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_spark, gen_seed_pandas


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--events", type=int, default=250_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--text-words", type=int, default=100)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--salt", default="auto")
    ap.add_argument(
        "--exact-placement", choices=["on", "off"], default="on",
        help="off forces the hash-scatter + hive-dir fallback for A/B",
    )
    args = ap.parse_args()
    if args.exact_placement == "off":
        SnapshotParquetTable._EXACT_PLACEMENT_MAX = 0

    spark = build_session(master=f"local[{args.cores}]", app_name="profile-commit")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="profile-commit-", dir=shm)
    timings: list[dict] = []

    orig_scan = SnapshotParquetTable._scan_written
    orig_commit = SnapshotParquetTable._commit

    def timed_scan(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_scan(self, *a, **kw)
        if timings:
            timings[-1]["scan_written"] = time.perf_counter() - t0
        return out

    def timed_commit(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_commit(self, *a, **kw)
        if timings:
            timings[-1]["commit"] = time.perf_counter() - t0
        return out

    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet

    def timed_parquet(self, path, *a, **kw):
        t0 = time.perf_counter()
        out = orig_parquet(self, path, *a, **kw)
        if timings:
            timings[-1]["spark_write"] = timings[-1].get("spark_write", 0.0) + (
                time.perf_counter() - t0
            )
        return out

    SnapshotParquetTable._scan_written = timed_scan
    SnapshotParquetTable._commit = timed_commit
    DataFrameWriter.parquet = timed_parquet

    try:
        salt = args.salt if args.salt == "auto" else int(args.salt)
        table = SnapshotParquetTable(
            spark, os.path.join(work, "table"),
            TableSpec(num_buckets=args.buckets, merge_mode="mor", write_salt=salt),
        )
        table.create(TRANSCRIPT_SCHEMA)
        seed = gen_seed_pandas(n_convs=2000)
        bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

        n_total = args.events * args.batches
        binlog = os.path.join(work, "binlog")
        gen_changes_spark(
            spark, n_total, 60_000, text_words=args.text_words
        ).repartitionByRange(args.batches * 32, "lsn").write.parquet(binlog)
        changes = spark.read.parquet(binlog)

        for b in range(args.batches):
            lo, hi = b * args.events, (b + 1) * args.events
            batch = changes.filter((changes.lsn > lo) & (changes.lsn <= hi))
            timings.append({})
            t0 = time.perf_counter()
            apply_changes(table, batch, batch_id=b + 1)
            timings[-1]["batch_wall"] = time.perf_counter() - t0

        print(f"\ncores={args.cores} events/batch={args.events} "
              f"text_words={args.text_words} salt={args.salt} buckets={args.buckets} "
              f"exact_placement={args.exact_placement}")
        hdr = ["batch_wall", "spark_write", "scan_written", "commit", "other"]
        print(" ".join(f"{h:>12}" for h in ["batch"] + hdr))
        for i, t in enumerate(timings):
            t["other"] = t["batch_wall"] - sum(
                t.get(k, 0.0) for k in ("spark_write", "scan_written", "commit")
            )
            print(" ".join([f"{i:>12}"] + [f"{t.get(h, 0.0):>12.3f}" for h in hdr]))
        warm = timings[1:] or timings
        print("\npost-warmup means:")
        for h in hdr:
            print(f"  {h:<14} {sum(t[h] for t in warm) / len(warm):.3f}s")
    finally:
        DataFrameWriter.parquet = orig_parquet
        SnapshotParquetTable._scan_written = orig_scan
        SnapshotParquetTable._commit = orig_commit
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
