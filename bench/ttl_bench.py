"""Row-level TTL sweep timing (round-5 continuation): build a ts-ordered
transcript table at N rows with per-file ts stats, then time one
auto_maintain TTL sweep in dv mode and report the tier split — how many
rows left via metadata-only whole-file drops vs DV positions — plus the
commit-free re-sweep and the metadata-only no-op round.

On a ts-clustered table the cutoff crosses ONE boundary file per bucket,
so the expectation at any scale is: bulk of the expiry = manifest edits
(zero data IO), positional scan only on the boundary files.

Usage: python bench/ttl_bench.py [--rows 2000000] [--buckets 16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--expire-frac", type=float, default=0.5)
    ap.add_argument("--file-rows", type=int, default=None,
                    help="max_file_rows (default rows / buckets / 8 -> "
                         "~8 ts-sliced files per bucket)")
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.plans.maintenance import (
        MaintenancePolicy,
        auto_maintain,
    )
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.session import build_session

    spark = build_session(master=args.master, shuffle_partitions=32)
    base = dt.datetime(2030, 1, 1)
    work = tempfile.mkdtemp(prefix="ttlbench-")

    # ts-ordered corpus: one conversation per row id, event time climbing
    # one second per row — the append-mostly shape real transcript stores
    # have, which is what makes retention mostly-metadata
    df = (
        spark.range(args.rows)
        .select(
            F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit(base) + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        )
    )
    file_rows = args.file_rows or max(10_000, args.rows // args.buckets // 8)
    t = SnapshotParquetTable(
        spark, f"{work}/t",
        TableSpec(num_buckets=args.buckets, merge_mode="mor", stats_cols=("ts",),
                  max_file_rows=file_rows),
    )
    t.create(TRANSCRIPT_SCHEMA)
    t0 = time.time()
    bootstrap_seed(t, df)
    # ts-cluster within buckets + file split -> each bucket holds a chain
    # of ts-sliced files, the shape incremental time-ordered ingest leaves
    t.compact(only_dirty=False, zorder_by=("ts",))
    build_s = time.time() - t0

    cutoff_row = int(args.rows * args.expire_frac)
    now = base + dt.timedelta(seconds=args.rows + 3600)
    max_age = now - (base + dt.timedelta(seconds=cutoff_row))
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        ttl_column="ts", ttl_max_age=max_age, ttl_now=now,
    )

    t1 = time.time()
    r1 = auto_maintain(t, pol)
    sweep_s = time.time() - t1
    res = r1["actions"]["ttl"]["result"]

    t2 = time.time()
    r2 = auto_maintain(t, pol)  # straggler re-scan, commit-free
    resweep_s = time.time() - t2

    t.compact(only_dirty=False)
    t3 = time.time()
    r3 = auto_maintain(t, pol)  # metadata-only no-op
    noop_s = time.time() - t3

    live = t.read().count()
    print(json.dumps({
        "metric": "ttl_sweep",
        "rows": args.rows,
        "expired": cutoff_row,
        "build_s": round(build_s, 2),
        "sweep_s": round(sweep_s, 3),
        "rows_dropped_metadata": res["n_rows_dropped"],
        "dv_positions": res["n_dv_positions"],
        "files_dropped": res["n_files_dropped"],
        "resweep_s": round(resweep_s, 3),
        "resweep_committed": r2["actions"]["ttl"].get("result", {}).get("n_dv_positions", 0) != 0,
        "noop_s": round(noop_s, 4),
        "noop_ran": r3["actions"]["ttl"]["run"],
        "live_rows_after": live,
        "expected_live": args.rows - cutoff_row,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
