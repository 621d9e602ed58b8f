"""A/B: engine apply_changes (fused Arrow fold) vs the DataSource facade
writer (raw exactly-once append) on the same cached change batch, plus the
read-time cost each leaves behind (fused winners vs raw multi-version
resolve). Interleaved reps, steal-instrumented.

    python bench/facade_ab.py [--events 1000000] [--reps 2] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _cpu_mix():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _steal_pct(a, b):
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / (sum(d) or 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=4000)
    args = ap.parse_args()

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.datasource import register
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.session import build_session
    from ccdb_data_pipeline_spark.sources.binlog import (
        gen_changes_spark,
        gen_seed_pandas,
    )

    spark = build_session(
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(32, args.cpus * 4),
        app_name="facade-ab",
    )
    register(spark)
    work = tempfile.mkdtemp(prefix="facadeab-")
    changes = gen_changes_spark(
        spark, args.events, args.convs, text_words=100
    ).repartitionByRange(args.cpus * 4, "lsn")
    changes.persist().count()
    seed = gen_seed_pandas(n_convs=min(args.convs, 20000))

    def run_engine(rep):
        spec = TableSpec(num_buckets=64, merge_mode="mor")
        t = SnapshotParquetTable(spark, f"{work}/e-{rep}", spec)
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
        apply_changes(t, changes.limit(2000), batch_id=0)  # worker warmup
        c0, t0 = _cpu_mix(), time.time()
        apply_changes(t, changes, batch_id=1)
        dt = time.time() - t0
        steal = _steal_pct(c0, _cpu_mix())
        t0 = time.time()
        n = t.read().count()
        return dt, steal, time.time() - t0, n

    def run_facade(rep):
        from ccdb_data_pipeline_spark.plans.datasource import bucket_partitioned

        spec = TableSpec(num_buckets=64, merge_mode="mor")
        t = SnapshotParquetTable(spark, f"{work}/f-{rep}", spec)
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
        (
            bucket_partitioned(changes.limit(2000), t.root)
            .write.format("transcript_lake")
            .option("batchId", 0).mode("append").save(t.root)
        )
        c0, t0 = _cpu_mix(), time.time()
        (
            bucket_partitioned(changes, t.root)
            .write.format("transcript_lake")
            .option("batchId", 1).mode("append").save(t.root)
        )
        dt = time.time() - t0
        steal = _steal_pct(c0, _cpu_mix())
        t.refresh()
        t0 = time.time()
        n = t.read().count()
        return dt, steal, time.time() - t0, n

    results = {"engine": [], "facade": []}
    for rep in range(args.reps):
        order = (
            (("engine", run_engine), ("facade", run_facade))
            if rep % 2 == 0
            else (("facade", run_facade), ("engine", run_engine))
        )
        for name, fn in order:
            dt, steal, read_s, n = fn(rep)
            results[name].append(
                {
                    "apply_sec": round(dt, 2),
                    "ev_s": round(args.events / dt),
                    "steal": round(steal, 1),
                    "read_sec": round(read_s, 2),
                    "rows": n,
                }
            )
            print(
                f"rep{rep} {name:6s} apply {dt:6.2f}s ({args.events / dt:9.0f} ev/s, "
                f"steal {steal:.1f}%)  read+resolve {read_s:5.2f}s  rows {n}",
                flush=True,
            )
    rows = {r["rows"] for v in results.values() for r in v}
    print(
        json.dumps(
            {
                "best_ev_s": {k: max(r["ev_s"] for r in v) for k, v in results.items()},
                "read_sec_med": {
                    k: sorted(r["read_sec"] for r in v)[len(v) // 2]
                    for k, v in results.items()
                },
                "rows_agree": len(rows) == 1,
                "reps": results,
                "events": args.events,
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
