"""A/B: mapInArrow vs mapInPandas fused fold on the realistic config
(100-word texts). Interleaved reps, same cached input, steal-instrumented.

    python bench/fold_ab.py [--events 1000000] [--reps 3] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _cpu_mix():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    return v  # user nice system idle iowait irq softirq steal


def _steal_pct(a, b):
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return 100.0 * d[7] / tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=4000)
    ap.add_argument("--engines", default="arrow,pandas",
                    help="comma-separated fold_engine pair to interleave (e.g. jvm,arrow)")
    ap.add_argument("--patches", action="store_true",
                    help="alias for --mode patches")
    ap.add_argument("--mode", default="lww",
                    choices=["lww", "patches", "agg", "first"],
                    help="merge engine whose fold pair to A/B: plain LWW, "
                         "partial-update (a third of U ops become column "
                         "patches), aggregation (last-per-column agg_spec "
                         "over the transcript payload), or first-row")
    args = ap.parse_args()
    if args.patches:
        args.mode = "patches"
    eng_a, eng_b = args.engines.split(",")

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
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
        app_name="fold-ab",
    )
    import tempfile

    work = tempfile.mkdtemp(prefix="foldab-")
    changes = gen_changes_spark(
        spark, args.events, args.convs, text_words=100
    ).repartitionByRange(args.cpus * 4, "lsn")
    if args.mode == "patches":
        # deterministic patch rewrite, all JVM-side: every 3rd U becomes a
        # column patch — alternating text-only / tool-only payloads
        from pyspark.sql import functions as F

        is_p = (F.col("op") == "U") & (F.col("lsn") % 3 == 0)
        tool_only = F.col("lsn") % 2 == 0
        changes = changes.withColumns({
            "op": F.when(is_p, F.lit("P")).otherwise(F.col("op")),
            "text": F.when(is_p & tool_only, F.lit(None)).otherwise(F.col("text")),
            "tool": F.when(is_p & ~tool_only, F.lit(None)).otherwise(F.col("tool")),
        })
    changes.persist().count()
    spec_extra = {
        "lww": {},
        "patches": {"partial_updates": True},
        # 'last' per payload column: LWW-equivalent semantics through the
        # aggregation fold machinery — isolates the fold engines' cost
        "agg": {"agg_spec": {"role": "last", "text": "last", "tool": "last",
                             "ts": "last"}},
        "first": {"first_row": True},
    }[args.mode]
    seed = gen_seed_pandas(n_convs=min(args.convs, 20000))

    results: dict[str, list] = {eng_a: [], eng_b: []}
    for rep in range(args.reps):
        for engine in (eng_a, eng_b) if rep % 2 == 0 else (eng_b, eng_a):
            spec = TableSpec(num_buckets=64, merge_mode="mor", fold_engine=engine,
                             **spec_extra)
            t = SnapshotParquetTable(
                spark, f"{work}/t-{engine}-{rep}", spec
            )
            t.create(TRANSCRIPT_SCHEMA)
            bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
            # warmup small batch to spawn python workers for this engine
            apply_changes(t, changes.limit(2000), batch_id=0)
            c0 = _cpu_mix()
            t0 = time.time()
            apply_changes(t, changes, batch_id=1)
            dt = time.time() - t0
            steal = _steal_pct(c0, _cpu_mix())
            rate = args.events / dt
            results[engine].append({"sec": round(dt, 2), "ev_s": round(rate), "steal": round(steal, 1)})
            print(f"rep{rep} {engine:6s} {dt:6.2f}s  {rate:9.0f} ev/s  steal {steal:.1f}%", flush=True)

    best = {k: max(r["ev_s"] for r in v) for k, v in results.items()}
    print(json.dumps({"best": best, "reps": results, "events": args.events, "cpus": args.cpus}))


if __name__ == "__main__":
    main()
