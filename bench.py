"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "cdc": {...events/sec detail...}}

Headline operator queries run at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; the CDC replay bench
(the north-rule metric: sustained change-events/sec applied through the
full normalize->dedup->MERGE->commit path) runs on a synthetic binlog
sized by --cdc-events (default 1,000,000).

Modes:
  python bench.py                 # full: headline queries + CDC replay
  python bench.py --cdc-only --master local[8] --cdc-events 2000000
                                  # scaling-run building block (one JVM)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F_sql


def _cpu_snap() -> list[int] | None:
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except OSError:
        return None


def _cpu_mix(before: list[int] | None, after: list[int] | None) -> dict | None:
    """Host CPU breakdown over a window — steal% is the noisy-neighbor
    signal that explains throughput variance on shared VMs."""
    if not before or not after:
        return None
    d = [b - a for a, b in zip(before, after)]
    tot = max(sum(d), 1)
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return {n: round(100.0 * v / tot, 1) for n, v in zip(names, d)}

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "top1_per_group",
    "cdc_lww_latest",
    "cdc_merge_apply",
    "sessionize",
    "dedup_minhash_lsh",
    "embedding_topk",
    "token_quality",
    "ws_normalize",
    "gopher_quality",
    "decontaminate",
    "search_bm25_ranked",
    "hybrid_search_rrf",
    "vocab_topk",
    "tfidf_top_term",
    "pagerank_3iter",
    "cdc_time_slice",
    "dedup_span_scrub",
    "cdc_seqgroup_apply",
    # round-3 additions
    "lake_stats_prune",
    "ann_train_assign",
    "lake_dv_delete",
    "bpe_token_budget",
    # round-4 additions
    "bpe_top_pairs",
    "facade_agg_stream",
    "pack_sequences_bpe",
    # round-5 additions (resolved change feed: agg + CoW)
    "facade_agg_resolved_feed",
    "cow_resolved_feed",
]


def _wait_quiet(max_wait: float, idle_min: float = 90.0, steal_max: float = 2.0,
                dt: float = 3.0) -> dict:
    """Pre-sweep quiet-window gate (round-3 verdict: BENCH_r03's headline
    numbers were noise-inflated — the scaling pairs were already gated by
    bench/quietwindow.py, the query sweep was not). Polls host idle/steal
    until the window is quiet or ``max_wait`` expires; the gate fields ride
    the bench JSON so a loud window is EVIDENT in the record instead of
    silently poisoning the trend."""
    t0 = time.time()
    m = None
    while True:
        a, b_ = _cpu_snap(), None
        time.sleep(dt)
        b_ = _cpu_snap()
        m = _cpu_mix(a, b_) or {"idle": 0.0, "steal": 100.0}
        if m["idle"] > idle_min and m["steal"] < steal_max:
            return {"quiet": True, "idle": m["idle"], "steal": m["steal"],
                    "waited_sec": round(time.time() - t0, 1)}
        if time.time() - t0 >= max_wait:
            return {"quiet": False, "idle": m["idle"], "steal": m["steal"],
                    "waited_sec": round(time.time() - t0, 1)}


def run_cdc_bench(spark, n_events: int, n_convs: int, n_batches: int, num_buckets: int,
                  mode: str = "mor", warmup_batches: int = 2,
                  dedupe_on_write: bool = True, text_words: int = 0,
                  binlog_cache: str | None = None, compact: bool = True,
                  write_salt: int | str = "auto",
                  delta_codec: str | None = None) -> dict:
    """Time the apply path (generation + bootstrap excluded).

    The headline number is SUSTAINED throughput: the first ``warmup_batches``
    micro-batches still run (they are part of the stream) but are excluded
    from the timed window — a cold JVM spends ~30-40s on codegen + Python
    worker spawn that a long-running streaming job pays once per week, not
    per batch. Cold numbers are reported alongside for transparency.

    ``mode="mor"`` (default) is the high-rate path: O(batch) delta appends,
    LWW-resolved on read; compaction is timed separately because in
    production it is an async maintenance job (Iceberg rewrite_data_files)
    that runs off the ingest critical path.
    """
    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_spark, gen_seed_pandas

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc-bench-", dir=shm)
    try:
        files_per_batch = 32  # segments per micro-batch: keeps scan parallelism
        if binlog_cache:
            # the generator is a pure hash function of (lsn, seed), so a
            # pre-generated binlog is byte-identical to a fresh one — cache
            # it keyed by its parameters and reuse across reps/configs
            binlog = os.path.join(
                binlog_cache,
                f"binlog-{n_events}-{n_convs}-{text_words}-{n_batches * files_per_batch}",
            )
        else:
            binlog = os.path.join(work, "binlog")
        if not os.path.exists(os.path.join(binlog, "_SUCCESS")):
            shutil.rmtree(binlog, ignore_errors=True)
            gen_changes_spark(spark, n_events, n_convs,
                              text_words=text_words or None).repartitionByRange(
                n_batches * files_per_batch, "lsn"
            ).write.mode("overwrite").parquet(binlog)

        table = SnapshotParquetTable(
            spark, os.path.join(work, "table"),
            TableSpec(num_buckets=num_buckets, merge_mode=mode,
                      dedupe_on_write=dedupe_on_write, write_salt=write_salt,
                      delta_codec=delta_codec),
        )
        table.create(TRANSCRIPT_SCHEMA)
        seed = gen_seed_pandas(n_convs=min(n_convs, 20000))
        bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

        changes = spark.read.parquet(binlog)
        bounds = [int(n_events * i / n_batches) for i in range(n_batches + 1)]
        warmup_batches = min(warmup_batches, max(0, n_batches - 1))
        t_cold = time.time()
        t_sustained = t_cold
        cpu0 = _cpu_snap()
        batch_secs = []
        for b in range(n_batches):
            batch = changes.filter(
                (changes.lsn > bounds[b]) & (changes.lsn <= bounds[b + 1])
            )
            t_b = time.time()
            # malformed counting rides the write job's observe node (free)
            apply_changes(table, batch, batch_id=b)
            batch_secs.append(time.time() - t_b)
            if b + 1 == warmup_batches:
                t_sustained = time.time()
        wall_cold = time.time() - t_cold
        wall = time.time() - t_sustained
        cpu1 = _cpu_snap()  # window ends here: replay only, not compact/count
        timed_events = n_events - bounds[warmup_batches]
        # noise-robust estimator for shared hosts: the fastest post-warmup
        # batch is the least-interfered sample of the pipeline's real rate
        # (unrounded durations — rounding is display-only)
        batch_events = n_events / n_batches
        peak = batch_events / max(min(batch_secs[warmup_batches:]), 1e-6)
        compact_s = 0.0
        if compact:
            t_c = time.time()
            table.compact(drop_tombstones=False)
            compact_s = time.time() - t_c
        return {
            "mode": mode,
            "write_path": "write-dedup" if dedupe_on_write else "raw-append",
            "text_words": text_words or 10,
            "n_events": n_events,
            "n_batches": n_batches,
            "warmup_batches": warmup_batches,
            "seconds": round(wall, 2),
            "events_per_sec": round(timed_events / wall),
            "batch_seconds": [round(s, 2) for s in batch_secs],
            "peak_events_per_sec": round(peak),
            "cold_seconds": round(wall_cold, 2),
            "cold_events_per_sec": round(n_events / wall_cold),
            "compact_seconds": round(compact_s, 2),
            "final_rows": table.read().count(),
            "cpu_mix": _cpu_mix(cpu0, cpu1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cdc-only", action="store_true")
    ap.add_argument("--no-cdc", action="store_true")
    ap.add_argument("--master", default=None)
    # defaults are the REALISTIC configuration the 10^10 extrapolation rests
    # on: 2M-event micro-batches (driver-side per-batch constants amortized
    # the way a production stream would) and ~100-word turn texts so
    # per-event compute/shuffle/write bytes reflect transcripts, not toys
    ap.add_argument("--cdc-events", type=int, default=6_000_000)
    ap.add_argument("--cdc-convs", type=int, default=60_000)
    ap.add_argument("--cdc-batches", type=int, default=3)
    ap.add_argument("--cdc-mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--cdc-write-path", default="fused", choices=["fused", "raw"])
    ap.add_argument("--cdc-write-salt", default="auto",
                    help="sub-bucket salt fan: 'auto' (default) or an int (1 = off)")
    ap.add_argument("--cdc-text-words", type=int, default=100,
                    help="words per turn text; realistic transcripts: 100-500")
    ap.add_argument("--cdc-warmup-batches", type=int, default=1)
    ap.add_argument("--cdc-binlog-cache", default=None,
                    help="dir to cache the generated binlog parquet across runs "
                         "(sound: the generator is a pure function of (lsn, seed))")
    ap.add_argument("--cdc-no-compact", action="store_true",
                    help="skip the post-replay compaction timing (scaling reps)")
    ap.add_argument("--cdc-delta-codec", default=None,
                    help="parquet codec for short-lived MoR delta files "
                         "(lz4/snappy; default: session codec zstd)")
    args = ap.parse_args()

    from ccdb_data_pipeline_spark.benchqueries import QUERIES
    from ccdb_data_pipeline_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = args.master or f"local[{cpus}]"
    n_threads = int(master.split("[")[1].rstrip("]")) if "[" in master else 8
    extra = {
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        # shuffle partitions are already sized to cores; AQE coalescing to
        # 64MB targets would cap post-shuffle parallelism at 3-4 tasks here
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"  # shuffle off shared disk
        # shuffle blocks live in RAM here, so lz4 is pure CPU overhead on the
        # hot path (measured interleaved A/B at local[8]: off wins both reps,
        # +6-12% sustained). Keep compression ON for real network shuffles.
        extra["spark.shuffle.compress"] = "false"
        extra["spark.shuffle.spill.compress"] = "false"
    spark = build_session(
        app_name="bench", master=master, shuffle_partitions=max(8, n_threads),
        extra_conf=extra,
    )

    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline operator wall-clock + CDC merge-apply throughput",
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "master": master,
    }

    total = 0.0
    if not args.cdc_only:
        from ccdb_data_pipeline_spark.functions.normalize import normalize_ws
        from ccdb_data_pipeline_spark.operators.dedup_text import release_caches

        # quiet-window gate BEFORE the sweep (same policy the scaling
        # pairs use); fields recorded so a loud window is visible evidence
        out["gate"] = _wait_quiet(
            max_wait=float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "240"))
        )

        # Warm the Python-worker pool + Arrow serde once before timing: a
        # long-lived service pays worker spawn per deploy, not per query.
        # The warmup cost is reported separately, not hidden.
        t0 = time.time()
        spark.range(n_threads * 4).repartition(n_threads).select(
            normalize_ws(F_sql.col("id").cast("string")).alias("s")
        ).collect()
        out["python_worker_warmup_sec"] = round(time.time() - t0, 2)

        # min-of-2 per query: a single noisy-neighbor window on this shared
        # VM can inflate one draw 10-25x (observed); the faster rep is the
        # less-interfered sample. Policy recorded in the output.
        out["queries_policy"] = "min-of-2"
        for name in HEADLINE:
            fn = QUERIES[name]
            dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = min(dt, time.time() - t0)
                release_caches()  # free cached intermediates between reps
            out["queries"][name] = round(dt, 2)
            total += dt

    if not args.no_cdc:
        # the binlog generator is deterministic, so reps can share one
        # binlog; default to an ephemeral cache so a noise-retry rep does
        # not pay generation twice
        cache = args.cdc_binlog_cache
        ephemeral_cache = None
        if cache is None:
            shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
            ephemeral_cache = tempfile.mkdtemp(prefix="cdc-binlog-cache-", dir=shm)
            cache = ephemeral_cache

        def _one_rep():
            return run_cdc_bench(
                spark, args.cdc_events, args.cdc_convs, args.cdc_batches,
                num_buckets=max(16, n_threads), mode=args.cdc_mode,
                warmup_batches=args.cdc_warmup_batches,
                dedupe_on_write=(args.cdc_write_path == "fused"),
                write_salt=(args.cdc_write_salt if args.cdc_write_salt == "auto"
                            else int(args.cdc_write_salt)),
                text_words=args.cdc_text_words,
                binlog_cache=cache,
                compact=not args.cdc_no_compact,
                delta_codec=args.cdc_delta_codec,
            )

        def _noisy(c):
            """Noise heuristic for shared hosts: steal time during the
            window, or a >2x spread between post-warmup batches (observed
            interference pattern: one batch 3-5x the others)."""
            mix = c.get("cpu_mix") or {}
            bs = c["batch_seconds"][c["warmup_batches"]:]
            return mix.get("steal", 0.0) > 1.5 or (
                len(bs) > 1 and max(bs) > 2.0 * min(bs)
            )

        try:
            reps = [_one_rep()]
            # up to two retries: a noisy-neighbor window on this host lasts
            # minutes, so a single retry often lands in the same window; a
            # quiet rep stops the loop immediately (no cost when calm)
            while _noisy(reps[-1]) and len(reps) < 3:
                reps.append(_one_rep())
            cdc = max(reps, key=lambda c: c["events_per_sec"])
            cdc["rep_events_per_sec"] = [r["events_per_sec"] for r in reps]
            cdc["cdc_policy"] = "retry-up-to-2-if-noisy(steal>1.5% or batch-spread>2x)"
        finally:
            if ephemeral_cache is not None:
                shutil.rmtree(ephemeral_cache, ignore_errors=True)
        out["cdc"] = cdc
        out["queries"]["cdc_replay"] = cdc["seconds"]
        total += cdc["seconds"]

    out["value"] = round(total, 2)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
