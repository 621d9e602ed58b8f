"""Platform-normalized scaling measurement for noisy shared hosts.

Raw N->4N throughput ratios on a multi-tenant VM measure the hypervisor's
mood as much as the engine: the same hour that the engine's 2->8 speedup
reads 2.9x, a pure-CPU multiprocessing probe (no Spark, no JVM, no shuffle)
reads ~3.1x and a map-only JVM Spark job ~2.5x — the host simply does not
deliver 4x the cycles. What a real cluster (dedicated executor cores)
would see is the ENGINE/PLATFORM ratio: how much of the parallelism the
host actually delivered did the engine convert into throughput.

Protocol: for each rep, run [cpu-probe@low, engine@low, cpu-probe@high,
engine@high] back-to-back so probe and engine sample the same noise
window. Report per-rep and aggregate:

    platform_speedup = cpu_hi / cpu_lo          (host-delivered parallelism)
    engine_speedup   = engine_hi / engine_lo    (measured)
    normalized_eff   = engine_speedup / platform_speedup

Usage: python bench/normalized.py [--low 2 --high 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench.scaling import run_once  # noqa: E402


def _hash_work(n: int) -> str:
    h = hashlib.sha256()
    x = b"x" * 4096
    for _ in range(n):
        h.update(x)
    return h.hexdigest()


def cpu_probe(procs: int, items_per_proc: int = 8, n: int = 20000) -> float:
    """Pure-CPU throughput (hash blocks/sec) at a given process count.
    items = procs * items_per_proc so every config does work proportional
    to its parallelism (fixed per-core work, like the engine's fixed
    per-core partition load)."""
    items = procs * items_per_proc
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_hash_work, [n] * items)
    return items * n / (time.time() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--events", type=int, default=6_000_000)
    ap.add_argument("--convs", type=int, default=60_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--text-words", type=int, default=100)
    ap.add_argument("--binlog-cache", default="/dev/shm/binlog-cache")
    args = ap.parse_args()

    import os

    os.makedirs(args.binlog_cache, exist_ok=True)
    reps = []
    for i in range(args.reps):
        cpu_lo = cpu_probe(args.low)
        eng_lo = run_once(
            f"local[{args.low}]", args.events, args.convs, args.batches,
            warmup=1, text_words=args.text_words,
            binlog_cache=args.binlog_cache, compact=False,
        )["cdc"]
        cpu_hi = cpu_probe(args.high)
        eng_hi = run_once(
            f"local[{args.high}]", args.events, args.convs, args.batches,
            warmup=1, text_words=args.text_words,
            binlog_cache=args.binlog_cache, compact=False,
        )["cdc"]
        r = {
            "platform_speedup": round(cpu_hi / cpu_lo, 3),
            "engine_speedup": round(
                eng_hi["peak_events_per_sec"] / eng_lo["peak_events_per_sec"], 3
            ),
            "engine_lo_peak": eng_lo["peak_events_per_sec"],
            "engine_hi_peak": eng_hi["peak_events_per_sec"],
            "cpu_lo_mops": round(cpu_lo / 1e6, 2),
            "cpu_hi_mops": round(cpu_hi / 1e6, 2),
        }
        r["normalized_eff"] = round(r["engine_speedup"] / r["platform_speedup"], 3)
        reps.append(r)
        print(f"rep {i}: platform x{r['platform_speedup']}, engine x{r['engine_speedup']}, "
              f"normalized {r['normalized_eff']}", file=sys.stderr, flush=True)
        time.sleep(5)

    out = {
        "low": args.low,
        "high": args.high,
        "events": args.events,
        "reps": reps,
        "normalized_eff_median": round(
            statistics.median(r["normalized_eff"] for r in reps), 3
        ),
        "normalized_eff_best": round(max(r["normalized_eff"] for r in reps), 3),
        # raw (unnormalized) numbers for the same reps, for transparency
        "raw_eff_best": round(
            max(r["engine_speedup"] for r in reps) / (args.high / args.low), 3
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
