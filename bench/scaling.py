"""Scaling-efficiency evidence: run the identical CDC replay (same input,
hash-deterministic generator) at local[8] (N) and local[32] (4N) in separate
JVMs, report throughput at both + efficiency = (tput_32/tput_8)/4.

This is the sandbox stand-in for the north rule's "N and 4N executors"
criterion (no real cluster here); the engine itself is partition-parallel
(bucketed merge, map-side-combining dedup) so executor-count scaling tracks
core-count scaling. Usage:

    python bench/scaling.py [--events 2000000] [--convs 40000] [--update-md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(master: str, events: int, convs: int, batches: int,
             mode: str = "mor", warmup: int = 2, write_path: str = "fused",
             text_words: int = 0, binlog_cache: str | None = None,
             compact: bool = True, write_salt: str = "auto",
             pin_cpus: int | None = None) -> dict:
    """``pin_cpus=N`` taskset-pins the WHOLE process tree (JVM, Python
    workers, GC/IO threads) to CPUs 0..N-1 — without it, local[2] means
    "2 task slots + unbounded runtime threads" on a 32-vCPU host, which
    inflates the low side of a scaling pair; with it, each side gets
    exactly the cores a real fixed-core executor would."""
    cmd = []
    if pin_cpus:
        cmd += ["taskset", "-c", f"0-{pin_cpus - 1}"]
    cmd += [
        sys.executable, os.path.join(REPO, "bench.py"), "--cdc-only",
        "--master", master, "--cdc-events", str(events),
        "--cdc-convs", str(convs), "--cdc-batches", str(batches),
        "--cdc-mode", mode, "--cdc-warmup-batches", str(warmup),
        "--cdc-write-path", write_path, "--cdc-text-words", str(text_words),
        "--cdc-write-salt", str(write_salt),
    ]
    if binlog_cache:
        cmd += ["--cdc-binlog-cache", binlog_cache]
    if not compact:
        cmd += ["--cdc-no-compact"]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_best(master: str, events: int, convs: int, batches: int, reps: int = 3) -> dict:
    """Best-of-N wall clock: the sandbox host is shared/noisy (loadavg from
    neighbors), so min over repetitions estimates uncontended throughput."""
    import time as _time

    best = None
    for i in range(reps):
        load = open("/proc/loadavg").read().split()[0]
        r = run_once(master, events, convs, batches)["cdc"]
        r["loadavg_at_start"] = float(load)
        print(f"  {master} rep {i}: {r['events_per_sec']:,} ev/s "
              f"(wall {r['seconds']}s, load {load})", file=sys.stderr)
        if best is None or r["events_per_sec"] > best["events_per_sec"]:
            best = r
        _time.sleep(10)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=40_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--low", default="local[8]")
    ap.add_argument("--high", default="local[32]")
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    lo = run_best(args.low, args.events, args.convs, args.batches)
    hi = run_best(args.high, args.events, args.convs, args.batches)
    ratio = hi["events_per_sec"] / lo["events_per_sec"]
    eff = ratio / 4.0
    out = {
        "metric": "CDC merge-apply scaling efficiency N->4N (local[8]->local[32])",
        "events": args.events,
        "low": {"master": args.low, **lo},
        "high": {"master": args.high, **hi},
        "speedup": round(ratio, 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out, indent=1))

    if args.update_md:
        md = f"""
## Measured scaling evidence (this sandbox, {args.events:,} events)

| master | wall (s) | events/sec |
|---|---|---|
| {args.low} (N) | {lo['seconds']} | {lo['events_per_sec']:,} |
| {args.high} (4N) | {hi['seconds']} | {hi['events_per_sec']:,} |

Speedup {args.low}->{args.high}: **{ratio:.2f}x**; scaling efficiency
(speedup/4): **{eff:.2f}** (target >= 0.8). Same hash-deterministic input
both runs; separate JVMs; apply path only (generation/bootstrap excluded).
Extrapolation note: at 10^10 events this workload is {10**10 // args.events:,}x
the benched replay; per-batch cost is O(affected-bucket data), so sustained
throughput scales with executor count until the shuffle for a single batch
saturates — batch size and bucket count are the knobs (see SURVEY.md section 4).
"""
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(md)
        print("appended to BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
