"""Interleaved A/B scaling measurement for noisy shared hosts: alternate
low/high configs rep-by-rep so ambient load affects both equally; report
best and median per config. Used to produce the numbers in BENCH.md."""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench.scaling import run_once  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--convs", type=int, default=40_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--write-path", default="fused", choices=["fused", "raw"])
    ap.add_argument("--text-words", type=int, default=0)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--low", default="local[8]")
    ap.add_argument("--high", default="local[32]")
    ap.add_argument("--binlog-cache", default="/dev/shm/binlog-cache")
    args = ap.parse_args()

    import os
    if args.binlog_cache:
        os.makedirs(args.binlog_cache, exist_ok=True)
    results: dict[str, list[dict]] = {args.low: [], args.high: []}
    for i in range(args.reps):
        for m in (args.low, args.high):
            load = open("/proc/loadavg").read().split()[0]
            r = run_once(m, args.events, args.convs, args.batches,
                         mode=args.mode, warmup=args.warmup,
                         write_path=args.write_path, text_words=args.text_words,
                         binlog_cache=args.binlog_cache, compact=False)["cdc"]
            r["load"] = float(load)
            results[m].append(r)
            print(f"rep {i} {m}: {r['events_per_sec']:,} ev/s (wall {r['seconds']}s, load {load})",
                  file=sys.stderr, flush=True)
            time.sleep(8)

    out = {"events": args.events, "configs": {}}
    for m, rs in results.items():
        tps = [r["events_per_sec"] for r in rs]
        peaks = [r.get("peak_events_per_sec", 0) for r in rs]
        out["configs"][m] = {
            "best": max(tps),
            "median": int(statistics.median(tps)),
            "peak": max(peaks),
            "all": tps,
            "all_peaks": peaks,
            "batch_seconds": [r.get("batch_seconds") for r in rs],
            "loads": [r["load"] for r in rs],
        }
    lo, hi = out["configs"][args.low], out["configs"][args.high]
    out["speedup_best"] = round(hi["best"] / lo["best"], 3)
    out["efficiency_best"] = round(hi["best"] / lo["best"] / 4, 3)
    out["speedup_median"] = round(hi["median"] / lo["median"], 3)
    out["efficiency_median"] = round(hi["median"] / lo["median"] / 4, 3)
    if lo.get("peak") and hi.get("peak"):
        out["speedup_peak"] = round(hi["peak"] / lo["peak"], 3)
        out["efficiency_peak"] = round(hi["peak"] / lo["peak"] / 4, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
