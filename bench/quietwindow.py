"""Quiet-window scaling sampler: wait for low host noise, then run one
interleaved low/high rep pair; repeat. On a multi-tenant VM the N->4N
ratio is a lottery over noise windows — this harness buys more draws in
the windows that matter (quiet ones) instead of burning time in loud ones.

Appends one JSON line per pair to --out; stop with SIGTERM or --max-pairs.

Usage: python bench/quietwindow.py --out /tmp/quiet_pairs.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench.scaling import run_once  # noqa: E402


def cpu_sample(dt: float = 3.0) -> dict:
    def snap():
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    a = snap()
    time.sleep(dt)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = max(sum(d), 1)
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return {n: 100.0 * v / tot for n, v in zip(names, d)}


def is_quiet(m: dict) -> bool:
    # our own load is 0 between pairs, so busy = neighbors; steal = hypervisor
    return m["idle"] > 92.0 and m["steal"] < 2.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", default="local[2]")
    ap.add_argument("--high", default="local[8]")
    ap.add_argument("--events", type=int, default=6_000_000)
    ap.add_argument("--convs", type=int, default=60_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--text-words", type=int, default=100)
    ap.add_argument("--salt", default="auto", help="write_salt for BOTH sides (fixed-granularity pairs: 4)")
    ap.add_argument("--binlog-cache", default="/dev/shm/binlog-cache")
    ap.add_argument("--out", default="/tmp/quiet_pairs.jsonl")
    ap.add_argument("--max-pairs", type=int, default=12)
    ap.add_argument("--poll-secs", type=float, default=30.0)
    ap.add_argument("--pin-cpus", action="store_true",
                    help="taskset each side to exactly its local[N] cores: "
                         "true fixed-core scaling (otherwise local[N] leaks "
                         "GC/IO/Python-worker threads onto spare host cores, "
                         "inflating the low side)")
    args = ap.parse_args()

    factor = 1.0
    lo_n = int(args.low.split("[")[1].rstrip("]"))
    hi_n = int(args.high.split("[")[1].rstrip("]"))
    factor = hi_n / lo_n

    done = 0
    while done < args.max_pairs:
        m = cpu_sample()
        if not is_quiet(m):
            time.sleep(args.poll_secs)
            continue
        rec = {"t": time.strftime("%H:%M:%S"), "pre_idle": round(m["idle"], 1),
               "pre_steal": round(m["steal"], 1)}
        try:
            lo = run_once(args.low, args.events, args.convs, args.batches,
                          warmup=1, text_words=args.text_words,
                          binlog_cache=args.binlog_cache, compact=False,
                          write_salt=args.salt,
                          pin_cpus=lo_n if args.pin_cpus else None)["cdc"]
            hi = run_once(args.high, args.events, args.convs, args.batches,
                          warmup=1, text_words=args.text_words, write_salt=args.salt,
                          binlog_cache=args.binlog_cache, compact=False,
                          pin_cpus=hi_n if args.pin_cpus else None)["cdc"]
        except Exception as e:  # noqa: BLE001 — keep sampling through transient failures
            rec["error"] = str(e)[:200]
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            time.sleep(args.poll_secs)
            continue
        rec.update({
            "lo_peak": lo["peak_events_per_sec"], "hi_peak": hi["peak_events_per_sec"],
            "lo_sustained": lo["events_per_sec"], "hi_sustained": hi["events_per_sec"],
            "speedup_peak": round(hi["peak_events_per_sec"] / lo["peak_events_per_sec"], 3),
            "eff_peak": round(hi["peak_events_per_sec"] / lo["peak_events_per_sec"] / factor, 3),
            "lo_cpu": lo.get("cpu_mix"), "hi_cpu": hi.get("cpu_mix"),
        })
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"pair {done}: x{rec['speedup_peak']} eff {rec['eff_peak']}", file=sys.stderr, flush=True)
        done += 1
        time.sleep(args.poll_secs)


if __name__ == "__main__":
    main()
