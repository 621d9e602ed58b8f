"""Deletion-vector vs tombstone DELETE WHERE A/B (round-3 item #5 "Done"
criterion: measured read-amplification drop).

Builds two identical compacted MoR lake tables from the events testdata,
deletes the same predicate through (a) the tombstone path (delta rows ->
buckets flip to resolve-at-read) and (b) deletion vectors (position
sidecars -> buckets stay plain-scan), then times the post-delete full
read N times each. Prints one JSON line.

Usage: python bench/dv_ab.py [--sf-dir /root/testdata/sf0.1] [--reps 5]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--predicate", default="event_type = 'click' AND coalesce(value, 0) < 80.0")
    args = ap.parse_args()

    from ccdb_data_pipeline_spark.benchqueries import _events_lake
    from ccdb_data_pipeline_spark.plans.dml import delete_where
    from ccdb_data_pipeline_spark.session import build_session

    spark = build_session(master=args.master, shuffle_partitions=16)
    ts = dt.datetime(2031, 1, 1)

    def timed_reads(t):
        out = []
        for _ in range(args.reps):
            t0 = time.time()
            n = t.read().count()
            out.append(round(time.time() - t0, 3))
        return n, out

    # A: tombstone path
    ta = _events_lake(spark, args.sf_dir, "compact", cache=False)
    t0 = time.time()
    delete_where(ta, args.predicate, ts=ts)
    a_delete = round(time.time() - t0, 2)
    a_rows, a_reads = timed_reads(ta)
    a_meta = ta.manifest()
    a_delta_files = sum(
        1 for fs in a_meta["buckets"].values() for e in fs if e.get("delta")
    )

    # B: deletion vectors
    tb = _events_lake(spark, args.sf_dir, "compact", cache=False)
    t0 = time.time()
    rep = tb.delete_where_dv(args.predicate, ts=ts)
    b_delete = round(time.time() - t0, 2)
    b_rows, b_reads = timed_reads(tb)
    b_meta = tb.manifest()
    b_delta_files = sum(
        1 for fs in b_meta["buckets"].values() for e in fs if e.get("delta")
    )

    assert a_rows == b_rows, (a_rows, b_rows)
    out = {
        "metric": "post-DELETE full-read seconds (tombstones vs deletion vectors)",
        "sf_dir": args.sf_dir,
        "master": args.master,
        "rows_after_delete": a_rows,
        "tombstone": {
            "delete_sec": a_delete,
            "read_secs": a_reads,
            "read_best": min(a_reads),
            "delta_files": a_delta_files,
        },
        "dv": {
            "delete_sec": b_delete,
            "read_secs": b_reads,
            "read_best": min(b_reads),
            "delta_files": b_delta_files,
            "n_positions": rep["n_dv_positions"],
        },
        "read_amplification_ratio": round(min(a_reads) / max(min(b_reads), 1e-9), 2),
    }
    print(json.dumps(out))
    for t in (ta, tb):
        shutil.rmtree(t.root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
