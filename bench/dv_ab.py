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
    ap.add_argument("--synthetic", type=int, default=0,
                    help="instead of the events testdata, build an N-row "
                         "transcript table (40-word texts) — big enough "
                         "that the tombstone path's read-time resolve "
                         "actually shows its amplification")
    args = ap.parse_args()

    from ccdb_data_pipeline_spark.benchqueries import _events_lake
    from ccdb_data_pipeline_spark.plans.dml import delete_where
    from ccdb_data_pipeline_spark.session import build_session

    spark = build_session(master=args.master, shuffle_partitions=16)
    ts = dt.datetime(2031, 1, 1)

    if args.synthetic:
        run_synthetic(spark, args, ts)
        spark.stop()
        return

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



def run_synthetic(spark, args, ts) -> None:
    """N-row transcript table from spark.range (40-word texts), compacted;
    delete ~20% of rows by predicate through both paths."""
    import json as _json
    import shutil as _sh
    import tempfile
    import time as _t
    import uuid

    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.plans.dml import delete_where
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec

    n = args.synthetic
    words = F.concat_ws(
        " ", *[F.concat(F.lit("w"), F.pmod(F.col("id") * (i + 7), F.lit(997)).cast("string"))
               for i in range(40)]
    )
    seed = spark.range(n).select(
        F.concat(F.lit("c"), (F.col("id") % (n // 10)).cast("string")).alias("conv_id"),
        (F.col("id") / (n // 10)).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 3 == 0, "user").otherwise("assistant").alias("role"),
        words.alias("text"),
        F.when(F.col("id") % 5 == 0, "bash").alias("tool"),
        F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id")).alias("ts"),
    )
    pred = "role = 'user' AND turn_idx % 2 = 0"

    def build(name):
        t = SnapshotParquetTable(
            spark,
            tempfile.mkdtemp(prefix=f"dvab-{name}-"),
            TableSpec(num_buckets=16, merge_mode="mor"),
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, seed)
        t.compact(only_dirty=False)
        return t

    def timed_reads(t):
        out = []
        for _ in range(args.reps):
            t0 = _t.time()
            c = t.read().count()
            out.append(round(_t.time() - t0, 3))
        return c, out

    ta = build("tomb")
    t0 = _t.time(); delete_where(ta, pred, ts=ts); a_del = round(_t.time() - t0, 2)
    a_rows, a_reads = timed_reads(ta)
    a_delta = sum(1 for fs in ta.manifest()["buckets"].values() for e in fs if e.get("delta"))

    tb = build("dv")
    t0 = _t.time(); rep = tb.delete_where_dv(pred, ts=ts); b_del = round(_t.time() - t0, 2)
    b_rows, b_reads = timed_reads(tb)
    b_delta = sum(1 for fs in tb.manifest()["buckets"].values() for e in fs if e.get("delta"))

    assert a_rows == b_rows, (a_rows, b_rows)
    print(_json.dumps({
        "metric": "post-DELETE full-read seconds (tombstones vs deletion vectors, synthetic)",
        "n_rows": n, "rows_after_delete": a_rows, "master": args.master,
        "tombstone": {"delete_sec": a_del, "read_best": min(a_reads),
                       "read_secs": a_reads, "delta_files": a_delta},
        "dv": {"delete_sec": b_del, "read_best": min(b_reads),
                "read_secs": b_reads, "delta_files": b_delta,
                "n_positions": rep["n_dv_positions"]},
        "read_amplification_ratio": round(min(a_reads) / max(min(b_reads), 1e-9), 2),
        "delete_cost_ratio": round(a_del / max(b_del, 1e-9), 2),
    }))
    for t in (ta, tb):
        _sh.rmtree(t.root, ignore_errors=True)

if __name__ == "__main__":
    main()
