"""A/B: IncrementalVectorIndex.refresh with assign_engine jvm vs arrow
(round-3 verdict item #3 — the 3.8x ivf_assign_arrow fast path measured at
the operator level is now wired into the index; this measures it at the
INDEX-REFRESH level: change-feed scan + assignment + CoW merge).

Synthetic corpus (deterministic: seeded hash vectors), dim 64, k 64 —
the same shape as the round-2 operator-level measurement.

Usage: python bench/vecindex_ab.py [--rows 60000] [--dim 64] [--k 64] [--reps 2]
Appends one JSON line per engine x rep to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.operators.vecindex import IncrementalVectorIndex
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import TableSpec
    from ccdb_data_pipeline_spark.session import build_session

    spark = build_session(app_name="vecindex-ab", master=args.master,
                          shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="vecab-")
    try:
        # deterministic pseudo-random unit-ish vectors: sin(hash) per dim
        vecs = spark.range(args.rows).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(args.dim - 1)),
                lambda i: F.sin(F.xxhash64(F.col("id"), i).cast("double") / 1e9),
            ).cast("array<float>").alias("embedding"),
        )
        spec = TableSpec(
            key_cols=("vec_id",), bucket_col="vec_id", ts_col="ts", lsn_col="lsn",
            op_col="op", num_buckets=8, merge_mode="mor",
            empty_to_null_exempt=(), normalize_ws_cols=(),
        )
        src = SnapshotParquetTable(spark, os.path.join(work, "src"), spec)
        seed = vecs.withColumn("ts", F.lit(None).cast("timestamp"))
        src.create(seed.schema)
        src.merge_events(
            seed.select("*", F.col("vec_id").alias("lsn"), F.lit("I").alias("op")),
            batch_id=0,
        )
        cents = spark.range(args.k).select(
            F.col("id").alias("centroid_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(args.dim - 1)),
                lambda i: F.sin(F.xxhash64(F.col("id") + 7_777, i).cast("double") / 1e9),
            ).cast("array<float>").alias("embedding"),
        ).cache()
        cents.count()

        for rep in range(args.reps):
            for engine in ("jvm", "arrow"):
                root = os.path.join(work, f"ivx-{engine}-{rep}")
                idx = IncrementalVectorIndex(
                    spark, root, num_buckets=8, assign_engine=engine
                )
                t0 = time.time()
                idx.refresh(src, centroids=cents)
                dt = time.time() - t0
                n = idx.read().count()
                print(json.dumps({
                    "engine": engine, "rep": rep, "rows": args.rows,
                    "dim": args.dim, "k": args.k,
                    "refresh_sec": round(dt, 2), "indexed": n,
                }), flush=True)
                shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
