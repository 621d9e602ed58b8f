"""Iceberg-runtime parity check (round-4 verdict item #6): when an
iceberg-spark runtime jar is available, create/merge/compact each engine
table spec through plans/iceberg.py (real CREATE TABLE ... USING iceberg,
MERGE INTO, CALL rewrite_data_files) and assert state equality against a
SnapshotParquetTable twin fed the same batches. Runs in its OWN process
so the session extensions conf (required for CALL procedures) applies to
a fresh JVM.

    python scripts/iceberg_parity_check.py --jar /path/to/iceberg-spark-runtime.jar
    # or on a real cluster (network available):
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        scripts/iceberg_parity_check.py

Prints PARITY OK on success; nonzero exit on any mismatch.
tests/test_iceberg_integration.py invokes this and self-skips when no
jar is present (as in this sandbox — no jar, no network)."""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, types as T  # noqa: E402

from ccdb_data_pipeline_spark.operators.dedupe import lww_latest  # noqa: E402
from ccdb_data_pipeline_spark.plans.iceberg import IcebergTable, iceberg_available  # noqa: E402
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable  # noqa: E402
from ccdb_data_pipeline_spark.schemas import AGG_N, AGG_RESET, TableSpec  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
BASE = dict(key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
            op_col="op", num_buckets=4, merge_mode="mor",
            empty_to_null_exempt=(), normalize_ws_cols=())
T0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

# (k, v, note, ts_minutes, lsn, op) — collisions, out-of-order, deletes,
# patches, plus a second batch that evolves the schema (new column)
BATCH1 = [
    ("a", 1, "a1", 0, 1, "I"), ("b", 2, "b1", 0, 2, "I"),
    ("a", 10, "a2", 5, 3, "U"), ("c", 3, "c1", 1, 4, "I"),
]
BATCH2 = [
    ("b", 20, None, 10, 5, "P"), ("c", None, None, 11, 6, "D"),
    ("d", 4, "d1", 2, 7, "I"), ("a", 99, "a3", 3, 8, "U"),  # stale ts: loses
]
ENGINES = {
    "lww": {},
    "first_row": {"first_row": True},
    "patch": {"partial_updates": True},
    "agg": {"agg_spec": {"v": "sum", "note": "last"}},
}


def _events_df(spark, rows):
    sch = T.StructType(list(SCHEMA.fields) + [
        T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())
    ])
    return spark.createDataFrame(
        [(k, v, n, T0 + dt.timedelta(minutes=m), lsn, op)
         for (k, v, n, m, lsn, op) in rows], sch)


def _batches_for(kind):
    if kind == "patch":
        return [BATCH1, BATCH2]
    out = [[(k, v, n, m, lsn, "U" if op == "P" else op) for (k, v, n, m, lsn, op) in b]
           for b in (BATCH1, BATCH2)]
    if kind == "agg":
        # agg partials carry no deletes in this parity run (reset-cutoff
        # folding is the parquet engine's fold; the MERGE combine itself
        # is what the jar path must prove)
        out = [[r for r in b if r[5] != "D"] for b in out]
    return out


def _iceberg_source(spark, spec, kind, rows):
    """Per-key source view matching what each engine's MERGE expects:
    unique per key (LWW winner / first-row earliest / patch latest), or
    per-key accumulator partials for agg."""
    df = _events_df(spark, rows)
    if kind == "agg":
        return (
            df.groupBy("k")
            .agg(
                F.sum("v").alias("v"),
                F.expr("max_by(note, struct(ts, lsn))").alias("note"),
                F.max("ts").alias("ts"),
                F.max("lsn").alias("lsn"),
                F.lit(False).alias(AGG_RESET),
                F.count(F.lit(1)).cast("long").alias(AGG_N),
                F.lit("U").alias("op"),
            )
        )
    if kind == "first_row":
        from pyspark.sql.window import Window

        return df.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("k").orderBy("ts", "lsn")),
        ).filter("_rn = 1").drop("_rn")
    return lww_latest(df, keys=["k"], ts_col="ts", lsn_col="lsn")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jar", default=os.environ.get("ICEBERG_JAR"))
    args = ap.parse_args()
    wh = tempfile.mkdtemp(prefix="iceberg-parity-wh-")
    b = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-parity")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", wh)
    )
    if args.jar:
        b = b.config("spark.jars", args.jar)
    spark = b.getOrCreate()
    if not iceberg_available(spark, "lake"):
        print("NO ICEBERG RUNTIME")
        return 2
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")

    failures = []
    for kind, eng_kw in ENGINES.items():
        if kind == "patch":
            eng_kw = dict(eng_kw)  # no sequence_groups: SQL MERGE refuses them
        spec = TableSpec(**BASE, **eng_kw)
        ice = IcebergTable(spark, f"lake.db.parity_{kind}", spec)
        ice.create(SCHEMA)
        twin = SnapshotParquetTable(
            spark, tempfile.mkdtemp(prefix=f"parity-{kind}-"), spec
        )
        twin.create(SCHEMA)
        for i, rows in enumerate(_batches_for(kind)):
            ice.merge(_iceberg_source(spark, spec, kind, rows), batch_id=i)
            twin.merge_events(_events_df(spark, rows), batch_id=i)
        ice.compact()
        # exactly-once: replaying the last batch is a no-op
        ice.merge(_iceberg_source(spark, spec, kind, _batches_for(kind)[-1]),
                  batch_id=len(_batches_for(kind)) - 1)
        cols = ["k", "v", "note"]
        got = sorted(map(tuple, ice.read().select(*cols).collect()))
        want = sorted(map(tuple, twin.refresh().read().select(*cols).collect()))
        if got != want:
            failures.append((kind, got, want))
            print(f"MISMATCH {kind}: iceberg={got} parquet={want}")
        else:
            print(f"ok {kind}: {len(got)} rows equal")
    if failures:
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
