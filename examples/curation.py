"""End-to-end training-data curation demo: documents table → quality gate →
duplicate-span audit → composed keep/drop verdict → weighted source mix →
deterministic shard export.

    python examples/curation.py [sf_dir] [workdir]

Defaults to the driver's sf0.001 test tables. Everything is a pure function
of the input keys — re-running produces byte-identical shards.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.benchqueries import QUERIES
from ccdb_data_pipeline_spark.operators.export import export_shards
from ccdb_data_pipeline_spark.operators.sampling import dataset_mix
from ccdb_data_pipeline_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curation-")
    spark = build_session(app_name="curation-demo", master="local[4]",
                          shuffle_partitions=8)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"corpus: {n0} docs from {sf_dir}")

    # 1. composed verdict: exact dedup + near-dup clusters + Gopher quality
    verdicts = QUERIES["dedup_decisions"](spark, sf_dir)
    by_verdict = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    print("verdicts:", dict(sorted(by_verdict.items())))
    kept = docs.join(
        verdicts.filter(F.col("verdict") == "keep").select("doc_id"), "doc_id"
    )

    # 2. duplicate-span audit on the survivors (memorization risk signal)
    spans = QUERIES["dup_span_stats"](spark, sf_dir).join(
        kept.select("doc_id"), "doc_id"
    )
    risky = spans.filter(F.col("shared_bp") >= 5000).count()
    print(f"span audit: {risky} kept docs have >=50% shared 5-gram spans")

    # 3. weighted mix: upsample src0, downsample the tail
    mixed = dataset_mix(
        kept, "source", "doc_id", {"src0": 1.0, "src1": 0.5}, default_rate=0.25
    )
    print(f"mix: {mixed.count()} docs after weighting")

    # 4. deterministic shard export for the trainer
    out = os.path.join(work, "shards")
    manifest = export_shards(mixed, out, "doc_id", n_shards=4)
    print("export:", manifest["rows_per_shard"], "->", out)

    spark.stop()


if __name__ == "__main__":
    main()
