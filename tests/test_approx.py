"""Approximate aggregation (sketch) coverage: HLL++ distinct counting and
the GK quantile sketch — Spark's built-in mergeable sketches, verified
against exact answers within their published error bounds. Sketches are
partial-aggregable (merged map-side per partition), which is what makes
them the 100 TB path where exact distinct/percentile would shuffle every
value."""

from pyspark.sql import functions as F


def test_hll_distinct_within_rsd(spark):
    n_distinct = 50_000
    df = spark.range(n_distinct * 4).select(
        (F.col("id") % n_distinct).alias("k")
    )
    approx = df.agg(F.approx_count_distinct("k", rsd=0.02).alias("a")).first()["a"]
    assert abs(approx - n_distinct) / n_distinct < 0.06  # 3x rsd margin

    # partitioning-invariant: the sketch merges across any partitioning
    approx2 = (
        df.repartition(37)
        .agg(F.approx_count_distinct("k", rsd=0.02).alias("a"))
        .first()["a"]
    )
    assert approx == approx2


def test_quantile_sketch_rank_error(spark):
    n = 100_000
    df = spark.range(n).select(F.col("id").alias("v"))
    eps = 0.01
    got = df.stat.approxQuantile("v", [0.25, 0.5, 0.99], eps)
    for q, g in zip([0.25, 0.5, 0.99], got):
        rank = g / (n - 1)
        assert abs(rank - q) <= eps + 1e-9  # GK guarantee: rank error <= eps


def test_grouped_hll(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 5_000).alias("k")
    )
    rows = {
        r["g"]: r["a"]
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("k", rsd=0.05).alias("a"))
        .collect()
    }
    for g in (0, 1, 2):
        assert abs(rows[g] - 5_000) / 5_000 < 0.15
