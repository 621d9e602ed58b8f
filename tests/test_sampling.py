"""Deterministic hash sampling (operators/sampling.py): stability under
re-partitioning, monotone nesting of rates, and threshold edges."""

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.sampling import hash_sample, hash_threshold


def _ids(df):
    return sorted(r[0] for r in df.collect())


def test_sample_is_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = _ids(hash_sample(df, "k", 0.25))
    b = _ids(hash_sample(df.repartition(17, "k"), "k", 0.25))
    c = _ids(hash_sample(df.coalesce(1), "k", 0.25))
    assert a == b == c
    # rate lands near nominal (md5 uniformity; 2000 keys, wide tolerance)
    assert 0.18 < len(a) / 2000 < 0.32


def test_samples_nest_by_rate(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s10 = set(_ids(hash_sample(df, "k", 0.10)))
    s30 = set(_ids(hash_sample(df, "k", 0.30)))
    assert s10 <= s30  # smaller sample is a subset: consistent dev subsets


def test_threshold_edges(spark):
    assert hash_threshold(0.0) == ""
    assert hash_threshold(1.0) == "ffff"
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 100


def test_consistent_across_tables(spark):
    """The same key survives in any table sampled on that key — sampled
    fact/dim tables still join (the property a rand() sample lacks)."""
    fact = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dim = spark.range(0, 500).select(F.col("id").alias("k"))
    jf = _ids(hash_sample(fact, "k", 0.2).select("k"))
    jd = _ids(hash_sample(dim, "k", 0.2).select("k"))
    assert jf == jd
