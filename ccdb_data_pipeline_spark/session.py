"""SparkSession factory with the engine's scale-oriented defaults.

AQE on (runtime re-plan + skew-join splitting), UTC session timezone (so
results compare cleanly against UTC-naive oracles), Arrow enabled for the
vectorized pandas-UDF path mandated by the design (no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "transcript-cdc-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create/get a SparkSession tuned for this engine.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (or
    all cores). ``shuffle_partitions`` defaults to the core count — the
    right setting for local mode; on a real cluster it should be ~2-3x the
    total executor cores (set via ``extra_conf``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(4, ncores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow transfer batches for mapInArrow/pandas-UDF stages: the
        # fused fold concatenates a partition's batches anyway, so the 10k
        # default just buys 6x more JVM<->Python round trips (measured
        # interleaved A/B at local[8], 2M-event batches: 64k wins both reps)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # write timestamps as INT64 micros, not the deprecated INT96: INT96
        # columns carry NO parquet min/max statistics, which would blind
        # both row-group pruning on ts predicates and the manifest-level
        # time-range file pruning (per-file ts ranges from footer stats)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # local mode: the driver heap IS the executor memory — size it for the
        # machine (128 GiB here), not the default 1g/8g
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # commit task outputs directly to the destination dir (v2) instead of
        # a driver-serial rename of every task dir at job commit (v1). At
        # num_buckets*write_salt write tasks per micro-batch the v1 job-commit
        # walk is a measured ~1.4s/512-task serial constant on the apply hot
        # path. Safe here: every commit dir is attempt-unique and becomes
        # visible only via the manifest CAS, so a failed job's partial files
        # are never referenced (and orphan GC reclaims them). On real object
        # stores a cloud-native committer replaces this setting.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    # ad-hoc conf overrides for A/B runs without code edits:
    #   SPARK_GRAFT_EXTRA_CONF="spark.x=1;spark.y=2"
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for item in filter(None, env_conf.split(";")):
        k, _, v = item.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
