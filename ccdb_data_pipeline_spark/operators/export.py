"""Deterministic training-shard export: a global pseudo-random shuffle of a
corpus, materialized as N self-contained shards.

Trainers want the corpus in a fixed pseudo-random order, split into shards a
data-loader can stream independently — and they want the SAME order on every
re-export, regardless of cluster size, partition count, or which engine ran
it. A ``rand()`` shuffle gives none of that. Here both the shard assignment
and the within-shard position are pure functions of the row key:

    digest = md5(key || salt)
    shard  = int(digest[:4], 16) % n_shards
    pos    = rank of digest within the shard

so the layout is reproducible across re-runs and engines (md5 is
bit-identical everywhere — the same property the sampling/mixing operators
lean on), and changing ``salt`` is a fresh epoch-level reshuffle without
touching the data. The reference has no export path at all (its sink is an
ES index, index_ccdb.py:149-175); this is the training-data twin.

Scale shape: assignment is map-side; the only shuffle is the repartition to
shards, and the within-shard sort is the price of a total order — paid
per-shard in parallel, never globally. Shards are md5-uniform in size, so
no task skew.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_layout(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Assign (shard, pos) to every row — the deterministic global-shuffle
    layout. ``pos`` is 1-based and gap-free within each shard; ties cannot
    occur for distinct keys (md5 injective in practice; key breaks the
    residual tie deterministically)."""
    from pyspark.sql import Window as W

    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = (F.conv(F.substring(digest, 1, 4), 16, 10).cast("long") % n_shards).cast(
        "int"
    )
    out = df.withColumn("_digest", digest).withColumn("shard", shard)
    w = W.partitionBy("shard").orderBy("_digest", F.col(key_col))
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_digest")


def export_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    columns: list[str] | None = None,
) -> dict:
    """Write the corpus as ``n_shards`` parquet shard directories, each
    holding EXACTLY ONE file with rows in the deterministic shuffle order,
    plus a MANIFEST.json with per-shard row counts.

    One file per shard: all rows of a shard hash to the same partition
    (repartition on the shard column), and the partitionBy writer splits
    any partition that carries two shards into separate directories — so
    every ``shard=K`` directory gets a single sorted file a data-loader
    can stream sequentially."""
    laid = shard_layout(df, key_col, n_shards, salt=salt)
    if columns is not None:
        laid = laid.select(*columns, "shard", "pos")
    (
        laid.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    counts = {
        int(r["shard"]): r["n"]
        for r in spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "salt": salt,
        "key_col": key_col,
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(n_shards)},
        "n_rows": sum(counts.values()),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def dirty_shards(
    changed_keys: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> list[int]:
    """Shard ids whose membership a set of changed keys touches — a pure
    map-side projection of the same md5 layout function (deletes count:
    the shard must be rewritten WITHOUT the key)."""
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = (F.conv(F.substring(digest, 1, 4), 16, 10).cast("long") % n_shards).cast("int")
    return sorted(
        r["shard"] for r in changed_keys.select(shard.alias("shard")).distinct().collect()
    )


def export_shards_incremental(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    changed_keys: DataFrame,
    columns: list[str] | None = None,
) -> dict:
    """Refresh an existing deterministic export in O(changed shards):
    because shard assignment AND in-shard order are pure functions of the
    key, a conversation's edit can only affect the one shard its key hashes
    to — so only shards containing a changed key are re-rendered and
    re-sorted; every clean shard's file is left byte-untouched on disk
    (checked by filename in the tests, enforced by dynamic partition
    overwrite). The result is IDENTICAL to a full re-export — the
    incremental path is an IO optimization, not an approximation.

    ``df`` must be the FULL current corpus (a dirty shard's in-shard ranks
    depend on all of its surviving rows); ``changed_keys`` must carry every
    inserted, updated, AND deleted key since the last export — exactly what
    the lake table's change feed (``table_changes``) emits. Layout
    parameters come from the existing MANIFEST.json so an incremental
    refresh can never silently diverge from the base export's epoch.
    """
    mpath = os.path.join(out_dir, "MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no MANIFEST.json under {out_dir}: incremental export needs a "
            "base export (run export_shards first)"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    n_shards, salt = manifest["n_shards"], manifest["salt"]
    if manifest["key_col"] != key_col:
        raise ValueError(
            f"manifest key_col {manifest['key_col']!r} != requested {key_col!r}"
        )

    dirty = dirty_shards(changed_keys, key_col, n_shards, salt=salt)
    if not dirty:
        return {**manifest, "shards_rewritten": []}

    laid = shard_layout(df, key_col, n_shards, salt=salt).filter(
        F.col("shard").isin(dirty)
    )
    if columns is not None:
        laid = laid.select(*columns, "shard", "pos")
    counts = {
        int(r["shard"]): r["n"]
        for r in laid.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    (
        laid.repartition(max(len(dirty), 1), "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # dynamic overwrite never writes an empty partition: a shard whose last
    # key was deleted must have its stale directory removed by hand
    import shutil

    for s in dirty:
        if counts.get(s, 0) == 0:
            d = os.path.join(out_dir, f"shard={s}")
            if os.path.isdir(d):
                shutil.rmtree(d)

    for s in dirty:
        manifest["rows_per_shard"][str(s)] = counts.get(s, 0)
    manifest["n_rows"] = sum(manifest["rows_per_shard"].values())
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return {**manifest, "shards_rewritten": dirty}
