"""Sharded / multi-source CDC ingestion: N upstream binlogs, each with its
OWN monotone LSN sequence, feeding one lake table.

Real web-scale change streams are never one global log: a sharded MySQL
fleet has a binlog per shard, a Kafka-fronted source has an offset sequence
per topic-partition, Postgres logical replication a confirmed_flush_lsn per
slot. The engine core (LWW dominance, exactly-once ledger, gap audit) keys
on a single int64 LSN — this module bridges the two worlds by BIT-PACKING
``(shard_id, shard_lsn)`` into one global int64::

    global_lsn = (shard_lsn << shard_bits) | shard_id

Properties the packing preserves, by construction:

- **per-shard order**: for equal shard, packed order == shard-LSN order, so
  a shard's own replays/dedup behave exactly as before;
- **deterministic total order**: across shards the interleave is arbitrary
  but stable (same inputs -> same winners on every run/cluster) — and it is
  only ever consulted as the LWW TIE-BREAK below the event-time ``ts``, the
  semantically meaningful cross-shard ordering;
- **reversibility**: ``unpack_*`` recovers (shard, lsn) for per-shard
  lineage, watermark and gap audits downstream of the apply.

Capacity: shard_bits=10 -> 1024 shards and 2^53 events per shard. The
packing VALIDATES both bounds JVM-side (raising, not wrapping — a silent
overflow would corrupt dominance order), same strictness contract as
``operators.evolve.strict_to_timestamp``.

The reference pipeline is single-source (one Salesforce org, one watermark
— /root/reference/salesforce/harness.py:50-52); this is the web-scale
generalization the 10^10-event framing requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CHANGE_SCHEMA

SHARD_BITS_DEFAULT = 10


def _bounds(shard_bits: int) -> tuple[int, int]:
    if not 1 <= shard_bits <= 20:
        raise ValueError(f"shard_bits must be in [1, 20], got {shard_bits}")
    return (1 << shard_bits, 1 << (63 - shard_bits))


def pack_shard_lsn(shard, lsn, shard_bits: int = SHARD_BITS_DEFAULT):
    """JVM expression: global int64 LSN from (shard_id, per-shard LSN).

    Raises (job-failing) on shard_id or lsn outside the packable range —
    a wrapped value would silently reorder dominance. Null lsn stays null
    (the malformed gate downstream owns that row)."""
    n_shards, max_lsn = _bounds(shard_bits)
    shard = F.col(shard) if isinstance(shard, str) else shard
    lsn = F.col(lsn) if isinstance(lsn, str) else lsn
    shard = shard.cast("long")
    lsn = lsn.cast("long")
    bad = (
        shard.isNull() | (shard < 0) | (shard >= n_shards)
        | (lsn < 0) | (lsn >= max_lsn)
    )
    err = F.concat(
        F.lit(f"shard/lsn outside packable range (shard_bits={shard_bits}): "),
        F.concat_ws("/", shard, lsn),
    )
    packed = F.shiftleft(lsn, shard_bits) + shard
    return F.when(lsn.isNull() & ~bad, F.lit(None).cast("long")).otherwise(
        F.when(bad, F.raise_error(err).cast("long")).otherwise(packed)
    )


def unpack_shard(global_lsn, shard_bits: int = SHARD_BITS_DEFAULT):
    """Inverse of :func:`pack_shard_lsn` -> (shard_id, shard_lsn) columns."""
    c = F.col(global_lsn) if isinstance(global_lsn, str) else global_lsn
    c = c.cast("long")
    return (c.bitwiseAND(F.lit((1 << shard_bits) - 1)), F.shiftright(c, shard_bits))


def shard_feed(
    shard_frames: dict[int, DataFrame],
    lsn_col: str = "lsn",
    shard_bits: int = SHARD_BITS_DEFAULT,
) -> DataFrame:
    """Union per-shard change frames (batch OR streaming) into one canonical
    feed whose ``lsn`` is the packed global LSN. Pure projections + union —
    no shuffle; the apply path's single exchange stays the only one."""
    if not shard_frames:
        raise ValueError("no shards given")
    parts = []
    for shard_id, df in sorted(shard_frames.items()):
        parts.append(
            df.withColumn(
                lsn_col, pack_shard_lsn(F.lit(int(shard_id)), lsn_col, shard_bits)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def sharded_segments_stream(
    spark: SparkSession,
    shard_dirs: dict[int, str],
    schema: T.StructType = CHANGE_SCHEMA,
    max_files_per_trigger: int | None = 2,
    shard_bits: int = SHARD_BITS_DEFAULT,
) -> DataFrame:
    """One streaming DataFrame tailing N shard binlog directories at once.

    Each shard dir gets its own file-source (its offset log is tracked
    independently inside the ONE checkpoint of the query that consumes
    this), packed and unioned. ``maxFilesPerTrigger`` applies per source,
    so a micro-batch holds at most ``n_shards * max_files_per_trigger``
    segments — the per-shard pacing survives the union."""
    frames: dict[int, DataFrame] = {}
    for shard_id, d in shard_dirs.items():
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        frames[shard_id] = reader.parquet(d)
    return shard_feed(frames, shard_bits=shard_bits)


def shard_watermarks(
    changes: DataFrame,
    lsn_col: str = "lsn",
    shard_bits: int = SHARD_BITS_DEFAULT,
) -> DataFrame:
    """Per-shard ingest audit over a packed feed: events seen, LSN low/high
    watermark, and the gap count (``expected - seen``; >0 means the shard's
    upstream skipped or dropped sequence numbers — the multi-source analog
    of the single-log gap audit). One map-side-combining groupBy on a
    handful of shards: no skew, no second pass."""
    shard, lsn = unpack_shard(lsn_col, shard_bits)
    return (
        changes.filter(F.col(lsn_col).isNotNull())
        .select(shard.alias("shard_id"), lsn.alias("shard_lsn"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("shard_lsn").alias("lsn_min"),
            F.max("shard_lsn").alias("lsn_max"),
            (
                F.max("shard_lsn") - F.min("shard_lsn") + 1
                - F.count_distinct("shard_lsn")
            ).alias("n_gaps"),
        )
        .orderBy("shard_id")
    )
