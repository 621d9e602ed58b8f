"""Schemas and the TableSpec that parameterizes the CDC engine.

The canonical table is the transcript table from the design brief:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` keyed on ``(conv_id, turn_idx)`` — the analog of the
reference's documents keyed on ``complaint_id``
(/root/reference/complaints/ccdb/index_ccdb.py:103).

The change event is the reference's op-tagged bulk action
(index_ccdb.py:103-105) generalized with a monotonic LSN (the exactly-once
token, generalizing the ``LastModifiedDate >= watermark`` delta pull at
/root/reference/salesforce/query.py:32-33).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------- schemas

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("conv_id", T.StringType(), True),  # null => malformed, dropped
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# v2 = schema-evolution continuation: adds nullable tool_args (column add)
# and widens turn_idx int32 -> int64 — mirrors the reference's v1->v2
# intake-column add (complaints/ccdb/tests/__fixtures__/v2-intake.csv:1).
CHANGE_SCHEMA_V2 = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("tool_args", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("n_insert", T.LongType(), False),
        T.StructField("n_update", T.LongType(), False),
        T.StructField("n_delete", T.LongType(), False),
        T.StructField("n_malformed", T.LongType(), False),
        T.StructField("n_partitions", T.IntegerType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# Hidden bookkeeping columns stored in the lake table's data files.
TS_APPLIED = "_ts_applied"  # event-time of the last applied writer (LWW major key)
LSN_APPLIED = "_lsn_applied"  # LSN of the last applied writer (LWW tie-break)
DELETED = "_deleted"  # tombstone flag: wins LWW against stale late updates
BUCKET = "_bucket"  # storage bucket = pmod(xxhash64(conv_id), num_buckets)
PATCH = "_patch"  # partial-update row: non-null payload cols overlay the base
AGG_RESET = "_agg_reset"  # aggregation engine: this layer contains a delete —
#   discard every OLDER layer for the key (this layer's partial already
#   excludes the key's pre-delete events)
AGG_N = "_n_contrib"  # aggregation engine: events folded into this partial
#   (0 = pure tombstone); the resolve's liveness test is sum(_n_contrib) > 0

INTERNAL_COLS = (TS_APPLIED, LSN_APPLIED, DELETED, BUCKET)


@dataclass(frozen=True)
class TableSpec:
    """Declarative description of a CDC-maintained table."""

    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    bucket_col: str = "conv_id"  # bucket on the conversation so all turns co-locate
    ts_col: str = "ts"
    lsn_col: str = "lsn"
    op_col: str = "op"
    num_buckets: int = 16
    # merge strategy: "cow" (copy-on-write — each batch rewrites affected
    # buckets; reads are plain scans) or "mor" (merge-on-read — each batch
    # appends LWW-versioned delta files; reads resolve the winner per key;
    # compaction folds deltas back into the base). MoR makes apply cost
    # O(batch) instead of O(affected-bucket data): the right trade for a
    # high-rate CDC tail (Iceberg's own copy-on-write vs merge-on-read knob).
    merge_mode: str = "cow"
    # in MoR mode, auto-compact after this many committed merge batches
    # (0 = only on explicit compact()); bounds read amplification.
    compact_every: int = 0
    # MoR write-path depth (the Hudi/Iceberg ingest-latency menu):
    #   True  — fused apply: LWW-dedup + normalize inside the bucket
    #           partition (one Arrow pass) before writing delta files;
    #   False — raw append: write every version row JVM-only (no Python in
    #           the apply path at all); dedup AND normalization defer to
    #           read-time resolve / compaction. Maximum apply throughput,
    #           higher read amplification until compaction runs.
    dedupe_on_write: bool = True
    # sub-bucket write salt: the fused apply repartitions to
    # num_buckets * write_salt partitions on (bucket, hash(turn_idx) % salt).
    # A Zipf-hot conv_id concentrates ~6% of a batch in ONE bucket partition;
    # salting by turn_idx keeps every (conv_id, turn_idx) key's rows together
    # (dedup stays partition-local) while splitting a hot conversation's
    # turns across salt sub-partitions.
    #
    # Default "auto": salt = clamp(1, 16, ceil(8 * cores / num_buckets)), so
    # the apply stage runs ~8x-cores partitions regardless of bucket count —
    # enough waves that a Zipf-hot partition amortizes instead of walling
    # the stage, and no more tasks than the parallelism warrants (each extra
    # task costs ~20ms of Python/parquet setup plus a file). The rule
    # reproduces the measured optimum in every benched cell (BENCH.md
    # "Write-salt A/B", 2M-event batches, 100-word texts, steal-free):
    #   local[2]/16 buckets  -> 1  (103k ev/s; fixed salt 4 = 68k)
    #   local[8]/16 buckets  -> 4  (304-318k; salt 1 = 236-245k)
    #   local[8]/64 buckets  -> 1  (313-349k; salt 4 = 206-208k)
    #   local[32]/32 buckets -> 8  (389-420k; salt 4 = 291-374k)
    # An int pins the sub-bucket fan manually (1 = off); on a real cluster
    # "auto" scales salt with executor count, keeping per-core task
    # granularity constant as the cluster grows.
    write_salt: int | str = "auto"
    # payload string columns normalized ""->null, EXCEPT the carve-out —
    # the reference nulls every empty field then restores the narrative
    # (index_ccdb.py:32-36); our narrative analog is `text`.
    empty_to_null_exempt: tuple[str, ...] = ("text",)
    normalize_ws_cols: tuple[str, ...] = ("text",)
    # partial-update merge (Hudi/Paimon "partial-update" engine, MoR only):
    # op 'P' events carry only the columns they change (NULL = don't touch);
    # the resolve overlays each column's latest writer onto the latest full
    # image. A patch never creates, deletes, or resurrects a row. See
    # operators/patch.py for the standalone resolve and its NULL caveat.
    partial_updates: bool = False
    # sequence groups (Paimon "fields.<seq>.sequence-group" analog; requires
    # partial_updates): {seq_col: (member_col, ...)} — the listed payload
    # columns are versioned by their OWN integer sequence column instead of
    # the row's (ts, lsn) order, so N upstreams each owning a column subset
    # can patch the same row without arrival order (LSN) letting a late
    # replay clobber newer values. The group updates ATOMICALLY from the
    # group-writer with the greatest (seq, lsn) — argmax semantics, so the
    # result is a pure function of the event set (batch-boundary invariant,
    # unlike Paimon's stored-seq gate). A patch with a NULL seq never
    # touches its group. See operators/patch.py seq_group_aggs.
    sequence_groups: dict | None = None
    # aggregation merge engine (Paimon "aggregation" analog, MoR only,
    # mutually exclusive with partial_updates): map of payload column ->
    # aggregate function ("sum" | "min" | "max" | "last"); unlisted payload
    # columns default to "last" (latest non-null, log order). Events FOLD
    # INTO the stored row (the table is the accumulator); a delete RESETS
    # the key. Storage holds mergeable per-batch PARTIALS; read/compaction
    # merges them — see operators/aggmerge.py for the algebra.
    agg_spec: dict | None = None
    # write-time data-quality expectations (Delta constraint / DLT
    # expectation analog): (name, sql_predicate_that_must_hold, action)
    # triples, evaluated per NON-DELETE source event inside the apply job's
    # existing observe/filter node — no extra pass. A NULL predicate counts
    # as a violation (DLT semantics). Actions:
    #   "warn" — keep the row, count the violation (lineage summary);
    #   "drop" — exclude the row (dead-letters when a quarantine_dir is
    #            configured), count it;
    #   "fail" — abort the batch BEFORE the manifest commit (written files
    #            stay unreferenced -> orphan GC; replay of the repaired
    #            batch is clean because nothing was committed).
    expectations: tuple = ()
    # first-row merge engine (Paimon merge-engine=first-row analog, MoR
    # only, exclusive with partial_updates/agg_spec): the FIRST writer per
    # key wins by (ts, lsn) — later events are ignored (at-source insert
    # dedup: claim-once semantics under at-least-once upstreams). Unlike
    # Paimon, deletes ARE supported and dominate permanently: a 'D' erases
    # the key and later events do not resurrect it (the GDPR-erasure
    # contract); reclaim tombstones only past the lateness horizon, as with
    # LWW tables.
    first_row: bool = False
    # write a parquet bloom filter for the bucket column in LONG-LIVED data
    # files (bootstrap, CoW rewrites, compaction output — not MoR delta
    # appends, which are folded away before a bloom earns its ~3-4% write
    # cost). Bucket pruning narrows a point lookup to 1/num_buckets of the
    # table; the bloom then skips row groups inside the bucket whose files
    # don't contain the probed key — the third level of the Iceberg-style
    # point-read path at 10^10 rows. parquet-mr skips the bloom for fully
    # dictionary-encoded chunks (the dictionary is already an exact filter),
    # so small/low-cardinality files pay nothing.
    bloom_filter: bool = True
    # parquet codec for short-lived MoR delta files only (None = session
    # default, zstd). Deltas are folded away by compaction, so their
    # compression ratio buys little — lz4 trades ~2x transient disk for
    # apply-path CPU (interleaved A/B at local[8], 2M-event batches:
    # lz4 239.0k/235.8k ev/s vs zstd 224.6k/210.6k, wins both reps; snappy
    # mixed). Base/CoW/compaction output always uses the session codec, so
    # long-lived bytes stay zstd-small; readers auto-detect per file.
    delta_codec: str | None = "lz4"
    # fused-fold execution engine: "arrow" runs the per-bucket LWW dedup +
    # normalization as pyarrow.compute kernels inside mapInArrow (no
    # Arrow->pandas conversion — payload strings never materialize as Python
    # objects); "pandas" is the mapInPandas fold; "jvm" is an all-Catalyst
    # fold (max_by groupBy that reuses the write repartition via the subset
    # rule — one exchange total — plus expression-level normalization): no
    # Python worker anywhere, for deployments where Python workers are
    # unavailable or cold-start-expensive. All three are byte-identical
    # (tested). Arrow stays the default on measurement: the jvm plan is a
    # SortAggregate whose max_by struct buffer copies the full text payload
    # through sort+agg, while the arrow fold sorts dominance columns only
    # and gathers payload once, for winners — interleaved A/B (local[8],
    # 2M events, 100-word texts): arrow 293.6k ev/s vs jvm 230.5k on the
    # cleanest reps (see BENCH.md). Partial-update/agg/first-row tables
    # always use the pandas fold.
    fold_engine: str = "arrow"
    # after a rename_column DDL, producers may lag a deploy cycle and keep
    # emitting the OLD column name. With this on (default), merge paths map
    # a batch column that matches a rename's retired name onto the current
    # name — but only when the batch lacks the current name (the unambiguous
    # lag case). Turn off to treat incoming names strictly literally (a
    # retired name then union-evolves into a brand-new column, Iceberg's
    # strict behavior).
    remap_renamed_columns: bool = True
    # split LONG-LIVED data files (bootstrap / CoW / compaction output) at
    # this many rows (Iceberg write.target-file-size analog, row-count
    # form). At 10^10 rows / 4096 buckets a compacted bucket holds ~2.4M
    # rows — one monolithic file per bucket caps read parallelism at one
    # task per bucket and makes object-store range reads coarse; splitting
    # keeps scan tasks balanced. The manifest tracks N files per bucket
    # natively (MoR already does), readers/point-lookups are unaffected
    # (winners stay disjoint across the split). None = one file per bucket
    # partition. MoR delta appends are never split (they are already
    # batch-sized and short-lived).
    max_file_rows: int | None = 4_000_000
    # declared column-statistics columns (Iceberg metrics-config analog):
    # the footer scan records per-FILE min/max for each listed payload
    # column into the manifest entry ({"stats": {col: [min, max]}}), and
    # read(where=[(col, op, value), ...]) / the DataSource pushed-filter
    # path skip whole files (and whole buckets, all-or-nothing under MoR
    # deltas) on ANY of them before a single byte of data is opened — the
    # biggest IO lever a 100 TB scan has beyond bucketing. Event-time
    # (``ts_col``) and the bucket key are always pruned natively; declare
    # here the OTHER payload columns queries range over. Costless at write
    # (the footer scan already reads those footers); per-entry manifest
    # bytes are the only overhead, so declare the few columns that matter
    # rather than every column.
    stats_cols: tuple[str, ...] = ()

    def bloom_write_options(self) -> dict[str, str]:
        if not self.bloom_filter:
            return {}
        return {f"parquet.bloom.filter.enabled#{self.bucket_col}": "true"}

    def payload_cols(self, schema: T.StructType) -> list[str]:
        meta = {self.lsn_col, self.op_col, *self.key_cols}
        return [f.name for f in schema.fields if f.name not in meta]
