"""Debezium-envelope CDC wire adapter (serialize / parse, all JVM-side).

The engine's native binlog format is its own parquet/NDJSON change schema
(``schemas.CHANGE_SCHEMA``). Real upstream CDC taps (MySQL binlog, Postgres
WAL) are almost always fronted by Debezium, whose change events arrive as
JSON envelopes::

    {"payload": {"op": "c"|"u"|"d"|"r",
                 "before": {<row>}|null, "after": {<row>}|null,
                 "source": {"lsn": <long>}, "ts_ms": <long>}}

This module converts between that wire format and the canonical change
schema so a Debezium topic dump can feed the same exactly-once apply path —
the generalization of the reference's op-tagged bulk actions
(/root/reference/complaints/ccdb/index_ccdb.py:103-105) to the standard CDC
envelope. Everything is ``to_json``/``from_json`` + JVM expressions: no
Python in the row path.

Conventions (Debezium defaults):
- ``op``: c=create, u=update, d=delete, r=snapshot-read. c/r -> 'I',
  u -> 'U', d -> 'D'.
- row image: ``after`` for c/u/r; ``before`` carries the key (and last
  image) for d.
- timestamps inside row images are epoch MICROS (io.debezium.time
  MicroTimestamp), ``ts_ms`` is the connector clock in epoch millis.
- a bare payload object (no ``{"payload": ...}`` wrapper, i.e. the
  connector configured with ``schemas.enable=false``) is accepted too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_V2

_OP_TO_DBZ = {"I": "c", "U": "u", "D": "d"}


def _row_image_schema(change_schema: T.StructType) -> T.StructType:
    """Row-image struct: payload columns with timestamps as epoch-micros longs."""
    fields = []
    for f in change_schema.fields:
        if f.name in ("lsn", "op"):
            continue
        dt = T.LongType() if isinstance(f.dataType, T.TimestampType) else f.dataType
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)


def envelope_schema(change_schema: T.StructType = CHANGE_SCHEMA) -> T.StructType:
    """The Debezium payload struct for a given canonical change schema."""
    row = _row_image_schema(change_schema)
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("before", row, True),
            T.StructField("after", row, True),
            T.StructField(
                "source",
                T.StructType([T.StructField("lsn", T.LongType(), True)]),
                True,
            ),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def _image(change_schema: T.StructType) -> F.Column:
    cols = []
    for f in change_schema.fields:
        if f.name in ("lsn", "op"):
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            c = F.unix_micros(c)
        cols.append(c.alias(f.name))
    return F.struct(*cols)


def to_debezium(changes: DataFrame, change_schema: T.StructType = CHANGE_SCHEMA) -> DataFrame:
    """Serialize canonical change rows to Debezium envelope JSON strings.

    Returns one column ``value: string`` (the Kafka record value). Null
    struct fields are emitted explicitly (ignoreNullFields=false) so a null
    row column survives the round trip distinguishably from an absent one.
    """
    img = _image(change_schema)
    op = F.col("op")
    payload = F.struct(
        F.when(op == "I", F.lit("c"))
        .when(op == "U", F.lit("u"))
        .when(op == "D", F.lit("d"))
        .alias("op"),
        F.when(op == "D", img).alias("before"),
        F.when(op != "D", img).alias("after"),
        F.struct(F.col("lsn").alias("lsn")).alias("source"),
        F.unix_millis(F.coalesce(F.col("ts"), F.to_timestamp(F.lit("1970-01-01")))).alias(
            "ts_ms"
        ),
    )
    return changes.select(
        F.to_json(F.struct(payload.alias("payload")), {"ignoreNullFields": "false"}).alias(
            "value"
        )
    )


def from_debezium(
    raw: DataFrame,
    value_col: str = "value",
    change_schema: T.StructType = CHANGE_SCHEMA,
) -> DataFrame:
    """Parse Debezium envelope JSON into the canonical change schema.

    Accepts both ``{"payload": {...}}`` wrappers and bare payload objects.
    Unparseable records come out with null lsn/op/conv_id and are routed to
    the dead-letter quarantine by the normal malformed gate downstream.
    Works identically on batch and streaming DataFrames (pure projection).
    """
    env = envelope_schema(change_schema)
    wrapped = T.StructType([T.StructField("payload", env, True)])
    v = F.col(value_col)
    p = F.coalesce(F.from_json(v, wrapped).getField("payload"), F.from_json(v, env))

    op = (
        F.when(p["op"].isin("c", "r"), F.lit("I"))
        .when(p["op"] == "u", F.lit("U"))
        .when(p["op"] == "d", F.lit("D"))
    )
    row = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])

    out = [p["source"]["lsn"].alias("lsn"), op.alias("op")]
    for f in change_schema.fields:
        if f.name in ("lsn", "op"):
            continue
        c = row[f.name]
        if isinstance(f.dataType, T.TimestampType):
            c = F.timestamp_micros(c)
        else:
            c = c.cast(f.dataType)
        out.append(c.alias(f.name))
    return raw.select(*out)


def changes_as_debezium(table, from_version: int, to_version: int | None = None) -> DataFrame:
    """CDC-out relay leg: the table's snapshot-diff change feed
    (``table_changes``) re-encoded as Debezium envelopes — so a downstream
    consumer (including ANOTHER instance of this engine, via
    :func:`from_debezium` -> ``merge``) speaks the same wire format in both
    directions. ``source.lsn`` carries the feed's TO-version: monotone per
    key across successive windows, which is all the consumer's (ts, lsn)
    dominance needs for idempotent replays. Updates pair their pre+post
    images into one envelope (before+after), inserts carry after only,
    deletes carry before only — standard Debezium row-image semantics."""
    ch = table.table_changes(from_version, to_version)
    keys = list(table.spec.key_cols)
    meta = {"_change_type", "_from_version", "_to_version"}
    user_cols = [c for c in ch.columns if c not in meta]

    def img_struct(prefix_cond):
        cols = []
        for c in user_cols:
            col = F.col(c)
            if dict(ch.dtypes)[c] == "timestamp":
                col = F.unix_micros(col)
            cols.append(col.alias(c))
        return F.when(prefix_cond, F.struct(*cols))

    is_pre = F.col("_change_type").isin("delete", "update_preimage")
    is_post = F.col("_change_type").isin("insert", "update_postimage")
    tagged = ch.select(
        *keys,
        F.col("_to_version").alias("_v"),
        img_struct(is_pre).alias("_before"),
        img_struct(is_post).alias("_after"),
    )
    paired = tagged.groupBy(*keys, "_v").agg(
        F.max("_before").alias("before"), F.max("_after").alias("after")
    )
    op = (
        F.when(F.col("before").isNotNull() & F.col("after").isNotNull(), F.lit("u"))
        .when(F.col("after").isNotNull(), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    payload = F.struct(
        op.alias("op"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        F.struct(F.col("_v").cast("long").alias("lsn")).alias("source"),
        (F.coalesce(F.col("after.ts"), F.col("before.ts"), F.lit(0)) / 1000)
        .cast("long")
        .alias("ts_ms"),
    )
    return paired.select(
        F.to_json(F.struct(payload.alias("payload")), {"ignoreNullFields": "false"}).alias(
            "value"
        )
    )


def from_debezium_v2(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse the schema-evolution continuation (v2 envelopes: tool_args,
    int64 turn_idx) — the wire-format analog of the reference's v2 intake
    columns (complaints/ccdb/tests/__fixtures__/v2-intake.csv:1)."""
    return from_debezium(raw, value_col, CHANGE_SCHEMA_V2)
