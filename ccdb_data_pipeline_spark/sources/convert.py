"""CSV <-> JSON record conversion — the reference's csv2json converter
(/root/reference/common/csv2json.py) re-expressed as DataFrame I/O.

Operator parity (SURVEY.md section 2.1/2.2):
- S4 CSV scan w/ header           -> ``read_csv`` (header=true, FAILFAST)
- P1 positional column rename     -> ``fields`` override with the reference's
  hard arity check (csv2json.py:74-85: column-count mismatch is fatal)
- P9 row limit                    -> ``limit`` (csv2json.py:94-95)
- S5 NDJSON scan                  -> ``read_ndjson`` (index_ccdb.py:98-100)
- S6 NDJSON sink                  -> ``write_ndjson`` (csv2json.py:26-35)
- S7 JSON-array sink              -> ``json_array`` (csv2json.py:38-51) —
  driver-side by design: the reference emits ONE json document; at scale use
  write_ndjson (line-delimited shards) instead
- S8 CSV sink w/ header override  -> ``write_csv`` (s3_utils.py:122-135)
- P10 progress heartbeat          -> per-batch lineage metrics (lineage.py),
  not a row counter: a distributed scan has no meaningful global row index

Unlike the reference, conversion is distributed and columnar end-to-end:
no per-row Python, order preserved only where an explicit sort says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class FieldArityError(ValueError):
    """Override field list does not match the source column count
    (the reference exits ENOENT here, csv2json.py:78-85)."""


def read_csv(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
    limit: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """CSV scan with header; optional positional rename to ``fields``."""
    reader = spark.read.option("header", "true").option("mode", "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if fields is not None:
        if len(fields) != len(df.columns):
            raise FieldArityError(
                f"field override has {len(fields)} names but source has "
                f"{len(df.columns)} columns: {df.columns}"
            )
        df = df.toDF(*fields)
    if limit is not None:
        df = df.limit(limit)
    return df


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.json(path)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON shards (the scale path for S6)."""
    df.write.mode(mode).json(path)


def json_array(df: DataFrame, order_by: list[str] | None = None) -> str:
    """One JSON array document (S7). Collects to the driver — only for
    result sets known to be small (the reference's use case: a single
    downloadable artifact).

    With ``order_by`` the frame is coalesced to ONE partition and sorted
    within it before the collect_list agg: an ungrouped agg over a
    multi-partition sorted frame would fetch shuffle blocks in
    non-deterministic order and silently unsort the array."""
    if order_by:
        df = df.coalesce(1).sortWithinPartitions(*order_by)
    row = df.agg(F.to_json(F.collect_list(F.struct(*df.columns))).alias("j")).collect()
    return row[0]["j"]


def write_csv(
    df: DataFrame, path: str, header_names: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """CSV sink; ``header_names`` re-emits under a public header (S8) with
    the same arity check as the read side."""
    if header_names is not None:
        if len(header_names) != len(df.columns):
            raise FieldArityError(
                f"header override has {len(header_names)} names but frame has "
                f"{len(df.columns)} columns"
            )
        df = df.toDF(*header_names)
    df.write.mode(mode).option("header", "true").csv(path)
