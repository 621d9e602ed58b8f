"""IcebergTable — the production lake backend (same interface as
SnapshotParquetTable), using real Iceberg SQL: CREATE TABLE ... USING
iceberg PARTITIONED BY (bucket(N, conv_id)), MERGE INTO, snapshot metadata
tables, schema evolution via ALTER TABLE.

This sandbox has no Iceberg runtime jar and no network (verified in
SURVEY.md section 4.5), so this module is import-safe and self-disabling:
``iceberg_available(spark)`` probes the catalog, and the test suite skips
when absent. On a real cluster run with:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=<s3a://...> \\
      --py-files engine.zip run_ingest.py

Semantics parity with SnapshotParquetTable (same tests drive both when the
jar is present): LWW MERGE with tombstones, batch-id idempotence via
snapshot summary properties, schema-union evolution, per-batch lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedupe import EPOCH
from ..operators.evolve import evolve_schema
from ..schemas import DELETED, LSN_APPLIED, TS_APPLIED, TableSpec
from . import iceberg_sql
from .lake import MergeStats


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


class IcebergTable:
    """Iceberg-backed CDC target. Interface-compatible with
    SnapshotParquetTable for create/bootstrap/merge/read/history."""

    def __init__(self, spark: SparkSession, fqn: str, spec: TableSpec | None = None):
        self.spark = spark
        self.fqn = fqn  # e.g. "lake.db.transcripts"
        self.spec = spec or TableSpec()

    # -------------------------------------------------------------- DDL

    def create(self, schema: T.StructType) -> None:
        # every executed statement comes from plans/iceberg_sql builders,
        # which the test suite golden-pins jar-free (round-3 verdict #4)
        self.spark.sql(iceberg_sql.create_sql(self.fqn, schema, self.spec))

    @property
    def schema(self) -> T.StructType:
        full = self.spark.table(self.fqn).schema
        return T.StructType([f for f in full.fields if f.name not in (TS_APPLIED, LSN_APPLIED, DELETED)])

    @property
    def last_batch_id(self) -> int:
        row = self.spark.sql(iceberg_sql.last_batch_id_sql(self.fqn)).collect()
        return int(row[0]["b"]) if row else -1

    # -------------------------------------------------------------- data

    def bootstrap(self, seed_df: DataFrame, schema: T.StructType | None = None) -> None:
        df = (
            seed_df.withColumn(TS_APPLIED, F.coalesce(F.col(self.spec.ts_col), F.to_timestamp(F.lit(EPOCH))))
            .withColumn(LSN_APPLIED, F.lit(-1).cast("long"))
            .withColumn(DELETED, F.lit(False))
        )
        df.writeTo(self.fqn).append()

    def _evolve_ddl(self, source: DataFrame) -> None:
        """Apply schema-union evolution as ALTER TABLE statements (add
        columns / widen types) — Iceberg's metadata-only evolution."""
        spec = self.spec
        tgt = self.schema
        batch = T.StructType(
            [source.schema[c] for c in source.columns if c not in (spec.op_col, spec.lsn_col)]
        )
        union = evolve_schema(tgt, batch)
        tnames = {f.name: f for f in tgt.fields}
        for f in union.fields:
            if f.name not in tnames:
                self.spark.sql(
                    iceberg_sql.add_column_sql(self.fqn, f.name, f.dataType.simpleString())
                )
            elif tnames[f.name].dataType != f.dataType:
                self.spark.sql(
                    iceberg_sql.widen_column_sql(self.fqn, f.name, f.dataType.simpleString())
                )

    def merge(self, source: DataFrame, batch_id: int, summary_extra: dict | None = None) -> MergeStats:
        """MERGE INTO with LWW dominance conditions + tombstones. The source
        must be unique per key (post lww_latest)."""
        if batch_id <= self.last_batch_id:
            return MergeStats(batch_id=batch_id, skipped=True)
        spec = self.spec
        self._evolve_ddl(source)
        payload = [
            f.name
            for f in self.schema.fields
            if f.name not in spec.key_cols
        ]
        src = source.withColumn(
            "_src_ts", F.coalesce(F.col(spec.ts_col), F.to_timestamp(F.lit(EPOCH)))
        )
        src.createOrReplaceTempView("cdc_batch_src")
        self.spark.sql(
            iceberg_sql.merge_sql(self.fqn, spec, payload, list(source.columns))
        )
        # stamp batch id into the snapshot summary (exactly-once ledger)
        self.spark.sql(iceberg_sql.set_batch_property_sql(self.fqn, batch_id))
        return MergeStats(batch_id=batch_id, skipped=False)

    def read(self, include_internal: bool = False) -> DataFrame:
        df = self.spark.table(self.fqn).filter(~F.col(DELETED))
        if not include_internal:
            df = df.drop(TS_APPLIED, LSN_APPLIED, DELETED)
        return df

    def history(self) -> list[dict]:
        return [r.asDict() for r in self.spark.sql(f"SELECT * FROM {self.fqn}.snapshots").collect()]

    def compact(self) -> None:
        self.spark.sql(iceberg_sql.compact_sql(self.fqn))
