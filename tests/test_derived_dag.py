"""The full incremental derived-data DAG, end to end:

    transcripts (CDC)  ->  conversation documents (IncrementalDocView)
                       ->  document embeddings (change-feed propagation)
                       ->  IVF vector index (IncrementalVectorIndex)

Every hop refreshes from the previous hop's CHANGE FEED — O(changed
conversations) at each stage, never O(corpus) — and the final ANN index
must equal a fresh assignment of the current corpus after mid-conversation
edits that move a document between clusters and deletes that must
propagate all the way through (no resurrection at any hop)."""

from datetime import datetime

import pandas as pd

from ccdb_data_pipeline_spark.operators.similarity import ivf_assign
from ccdb_data_pipeline_spark.operators.vecindex import IncrementalVectorIndex
from ccdb_data_pipeline_spark.plans.ivm import IncrementalDocView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

TS = datetime(2025, 1, 1)
TS2 = datetime(2025, 1, 2)

# deterministic "embedding": topic axis 0 if the doc mentions alpha, axis 1
# if beta — a stand-in for a real encoder that keeps cluster membership a
# pure function of the rendered text
_EMBED = (
    "CAST(array(CASE WHEN doc LIKE '%alpha%' THEN 1.0 ELSE 0.05 END, "
    "           CASE WHEN doc LIKE '%beta%'  THEN 1.0 ELSE 0.05 END, "
    "           0.01) AS array<float>)"
)

VEC_SPEC = TableSpec(
    key_cols=("conv_id",),
    bucket_col="conv_id",
    ts_col="_e_ts",
    lsn_col="_e_lsn",
    op_col="op",
    num_buckets=2,
    merge_mode="mor",
    empty_to_null_exempt=(),
    normalize_ws_cols=(),
)


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def _centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            ]
        ),
    )


class _Dag:
    """transcripts -> docview -> embedded vec table -> vector index, each
    hop driven by the previous hop's change feed."""

    def __init__(self, spark, root):
        self.spark = spark
        self.t = SnapshotParquetTable(
            spark, str(root / "t"), TableSpec(num_buckets=2, merge_mode="mor")
        )
        self.t.create(TRANSCRIPT_SCHEMA)
        self.view = IncrementalDocView(spark, str(root / "docs"), num_buckets=2)
        self.vec = SnapshotParquetTable(spark, str(root / "vec"), VEC_SPEC)
        self.ivx = IncrementalVectorIndex(
            spark, str(root / "ivx"), key_cols=("conv_id",), num_buckets=2
        )
        self._first = True

    def sync(self):
        self.view.refresh(self.t)
        dv = self.view.table
        ver = dv.current_version()
        if self._first:
            base = dv.read(columns=["conv_id", "doc"])
            ups = base.select(
                "conv_id",
                F.expr(_EMBED).alias("embedding"),
                F.lit(None).cast("timestamp").alias("_e_ts"),
                F.lit(ver).cast("long").alias("_e_lsn"),
                F.lit("U").alias("op"),
            )
            self.vec.create(ups.drop("op", "_e_lsn").schema)
            self.vec.merge(ups, batch_id=ver)
            self.ivx.refresh(self.vec, centroids=_centroids(self.spark))
            self._applied = ver
            self._first = False
            return
        feed = dv.table_changes(self._applied, ver)
        ups = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(
            "conv_id",
            F.expr(_EMBED).alias("embedding"),
            F.lit(None).cast("timestamp").alias("_e_ts"),
            F.lit(ver).cast("long").alias("_e_lsn"),
            F.lit("U").alias("op"),
        )
        dels = feed.filter(F.col("_change_type") == "delete").select(
            "conv_id",
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("timestamp").alias("_e_ts"),
            F.lit(ver).cast("long").alias("_e_lsn"),
            F.lit("D").alias("op"),
        )
        self.vec.merge(ups.unionByName(dels), batch_id=ver)
        self._applied = ver
        self.ivx.refresh(self.vec)

    def index_state(self):
        return {
            r["conv_id"]: r["centroid_id"] for r in self.ivx.read().collect()
        }

    def expected(self):
        docs = self.view._render(self.t.read()).select(
            "conv_id", F.expr(_EMBED).alias("embedding")
        )
        return {
            r["conv_id"]: r["centroid_id"]
            for r in ivf_assign(
                docs, _centroids(self.spark), id_col="conv_id"
            ).collect()
        }


def test_incremental_dag_end_to_end(spark, tmp_path):
    dag = _Dag(spark, tmp_path)
    dag.t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "tell me about alpha", None, TS),
                (2, "I", "b", 0, "user", "all about beta", None, TS),
                (3, "I", "c", 0, "user", "beta again", None, TS),
            ],
        ),
        batch_id=0,
    )
    dag.sync()
    assert dag.index_state() == dag.expected() == {"a": 0, "b": 1, "c": 1}

    # a mid-conversation edit flips conv b's topic -> must MOVE clusters;
    # conv c is deleted -> must vanish from the index (3 hops away)
    dag.t.merge(
        _batch(
            spark,
            [
                (4, "U", "b", 0, "user", "actually alpha", None, TS2),
                (5, "D", "c", 0, None, None, None, TS2),
                (6, "I", "d", 0, "user", "new beta conv", None, TS2),
            ],
        ),
        batch_id=1,
    )
    dag.sync()
    got = dag.index_state()
    assert got == dag.expected() == {"a": 0, "b": 0, "d": 1}
    assert "c" not in got

    # idempotent: nothing changed -> every hop is a no-op
    dag.sync()
    assert dag.index_state() == got

    # the index answers queries over the CURRENT corpus
    q = spark.createDataFrame(
        [("q", [0.0, 1.0, 0.0])],
        T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            ]
        ),
    )
    hits = [h["neighbor_id"] for h in dag.ivx.topk(q, k=5).collect()]
    assert hits == ["d"]  # only the live beta conversation
