"""Incrementally-maintained IVF vector index == fresh assignment of the
current source state, through inserts, cluster-moving updates, deletes and
crash-replay (the embedding-retrieval analog of the inverted-index IVM loop)."""

from datetime import datetime

from ccdb_data_pipeline_spark.operators.similarity import ivf_assign
from ccdb_data_pipeline_spark.operators.vecindex import IncrementalVectorIndex
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TableSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

VEC_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("vec_id", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SPEC = TableSpec(
    key_cols=("vec_id",),
    bucket_col="vec_id",
    num_buckets=2,
    merge_mode="mor",
    empty_to_null_exempt=(),
    normalize_ws_cols=(),
)

TS = datetime(2025, 1, 1)

# two well-separated clusters on the unit circle-ish
C0 = [1.0, 0.0, 0.0]
C1 = [0.0, 1.0, 0.0]


def _near(base, eps):
    return [float(b + eps * (i + 1)) for i, b in enumerate(base)]


def _batch(spark, rows):
    return spark.createDataFrame(rows, VEC_SCHEMA)


def _centroids(spark):
    return spark.createDataFrame(
        [(0, C0), (1, C1)],
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            ]
        ),
    )


def _index_state(idx):
    return {
        r["vec_id"]: r["centroid_id"] for r in idx.read().collect()
    }


def _fresh_assign(src, cents):
    live = src.read().select("vec_id", "embedding")
    return {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(live, cents).collect()
    }


def test_vecindex_tracks_source_changes(spark, tmp_path):
    src = SnapshotParquetTable(spark, str(tmp_path / "src"), SPEC)
    src.create(
        T.StructType(
            [
                T.StructField("vec_id", T.StringType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), True),
                T.StructField("ts", T.TimestampType(), True),
            ]
        )
    )
    src.merge(
        _batch(
            spark,
            [
                (1, "I", "a", _near(C0, 0.01), TS),
                (2, "I", "b", _near(C0, 0.02), TS),
                (3, "I", "c", _near(C1, 0.01), TS),
            ],
        ),
        batch_id=0,
    )

    idx = IncrementalVectorIndex(spark, str(tmp_path / "ivx"), num_buckets=2)
    cents = _centroids(spark)
    stats = idx.refresh(src, centroids=cents)
    assert stats["applied_to"] == src.current_version()
    assert _index_state(idx) == _fresh_assign(src, cents) == {"a": 0, "b": 0, "c": 1}

    # update moves 'b' into cluster 1; delete 'c'; insert 'd' into cluster 1
    src.merge(
        _batch(
            spark,
            [
                (4, "U", "b", _near(C1, 0.03), TS),
                (5, "D", "c", None, TS),
                (6, "I", "d", _near(C1, 0.02), TS),
            ],
        ),
        batch_id=1,
    )
    stats = idx.refresh(src)
    assert stats["n_changes"] > 0
    got = _index_state(idx)
    assert got == _fresh_assign(src, cents) == {"a": 0, "b": 1, "d": 1}
    assert "c" not in got

    # idempotent: refresh with nothing new is a no-op
    assert idx.refresh(src)["n_changes"] == 0
    assert _index_state(idx) == got


def test_vecindex_topk_probes_current_state(spark, tmp_path):
    src = SnapshotParquetTable(spark, str(tmp_path / "src"), SPEC)
    src.create(
        T.StructType(
            [
                T.StructField("vec_id", T.StringType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), True),
                T.StructField("ts", T.TimestampType(), True),
            ]
        )
    )
    src.merge(
        _batch(
            spark,
            [
                (1, "I", "a", _near(C0, 0.01), TS),
                (2, "I", "b", _near(C0, 0.05), TS),
                (3, "I", "c", _near(C1, 0.01), TS),
            ],
        ),
        batch_id=0,
    )
    idx = IncrementalVectorIndex(spark, str(tmp_path / "ivx"), num_buckets=2)
    idx.refresh(src, centroids=_centroids(spark))

    queries = spark.createDataFrame(
        [("q0", _near(C0, 0.011))],
        T.StructType(
            [
                T.StructField("vec_id", T.StringType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            ]
        ),
    )
    hits = idx.topk(queries, k=2).collect()
    # probe lands in cluster 0 -> neighbors are a,b (never c), nearest first
    assert [h["neighbor_id"] for h in sorted(hits, key=lambda h: h["rank"])] == ["a", "b"]

    # after the corpus shifts, the same query sees the NEW state
    src.merge(_batch(spark, [(4, "D", "b", None, TS)]), batch_id=1)
    idx.refresh(src)
    hits = idx.topk(queries, k=2).collect()
    assert [h["neighbor_id"] for h in hits] == ["a"]

    # multi-probe reaches the other cluster too
    hits = idx.topk(queries, k=5, nprobe=2).collect()
    assert {h["neighbor_id"] for h in hits} == {"a", "c"}

    # storage clustering for probe locality keeps state identical
    idx.compact_for_probes()
    assert {r["vec_id"]: r["centroid_id"] for r in idx.read().collect()} == {
        "a": 0,
        "c": 1,
    }


def test_vecindex_arrow_assign_engine_parity(spark, tmp_path):
    """assign_engine='arrow' (the 3.8x numpy-matmul twin, round-3 verdict
    item #3) must maintain the same index state as the JVM fold through the
    full refresh loop — first build, cluster-moving update, delete, insert."""
    src = SnapshotParquetTable(spark, str(tmp_path / "src"), SPEC)
    src.create(
        T.StructType(
            [
                T.StructField("vec_id", T.StringType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType()), True),
                T.StructField("ts", T.TimestampType(), True),
            ]
        )
    )
    src.merge(
        _batch(
            spark,
            [
                (1, "I", "a", _near(C0, 0.01), TS),
                (2, "I", "b", _near(C0, 0.02), TS),
                (3, "I", "c", _near(C1, 0.01), TS),
            ],
        ),
        batch_id=0,
    )
    cents = _centroids(spark)
    jvm = IncrementalVectorIndex(spark, str(tmp_path / "ivx-jvm"), num_buckets=2)
    arw = IncrementalVectorIndex(
        spark, str(tmp_path / "ivx-arw"), num_buckets=2, assign_engine="arrow"
    )
    jvm.refresh(src, centroids=cents)
    arw.refresh(src, centroids=cents)
    assert _index_state(arw) == _index_state(jvm) == {"a": 0, "b": 0, "c": 1}

    src.merge(
        _batch(
            spark,
            [
                (4, "U", "b", _near(C1, 0.03), TS),
                (5, "D", "c", None, TS),
                (6, "I", "d", _near(C1, 0.02), TS),
            ],
        ),
        batch_id=1,
    )
    jvm.refresh(src)
    arw.refresh(src)
    assert _index_state(arw) == _index_state(jvm) == {"a": 0, "b": 1, "d": 1}
    # cos_bp within the documented 1bp knife-edge tolerance, vectors equal
    j = {r["vec_id"]: (r["centroid_cos_bp"], r["embedding"]) for r in jvm.read().collect()}
    a = {r["vec_id"]: (r["centroid_cos_bp"], r["embedding"]) for r in arw.read().collect()}
    assert set(j) == set(a)
    for k in j:
        assert abs(j[k][0] - a[k][0]) <= 1
        assert j[k][1] == a[k][1]
    # the probe path serves the arrow-maintained index identically
    q = spark.createDataFrame([("q1", _near(C1, 0.001))], "vec_id string, embedding array<float>")
    tj = [(r["neighbor_id"], r["rank"]) for r in jvm.topk(q, k=2).collect()]
    ta = [(r["neighbor_id"], r["rank"]) for r in arw.topk(q, k=2).collect()]
    assert tj == ta
