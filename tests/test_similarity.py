"""Embedding similarity search vs a numpy oracle."""

import numpy as np
import pytest

from ccdb_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_assign_probes,
    ivf_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(42)
    m = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in m[i]]) for i in range(40)]
    return m, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_topk(m, qids, k):
    mm = m.astype("float64")
    norms = np.linalg.norm(mm, axis=1)
    out = {}
    for q in qids:
        cos = (mm @ mm[q]) / (norms * norms[q])
        bp = np.round(cos * 10000).astype("int64")
        order = sorted((int(-bp[i]), i) for i in range(len(mm)) if i != q)
        out[q] = [(i, int(bp[i])) for _, i in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(spark, vecs):
    m, df = vecs
    q = df.filter("vec_id < 5")
    got = brute_force_topk(df, q, k=3).collect()
    exp = _np_topk(m, range(5), 3)
    for r in got:
        nid, bp = exp[r["qid"]][r["rank"] - 1]
        assert r["neighbor_id"] == nid
        assert r["cos_bp"] == bp


def test_ivf_assign_is_argmax(spark, vecs):
    m, df = vecs
    cent = df.filter("vec_id < 4").selectExpr("vec_id as centroid_id", "embedding")
    got = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(df, cent).collect()}
    mm = m.astype("float64")
    norms = np.linalg.norm(mm, axis=1)
    for v in range(40):
        cos = [(round(float((mm[c] @ mm[v]) / (norms[c] * norms[v])) * 10000), -c) for c in range(4)]
        best = max(range(4), key=lambda c: cos[c])
        assert got[v] == best, f"vec {v}"


def test_ivf_multiprobe_probes_true_top_centroids_and_raises_recall(spark, vecs):
    m, df = vecs
    cent = df.filter("vec_id < 4").selectExpr("vec_id as centroid_id", "embedding")
    queries = df.filter("vec_id IN (10, 11, 25)")
    probes = ivf_assign_probes(queries, cent, nprobe=2).collect()

    mm = m.astype("float64")
    norms = np.linalg.norm(mm, axis=1)
    by_q = {}
    for r in probes:
        by_q.setdefault(r["vec_id"], {})[r["probe_rank"]] = r["centroid_id"]
    for qid, pr in by_q.items():
        cos = [(round(float((mm[c] @ mm[qid]) / (norms[c] * norms[qid])) * 10000), -c) for c in range(4)]
        order = sorted(range(4), key=lambda c: cos[c], reverse=True)
        assert [pr[1], pr[2]] == order[:2], f"query {qid}"

    # multi-probe recall@3 vs brute force is >= 1-probe recall@3
    assigned = ivf_assign(df, cent)
    exact = _np_topk(m, [10, 11, 25], 3)
    def recall(qframe):
        got = {}
        for r in ivf_topk(assigned, qframe, k=3).collect():
            got.setdefault(r["qid"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & {i for i, _ in exact[q]}) for q in exact)
        return hits
    one = recall(assigned.filter("vec_id IN (10, 11, 25)"))
    multi = recall(ivf_assign_probes(queries, cent, nprobe=2).drop("probe_rank"))
    assert multi >= one
    assert multi > 0


def test_ivf_topk_searches_within_cluster(spark, vecs):
    m, df = vecs
    cent = df.filter("vec_id < 4").selectExpr("vec_id as centroid_id", "embedding")
    # map-side assign retains all corpus columns — no join-back needed
    assigned = ivf_assign(df, cent)
    queries = assigned.filter("vec_id IN (10, 11)")
    got = ivf_topk(assigned, queries, k=3).collect()
    clusters = {r["vec_id"]: r["centroid_id"] for r in assigned.select("vec_id", "centroid_id").collect()}
    assert len(got) > 0
    for r in got:
        assert clusters[r["neighbor_id"]] == clusters[r["qid"]]
        assert r["neighbor_id"] != r["qid"]


def test_ivf_assign_arrow_parity_and_speed(spark):
    """The Arrow/numpy assignment twin must agree with the JVM fold on
    real-valued data (knife-edge .5 rounding ties are measure-zero there;
    the docstring documents the 1bp boundary caveat)."""
    import numpy as np

    from ccdb_data_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_arrow,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(j, [float(x) for x in rng.randn(16)]) for j in range(6)],
        "centroid_id long, embedding array<double>",
    )
    jvm = {
        r["vec_id"]: (r["centroid_id"], r["centroid_cos_bp"])
        for r in ivf_assign(df, cents).collect()
    }
    arw = {
        r["vec_id"]: (r["centroid_id"], r["centroid_cos_bp"])
        for r in ivf_assign_arrow(df, cents).collect()
    }
    assert set(jvm) == set(arw)
    for k in jvm:
        assert jvm[k][0] == arw[k][0], k          # identical assignment
        assert abs(jvm[k][1] - arw[k][1]) <= 1, k  # bp within the documented 1


def test_ivf_assign_arrow_rejects_bad_vectors(spark):
    """Null / wrong-length embeddings raise a clear error NAMING the
    offending ids (round-3 ADVICE: the np.array(to_pylist) path blew up
    with an opaque object-dtype/ValueError inside the executor)."""
    import numpy as np
    import pytest as _pt

    from ccdb_data_pipeline_spark.operators.similarity import ivf_assign_arrow

    rng = np.random.RandomState(11)
    cents = spark.createDataFrame(
        [(j, [float(x) for x in rng.randn(8)]) for j in range(3)],
        "centroid_id long, embedding array<double>",
    )
    good = [(i, [float(x) for x in rng.randn(8)]) for i in range(10)]

    df_null = spark.createDataFrame(
        good + [(99, None)], "vec_id long, embedding array<double>"
    )
    with _pt.raises(Exception, match="99"):
        ivf_assign_arrow(df_null, cents).collect()

    df_ragged = spark.createDataFrame(
        good + [(77, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pt.raises(Exception, match="77"):
        ivf_assign_arrow(df_ragged, cents).collect()

    # null CENTROID vectors raise driver-side with the centroid id
    bad_cents = spark.createDataFrame(
        [(0, [1.0] * 8), (5, None)], "centroid_id long, embedding array<double>"
    )
    with _pt.raises(ValueError, match="5"):
        ivf_assign_arrow(spark.createDataFrame(good, "vec_id long, embedding array<double>"), bad_cents)
