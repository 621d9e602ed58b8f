"""connected_components vs a brute-force union-find oracle."""

import numpy as np
import pandas as pd

from ccdb_data_pipeline_spark.operators.components import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node in component
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for r, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges):
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    got = (
        connected_components(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("node")["component"]
        .to_dict()
    )
    want = _union_find(edges)
    assert got == want


def test_chain_worst_case_diameter(spark):
    # a 60-node chain: defeats naive label propagation at default rounds,
    # trivial for star contraction (O(log n) rounds)
    _check(spark, [(i, i + 1) for i in range(60)])


def test_star_cliques_and_disjoint(spark):
    edges = (
        [(100, i) for i in range(101, 110)]            # star, hub largest-first
        + [(a, b) for a in range(5) for b in range(a)]  # clique 0-4
        + [(200, 201), (300, 301), (301, 302), (302, 300)]  # pair + triangle
    )
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 80
        m = [20, 60, 150][trial]
        edges = [tuple(sorted(e)) for e in rng.randint(0, n, (m, 2)) if e[0] != e[1]]
        _check(spark, [(int(a), int(b)) for a, b in edges])


def test_string_node_ids(spark):
    _check(spark, [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")])


# ---------------------------------------------------------------- pagerank


def _pr_graph(spark):
    # a 4-node graph with known structure: 1->2, 2->3, 3->1, 4->1
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )


def _pr_local(edges, n, iters, d=0.85):
    import collections

    out = collections.Counter(s for s, _ in edges)
    nodes = sorted({x for e in edges for x in e})
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        mass = collections.defaultdict(float)
        for s, t in edges:
            mass[t] += r[s] / out[s]
        r = {v: (1 - d) / n + d * mass.get(v, 0.0) for v in nodes}
    return r


def test_pagerank_fixed_rounds_match_local(spark):
    from ccdb_data_pipeline_spark.operators.components import pagerank

    e = [(1, 2), (2, 3), (3, 1), (4, 1)]
    got = {r["node"]: r["rank"] for r in pagerank(_pr_graph(spark), iters=3).collect()}
    want = _pr_local(e, 4, 3)
    assert set(got) == set(want)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_pagerank_converges_with_tol(spark):
    from ccdb_data_pipeline_spark.operators.components import pagerank

    got = {
        r["node"]: r["rank"]
        for r in pagerank(_pr_graph(spark), tol=1e-9, max_iter=200).collect()
    }
    # fixpoint check: one more local step changes nothing beyond tol
    e = [(1, 2), (2, 3), (3, 1), (4, 1)]
    import collections

    out = collections.Counter(s for s, _ in e)
    mass = collections.defaultdict(float)
    for s, t in e:
        mass[t] += got[s] / out[s]
    for v in got:
        nxt = 0.15 / 4 + 0.85 * mass.get(v, 0.0)
        assert abs(nxt - got[v]) < 1e-6, v
    assert abs(sum(got.values()) - 1.0) < 0.2  # no dangling redistribution


def test_pagerank_no_forced_broadcast_above_threshold(spark):
    """The round-2 scale-killer guard: past broadcast_max_nodes the plan
    must carry NO broadcast hint anywhere (AQE picks the join strategy
    from runtime sizes; a forced broadcast of a node-sized table dies at
    scale instead of degrading)."""
    from ccdb_data_pipeline_spark.operators.components import pagerank

    small = pagerank(_pr_graph(spark), iters=2)  # under threshold: hinted
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()
    big = pagerank(_pr_graph(spark), iters=2, broadcast_max_nodes=2)
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    # and the unhinted plan computes the identical ranks
    a = {(r["node"], round(r["rank"], 12)) for r in small.collect()}
    b = {(r["node"], round(r["rank"], 12)) for r in big.collect()}
    assert a == b
