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
