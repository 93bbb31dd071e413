"""Connected components: correctness vs a trivial union-find, determinism."""

import pandas as pd

from fia_own_map_spark.operators.cc import connected_components
from fia_own_map_spark.testing.oracle import _UnionFind


def _oracle_cc(edge_list, vertices):
    uf = _UnionFind()
    for v in vertices:
        uf.find(v)
    for a, b in edge_list:
        uf.union(a, b)
    comp = {}
    for v in vertices:
        comp.setdefault(uf.find(v), []).append(v)
    out = {}
    for members in comp.values():
        lab = min(members)
        for m in members:
            out[m] = lab
    return out


def test_cc_matches_union_find(spark):
    import random

    rng = random.Random(42)
    vertices = [f"v{i:04d}" for i in range(500)]
    edges = [
        (rng.choice(vertices), rng.choice(vertices)) for _ in range(400)
    ]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    vdf = spark.createDataFrame(pd.DataFrame({"id": vertices}))
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, vertices=vdf).collect()
    }
    want = _oracle_cc(edges, vertices)
    assert got == want


def test_cc_chain_converges_logarithmically(spark):
    # a 300-long path is the worst case for plain label propagation;
    # large-star/small-star must converge well under the iteration cap
    n = 300
    edges = [(f"n{i:05d}", f"n{i+1:05d}") for i in range(n - 1)]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    labels = connected_components(edf, max_iterations=15).collect()
    comps = {r["component"] for r in labels}
    assert comps == {"n00000"}
    assert len(labels) == n


def test_cc_empty_edges(spark):
    vdf = spark.createDataFrame(pd.DataFrame({"id": ["a", "b"]}))
    edf = spark.createDataFrame([], "src string, dst string")
    got = {r["id"]: r["component"] for r in connected_components(edf, vertices=vdf).collect()}
    assert got == {"a": "a", "b": "b"}
