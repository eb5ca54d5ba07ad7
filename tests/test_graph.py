"""Connected-components tests: known topologies + cluster extraction."""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.operators.graph import (
    connected_components, dedup_clusters)


def test_two_components_and_chain(spark):
    # component 1: chain 1-2-3-4 (diameter 3); component 2: pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a: long, b: long")
    out = {r["n"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_transitive_closure_without_direct_edge(spark):
    # A~B, B~C but never A~C — all three must share a component
    edges = spark.createDataFrame([(5, 9), (9, 2)], "a: long, b: long")
    out = {r["n"]: r["component"] for r in connected_components(edges).collect()}
    assert len(set(out.values())) == 1
    assert set(out.values()) == {2}     # min id wins


def test_dedup_clusters_members(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a: long, b: long")
    rows = {r["component"]: (r["members"], r["n_members"])
            for r in dedup_clusters(edges).collect()}
    assert rows[1] == ([1, 2, 3], 3)
    assert rows[7] == ([7, 8], 2)


def test_star_converges_in_one_round(spark):
    edges = spark.createDataFrame(
        [(1, k) for k in range(2, 12)], "a: long, b: long")
    out = {r["n"]: r["component"] for r in
           connected_components(edges, max_iter=3).collect()}
    assert set(out.values()) == {1}


def test_pagerank_int_matches_reference_rule(spark):
    from databox_adls_loader_spark.operators.graph import pagerank_int
    # path graph 1-2-3 plus isolated pair 7-8
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a: long, b: long")
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank_int(edges, iters=3).collect()}

    # pure-python reference of the exact integer rule
    nbrs = {1: [2], 2: [1, 3], 3: [2], 7: [8], 8: [7]}
    n, scale = len(nbrs), 10**9
    r = {v: scale // n for v in nbrs}
    for _ in range(3):
        contrib = {v: r[v] // len(nbrs[v]) for v in nbrs}
        r = {v: (scale * 15 // 100) // n
             + (85 * sum(contrib[u] for u in nbrs[v])) // 100
             for v in nbrs}
    assert got == r
    # hub ranks above leaves; symmetric pair ranks equal
    assert got[2] > got[1] == got[3]
    assert got[7] == got[8]


def test_pagerank_int_empty_edges_returns_empty(spark):
    from databox_adls_loader_spark.operators.graph import pagerank_int
    edges = spark.createDataFrame([], "a: long, b: long")
    assert pagerank_int(edges, iters=2).count() == 0
