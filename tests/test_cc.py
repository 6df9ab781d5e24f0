"""Connected-components correctness: random graphs vs networkx, plus the
MinHash datasketch-compat kernels."""

from __future__ import annotations

import random

import networkx as nx
import numpy as np
import pytest

from liken_spark.minhash import minhash_text, optimal_param
from liken_spark.operators.cc import connected_components


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150), (3, 300, 600)])
def test_cc_matches_networkx(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]

    g = nx.Graph()
    g.add_edges_from(edges)
    expected = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for node in comp:
            expected[node] = m

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == expected


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_minhash_known_properties():
    # identical text -> identical signature; jaccard-ish similarity estimate
    s1 = minhash_text("hello world", 3, 128)
    s2 = minhash_text("hello world", 3, 128)
    assert np.array_equal(s1, s2)
    s3 = minhash_text("hello world!", 3, 128)
    est = float(np.mean(s1 == s3))
    assert 0.5 < est < 1.0  # high but not exact similarity
    # empty text -> max-hash fill
    s4 = minhash_text("ab", 3, 16)
    assert np.all(s4 == np.uint64((1 << 32) - 1))


def test_optimal_param_reasonable():
    # datasketch's (b, r) for common configs: bands*rows <= num_perm,
    # s-curve midpoint near the threshold
    for t, p in [(0.5, 128), (0.8, 128), (0.9, 256)]:
        b, r = optimal_param(t, p)
        assert 1 <= b * r <= p
        midpoint = (1.0 / b) ** (1.0 / r)
        assert abs(midpoint - t) < 0.2
