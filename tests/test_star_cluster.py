"""Distributed greedy-star clustering (the reference's C1-C3 family at
scale): exact parity with the sequential degree-sorted greedy on
structured graphs, invariants + coverage on random ones."""

import numpy as np
import pytest

from gaoya_spark.operators.star_cluster import (
    degree_greedy_oracle,
    star_clusters,
)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    return {r["id"]: r["center"] for r in star_clusters(df, **kw).collect()}


def test_disjoint_stars_recovered_exactly(spark):
    edges = set()
    for c, size in ((100, 5), (200, 3), (300, 2)):
        for i in range(1, size + 1):
            edges.add((c, c + i))
    got = _run(spark, edges, min_cluster_size=2)
    want = degree_greedy_oracle(sorted(edges), min_cluster_size=2)
    assert got == want
    assert got[101] == 100 and got[201] == 200 and got[301] == 300


def test_path_graph_matches_sequential(spark):
    edges = {(i, i + 1) for i in range(6)}
    got = _run(spark, edges, min_cluster_size=2)
    want = degree_greedy_oracle(sorted(edges), min_cluster_size=2)
    assert got == want


def test_min_cluster_size_strict_vs_inclusive(spark):
    # star of 3 total (center + 2): inclusive keeps it at min=3,
    # strict (>) requires 4 total
    edges = {(1, 2), (1, 3)}
    inc = _run(spark, edges, min_cluster_size=3, inclusive=True)
    assert inc == {1: 1, 2: 1, 3: 1}
    exc = _run(spark, edges, min_cluster_size=3, inclusive=False)
    assert exc == {}


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_random_graph_invariants_and_coverage(spark, seed):
    rng = np.random.default_rng(seed)
    n = 120
    edges = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, n, size=(200, 2))
        if a != b
    }
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    got = _run(spark, edges, min_cluster_size=2)
    # invariants: members are edge-adjacent to their center; centers map
    # to themselves; every cluster meets the size bound
    from collections import Counter

    sizes = Counter(got.values())
    for v, c in got.items():
        assert c == got[c] == c
        if v != c:
            assert c in nbrs[v]
    assert all(s >= 2 for s in sizes.values())
    # determinism
    again = _run(spark, edges, min_cluster_size=2)
    assert again == got
    # coverage tracks the sequential greedy within 5% of nodes
    want = degree_greedy_oracle(sorted(edges), min_cluster_size=2)
    assert abs(len(got) - len(want)) <= max(3, n // 20)


def test_string_ids(spark):
    """input_hint ids are strings — the whole path must work without
    numeric id tricks (tie-breaks fall back to the id type's natural
    ordering)."""
    edges = {("img_c", "img_a"), ("img_c", "img_b"), ("img_x", "img_y")}
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {r["id"]: r["center"] for r in star_clusters(df, min_cluster_size=2).collect()}
    assert got == {
        "img_a": "img_c", "img_b": "img_c", "img_c": "img_c",
        "img_x": "img_x", "img_y": "img_x",
    }


def test_cancellation_keeps_undersized_centers_unassigned_round(spark):
    """Two would-be centers sharing all but one neighbor: the higher-
    priority center claims the shared nodes; the lower one must not emit
    an undersized cluster in the same round."""
    # center 1 (deg 4): neighbors 3,4,5,6 ; center 2 (deg 3): 3,4,5 —
    # after 1 claims 3,4,5, node 2 has nothing left and must be absent
    # (it is itself adjacent to nothing unclaimed)
    edges = {(1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (2, 4), (2, 5)}
    got = _run(spark, edges, min_cluster_size=3)
    want = degree_greedy_oracle(sorted(edges), min_cluster_size=3)
    assert got == want == {1: 1, 3: 1, 4: 1, 5: 1, 6: 1}
