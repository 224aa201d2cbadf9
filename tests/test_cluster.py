"""Connected components (C4) + cluster-size filter + dup-pair recall metric."""

from gaoya_spark.operators.cluster import (
    clusters_from_labels,
    connected_components,
    duplicate_pair_recall,
)


import pytest


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_components_basic(spark, driver_threshold):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    labels = connected_components(edges, driver_threshold=driver_threshold)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_components_chain_needs_iterations(spark, driver_threshold):
    """A long path graph exercises multi-iteration convergence (and the
    union-find fast path on the same input)."""
    n = 40
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
    labels = connected_components(edges, driver_threshold=driver_threshold)
    comps = {r["component"] for r in labels.collect()}
    assert comps == {0}


def test_components_paths_agree(spark):
    """Distributed propagation and driver union-find must produce identical
    labels on a random graph."""
    import numpy as np

    rng = np.random.default_rng(8)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, size=(400, 2)) if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {r["id"]: r["component"]
            for r in connected_components(df).collect()}
    dist = {r["id"]: r["component"]
            for r in connected_components(df, driver_threshold=0).collect()}
    assert fast == dist


def test_components_twophase_matches_other_paths(spark):
    """Two-phase (large-star/small-star) must produce identical labels to
    union-find and label propagation on a random graph with self-loops,
    duplicate and reversed edges."""
    import numpy as np

    rng = np.random.default_rng(21)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 250, size=(500, 2))]
    df = spark.createDataFrame(edges, "src long, dst long")
    uf = {r["id"]: r["component"] for r in connected_components(df).collect()}
    tp = {r["id"]: r["component"]
          for r in connected_components(
              df, driver_threshold=0, algorithm="twophase").collect()}
    assert tp == uf


def test_components_twophase_long_chain_converges_fast(spark):
    """A 200-link path has diameter 200: label propagation needs ~200
    rounds, two-phase must finish (converged) well inside 15 — the property
    that makes it the safe 10^12-edge default for unknown-diameter graphs."""
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    labels, converged = connected_components(
        edges, driver_threshold=0, algorithm="twophase", max_iter=15,
        return_converged=True,
    )
    assert converged is True
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_components_twophase_isolated_and_selfloop(spark):
    edges = spark.createDataFrame([(1, 2), (7, 7)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    labels = connected_components(
        edges, nodes=nodes, driver_threshold=0, algorithm="twophase"
    )
    got = {r["id"]: r["component"] for r in labels.collect()}
    # nodes frame wins: 0-4 all labeled; self-loop node 7 not in nodes
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4}
    # without a nodes frame, every edge endpoint (incl. the self-loop node)
    # still gets a label
    labels2 = connected_components(
        edges, driver_threshold=0, algorithm="twophase"
    )
    got2 = {r["id"]: r["component"] for r in labels2.collect()}
    assert got2 == {1: 1, 2: 1, 7: 7}


def test_components_isolated_nodes(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    labels = connected_components(edges, nodes=nodes)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4}


def test_min_cluster_size_semantics(spark):
    edges = spark.createDataFrame([(1, 2), (10, 11), (10, 12)], "src long, dst long")
    labels = connected_components(edges)
    # inclusive (parallel clusterer >=): size-3 kept at min=3
    kept = clusters_from_labels(labels, min_cluster_size=3, inclusive=True)
    assert {r["id"] for r in kept.collect()} == {10, 11, 12}
    # exclusive (serial clusterer >): size-3 dropped at min=3
    kept = clusters_from_labels(labels, min_cluster_size=3, inclusive=False)
    assert kept.count() == 0


def test_duplicate_pair_recall_metric(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)], "id long, component long"
    )
    truth = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
        "id long, group_id string",
    )
    # truth pairs: (1,2),(3,4),(3,5),(4,5); co-clustered: (1,2),(3,4) -> 0.5
    r = duplicate_pair_recall(labels, truth)
    assert abs(r - 0.5) < 1e-9


def test_return_converged_flag(spark):
    """return_converged=True returns an explicit (labels, bool) tuple on
    both paths (ADVICE r2: a dynamic DataFrame attribute is lost by any
    transformation)."""
    from gaoya_spark.operators.cluster import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    for thr in (10, 0):  # driver union-find path, distributed path
        labels, converged = connected_components(
            edges, driver_threshold=thr, return_converged=True
        )
        assert converged is True
        assert {tuple(r) for r in labels.collect()} == {(1, 1), (2, 1), (3, 1)}
    # truncated run surfaces converged=False (chain needs >1 iteration)
    import warnings

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src long, dst long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        _, converged = connected_components(
            chain, driver_threshold=0, max_iter=1, return_converged=True
        )
    assert converged is False


def test_pair_precision_and_exact_set_accuracy(spark):
    """duplicate_pair_precision / exact_set_accuracy (round 6, the
    reference notebook's remaining quality metrics): exact on a planted
    corpus — one perfect cluster, one over-merge (hurts precision +
    accuracy), one split (hurts accuracy only, precision unaffected)."""
    from gaoya_spark.operators.cluster import (
        duplicate_pair_precision,
        exact_set_accuracy,
    )

    # truth: {a,b,c} group g1; {d,e} group g2; f,g singletons
    truth = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("c", "g1"), ("d", "g2"), ("e", "g2")],
        "id string, group_id string",
    )
    # predicted: {a,b,c} perfect; {d,e,f} over-merged (+2 false pairs);
    # g singleton (correct)
    pred = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "A"), ("d", "D"), ("e", "D"),
         ("f", "D"), ("g", "g")],
        "id string, component string",
    )
    # predicted pairs: 3 (abc) + 3 (def) = 6; true among them: 3 + 1 = 4
    assert abs(duplicate_pair_precision(pred, truth) - 4 / 6) < 1e-9
    # exact sets: a,b,c correct (3); d,e,f wrong (over-merge); g correct
    assert abs(exact_set_accuracy(pred, truth) - 4 / 7) < 1e-9

    # split cluster: {a,b},{c} — precision stays 1.0, accuracy drops
    pred2 = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "C"), ("d", "D"), ("e", "D")],
        "id string, component string",
    )
    assert duplicate_pair_precision(pred2, truth) == 1.0
    assert abs(exact_set_accuracy(pred2, truth) - 2 / 5) < 1e-9
