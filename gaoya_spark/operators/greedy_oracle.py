"""Driver-side replay of the reference's greedy star clustering — the
parity oracle for the connected-components replacement (SURVEY.md §3.3).

Mirrors the serial clusterer's semantics
(/root/reference/gaoya/src/clustering/clustering_serial.rs:89-109): iterate
points in order; for each unassigned point, query its neighbors; the
unassigned ones form a cluster if their count exceeds min_cluster_size
(strict '>' in the serial variant, '>=' in the parallel one at
clusterer_parallel.rs:208 — both supported).

This is NOT a distributed operator: it exists to compute, on small
collected candidate graphs, exactly the cluster assignments gaoya would
produce, so tests can assert dup-pair recall >= 0.99 of our labels against
"gaoya's own cluster assignments" as the north rule demands — without
running Rust.
"""

from __future__ import annotations

from collections import defaultdict


def greedy_star_clusters(
    points: list,
    edges: list[tuple],
    min_cluster_size: int = 2,
    inclusive: bool = True,
) -> dict:
    """point id -> cluster id (seed's id), or absent if unclustered.

    points: iteration order matters (gaoya iterates insertion order).
    edges: undirected candidate pairs (the same verified pairs our LSH
    produces — gaoya's query() results on the same signatures/banding).
    inclusive=True mirrors the parallel clusterer's >=; False the serial >.
    """
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    assigned: dict = {}
    for p in points:
        if p in assigned:
            continue
        # gaoya's query returns the point itself plus matches; the star is
        # the unassigned subset (the seed is unassigned by construction)
        members = [p] + [q for q in sorted(nbrs[p]) if q not in assigned]
        ok = (
            len(members) >= min_cluster_size
            if inclusive
            else len(members) > min_cluster_size
        )
        if ok:
            for m in members:
                assigned[m] = p
    return assigned


def co_clustered_pairs(assignment: dict) -> set:
    """All unordered pairs sharing a cluster label."""
    by_label = defaultdict(list)
    for node, label in assignment.items():
        by_label[label].append(node)
    out = set()
    for members in by_label.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def recall_vs_greedy(cc_labels: dict, greedy_assignment: dict) -> float:
    """Fraction of greedy co-clustered pairs also co-clustered by the
    connected-components labels (the north-rule metric: our assignments vs
    gaoya's)."""
    gp = co_clustered_pairs(greedy_assignment)
    if not gp:
        return 1.0
    hit = sum(
        1
        for a, b in gp
        if cc_labels.get(a) is not None and cc_labels.get(a) == cc_labels.get(b)
    )
    return hit / len(gp)
