"""Distributed greedy star clustering over candidate-pair edges.

The reference's clusterer (serial: /root/reference/gaoya/src/clustering/
clustering_serial.rs:89-109; parallel: clusterer_parallel.rs:177-291)
greedily claims "stars": it sorts points by number of similar points
(degree, clusterer_parallel.rs:177-191), then each point that is still
unassigned claims its unassigned query matches as one cluster. The
parallel version resolves races with atomic CAS — inherently sequential
state that Spark cannot (and should not) replicate.

This module is the distributed analogue: **local-dominance peeling**.
Each round, a node becomes a center iff its priority (degree desc,
id asc — the reference's degree-sorted claim order made deterministic)
beats every unassigned neighbor's priority. Centers therefore form an
independent set and can all claim simultaneously without races: each
node adjacent to one or more centers joins the highest-priority one —
exactly whom the sequential degree-sorted greedy would have given it to.
Claimed nodes leave the graph; degrees recompute; repeat until no center
qualifies. Rounds are O(log n)-ish on near-dup graphs (each round peels
every locally-dominant star); each round is two groupBy aggregations and
two joins over the surviving edges — no driver state, no collect.

Divergence from the reference (documented + tested): the sequential
greedy claims one star at a time, letting every claim reshape the next
center's neighborhood; a parallel round commits all locally-dominant
centers against ONE degree snapshot. The divergence class is exactly
**priority inversion under concurrent claims**: a center c that is
locally dominant in the snapshot commits in the parallel round, but in
the sequential schedule a higher-priority center's claim removes some of
c's neighbors FIRST, dropping c's live degree so that a (now equal- or
higher-priority) neighbor claims c as a MEMBER instead. Minimal example
(test_star_cluster.py::test_divergence_class_priority_inversion):
edges {0-3, 0-4, 1-2, 2-3} — snapshot degrees 0:2, 2:2, 3:2; parallel
commits centers {0, 2} together (2 keeps member 1 after losing 3 to 0);
sequential claims 0 first, 2's degree falls to 1, and node 1 (equal
degree, smaller id) then claims 2 as a member. Where no such inversion
occurs — disjoint stars, paths, planted dup-families — shapes match the
sequential greedy exactly.

Both schedules produce a valid MAXIMAL greedy star packing; the parallel
invariants, asserted across ~50 seeded random graphs of varying density
(test_star_cluster.py::test_random_graphs_contract):
- every member is edge-adjacent to its center; centers map to themselves;
- every cluster meets the size bound;
- maximality: at convergence no unassigned node can form a qualifying
  star among unassigned nodes (the globally max-priority node is always
  locally dominant, so the loop cannot stop while one exists);
- determinism (pure function of the edge set);
- assigned-node coverage stays within a few percent of the sequential
  result (the inversion reshuffles WHO centers a star far more often
  than whether its nodes get clustered at all).
Dup-pair recall is governed by connected components (cluster.py), not
star shapes (SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def star_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_cluster_size: int = 2,
    inclusive: bool = True,
    max_iter: int = 30,
) -> DataFrame:
    """(id, center) star assignments; center == id for the star's middle.

    min_cluster_size counts the full cluster (center + members), mirroring
    clusters_from_labels: a center qualifies with > (serial reference,
    inclusive=False) or >= (parallel reference, inclusive=True)
    min_cluster_size total points. Nodes never claimed by any center are
    absent from the result (the reference's unassigned remainder).
    """
    # symmetric live-edge set, deduped; (a, b) both directions
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        raw.unionByName(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    # members needed for a qualifying star (center itself adds 1)
    need = min_cluster_size - 1 if inclusive else min_cluster_size

    out = None
    converged = False
    for _ in range(max_iter):
        deg = sym.groupBy("a").agg(F.count("*").alias("d"))
        if deg.limit(1).count() == 0:
            converged = True
            break
        # priority = (degree desc, id asc) as a single orderable struct:
        # higher d wins, then smaller id — encode id descending via -a
        with_deg = sym.join(deg, "a")
        nbr_deg = deg.select(F.col("a").alias("b"), F.col("d").alias("d_b"))
        j = with_deg.join(nbr_deg, "b")
        # a dominates b iff (d, -a) > (d_b, -b)
        dominates = (F.col("d") > F.col("d_b")) | (
            (F.col("d") == F.col("d_b")) & (F.col("a") < F.col("b"))
        )
        centers = (
            j.groupBy("a", "d")
            .agg(F.min(dominates.cast("int")).alias("all_dom"))
            .where((F.col("all_dom") == 1) & (F.col("d") >= need))
            .select(F.col("a").alias("c"), F.col("d").alias("cd"))
        )
        if centers.limit(1).count() == 0:
            converged = True
            break
        # members: each node adjacent to >=1 center joins the
        # highest-priority one (centers are an independent set, so a
        # center is never itself a member)
        adj = sym.join(
            centers.select(F.col("c").alias("a"), "cd"), "a"
        ).select(F.col("b").alias("id"), F.col("a").alias("c"), "cd")
        # argmax by (cd desc, c asc) in two type-agnostic steps — a struct
        # max with a negated id would break on string ids, and near-dup
        # corpora use string ids (the input_hint's image_id)
        mcd = adj.groupBy("id").agg(F.max("cd").alias("cd"))
        best = (
            adj.join(mcd, ["id", "cd"])
            .groupBy("id")
            .agg(F.min("c").alias("center"))
        )
        # cancellation: a center that lost shared neighbors to
        # higher-priority centers may end up under min size — the
        # sequential greedy would have requalified it AFTER the bigger
        # claims, so cancel it this round (it and its would-be members
        # stay in the graph and requalify against recomputed degrees).
        # The globally top-priority center keeps every neighbor, so at
        # least one center survives each round — guaranteed progress.
        valid = (
            best.groupBy("center").agg(F.count("*").alias("n_members"))
            .where(F.col("n_members") >= need)
            .select("center")
        )
        assigned = (
            best.join(valid, "center")
            .select("id", "center")
            .unionByName(
                valid.select(F.col("center").alias("id"), "center")
            )
            .localCheckpoint(eager=True)
        )
        out = assigned if out is None else out.unionByName(assigned)
        # peel: drop edges touching any assigned node
        ids = assigned.select("id")
        sym = (
            sym.join(ids.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(ids.withColumnRenamed("id", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    if not converged and sym.limit(1).count() > 0:
        # mirror _two_phase_cc's non-convergence contract: loop exhaustion
        # with residual edges means still-qualifying stars (if any) are
        # absent from the result, which is otherwise indistinguishable
        # from the legitimately-unassigned remainder — never truncate
        # silently. The residual-edge check avoids a false alarm when
        # convergence lands exactly on the final allowed iteration (the
        # converged flag is only set by the NEXT iteration's entry checks).
        import warnings

        warnings.warn(
            f"star_clusters: max_iter={max_iter} exhausted with residual "
            "edges; still-qualifying stars (if any) are unassigned. "
            "Increase max_iter.",
            RuntimeWarning,
        )
    if out is None:
        schema_type = dict(raw.dtypes)["a"]
        return edges.sparkSession.createDataFrame(
            [], f"id {schema_type}, center {schema_type}"
        )
    return out


def degree_greedy_oracle(edge_list, min_cluster_size=2, inclusive=True):
    """Driver-side sequential degree-sorted greedy (the parallel
    reference's claim order, clusterer_parallel.rs:177-191, made
    deterministic by id tie-break) — the parity oracle for star_clusters.
    Recomputes degrees over the unassigned graph before each claim, the
    \"currently biggest star first\" policy. Returns {id: center}."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    need = min_cluster_size - 1 if inclusive else min_cluster_size
    unassigned = set(nbrs)
    out = {}
    while True:
        live = {
            v: {u for u in nbrs[v] if u in unassigned} for v in unassigned
        }
        cands = [v for v, ns in live.items() if len(ns) >= need]
        if not cands:
            break
        c = min(cands, key=lambda v: (-len(live[v]), v))
        out[c] = c
        for u in live[c]:
            out[u] = c
        unassigned -= live[c] | {c}
    return out
