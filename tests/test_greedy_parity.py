"""North-rule parity: connected-components labels must co-cluster >= 0.99
of the pairs the reference's greedy star clusterer would co-cluster, given
the SAME candidate graph (identical signatures + banding by construction —
SURVEY.md §3.3 argues recall is structurally 1.0; this verifies it)."""

from gaoya_spark.config import MinHashConfig, TokenizerSpec
from gaoya_spark.fixtures import make_images_df
from gaoya_spark.operators.cluster import connected_components
from gaoya_spark.operators.greedy_oracle import (
    co_clustered_pairs,
    greedy_star_clusters,
    recall_vs_greedy,
)
from gaoya_spark.operators.minhash_lsh import MinHashLSH


def test_greedy_oracle_semantics():
    # star around 1; point 4 isolated
    edges = [(1, 2), (1, 3), (2, 3)]
    a = greedy_star_clusters([1, 2, 3, 4], edges)
    assert a == {1: 1, 2: 1, 3: 1}
    # serial strict '>' drops clusters at exactly min size
    a = greedy_star_clusters([1, 2], [(1, 2)], min_cluster_size=2, inclusive=False)
    assert a == {}


def test_cc_recall_vs_greedy_on_candidate_graph(spark):
    df, _ = make_images_df(spark, 500, seed=7, dup_frac=0.3, with_bytes=False)
    cfg = MinHashConfig(
        num_bands=42, band_width=3, threshold=0.5,
        tokenizer=TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True),
        phash_token_weight=1,
    )
    lsh = MinHashLSH(cfg)
    sigs = lsh.signatures(df, "image_id", "caption", phash_col="phash")
    pairs = [(r["src"], r["dst"]) for r in lsh.dedup_pairs(sigs).collect()]

    points = sorted({r["image_id"] for r in df.select("image_id").collect()})
    greedy = greedy_star_clusters(points, pairs)

    edges_df = spark.createDataFrame(pairs or [("x", "y")], "src string, dst string")
    cc = connected_components(edges_df, nodes=df.select("image_id"))
    cc_labels = {r["id"]: r["component"] for r in cc.collect()}

    r = recall_vs_greedy(cc_labels, greedy)
    assert r >= 0.99, f"recall vs greedy oracle {r}"
    # structural argument says exactly 1.0 on star graphs
    assert r == 1.0
