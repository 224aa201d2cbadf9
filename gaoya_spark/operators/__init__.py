from gaoya_spark.operators.minhash_lsh import MinHashLSH
from gaoya_spark.operators.simhash_lsh import SimHashLSH
from gaoya_spark.operators.cluster import connected_components, clusters_from_labels

__all__ = ["MinHashLSH", "SimHashLSH", "connected_components", "clusters_from_labels"]
