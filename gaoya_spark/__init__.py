"""gaoya_spark — a PySpark-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the query/data-processing capabilities of
serega/gaoya (MinHash banded LSH, SimHash Hamming-ball LSH, greedy-star
clustering) re-expressed Spark-first:

- signatures are computed by vectorized NumPy kernels inside Arrow-batched
  ``pandas_udf``s (one JVM<->Python crossing per batch, never per row);
- the LSH "hash table of hash tables" becomes ``posexplode`` + shuffle on
  ``(band_idx, band_hash)`` — the shuffle *is* the index;
- candidate verification is a JVM-side ``zip_with``/``aggregate`` expression
  (whole-stage codegen, no Python in the verify path);
- clustering is iterative smallest-id label propagation (connected
  components) with per-iteration checkpoints, replacing the reference's
  lock-free greedy star clusterer (same co-clustering outcome on star
  candidate graphs, see SURVEY.md §3.3);
- everything checkpoints to a warehouse of tables (parquet directories
  locally; Iceberg when a runtime jar is on the classpath) so a 10^12-row
  run is resumable per stage.

Reference parity is *behavioral* (recall, jaccard-estimation error, query
result sets — the properties gaoya's own tests assert), not byte-level:
see SURVEY.md §7.2.1.
"""

from gaoya_spark.params import calculate_b_and_r, calculate_minhash_params
from gaoya_spark.config import MinHashConfig, SimHashConfig, TokenizerSpec

__version__ = "0.1.0"

__all__ = [
    "calculate_b_and_r",
    "calculate_minhash_params",
    "MinHashConfig",
    "SimHashConfig",
    "TokenizerSpec",
]
