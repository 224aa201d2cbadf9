"""Text-file corpus sources (reference S1-S3: load_from_lines /
load_from_file / load_from_file_parallel at
/root/reference/gaoya/src/minhash/string_index.rs:53-104).

The reference assigns sequential ids while inserting lines one-by-one (or
rayon-parallel). Spark-side, stable sequential ids over a distributed text
read come from zipWithIndex (exact, order-preserving per file+offset) —
monotonically_increasing_id would be partition-sparse. Parallelism is free
from partitioning (S3's rayon loop is the degenerate single-node case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_lines(spark: SparkSession, path: str) -> DataFrame:
    """(id: long sequential from 0, text: string) — one row per line."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (t[1], t[0])), "id long, text string"
    )


def load_and_index(
    spark: SparkSession, path: str, lsh, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """S2/S3: file -> lines -> signatures. Returns (corpus, signatures);
    'inserting' is materializing the signatures table."""
    corpus = load_lines(spark, path)
    sigs = lsh.signatures(corpus, "id", text_col)
    return corpus, sigs
