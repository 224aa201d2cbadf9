"""spark-submit entrypoint for the image+caption dedup pipeline.

Cluster launch (north rule):

    cd /root/repo && zip -r /tmp/gaoya_spark.zip gaoya_spark
    spark-submit \
        --py-files /tmp/gaoya_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        tools/submit_pipeline.py \
        --input  <iceberg-table-or-parquet-path> \
        --warehouse <warehouse-path> \
        [--resume] [--min-cluster-size 2] [--no-simhash] [--substring]

Local sandbox equivalent (verified here):

    python tools/submit_pipeline.py --input /tmp/images.parquet \
        --warehouse /tmp/wh

The script only builds the session when not launched via spark-submit
(getOrCreate picks up the submitted context either way); all tuning lives
in --conf flags so the same file works on any cluster size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="images table path (parquet dir or iceberg table)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the stage manifest (default: force rerun)")
    ap.add_argument("--min-cluster-size", type=int, default=2)
    ap.add_argument("--cluster-algorithm", choices=["labelprop", "twophase"],
                    default="labelprop",
                    help="distributed CC algorithm: labelprop (O(diameter) "
                         "rounds) or twophase large-star/small-star "
                         "(O(log n) rounds, safe for unknown diameters)")
    ap.add_argument("--no-simhash", action="store_true")
    ap.add_argument("--substring", action="store_true")
    ap.add_argument("--check-invariants", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("gaoya_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from gaoya_spark.plans.pipeline import DedupPipeline, PipelineConfig

    cfg = PipelineConfig(
        use_simhash=not args.no_simhash,
        use_substring=args.substring,
        min_cluster_size=args.min_cluster_size,
        cluster_algorithm=args.cluster_algorithm,
    )
    images = spark.read.parquet(args.input)
    pipe = DedupPipeline(spark, args.warehouse, cfg)
    clusters = pipe.run(images, force=not args.resume)
    n = clusters.count()

    report = {
        "clusters_rows": n,
        "stages": pipe.wh.manifest()["stages"],
    }
    if args.check_invariants:
        report["invariants"] = pipe.verify_invariants(images, images, sample_frac=0.05)
    print(json.dumps(report, indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
