from gaoya_spark.plans.pipeline import DedupPipeline, PipelineConfig

__all__ = ["DedupPipeline", "PipelineConfig"]
