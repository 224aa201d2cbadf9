from gaoya_spark.sources.warehouse import Warehouse

__all__ = ["Warehouse"]
