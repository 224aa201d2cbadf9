"""Regression guard for the round-5 bench measurement bug: a timed plan
must CONTAIN the work being timed. Catalyst prunes columns that no
aggregate references — including pandas-UDF columns, silently dropping
the UDF from the executed plan — so a materializer that references only
some columns measures nothing for the others."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _udf_in_executed_plan(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "EvalPython" in plan or "MapInPandas" in plan


def test_force_keeps_udf_in_plan(spark):
    import bench

    @F.pandas_udf(LongType())
    def slow_sig(s):
        return s * 2

    df = spark.range(100).select("id", slow_sig("id").alias("sig"))
    # the bug: aggregating only the first column prunes the UDF
    pruned = df.agg(F.count("*"), F.max("id"))
    assert not _udf_in_executed_plan(pruned), (
        "precondition: Catalyst no longer prunes unused pandas-UDF "
        "columns — the _force guard may be obsolete"
    )
    # _force must reference every column so nothing can be pruned
    forced = df.agg(F.count("*"), *[F.max(c) for c in df.columns])
    assert _udf_in_executed_plan(forced)
    assert bench._force(df) == 100
