from mapreduce_spark.plans.spec import UNSET, QueryOptions

__all__ = ["QueryOptions", "UNSET"]
