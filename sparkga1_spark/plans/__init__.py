from sparkga1_spark.plans.registry import all_oracles, all_queries

__all__ = ["all_queries", "all_oracles"]
