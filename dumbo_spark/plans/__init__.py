from dumbo_spark.plans.explain import physical_summary

__all__ = ["physical_summary"]
