from dataintegration_ecomprovider_spark.plans.registry import QueryDef, all_queries  # noqa: F401
