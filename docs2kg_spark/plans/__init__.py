from docs2kg_spark.plans.pipeline import run_pipeline  # noqa: F401
