from docs2kg_spark.sources.gazetteer import load_gazetteer_csv  # noqa: F401
