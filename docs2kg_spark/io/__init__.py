from docs2kg_spark.io.sinks import TableStore  # noqa: F401
