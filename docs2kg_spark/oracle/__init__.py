from docs2kg_spark.oracle.reference import (  # noqa: F401
    ReferenceOracle,
)
