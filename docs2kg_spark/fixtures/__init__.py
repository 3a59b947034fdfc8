from docs2kg_spark.fixtures.transcripts import (  # noqa: F401
    gen_transcripts,
    transcripts_pandas,
    transcripts_spark,
    write_transcripts_parquet,
)
