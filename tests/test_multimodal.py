import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.multimodal import (
    FEATURE_DIM,
    assets_from_documents,
    extract_features,
    real_decode,
)


def test_asset_schema_and_features(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    assets = assets_from_documents(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = extract_features(assets).cache()
    assert feats.count() == 50
    dims = feats.select(F.size("features").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [FEATURE_DIM]
    # payload byte count survives the round trip
    joined = assets.join(feats, "asset_id").select(
        (F.length("payload") == F.col("n_bytes")).alias("ok")
    )
    assert joined.filter(~F.col("ok")).count() == 0


def test_features_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    a = {r.asset_id: r.features for r in extract_features(assets_from_documents(docs)).collect()}
    b = {r.asset_id: r.features for r in extract_features(assets_from_documents(docs)).collect()}
    assert a == b


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"...", "image")
