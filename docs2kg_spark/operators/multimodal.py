"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode is REAL for uncompressed/deflate formats (BMP, PPM/PGM,
WAV-PCM, PNG, and APNG video with frame sampling — pure-stdlib
codecs in operators/media.py; see
real_decode / media.media_features, exercised end-to-end by the
oracled `multimodal_real_decode` query).  Compressed codecs
(JPEG/MP3/H.264) still need PIL/ffmpeg, absent in this container —
`_fake_decode` remains the deterministic default featurizer for
opaque payloads, and `extract_features(decode=...)` is the injection
seam for either the real media featurizer or a cluster's codec stack.

Real-deployment note: pass `decode=media.media_features` (or a
PIL/ffmpeg call) — the dataflow (binary in → fixed-dim float features
out, Arrow-batched) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def assets_from_documents(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic fake asset table from the documents table:
    payload = utf-8 bytes of the text (an opaque stand-in binary)."""
    return documents.select(
        F.sha2(F.concat_ws("|", F.lit(kind), F.col("doc_id").cast("string")), 256).alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("source_doc"), F.lit("codec")),
            F.array(F.col("doc_id").cast("string"), F.lit("fake/v1")),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for image/audio decode: hash-seeded feature
    vector.  REAL decode is intentionally not implemented here — the
    sandbox has no media libraries."""
    h = hashlib.sha256((kind or "").encode() + (payload or b"")).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def real_decode(payload: bytes, kind: str):
    """REAL decode for uncompressed/deflate formats — pure stdlib
    (operators/media.py): BMP, PPM/PGM, WAV-PCM, and PNG (zlib IDAT +
    all five row filters).  Compressed codecs (JPEG/MP3/H.264) still
    raise NotImplementedError inside — that boundary genuinely needs
    PIL/ffmpeg, which this container lacks."""
    from docs2kg_spark.operators.media import media_decode

    return media_decode(payload, kind)


def extract_features(assets: DataFrame, batch_hint: int = 256, decode=None) -> DataFrame:
    """binary assets → fixed-dim features via mapInPandas (Arrow batch
    iterator — the pattern a real image/audio featurizer plugs into).

    ``decode`` is the injection seam for real codecs: any callable
    (payload: bytes, kind: str) -> sequence[float] — e.g. a
    PIL/ffmpeg/librosa featurizer on a cluster that has them — is
    shipped to the workers via the UDF closure, so a user with media
    libraries plugs in WITHOUT editing this operator.  Defaults to the
    deterministic hash featurizer (the sandbox has no codecs;
    ``real_decode`` documents that boundary)."""
    fn = decode or _fake_decode

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [list(map(float, fn(p, k))) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return assets.mapInPandas(featurize, schema=FEATURE_SCHEMA)
