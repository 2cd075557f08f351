"""Multimodal column plumbing (SURVEY §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED: this container has no image/audio codecs, so
``decode_image``/``decode_audio`` raise NotImplementedError by default and
``attach_fake_image_features`` substitutes a deterministic md5-derived
feature vector. Everything Spark-side — schema, batch iteration, partition
behavior, UDF signatures — is real and tested; swapping the fake for
PIL/torchaudio is a one-function change on the executor side.

At 100 TB: binary payloads ride in their own parquet column (column pruning
keeps metadata-only queries from ever touching bytes); feature extraction is
a mapInPandas over row-group-sized Arrow batches — one pass, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decode requires an image codec (PIL/libvips) not present in this
    environment. Swap this function in deployment."""
    raise NotImplementedError("image codecs unavailable in this environment")


def decode_audio(payload: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError("audio codecs unavailable in this environment")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding: md5 bytes scaled
    to [-1, 1]. Stable across engines and runs."""
    import hashlib

    digest = hashlib.md5(payload or b"").digest()
    return [b / 127.5 - 1.0 for b in digest[:dim]]


def attach_fake_image_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """mapInPandas feature-extraction stage with the decode stubbed.

    Output: every input column except the payload (bytes are dropped after
    processing — the 100 TB pattern), plus n_bytes and a feature vector.
    """
    keep = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [df.schema[c] for c in keep]
        + [
            StructField("n_bytes", LongType(), True),
            StructField("feature", ArrayType(FloatType()), True),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = batch[payload_col]
            out = batch[keep].copy()
            out["n_bytes"] = payloads.map(lambda b: len(b) if b is not None else 0)
            out["feature"] = payloads.map(lambda b: _fake_feature(bytes(b or b""), dim))
            yield out

    return df.mapInPandas(_extract, schema=out_schema)
