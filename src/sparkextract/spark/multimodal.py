"""Multimodal (binary) column operators — Spark-side plumbing for image /
audio / video payloads carried as opaque ``binary`` columns with typed
metadata (the training-data-pipeline extension of the reference's
ExtractedImage model, /root/reference/src/image_extractor.py:56-70).

The sandbox has no image/audio codecs, so the decode step is STUBBED
(deterministic fake decoder, clearly marked); everything Spark-side —
schema, Arrow batch shape, ``mapInPandas`` signature, partition behavior —
is real and tested. Swap ``_decode_stub`` for a PIL/ffmpeg call on a real
cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_DDL = (
    "media_id string, doc_id string, media_type string, "
    "n_bytes bigint, content_hash string, feature array<float>, decode_ok boolean"
)

_FEATURE_DIM = 16


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB decoder: a deterministic 16-dim feature from the byte content.

    Real implementation would be e.g. PIL.Image.open + resize + channel
    means (image), or librosa mel-spectrogram stats (audio). Raises for
    unknown media types exactly as a real decoder would.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for mid, did, mtype, payload in zip(
            pdf["media_id"], pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            raw = bytes(payload) if payload is not None else b""
            try:
                feat = _decode_stub(raw, mtype if isinstance(mtype, str) else "")
                ok = True
            except NotImplementedError:
                feat, ok = None, False
            rows.append(
                (
                    mid,
                    did,
                    mtype,
                    len(raw),
                    hashlib.md5(raw).hexdigest(),
                    feat,
                    ok,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id",
                "doc_id",
                "media_type",
                "n_bytes",
                "content_hash",
                "feature",
                "decode_ok",
            ],
        )


def featurize_media(media: DataFrame) -> DataFrame:
    """binary payloads -> per-media features, Arrow-batched.

    Scale: map-only over the scan splits (no shuffle); payload bytes never
    leave the executor that read them — only the 16-float feature and the
    hash move downstream."""
    from sparkextract.spark.session import ensure_workers_can_import

    ensure_workers_can_import(media.sparkSession)
    return media.mapInPandas(_featurize_batches, schema=FEATURE_DDL)


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup by content hash (D2 analog with size priority:
    keep the largest payload, then lowest media_id)."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("content_hash").orderBy(
        F.desc("n_bytes"), F.asc("media_id")
    )
    return (
        features.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
