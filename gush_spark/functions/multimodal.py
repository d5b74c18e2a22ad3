"""Multimodal column plumbing — opaque binary payloads + typed metadata.

A web-scale corpus carries image/audio/video alongside text. The engine
treats those as opaque ``binary`` columns with a typed metadata struct,
exactly like ``html: binary`` in the pages table (BASELINE.json
input_hint): Spark never interprets the bytes JVM-side; decode /
feature-extract runs as Arrow-batched ``mapInPandas`` — the same hot
path as html extraction (gush_spark/functions/extract.py).

Compressed-format codecs (PIL/librosa/ffmpeg for JPEG/PNG/MP3/MP4) are
NOT available in this environment, so those decode steps are stubbed
behind ``NotImplementedError`` with a clearly-marked deterministic
fallback (`blob_features`: content digest + length — everything a
codec-free pipeline can honestly compute). The UNCOMPRESSED formats
need no external codec and decode for real: ``functions/media.py``
parses WAV/PCM (stdlib ``wave``) and 24/32-bit BMP (``struct``) and
extracts pinned-value features through the identical mapInPandas
plumbing — proof the contract carries real decoders; swapping in PIL
at deploy time changes one function. The Spark-side contract — schema,
Arrow batch shape, partition-preserving mapInPandas, error-column
convention (P10 analog: errors are data, the stream survives) — is
real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("blob_len", T.LongType()),
        T.StructField("blob_md5", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_image(blob: bytes) -> "object":
    """STUB — compressed-image decode (JPEG/PNG) requires PIL/opencv,
    absent in this container. At deploy time this returns an
    ndarray(h, w, c); uncompressed BMP decodes for real TODAY via
    functions/media.decode_bmp through the same plumbing."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(blob: bytes) -> "object":
    """STUB — compressed-audio decode (MP3/OGG) requires
    soundfile/librosa, absent here; PCM WAV decodes for real via
    functions/media.decode_wav."""
    raise NotImplementedError("audio codec not available in this environment")


def sample_video_frames(blob: bytes, every_n: int = 30) -> "list":
    """STUB — frame sampling requires ffmpeg/opencv, absent here."""
    raise NotImplementedError("video codec not available in this environment")


def blob_feature_frame(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic codec-free features for one Arrow batch: byte
    length + md5 digest; null blob → error row (the P10 error-channel
    convention — never raise, the stream must survive)."""
    lens, digests, errs = [], [], []
    for b in blobs:
        if b is None:
            lens.append(None); digests.append(None); errs.append("null blob")
            continue
        raw = bytes(b)
        lens.append(len(raw))
        digests.append(hashlib.md5(raw).hexdigest())
        errs.append(None)
    return pd.DataFrame({"blob_len": pd.array(lens, dtype="Int64"),
                         "blob_md5": digests, "decode_error": errs})


def with_blob_features(
    df: DataFrame, blob_col: str, passthrough: list[str]
) -> DataFrame:
    """Arrow-batched feature extraction over an opaque binary column via
    ``mapInPandas`` — partition-preserving (no shuffle), batch-shaped
    like the html extractor. ``passthrough`` columns ride along so the
    output joins back without a shuffle."""
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + list(BLOB_FEATURES_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = blob_feature_frame(pdf[blob_col])
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), feats], axis=1
            )

    return df.mapInPandas(run, schema=out_schema)
