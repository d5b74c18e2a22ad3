"""Real decode paths for the uncompressed media formats — WAV (PCM) and
BMP (24/32-bit) — built from the stdlib alone (``wave``/``struct``) plus
numpy, so a container with no PIL/librosa/ffmpeg still decodes the
formats that don't need a codec. Compressed formats (JPEG/PNG/MP3/MP4)
remain the honest stubs in functions/multimodal.py; this module is the
proof that the mapInPandas plumbing carries REAL decoders when one is
available — the decode step is the only swap.

Feature semantics (all deterministic, unit-pinned):
- audio (WAV/PCM): channels, sample rate, frame count, duration,
  RMS amplitude (normalized to [-1, 1]), zero-crossing rate of the
  mean-over-channels signal — the standard silence/clipping/junk
  screens an audio-corpus pipeline gates on.
- image (BMP, uncompressed 24/32-bit bottom-up or top-down): width,
  height, channels, mean brightness per RGB channel in [0, 1] — the
  black-frame/blown-out screens.

Scale shape: identical to the text extractor — Arrow-batched
``mapInPandas``, partition-preserving, error-column convention (a
malformed blob yields an error ROW, never an exception: the stream
survives, P10 analog).
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def decode_wav(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a PCM WAV blob → (n_channels, sample_rate, n_frames,
    float array shaped (n_frames, n_channels) normalized to [-1, 1]).
    Raises ValueError on malformed input (callers convert to error
    rows)."""
    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            nch, width, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"bad wav: {e}") from e
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype="u1").astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"bad wav: unsupported sample width {width}")
    n = (len(x) // nch) if nch else 0
    return nch, rate, n, x[: n * nch].reshape(n, nch)


def decode_bmp(blob: bytes) -> np.ndarray:
    """Parse an uncompressed 24/32-bit BMP → uint8 array (h, w, 3) in
    RGB order. Handles bottom-up (positive height) and top-down rows
    and the 4-byte row padding. Raises ValueError on anything else
    (compressed/paletted BMPs need a real codec)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("bad bmp: missing BM header")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError("bad bmp: ancient header")
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"bad bmp: compression={compression} bpp={bpp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("bad bmp: implausible dimensions")
    # pixel data must start AFTER the file header (14) + info header:
    # an offset pointing back into the headers would "decode" header
    # bytes as pixels and return confidently wrong features
    if data_off < 14 + hdr_size:
        raise ValueError("bad bmp: pixel offset inside the headers")
    bytes_px = bpp // 8
    row_stride = (w * bytes_px + 3) & ~3
    need = data_off + row_stride * h
    if len(blob) < need:
        raise ValueError("bad bmp: truncated pixel data")
    rows = np.frombuffer(
        blob, dtype="u1", count=row_stride * h, offset=data_off
    ).reshape(h, row_stride)
    px = rows[:, : w * bytes_px].reshape(h, w, bytes_px)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A) → RGB
    return px[:, :, 2::-1].copy()


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

_AUDIO_NULLS = {f.name: None for f in AUDIO_FEATURES_SCHEMA.fields}
_IMAGE_NULLS = {f.name: None for f in IMAGE_FEATURES_SCHEMA.fields}


def audio_feature_row(blob) -> dict:
    if blob is None:
        return {**_AUDIO_NULLS, "decode_error": "null blob"}
    try:
        nch, rate, n, x = decode_wav(bytes(blob))
        mono = x.mean(axis=1) if n else np.zeros(0)
        rms = float(np.sqrt(np.mean(np.square(x)))) if n else 0.0
        zcr = (
            float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            if n > 1
            else 0.0
        )
        return {
            "n_channels": nch, "sample_rate": rate, "n_frames": n,
            "duration_s": (n / rate) if rate else 0.0,
            "rms": round(rms, 9), "zero_crossing_rate": round(zcr, 9),
            "decode_error": None,
        }
    except ValueError as e:
        return {**_AUDIO_NULLS, "decode_error": str(e)}


def image_feature_row(blob) -> dict:
    if blob is None:
        return {**_IMAGE_NULLS, "decode_error": "null blob"}
    try:
        px = decode_bmp(bytes(blob))
        means = px.reshape(-1, 3).mean(axis=0) / 255.0
        return {
            "width": px.shape[1], "height": px.shape[0], "n_channels": 3,
            "mean_r": round(float(means[0]), 9),
            "mean_g": round(float(means[1]), 9),
            "mean_b": round(float(means[2]), 9),
            "decode_error": None,
        }
    except ValueError as e:
        return {**_IMAGE_NULLS, "decode_error": str(e)}


def _map_features(df, blob_col, passthrough, schema, row_fn) -> DataFrame:
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + list(schema.fields)
    )
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame(
                [row_fn(b) for b in pdf[blob_col]], columns=names
            )
            for f in schema.fields:
                if isinstance(f.dataType, T.LongType):
                    feats[f.name] = feats[f.name].astype("Int64")
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), feats], axis=1
            )

    return df.mapInPandas(run, schema=out_schema)


def with_audio_features(
    df: DataFrame, blob_col: str, passthrough: list[str]
) -> DataFrame:
    """WAV decode + feature extraction over an opaque binary column —
    partition-preserving mapInPandas, error rows for undecodable blobs."""
    return _map_features(
        df, blob_col, passthrough, AUDIO_FEATURES_SCHEMA, audio_feature_row
    )


def with_image_features(
    df: DataFrame, blob_col: str, passthrough: list[str]
) -> DataFrame:
    """BMP decode + feature extraction over an opaque binary column —
    partition-preserving mapInPandas, error rows for undecodable blobs."""
    return _map_features(
        df, blob_col, passthrough, IMAGE_FEATURES_SCHEMA, image_feature_row
    )


# ---------------------------------------------------------------------------
# perceptual near-dup: 64-bit average hash + pigeonhole Hamming pairing
# ---------------------------------------------------------------------------

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

_AHASH_NULLS = {f.name: None for f in AHASH_SCHEMA.fields}


def ahash64(px: "np.ndarray") -> int:
    """64-bit average hash (aHash — the classic perceptual baseline:
    8×8 block means of the integer luma, one bit per block set when the
    block mean exceeds the global mean of block means). Deterministic:
    integer BT.601 luma (299r+587g+114b — no division, the threshold
    comparison is scale-invariant), float64 block means in fixed
    raster order. Bit 63 is block (0,0), raster order down to bit 0.
    Requires at least 8×8 pixels (a smaller image has empty blocks)."""
    g = px.astype(np.int64) @ np.array([299, 587, 114], dtype=np.int64)
    h, w = g.shape
    if h < 8 or w < 8:
        raise ValueError(f"too small for ahash: {w}x{h}")
    rs = np.array_split(np.arange(h), 8)
    cs = np.array_split(np.arange(w), 8)
    means = np.array(
        [[g[np.ix_(r, c)].mean() for c in cs] for r in rs], dtype=np.float64
    )
    bits = (means > means.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << (63 - i)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed long


def ahash_row(blob) -> dict:
    if blob is None:
        return {**_AHASH_NULLS, "decode_error": "null blob"}
    try:
        px = decode_bmp(bytes(blob))
        return {
            "width": px.shape[1],
            "height": px.shape[0],
            "ahash": ahash64(px),
            "decode_error": None,
        }
    except ValueError as e:
        return {**_AHASH_NULLS, "decode_error": str(e)}


def with_image_ahash(
    df: DataFrame, blob_col: str, passthrough: list[str]
) -> DataFrame:
    """BMP decode + 64-bit aHash over an opaque binary column — the
    same partition-preserving mapInPandas/error-row plumbing as the
    feature extractors; only the per-row kernel differs. The hash is
    the IMAGE analog of the text minhash band digest: computed once at
    ingest, it is all later dedup passes ever touch (8 bytes per image
    on every wire, never pixels)."""
    return _map_features(df, blob_col, passthrough, AHASH_SCHEMA, ahash_row)


def ahash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "ahash",
    *,
    max_hamming: int = 7,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over 64-bit
    perceptual hashes — the pigeonhole-complete blocking from the text
    SimHash operator (operators/dedup.py) lifted to 64 bits: split the
    hash into 8 byte-segments; two hashes within Hamming ``d ≤ 7``
    differ in at most 7 segments, so they AGREE on at least one —
    candidates from 8 equi-self-joins on (segment index, byte) lose
    NOTHING at d ≤ 7 (``max_hamming`` above 7 raises rather than
    silently under-recalling), and the exact ``bit_count(xor)`` verify
    drops the rest. All JVM bit expressions; 8-byte hashes + ids on
    the wire, pixels never."""
    if max_hamming > 7:
        raise ValueError(
            f"max_hamming={max_hamming} breaks 8-segment pigeonhole (max 7)"
        )
    from pyspark.sql import functions as F

    long = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.expr(f"({hash_col} >> {8 * k}) & 255")
                        .cast("int")
                        .alias("seg"),
                    )
                    for k in range(8)
                ]
            )
        ).alias("_s"),
    ).select("_id", "_h", F.col("_s.k").alias("k"), F.col("_s.seg").alias("seg"))
    a = long.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "k", "seg"
    )
    b = long.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "k", "seg"
    )
    cand = (
        a.join(b, ["k", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("_ha ^ _hb")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("afp", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

_AFP_NULLS = {f.name: None for f in AUDIO_FP_SCHEMA.fields}


def afp64(x: "np.ndarray") -> int:
    """64-bit energy-envelope audio fingerprint: mean-over-channels
    signal split into 64 equal-time chunks, one bit per chunk set when
    the chunk RMS exceeds the mean of chunk RMSes. GAIN-INVARIANT by
    construction (a global volume change scales every chunk RMS and
    the threshold identically — the re-encoded-louder copy hashes the
    same), robust to small edits the way aHash is for images. Bit 63
    is the first chunk. Needs ≥ 64 frames (shorter clips have empty
    chunks)."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n = mono.shape[0]
    if n < 64:
        raise ValueError(f"too short for afp: {n} frames")
    chunks = np.array_split(mono, 64)
    rms = np.array([float(np.sqrt(np.mean(np.square(c)))) for c in chunks])
    bits = rms > rms.mean()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << (63 - i)
    return val - (1 << 64) if val >= (1 << 63) else val


def afp_row(blob) -> dict:
    if blob is None:
        return {**_AFP_NULLS, "decode_error": "null blob"}
    try:
        nch, rate, n, x = decode_wav(bytes(blob))
        return {
            "n_frames": n,
            "duration_s": (n / rate) if rate else 0.0,
            "afp": afp64(x),
            "decode_error": None,
        }
    except ValueError as e:
        return {**_AFP_NULLS, "decode_error": str(e)}


def with_audio_fingerprint(
    df: DataFrame, blob_col: str, passthrough: list[str]
) -> DataFrame:
    """WAV decode + 64-bit envelope fingerprint — same plumbing, same
    8-bytes-forever contract as the image aHash; pair downstream with
    :func:`ahash_near_dup_pairs` (it is hash-source-agnostic: any
    64-bit column, same pigeonhole guarantee)."""
    return _map_features(df, blob_col, passthrough, AUDIO_FP_SCHEMA, afp_row)
