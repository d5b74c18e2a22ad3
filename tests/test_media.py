"""Real stdlib decoders for uncompressed media (functions/media.py):
WAV/PCM and BMP blobs synthesized in-test, exact feature values, error
rows for malformed input, and the partition-preserving plan."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from gush_spark.functions.media import (
    with_audio_features,
    with_image_features,
)


def _wav_bytes(freq=440, rate=8000, n=800, ch=1, width=2):
    t = np.arange(n)
    x = np.sin(2 * np.pi * freq * t / rate)
    pcm = (x * 32767).astype("<i2").tobytes() * ch if ch == 1 else None
    if ch == 2:
        inter = np.repeat((x * 32767).astype("<i2"), 2)
        pcm = inter.tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def _bmp_bytes(w, h, rgb, top_down=False):
    """Solid-color uncompressed 24-bit BMP."""
    stride = (w * 3 + 3) & ~3
    row = bytes(rgb[::-1]) * w + b"\x00" * (stride - w * 3)
    pixels = row * h
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def test_wav_features_exact(spark):
    blobs = [
        (1, _wav_bytes()),                      # mono 16-bit sine
        (2, _wav_bytes(ch=2)),                  # stereo
        (3, b"RIFFnotawav"),                    # malformed
        (4, None),                              # null
    ]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    out = {r["id"]: r for r in with_audio_features(df, "blob", ["id"]).collect()}
    a = out[1]
    assert (a["n_channels"], a["sample_rate"], a["n_frames"]) == (1, 8000, 800)
    assert abs(a["duration_s"] - 0.1) < 1e-12
    # RMS of a full-scale sine ≈ 1/sqrt(2); ZCR ≈ 2*f/rate
    assert abs(a["rms"] - 0.7071) < 0.01
    assert abs(a["zero_crossing_rate"] - 2 * 440 / 8000) < 0.01
    assert out[2]["n_channels"] == 2 and abs(out[2]["rms"] - a["rms"]) < 1e-6
    assert out[3]["decode_error"] and out[3]["rms"] is None
    assert out[4]["decode_error"] == "null blob"


def test_bmp_features_exact_both_row_orders(spark):
    blobs = [
        (1, _bmp_bytes(5, 3, (255, 0, 0))),            # solid red, bottom-up
        (2, _bmp_bytes(5, 3, (0, 128, 0), top_down=True)),
        (3, b"BMgarbage"),
        (4, None),
    ]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    out = {r["id"]: r for r in with_image_features(df, "blob", ["id"]).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"], r1["n_channels"]) == (5, 3, 3)
    assert r1["mean_r"] == 1.0 and r1["mean_g"] == 0.0 and r1["mean_b"] == 0.0
    r2 = out[2]
    assert abs(r2["mean_g"] - 128 / 255) < 1e-9 and r2["mean_r"] == 0.0
    assert out[3]["decode_error"] and out[3]["width"] is None
    assert out[4]["decode_error"] == "null blob"


def test_media_plumbing_is_partition_preserving(spark):
    df = spark.createDataFrame([(1, _wav_bytes())], "id long, blob binary")
    plan = with_audio_features(df, "blob", ["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def _bmp_pattern(px_rows):
    """Uncompressed 24-bit BMP from an explicit (h, w, 3) RGB array."""
    import numpy as np

    arr = np.asarray(px_rows, dtype="u1")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        row = arr[r, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - w * 3))
    pixels = b"".join(rows)
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def test_ahash_halves_exact_value(spark):
    """Left half black, right half white on an 8x8 image: block bits
    are exactly 0 for the 4 left columns and 1 for the 4 right ones."""
    import numpy as np

    from gush_spark.functions.media import with_image_ahash

    img = np.zeros((8, 8, 3), dtype="u1")
    img[:, 4:, :] = 255
    df = spark.createDataFrame(
        [(1, _bmp_pattern(img))], "id long, blob binary"
    )
    row = with_image_ahash(df, "blob", ["id"]).collect()[0]
    assert row["decode_error"] is None
    # raster bit i (0..63) = 1 iff column i%8 >= 4 -> per-row nibble
    # 0b00001111; bit 63 is block (0,0)
    expected = 0
    for i in range(64):
        if i % 8 >= 4:
            expected |= 1 << (63 - i)
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    assert row["ahash"] == expected
    # too-small image -> error row, never an exception
    tiny = spark.createDataFrame(
        [(2, _bmp_pattern(np.zeros((4, 4, 3), dtype="u1")))],
        "id long, blob binary",
    )
    err = with_image_ahash(tiny, "blob", ["id"]).collect()[0]
    assert err["ahash"] is None and "too small" in err["decode_error"]


def test_ahash_near_dup_pairs_find_tweaked_copy(spark):
    """A one-block brightness tweak stays within Hamming 7 and pairs
    with its original; an unrelated pattern does not."""
    import numpy as np

    from gush_spark.functions.media import ahash_near_dup_pairs, with_image_ahash

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (16, 16, 3)).astype("u1")
    tweak = base.copy()
    tweak[0:2, 0:2, :] = 255  # perturb one 2x2 corner block
    other = rng.randint(0, 256, (16, 16, 3)).astype("u1")
    df = spark.createDataFrame(
        [(1, _bmp_pattern(base)), (2, _bmp_pattern(tweak)),
         (3, _bmp_pattern(other))],
        "id long, blob binary",
    )
    hashes = with_image_ahash(df, "blob", ["id"])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(hashes, "id").collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 7
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ahash_pairing_pigeonhole_boundary(spark):
    """Crafted hashes at EXACTLY Hamming 7 (bits spread over 7 distinct
    byte segments) must pair — the blocking provably loses nothing at
    the bound; Hamming 8 across all 8 segments must not."""
    from gush_spark.functions.media import ahash_near_dup_pairs

    h0 = 0
    h7 = 0
    for k in range(7):          # flip one bit in segments 0..6
        h7 |= 1 << (8 * k)
    h8 = 0
    for k in range(8):          # flip one bit in EVERY segment
        h8 |= 1 << (8 * k)
    df = spark.createDataFrame(
        [(1, h0), (2, h7), (3, h8)], "id long, ahash long"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(df, "id").collect()
    }
    assert pairs[(1, 2)] == 7
    assert (1, 3) not in pairs  # hamming 8: correctly above the bound
    import pytest as _pt

    with _pt.raises(ValueError):
        ahash_near_dup_pairs(df, "id", max_hamming=8)


def test_audio_fingerprint_gain_invariant_and_pairs(spark):
    """The envelope fingerprint is bit-identical under a global volume
    change (re-encoded-louder copy), pairs with a lightly clipped copy
    within Hamming 7, and differs from an unrelated envelope."""
    import numpy as np

    from gush_spark.functions.media import (
        afp64,
        ahash_near_dup_pairs,
        with_audio_fingerprint,
    )

    rng = np.random.RandomState(11)
    env = np.repeat(rng.rand(64), 100)  # 6400-frame random envelope
    carrier = np.sin(np.arange(6400) * 0.7)
    sig = env * carrier

    def wav_of(x):
        import io as _io
        import wave as _wave

        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
            w.writeframes(pcm)
        return buf.getvalue()

    assert afp64(sig) == afp64(sig * 0.5)  # gain invariance, exact
    tweaked = sig.copy()
    tweaked[:300] = 0.0  # silence the first chunks' worth
    other = rng.rand(6400) * np.sin(np.arange(6400) * 1.3)
    df = spark.createDataFrame(
        [(1, wav_of(sig)), (2, wav_of(sig * 0.8)), (3, wav_of(tweaked)),
         (4, wav_of(other)), (5, wav_of(sig[:40]))],
        "id long, blob binary",
    )
    fps = with_audio_fingerprint(df, "blob", ["id"])
    rows = {r["id"]: r for r in fps.collect()}
    assert "too short" in rows[5]["decode_error"]  # 40 frames < 64
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(fps, "id", "afp").collect()
    }
    # 16-bit quantization of the 0.8x copy can flip at most boundary
    # chunks; the pair must survive well under the bound
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert (1, 3) in pairs and pairs[(1, 3)] <= 7
    assert (1, 4) not in pairs
