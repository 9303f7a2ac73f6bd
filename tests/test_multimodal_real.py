"""Real-bytes multimodal coverage: genuine PNG and WAV payloads flow
through the decode_stub=False path of every multimodal operator.

Fixtures are synthesized at test time by the repo's own stdlib encoders
(operators/codecs.py) — real, spec-compliant files without binary blobs
checked into git. The decoders are independently validated against
hand-built filtered scanlines, so encode->decode is not a tautology."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_exporter_spark.operators import codecs
from parquet_exporter_spark.operators.multimodal import (
    audio_window_energy,
    decode_features,
    image_average_hash,
    resize_images,
    sample_frames,
)


def _gradient_png(w: int, h: int, phase: int = 0) -> bytes:
    x = np.arange(w, dtype=np.uint16)
    y = np.arange(h, dtype=np.uint16)[:, None]
    img = np.stack(
        [
            ((x + y + phase) % 256).astype(np.uint8) + np.zeros((h, w), np.uint8),
            ((2 * x + phase) % 256).astype(np.uint8) + np.zeros((h, w), np.uint8),
            ((3 * y + phase) % 256).astype(np.uint8) + np.zeros((h, w), np.uint8),
        ],
        axis=2,
    )
    return codecs.encode_png(img)


def _sine_wav(n: int = 800, rate: int = 8000, freq: float = 440.0, amp: float = 0.5) -> bytes:
    t = np.arange(n) / rate
    return codecs.encode_wav(amp * np.sin(2 * np.pi * freq * t), rate)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, _gradient_png(16, 12)),
        (2, _gradient_png(9, 7, phase=40)),
        (3, _sine_wav()),
        (4, b"just some text bytes, not media"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_real_decode_features(media_df):
    out = {r.doc_id: r for r in decode_features(media_df, decode_stub=False).collect()}
    png = out[1]
    assert png.format == "image/png"
    assert (png.width, png.height) == (16, 12)
    # luma of the known gradient, computed independently of the codec
    x = np.arange(16, dtype=np.uint16)
    y = np.arange(12, dtype=np.uint16)[:, None]
    rgb = np.stack(
        [
            (x + y) % 256 + np.zeros((12, 16), np.uint16),
            (2 * x) % 256 + np.zeros((12, 16), np.uint16),
            (3 * y) % 256 + np.zeros((12, 16), np.uint16),
        ],
        axis=2,
    ).astype(np.float64)
    want = np.clip(np.round(rgb @ [0.299, 0.587, 0.114]), 0, 255).mean()
    assert abs(png.feature_mean - want) < 1e-9

    wav = out[3]
    assert wav.format == "audio/wav"
    assert wav.width == 800 and wav.height == 1  # frames, channels
    # mean |0.5 sin| = 0.5 * 2/pi ~= 0.3183
    assert abs(wav.feature_mean - 0.5 * 2 / np.pi) < 0.01

    other = out[4]
    assert other.format == "application/octet-stream"
    assert other.width == 0 and other.height == 0


def test_real_decode_tags_corrupt_blobs_instead_of_failing(spark, media_df):
    good = _gradient_png(8, 8)
    rows = [
        (10, good[: len(good) // 2]),          # truncated PNG (magic intact)
        (11, codecs.PNG_MAGIC + b"\x00" * 16),  # PNG magic, garbage body
        (12, b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"junk"),  # bad WAV
        (13, good),                             # control: still decodes
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_features(df, decode_stub=False).collect()}
    # NaN feature -> null through Arrow: corrupt rows carry no feature
    assert out[10].format == "corrupt/png" and out[10].feature_mean is None
    assert out[11].format == "corrupt/png"
    assert out[12].format == "corrupt/wav"
    assert out[13].format == "image/png" and (out[13].width, out[13].height) == (8, 8)


def test_real_resize_images(spark):
    # constant-color image must resize to a constant buffer of exactly
    # that gray level, any resampler
    img = codecs.encode_png(np.full((20, 30, 3), 200, dtype=np.uint8))
    df = spark.createDataFrame([(1, img)], "doc_id long, payload binary")
    row = resize_images(df, target_w=8, target_h=8, decode_stub=False).collect()[0]
    assert (row.width, row.height) == (8, 8)
    assert bytes(row.pixels) == bytes([200] * 64)


def test_real_frame_sampling_concatenated_pngs(spark):
    frames = [_gradient_png(6, 4, phase=i * 10) for i in range(9)]
    payload = b"".join(frames)
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    rows = sample_frames(df, every_n=4, decode_stub=False).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 4, 8]
    for r in rows:
        gray = codecs.to_grayscale(codecs.decode_png(frames[r.frame_idx]))
        assert bytes(r.frame) == gray.tobytes()


def test_real_frame_sampling_rejects_true_video(spark):
    df = spark.createDataFrame(
        [(7, b"\x00\x00\x00\x18ftypmp42 not a png")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="ffmpeg|concatenated-PNG"):
        sample_frames(df, decode_stub=False).collect()


def test_real_audio_window_energy(spark):
    # square wave built directly as +-0.75 (sign(sin) would hit exact
    # zeros at period boundaries) -> RMS of every window is exactly 0.75
    # up to PCM16 quantization
    sq = 0.75 * np.tile(np.repeat([1.0, -1.0], 4), 80)
    df = spark.createDataFrame(
        [(1, codecs.encode_wav(sq, 8000))], "doc_id long, payload binary"
    )
    rows = audio_window_energy(df, window=64, hop=64, decode_stub=False).collect()
    assert len(rows) == 10
    assert all(abs(r.energy - 0.75) < 1e-3 for r in rows)
    assert all(r.n_samples == 64 for r in rows)


def test_real_ahash_near_duplicate_images(spark):
    base = np.zeros((32, 32), dtype=np.uint8)
    base[8:24, 8:24] = 255  # bright square on black
    tweaked = base.copy()
    tweaked[0, 0] = 30  # tiny corner blemish
    inverted = 255 - base  # structurally opposite
    df = spark.createDataFrame(
        [
            (1, codecs.encode_png(base)),
            (2, codecs.encode_png(tweaked)),
            (3, codecs.encode_png(inverted)),
        ],
        "doc_id long, payload binary",
    )
    h = {r.doc_id: r.ahash for r in image_average_hash(df, decode_stub=False).collect()}
    ham = lambda a, b: bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")
    assert ham(h[1], h[2]) <= 4, "near-dup images must have close aHashes"
    assert ham(h[1], h[3]) >= 32, "inverted image must be far in Hamming space"


def test_real_bmp_roundtrip_and_features(spark):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    data = codecs.encode_bmp(img)
    assert codecs.sniff_format(data) == "image/bmp"
    assert np.array_equal(codecs.decode_bmp(data), img)
    # odd width exercises the 4-byte row padding path
    df = spark.createDataFrame([(1, data)], "doc_id long, payload binary")
    row = decode_features(df, decode_stub=False).collect()[0]
    assert row.format == "image/bmp"
    assert (row.width, row.height) == (7, 10)
    want = codecs.to_grayscale(img).mean()
    assert abs(row.feature_mean - want) < 1e-9
    # top-down BMP (negative height) decodes identically
    neg = bytearray(data)
    import struct as _s

    _s.pack_into("<i", neg, 22, -10)
    top_down = codecs.decode_bmp(bytes(neg))
    assert np.array_equal(top_down, img[::-1])


def test_codec_decoders_match_spec_not_just_own_encoder():
    # decode path exercises all five PNG filter types via hand-built
    # scanlines (not produced by encode_png, which only emits filter 0)
    import struct
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    rows = []
    prev = np.zeros(18, dtype=np.uint8)
    for y, ft in zip(range(8), [0, 1, 2, 3, 4, 4, 3, 1]):
        cur = img[y].reshape(-1)
        left = np.zeros_like(cur)
        left[3:] = cur[:-3]
        if ft == 0:
            line = cur.copy()
        elif ft == 1:
            line = cur - left
        elif ft == 2:
            line = cur - prev
        elif ft == 3:
            line = cur - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        else:
            ul = np.zeros_like(prev)
            ul[3:] = prev[:-3]
            line = cur - codecs._paeth(left, prev, ul)
        rows.append(bytes([ft]) + line.tobytes())
        prev = cur
    raw = b"".join(rows)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    data = (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 8, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(data), img)
