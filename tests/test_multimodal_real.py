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


def test_real_frame_sampling_quarantines_true_video(spark):
    # A true video container (needs ffmpeg, not shipped) must NOT fail the
    # task: it degrades to one frame_idx=-1 tombstone row, and decodable
    # rows in the same batch still produce their frames.
    good = b"".join(_gradient_png(6, 4, phase=i * 10) for i in range(5))
    df = spark.createDataFrame(
        [(7, b"\x00\x00\x00\x18ftypmp42 not a png"), (8, good)],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, every_n=4, decode_stub=False).collect()
    bad = [r for r in rows if r.doc_id == 7]
    assert [(r.frame_idx, bytes(r.frame)) for r in bad] == [(-1, b"")]
    assert sorted(r.frame_idx for r in rows if r.doc_id == 8) == [0, 4]


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


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, stdlib-only codec)
# --------------------------------------------------------------------------


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = np.add.outer(np.arange(h) * 2, np.arange(w)) % 256
    img[:, :, 1] = np.add.outer(np.arange(h), np.arange(w)) % 256
    img[:, :, 2] = 100
    return img


def test_jpeg_roundtrip_bounded_error():
    # JPEG is lossy: assert bounded pixel error, never byte equality.
    img = _smooth_rgb(35, 51)
    for sub in ("444", "420"):
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img, 90, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 2.0, (sub, err)


def test_jpeg_gray_roundtrip_and_quality_monotonic():
    img = (np.add.outer(np.arange(24), np.arange(40)) % 256).astype(np.uint8)
    errs = []
    for q in (50, 75, 95):
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img, q))
        assert dec.shape == img.shape
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[-1]  # higher quality never increases error
    assert errs[-1] < 1.0


def test_jpeg_deterministic_and_sniffed():
    img = _smooth_rgb(16, 16)
    a = codecs.encode_jpeg(img, 85)
    assert a == codecs.encode_jpeg(img, 85)
    assert codecs.sniff_format(a) == "image/jpeg"
    d1, d2 = codecs.decode_jpeg(a), codecs.decode_jpeg(a)
    assert (d1 == d2).all()


def test_jpeg_restart_markers_decode_identically():
    img = _smooth_rgb(33, 49)
    plain = codecs.decode_jpeg(codecs.encode_jpeg(img, 90))
    rst = codecs.decode_jpeg(codecs.encode_jpeg(img, 90, restart_interval=2))
    assert (plain == rst).all()
    assert b"\xff\xdd" in codecs.encode_jpeg(img, 90, restart_interval=2)


def test_jpeg_odd_and_tiny_shapes():
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (7, 9), (8, 8), (9, 17)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        assert codecs.decode_jpeg(codecs.encode_jpeg(g, 95)).shape == shape
        c = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(c, 95, subsampling="420"))
        assert dec.shape == shape + (3,)


def test_jpeg_corrupt_streams_raise_valueerror():
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    for blob in (jb[:40], b"\xff\xd8\xff\xc2" + jb[4:], b"not a jpeg"):
        with pytest.raises(ValueError):
            codecs.decode_jpeg(blob)


def _sos_offset(jb: bytes) -> int:
    pos = jb.find(b"\xff\xda")
    assert pos > 0
    return pos


def test_jpeg_hostile_truncated_entropy_stream_raises_valueerror():
    # Cut INSIDE the entropy-coded data (past the SOS header): the bit
    # reader must exhaust with ValueError, never IndexError.
    jb = codecs.encode_jpeg(_smooth_rgb(24, 24), 90)
    pos = _sos_offset(jb)
    seg_len = int.from_bytes(jb[pos + 2:pos + 4], "big")
    entropy_start = pos + 2 + seg_len
    assert entropy_start + 4 < len(jb)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(jb[:entropy_start + 4])


def test_jpeg_hostile_bad_dqt_length_raises_valueerror():
    # Shrink the declared DQT length so the table is truncated: must be a
    # clean ValueError, not a silent short-table misparse.
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    pos = jb.find(b"\xff\xdb")
    assert pos > 0
    hostile = jb[:pos + 2] + (20).to_bytes(2, "big") + jb[pos + 4:]
    with pytest.raises(ValueError):
        codecs.decode_jpeg(hostile)


def test_jpeg_hostile_bad_dht_length_raises_valueerror():
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    pos = jb.find(b"\xff\xc4")
    assert pos > 0
    hostile = jb[:pos + 2] + (10).to_bytes(2, "big") + jb[pos + 4:]
    with pytest.raises(ValueError):
        codecs.decode_jpeg(hostile)


def test_jpeg_fill_bytes_before_markers_are_legal():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    base = codecs.decode_jpeg(jb)
    padded = jb[:2] + b"\xff\xff" + jb[2:]  # fill before the first segment
    assert (codecs.decode_jpeg(padded) == base).all()
    pos = jb.find(b"\xff\xdb")
    padded2 = jb[:pos] + b"\xff\xff\xff" + jb[pos:]
    assert (codecs.decode_jpeg(padded2) == base).all()


def test_jpeg_skips_appn_exif_and_comment_segments():
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    base = codecs.decode_jpeg(jb)
    exif = b"Exif\x00\x00" + bytes(range(16))
    app1 = b"\xff\xe1" + (2 + len(exif)).to_bytes(2, "big") + exif
    com = b"\xff\xfe" + (2 + 5).to_bytes(2, "big") + b"hello"
    assert (codecs.decode_jpeg(jb[:2] + app1 + com + jb[2:]) == base).all()


def test_jpeg_multiscan_baseline_raises_valueerror_not_keyerror():
    # A non-interleaved (one component per scan) baseline stream is legal
    # JPEG this decoder doesn't support: the contract is ValueError ->
    # quarantine, never a KeyError escaping _decode_scan.
    jb = codecs.encode_jpeg(_smooth_rgb(16, 16), 90)
    pos = _sos_offset(jb)
    seg_len = int.from_bytes(jb[pos + 2:pos + 4], "big")
    comp1 = jb[pos + 5:pos + 7]  # first (cid, tables) pair of the 3-comp SOS
    single = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + comp1 + b"\x00\x3f\x00"
    hostile = jb[:pos] + single + jb[pos + 2 + seg_len:]
    with pytest.raises(ValueError):
        codecs.decode_jpeg(hostile)


def test_jpeg_hostile_blobs_quarantine_through_spark(spark):
    from parquet_exporter_spark.operators.multimodal import decode_features

    jb = codecs.encode_jpeg(_smooth_rgb(24, 24), 95)
    sos = _sos_offset(jb)
    sos_len = int.from_bytes(jb[sos + 2:sos + 4], "big")
    dqt = jb.find(b"\xff\xdb")
    blobs = [
        jb[:sos + 2 + sos_len + 4],                               # cut entropy
        jb[:dqt + 2] + (20).to_bytes(2, "big") + jb[dqt + 4:],    # bad DQT len
        b"\xff\xd8\xff\xc2" + jb[4:],                             # progressive
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id long, payload binary"
    )
    rows = decode_features(df, decode_stub=False).orderBy("doc_id").collect()
    assert [r.format for r in rows] == ["corrupt/jpeg"] * 3
    assert all(r.feature_mean is None for r in rows)


def test_jpeg_through_decode_features(spark):
    img = _smooth_rgb(20, 30)
    jb = codecs.encode_jpeg(img, 95)
    truncated = jb[: len(jb) // 2]
    df = spark.createDataFrame(
        [(1, jb), (2, truncated)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_features(df, decode_stub=False).collect()}
    good = rows[1]
    assert good.format == "image/jpeg"
    assert (good.width, good.height) == (30, 20)
    # feature_mean must track the true gray mean within JPEG loss
    true_gray = float(codecs.to_grayscale(img).mean())
    assert abs(good.feature_mean - true_gray) < 3.0
    assert rows[2].format == "corrupt/jpeg"


def test_jpeg_ahash_near_dup_detection(spark):
    base = _smooth_rgb(32, 32)
    noisy = base.copy()
    noisy[0, 0] = [255, 255, 255]  # tiny perturbation
    different = 255 - base
    df = spark.createDataFrame(
        [
            (1, codecs.encode_jpeg(base, 90)),
            (2, codecs.encode_jpeg(noisy, 90)),
            (3, codecs.encode_jpeg(different, 90)),
            (4, b"truncated \xff\xd8 garbage"),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.ahash for r in
            image_average_hash(df, decode_stub=False).collect()}
    ham = bin((rows[1] ^ rows[2]) & (2**64 - 1)).count("1")
    assert ham <= 4  # near-dup
    ham_diff = bin((rows[1] ^ rows[3]) & (2**64 - 1)).count("1")
    assert ham_diff > 16  # inverted image is far away
    assert rows[4] is None  # quarantined, not failed


def test_resize_gray_upscale_no_crash():
    # Regression: upscaling past the source extent used to hit an empty
    # slice (NaN mean) when rounded grid boundaries landed at/past h or w.
    img = (np.add.outer(np.arange(4) * 40, np.arange(16) * 10) % 256).astype(
        np.uint8
    )
    out = codecs.resize_gray(img, 8, 8)
    assert out.shape == (8, 8)
    const = codecs.resize_gray(np.full((2, 3), 77, np.uint8), 16, 16)
    assert (const == 77).all()


def test_resize_images_quarantines_bad_blob(spark):
    good = codecs.encode_png(np.full((20, 30, 3), 200, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, good), (2, b"\x89PNG\r\n\x1a\n truncated")],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in
            resize_images(df, 8, 8, decode_stub=False).collect()}
    assert bytes(rows[1].pixels) == bytes([200] * 64)
    assert bytes(rows[2].pixels) == b""


def test_audio_energy_quarantines_bad_blob(spark):
    sq = 0.75 * np.tile(np.repeat([1.0, -1.0], 4), 80)
    df = spark.createDataFrame(
        [(1, codecs.encode_wav(sq, 8000)), (2, b"RIFFxxxxWAVE broken")],
        "doc_id long, payload binary",
    )
    rows = audio_window_energy(df, window=64, hop=64, decode_stub=False).collect()
    good = [r for r in rows if r.doc_id == 1]
    bad = [r for r in rows if r.doc_id == 2]
    assert len(good) == 10 and all(abs(r.energy - 0.75) < 1e-3 for r in good)
    # NaN energy -> null through Arrow
    assert len(bad) == 1 and bad[0].win_idx == -1 and bad[0].energy is None


def test_decode_image_channel_shape_uniform():
    # Gray and gray+alpha PNGs must come back 3/4-channel so consumers see
    # identical shapes with or without Pillow on the cluster.
    gray = (np.add.outer(np.arange(5), np.arange(7)) % 256).astype(np.uint8)
    png_gray = codecs.encode_png(gray)
    arr = codecs.decode_image(png_gray)
    assert arr.shape == (5, 7, 3)
    assert (arr[:, :, 0] == gray).all() and (arr[:, :, 2] == gray).all()


# ----------------------------------------------------------------- GIF


def test_gif_roundtrip_gray_and_rgb():
    g = ((np.arange(100) * 13 + 7) % 256).astype(np.uint8).reshape(10, 10)
    back = codecs.decode_gif(codecs.encode_gif(g))
    assert back.shape == (10, 10, 3)
    assert (back[:, :, 0] == g).all() and (back[:, :, 2] == g).all()
    rgb = np.zeros((6, 7, 3), np.uint8)
    rgb[::2] = [255, 0, 0]
    rgb[1::2] = [0, 128, 255]
    assert (codecs.decode_gif(codecs.encode_gif(rgb)) == rgb).all()


def test_gif_lzw_dictionary_growth_exercised():
    # 64x64 gradient: 4096 pixels with long runs -> the LZW dict grows
    # through several code sizes and (on repetitive content) wraps via
    # CLEAR; the decode must still be bit-exact.
    img = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    back = codecs.decode_gif(codecs.encode_gif(img))
    assert (back[:, :, 1] == img).all()


def test_gif_interlaced_decode_reorders_rows():
    # Build an interlaced variant by hand: take a normal encode, set the
    # interlace flag, and feed the rows in GIF's 4-pass order. The decoder
    # must undo the pass ordering exactly.
    h = 10
    img = (np.arange(h, dtype=np.uint8)[:, None] * np.ones(4, np.uint8)[None, :])
    pass_rows = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    permuted = img[pass_rows]
    data = bytearray(codecs.encode_gif(permuted))
    # image descriptor starts right after header+GCT: find 0x2C marker
    idesc = data.index(0x2C, 13 + 768)
    data[idesc + 9] |= 0x40  # set interlace flag
    back = codecs.decode_gif(bytes(data))
    assert (back[:, :, 0] == img).all()


def test_gif_sniff_and_decode_image_dispatch():
    g = np.full((3, 3), 9, np.uint8)
    blob = codecs.encode_gif(g)
    assert codecs.sniff_format(blob) == "image/gif"
    assert (codecs.decode_image(blob)[:, :, 0] == g).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated in color table
        lambda b: b[:-10],  # truncated raster sub-blocks
        lambda b: b[:6] + b"\x00" * 7,  # gutted header
        # insert an unknown block marker right after header+GCT (the gray
        # encoder always writes a 256-entry table, so the offset is fixed;
        # a blind replace of 0x2C would hit palette byte 44 instead)
        lambda b: b[: 13 + 768] + b"\x7e" + b[13 + 768 :],
    ],
)
def test_gif_hostile_blobs_quarantine_not_crash(spark, mutate):
    g = ((np.arange(100) * 3) % 256).astype(np.uint8).reshape(10, 10)
    bad = mutate(codecs.encode_gif(g))
    with pytest.raises(Exception):
        codecs.decode_gif(bad)
    # through the pipeline the same blob must quarantine, not fail the task
    from parquet_exporter_spark.operators.multimodal import decode_features

    df = spark.createDataFrame([(1, bytes(bad))], "doc_id long, payload binary")
    row = decode_features(df, decode_stub=False).collect()[0]
    assert row.format.startswith("corrupt/") or row.format == "application/octet-stream"


def test_gif_animation_roundtrip_and_frame_sampling(spark):
    """Animated GIF: the multi-frame encoder round-trips each frame
    exactly through decode_gif_frames, and the REAL frame-sampling stage
    fans one GIF payload out to every 2nd frame's grayscale buffer."""
    from parquet_exporter_spark.operators.multimodal import sample_frames

    frames = [
        np.full((4, 5), 10 * (i + 1), np.uint8) for i in range(7)
    ]
    blob = codecs.encode_gif_animation(frames, delay_cs=4)
    back = codecs.decode_gif_frames(blob)
    assert len(back) == 7
    for orig, dec in zip(frames, back):
        assert dec.shape == (4, 5, 3)
        assert (dec[:, :, 0] == orig).all()
    assert len(codecs.decode_gif_frames(blob, max_frames=3)) == 3
    # decode_gif (still contract) = first frame
    assert (codecs.decode_gif(blob)[:, :, 1] == frames[0]).all()

    df = spark.createDataFrame([(1, blob)], "doc_id long, payload binary")
    rows = {r.frame_idx: bytes(r.frame)
            for r in sample_frames(df, every_n=2, decode_stub=False).collect()}
    assert sorted(rows) == [0, 2, 4, 6]
    for i in (0, 2, 4, 6):
        assert rows[i] == frames[i].tobytes()


def test_gif_animation_rejects_mismatched_frame_shapes():
    """The logical screen is sized from frame 0 with every frame placed
    at (0,0): a LATER frame larger than the screen would produce a
    spec-invalid GIF that external decoders may reject or crop (the
    in-repo decoder tolerates it, which would hide the bug) — the
    encoder must refuse instead."""
    frames = [np.zeros((4, 5), np.uint8), np.zeros((6, 5), np.uint8)]
    with pytest.raises(ValueError, match="shape"):
        codecs.encode_gif_animation(frames)
    # smaller later frames are equally rejected: one contract, no
    # silently-letterboxed output
    frames = [np.zeros((4, 5), np.uint8), np.zeros((4, 3), np.uint8)]
    with pytest.raises(ValueError, match="shape"):
        codecs.encode_gif_animation(frames)


def test_gif_lzw_clear_on_full_table_roundtrips():
    # 256x256 of uniform noise is incompressible: the LZW dictionary hits
    # its 4096-code cap repeatedly, forcing the encoder's clear-and-reset
    # path and the decoder's mid-stream table rebuild — both must stay
    # bit-exact.
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    back = codecs.decode_gif(codecs.encode_gif(img))
    assert (back[:, :, 0] == img).all()
