"""Stdlib-only image/audio codecs for the multimodal operators.

This container has no Pillow/soundfile/ffmpeg, so the "real bytes" decode
path is implemented directly against the public file-format specs using
only the standard library + numpy:

- PNG (ISO/IEC 15948): IHDR/IDAT/IEND chunk walk, zlib inflate, and full
  scanline unfiltering (filter types 0-4 incl. Paeth) for 8-bit gray,
  gray+alpha, RGB, RGBA and palette images.
- JPEG (ITU-T T.81 baseline sequential DCT): marker walk, canonical
  Huffman entropy decode, dequantize + 8x8 IDCT, 4:4:4/4:2:2/4:2:0
  chroma upsampling, restart markers — the format crawled image corpora
  are mostly made of. Progressive/arithmetic streams raise ValueError
  into the quarantine path.
- WAV (RIFF/WAVE): `wave` module framing + numpy PCM interpretation for
  8/16/32-bit integer samples, normalized to float32 in [-1, 1].

Matching encoders exist so tests and queries can synthesize REAL files
deterministically (PNG filter-0 scanlines; baseline JPEG with the Annex K
example tables; PCM16 WAV) without any binary fixtures checked in.

If Pillow IS available (production clusters), ``decode_image`` prefers it
and falls back here — so the operator behavior is identical everywhere,
only the decode speed differs.

These functions run inside Arrow-batched mapInPandas stages: per-row
Python cost is confined to the codec boundary exactly like a Pillow call
would be, and everything after decode is vectorized numpy.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type -> samples/px


def sniff_format(data: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if data[:8] == PNG_MAGIC:
        return "image/png"
    if data[:4] == WAV_MAGIC and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    return "application/octet-stream"


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BITMAPINFOHEADER BMP to
    (H, W, 3|4) uint8 (BGR(A) storage converted to RGB(A); bottom-up or
    top-down row order both handled). The other real uncompressed image
    format crawled corpora contain; palette/RLE variants raise."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3  # rows pad to 4 bytes
    if len(data) < pixel_offset + stride * height:
        raise ValueError("BMP data length mismatch")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pixel_offset
    ).reshape(height, stride)[:, : width * channels]
    img = rows.reshape(height, width, channels)
    if not top_down:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    order = [2, 1, 0] + ([3] if channels == 4 else [])
    return np.ascontiguousarray(img[:, :, order])


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W) gray or (H, W, 3) RGB uint8 array as a 24-bit
    bottom-up BMP. Round-trips through decode_bmp and any compliant
    reader."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects gray or RGB input")
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = arr[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + bytes(body)


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to an (H, W, C) uint8 array (C in {1,2,3,4}).

    Supports color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA) at bit depth 8, non-interlaced — the shapes real-world
    training corpora overwhelmingly contain. Raises ValueError on
    anything else rather than guessing.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth depend on the pixel to the LEFT, so the
            # scanline is inherently sequential in units of one pixel;
            # operate per-pixel on channel-sized vectors.
            cur = np.zeros(stride, dtype=np.uint8)
            zero = np.zeros(channels, dtype=np.uint8)
            for x in range(0, stride, channels):
                left = cur[x - channels : x] if x else zero
                up = prev[x : x + channels]
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = ((left.astype(np.uint16) + up) // 2).astype(np.uint8)
                else:
                    ul = prev[x - channels : x] if x else zero
                    pred = _paeth(left, up, ul)
                cur[x : x + channels] = line[x : x + channels] + pred
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a real PNG
    (filter 0 scanlines, one IDAT). Round-trips exactly through
    ``decode_png`` and any compliant reader."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W) luma via ITU-R BT.601 weights (what Pillow's
    convert("L") uses); alpha is ignored."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c in (1, 2):  # gray or gray+alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.float64)
    luma = rgb @ np.array([0.299, 0.587, 0.114])
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


def resize_gray(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Box-ish resample of a grayscale (H, W) image to (target_h, target_w)
    by averaging each source cell of the target grid — deterministic,
    dependency-free, and adequate for aHash/preprocessor shapes."""
    h, w = img.shape
    ys = (np.arange(target_h + 1) * h / target_h).round().astype(int)
    xs = (np.arange(target_w + 1) * w / target_w).round().astype(int)
    out = np.empty((target_h, target_w), dtype=np.uint8)
    f = img.astype(np.float64)
    for ty in range(target_h):
        # Clamp to the source extent so every cell averages >=1 real pixel
        # even when upscaling (target dim > source dim), where rounded grid
        # boundaries can land at or past h/w and would yield an empty slice.
        y0 = min(int(ys[ty]), h - 1)
        y1 = min(max(int(ys[ty + 1]), y0 + 1), h)
        for tx in range(target_w):
            x0 = min(int(xs[tx]), w - 1)
            x1 = min(max(int(xs[tx + 1]), x0 + 1), w)
            out[ty, tx] = int(round(f[y0:y1, x0:x1].mean()))
    return out


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes to (H, W, C) uint8 with C in {3, 4}. Prefers
    Pillow when installed (any format it knows); falls back to the stdlib
    decoders (JPEG, PNG, BMP, GIF) dispatched by magic bytes. Gray / gray+alpha
    sources are expanded to RGB / RGBA so consumers see identical shapes
    whether or not Pillow is present on the cluster."""
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        arr = np.asarray(img.convert("RGBA" if "A" in img.getbands() else "RGB"))
        return arr if arr.ndim == 3 else arr[:, :, None]
    except ImportError:
        if data[:2] == b"BM":
            arr = decode_bmp(data)
        elif data[:2] == b"\xff\xd8":
            arr = decode_jpeg(data)
        elif data[:6] in GIF_MAGICS:
            arr = decode_gif(data)
        else:
            arr = decode_png(data)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[2] == 1:  # gray -> RGB
            arr = np.repeat(arr, 3, axis=2)
        elif arr.shape[2] == 2:  # gray+alpha -> RGBA
            arr = np.concatenate([np.repeat(arr[:, :, :1], 3, axis=2),
                                  arr[:, :, 1:]], axis=2)
        return arr


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

_PCM_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PCM WAV bytes -> (sample_rate, n_channels, float32 samples
    in [-1, 1] of shape (n_frames, n_channels)). Prefers soundfile when
    installed; falls back to the stdlib ``wave`` module."""
    try:  # pragma: no cover - soundfile absent in this container
        import soundfile as sf

        samples, rate = sf.read(io.BytesIO(data), dtype="float32")
        if samples.ndim == 1:
            samples = samples[:, None]
        return rate, samples.shape[1], samples
    except ImportError:
        pass
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        sw = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sw not in _PCM_DTYPES:
        raise ValueError(f"unsupported WAV sample width {sw}")
    arr = np.frombuffer(frames, dtype=_PCM_DTYPES[sw]).reshape(-1, n_ch)
    if sw == 1:  # 8-bit WAV is unsigned, midpoint 128
        samples = (arr.astype(np.float32) - 128.0) / 128.0
    else:
        samples = arr.astype(np.float32) / float(2 ** (8 * sw - 1))
    return rate, n_ch, samples


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (n, ch)) as PCM16 WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81 / ISO 10918-1)
# --------------------------------------------------------------------------
# Stdlib+numpy baseline JPEG codec, same spirit as the PNG/WAV pair above:
# the decoder handles the format a real crawled corpus is mostly made of
# (SOF0 baseline, 8-bit, grayscale or YCbCr at 4:4:4 / 4:2:2 / 4:2:0,
# restart markers, 8- and 16-bit quant tables); the encoder emits baseline
# 4:4:4 (or single-component grayscale) JPEG with the Annex K example
# quantization + Huffman tables so tests can synthesize REAL JPEG bytes
# deterministically with no binary fixtures. Progressive (SOF2),
# arithmetic-coded, and 12-bit streams raise ValueError -> the standard
# corrupt-blob quarantine path. JPEG is lossy: round-trip tests assert
# bounded pixel error + decode determinism, never byte equality.

JPEG_MAGIC = b"\xff\xd8"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example quantization tables (raster order).
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K example Huffman tables: (BITS counts for lengths 1..16, HUFFVAL).
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: forward F = M @ A @ M.T, inverse
    A = M.T @ F @ M."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    m = 0.5 * np.cos((2.0 * x + 1.0) * u * np.pi / 16.0)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


class _HuffDecoder:
    """Canonical Huffman decode table (T.81 F.2.2.3 DECODE procedure)."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, counts: list, values: list) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            code += counts[length - 1]
            k += counts[length - 1]
            self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an already-unstuffed scan segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG scan data exhausted mid-block")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return table.values[table.valptr[length] + code - table.mincode[length]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw SIZE-bit value to its signed level."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_scan_segments(data: bytes, start: int) -> tuple[list, int]:
    """Split entropy-coded data into restart segments with 0xFF00
    unstuffing removed; returns (segments, position of the terminating
    marker's 0xFF byte)."""
    segments = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = data[i + 1]
        if nxt == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker (EOI, next SOS, ...): scan ends
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG bytes to (H, W) uint8 grayscale or
    (H, W, 3) uint8 RGB (JFIF full-range BT.601). Raises ValueError on
    progressive/arithmetic/12-bit or malformed streams (quarantine path)."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated JPEG marker")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seg_len = struct.unpack(">H", data[i:i + 2])[0]
        seg = data[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq_id = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                width = 128 if pq else 64
                if p + width > len(seg):
                    raise ValueError("truncated JPEG DQT segment")
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                p += width
                qt[tq_id] = tbl  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                if len(counts) < 16 or p + 17 + nv > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                values = list(seg[p + 17:p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(counts, values)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            frame = (h_img, w_img, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns < len(frame[2]):
                # A baseline stream may legally carry each component in its
                # own scan (non-interleaved); this decoder handles only the
                # single interleaved scan — keep the ValueError-only
                # contract so callers quarantine instead of KeyError-ing.
                raise ValueError("multi-scan baseline JPEG unsupported")
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            segments, _ = _split_scan_segments(data, i + seg_len)
            return _decode_scan(frame, scan_tables, qt, huff_dc, huff_ac,
                                restart_interval, segments)
        # APPn / COM / others: skip
        i += seg_len
    raise ValueError("JPEG contained no SOS scan")


def _decode_scan(frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval, segments) -> np.ndarray:
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = {}
    deq = {}
    for cid, ch, cv, tq_id in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        if tq_id not in qt:
            raise ValueError(f"JPEG missing quant table {tq_id}")
        deq[cid] = qt[tq_id].astype(np.float64)
    total_mcus = mcus_x * mcus_y
    mcu_index = 0
    block = np.empty(64, dtype=np.float64)
    for seg_i, seg in enumerate(segments):
        reader = _BitReader(seg)
        pred = {cid: 0 for cid, *_ in comps}
        seg_mcus = (restart_interval if restart_interval
                    and seg_i < len(segments) - 1
                    else total_mcus - mcu_index)
        for _ in range(seg_mcus):
            if mcu_index >= total_mcus:
                break
            my, mx = divmod(mcu_index, mcus_x)
            for cid, ch, cv, _tq in comps:
                dc_t, ac_t = scan_tables[cid]
                if dc_t not in huff_dc or ac_t not in huff_ac:
                    raise ValueError("JPEG missing Huffman table for scan")
                for by in range(cv):
                    for bx in range(ch):
                        block[:] = 0.0
                        size = reader.decode_huff(huff_dc[dc_t])
                        diff = _extend(reader.read_bits(size), size)
                        pred[cid] += diff
                        block[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[ac_t])
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            block[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_ZIGZAG] = block * deq[cid]
                        px = _DCT_M.T @ coeffs.reshape(8, 8) @ _DCT_M + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu_index += 1
    if mcu_index < total_mcus:
        raise ValueError("JPEG scan ended early "
                         f"({mcu_index}/{total_mcus} MCUs)")
    # Upsample to full resolution and crop.
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, size: int) -> None:
        self.acc = (self.acc << size) | (value & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write_bits((1 << pad) - 1, pad)  # pad with 1s per spec


def _huff_encode_table(counts: list, values: list) -> dict:
    """Symbol -> (code, length) from canonical (BITS, HUFFVAL)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(writer: _BitWriter, block: np.ndarray, qt_zz: np.ndarray,
                  dc_tab: dict, ac_tab: dict, pred: int) -> int:
    """Huffman-encode one level-shifted 8x8 pixel block; returns the
    updated DC predictor."""
    f = _DCT_M @ block @ _DCT_M.T
    # Both coefficient vector and quant table in ZIGZAG order.
    zz = np.round(f.reshape(64)[_ZIGZAG] / qt_zz).astype(np.int64)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size = abs(diff).bit_length()
    code, length = dc_tab[size]
    writer.write_bits(code, length)
    if size:
        writer.write_bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write_bits(code, length)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        code, length = ac_tab[(run << 4) | size]
        writer.write_bits(code, length)
        writer.write_bits(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        writer.write_bits(code, length)
    return pred


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as baseline JPEG
    (Annex K example quant/Huffman tables, libjpeg quality scaling).
    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 box-mean
    chroma, the dominant shape in crawled corpora). ``restart_interval``
    emits DRI + RSTn markers every N MCUs. Deterministic — same inputs
    always give the same bytes — so tests synthesize real JPEG fixtures
    in code."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) gray or (H, W, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    # Color convert; per-component sampling factors (h, v).
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgbf = arr.astype(np.float64)
        r, g, b = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # 2x2 box-mean downsample of chroma (edge-pad odd dims first).
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2

            def _down(p: np.ndarray) -> np.ndarray:
                q = np.empty((eh, ew), dtype=np.float64)
                q[:h, :w] = p
                q[h:, :w] = p[h - 1:h, :]
                q[:, w:] = q[:, w - 1:w]
                return q.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))

            planes = [y - 128.0, _down(cb) - 128.0, _down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # Edge-replicate each plane out to its MCU-aligned extent.
    padded = []
    for p, (ch, cv) in zip(planes, samp):
        sh, sw = p.shape
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        q = np.empty((th, tw), dtype=np.float64)
        q[:sh, :sw] = p
        q[sh:, :sw] = p[sh - 1:sh, :]
        q[:, sw:] = q[:, sw - 1:sw]
        padded.append(q)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF: version 1.1, no density units, 1x1 density, no thumbnail.
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    # DQT (zigzag order on the wire)
    def _qt_seg(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(64)[_ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in zz)

    out += _qt_seg(0, qt_l)
    if not gray:
        out += _qt_seg(1, qt_c)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (samp[0][0] << 4) | samp[0][1], 0])
    if not gray:
        sof += bytes([2, (samp[1][0] << 4) | samp[1][1], 1,
                      3, (samp[2][0] << 4) | samp[2][1], 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT

    def _dht_seg(tc: int, th: int, spec) -> bytes:
        counts, values = spec
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht_seg(0, 0, _HUFF_DC_LUMA) + _dht_seg(1, 0, _HUFF_AC_LUMA)
    if not gray:
        out += _dht_seg(0, 1, _HUFF_DC_CHROMA) + _dht_seg(1, 1, _HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # Entropy-coded data, MCU-major: within an MCU each component
    # contributes h*v blocks in raster order (T.81 A.2.3 interleaving).
    dc_tabs = [_huff_encode_table(*_HUFF_DC_LUMA)]
    ac_tabs = [_huff_encode_table(*_HUFF_AC_LUMA)]
    qts = [qt_l[_ZIGZAG].astype(np.float64)]
    if not gray:
        dc_tabs += [_huff_encode_table(*_HUFF_DC_CHROMA)] * 2
        ac_tabs += [_huff_encode_table(*_HUFF_AC_CHROMA)] * 2
        qts += [qt_c[_ZIGZAG].astype(np.float64)] * 2
    writer = _BitWriter()
    preds = [0] * ncomp
    rst_n = 0
    since_restart = 0
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if restart_interval and since_restart == restart_interval:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
            since_restart = 0
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci in range(ncomp):
            ch, cv = samp[ci]
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    preds[ci] = _encode_block(
                        writer, padded[ci][y0:y0 + 8, x0:x0 + 8],
                        qts[ci], dc_tabs[ci], ac_tabs[ci], preds[ci])
        since_restart += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# GIF (87a/89a): LZW decode + single-frame encode, stdlib-only
# --------------------------------------------------------------------------

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed data sub-blocks starting at pos;
    returns (payload, position after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated inside sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF truncated inside sub-blocks")
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/END codes, 12-bit cap.
    Returns exactly n_pixels palette indices (trailing surplus ignored,
    shortfall raises)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    filled = 0

    # bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def init_table() -> tuple[list[bytes], int, int]:
        return ([bytes([i]) for i in range(clear)] + [b"", b""], end + 1, min_code_size + 1)

    table, next_code, code_size = init_table()
    prev: bytes | None = None
    while filled < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted before raster complete")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table, next_code, code_size = init_table()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW code out of range")
        take = min(len(entry), n_pixels - filled)
        out[filled : filled + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        filled += take
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if filled < n_pixels:
        raise ValueError("GIF raster short: LZW ended early")
    return out


def _iter_gif_frames(data: bytes):
    """Yield each image block of a GIF87a/89a as a standalone (H, W, 3|4)
    uint8 array (RGBA when that frame's graphic-control extension marks a
    transparent index). Frames come back at their OWN rect size with no
    inter-frame compositing/disposal — frame-sampling pipelines treat
    frames as independent stills; full animation playback is a renderer's
    job, not a feature extractor's."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("GIF truncated in header")
    packed = data[10]
    gct_size = 2 << (packed & 0x07)
    pos = 13
    gct = None
    if packed & 0x80:
        gct = np.frombuffer(data[pos : pos + 3 * gct_size], dtype=np.uint8)
        if gct.size != 3 * gct_size:
            raise ValueError("GIF truncated in global color table")
        gct = gct.reshape(gct_size, 3)
        pos += 3 * gct_size
    transparent: int | None = None
    yielded = False
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated before trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not yielded:
                raise ValueError("GIF contains no image block")
            return
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF truncated in extension")
            label = data[pos]
            pos += 1
            payload, pos = _gif_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4 and payload[0] & 0x01:
                transparent = payload[3]
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF truncated in image descriptor")
        w, h = struct.unpack_from("<HH", data, pos + 4)
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            lct_size = 2 << (ipacked & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * lct_size], dtype=np.uint8)
            if table.size != 3 * lct_size:
                raise ValueError("GIF truncated in local color table")
            table = table.reshape(lct_size, 3)
            pos += 3 * lct_size
        if table is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(data):
            raise ValueError("GIF truncated before LZW data")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
        raster, pos = _gif_subblocks(data, pos)
        idx = _lzw_decode(raster, min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.empty_like(idx)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                rows = range(start, h, step)
                deinter[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = deinter
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        rgb = table[idx]
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            yield np.dstack([rgb, alpha])
        else:
            yield np.ascontiguousarray(rgb)
        transparent = None  # a GCE applies only to the image it precedes
        yielded = True


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (H, W, 3) uint8 RGB —
    or (H, W, 4) RGBA when a graphic-control extension marks a
    transparent index. Handles global/local color tables, interlacing,
    and sub-block framing; animation frames are decode_gif_frames'
    business."""
    return next(iter(_iter_gif_frames(data)))


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """All frames of an animated GIF as standalone arrays (bounded by
    ``max_frames`` when the caller budgets decode work per payload)."""
    out = []
    for frame in _iter_gif_frames(data):
        out.append(frame)
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def encode_gif_animation(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Encode grayscale (H, W) frames as an animated GIF89a: one global
    256-gray color table, a NETSCAPE2.0 loop extension, and per-frame
    graphic-control delays. Lossless per frame (decode_gif_frames
    round-trips each exactly)."""
    if not frames:
        raise ValueError("encode_gif_animation needs at least one frame")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(a.ndim != 2 for a in arrs):
        raise ValueError("animation encoder takes grayscale (H, W) frames")
    h, w = arrs[0].shape
    # The logical screen is sized from frame 0 and every frame is placed
    # at offset (0,0) — a later frame LARGER than the screen would make a
    # spec-invalid GIF that external decoders may reject or crop (the
    # in-repo decoder tolerates it, which would hide the bug).
    if any(a.shape != (h, w) for a in arrs):
        raise ValueError(
            "animation frames must all share frame 0's shape "
            f"({h}, {w}); got {sorted({a.shape for a in arrs})}"
        )
    palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | 0x07)  # GCT present, 256 entries
    out += b"\x00\x00"
    out += palette.tobytes()
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for arr in arrs:
        fh, fw = arr.shape
        # graphic control: delay, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh) + b"\x00"
        out.append(8)  # min LZW code size for the 256-entry table
        lzw = _lzw_encode(arr, 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW compression: dictionary growth to 12 bits, CLEAR
    emitted when the table fills, LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prev = b""
    for b in indices.tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        if next_code < 4096:
            table[cur] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array with at
    most 256 distinct colors as a single-frame GIF89a. Lossless for
    paletted content (decode_gif round-trips it exactly); richer images
    belong in PNG."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        indices = arr
        n_colors = 256
    else:
        h, w, c = arr.shape
        if c != 3:
            raise ValueError("encode_gif takes gray or RGB input")
        flat = arr.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError("encode_gif: more than 256 distinct colors")
        n_colors = colors.shape[0]
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[:n_colors] = colors
        indices = inverse.astype(np.uint8).reshape(h, w)
    h, w = indices.shape
    # color-table size field: entries = 2^(n_field+1) >= n_colors
    # ((n-1).bit_length() is the bit width of n-1, so 2^width >= n for
    # every n in 1..256 — no correction loop needed)
    n_field = max(1, (max(n_colors, 2) - 1).bit_length() - 1)
    entries = 2 << n_field
    min_code_size = max(2, (entries - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | n_field)  # GCT present, size field
    out += b"\x00\x00"  # bg index, aspect
    out += palette[:entries].tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
