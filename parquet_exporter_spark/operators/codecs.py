"""Stdlib-only image/audio codecs for the multimodal operators.

This container has no Pillow/soundfile/ffmpeg, so the "real bytes" decode
path is implemented directly against the public file-format specs using
only the standard library + numpy:

- PNG (ISO/IEC 15948): IHDR/IDAT/IEND chunk walk, zlib inflate, and full
  scanline unfiltering (filter types 0-4 incl. Paeth) for 8-bit gray,
  gray+alpha, RGB, RGBA and palette images.
- WAV (RIFF/WAVE): `wave` module framing + numpy PCM interpretation for
  8/16/32-bit integer samples, normalized to float32 in [-1, 1].

Matching encoders exist so tests and queries can synthesize REAL files
deterministically (PNG filter-0 scanlines; PCM16 WAV) without any binary
fixtures checked in.

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
        y0, y1 = ys[ty], max(ys[ty + 1], ys[ty] + 1)
        for tx in range(target_w):
            x0, x1 = xs[tx], max(xs[tx + 1], xs[tx] + 1)
            out[ty, tx] = int(round(f[y0:y1, x0:x1].mean()))
    return out


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes to (H, W, C) uint8. Prefers Pillow when
    installed (any format it knows); falls back to the stdlib decoders
    (PNG, BMP) dispatched by magic bytes."""
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        arr = np.asarray(img.convert("RGBA" if "A" in img.getbands() else "RGB"))
        return arr if arr.ndim == 3 else arr[:, :, None]
    except ImportError:
        if data[:2] == b"BM":
            return decode_bmp(data)
        return decode_png(data)


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
