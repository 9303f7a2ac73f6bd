"""Multimodal column operators: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas stages over mapInPandas.

Two decode tiers, selected per call:

- ``decode_stub=True`` (default for the registered queries, whose inputs
  are text-derived payloads): a deterministic fake decoder, so the
  Spark-side plumbing — schema, Arrow batch shape, partitioning, UDF
  signature — is exercised without real media bytes.
- ``decode_stub=False``: REAL decoding via ``operators/codecs.py`` —
  Pillow/soundfile when installed, else the stdlib-only JPEG (baseline
  DCT), PNG (zlib + scanline unfiltering), BMP and WAV (RIFF PCM)
  codecs. Tests feed genuine JPEG/PNG/WAV bytes through this path
  (tests/test_multimodal_real.py). Every real-path operator shares one
  corrupt-blob contract: an undecodable payload degrades to a tagged /
  empty / NULL quarantine row, never a failed Arrow batch.
  Video keyframe extraction is the one stage that still requires ffmpeg;
  the real path accepts concatenated-PNG sequences (the shape a
  frame-dumped corpus lands in) and raises for true video containers.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB corpus of
blobs never materializes per-row Python objects; payloads stay in columnar
buffers until the codec boundary. Partition sizing is the operator's only
knob: keep ``spark.sql.files.maxPartitionBytes`` low enough that a batch
of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_exporter_spark.operators import codecs

# The mapInPandas closures below reference this module and codecs from
# worker processes. The driver contract makes NO promise that
# parquet_exporter_spark is importable on executors (the external driver
# may launch from any cwd with no PYTHONPATH), so both modules are
# registered for cloudpickle BY-VALUE serialization: the function code
# ships inside the task, and workers only need numpy/pandas/stdlib.
# This is the same mechanism spark.submit.pyFiles solves cluster-side,
# chosen here because the engine cannot reconfigure the caller's session.
def _ship_code_by_value() -> None:
    import sys

    try:
        from pyspark.cloudpickle import register_pickle_by_value
    except ImportError:  # pragma: no cover - very old pyspark
        return
    register_pickle_by_value(codecs)
    register_pickle_by_value(sys.modules[__name__])


DECODED_SCHEMA = (
    "doc_id long, payload_bytes int, format string, width int, height int, "
    "feature_mean double"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as a binary payload + metadata struct, the shape a
    real image/audio ingest would produce (binaryFile source or parquet
    BinaryType column)."""
    payload = F.encode(text_col, "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _real_features(payload: bytes) -> tuple[str, int, int, float]:
    """(format, width, height, feature_mean) from real bytes: PNG -> mean
    gray pixel over real dimensions; WAV -> mean |sample| with
    (n_frames, n_channels) standing in for (width, height); anything else
    degrades to the byte-mean the stub computes (mixed corpora are normal;
    routing unknowns onward beats failing the batch).

    A payload whose magic bytes promise a format its body cannot deliver
    (truncated download, bit rot — routine at 100 TB) is tagged
    ``corrupt/<format>`` instead of raising: one bad blob must not kill a
    multi-hour job's task (and with it the whole Arrow batch), and the
    tag makes corrupt rows filterable/countable downstream."""
    fmt = codecs.sniff_format(payload)
    try:
        if fmt.startswith("image/"):
            img = codecs.decode_image(payload)
            gray = codecs.to_grayscale(img)
            return fmt, img.shape[1], img.shape[0], float(gray.mean())
        if fmt == "audio/wav":
            _, n_ch, samples = codecs.decode_wav(payload)
            import numpy as np

            # float64 accumulation: PCM16 samples are exact in float32,
            # but a float32 mean would drift ~1e-7 and break oracle
            # reproducibility
            return fmt, samples.shape[0], n_ch, float(
                np.abs(samples.astype(np.float64)).mean()
            )
    except Exception:
        return f"corrupt/{fmt.split('/', 1)[1]}", 0, 0, float("nan")
    return fmt, 0, 0, float(sum(payload)) / max(len(payload), 1)


def _try_gray_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Decode -> grayscale -> box-resample, or None when the payload
    cannot be decoded. The same corrupt-blob quarantine contract as
    ``_real_features``: one truncated/undecodable blob must degrade to a
    tagged row, never fail the Arrow batch (and with it the task)."""
    try:
        return codecs.resize_gray(
            codecs.to_grayscale(codecs.decode_image(payload)), w, h
        ).tobytes()
    except Exception:
        return None


def decode_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode payloads and extract features via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int32")
            if decode_stub:
                # Deterministic fake decode: derive fake dimensions and a
                # mean "pixel" feature from the raw bytes.
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload_bytes": n,
                        "format": "fake/raw",
                        "width": (n % 64 + 1).astype("int32"),
                        "height": (n // 64 + 1).astype("int32"),
                        "feature_mean": payloads.map(
                            lambda b: float(sum(b)) / max(len(b), 1)
                        ),
                    }
                )
                continue
            feats = [_real_features(bytes(b)) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": n,
                    "format": [f[0] for f in feats],
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                    "feature_mean": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, pixels binary"


def resize_images(
    df: DataFrame, target_w: int = 8, target_h: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Resize stage: decoded payload -> fixed-size pixel buffer, the shape
    an embedding model's preprocessor consumes. Stub path synthesizes the
    target-size buffer deterministically from the payload bytes (cycled to
    length w*h); the real path decodes (Pillow or stdlib PNG), converts to
    grayscale, and box-resamples. Output pixels stay a BinaryType column,
    so downstream stages keep Arrow zero-copy buffers instead of per-row
    Python lists."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in it:
            if decode_stub:
                pixels = pdf["payload"].map(
                    lambda b: bytes((b * (size // max(len(b), 1) + 1))[:size])
                )
            else:
                # Quarantine: undecodable payloads emit empty pixels
                # (filter with length(pixels) = 0), never a failed task.
                pixels = pdf["payload"].map(
                    lambda b: _try_gray_resize(bytes(b), target_w, target_h)
                    or b""
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"

FRAME_BYTES = 256  # stub: payload is a "video" of fixed-size frames


def _decode_sampled_frames(payload: bytes, every_n: int) -> list:
    """(frame_idx, grayscale array) for every ``every_n``-th frame of a
    multi-frame payload: animated GIFs via the real LZW decoder (GIF's
    LZW forces sequential decode, so skipped frames still stream through
    the decoder), concatenated PNGs via the PNG path (skipped frames are
    never decoded at all). Raises ValueError for anything else — true
    video containers (mp4/webm) need ffmpeg, which this environment does
    not ship."""
    if payload[:6] in codecs.GIF_MAGICS:
        return [
            (i, codecs.to_grayscale(f))
            for i, f in enumerate(codecs._iter_gif_frames(payload))
            if i % every_n == 0
        ]
    blobs = _split_png_sequence(payload)
    return [
        (i, codecs.to_grayscale(codecs.decode_image(blobs[i])))
        for i in range(0, len(blobs), every_n)
    ]


def _split_png_sequence(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG payload into individual PNG blobs (each
    starts with the 8-byte signature). Raises ValueError when the payload
    is not PNG-led — true video containers need ffmpeg, which this
    environment does not ship."""
    if payload[:8] != codecs.PNG_MAGIC:
        raise ValueError(
            "real frame sampling supports animated GIFs and "
            "concatenated-PNG sequences; true video containers "
            "(mp4/webm) require ffmpeg"
        )
    frames = []
    start = 0
    nxt = payload.find(codecs.PNG_MAGIC, 8)
    while nxt != -1:
        frames.append(payload[start:nxt])
        start = nxt
        nxt = payload.find(codecs.PNG_MAGIC, start + 8)
    frames.append(payload[start:])
    return frames


def sample_frames(df: DataFrame, every_n: int = 4, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling stage: one input row (a video payload) fans out to
    one output row per sampled frame — the 1->many mapInPandas shape that
    video pipelines need (output batch length is decoupled from input
    batch length). Stub path slices the payload into FRAME_BYTES chunks
    and keeps every ``every_n``-th; the real path decodes an animated
    GIF or a concatenated-PNG sequence, keeps every ``every_n``-th
    frame, and emits its grayscale pixel buffer (keyframe seeking in
    true video containers would be ffmpeg's job)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if decode_stub:
                    n_frames = max(len(payload) // FRAME_BYTES, 1)
                    for i in range(0, n_frames, every_n):
                        out_ids.append(doc_id)
                        out_idx.append(i)
                        out_frames.append(
                            bytes(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
                        )
                else:
                    # Quarantine: a payload that is not a decodable GIF/
                    # PNG sequence emits one frame_idx=-1 tombstone row
                    # so it stays countable without failing the batch.
                    try:
                        for i, gray in _decode_sampled_frames(
                            bytes(payload), every_n
                        ):
                            out_ids.append(doc_id)
                            out_idx.append(i)
                            out_frames.append(gray.tobytes())
                    except Exception:
                        out_ids.append(doc_id)
                        out_idx.append(-1)
                        out_frames.append(b"")
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.mapInPandas(batches, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = "doc_id long, win_idx int, n_samples int, energy double"


def audio_window_energy(
    df: DataFrame, window: int = 64, hop: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Audio stage: payload -> per-window RMS energy, the framing an
    audio-feature pipeline (VAD, loudness filtering, spectrogram prep)
    applies before any model. Windows overlap when ``hop < window`` —
    another 1->many fan-out, but unlike frame sampling the outputs are
    scalar features, not buffers. Stub path treats the payload as unsigned
    8-bit PCM; the real path decodes WAV (soundfile or stdlib) and
    computes RMS over the normalized float samples (channel-averaged)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_n, out_e = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if decode_stub:
                    seq = payload
                else:
                    # Quarantine: undecodable audio emits one win_idx=-1
                    # NaN-energy row instead of failing the batch.
                    try:
                        _, _, samples = codecs.decode_wav(bytes(payload))
                    except Exception:
                        out_ids.append(doc_id)
                        out_idx.append(-1)
                        out_n.append(0)
                        out_e.append(float("nan"))
                        continue
                    seq = samples.mean(axis=1)  # downmix to mono
                n = len(seq)
                for w, start in enumerate(range(0, max(n, 1), hop)):
                    chunk = seq[start : start + window]
                    if len(chunk) == 0:
                        break
                    out_ids.append(doc_id)
                    out_idx.append(w)
                    out_n.append(len(chunk))
                    if decode_stub:
                        energy = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
                    else:
                        energy = float(np.sqrt(np.mean(np.square(chunk))))
                    out_e.append(energy)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "win_idx": out_idx,
                    "n_samples": out_n,
                    "energy": out_e,
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash long"


def image_average_hash(
    df: DataFrame, hash_w: int = 8, hash_h: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Perceptual average-hash (aHash) for near-duplicate image detection:
    resize to ``hash_w x hash_h`` grayscale, then bit i = pixel_i > mean,
    packed into a 64-bit signed long. Near-duplicate images differ in a few
    bits, so downstream dedup is a Hamming-band equi-join on hash prefixes
    — the SimHash machinery (functions/dedup.py) applies unchanged to
    image corpora once payloads carry real pixels.

    Stub path hashes the deterministic fake resize buffer; the real path
    decodes + grayscales + box-resamples via operators/codecs.py (Pillow
    when installed). One narrow mapInPandas pass, hash arithmetic
    vectorized in numpy over the whole Arrow batch."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = hash_w * hash_h
        weights = 1 << np.arange(size, dtype=np.uint64)
        for pdf in it:
            if decode_stub:
                bufs = [
                    bytes((b * (size // max(len(b), 1) + 1))[:size])
                    for b in pdf["payload"]
                ]
            else:
                # Quarantine: undecodable images hash to NULL instead of
                # failing the batch; hash arithmetic stays vectorized over
                # the decodable rows.
                bufs = [
                    _try_gray_resize(bytes(b), hash_w, hash_h)
                    for b in pdf["payload"]
                ]
            ok = [i for i, b in enumerate(bufs) if b is not None]
            hashes: list = [None] * len(pdf)
            if ok:
                pix = np.frombuffer(
                    b"".join(bufs[i] for i in ok), dtype=np.uint8
                ).reshape(len(ok), size)
                bits = pix > pix.mean(axis=1, keepdims=True)
                packed = (bits.astype(np.uint64) * weights).sum(axis=1)
                for row, value in zip(ok, packed.astype(np.int64)):
                    hashes[row] = int(value)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, schema=AHASH_SCHEMA)


_ship_code_by_value()
