"""Multimodal column operators: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas stages over mapInPandas.

The image/audio codec libraries are not available in this environment, so
the actual byte decoding is STUBBED: ``decode_stub=True`` (default) runs a
deterministic fake decoder so the Spark-side plumbing — schema, Arrow batch
shape, partitioning, UDF signature — is real and testable;
``decode_stub=False`` raises NotImplementedError where Pillow/ffmpeg would
be called.

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


def decode_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode payloads and extract features via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec path requires Pillow/ffmpeg; not available "
                    "in this environment — run with decode_stub=True"
                )
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int32")
            # Deterministic fake decode: derive fake dimensions and a mean
            # "pixel" feature from the raw bytes.
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

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, pixels binary"


def resize_images(
    df: DataFrame, target_w: int = 8, target_h: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Resize stage: decoded payload -> fixed-size pixel buffer, the shape
    an embedding model's preprocessor consumes. Stub path synthesizes the
    target-size buffer deterministically from the payload bytes (cycled to
    length w*h); the real path would call Pillow's resize here. Output
    pixels stay a BinaryType column, so downstream stages keep Arrow
    zero-copy buffers instead of per-row Python lists."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires Pillow; run with decode_stub=True"
                )
            pixels = pdf["payload"].map(
                lambda b: bytes((b * (size // max(len(b), 1) + 1))[:size])
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


def sample_frames(df: DataFrame, every_n: int = 4, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling stage: one input row (a video payload) fans out to
    one output row per sampled frame — the 1->many mapInPandas shape that
    video pipelines need (output batch length is decoupled from input
    batch length). Stub path slices the payload into FRAME_BYTES chunks
    and keeps every ``every_n``-th; the real path would seek keyframes via
    ffmpeg."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; run with decode_stub=True"
                )
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // FRAME_BYTES, 1)
                for i in range(0, n_frames, every_n):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(
                        bytes(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
                    )
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
    8-bit PCM; the real path would decode via soundfile/ffmpeg first."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real audio decode requires soundfile/ffmpeg; run with "
                    "decode_stub=True"
                )
            out_ids, out_idx, out_n, out_e = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for w, start in enumerate(range(0, max(n, 1), hop)):
                    samples = payload[start : start + window]
                    if not samples:
                        break
                    out_ids.append(doc_id)
                    out_idx.append(w)
                    out_n.append(len(samples))
                    out_e.append(
                        (sum(s * s for s in samples) / len(samples)) ** 0.5
                    )
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
    would decode + grayscale + resize via Pillow first. One narrow
    mapInPandas pass, hash arithmetic vectorized in numpy over the whole
    Arrow batch (no per-row Python loop beyond the byte-cycling stub)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = hash_w * hash_h
        weights = 1 << np.arange(size, dtype=np.uint64)
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real aHash requires Pillow decode; run with decode_stub=True"
                )
            pix = np.frombuffer(
                b"".join(
                    bytes((b * (size // max(len(b), 1) + 1))[:size])
                    for b in pdf["payload"]
                ),
                dtype=np.uint8,
            ).reshape(len(pdf), size)
            bits = pix > pix.mean(axis=1, keepdims=True)
            hashes = (bits.astype(np.uint64) * weights).sum(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": hashes.astype(np.int64)}
            )

    return df.mapInPandas(batches, schema=AHASH_SCHEMA)
