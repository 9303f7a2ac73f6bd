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
