"""Export statistics (reference R24, /root/reference/export.py:244-262):
row count, output size, compression ratio vs a raw-JSON yardstick."""

from __future__ import annotations

import json
import os


def dir_size_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def export_stats(
    n_rows: int, raw_size_bytes: int, output_path: str, stats_path: str | None = None
) -> dict:
    out_bytes = dir_size_bytes(output_path)
    ratio = (raw_size_bytes / out_bytes) if out_bytes else 0.0
    stats = {
        "total_rows": n_rows,
        "raw_size_mb": round(raw_size_bytes / 1e6, 3),
        "output_size_mb": round(out_bytes / 1e6, 3),
        "compression_ratio": round(ratio, 3),
        "space_saved_pct": round((1 - 1 / ratio) * 100, 2) if ratio > 1 else 0.0,
    }
    if stats_path:
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=2)
    return stats
