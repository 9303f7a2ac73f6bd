"""A Spark Python DataSource WRITER (Spark 4 API) — the sink-side twin of
the GraphQL reader datasource (sources/graphql_datasource.py covers the
read/stream-read half of the API surface; this covers `DataSourceWriter`).

`df.write.format("jsonl_dir").mode(...).save(path)` writes one JSON-lines
file per input partition with the two-phase commit contract a distributed
sink needs at scale:

- each task writes its partition to a uniquely-named `part-*.jsonl` and
  returns a `WriterCommitMessage` naming the file and its row count;
- `commit()` runs ONCE on the driver after every task succeeded and
  publishes `_MANIFEST.json` listing exactly the committed files (readers
  that honor the manifest never see output from failed/speculative task
  attempts — the same job-commit discipline as Hadoop committers);
- `abort()` removes any files the failed attempt left behind.

Rows serialize with a deterministic field order (the schema's), ISO text
for datetimes, and None -> null, so a JSONL round-trip through
`spark.read.schema(...).json(path)` reproduces the input exactly — pinned
by tests/test_sources.py.

Scale shape: serialization is per-partition streaming (no driver gather,
no per-row py4j); the driver sees only one tiny commit message per task.

DEPLOYMENT REQUIREMENTS (same rationale as dedup_ingest's
_hadoop_path_exists: plain os.* paths are only correct where every
process sees one filesystem):

- task writes (`write()`, on executors) and the manifest publish /
  overwrite cleanup (`__init__`/`commit()`/`abort()`, on the driver) use
  local ``os`` paths, so driver and executors MUST share the target
  filesystem — local mode, or a cluster writing to a shared mount
  (NFS/FUSE). On a multi-node cluster with node-local disks the part
  files land where the driver cannot see them; point this sink at a
  shared mount or use the parquet/json sinks (Hadoop committers) there.
- concurrent APPEND jobs into one directory are unsupported: commit()'s
  manifest fold is a read-modify-write with no lock, so two jobs
  committing simultaneously can lose each other's file lists. One writer
  per directory at a time; parallelism belongs INSIDE the job (its
  tasks), not across jobs.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


def _to_jsonable(value):
    """JSON-safe value: datetimes/dates/decimals/bytes to text/number,
    containers recursively."""
    import base64
    import datetime
    import decimal

    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat(sep=" ") if isinstance(value, datetime.datetime) else value.isoformat()
    if isinstance(value, decimal.Decimal):
        return float(value)
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode("ascii")
    if isinstance(value, dict):
        return {k: _to_jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_to_jsonable(v) for v in value]
    return value


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # Constructed DRIVER-side (DataSource.writer()), before any task
        # runs: honor mode('overwrite') here by clearing previous output —
        # executors must never do directory-wide deletes.
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w", encoding="utf-8") as f:
            for row in iterator:
                rec = {k: _to_jsonable(v) for k, v in zip(self.fields, row)}
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        files = sorted(m.filename for m in messages)
        rows = sum(m.n_rows for m in messages)
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        # append mode FOLDS the new files into the existing manifest — a
        # wholesale replace would orphan every earlier write's rows for
        # manifest-honoring readers.
        if not self.overwrite and os.path.isfile(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                prev = json.load(f)
            files = sorted(set(prev.get("files", [])) | set(files))
            rows += prev.get("total_rows", 0)
        manifest = {"files": files, "total_rows": rows}
        tmp = os.path.join(self.path, f"._manifest.{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlDirDataSource(DataSource):
    """Register with ``spark.dataSource.register(JsonlDirDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, schema, overwrite)


def _ship_code_by_value() -> None:
    """Executors may not have the repo on sys.path (the driver harness
    runs from a neutral cwd with no PYTHONPATH): serialize this module by
    VALUE so the writer class travels inside the pickled DataSource
    instead of being re-imported by name on the worker."""
    import sys

    try:
        from pyspark.cloudpickle import register_pickle_by_value
    except ImportError:  # pragma: no cover - ancient pyspark
        return
    register_pickle_by_value(sys.modules[__name__])


_ship_code_by_value()


def register(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
