"""Custom Python DataSource SINK (Spark 4 ``pyspark.sql.datasource``
writer API): sharded JSONL with a transactional manifest.

The writer half of the engine's "bring your own connector" surface
(the reader half is ``sources/synthetic.py``), and a genuinely useful
shape for training pipelines: each task writes one JSONL shard, and
the job commits by writing ``MANIFEST.json`` naming every shard with
its row/byte counts — training loaders read the manifest, never the
directory listing, so half-written jobs are invisible (two-phase
commit: ``write()`` per task → commit messages → driver ``commit()``
publishes the manifest, ``abort()`` deletes the orphan shards).

Scale notes: shards stream row-by-row from the task iterator (no
buffering of the partition in memory); file names are uuid-unique so
speculative/retried tasks never collide — the losing attempt's file
is simply absent from the manifest. Cleanup contract, precisely:
``abort()`` sweeps only shards whose tasks REPORTED a commit message;
a task that died mid-write (or lost a speculation race) leaves an
orphan file that only a janitor sweep (delete files not named by the
manifest) reclaims — readers never see it either way, because they
follow the manifest, never the directory listing. At real scale the
target is an object store via fsspec-style URIs; this implementation
keeps to local paths (the contract surface — message flow, manifest
atomicity via rename — is identical).

Usage:
    spark.dataSource.register(JsonlManifestSink)
    df.write.format("jsonl_manifest").mode("append")
      .option("path", "/out/dir").save()
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
from pyspark.sql.types import StructType

MANIFEST_NAME = "MANIFEST.json"


@dataclass
class ShardCommit(WriterCommitMessage):
    filename: str
    n_rows: int
    n_bytes: int


class _JsonlShardWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool) -> None:
        if not path:
            raise ValueError("jsonl_manifest sink requires a 'path' option")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n_rows = n_bytes = 0
        with open(full, "w") as f:
            for row in iterator:
                line = json.dumps(row.asDict(recursive=True), default=str)
                f.write(line + "\n")
                n_rows += 1
                n_bytes += len(line) + 1
        return ShardCommit(filename=name, n_rows=n_rows, n_bytes=n_bytes)

    def commit(self, messages) -> None:
        shards = [
            {"file": m.filename, "n_rows": m.n_rows, "n_bytes": m.n_bytes}
            for m in messages
            if m is not None
        ]
        if not self.overwrite:
            # append semantics: the new manifest must keep naming every
            # previously committed shard, or manifest-following readers
            # silently lose the earlier jobs' rows.  Merge the existing
            # shard list in (dedup by file name — a file appears at most
            # once since names are uuid-unique).
            try:
                with open(os.path.join(self.path, MANIFEST_NAME)) as f:
                    prior = json.load(f).get("shards", [])
            except FileNotFoundError:
                prior = []
            seen = {s["file"] for s in shards}
            shards.extend(s for s in prior if s["file"] not in seen)
        # overwrite semantics: the new manifest supersedes the old shard
        # set; stale shards (not in any manifest) are dead by contract
        # since readers only follow the manifest.
        manifest = {
            "shards": sorted(shards, key=lambda s: s["file"]),
            "n_rows": sum(s["n_rows"] for s in shards),
            "n_bytes": sum(s["n_bytes"] for s in shards),
            "n_shards": len(shards),
        }
        tmp = os.path.join(self.path, f".{MANIFEST_NAME}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))  # atomic publish

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class JsonlManifestSink(DataSource):
    """``format("jsonl_manifest")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlShardWriter(self.options.get("path", ""), overwrite)


def read_manifest(path: str) -> dict:
    """Reader-side helper: the committed shard list (the ONLY files a
    consumer should read)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)
