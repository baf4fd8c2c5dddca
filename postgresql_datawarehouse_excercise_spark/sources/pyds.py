"""Custom connector through Spark 4's Python DataSource API
(pyspark.sql.datasource): a schema-explicit gzip-JSONL reader.

Spark's JVM JSON source already reads JSONL (sources/files.py); this module
re-implements the read side as a PURE-PYTHON DataSource to cover the
capability the API exists for -- connecting Spark to a format/system that
has no JVM connector (internal shard manifests, bespoke protocols, storage
APIs with only a Python SDK).  The shape that matters for 100 TB:

  partitions()  one InputPartition PER FILE -- planning metadata only (a
                file listing), never data; Spark schedules each file to an
                executor, so read parallelism = shard count exactly like
                the native source.
  read(part)    runs ON the executor, streams one file, yields tuples --
                data never touches the driver.
  schema        always user-supplied (schema-explicit discipline: an
                inference pass is a full extra scan at scale and silently
                drifts).

The x_source_python_datasource entry round-trips `documents` through this
reader and value-hash-matches an aggregate against the original parquet,
proving byte fidelity through the whole write -> custom-read path.
"""

from __future__ import annotations

import glob
import gzip
import io
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, schema, options):
        self.field_names = [f.name for f in schema.fields]
        self.path = options.get("path")

    def partitions(self):
        files = sorted(
            glob.glob(os.path.join(self.path, "part-*.json.gz"))
            + glob.glob(os.path.join(self.path, "part-*.json"))
        )
        return [JsonlFilePartition(p) for p in files]

    def read(self, partition):
        opener = gzip.open if partition.path.endswith(".gz") else io.open
        with opener(partition.path, "rt", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                yield tuple(obj.get(name) for name in self.field_names)


class JsonlDataSource(DataSource):
    """`spark.read.format("pdwx_jsonl").schema(s).load(dir)` -- see module
    docstring.  Registered per-session via spark.dataSource.register."""

    @classmethod
    def name(cls) -> str:
        return "pdwx_jsonl"

    def reader(self, schema) -> JsonlReader:
        return JsonlReader(schema, self.options)
