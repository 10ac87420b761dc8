"""TableIO — Iceberg-style snapshot tables on plain parquet.

SURVEY.md §1.4/§7.1(M0): the design treats "Iceberg table" as
"partitioned table with atomic snapshot commit + MERGE".  When an Iceberg
catalog is configured this would use real ``MERGE INTO``; in the sandbox
(and any bare-parquet deployment) it uses versioned snapshot directories
with an atomically-renamed pointer file, which gives the same properties
the crawl loop needs:

- atomic per-iteration commit: a snapshot either has its pointer updated
  or does not exist for readers (reference analogue: the stuck-'processing'
  recovery machinery in database.py:613-661 becomes unnecessary —
  SURVEY.md §2.9 exactly-once),
- time travel / lineage: previous versions are retained, enabling the
  resume-from-checkpoint test (SURVEY.md §5.5) and per-iteration lineage,
- cutting lineage per iteration: each iteration writes + re-reads parquet,
  so the logical plan never grows across the feedback loop
  (SURVEY.md §7.3 hard part 3).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class TableIO:
    """Versioned snapshot store for one crawl run."""

    root: str
    spark: SparkSession

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_current")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._pointer_path(name)) as f:
                return int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def snapshot_path(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v{version:06d}")

    def write(self, name: str, df: DataFrame, version: int,
              partition_by: list[str] | None = None) -> None:
        """Write a new snapshot and atomically flip the pointer."""
        path = self.snapshot_path(name, version)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        ptr_tmp = self._pointer_path(name) + f".tmp{os.getpid()}"
        with open(ptr_tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(ptr_tmp, self._pointer_path(name))

    def read(self, name: str, schema: T.StructType | None = None,
             version: int | None = None) -> DataFrame:
        v = self.current_version(name) if version is None else version
        if v is None:
            if schema is None:
                raise FileNotFoundError(f"table {name} has no snapshot and no schema")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self.snapshot_path(name, v))

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    # --- binary blobs (membership sketches), same versioned layout ------

    def write_blob(self, name: str, blob: bytes, version: int) -> None:
        d = self._table_dir(name)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"v{version:06d}.blob")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        ptr_tmp = self._pointer_path(name) + f".tmp{os.getpid()}"
        with open(ptr_tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(ptr_tmp, self._pointer_path(name))

    def read_blob(self, name: str, version: int | None = None) -> bytes | None:
        v = self.current_version(name) if version is None else version
        if v is None:
            return None
        try:
            with open(os.path.join(self._table_dir(name),
                                   f"v{v:06d}.blob"), "rb") as f:
                return f.read()
        except OSError:
            return None

    # --- run-level metadata (iteration counter, discovery_seq counter) ---

    def read_meta(self) -> dict:
        try:
            with open(os.path.join(self.root, "_meta.json")) as f:
                return json.load(f)
        except OSError:
            return {}

    def write_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.root, f"_meta.json.tmp{os.getpid()}")
        os.makedirs(self.root, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.root, "_meta.json"))
