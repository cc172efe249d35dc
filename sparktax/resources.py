"""Named-resource registry (reference resources.json + libs/graph/register.py
+ libs/utils/resources.py — name → path lookups with interactive prompts;
here: a JSON file of name → {kind, path} with non-interactive flags, plus
Spark-catalog registration for table-like resources).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_REGISTRY = os.environ.get("SPARKTAX_RESOURCES", "resources.json")


class Resources:
    def __init__(self, path: str = DEFAULT_REGISTRY):
        self.path = path
        self._data: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._data = json.load(f)

    def register(
        self, name: str, path: str, kind: str = "parquet", overwrite: bool = False
    ) -> None:
        """(reference register_graph, libs/graph/register.py:24-63 — the
        interactive confirm is replaced by ``overwrite``)."""
        if name in self._data and not overwrite:
            raise KeyError(f"resource {name!r} already registered (overwrite=True to replace)")
        self._data[name] = {"kind": kind, "path": path}
        self._save()

    def unregister(self, name: str) -> None:
        self._data.pop(name, None)
        self._save()

    def path_of(self, name: str) -> str:
        if name not in self._data:
            raise KeyError(f"unknown resource {name!r}; known: {sorted(self._data)}")
        return self._data[name]["path"]

    def names(self) -> list[str]:
        return sorted(self._data)

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        meta = self._data.get(name)
        if meta is None:
            raise KeyError(f"unknown resource {name!r}")
        if meta["kind"] == "parquet":
            return spark.read.parquet(meta["path"])
        if meta["kind"] == "table":
            return spark.table(meta["path"])
        raise ValueError(f"unknown resource kind {meta['kind']!r}")

    def register_as_views(self, spark: SparkSession) -> None:
        """Expose every resource as a temp view (spark.catalog lane)."""
        for name in self.names():
            self.load(spark, name).createOrReplaceTempView(name)

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
