"""Warehouse catalog: databases = directories, tables = table directories.

≈ the reference's FileSystemCatalog
(ref: paimon-core/src/main/java/org/apache/paimon/catalog/FileSystemCatalog.java).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from paimon_spark.table import Table


class Catalog:
    def __init__(self, warehouse: str, spark: SparkSession | None = None):
        self.warehouse = warehouse
        self.spark = spark
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        db, _, tbl = name.rpartition(".")
        return os.path.join(self.warehouse, db + ".db", tbl) if db \
            else os.path.join(self.warehouse, name)

    def create_table(self, name: str, struct: T.StructType,
                     partition_keys: list[str] | None = None,
                     primary_keys: list[str] | None = None,
                     options: dict[str, str] | None = None) -> Table:
        return Table.create(self._path(name), struct, partition_keys,
                            primary_keys, options, self.spark)

    def get_table(self, name: str) -> Table:
        return Table.load(self._path(name), self.spark)

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "schema"))

    def drop_table(self, name: str):
        shutil.rmtree(self._path(name), ignore_errors=True)

    def list_tables(self, db: str | None = None) -> list[str]:
        base = os.path.join(self.warehouse, db + ".db") if db else self.warehouse
        try:
            return sorted(n for n in os.listdir(base)
                          if os.path.isdir(os.path.join(base, n, "schema")))
        except FileNotFoundError:
            return []

    def register_views(self, db: str | None = None,
                       system_tables: bool = False) -> list[str]:
        """Register every table as a Spark temp view so plain
        `spark.sql("SELECT ... FROM tbl")` works — the SQL entry point a
        reference user expects (ref: SparkCatalog.java loadTable; system
        tables `tbl$snapshots` map to `tbl__snapshots` since `$` is not a
        valid temp-view identifier)."""
        names = []
        for n in self.list_tables(db):
            t = self.get_table(f"{db}.{n}" if db else n)
            names += t.register_views(n, system_tables=system_tables)
        return names
