"""FormatTable: plain format directories (parquet/orc/csv/json/text/avro)
exposed with the Table-ish read surface but no snapshots or manifests.

(ref: paimon-core/.../table/FormatTable.java — a table whose storage is just
 a (possibly hive-partitioned) directory of files in one format; reads/writes
 go straight through the format, schema evolution and time travel don't
 apply.)

Spark-first: this is a thin veneer over `spark.read.<fmt>` /
`df.write.<fmt>` — Catalyst already does partition discovery, pushdown and
pruning for these sources, so the engine adds only the predicate AST bridge
and partition-path helpers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from paimon_spark.predicates import Predicate

FORMATS = ("parquet", "orc", "avro", "csv", "json", "text")


class FormatTable:
    def __init__(self, path: str, fmt: str = "parquet",
                 spark: SparkSession | None = None,
                 partition_keys: list[str] | None = None,
                 options: dict[str, str] | None = None):
        if fmt not in FORMATS:
            raise ValueError(f"format must be one of {FORMATS}")
        self.path = path
        self.fmt = fmt
        self.spark = spark
        self.partition_keys = partition_keys or []
        self.options = options or {}

    def with_spark(self, spark: SparkSession) -> "FormatTable":
        self.spark = spark
        return self

    def read(self, predicate: Predicate | None = None,
             projection: list[str] | None = None) -> DataFrame:
        from paimon_spark.writer import spark_format_name
        reader = (self.spark.read.format(spark_format_name(self.fmt))
                  .option("basePath", self.path))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        if self.fmt == "csv" and "header" not in self.options:
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.load(self.path)
        if predicate is not None:
            df = df.filter(predicate.to_spark())
        if projection is not None:
            df = df.select(*projection)
        return df

    def write(self, df: DataFrame, mode: str = "append"):
        from paimon_spark.writer import spark_format_name
        writer = df.write.format(spark_format_name(self.fmt)).mode(mode)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        if self.fmt == "csv":
            writer = writer.option("header", "true")
        if self.partition_keys:
            writer = writer.partitionBy(*self.partition_keys)
        writer.save(self.path)

    def partitions(self) -> list[dict[str, str]]:
        """Hive-style partition dirs discovered from the filesystem."""
        if not self.partition_keys:
            return []
        out = []

        def walk(d: str, depth: int, acc: dict):
            if depth == len(self.partition_keys):
                out.append(dict(acc))
                return
            key = self.partition_keys[depth]
            try:
                names = os.listdir(d)
            except FileNotFoundError:
                return
            for n in sorted(names):
                if n.startswith(f"{key}="):
                    acc[key] = n.split("=", 1)[1]
                    walk(os.path.join(d, n), depth + 1, acc)
        walk(self.path, 0, {})
        return out


class ObjectTable:
    """Read-only metadata index over a directory of arbitrary objects
    (images, audio, model checkpoints, …) — analyze unstructured data
    in object storage with SQL. (ref: paimon-core/.../table/object/
    ObjectTable.java — SCHEMA path/name/length/mtime/atime/owner;
    ObjectTableImpl is a ReadonlyTable whose scan lists the location.)

    Spark-first scale shape: the driver lists only the FIRST level of
    the location; every subtree is walked inside a task
    (sc.parallelize(seeds).flatMap), so a bucket with millions of
    objects refreshes across the cluster instead of serializing one
    driver-side walk. This is one of the rare justified RDD uses —
    per-partition imperative filesystem I/O."""

    SCHEMA = ("path string, name string, length bigint, mtime bigint, "
              "atime bigint, owner string")

    def __init__(self, location: str, spark: SparkSession | None = None,
                 options: dict[str, str] | None = None):
        self.location = location
        self.path = location
        self.spark = spark
        self.options = options or {}

    def with_spark(self, spark: SparkSession) -> "ObjectTable":
        self.spark = spark
        return self

    def read(self, predicate: Predicate | None = None,
             projection: list[str] | None = None) -> DataFrame:
        loc = self.location

        def stat_one(rel: str, full: str):
            st = os.stat(full)
            try:
                import pwd
                owner = pwd.getpwuid(st.st_uid).pw_name
            except (ImportError, KeyError):
                owner = None
            return (rel, os.path.basename(rel), st.st_size,
                    int(st.st_mtime * 1000), int(st.st_atime * 1000),
                    owner)

        def walk_subtree(seed: str):
            full_seed = os.path.join(loc, seed) if seed else loc
            for dirpath, _dirs, files in os.walk(full_seed):
                for fn in files:
                    full = os.path.join(dirpath, fn)
                    yield stat_one(os.path.relpath(full, loc), full)

        try:
            first = sorted(os.listdir(loc))
        except FileNotFoundError:
            first = []
        top_files = [stat_one(n, os.path.join(loc, n)) for n in first
                     if os.path.isfile(os.path.join(loc, n))]
        seeds = [n for n in first if os.path.isdir(os.path.join(loc, n))]
        sc = self.spark.sparkContext
        if seeds:
            rdd = sc.parallelize(seeds, max(1, min(len(seeds), 64))) \
                .flatMap(walk_subtree)
            df = self.spark.createDataFrame(rdd, self.SCHEMA)
        else:
            df = self.spark.createDataFrame([], self.SCHEMA)
        if top_files:
            df = df.unionByName(
                self.spark.createDataFrame(top_files, self.SCHEMA))
        if predicate is not None:
            df = df.filter(predicate.to_spark())
        if projection is not None:
            df = df.select(*projection)
        return df

    def register_views(self, name: str,
                       system_tables: bool = False) -> list[str]:
        self.read().createOrReplaceTempView(name)
        return [name]
