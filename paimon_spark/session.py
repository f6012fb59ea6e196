"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same configs are what we'd set on a
real cluster (AQE for runtime re-planning / skew joins, Arrow for any
Pandas-UDF boundary, LAST_WIN map semantics for merge_map).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "paimon_spark", shuffle_partitions: int | None = None,
              cpus: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    # make paimon_spark importable in Python workers (data source runners,
    # mapInPandas) regardless of the driver's cwd
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + os.pathsep + \
            os.environ.get("PYTHONPATH", "")
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # TIME type (ref DataTypeRoot.java:92): Spark 4.1 gates TimeType
        # behind this flag — with it on, literals, HOUR()/EXTRACT, and
        # the parquet round-trip all work (probed r7; was the last
        # unsupported reference type root)
        .config("spark.sql.timeType.enabled", "true")
        # Python-DS filter pushdown (Spark 4.1): lets format('paimon')
        # readers hand pushed filters to the manifest/stats planner
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local mode runs executors inside the driver JVM: a 32-thread
        # run on an 8g heap spends seconds per query in GC (measured:
        # q18 0.8 s → 5.2 s purely from heap pressure at sf0.1). Size
        # the heap to the machine; on a real cluster this maps to
        # normal executor memory, not driver memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # testdata events.parquet has TIMESTAMP(NANOS) — read as raw int64
        # (Spark 4 otherwise rejects the file; DuckDB reads ns natively)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 timestamps have no usable footer stats; micros do
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
