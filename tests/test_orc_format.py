"""`file.format=orc` snapshot tables: write, stats-based pruning, PK
merge-on-read, deletion vectors, bloom index, streaming reads.
(ref: CoreOptions.java:337 file.format; TableReadBenchmark.java — the
reference's headline scan numbers are ORC)"""

import os

from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType()),
                       T.StructField("x", T.DoubleType())])


def test_orc_append_roundtrip_and_pruning(spark, wh):
    t = Table.create(f"{wh}/orc_a", SCHEMA,
                     options={"file.format": "orc"}, spark=spark)
    t.append(spark.createDataFrame([(i, f"v{i}", float(i)) for i in range(100)],
                                   SCHEMA))
    t.append(spark.createDataFrame([(i, f"v{i}", float(i))
                                    for i in range(100, 200)], SCHEMA))
    assert all(e.file_path.endswith(".orc")
               for e in t.paths.live_entries(t.paths.latest_snapshot()))
    assert t.read().count() == 200
    # Spark-computed stats drive skipping exactly like parquet footers
    plan = t.new_scan().plan(P.le("k", 50))
    assert plan.files_skipped > 0
    got = sorted(r.k for r in t.read(P.le("k", 50)).collect())
    assert got == list(range(51))


def test_orc_pk_merge_and_dv_delete(spark, wh):
    t = Table.create(f"{wh}/orc_pk", SCHEMA, primary_keys=["k"],
                     options={"file.format": "orc", "bucket": "2",
                              "deletion-vectors.enabled": "true"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, "a", 1.0) for i in range(20)], SCHEMA))
    t.append(spark.createDataFrame([(i, "b", 2.0) for i in range(0, 20, 2)],
                                   SCHEMA))
    got = {r.k: r.v for r in t.read().collect()}
    assert got[2] == "b" and got[3] == "a" and len(got) == 20
    t.delete_where(P.lt("k", 5))
    assert t.read().count() == 15
    # metadata count stays DV-aware on ORC
    assert sorted(r.k for r in t.read(P.ge("k", 18)).collect()) == [18, 19]


def test_orc_bloom_index_and_metadata_agg(spark, wh):
    t = Table.create(f"{wh}/orc_bloom", SCHEMA,
                     options={"file.format": "orc",
                              "file-index.bloom-filter.columns": "v"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, f"u{i}", 0.0) for i in range(50)],
                                   SCHEMA))
    e = t.paths.live_entries(t.paths.latest_snapshot())[0]
    assert e.index_path and os.path.exists(os.path.join(t.path, e.index_path))
    assert t.new_scan().metadata_count() == 50
    mm = t.new_scan().metadata_min_max("k")
    assert (mm[0], mm[1]) == (0, 49)


def test_orc_streaming_read(spark, wh):
    from paimon_spark.streaming.source import StreamScanner
    t = Table.create(f"{wh}/orc_stream", SCHEMA,
                     options={"file.format": "orc"}, spark=spark)
    for i in range(2):
        t.append(spark.createDataFrame([(i, f"s{i}", 0.0)], SCHEMA))
    sc = StreamScanner(t, mode="from-snapshot", from_snapshot=1)
    batches = []
    while True:
        b = sc.next_batch()
        if b is None:
            break
        batches.append(b)
    rows = sorted((r.k, r.v) for df in batches for r in df.collect())
    assert rows == [(0, "s0"), (1, "s1")]


def test_orc_python_datasource_batch_read(spark, wh):
    from paimon_spark.streaming.datasource import register
    register(spark)
    t = Table.create(f"{wh}/orc_ds", SCHEMA,
                     options={"file.format": "orc"}, spark=spark)
    t.append(spark.createDataFrame([(i, f"d{i}", 0.0) for i in range(10)],
                                   SCHEMA))
    df = spark.read.format("paimon").option("path", t.path).load()
    assert sorted(r.k for r in df.select("k").collect()) == list(range(10))


def test_orc_schema_evolution_reads_old_files(spark, wh):
    """Field-id mapping at read works for ORC files too (rename + widen +
    add after files were written)."""
    t = Table.create(f"{wh}/orc_evo", SCHEMA,
                     options={"file.format": "orc"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a", 1.5)], SCHEMA))
    t.alter(lambda s: s.rename_column("v", "v2"))
    t.alter(lambda s: s.add_column("extra", T.LongType()))
    t2 = Table.load(t.path, spark)
    t2.append(spark.createDataFrame([(2, "b", 2.5, 9)], t2.schema.struct))
    got = sorted(tuple(r) for r in t2.read().collect())
    assert got == [(1, "a", 1.5, None), (2, "b", 2.5, 9)]
