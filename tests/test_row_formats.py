"""`file.format=csv|json` snapshot tables: full LSM semantics over row
formats — write, Spark-computed stats pruning, PK merge-on-read, null
round-trips, partitioned layout, time travel. avro is gated on the
external spark-avro module (absent here: the gate itself is tested).
(ref: CoreOptions.java:337 file.format — the reference writes
avro/csv/json data files too)"""

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType()),
                       T.StructField("x", T.DoubleType())])


@pytest.mark.parametrize("fmt", ["csv", "json", "avro"])
def test_row_format_roundtrip_and_pruning(spark, wh, fmt):
    t = Table.create(f"{wh}/{fmt}_a", SCHEMA,
                     options={"file.format": fmt}, spark=spark)
    t.append(spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(100)], SCHEMA))
    t.append(spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(100, 200)], SCHEMA))
    assert all(e.file_path.endswith(f".{fmt}")
               for e in t.paths.live_entries(t.paths.latest_snapshot()))
    assert t.read().count() == 200
    plan = t.new_scan().plan(P.le("k", 50))
    assert plan.files_skipped > 0          # Spark-agg stats drive skipping
    assert sorted(r.k for r in t.read(P.le("k", 50)).collect()) == \
        list(range(51))


@pytest.mark.parametrize("fmt", ["csv", "json", "avro"])
def test_row_format_pk_merge(spark, wh, fmt):
    t = Table.create(f"{wh}/{fmt}_pk", SCHEMA, primary_keys=["k"],
                     options={"file.format": fmt, "bucket": "2"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, "a", 1.0) for i in range(20)], SCHEMA))
    t.append(spark.createDataFrame([(i, "b", 2.0) for i in range(0, 20, 2)],
                                   SCHEMA))
    got = {r.k: r.v for r in t.read().collect()}
    assert got[2] == "b" and got[3] == "a" and len(got) == 20
    t.delete_where(P.lt("k", 5))
    assert t.read().count() == 15
    t.compact()
    assert t.read().count() == 15
    assert t.read(snapshot_id=1).count() == 20     # time travel intact


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_row_format_null_and_empty_string(spark, wh, fmt):
    """csv uses the \\N sentinel so NULL and '' survive a round trip."""
    t = Table.create(f"{wh}/{fmt}_null", SCHEMA,
                     options={"file.format": fmt}, spark=spark)
    t.append(spark.createDataFrame(
        [(1, None, None), (2, "", 0.0), (3, "x", 3.0)], SCHEMA))
    got = {r.k: (r.v, r.x) for r in t.read().collect()}
    assert got[1] == (None, None)
    assert got[2] == ("", 0.0)
    assert got[3] == ("x", 3.0)


def test_row_format_partitioned_with_timestamp(spark, wh):
    sch = T.StructType([T.StructField("p", T.StringType()),
                        T.StructField("k", T.LongType()),
                        T.StructField("ts", T.TimestampType())])
    t = Table.create(f"{wh}/csv_part", sch, partition_keys=["p"],
                     options={"file.format": "csv"}, spark=spark)
    rows = [("a", 1, dt.datetime(2026, 1, 1, 12, 0, 0)),
            ("b", 2, dt.datetime(2026, 6, 30, 23, 59, 59))]
    t.append(spark.createDataFrame(rows, sch))
    got = sorted((r.p, r.k, r.ts) for r in t.read().collect())
    assert got == sorted(rows)
    assert [r.k for r in t.read(P.eq("p", "b")).collect()] == [2]


def test_csv_rejects_complex_types(spark, wh):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("arr", T.ArrayType(T.LongType()))])
    with pytest.raises(ValueError, match="csv"):
        Table.create(f"{wh}/csv_bad", sch,
                     options={"file.format": "csv"}, spark=spark)


def test_dv_requires_columnar_format(spark, wh):
    with pytest.raises(ValueError, match="parquet or orc"):
        Table.create(f"{wh}/avro_dv", SCHEMA, primary_keys=["k"],
                     options={"file.format": "avro", "bucket": "1",
                              "deletion-vectors.enabled": "true"},
                     spark=spark)


def test_avro_partitioned_layout(spark, wh):
    """avro (addressed by class name — Spark 4 ships the classes inside
    spark-sql without the short-name registration) with a partitioned
    layout; sidecar indexes are parquet/orc-only and rejected early."""
    sch = T.StructType([T.StructField("p", T.StringType()),
                        T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/avro_part", sch, partition_keys=["p"],
                     options={"file.format": "avro"}, spark=spark)
    t.append(spark.createDataFrame(
        [("a", i, f"u{i}") for i in range(50)] +
        [("b", i, f"w{i}") for i in range(50)], sch))
    es = t.paths.live_entries(t.paths.latest_snapshot())
    assert all(e.file_path.endswith(".avro") for e in es)
    assert t.read(P.eq("p", "b")).count() == 50
    assert sorted(r.k for r in t.read(P.eq("v", "u7")).collect()) == [7]
    with pytest.raises(ValueError, match="parquet or orc"):
        Table.create(f"{wh}/avro_bloom", sch,
                     options={"file.format": "avro",
                              "file-index.bloom-filter.columns": "v"},
                     spark=spark)


TEXT_SCHEMA = T.StructType([T.StructField("doc", T.StringType())])


def test_text_format_snapshot_table(spark, wh):
    """file.format=text snapshot table: single STRING column, full LSM
    commit/stats/time-travel semantics over Spark's text source
    (ref: format/text/TextFileFormat.java — validateDataFields allows
    one string column; partition keys live in the path)."""
    t = Table.create(f"{wh}/txt", TEXT_SCHEMA,
                     options={"file.format": "text"}, spark=spark)
    t.append(spark.createDataFrame([(f"line {i}",) for i in range(50)],
                                   TEXT_SCHEMA))
    t.append(spark.createDataFrame([(f"line {i}",) for i in range(50, 80)],
                                   TEXT_SCHEMA))
    assert all(e.file_path.endswith(".txt")
               for e in t.paths.live_entries(t.paths.latest_snapshot()))
    assert t.read().count() == 80
    # stats-based pruning on the string column
    plan = t.new_scan().plan(P.eq("doc", "line 7"))
    assert sorted(r.doc for r in t.read(P.eq("doc", "line 7")).collect()) \
        == ["line 7"]
    # time travel
    assert t.read(snapshot_id=1).count() == 50
    # snapshot count metadata
    assert t.new_scan().metadata_count() == 80


def test_text_format_partitioned(spark, wh):
    sch = T.StructType([T.StructField("pt", T.StringType()),
                        T.StructField("doc", T.StringType())])
    t = Table.create(f"{wh}/txtp", sch, partition_keys=["pt"],
                     options={"file.format": "text"}, spark=spark)
    t.append(spark.createDataFrame(
        [("a", "x1"), ("a", "x2"), ("b", "y1")], sch))
    assert t.read().count() == 3
    plan = t.new_scan().plan(P.eq("pt", "a"))
    assert plan.files_skipped > 0
    assert sorted(r.doc for r in t.read(P.eq("pt", "a")).collect()) == \
        ["x1", "x2"]


def test_text_format_rejects_invalid_shapes(spark, wh):
    # multi-column
    t = Table.create(f"{wh}/txt_bad", SCHEMA,
                     options={"file.format": "text"}, spark=spark)
    with pytest.raises(ValueError, match="single STRING"):
        t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    # PK table
    t2 = Table.create(
        f"{wh}/txt_bad_pk", TEXT_SCHEMA, primary_keys=["doc"],
        options={"file.format": "text", "bucket": "1"}, spark=spark)
    with pytest.raises(ValueError, match="single STRING"):
        t2.append(spark.createDataFrame([("a",)], TEXT_SCHEMA))


def test_randomized_avro_pk_model(spark, wh):
    """Seeded random upsert/delete/compact sequence on an AVRO-format PK
    table vs a dict model — the row-format write/merge/read paths must
    match parquet semantics exactly."""
    import random
    from pyspark.sql import types as T
    from paimon_spark import P, Table
    rng = random.Random(31)
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("s", T.StringType()),
                        T.StructField("d", T.DoubleType())])
    t = Table.create(f"{wh}/avrorand", sch, primary_keys=["k"],
                     options={"bucket": "2", "file.format": "avro"},
                     spark=spark)
    model: dict[int, tuple] = {}
    for step in range(8):
        op = rng.choice(["upsert", "upsert", "delete", "compact"])
        if op == "upsert" or not model:
            rows = {rng.randint(0, 20): (f"s{rng.randint(0, 99)}",
                                         round(rng.random() * 10, 3))
                    for _ in range(rng.randint(1, 6))}
            t.append(spark.createDataFrame(
                [(k, s, d) for k, (s, d) in rows.items()], sch))
            model.update(rows)
        elif op == "delete":
            vs = rng.sample(sorted(model), min(2, len(model)))
            t.delete_where(P.isin("k", vs))
            for k in vs:
                del model[k]
        else:
            t.compact()
        got = {r.k: (r.s, r.d) for r in t.read().collect()}
        assert got == model, f"step {step} ({op}): avro PK state diverged"
