"""FormatTable passthrough (S8) and variant columns (F6)."""

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P
from paimon_spark.format_table import FormatTable
from paimon_spark.functions.variant import to_variant, variant_get

SCHEMA = T.StructType([T.StructField("dt", T.StringType()),
                       T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType())])


def test_format_table_csv_roundtrip(spark, wh):
    ft = FormatTable(f"{wh}/csv", "csv", spark, partition_keys=["dt"])
    df = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")], SCHEMA)
    ft.write(df)
    got = ft.read(P.eq("dt", "d1"))
    assert got.count() == 2
    assert ft.partitions() == [{"dt": "d1"}, {"dt": "d2"}]
    # appends accumulate
    ft.write(spark.createDataFrame([("d3", 4, "d")], SCHEMA))
    assert ft.read().count() == 4


def test_format_table_json_predicate_pushdown(spark, wh):
    ft = FormatTable(f"{wh}/js", "json", spark)
    ft.write(spark.createDataFrame([("d1", i, f"s{i}") for i in range(10)], SCHEMA))
    out = ft.read(P.ge("k", 5), projection=["k"])
    assert sorted(r.k for r in out.collect()) == [5, 6, 7, 8, 9]


def test_variant_parse_and_typed_get(spark):
    df = spark.createDataFrame(
        [(1, '{"user": {"id": 42, "name": "ann"}, "tags": ["x", "y"]}'),
         (2, '{"user": {"id": 7}, "score": 1.5}')],
        "id long, js string")
    out = (df.select("id", to_variant("js").alias("v"))
           .select("id",
                   variant_get("v", "$.user.id", "bigint").alias("uid"),
                   variant_get("v", "$.user.name", "string").alias("uname"),
                   variant_get("v", "$.tags[0]", "string").alias("t0")))
    rows = {r.id: (r.uid, r.uname, r.t0) for r in out.collect()}
    assert rows[1] == (42, "ann", "x")
    assert rows[2] == (7, None, None)


def test_variant_in_lakehouse_table(spark, wh):
    """VARIANT stored in a paimon_spark table column — written as parquet
    variant, read back, extracted."""
    from paimon_spark import Table
    src = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, '{"a": 2, "b": "z"}')], "id long, js string")
    vdf = src.select("id", to_variant("js").alias("v"))
    t = Table.create(f"{wh}/var", vdf.schema, spark=spark)
    t.append(vdf)
    out = t.read().select("id", variant_get("v", "$.a", "bigint").alias("a"))
    assert {(r.id, r.a) for r in out.collect()} == {(1, 1), (2, 2)}
