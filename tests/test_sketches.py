"""Portable HLL / theta sketches: algebra, accuracy, merge-engine union.

(ref: FieldHllSketchAgg.java / FieldThetaSketchAgg.java)
"""

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import Table
from paimon_spark.functions.sketches import (
    hll_build, hll_estimate, hll_union,
    theta_build, theta_estimate, theta_union,
    hll_estimate_col, hll_sketch_agg, theta_estimate_col,
)


def test_hll_accuracy_and_union_algebra():
    a = hll_build(range(0, 60_000))
    b = hll_build(range(40_000, 100_000))
    for sk, truth in ((a, 60_000), (hll_union([a, b]), 100_000)):
        est = hll_estimate(sk)
        assert abs(est - truth) / truth < 0.05
    # idempotent + commutative
    assert hll_union([a, a]) == a
    assert hll_union([a, b]) == hll_union([b, a])


def test_hll_small_range_linear_counting():
    est = hll_estimate(hll_build(range(100)))
    assert abs(est - 100) <= 3               # linear-counting regime, ~2% err


def test_theta_exact_below_k_and_union():
    a = theta_build(range(500))
    assert theta_estimate(a) == 500          # below k=1024 → exact
    b = theta_build(range(400, 50_000))
    u = theta_union([a, b])
    assert abs(theta_estimate(u) - 50_000) / 50_000 < 0.1
    assert theta_union([a, b]) == theta_union([b, a])


def test_hll_merge_engine_union(spark, wh):
    schema = T.StructType([T.StructField("seg", T.StringType()),
                           T.StructField("uv", T.BinaryType())])
    t = Table.create(f"{wh}/uv", schema, primary_keys=["seg"],
                     options={"bucket": "1", "merge-engine": "aggregation",
                              "fields.uv.aggregate-function": "hll_sketch"},
                     spark=spark)
    # two commits each carrying a pre-built sketch per segment
    t.append(spark.createDataFrame(
        [("a", hll_build(range(0, 3000))), ("b", hll_build(range(10)))], schema))
    t.append(spark.createDataFrame(
        [("a", hll_build(range(2000, 5000)))], schema))
    rows = {r.seg: r.est for r in
            t.read().select("seg", hll_estimate_col(F.col("uv")).alias("est")).collect()}
    assert abs(rows["a"] - 5000) / 5000 < 0.05
    assert rows["b"] == 10


def test_theta_merge_engine_union(spark, wh):
    schema = T.StructType([T.StructField("seg", T.StringType()),
                           T.StructField("uv", T.BinaryType())])
    t = Table.create(f"{wh}/th", schema, primary_keys=["seg"],
                     options={"bucket": "1", "merge-engine": "aggregation",
                              "fields.uv.aggregate-function": "theta_sketch"},
                     spark=spark)
    t.append(spark.createDataFrame([("a", theta_build(range(300)))], schema))
    t.append(spark.createDataFrame([("a", theta_build(range(200, 600)))], schema))
    got = t.read().select(theta_estimate_col(F.col("uv")).alias("e")).collect()
    assert got[0].e == 600                   # union below k → exact


def test_hll_sketch_agg_distributed_build(spark):
    """Build sketches with Spark groupBy over real testdata and check the
    estimate against exact distinct counts."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    est = (orders.groupBy("o_orderpriority")
           .agg(hll_sketch_agg(F.col("o_custkey")).alias("sk"))
           .select("o_orderpriority", hll_estimate_col(F.col("sk")).alias("est")))
    exact = (orders.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("exact")))
    joined = {r.o_orderpriority: (r.est, r.exact)
              for r in est.join(exact, "o_orderpriority").collect()}
    assert joined
    for e, x in joined.values():
        assert abs(e - x) / max(x, 1) < 0.05
