"""TopN-aware planning: stats-ordered file pruning."""

from pyspark.sql import types as T

from paimon_spark import P, Table

S = T.StructType([T.StructField("v", T.LongType()),
                  T.StructField("tag", T.StringType())])


def test_topn_prunes_files_and_matches(spark, wh):
    t = Table.create(f"{wh}/t", S, spark=spark)
    # 4 commits with disjoint value ranges → one file each
    for lo in (0, 1000, 2000, 3000):
        t.append(spark.createDataFrame(
            [(lo + i, f"r{lo}") for i in range(100)], S).coalesce(1))
    plan = t.new_scan().plan_topn("v", 10, descending=True)
    assert len(plan.entries) == 1  # only the 3000s file can hold the top-10
    assert plan.files_skipped == 3
    got = [r["v"] for r in t.read_topn("v", 10).collect()]
    assert got == list(range(3099, 3089, -1))
    # ascending
    got = [r["v"] for r in t.read_topn("v", 5, descending=False).collect()]
    assert got == [0, 1, 2, 3, 4]


def test_topn_overlapping_ranges_stays_correct(spark, wh):
    t = Table.create(f"{wh}/o", S, spark=spark)
    t.append(spark.createDataFrame([(i, "a") for i in range(0, 200, 2)], S).coalesce(1))
    t.append(spark.createDataFrame([(i, "b") for i in range(1, 200, 2)], S).coalesce(1))
    got = [r["v"] for r in t.read_topn("v", 4).collect()]
    assert got == [199, 198, 197, 196]


def test_topn_with_predicate(spark, wh):
    t = Table.create(f"{wh}/p", S, spark=spark)
    for lo in (0, 1000):
        t.append(spark.createDataFrame(
            [(lo + i, "x" if i % 2 else "y") for i in range(50)], S).coalesce(1))
    got = [r["v"] for r in t.read_topn("v", 3, predicate=P.eq("tag", "x")).collect()]
    assert got == [1049, 1047, 1045]
