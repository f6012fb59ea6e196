"""create_bucketed_mirror: the object-store co-located-join recovery.

On filesystems without hardlinks (S3/GCS) the snapshot-scoped bucketed
hardlink views are unavailable and engine reads plan with +1 Exchange.
The mirror API materializes the merged state into a Spark-native
bucketed table whose joins on the bucket keys plan with ZERO Exchange —
the role SupportsReportPartitioning plays in the reference's JVM
connector (paimon-spark/.../PaimonScan.scala:115-117)."""

import errno
import os

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

SCH = T.StructType([T.StructField("k", T.LongType()),
                    T.StructField("v", T.StringType())])

SCH2 = T.StructType([T.StructField("k", T.LongType()),
                     T.StructField("w", T.DoubleType())])


@pytest.fixture()
def no_hardlinks(monkeypatch):
    """Simulate an object store: os.link raises EPERM, probe cache
    cleared so the downgrade is re-probed under the patch."""
    import paimon_spark.fs as fs

    def _eperm(*a, **kw):
        raise OSError(errno.EPERM, "hard links not supported")

    fs.reset_probe_cache()
    monkeypatch.setattr(os, "link", _eperm)
    yield
    fs.reset_probe_cache()


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))


def test_mirror_join_zero_exchange_without_hardlinks(spark, wh,
                                                     no_hardlinks):
    t1 = Table.create(f"{wh}/m1", SCH, primary_keys=["k"],
                      options={"bucket": "4"}, spark=spark)
    t1.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], SCH))
    t1.append(spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 500, 5)], SCH))
    t2 = Table.create(f"{wh}/m2", SCH2, primary_keys=["k"],
                      options={"bucket": "4"}, spark=spark)
    t2.append(spark.createDataFrame(
        [(i, float(i) * 0.5) for i in range(0, 500, 2)], SCH2))

    # sanity: with os.link dead, the engine read really is the
    # downgraded plain-scan path (no bucketed hardlink view)
    assert t1._bucketed_view(t1.new_scan().plan().entries) is None

    m1 = t1.create_bucketed_mirror(sorted_by=["k"])
    m2 = t2.create_bucketed_mirror(sorted_by=["k"])

    # mirror state == merged engine state (last-write-wins preserved)
    got = {r.k: r.v for r in spark.table(m1).collect()}
    exp = {r.k: r.v for r in t1.read().collect()}
    assert got == exp and got[5] == "u5" and got[1] == "v1"

    # the whole point: mirror ⨝ mirror on the bucket key plans with
    # ZERO Exchange on a no-hardlink filesystem
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(m1).join(spark.table(m2), "k")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        n = j.count()
        assert n == 250
        # groupBy on the bucket key is exchange-free too
        g = spark.table(m1).groupBy("k").agg(F.count("*").alias("c"))
        assert "Exchange" not in _plan(g), _plan(g)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_mirror_meta_freshness_and_refresh(spark, wh, no_hardlinks):
    t = Table.create(f"{wh}/mf", SCH, primary_keys=["k"],
                     options={"bucket": "2"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCH))
    name = t.create_bucketed_mirror(name="mf_mirror")
    meta = t.bucketed_mirror_meta(name)
    assert meta["fresh"] and meta["num_buckets"] == 2
    # table moves on -> mirror reports stale; re-create refreshes
    t.append(spark.createDataFrame([(1, "a2"), (3, "c")], SCH))
    assert t.bucketed_mirror_meta(name)["fresh"] is False
    t.create_bucketed_mirror(name=name)
    assert t.bucketed_mirror_meta(name)["fresh"]
    got = {r.k: r.v for r in spark.table(name).collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}
    assert t.bucketed_mirror_meta("nope") is None


def test_mirror_rejects_unbucketed(spark, wh):
    t = Table.create(f"{wh}/mu", SCH, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], SCH))
    with pytest.raises(ValueError, match="fixed-bucket"):
        t.create_bucketed_mirror()


def test_mirror_via_call_procedure(spark, wh):
    from paimon_spark import Catalog
    cat = Catalog(wh, spark)
    t = cat.create_table("db.mproc", SCH, primary_keys=["k"],
                         options={"bucket": "2"})
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCH))
    name = cat.sql(
        f"CALL sys.create_bucketed_mirror(table => 'db.mproc', "
        f"name => 'proc_mirror', sorted_by => 'k')")
    got = {r.k: r.v for r in spark.table("proc_mirror").collect()}
    assert got == {1: "a", 2: "b"}
    assert t.bucketed_mirror_meta("proc_mirror")["fresh"]
