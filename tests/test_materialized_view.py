"""Materialized views (≈ the reference's materialized tables —
paimon-flink CatalogMaterializedTable: definition + freshness stored as
table properties, FULL refresh; refresh here is engine-side)."""

import time

from pyspark.sql import types as T

from paimon_spark import Catalog

SCH = T.StructType([T.StructField("k", T.LongType()),
                    T.StructField("v", T.LongType())])


def _base(spark, cat, rows):
    t = (cat.get_table("base") if cat.table_exists("base")
         else cat.create_table("base", SCH))
    t.append(spark.createDataFrame(rows, SCH))
    return t


def test_materialized_view_lifecycle(spark, wh):
    cat = Catalog(wh, spark)
    _base(spark, cat, [(1, 10), (1, 20), (2, 5)])
    cat.sql("CREATE MATERIALIZED VIEW mv AS "
            "SELECT k, sum(v) AS total FROM base GROUP BY k")
    mv = cat.get_table("mv")
    got = {r.k: r.total for r in mv.read().collect()}
    assert got == {1: 30, 2: 5}
    # stale after base grows; explicit refresh recomputes
    _base(spark, cat, [(2, 95)])
    assert {r.k: r.total for r in cat.get_table("mv").read().collect()} \
        == got
    cat.sql("REFRESH MATERIALIZED VIEW mv")
    assert {r.k: r.total
            for r in cat.get_table("mv").read().collect()} == {1: 30,
                                                               2: 100}
    # the refresh is one OVERWRITE commit — history stays time-travelable
    assert cat.get_table("mv").read(snapshot_id=1).count() == 2


def test_materialized_view_freshness(spark, wh):
    cat = Catalog(wh, spark)
    _base(spark, cat, [(7, 1)])
    cat.create_materialized_view(
        "mv_f", "SELECT k, count(*) AS n FROM base GROUP BY k",
        freshness_s=3600)
    _base(spark, cat, [(8, 1)])
    # within freshness: ensure_fresh is a no-op
    cat.ensure_fresh("mv_f")
    assert cat.get_table("mv_f").read().count() == 1
    # force staleness: rewind the recorded refresh stamp
    cat.get_table("mv_f").alter(lambda sc: sc.set_option(
        "materialized-view.last-refresh-ms",
        str(int((time.time() - 7200) * 1000))))
    cat.ensure_fresh("mv_f")
    assert cat.get_table("mv_f").read().count() == 2
