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


def test_incremental_mv_append_base(spark, wh):
    """Incremental refresh folds only the base DELTA through the
    aggregation engine — maintenance scales with new data."""
    cat = Catalog(wh, spark)
    _base(spark, cat, [(1, 10), (1, 20), (2, 5)])        # snapshot 1
    cat.create_incremental_materialized_view(
        "imv", "base", ["k"],
        {"total": ("v", "sum"), "n": ("v", "count"),
         "vmax": ("v", "max")})
    got = {r.k: (r.total, r.n, r.vmax)
           for r in cat.get_table("imv").read().collect()}
    assert got == {1: (30, 2, 20), 2: (5, 1, 5)}
    _base(spark, cat, [(2, 95), (3, 7)])                  # snapshot 2
    cat.refresh_incremental_materialized_view("imv")
    got = {r.k: (r.total, r.n, r.vmax)
           for r in cat.get_table("imv").read().collect()}
    assert got == {1: (30, 2, 20), 2: (100, 2, 95), 3: (7, 1, 7)}
    # no-op refresh when the base has not moved
    cat.refresh_incremental_materialized_view("imv")
    assert cat.get_table("imv").read().count() == 3


def test_incremental_mv_pk_base_retractions(spark, wh):
    """A PK base emits -D/-U retractions; sum/count self-invert by
    appending negated contributions, min/max refuse loudly."""
    import pytest
    cat = Catalog(wh, spark)
    pk = cat.create_table("pkb", SCH, primary_keys=["k"],
                          options={"bucket": "2"})
    pk.append(spark.createDataFrame([(1, 10), (2, 20)], SCH))
    cat.create_incremental_materialized_view(
        "imv2", "pkb", ["k"], {"total": ("v", "sum"),
                               "n": ("v", "count")})
    pk.append(spark.createDataFrame([(1, 99)], SCH))     # upsert 1
    pk.delete_where(__import__("paimon_spark").P.eq("k", 2))
    cat.refresh_incremental_materialized_view("imv2")
    got = {r.k: (r.total, r.n)
           for r in cat.get_table("imv2").read().collect()}
    assert got[1] == (99, 1)
    assert got.get(2, (0, 0))[1] == 0                     # fully retracted
    # min/max + retractions = loud error
    cat.create_incremental_materialized_view(
        "imv3", "pkb", ["k"], {"vmax": ("v", "max")})
    pk.delete_where(__import__("paimon_spark").P.eq("k", 1))
    with pytest.raises(ValueError, match="retractions"):
        cat.refresh_incremental_materialized_view("imv3")


def test_incremental_mv_randomized_model(spark, wh):
    """Model-based chaos: random upserts/deletes on a PK base with a
    refresh after every few ops — the incremental view must equal a
    full aggregate of the current base at every checkpoint."""
    import random

    from paimon_spark import P
    rng = random.Random(11)
    cat = Catalog(wh, spark)
    base = cat.create_table("chaos_base", SCH, primary_keys=["k"],
                            options={"bucket": "2"})
    base.append(spark.createDataFrame(
        [(k, rng.randrange(100)) for k in range(20)], SCH))
    cat.create_incremental_materialized_view(
        "chaos_mv", "chaos_base", ["k"],
        {"total": ("v", "sum"), "n": ("v", "count")})
    for step in range(6):
        for _ in range(rng.randrange(1, 4)):
            if rng.random() < 0.7:
                base.append(spark.createDataFrame(
                    [(rng.randrange(30), rng.randrange(100))
                     for _ in range(rng.randrange(1, 6))], SCH))
            else:
                base.delete_where(P.expr(
                    f"k % 7 = {rng.randrange(7)}"))
        cat.refresh_incremental_materialized_view("chaos_mv")
        expect = {r.k: (r.t, r.n) for r in
                  base.read().groupBy("k")
                  .agg(__import__("pyspark.sql.functions",
                                  fromlist=["x"]).sum("v").alias("t"),
                       __import__("pyspark.sql.functions",
                                  fromlist=["x"]).count("v").alias("n"))
                  .collect()}
        got = {r.k: (r.total, r.n)
               for r in cat.get_table("chaos_mv").read().collect()
               if r.n != 0}                     # fully-retracted keys
        assert got == expect, f"diverged at step {step}"


def test_mv_sql_surface(spark, wh):
    cat = Catalog(wh, spark)
    _base(spark, cat, [(1, 1)])
    cat.sql("CREATE MATERIALIZED VIEW mv_a AS SELECT k FROM base")
    cat.create_incremental_materialized_view(
        "mv_b", "base", ["k"], {"n": ("v", "count")})
    shown = {r.name: r.refresh_mode
             for r in cat.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert shown == {"mv_a": "full", "mv_b": "incremental"}
    cat.sql("DROP MATERIALIZED VIEW mv_a")
    assert not cat.table_exists("mv_a")
    cat.sql("DROP MATERIALIZED VIEW IF EXISTS mv_a")   # idempotent


def test_incremental_mv_base_rollback_reseeds(spark, wh):
    """Rollback id-reuse on the BASE table: the view folded up to
    snapshot N; the base rolls back below N and re-commits (ids
    re-used). Incremental folding against the rewritten base would
    double-count — refresh must detect the rewrite via the pinned
    (id, timestamp) and fully re-seed from the rewound state."""
    import time as _time
    cat = Catalog(wh, spark)
    bt = _base(spark, cat, [(1, 10), (2, 5)])             # snapshot 1
    _base(spark, cat, [(1, 20)])                          # snapshot 2
    cat.create_incremental_materialized_view(
        "imv_rb", "base", ["k"], {"total": ("v", "sum")})
    assert {r.k: r.total for r in cat.get_table("imv_rb").read()
            .collect()} == {1: 30, 2: 5}
    bt.rollback_to(1)
    _time.sleep(0.002)
    _base(spark, cat, [(3, 99)])                # id 2 RE-USED, new rows
    cat.refresh_incremental_materialized_view("imv_rb")
    got = {r.k: r.total
           for r in cat.get_table("imv_rb").read().collect()}
    assert got == {1: 10, 2: 5, 3: 99}, got     # (1,20) fold rolled back
    # subsequent refresh is incremental again
    _base(spark, cat, [(3, 1)])
    cat.refresh_incremental_materialized_view("imv_rb")
    got = {r.k: r.total
           for r in cat.get_table("imv_rb").read().collect()}
    assert got == {1: 10, 2: 5, 3: 100}, got


def test_incremental_mv_base_rollback_below_fold_point(spark, wh):
    """latest < folded snapshot (pure rewind, nothing re-committed):
    the old empty-walk silently kept rolled-back rows folded — the
    refresh must re-seed to the rewound state."""
    cat = Catalog(wh, spark)
    bt = _base(spark, cat, [(5, 1)])                      # snapshot 1
    _base(spark, cat, [(5, 100), (6, 50)])                # snapshot 2
    cat.create_incremental_materialized_view(
        "imv_rw", "base", ["k"], {"total": ("v", "sum")})
    bt.rollback_to(1)
    cat.refresh_incremental_materialized_view("imv_rw")
    got = {r.k: r.total
           for r in cat.get_table("imv_rw").read().collect()}
    assert got == {5: 1}, got
