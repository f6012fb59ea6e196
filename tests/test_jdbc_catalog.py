"""JdbcCatalog: catalog metadata in a SQL database (sqlite3 standing in
for the JDBC RDBMS), data in the warehouse; atomic create/rename +
catalog locks (ref: paimon-core/.../jdbc/JdbcCatalog.java,
JdbcCatalogLock.java)."""

import threading

import pytest
from pyspark.sql import types as T

from paimon_spark.jdbc_catalog import JdbcCatalog

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType())])


def _cat(spark, wh):
    return JdbcCatalog(f"{wh}/meta.db", f"{wh}/warehouse", spark)


def test_databases_and_tables(spark, wh):
    c = _cat(spark, wh)
    assert c.list_databases() == ["default"]
    c.create_database("prod")
    t = c.create_table("prod.kv", KV, primary_keys=["k"],
                       options={"bucket": "1"})
    t.append(spark.createDataFrame([(1, "a")], KV))
    assert c.list_tables("prod") == ["kv"]
    assert c.table_exists("prod.kv") and not c.table_exists("prod.nope")
    # a second catalog instance over the same DB sees everything
    c2 = _cat(spark, wh)
    assert c2.get_table("prod.kv").read().count() == 1
    with pytest.raises(FileExistsError):
        c2.create_table("prod.kv", KV)
    with pytest.raises(ValueError, match="not empty"):
        c.drop_database("prod")


def test_atomic_rename_keeps_data(spark, wh):
    c = _cat(spark, wh)
    t = c.create_table("kv", KV)
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], KV))
    c.create_database("archive")
    c.rename_table("kv", "archive.kv_old")
    assert not c.table_exists("kv")
    assert c.get_table("archive.kv_old").read().count() == 2
    with pytest.raises(FileNotFoundError):
        c.rename_table("kv", "kv2")


def test_sql_surface_works_on_jdbc_catalog(spark, wh):
    c = _cat(spark, wh)
    c.create_table("s", KV, primary_keys=["k"], options={"bucket": "1"})
    c.sql("INSERT INTO s VALUES (1, 'a'), (2, 'b')")
    c.sql("UPDATE s SET v = 'B' WHERE k = 2")
    got = {r.k: r.v for r in c.sql("SELECT * FROM s").collect()}
    assert got == {1: "a", 2: "B"}


def test_catalog_lock_mutual_exclusion(spark, wh):
    c = _cat(spark, wh)
    order = []

    def worker(tag):
        with c.lock("commit:t1", timeout_s=10):
            order.append(f"{tag}-in")
            import time
            time.sleep(0.2)
            order.append(f"{tag}-out")

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    # strictly serialized: every -in is followed by its own -out
    for i in range(0, 6, 2):
        assert order[i].endswith("-in") and order[i + 1].endswith("-out")
        assert order[i].split("-")[0] == order[i + 1].split("-")[0]


def test_stale_lock_is_stolen(spark, wh):
    c = _cat(spark, wh)
    lk = c.lock("zombie", timeout_s=0.3)
    lk.__enter__()                 # held, never released (crashed holder)
    import time
    time.sleep(0.4)
    with c.lock("zombie", timeout_s=1.0):
        pass                       # stale row stolen, no deadlock


def test_concurrent_commit_arbitration_under_catalog_lock(spark, wh):
    """r12 (VERDICT r11 #8): writers loading the table through the JDBC
    catalog commit concurrently — half of them additionally wrapping
    the commit in the catalog lock (the hook for stores without atomic
    put-if-absent). Either way every commit must win exactly once:
    gap-free snapshot chain, replayed model equals the table."""
    import random
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(61)
    c = _cat(spark, wh)
    c.create_database("conc")
    c.create_table("conc.t", T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType())]),
        primary_keys=["k"], options={"bucket": "2"})
    batches = [[{rng.randint(0, 15): rng.randint(0, 999)
                 for _ in range(rng.randint(1, 4))} for _ in range(2)]
               for _ in range(4)]

    def writer(i):
        tt = c.get_table("conc.t")
        for rows in batches[i]:
            df = spark.createDataFrame(list(rows.items()), "k long, v long")
            if i % 2 == 0:
                with c.lock("conc.t.commit"):
                    tt.append(df)
            else:
                tt.append(df)

    with ThreadPoolExecutor(max_workers=4) as pool:
        for f in [pool.submit(writer, i) for i in range(4)]:
            f.result()

    t = c.get_table("conc.t")
    latest = t.paths.latest_snapshot_id()
    assert latest == 8
    model: dict[int, int] = {}
    for sid in range(1, latest + 1):
        assert t.paths.read_snapshot(sid) is not None
        for r in t.read_incremental(sid - 1, sid,
                                    with_kind=False).collect():
            model[r.k] = r.v
    got = {r.k: r.v for r in t.read().collect()}
    assert got == model
