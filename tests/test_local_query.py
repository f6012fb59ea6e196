"""LocalTableQuery: in-process point lookups without a Spark job
(ref: table/query/LocalTableQuery.java + LookupLevels)."""

import time

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import LocalTableQuery, P, Table

SCH = T.StructType([T.StructField("id", T.LongType()),
                    T.StructField("grp", T.StringType()),
                    T.StructField("v", T.DoubleType())])


def _table(spark, wh, name="t", partition_keys=None, options=None,
           primary_keys=("id",)):
    return Table.create(f"{wh}/{name}", SCH,
                        partition_keys=list(partition_keys or []),
                        primary_keys=list(primary_keys),
                        options={"bucket": "4", **(options or {})},
                        spark=spark)


def test_lookup_matches_spark_read(spark, wh):
    t = _table(spark, wh)
    rows = [(i, f"g{i % 3}", float(i)) for i in range(200)]
    t.append(spark.createDataFrame(rows, SCH))
    t.append(spark.createDataFrame([(7, "gX", -7.0)], SCH))   # upsert
    t.delete_where(P.eq("id", 11))
    q = LocalTableQuery(t)
    assert q.lookup({"id": 7}) == {"id": 7, "grp": "gX", "v": -7.0}
    assert q.lookup({"id": 11}) is None                        # deleted
    assert q.lookup({"id": 999}) is None                       # absent
    # parity with the Spark read path for a sample of keys
    for k in (0, 7, 11, 42, 199):
        spark_rows = t.read(P.eq("id", k)).collect()
        local = q.lookup({"id": k})
        if local is None:
            assert spark_rows == []
        else:
            assert len(spark_rows) == 1
            assert local == spark_rows[0].asDict()


def test_lookup_is_cached_and_refreshes_on_commit(spark, wh):
    t = _table(spark, wh)
    t.append(spark.createDataFrame([(i, "g", float(i))
                                    for i in range(500)], SCH))
    q = LocalTableQuery(t)
    q.lookup({"id": 1})                       # pay the bucket load once
    t0 = time.perf_counter()
    for i in range(200):
        q.lookup({"id": i})
    warm = time.perf_counter() - t0
    assert warm < 0.5                         # dict-get latency, no jobs
    # a new commit invalidates: lookups see the new value
    t.append(spark.createDataFrame([(1, "g", 111.0)], SCH))
    assert q.lookup({"id": 1})["v"] == 111.0


def test_partitioned_lookup_touches_one_bucket(spark, wh):
    t = _table(spark, wh, partition_keys=["grp"],
               primary_keys=("grp", "id"))
    t.append(spark.createDataFrame(
        [(i, f"p{i % 4}", float(i)) for i in range(100)], SCH))
    q = LocalTableQuery(t)
    assert q.lookup({"grp": "p1", "id": 5})["v"] == 5.0
    assert q.lookup({"grp": "p0", "id": 5}) is None    # wrong partition
    # only the queried (partition, bucket) cells are materialized
    assert len(q._buckets) <= 2


def test_first_row_engine_keeps_first(spark, wh):
    t = _table(spark, wh, options={"merge-engine": "first-row"})
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCH))
    t.append(spark.createDataFrame([(1, "b", 2.0)], SCH))
    q = LocalTableQuery(t)
    assert q.lookup({"id": 1})["grp"] == "a"


def test_unsupported_shapes_rejected(spark, wh):
    ap = Table.create(f"{wh}/ap", SCH, spark=spark)
    with pytest.raises(ValueError, match="primary-key"):
        LocalTableQuery(ap)
    dyn = Table.create(f"{wh}/dyn", SCH, primary_keys=["id"],
                       options={"bucket": "-1"}, spark=spark)
    with pytest.raises(ValueError, match="fixed bucket"):
        LocalTableQuery(dyn)
    t = _table(spark, wh, "pk2")
    with pytest.raises(ValueError, match="missing"):
        LocalTableQuery(t).lookup({})


def test_kv_query_service_shards_and_serves(spark, wh):
    """HTTP lookup service ≈ KvQueryServer/KvQueryClient: shard i of n
    owns buckets with bucket % n == i; the client routes each key to
    its owner; mis-routed requests are rejected (421)."""
    import json as _json
    from urllib.error import HTTPError
    from urllib.request import urlopen
    from paimon_spark.service import KvQueryClient, serve_table
    t = _table(spark, wh, "srv")
    t.append(spark.createDataFrame(
        [(i, f"g{i}", float(i)) for i in range(50)], SCH))
    servers, addrs = serve_table(t, num_servers=2)
    try:
        client = KvQueryClient(t, addrs)
        for k in (0, 7, 13, 49):
            assert client.lookup({"id": k})["v"] == float(k)
        assert client.lookup({"id": 999}) is None
        # a request sent to the WRONG shard is rejected with the owner id
        from paimon_spark.query import LocalTableQuery
        router = LocalTableQuery(t)
        key = {"id": 7}
        owner = router._bucket_of(key) % 2
        try:
            urlopen(f"{addrs[1 - owner]}/lookup",
                    data=_json.dumps(key).encode(), timeout=30)
            raise AssertionError("wrong shard accepted the request")
        except HTTPError as e:
            assert e.code == 421
            assert _json.loads(e.read())["owner"] == owner
        # upserts are visible after the snapshot advances
        t.append(spark.createDataFrame([(7, "new", -1.0)], SCH))
        assert client.lookup({"id": 7})["v"] == -1.0
    finally:
        for s in servers:
            s.stop()


def test_fat_bucket_served_without_materialization(spark, wh):
    """A bucket larger than max_bucket_rows must never materialize into
    the cache; lookups route through per-lookup pyarrow predicate-
    pushdown reads and still return correct merged rows (r5 verdict #4:
    the reference bounds this with disk-backed LookupLevels)."""
    from paimon_spark.query import _TOO_BIG
    t = _table(spark, wh, "fat", options={"bucket": "1"})
    t.append(spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(5000)], SCH))
    t.append(spark.createDataFrame([(7, "gX", -7.0)], SCH))    # upsert
    t.delete_where(P.eq("id", 11))
    q = LocalTableQuery(t, max_bucket_rows=1000)
    assert q.lookup({"id": 7}) == {"id": 7, "grp": "gX", "v": -7.0}
    assert q.lookup({"id": 11}) is None                        # deleted
    assert q.lookup({"id": 4999}) == {"id": 4999, "grp": "g1", "v": 4999.0}
    assert q.lookup({"id": 99999}) is None                     # absent
    # the cache holds only the sentinel, not 5k rows
    assert all(v is _TOO_BIG for v in q._buckets.values())


def test_bucket_cache_is_lru_bounded(spark, wh):
    """At most max_cached_buckets buckets stay materialized; the least
    recently used one is evicted and transparently reloaded on reuse."""
    t = _table(spark, wh, "lru", options={"bucket": "8"})
    t.append(spark.createDataFrame(
        [(i, "g", float(i)) for i in range(400)], SCH))
    q = LocalTableQuery(t, max_cached_buckets=2)
    seen = {}
    for i in range(40):
        r = q.lookup({"id": i})
        assert r is not None and r["v"] == float(i)
        seen[i] = r
    assert len(q._buckets) <= 2
    # evicted buckets still serve correctly on return visits
    for i in (0, 1, 2, 3, 39):
        assert q.lookup({"id": i}) == seen[i]
