"""REST catalog: protocol client against the reference-shape local
server (ref: paimon-core/.../rest/RESTCatalog.java, paimon-api/.../rest/
ResourcePaths.java + requests/responses DTOs, auth/BearTokenAuthProvider).
Metadata over HTTP; data access binds to the returned table path."""

import json
import urllib.request

import pytest
from pyspark.sql import types as T

from paimon_spark.rest_catalog import RESTCatalog, RESTCatalogServer

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType())])


@pytest.fixture()
def server(wh):
    s = RESTCatalogServer(f"{wh}/rest_wh", token="sekret")
    s.start()
    yield s
    s.stop()


def _cat(server, spark):
    return RESTCatalog(server.uri, token="sekret", spark=spark)


def test_config_and_database_lifecycle(server, spark):
    c = _cat(server, spark)
    assert c.prefix == "paimon" and c.warehouse
    c.create_database("sales", {"owner": "team-a"})
    assert "sales" in c.list_databases()
    assert c.get_database("sales")["options"] == {"owner": "team-a"}
    with pytest.raises(FileExistsError):
        c.create_database("sales")
    c.drop_database("sales")
    assert "sales" not in c.list_databases()
    with pytest.raises(FileNotFoundError):
        c.get_database("sales")


def test_table_lifecycle_and_data_path(server, spark):
    """Metadata via REST; reads/writes against the returned path — the
    reference's metadata/data split."""
    c = _cat(server, spark)
    t = c.create_table("sales.orders", KV, primary_keys=["k"],
                       options={"bucket": "2"})
    assert c.list_tables("sales") == ["orders"]
    assert c.table_exists("sales.orders")
    # data ops on the handed-out table work end to end
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], KV))
    t.append(spark.createDataFrame([(2, "B")], KV))
    t2 = c.get_table("sales.orders")
    got = sorted((r.k, r.v) for r in t2.read().collect())
    assert got == [(1, "a"), (2, "B")]
    # schema travels over the wire
    assert t2.schema.primary_keys == ["k"]
    with pytest.raises(FileExistsError):
        c.create_table("sales.orders", KV)
    c.rename_table("sales.orders", "sales.orders_v2")
    assert c.list_tables("sales") == ["orders_v2"]
    assert c.get_table("sales.orders_v2").read().count() == 2
    c.drop_table("sales.orders_v2")
    assert not c.table_exists("sales.orders_v2")


def test_bare_names_use_default_database(server, spark):
    c = _cat(server, spark)
    c.create_table("plain", KV)
    assert "default" in c.list_databases()
    assert c.list_tables("default") == ["plain"]
    assert c.table_exists("plain")


def test_bearer_auth_enforced(server, spark):
    with pytest.raises(PermissionError):
        RESTCatalog(server.uri, token="wrong", spark=spark)
    with pytest.raises(PermissionError):
        RESTCatalog(server.uri, token=None, spark=spark)


def test_wire_shapes_match_reference_dtos(server, spark):
    """Raw HTTP: field names follow the reference's response DTOs
    (ConfigResponse, ListDatabasesResponse, GetTableResponse,
    ErrorResponse)."""
    c = _cat(server, spark)
    c.create_table("w.t1", KV)

    def raw(path):
        req = urllib.request.Request(
            server.uri + path,
            headers={"Authorization": "Bearer sekret"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    st, cfg = raw("/v1/config")
    assert st == 200 and set(cfg) == {"defaults", "overrides"}
    st, dbs = raw("/v1/paimon/databases")
    assert st == 200 and "databases" in dbs and "nextPageToken" in dbs
    st, tbl = raw("/v1/paimon/databases/w/tables/t1")
    assert st == 200
    assert {"id", "database", "name", "path", "isExternal", "schemaId",
            "schema"} <= set(tbl)
    st, err = raw("/v1/paimon/databases/w/tables/nope")
    assert st == 404
    assert {"message", "resourceType", "resourceName", "code"} \
        <= set(err)
    assert err["code"] == 404


def test_concurrent_commit_arbitration_via_rest(server, spark):
    """r12 (VERDICT r11 #8): N writers load the SAME table through the
    REST catalog and commit concurrently — the commit protocol (atomic
    link(2) put-if-absent + retry) must arbitrate single winners:
    every commit lands, snapshot ids are a gap-free 1..N chain, and the
    merged state equals the model replayed in snapshot order."""
    import random
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(53)
    c = _cat(server, spark)
    c.create_database("conc")
    c.create_table("conc.t", T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType())]),
        primary_keys=["k"], options={"bucket": "2"})
    sch = "k long, v long"
    batches = [[{rng.randint(0, 15): rng.randint(0, 999)
                 for _ in range(rng.randint(1, 4))} for _ in range(2)]
               for _ in range(4)]

    def writer(i):
        tt = c.get_table("conc.t")          #independent handle via the catalog
        for rows in batches[i]:
            tt.append(spark.createDataFrame(list(rows.items()), sch))

    with ThreadPoolExecutor(max_workers=4) as pool:
        for f in [pool.submit(writer, i) for i in range(4)]:
            f.result()

    t = c.get_table("conc.t")
    latest = t.paths.latest_snapshot_id()
    assert latest == 8                       # every commit won exactly once
    # gap-free chain, every snapshot readable
    for sid in range(1, latest + 1):
        assert t.paths.read_snapshot(sid) is not None
    # replay the model in COMMIT order: each snapshot's delta rows
    # applied last-write-wins must reproduce the table
    model: dict[int, int] = {}
    for sid in range(1, latest + 1):
        for r in t.read_incremental(sid - 1, sid,
                                    with_kind=False).collect():
            model[r.k] = r.v
    got = {r.k: r.v for r in t.read().collect()}
    assert got == model


def test_concurrent_create_single_winner_via_rest(server, spark):
    """Two racing CreateTable calls for the same identifier: exactly
    one wins, the loser gets the reference's 409-shaped conflict, and
    the winner's schema is the one readable afterwards."""
    from concurrent.futures import ThreadPoolExecutor

    c = _cat(server, spark)
    c.create_database("mk")
    sch = T.StructType([T.StructField("k", T.LongType())])
    results = []

    def mk(i):
        try:
            c.create_table("mk.t", sch)
            return "ok"
        except FileExistsError:
            return "conflict"

    with ThreadPoolExecutor(max_workers=2) as pool:
        results = [f.result() for f in
                   [pool.submit(mk, i) for i in range(2)]]
    assert sorted(results) == ["conflict", "ok"], results
    assert c.table_exists("mk.t")
