"""Seeded thread-race models of the CATALOG surface (VERDICT r12 #4).

r12 reproduced a real TOCTOU in racing CreateTable (both racers won);
the fix made directory creation / rename(2) the atomic claim. This
family points the proven model approach at that layer: seeded thread
fuzzers interleave create / drop / rename / create-again on a small
namespace across the FS, JDBC, and REST catalogs (ref: the reference's
catalog contract — CatalogTestBase concurrent expectations; exactly one
winner per create, renames atomic, losers get the conflict error).

Invariants checked:
  1. single-winner: N racing creates of one identifier → exactly one
     "ok", every loser gets FileExistsError (never two oks, never a
     foreign exception).
  2. typed failures only: every op either succeeds or raises
     FileExistsError / FileNotFoundError — a race must never surface
     as a stack-trace-shaped internal error.
  3. loadable state: after the threads join, every identifier the
     catalog still lists/has loads with a parseable schema (no
     half-created table, no schema-0.json torn between two writers).
"""

import random
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import types as T

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType())])


class _FsAdapter:
    def __init__(self, wh, spark):
        from paimon_spark.catalog import Catalog
        self.c = Catalog(f"{wh}/fs_race", spark)

    def create(self, name):
        self.c.create_table(name, KV, primary_keys=["k"],
                            options={"bucket": "1"})

    def drop(self, name):
        self.c.drop_table(name)

    def rename(self, a, b):
        self.c.rename_table(a, b)

    def names(self):
        return self.c.list_tables()

    def load(self, name):
        return self.c.get_table(name)


class _JdbcAdapter:
    def __init__(self, wh, spark):
        import os
        from paimon_spark.jdbc_catalog import JdbcCatalog
        os.makedirs(f"{wh}/jdbc_race", exist_ok=True)
        self.c = JdbcCatalog(f"{wh}/jdbc_race/meta.db",
                             f"{wh}/jdbc_race/wh", spark=spark)
        self.c.create_database("db")

    def create(self, name):
        self.c.create_table(f"db.{name}", KV, primary_keys=["k"],
                            options={"bucket": "1"})

    def drop(self, name):
        self.c.drop_table(f"db.{name}")

    def rename(self, a, b):
        self.c.rename_table(f"db.{a}", f"db.{b}")

    def names(self):
        return self.c.list_tables("db")

    def load(self, name):
        return self.c.get_table(f"db.{name}")


class _RestAdapter:
    def __init__(self, wh, spark):
        from paimon_spark.rest_catalog import (RESTCatalog,
                                               RESTCatalogServer)
        self.server = RESTCatalogServer(f"{wh}/rest_race", token="s")
        self.server.start()
        self.c = RESTCatalog(self.server.uri, token="s", spark=spark)
        self.c.create_database("db")

    def close(self):
        self.server.stop()

    def create(self, name):
        self.c.create_table(f"db.{name}", KV, primary_keys=["k"],
                            options={"bucket": "1"})

    def drop(self, name):
        self.c.drop_table(f"db.{name}")

    def rename(self, a, b):
        self.c.rename_table(f"db.{a}", f"db.{b}")

    def names(self):
        return self.c.list_tables("db")

    def load(self, name):
        return self.c.get_table(f"db.{name}")


def _mk_adapter(kind, wh, spark):
    return {"fs": _FsAdapter, "jdbc": _JdbcAdapter,
            "rest": _RestAdapter}[kind](wh, spark)


@pytest.mark.parametrize("kind", ["fs", "jdbc", "rest"])
def test_racing_create_single_winner(kind, wh, spark):
    """Invariant 1 on every backend: the r12 bug class (both creates
    passed an exists() check) must stay dead."""
    ad = _mk_adapter(kind, wh, spark)
    try:
        for rnd in range(3):                 # fresh name each round
            name = f"t{rnd}"

            def racer(_i):
                try:
                    ad.create(name)
                    return "ok"
                except FileExistsError:
                    return "conflict"

            with ThreadPoolExecutor(max_workers=6) as pool:
                res = sorted(pool.map(racer, range(6)))
            assert res == ["conflict"] * 5 + ["ok"], (kind, rnd, res)
            assert ad.load(name).schema.primary_keys == ["k"]
    finally:
        if hasattr(ad, "close"):
            ad.close()


@pytest.mark.parametrize("kind", ["fs", "jdbc", "rest"])
def test_seeded_lifecycle_fuzz(kind, wh, spark):
    """Invariants 2+3 under a seeded interleaving of create / drop /
    rename / create-again over a 3-name namespace × 4 threads."""
    ad = _mk_adapter(kind, wh, spark)
    names = ["a", "b", "c"]
    try:
        def worker(seed):
            rnd = random.Random(seed)
            log = []
            for _step in range(12):
                op = rnd.choice(["create", "create", "drop", "rename"])
                try:
                    if op == "create":
                        ad.create(rnd.choice(names))
                    elif op == "drop":
                        ad.drop(rnd.choice(names))
                    else:
                        src = rnd.choice(names)
                        dst = rnd.choice([n for n in names if n != src])
                        ad.rename(src, dst)
                    log.append((op, "ok"))
                except (FileExistsError, FileNotFoundError) as e:
                    log.append((op, type(e).__name__))
                except Exception as e:        # noqa: BLE001 — the check
                    log.append((op, f"UNEXPECTED:{type(e).__name__}:{e}"))
            return log

        # 20 seeds (VERDICT r13 #10: keep the family breeding now that
        # create is atomic) on an 8-thread pool — more concurrent
        # rename-vs-create-vs-drop interleavings per run, same model
        with ThreadPoolExecutor(max_workers=8) as pool:
            logs = list(pool.map(worker, [101 * i for i in range(1, 21)]))
        # invariant 2: typed failures only
        bad = [ent for lg in logs for ent in lg
               if ent[1].startswith("UNEXPECTED")]
        assert not bad, bad
        # invariant 3: everything still listed is loadable
        for n in ad.names():
            t = ad.load(n)
            assert t.schema.primary_keys == ["k"], (kind, n)
    finally:
        if hasattr(ad, "close"):
            ad.close()
