"""Row lineage (`row-tracking.enabled`): stable _ROW_ID across appends,
compaction, COW deletes/updates, and DV deletes.

(ref: Iceberg-v3-style first-row-id assignment; Paimon row tracking —
 ids are assigned per file at commit and materialized into files on
 rewrite so no layout change ever reassigns them.)
"""

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType())])


def _mk(spark, wh, extra=None):
    opts = {"row-tracking.enabled": "true", "target-file-size": "4096"}
    opts.update(extra or {})
    t = Table.create(f"{wh}/t", SCHEMA, options=opts, spark=spark)
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(100)], SCHEMA)
             .coalesce(2))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(100, 150)],
                                   SCHEMA).coalesce(1))
    return t


def _ids(t, pred=None):
    return {r.k: r._ROW_ID for r in t.read_with_lineage(pred).collect()}


def test_ids_unique_and_dense(spark, wh):
    t = _mk(spark, wh)
    ids = _ids(t)
    assert len(ids) == 150
    assert sorted(ids.values()) == list(range(150))
    assert t.paths.latest_snapshot().next_row_id == 150


def test_ids_survive_compaction(spark, wh):
    t = _mk(spark, wh)
    before = _ids(t)
    t.compact()
    assert _ids(t) == before
    # and survive a second compaction of materialized files
    t.append(spark.createDataFrame([(200, "c")], SCHEMA))
    t.compact()
    after = _ids(t)
    assert {k: v for k, v in after.items() if k < 150} == before
    assert after[200] == 150


def test_ids_survive_cow_delete_and_update(spark, wh):
    t = _mk(spark, wh)
    before = _ids(t)
    t.delete_where(P.lt("k", 10))
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if k >= 10}
    t.update_where(P.eq("k", 20), {"v": "updated"})
    after2 = _ids(t)
    assert after2 == after
    row = t.read_with_lineage(P.eq("k", 20)).collect()[0]
    assert row.v == "updated" and row._ROW_ID == before[20]


def test_ids_survive_dv_delete(spark, wh):
    t = _mk(spark, wh, {"deletion-vectors.enabled": "true"})
    before = _ids(t)
    t.delete_where(P.between("k", 50, 59))
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if not 50 <= k <= 59}


def test_plain_read_unchanged(spark, wh):
    t = _mk(spark, wh)
    t.compact()   # files now physically carry _ROW_ID
    df = t.read()
    assert df.columns == ["k", "v"]
    assert df.count() == 150
