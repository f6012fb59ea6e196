"""Object tables: read-only metadata index over a directory of
unstructured objects (ref: paimon-core/.../table/object/ObjectTable.java
— SCHEMA path/name/length/mtime/atime/owner, ReadonlyTable)."""

import os
import time

from paimon_spark import Catalog, P
from paimon_spark.format_table import ObjectTable


def _mk_objects(root):
    os.makedirs(os.path.join(root, "img/train"), exist_ok=True)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    files = {
        "top.bin": b"x" * 10,
        "img/a.jpg": b"j" * 100,
        "img/train/b.jpg": b"j" * 200,
        "img/train/c.png": b"p" * 300,
        "audio/d.wav": b"w" * 400,
    }
    for rel, data in files.items():
        with open(os.path.join(root, rel), "wb") as f:
            f.write(data)
    return files


def test_object_table_lists_recursively(spark, tmp_path):
    root = str(tmp_path / "objs")
    files = _mk_objects(root)
    t = ObjectTable(root, spark)
    rows = {r.path: r for r in t.read().collect()}
    assert set(rows) == set(files)
    for rel, data in files.items():
        r = rows[rel]
        assert r.length == len(data)
        assert r.name == os.path.basename(rel)
        assert abs(r.mtime / 1000 - time.time()) < 300
    # predicate + projection work through the usual surface
    jpgs = t.read(P.expr("name LIKE '%.jpg'"), projection=["path", "length"])
    assert sorted(r.path for r in jpgs.collect()) == ["img/a.jpg",
                                                      "img/train/b.jpg"]


def test_object_table_in_catalog_and_sql(spark, tmp_path, wh):
    root = str(tmp_path / "objs2")
    _mk_objects(root)
    cat = Catalog(wh, spark)
    cat.sql(f"""CREATE TABLE media TBLPROPERTIES (
        'type' = 'object-table', 'object-location' = '{root}')""")
    assert "media" in cat.list_tables()
    t = cat.get_table("media")
    assert isinstance(t, ObjectTable)
    got = cat.sql("""SELECT count(*) AS n, sum(length) AS bytes
                     FROM media WHERE name LIKE '%.jpg'""").first()
    assert got.n == 2 and got.bytes == 300
    cat.drop_table("media")
    assert "media" not in cat.list_tables()


def test_object_table_empty_location(spark, tmp_path):
    root = str(tmp_path / "empty")
    os.makedirs(root)
    assert ObjectTable(root, spark).read().count() == 0


def test_system_views_buckets_indexes_aggfields(spark, wh):
    """r4 system views: $buckets, $aggregation_fields, $table_indexes,
    $row_tracking (ref: table/system/BucketsTable.java,
    AggregationFieldsTable.java, TableIndexesTable.java,
    RowTrackingTable.java)."""
    from pyspark.sql import types as T
    from paimon_spark import Table
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/sys_pk", sch, primary_keys=["id"],
                     options={"bucket": "2", "merge-engine": "aggregation",
                              "fields.v.aggregate-function": "sum"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, 1) for i in range(20)], sch))
    b = t.buckets_df().collect()
    assert {r.bucket for r in b} <= {0, 1}
    assert sum(r.record_count for r in b) == 20
    a = {r.field_name: r.function for r in t.aggregation_fields_df().collect()}
    assert a["v"] == "sum" and a["id"] is None
    views = t.register_views("sys_pk", system_tables=True)
    assert "sys_pk__buckets" in views
    assert spark.sql("SELECT sum(record_count) AS n FROM sys_pk__buckets") \
        .first().n == 20

    # row tracking view on an append table
    t2 = Table.create(f"{wh}/sys_app", sch,
                      options={"row-tracking.enabled": "true"}, spark=spark)
    t2.append(spark.createDataFrame([(1, 1), (2, 2)], sch))
    rt = t2.row_tracking_df()
    assert "_ROW_ID" in rt.columns and rt.count() == 2

    # table indexes view surfaces bloom sidecars
    t3 = Table.create(f"{wh}/sys_idx", sch,
                      options={"file-index.bloom-filter.columns": "id"},
                      spark=spark)
    t3.append(spark.createDataFrame([(i, i) for i in range(10)], sch))
    ix = t3.table_indexes_df().collect()
    assert ix and all(r.index_type == "FILE_INDEX" for r in ix)
