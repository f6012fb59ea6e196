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
