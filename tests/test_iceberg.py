"""Iceberg-compatible metadata sink (S10).

Verifies: the pure-Python avro container files are readable by the
INDEPENDENT Java Avro library bundled in the Spark JVM; mirrored
metadata matches the Iceberg v2 spec shapes the reference emits
(IcebergMetadata / IcebergManifestFileMeta / IcebergManifestEntry field
names+ids); and a reader that follows ONLY the Iceberg metadata chain
(version-hint → metadata.json → manifest list → manifests → data
files) reconstructs exactly the rows the engine reads."""

import json
import os

import pytest
from pyspark.sql import functions as F

from paimon_spark import P, Table
from paimon_spark.avro_io import read_avro_file, write_avro_file
from paimon_spark.iceberg import (MANIFEST_LIST_AVRO_SCHEMA, IcebergCompat,
                                  read_iceberg)

ICE_OPT = {"metadata.iceberg.storage": "table-location"}


def _meta(root):
    d = os.path.join(root, "metadata")
    with open(os.path.join(d, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(d, f"v{v}.metadata.json")) as f:
        return v, json.load(f)


def _same_rows(a, b, key):
    return (a.count() == b.count()
            and a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0)


def test_avro_roundtrip_nested(tmp_path):
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": {
                "type": "record", "name": "kv", "fields": [
                    {"name": "key", "type": "int"},
                    {"name": "value", "type": "bytes"}]}}},
        ]}
    recs = [{"a": -(2**40), "s": None, "arr": [{"key": 1, "value": b"\x00\xff"}]},
            {"a": 7, "s": "x☃", "arr": []}]
    p = str(tmp_path / "x.avro")
    write_avro_file(p, schema, recs)
    got_schema, got = read_avro_file(p)
    assert got == recs
    assert got_schema == schema


def test_avro_readable_by_java_avro(spark, tmp_path):
    """The JVM's org.apache.avro (an independent implementation) must
    parse our container files — proves spec conformance, not just
    self-consistency."""
    p = str(tmp_path / "j.avro")
    write_avro_file(p, MANIFEST_LIST_AVRO_SCHEMA, [{
        "manifest_path": "m1.avro", "manifest_length": 123,
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 1,
        "added_files_count": 2, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 100,
        "existing_rows_count": 0, "deleted_rows_count": 0,
        "partitions": [{"contains_null": False, "contains_nan": False,
                        "lower_bound": b"\x01\x00\x00\x00",
                        "upper_bound": b"\x09\x00\x00\x00"}],
    }])
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader.openReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader())
    rows = []
    while reader.hasNext():
        rows.append(reader.next())
    reader.close()
    assert len(rows) == 1
    r = rows[0]
    assert str(r.get("manifest_path")) == "m1.avro"
    assert r.get("manifest_length") == 123
    assert r.get("added_rows_count") == 100
    parts = r.get("partitions")
    assert parts.size() == 1 and not parts.get(0).get("contains_null")


def test_append_mirror_incremental(spark, wh, lineitem):
    t = Table.create(f"{wh}/li", lineitem.schema,
                     partition_keys=["l_returnflag"], spark=spark,
                     options=dict(ICE_OPT))
    half = lineitem.limit(300)
    t.append(half)
    v1, m1 = _meta(t.paths.root)
    assert m1["format-version"] == 2
    assert m1["current-snapshot-id"] == 1
    assert m1["partition-specs"][0]["fields"][0]["transform"] == "identity"
    assert "schema.name-mapping.default" in m1["properties"]
    # spec field ids on the manifest-list schema
    _, rows1 = read_avro_file(m1["snapshots"][0]["manifest-list"])
    assert len(rows1) == 1 and rows1[0]["added_files_count"] > 0

    t.append(lineitem.subtract(half))
    v2, m2 = _meta(t.paths.root)
    assert v2 == v1 + 1 and m2["current-snapshot-id"] == 2
    snap2 = [s for s in m2["snapshots"] if s["snapshot-id"] == 2][0]
    assert snap2["parent-snapshot-id"] == 1
    assert snap2["summary"]["operation"] == "append"
    _, rows2 = read_avro_file(snap2["manifest-list"])
    # incremental: the first commit's manifest row is REUSED verbatim
    assert len(rows2) == 2
    assert rows1[0]["manifest_path"] in [r["manifest_path"] for r in rows2]

    got = read_iceberg(spark, t.paths.root)
    assert _same_rows(got.select(*lineitem.columns),
                      t.read().select(*lineitem.columns), "l_orderkey")


def test_overwrite_rewrites_only_touched_manifests(spark, wh, lineitem):
    t = Table.create(f"{wh}/li", lineitem.schema,
                     partition_keys=["l_returnflag"], spark=spark,
                     options=dict(ICE_OPT))
    t.append(lineitem)
    _, m1 = _meta(t.paths.root)
    _, rows1 = read_avro_file(m1["snapshots"][-1]["manifest-list"])

    repl = (lineitem.filter(F.col("l_returnflag") == "A")
            .withColumn("l_quantity", F.lit(1.0)))
    t.writer().overwrite(repl, dynamic=True)

    _, m2 = _meta(t.paths.root)
    snap = [s for s in m2["snapshots"]
            if s["snapshot-id"] == m2["current-snapshot-id"]][0]
    assert snap["summary"]["operation"] == "overwrite"
    assert int(snap["summary"]["deleted-data-files"]) > 0
    got = read_iceberg(spark, t.paths.root)
    exp = t.read()
    assert _same_rows(got.select(*lineitem.columns),
                      exp.select(*lineitem.columns), "l_orderkey")
    # survivors of the rewritten manifest are status EXISTING (0)
    _, rows2 = read_avro_file(snap["manifest-list"])
    rewritten = [r for r in rows2 if r["existing_files_count"] > 0]
    for r in rewritten:
        _, entries = read_avro_file(r["manifest_path"])
        assert all(e["status"] == 0 for e in entries)


def test_pk_table_mirrors_only_compacted_level(spark, wh):
    rows = [(i, f"u{i % 7}", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, name string, v double")
    t = Table.create(f"{wh}/pk", df.schema, primary_keys=["id"],
                     spark=spark, options={**ICE_OPT, "bucket": "2"})
    t.append(df)
    # level-0 runs are not raw-readable → nothing mirrored yet
    with pytest.raises(ValueError, match="lists no files"):
        read_iceberg(spark, t.paths.root)
    t.compact(full=True)
    got = read_iceberg(spark, t.paths.root)
    assert _same_rows(got.select("id", "name", "v"),
                      t.read().select("id", "name", "v"), "id")
    # upsert + recompact: mirror follows
    up = spark.createDataFrame([(5, "X", -1.0), (200, "new", 2.0)],
                               df.schema)
    t.append(up)
    t.compact(full=True)
    got = read_iceberg(spark, t.paths.root)
    assert got.count() == 101
    assert got.filter("id = 5").select("name").first()[0] == "X"


def test_resync_after_enabling_late(spark, wh):
    df = spark.createDataFrame([(i, str(i)) for i in range(50)],
                               "id int, s string")
    t = Table.create(f"{wh}/plain", df.schema, spark=spark)
    t.append(df.limit(20))
    t.append(df.subtract(df.limit(20)))
    assert not os.path.exists(os.path.join(t.paths.root, "metadata",
                                           "version-hint.text"))
    t.alter(lambda sc: sc.set_option("metadata.iceberg.storage",
                                     "table-location"))
    t.mirror_iceberg()
    got = read_iceberg(spark, t.paths.root)
    assert _same_rows(got, t.read().select("id", "s"), "id")


def test_expiration_trims_mirror_and_tags_become_refs(spark, wh):
    """metadata.json must stay O(retained snapshots), not O(commits):
    paimon snapshot expiration drops the matching iceberg snapshots and
    deletes their manifest-list/manifest files; paimon tags surface as
    iceberg tag refs and pin their snapshot."""
    import glob
    df = spark.createDataFrame([(i, str(i)) for i in range(40)],
                               "id int, s string")
    t = Table.create(f"{wh}/exp", df.schema, spark=spark,
                     options=dict(ICE_OPT))
    for k in range(4):                       # snapshots 1..4
        t.append(df.filter(F.col("id") % 4 == k))
    t.create_tag("keep3", 3)
    t.expire_snapshots(retain_last=1)
    t.append(spark.createDataFrame([(100, "x")], df.schema))  # snapshot 5

    _, m = _meta(t.paths.root)
    ids = {s["snapshot-id"] for s in m["snapshots"]}
    assert 5 in ids and 1 not in ids and 2 not in ids
    assert 3 in ids                          # tag-pinned
    assert m["refs"]["keep3"] == {"snapshot-id": 3, "type": "tag"}
    assert m["refs"]["main"]["snapshot-id"] == 5
    # dropped snapshots' manifest lists are physically gone
    lists = glob.glob(os.path.join(t.paths.root, "metadata", "snap-*.avro"))
    assert len(lists) == len(m["snapshots"])
    # snapshot-log references only retained snapshots
    assert {x["snapshot-id"] for x in m["snapshot-log"]} <= ids
    got = read_iceberg(spark, t.paths.root)
    assert _same_rows(got, t.read().select("id", "s"), "id")
    # orphan cleanup must never eat the mirror
    t.remove_orphan_files()
    assert _same_rows(read_iceberg(spark, t.paths.root),
                      t.read().select("id", "s"), "id")


def test_unsupported_tables_fail_at_create_or_alter(spark, wh):
    """Compat validation happens at CREATE / ALTER time, never
    post-commit — a durable snapshot must not be reported as a failed
    write (a retry would duplicate data)."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    with pytest.raises(ValueError, match="Iceberg-readable"):
        Table.create(f"{wh}/csvt", df.schema, spark=spark,
                     options={**ICE_OPT, "file.format": "csv"})
    with pytest.raises(ValueError, match="blob.columns"):
        Table.create(f"{wh}/blobt",
                     spark.createDataFrame([(1, b"x")],
                                           "id int, img binary").schema,
                     spark=spark, options={**ICE_OPT,
                                           "blob.columns": "img"})
    import pyspark.sql.types as T
    with pytest.raises(ValueError, match="no Iceberg mirror"):
        Table.create(
            f"{wh}/nested", T.StructType([
                T.StructField("id", T.IntegerType()),
                T.StructField("m", T.MapType(T.StringType(),
                                             T.LongType()))]),
            spark=spark, options=dict(ICE_OPT))
    # enabling the mirror by ALTER on an incompatible table also fails
    t = Table.create(f"{wh}/plaincsv", df.schema, spark=spark,
                     options={"file.format": "csv"})
    with pytest.raises(ValueError, match="Iceberg-readable"):
        t.alter(lambda s: s.set_option(
            "metadata.iceberg.storage", "table-location"))


def test_post_commit_mirror_failure_does_not_fail_write(spark, wh,
                                                        monkeypatch):
    """Once the snapshot file is durable, a mirror bug must be logged,
    not raised — and the mirror self-heals on the next commit."""
    import paimon_spark.iceberg as ice
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    t = Table.create(f"{wh}/selfheal", df.schema, spark=spark,
                     options=dict(ICE_OPT))
    boom = {"n": 0}
    real = ice.IcebergCompat.mirror

    def flaky(self, snap, entries):
        boom["n"] += 1
        if boom["n"] == 1:
            raise RuntimeError("injected mirror failure")
        return real(self, snap, entries)

    monkeypatch.setattr(ice.IcebergCompat, "mirror", flaky)
    snap = t.append(df)                 # mirror raises → write still OK
    assert snap.id == 1
    t.append(spark.createDataFrame([(2, "b")], df.schema))
    # second commit resynced the mirror: Iceberg chain sees both rows
    got = read_iceberg(spark, f"{wh}/selfheal")
    assert got.count() == 2


def test_randomized_mirror_stays_consistent(spark, wh):
    """Model-based chaos: a random op sequence (append / dynamic
    overwrite / compact / delete) over an Iceberg-mirrored table must
    keep read_iceberg() == table.read() after EVERY commit — any
    mirror drift (missed removal, double-add, stale manifest reuse)
    surfaces immediately."""
    import random
    rng = random.Random(42)
    df_sch = "k int, part int, v int"
    t = Table.create(
        f"{wh}/chaos",
        spark.createDataFrame([], df_sch).schema,
        partition_keys=["part"], spark=spark, options=dict(ICE_OPT))

    def rand_rows(n):
        return [(rng.randrange(1000), rng.randrange(4), rng.randrange(100))
                for _ in range(n)]

    for step in range(12):
        op = rng.choice(["append", "append", "overwrite", "compact",
                         "delete"])
        if op == "append":
            t.append(spark.createDataFrame(rand_rows(rng.randrange(1, 30)),
                                           df_sch))
        elif op == "overwrite":
            part = rng.randrange(4)
            rows = [(k, part, v) for k, _, v in rand_rows(5)]
            t.writer().overwrite(spark.createDataFrame(rows, df_sch),
                                 dynamic=True)
        elif op == "compact":
            t.compact(full=True)
        else:
            t.delete_where(P.expr(f"v < {rng.randrange(20)}"))
        if t.paths.latest_snapshot() is None:
            continue
        eng = t.read().select("k", "part", "v")
        try:
            ice = read_iceberg(spark, t.paths.root).select("k", "part", "v")
        except ValueError:
            assert eng.count() == 0, f"step {step}: engine has rows, " \
                                     f"iceberg metadata lists no files"
            continue
        assert ice.exceptAll(eng).count() == 0 \
            and eng.exceptAll(ice).count() == 0, f"divergence at step {step}"


def test_schema_evolution_mirrors_new_schema(spark, wh):
    """ADD COLUMN then append: metadata.json gains the new schema-id,
    current-schema-id moves, name mapping covers the new column, and
    old+new files read consistently through the Iceberg chain."""
    from pyspark.sql import types as T
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    t = Table.create(f"{wh}/evo", df1.schema, spark=spark,
                     options=dict(ICE_OPT))
    t.append(df1)
    _, m1 = _meta(t.paths.root)
    t = t.alter(lambda sc: sc.add_column("extra", T.LongType()))
    t.append(spark.createDataFrame([(3, "c", 30)],
                                   "id int, s string, extra long"))
    _, m2 = _meta(t.paths.root)
    assert len(m2["schemas"]) == 2
    assert m2["current-schema-id"] > m1["current-schema-id"]
    cur = [s for s in m2["schemas"]
           if s["schema-id"] == m2["current-schema-id"]][0]
    assert [f["name"] for f in cur["fields"]] == ["id", "s", "extra"]
    # unique field ids across the evolved schema
    ids = [f["id"] for f in cur["fields"]]
    assert len(set(ids)) == 3
    import json as _json
    nm = _json.loads(m2["properties"]["schema.name-mapping.default"])
    assert {e["names"][0] for e in nm} == {"id", "s", "extra"}
    got = read_iceberg(spark, t.paths.root)
    rows = {r.id: (r.s, r.extra) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}


def test_read_iceberg_time_travel(spark, wh):
    """VERSION AS OF through the Iceberg chain: snapshot_id and tag
    refs resolve to their manifest lists."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    t = Table.create(f"{wh}/tt", df.schema, spark=spark,
                     options=dict(ICE_OPT))
    t.append(df)
    t.create_tag("v1", 1)
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id int, s string"))
    assert read_iceberg(spark, t.paths.root).count() == 3
    assert read_iceberg(spark, t.paths.root, snapshot_id=2).count() == 2
    assert read_iceberg(spark, t.paths.root, ref="v1").count() == 1
    with pytest.raises(ValueError, match="no iceberg ref"):
        read_iceberg(spark, t.paths.root, ref="nope")


def test_rollback_invalidates_mirror(spark, wh):
    """rollback rewrites history out of band — a stale mirror would
    keep rolled-back files visible to Iceberg readers. The mirror is
    dropped and the next commit resyncs the full live set."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    t = Table.create(f"{wh}/rb", df.schema, spark=spark,
                     options=dict(ICE_OPT))
    t.append(df)
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    assert read_iceberg(spark, t.paths.root).count() == 2
    t.rollback_to(1)
    assert not os.path.exists(os.path.join(t.paths.root, "metadata",
                                           "version-hint.text"))
    t.append(spark.createDataFrame([(3, "c")], "id int, s string"))
    got = read_iceberg(spark, t.paths.root)
    assert {r.id for r in got.collect()} == {1, 3}
    assert _same_rows(got, t.read().select("id", "s"), "id")


def test_mirror_self_heals_after_missed_commits(spark, wh):
    """If the mirror missed commits (out-of-order callbacks, an
    interrupted writer), the incremental diff would diverge — the next
    mirror detects the gap and resyncs the full live set; a stale
    mirror attempt for an already-mirrored snapshot is a no-op."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    t = Table.create(f"{wh}/heal", df.schema, spark=spark,
                     options=dict(ICE_OPT))
    t.append(df)
    # simulate a missed mirror: commit 2 lands WITHOUT its callback
    t.alter(lambda sc: sc.remove_option("metadata.iceberg.storage"))
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    t = t.alter(lambda sc: sc.set_option("metadata.iceberg.storage",
                                         "table-location"))
    # alter() commits no snapshot; the NEXT data commit sees the gap
    t.append(spark.createDataFrame([(3, "c")], "id int, s string"))
    got = read_iceberg(spark, t.paths.root)
    assert {r.id for r in got.collect()} == {1, 2, 3}
    # stale mirror attempt: replaying an old snapshot is a no-op
    from paimon_spark.iceberg import IcebergCompat
    v_before, _ = _meta(t.paths.root)
    IcebergCompat(t).mirror(t.paths.read_snapshot(1), None)
    v_after, m = _meta(t.paths.root)
    assert v_after == v_before
    assert read_iceberg(spark, t.paths.root).count() == 3


def test_concurrent_writers_mirror_converges(spark, wh):
    """Two writers race the post-commit mirror callback; the stale-skip
    + gap-resync guards mean the mirror may lag mid-race but MUST
    converge to the engine state once a serial commit lands."""
    from concurrent.futures import ThreadPoolExecutor
    df_sch = "id int, s string"
    t = Table.create(f"{wh}/conc",
                     spark.createDataFrame([], df_sch).schema,
                     spark=spark, options=dict(ICE_OPT))

    def writer(tag):
        w = Table.load(t.path, spark)
        for i in range(4):
            w.append(spark.createDataFrame(
                [(tag * 100 + i, f"w{tag}")], df_sch))

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(writer, k) for k in (1, 2)]:
            f.result()
    # serial tail commit: the mirror sees the gap (if any) and resyncs
    t.append(spark.createDataFrame([(999, "tail")], df_sch))
    eng = t.read().select("id", "s")
    ice = read_iceberg(spark, t.paths.root).select("id", "s")
    assert eng.count() == 9
    assert ice.exceptAll(eng).count() == 0 \
        and eng.exceptAll(ice).count() == 0


def test_dv_table_mirrors_position_deletes(spark, wh):
    """Deletion-vector tables mirror as Iceberg v2 position-delete
    files: after DV deletes (including a second delete that merges the
    first file's vector), a reader following ONLY the Iceberg chain
    must see exactly the engine's rows."""
    df = spark.createDataFrame([(i, f"v{i}", i % 3) for i in range(30)],
                               "id int, s string, part int")
    t = Table.create(f"{wh}/dvt", df.schema,
                     partition_keys=["part"], spark=spark,
                     options={**ICE_OPT,
                              "deletion-vectors.enabled": "true"})
    t.append(df)
    assert _same_rows(read_iceberg(spark, t.path), t.read(), "id")

    t.delete_where(P.le("id", 9) & P.ge("id", 5))
    got = read_iceberg(spark, t.path)
    assert _same_rows(got, t.read(), "id")
    assert got.count() == 25
    # second delete hits some already-DV'd files → merged vector, new
    # position-delete file; superseded delete rows must not resurrect
    # or double-delete anything
    t.delete_where(P.le("id", 7))
    got = read_iceberg(spark, t.path)
    assert _same_rows(got, t.read(), "id")
    assert got.count() == 20
    assert {r.id for r in got.collect()} == set(range(10, 30))
    # delete manifests carry content=1 and the delete parquet has the
    # reserved field ids
    import glob
    import pyarrow.parquet as pq
    dels = glob.glob(os.path.join(t.path, "metadata", "delete-*.parquet"))
    assert dels
    sch = pq.read_schema(dels[0])
    assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
    # v2 spec: position deletes are PARTITION-SCOPED — every delete
    # manifest entry must carry the REAL partition values of the data
    # files its rows reference (all-null partitions would make a
    # spec-compliant reader skip the delete file and resurrect rows)
    from paimon_spark.avro_io import read_avro_file
    meta_dir = os.path.join(t.path, "metadata")
    import json as _json
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = f.read().strip()
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = _json.load(f)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, mrows = read_avro_file(cur["manifest-list"])
    checked = 0
    for mrow in mrows:
        if mrow.get("content") != 1:
            continue
        _, entries = read_avro_file(mrow["manifest_path"])
        for e in entries:
            d = e["data_file"]
            assert d["partition"]["part"] is not None
            # the partition value matches every data path in the file
            pdt = pq.read_table(d["file_path"])
            for p in pdt.column("file_path").to_pylist():
                assert f"part={d['partition']['part']}/" in p
            checked += 1
    assert checked >= 2     # deletes spanned multiple partitions


def test_dv_mirror_survives_compaction(spark, wh):
    """Full compaction materializes DV deletes into rewritten files; the
    mirror must drop the old data files (and with them the stale delete
    rows' effect) and still equal the engine read."""
    df = spark.createDataFrame([(i, i * 10) for i in range(20)],
                               "id int, v int")
    t = Table.create(f"{wh}/dvc", df.schema, spark=spark,
                     options={**ICE_OPT,
                              "deletion-vectors.enabled": "true"})
    t.append(df)
    t.delete_where(P.le("id", 4))
    assert _same_rows(read_iceberg(spark, t.path), t.read(), "id")
    t.compact(full=True)
    got = read_iceberg(spark, t.path)
    assert _same_rows(got, t.read(), "id")
    assert got.count() == 15
