"""BLOB columns: binary payloads externalized to blob/ files with
inline (file, offset, length) descriptors (ref: paimon-api BlobType
since 1.4, paimon-core blob/ — blobs live outside columnar files so
scans that skip them read only descriptors and compaction never copies
blob bytes)."""

import glob
import os

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import Table
from paimon_spark.functions.blob import remove_orphan_blobs

SCH = T.StructType([T.StructField("id", T.LongType()),
                    T.StructField("meta", T.StringType()),
                    T.StructField("img", T.BinaryType())])


def _payload(i):
    return bytes([i % 256]) * (10000 + i)


def test_blob_roundtrip_and_layout(spark, wh):
    t = Table.create(f"{wh}/blobs", SCH,
                     options={"blob.columns": "img"}, spark=spark)
    rows = [(i, f"m{i}", _payload(i)) for i in range(20)] + \
        [(99, "null-img", None)]
    t.append(spark.createDataFrame(rows, SCH))

    # bytes round-trip exactly; NULL stays NULL
    got = {r.id: r.img for r in t.read().collect()}
    assert got[99] is None
    for i in range(20):
        assert got[i] == _payload(i)

    # physical layout: descriptors in parquet, payloads in blob/
    blob_files = glob.glob(os.path.join(t.paths.root, "blob", "*.blob"))
    assert blob_files
    desc = t.read(blob_as_descriptor=True)
    d = desc.schema["img"].dataType
    assert [f.name for f in d.fields] == ["file", "offset", "length"]
    total = desc.agg(F.sum("img.length")).first()[0]
    assert total == sum(len(_payload(i)) for i in range(20))
    # the parquet files themselves carry no payload bytes
    data_bytes = sum(os.path.getsize(p) for p in glob.glob(
        os.path.join(t.paths.root, "**", "*.parquet"), recursive=True)
        if "manifest" not in p)
    assert data_bytes < sum(len(_payload(i)) for i in range(20))


def test_blob_compaction_does_not_copy_bytes(spark, wh):
    t = Table.create(f"{wh}/blobc", SCH, primary_keys=["id"],
                     options={"bucket": "1", "blob.columns": "img"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [(i, "a", _payload(i)) for i in range(10)], SCH))
    t.append(spark.createDataFrame(
        [(i, "b", _payload(i + 50)) for i in range(5, 15)], SCH))
    before = sorted(glob.glob(os.path.join(t.paths.root, "blob", "*")))
    t.compact(full=True)
    after = sorted(glob.glob(os.path.join(t.paths.root, "blob", "*")))
    assert before == after            # descriptors rewrote, bytes did not
    got = {r.id: r.img for r in t.read().collect()}
    assert len(got) == 15
    assert got[7] == _payload(57) and got[2] == _payload(2)


def test_blob_orphan_cleanup(spark, wh):
    t = Table.create(f"{wh}/blobo", SCH,
                     options={"blob.columns": "img",
                              "snapshot.num-retained.min": "1",
                              "snapshot.num-retained.max": "1"},
                     spark=spark)
    t.append(spark.createDataFrame([(1, "x", _payload(1))], SCH))
    t.writer().overwrite(
        spark.createDataFrame([(2, "y", _payload(2))], SCH), dynamic=False)
    # old snapshot auto-expired; its blob file is now orphaned
    assert len(os.listdir(os.path.join(t.paths.root, "blob"))) == 2
    removed = remove_orphan_blobs(t)
    assert removed == 1
    assert {r.img for r in t.read().collect()} == {_payload(2)}
    t.remove_orphan_files()           # must NOT touch live blob files
    assert t.read().first().img == _payload(2)


def test_blob_option_validation(spark, wh):
    with pytest.raises(ValueError, match="must be BINARY"):
        t = Table.create(f"{wh}/badblob", SCH,
                         options={"blob.columns": "meta"}, spark=spark)
        t.append(spark.createDataFrame([(1, "x", b"")], SCH))


def test_blob_rejects_datasource_write(spark, wh):
    """df.write.format('paimon') would inline payloads instead of
    externalizing them — rejected loudly."""
    from paimon_spark.streaming.datasource import register
    register(spark)
    t = Table.create(f"{wh}/blobds", SCH,
                     options={"blob.columns": "img"}, spark=spark)
    df = spark.createDataFrame([(1, "x", b"\x00" * 10)], SCH)
    with pytest.raises(Exception, match="blob"):
        df.write.format("paimon").option("path", t.path) \
            .mode("append").save()


def test_python_datasource_refuses_blob_tables(spark, wh):
    """format('paimon') has no blob materialize step — reads refuse
    loudly instead of emitting descriptor structs as payloads (r8)."""
    import pytest
    from pyspark.sql import types as T
    from paimon_spark import Table
    from paimon_spark.streaming.datasource import register
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("payload", T.BinaryType())])
    t = Table.create(f"{wh}/blobguard", sch,
                     options={"blob.columns": "payload"}, spark=spark)
    t.append(spark.createDataFrame([(1, bytearray(b"xx"))], sch))
    assert {r.k for r in t.read().collect()} == {1}       # engine path fine
    register(spark)
    with pytest.raises(Exception, match="blob"):
        (spark.read.format("paimon").option("path", t.path).load()
         .collect())
