"""F7 type-coverage fixture: one column per supported type root round-trips
through write → manifest stats → read, with nulls and extremes.

(ref: FIXTURES.md F7; reference type roots DataTypeRoot.java:50-115)
"""

import datetime as dt
import decimal

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

FIELDS = [
    ("c_bool", T.BooleanType(), [True, False, None]),
    ("c_byte", T.ByteType(), [-128, 127, None]),
    ("c_short", T.ShortType(), [-32768, 32767, None]),
    ("c_int", T.IntegerType(), [-2147483648, 2147483647, 0]),
    ("c_long", T.LongType(), [-9223372036854775808, 9223372036854775807, 1]),
    ("c_float", T.FloatType(), [-1.5, 3.5, None]),
    ("c_double", T.DoubleType(), [-2.25, 1e300, 0.0]),
    ("c_dec10", T.DecimalType(10, 2), [decimal.Decimal("-99999999.99"),
                                       decimal.Decimal("12345.67"), None]),
    ("c_dec20", T.DecimalType(20, 4), [decimal.Decimal("-1234567890.1234"),
                                       decimal.Decimal("0.0001"), None]),
    ("c_str", T.StringType(), ["", "héllo wörld ünïcode ✓", None]),
    ("c_bin", T.BinaryType(), [b"\x00\xff", b"abc", None]),
    ("c_date", T.DateType(), [dt.date(1970, 1, 1), dt.date(2261, 12, 31), None]),
    ("c_ts", T.TimestampType(), [dt.datetime(2020, 1, 1, 0, 0, 0, 123000),
                                 dt.datetime(1999, 12, 31, 23, 59, 59), None]),
    ("c_arr", T.ArrayType(T.IntegerType()), [[1, 2, 3], [], None]),
    ("c_map", T.MapType(T.StringType(), T.IntegerType()),
     [{"a": 1}, {}, None]),
    ("c_row", T.StructType([T.StructField("a", T.IntegerType()),
                            T.StructField("b", T.StringType())]),
     [(1, "x"), (None, None), None]),
    ("c_arr_row", T.ArrayType(T.StructType([T.StructField("x", T.IntegerType())])),
     [[(7,)], [], None]),
]

SCHEMA = T.StructType([T.StructField("id", T.LongType())]
                      + [T.StructField(n, t) for n, t, _ in FIELDS])
ROWS = [tuple([i] + [vals[i] for _n, _t, vals in FIELDS]) for i in range(3)]


def test_all_type_roots_roundtrip(spark, wh):
    t = Table.create(f"{wh}/types", SCHEMA, spark=spark)
    t.append(spark.createDataFrame(ROWS, SCHEMA))
    got = {r.id: r for r in t.read().collect()}
    assert len(got) == 3
    for i, row in enumerate(ROWS):
        for (name, dtype, _), expect in zip(FIELDS, row[1:]):
            actual = got[i][name]
            if isinstance(dtype, T.StructType) and expect is not None:
                actual = tuple(actual)
            elif isinstance(dtype, T.ArrayType) and \
                    isinstance(dtype.elementType, T.StructType) and expect:
                actual = [tuple(x) for x in actual]
            elif isinstance(dtype, T.FloatType) and expect is not None:
                assert abs(actual - expect) < 1e-6
                continue
            assert actual == expect, (name, actual, expect)


def test_stats_and_skipping_per_scalar_type(spark, wh):
    """min/max stats must be correct for every orderable scalar type —
    verified indirectly: an out-of-range predicate skips the file."""
    t = Table.create(f"{wh}/types2", SCHEMA, spark=spark)
    t.append(spark.createDataFrame(ROWS, SCHEMA).coalesce(1))
    probes = [
        ("c_int", P.gt("c_int", 2147483647)),
        ("c_long", P.lt("c_long", -9223372036854775808)),
        ("c_double", P.gt("c_double", 1e301)),
        ("c_str", P.gt("c_str", "héllo wörld ünïcode ✓")),
        ("c_date", P.gt("c_date", dt.date(2262, 1, 1))),
        ("c_dec10", P.gt("c_dec10", decimal.Decimal("12345.68"))),
    ]
    for name, pred in probes:
        plan = t.new_scan().plan(pred)
        assert plan.files_skipped == 1, f"stats skip failed for {name}"
        assert len(plan.entries) == 0
    # in-range predicate keeps the file
    assert t.new_scan().plan(P.eq("c_int", 0)).entries


def test_time_type_roundtrip(spark, wh):
    """TIME (ref DataTypeRoot.java:92) — unblocked in r7 by
    spark.sql.timeType.enabled (set in session.get_spark): literal →
    write → parquet → read → stats-skip all work on Spark 4.1."""
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("c_time", T.TimeType())])
    rows = [(0, dt.time(0, 0, 0)), (1, dt.time(12, 34, 56, 123456)),
            (2, None)]
    t = Table.create(f"{wh}/types_time", sch, spark=spark)
    t.append(spark.createDataFrame(rows, sch).coalesce(1))
    got = {r.id: r.c_time for r in t.read().collect()}
    assert got == {0: dt.time(0, 0, 0), 1: dt.time(12, 34, 56, 123456),
                   2: None}
    # engine expressions over the column stay JVM-side
    hrs = {r.id: r.h for r in
           t.read().selectExpr("id", "HOUR(c_time) AS h").collect()}
    assert hrs == {0: 0, 1: 12, 2: None}
    # min/max stats skip an out-of-range probe
    plan = t.new_scan().plan(P.gt("c_time", dt.time(23, 0, 0)))
    assert plan.files_skipped == 1 and not plan.entries
    assert t.new_scan().plan(P.le("c_time", dt.time(13, 0, 0))).entries
    # PK merge carries TIME values through max_by
    t2 = Table.create(f"{wh}/types_time_pk", sch, primary_keys=["id"],
                      options={"bucket": "1"}, spark=spark)
    t2.append(spark.createDataFrame(rows, sch))
    t2.append(spark.createDataFrame([(2, dt.time(6, 30))], sch))
    got2 = {r.id: r.c_time for r in t2.read().collect()}
    assert got2[2] == dt.time(6, 30) and got2[1] == dt.time(12, 34, 56, 123456)


def test_pk_merge_with_exotic_value_types(spark, wh):
    """Merge engines must carry nested/map/binary values through max_by."""
    t = Table.create(f"{wh}/types3", SCHEMA, primary_keys=["id"],
                     options={"bucket": "1"}, spark=spark)
    t.append(spark.createDataFrame(ROWS, SCHEMA))
    upd = [tuple([0] + [vals[1] for _n, _t, vals in FIELDS])]
    t.append(spark.createDataFrame(upd, SCHEMA))
    got = {r.id: r for r in t.read().collect()}
    assert len(got) == 3
    assert got[0].c_str == "héllo wörld ünïcode ✓"   # updated
    assert got[1].c_str == "héllo wörld ünïcode ✓"   # unchanged row 1


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_time_type_row_formats(spark, wh, fmt):
    """TIME in formats whose Spark datasource rejects TimeType
    (UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE): stored as ISO strings
    (writer.TIME_AS_STRING_FORMATS), restored to the declared type at
    read, with typed manifest stats so skipping still compares
    time-to-time."""
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("c_time", T.TimeType())])
    rows = [(0, dt.time(1, 2, 3)), (1, dt.time(12, 34, 56, 123456)),
            (2, None)]
    t = Table.create(f"{wh}/tt_{fmt}", sch,
                     options={"file.format": fmt}, spark=spark)
    t.append(spark.createDataFrame(rows, sch).coalesce(1))
    got = {r.id: r.c_time for r in t.read().collect()}
    assert got == {0: dt.time(1, 2, 3), 1: dt.time(12, 34, 56, 123456),
                   2: None}
    assert isinstance(t.read().schema["c_time"].dataType, T.TimeType)
    # typed stats: out-of-range probe skips the file
    plan = t.new_scan().plan(P.gt("c_time", dt.time(23, 0, 0)))
    assert plan.files_skipped == 1 and not plan.entries
    assert t.new_scan().plan(P.le("c_time", dt.time(2, 0, 0))).entries
    # PK merge carries the restored type through max_by
    t2 = Table.create(f"{wh}/tt_pk_{fmt}", sch, primary_keys=["id"],
                      options={"file.format": fmt, "bucket": "1"},
                      spark=spark)
    t2.append(spark.createDataFrame(rows, sch))
    t2.append(spark.createDataFrame([(2, dt.time(6, 30))], sch))
    got2 = {r.id: r.c_time for r in t2.read().collect()}
    assert got2 == {0: dt.time(1, 2, 3),
                    1: dt.time(12, 34, 56, 123456), 2: dt.time(6, 30)}


def test_time_type_nested_rejected_in_row_formats(spark, wh):
    """Nested TIME can't round-trip through string-shimmed formats —
    loud error instead of corrupt data."""
    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StructType(
            [T.StructField("t", T.TimeType())]))])
    t = Table.create(f"{wh}/tt_nested", sch,
                     options={"file.format": "json"}, spark=spark)
    with pytest.raises(ValueError, match="nested"):
        t.append(spark.createDataFrame([(1, (dt.time(1, 2),))], sch))


def test_time_type_streaming(spark, wh):
    """TIME through both streaming paths: the JVM FileStreamSource
    drain (parquet) and the Python DataSource row reader over a
    string-shimmed orc table."""
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("c_time", T.TimeType())])
    rows = [(0, dt.time(1, 2, 3)), (1, dt.time(23, 59, 59, 999999))]
    t = Table.create(f"{wh}/tt_stream", sch, spark=spark)
    t.append(spark.createDataFrame(rows, sch))
    q = (t.read_stream().writeStream.format("memory")
         .queryName("tt_stream_mem").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.id: r.c_time
           for r in spark.sql("SELECT * FROM tt_stream_mem").collect()}
    assert got == dict(rows)
    # Python-DS path on a shimmed format (orc PK table)
    t2 = Table.create(f"{wh}/tt_stream_orc", sch, primary_keys=["id"],
                      options={"file.format": "orc", "bucket": "1"},
                      spark=spark)
    t2.append(spark.createDataFrame(rows, sch))
    from paimon_spark.streaming.datasource import register
    register(spark)
    sdf = (spark.readStream.format("paimon")
           .option("path", t2.path).option("availablenow", "true").load())
    q2 = (sdf.writeStream.format("memory").queryName("tt_stream_orc_mem")
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = {r.id: r.c_time
            for r in spark.sql("SELECT id, c_time "
                               "FROM tt_stream_orc_mem").collect()}
    assert got2 == dict(rows)


def test_time_type_streaming_both_paths(spark, wh):
    """TIME survives BOTH streaming data planes: the JVM
    FileStreamSource drain (append/compacted shapes) and the Python
    DataSource fallback (multi-run merge-on-read), including the
    merge's max_by carry."""
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("c_time", T.TimeType())])

    def _drain(sdf, name):
        q = (sdf.writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return {r.id: r.c_time
                for r in spark.sql(f"SELECT * FROM {name}").collect()}

    t = Table.create(f"{wh}/t_time_jvm", sch, spark=spark)
    t.append(spark.createDataFrame(
        [(0, dt.time(0, 0)), (1, dt.time(12, 34, 56, 123456)),
         (2, None)], sch))
    assert _drain(t.read_stream(), "ttsj") == {
        0: dt.time(0, 0), 1: dt.time(12, 34, 56, 123456), 2: None}

    t2 = Table.create(f"{wh}/t_time_pyds", sch, primary_keys=["id"],
                      options={"bucket": "1"}, spark=spark)
    t2.append(spark.createDataFrame(
        [(0, dt.time(1, 2, 3)), (1, dt.time(4, 5, 6))], sch))
    t2.append(spark.createDataFrame([(1, dt.time(23, 59, 59))], sch))
    assert _drain(t2.read_stream(), "ttsp") == {
        0: dt.time(1, 2, 3), 1: dt.time(23, 59, 59)}


def test_time_type_python_ds_parquet_append(spark, wh):
    """r8 re-probe closure: a parquet APPEND table with TIME streamed
    through the plain Python DataSource. This shape used to take the
    Arrow-batch fast path and crash — Spark 4.1.2's Python-DS Arrow
    bridge rejects Time types (UNSUPPORTED_ARROWTYPE
    Time(MICROSECOND, 64)); TIME columns now force the pickled-row
    path, which carries datetime.time natively. (Table.read_stream on
    the same table rides the JVM drain and never hits this.)"""
    import uuid as _uuid
    from paimon_spark.streaming.datasource import register
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("tm", T.TimeType())])
    t = Table.create(f"{wh}/tt_pyds_app", sch, spark=spark)
    t.append(spark.createDataFrame(
        [(1, dt.time(8, 30, 5)), (2, dt.time(23, 1, 2, 123456)),
         (3, None)], sch))
    register(spark)
    sdf = (spark.readStream.format("paimon")
           .option("path", t.path).option("availablenow", "true").load())
    assert isinstance(sdf.schema["tm"].dataType, T.TimeType)
    sink = f"m_{_uuid.uuid4().hex[:6]}"
    q = (sdf.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.k: r.tm for r in spark.table(sink).collect()}
    assert got == {1: dt.time(8, 30, 5), 2: dt.time(23, 1, 2, 123456),
                   3: None}
    # batch surface of format("paimon"): same row-path shim
    got_b = {r.k: r.tm for r in (spark.read.format("paimon")
                                 .option("path", t.path).load()
                                 .select("k", "tm").collect())}
    assert got_b == got
