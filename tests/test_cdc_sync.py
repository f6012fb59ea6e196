"""CDC ingestion action (SURVEY S11): debezium-shaped JSON feed →
schema evolution + rowkind routing + PK write.

(ref: paimon-flink-cdc/.../action/cdc/SyncTableActionBase.java,
 sink/cdc/RichCdcRecord.java, UpdatedDataFieldsProcessFunctionBase.java)
"""

import json

import pytest
from pyspark.sql import types as T

from paimon_spark import Table
from paimon_spark.functions.cdc_sync import (can_convert, sync_table,
                                             sync_table_stream)

SCH = T.StructType([T.StructField("id", T.IntegerType()),
                    T.StructField("v", T.StringType())])


def _dbz(op, after=None, before=None, fields=None):
    """Build a debezium envelope (schemas.enable shape)."""
    env = {"payload": {"op": op, "after": after, "before": before}}
    if fields is not None:
        env["schema"] = {"type": "struct", "fields": [
            {"field": "after", "type": "struct",
             "fields": [{"field": k, "type": t} for k, t in fields]},
            {"field": "before", "type": "struct",
             "fields": [{"field": k, "type": t} for k, t in fields]},
        ]}
    return json.dumps(env)


def _feed(spark, msgs):
    return spark.createDataFrame([(m,) for m in msgs], "value string")


def _pk_table(spark, wh, name="t", options=None):
    return Table.create(
        f"{wh}/{name}", SCH, primary_keys=["id"],
        options={"bucket": "2", **(options or {})}, spark=spark)


FIELDS = [("id", "int32"), ("v", "string")]


def test_insert_update_delete_roundtrip(spark, wh):
    t = _pk_table(spark, wh)
    sync_table(t, _feed(spark, [
        _dbz("c", {"id": 1, "v": "a"}, fields=FIELDS),
        _dbz("c", {"id": 2, "v": "b"}, fields=FIELDS),
    ]))
    sync_table(t, _feed(spark, [
        _dbz("u", {"id": 1, "v": "a2"}, {"id": 1, "v": "a"}, fields=FIELDS),
        _dbz("d", None, {"id": 2, "v": "b"}, fields=FIELDS),
        _dbz("r", {"id": 3, "v": "c"}, fields=FIELDS),
    ]))
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {1: "a2", 3: "c"}


def test_schema_evolution_add_and_widen(spark, wh):
    t = _pk_table(spark, wh)
    sync_table(t, _feed(spark, [_dbz("c", {"id": 1, "v": "a"},
                                     fields=FIELDS)]))
    # source ALTER: new column `score` (float64) + `n` int32
    f2 = FIELDS + [("score", "float64"), ("n", "int32")]
    sync_table(t, _feed(spark, [
        _dbz("c", {"id": 2, "v": "b", "score": 1.5, "n": 7}, fields=f2)]))
    assert isinstance(t.schema.data_type("score"), T.DoubleType)
    assert isinstance(t.schema.data_type("n"), T.IntegerType)
    # source widens n to int64 — table follows
    f3 = FIELDS + [("score", "float64"), ("n", "int64")]
    sync_table(t, _feed(spark, [
        _dbz("c", {"id": 3, "v": "c", "score": 2.0,
                   "n": 2**40}, fields=f3)]))
    assert isinstance(t.schema.data_type("n"), T.LongType)
    got = {r.id: (r.score, r.n) for r in t.read().collect()}
    # pre-evolution rows read as null for columns they predate
    assert got == {1: (None, None), 2: (1.5, 7), 3: (2.0, 2**40)}


def test_out_of_order_schema_change_mid_batch(spark, wh):
    """Chaos case: one batch interleaves new-schema and old-schema
    records (late arrivals) — the batch must sync against the WIDEST
    schema and parse old-shape rows with nulls, not fail or narrow."""
    t = _pk_table(spark, wh)
    f_new = FIELDS + [("n", "int64")]
    f_old = FIELDS + [("n", "int32")]
    sync_table(t, _feed(spark, [
        _dbz("c", {"id": 1, "v": "a", "n": 2**40}, fields=f_new),
        _dbz("c", {"id": 2, "v": "b", "n": 5}, fields=f_old),   # late
        _dbz("c", {"id": 3, "v": "c"}, fields=FIELDS),          # later
    ]))
    assert isinstance(t.schema.data_type("n"), T.LongType)
    got = {r.id: r.n for r in t.read().collect()}
    assert got == {1: 2**40, 2: 5, 3: None}
    # an even later batch still carrying the OLD schema must not narrow
    sync_table(t, _feed(spark, [
        _dbz("c", {"id": 4, "v": "d", "n": 6}, fields=f_old)]))
    assert isinstance(t.schema.data_type("n"), T.LongType)


def test_incompatible_change_raises(spark, wh):
    t = _pk_table(spark, wh)
    sync_table(t, _feed(spark, [_dbz("c", {"id": 1, "v": "a"},
                                     fields=FIELDS)]))
    bad = [("id", "int32"), ("v", "int64")]     # string → long
    with pytest.raises(ValueError, match="not convertible"):
        sync_table(t, _feed(spark, [
            _dbz("c", {"id": 2, "v": 9}, fields=bad)]))
    # ...unless non-string→string is requested the OTHER way round
    assert can_convert(T.LongType(), T.StringType(),
                       allow_non_string_to_string=True) == "convert"
    assert can_convert(T.LongType(), T.StringType()) == "exception"
    assert can_convert(T.LongType(), T.IntegerType()) == "ignore"


def test_schemaless_feed_inference_and_bare_shape(spark, wh):
    """No schema block, no payload wrapper: types come from Spark's JSON
    inference; bare `$.op` envelopes parse too."""
    t = Table.create(f"{wh}/bare", T.StructType(
        [T.StructField("id", T.LongType()),
         T.StructField("v", T.StringType())]),
        primary_keys=["id"], options={"bucket": "1"}, spark=spark)
    sync_table(t, _feed(spark, [
        json.dumps({"op": "c", "after": {"id": 1, "v": "a", "extra": 2}}),
        json.dumps({"op": "d", "before": {"id": 9, "v": "gone"}}),
    ]))
    assert isinstance(t.schema.data_type("extra"), T.LongType)
    got = {r.id: (r.v, r.extra) for r in t.read().collect()}
    assert got == {1: ("a", 2)}


def test_append_only_rejects_update_ops(spark, wh):
    t = Table.create(f"{wh}/ap", SCH, spark=spark)
    with pytest.raises(ValueError, match="primary-key"):
        sync_table(t, _feed(spark, [
            _dbz("u", {"id": 1, "v": "x"}, {"id": 1, "v": "y"},
                 fields=FIELDS)]))
    # plain inserts are fine on append tables
    sync_table(t, _feed(spark, [_dbz("c", {"id": 1, "v": "a"},
                                     fields=FIELDS)]))
    assert t.read().count() == 1


def test_sync_table_stream_foreachbatch(spark, wh, tmp_path):
    t = _pk_table(spark, wh, "st")
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    (feed_dir / "b1.json").write_text("\n".join(
        [_dbz("c", {"id": i, "v": f"v{i}"}, fields=FIELDS)
         for i in range(5)]))
    stream = (spark.readStream.format("text")
              .schema("value string").load(str(feed_dir)))
    q = sync_table_stream(t, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert t.read().count() == 5


def _dbz_src(table, op, after=None, before=None, fields=None):
    env = json.loads(_dbz(op, after, before, fields))
    env["payload"]["source"] = {"db": "d", "table": table}
    return json.dumps(env)


def test_sync_database_routes_and_autocreates(spark, wh):
    from paimon_spark import Catalog
    from paimon_spark.functions.cdc_sync import sync_database
    cat = Catalog(wh, spark)
    feed = _feed(spark, [
        _dbz_src("users", "c", {"id": 1, "v": "a"}, fields=FIELDS),
        _dbz_src("users", "c", {"id": 2, "v": "b"}, fields=FIELDS),
        _dbz_src("clicks", "c", {"id": 10, "v": "x"}, fields=FIELDS),
    ])
    out = sync_database(cat, feed, primary_keys={"users": ["id"]})
    assert set(out) == {"users", "clicks"}
    assert cat.get_table("users").read().count() == 2
    assert cat.get_table("clicks").read().count() == 1
    # second batch: update routed to the PK table, append to the other
    out = sync_database(cat, _feed(spark, [
        _dbz_src("users", "u", {"id": 1, "v": "a2"}, {"id": 1, "v": "a"},
                 fields=FIELDS),
        _dbz_src("clicks", "c", {"id": 11, "v": "y"}, fields=FIELDS),
    ]))
    got = {r.id: r.v for r in cat.get_table("users").read().collect()}
    assert got == {1: "a2", 2: "b"}
    assert cat.get_table("clicks").read().count() == 2
    # schema evolution flows through per-table
    f2 = FIELDS + [("score", "float64")]
    sync_database(cat, _feed(spark, [
        _dbz_src("users", "c", {"id": 3, "v": "c", "score": 0.5},
                 fields=f2)]))
    assert isinstance(cat.get_table("users").schema.data_type("score"),
                      T.DoubleType)


def test_semantic_types_date_timestamp_decimal(spark, wh):
    """debezium semantic types decode to real types: Date = epoch days,
    Timestamp = epoch millis, MicroTimestamp = epoch micros,
    ZonedTimestamp = ISO string, kafka-connect Decimal = base64
    big-endian unscaled bytes + scale (ref: DebeziumSchemaUtils)."""
    import base64
    import datetime as dt
    from decimal import Decimal
    from paimon_spark.functions.cdc_sync import sync_table as st

    def env(op, after, fields):
        e = {"schema": {"type": "struct", "fields": [
            {"field": "after", "type": "struct", "fields": fields}]},
            "payload": {"op": op, "after": after}}
        return json.dumps(e)

    fields = [
        {"field": "id", "type": "int32"},
        {"field": "d", "type": "int32", "name": "io.debezium.time.Date"},
        {"field": "ts", "type": "int64",
         "name": "io.debezium.time.Timestamp"},
        {"field": "tsu", "type": "int64",
         "name": "io.debezium.time.MicroTimestamp"},
        {"field": "amt", "type": "bytes",
         "name": "org.apache.kafka.connect.data.Decimal",
         "parameters": {"scale": "2", "connect.decimal.precision": "10"}},
    ]

    def dec_b64(unscaled: int, nbytes: int) -> str:
        return base64.b64encode(
            unscaled.to_bytes(nbytes, "big", signed=True)).decode()

    t = Table.create(
        f"{wh}/sem", T.StructType([T.StructField("id", T.IntegerType())]),
        primary_keys=["id"], options={"bucket": "1"}, spark=spark)
    st(t, _feed(spark, [
        env("c", {"id": 1, "d": 19000, "ts": 1700000000000,
                  "tsu": 1700000000000000,
                  "amt": dec_b64(12345, 3)}, fields),
        env("c", {"id": 2, "d": 0, "ts": 0, "tsu": 0,
                  "amt": dec_b64(-250, 2)}, fields),      # negative
    ]))
    # evolved types are the SEMANTIC ones, not the wire ints/strings
    assert isinstance(t.schema.data_type("d"), T.DateType)
    assert isinstance(t.schema.data_type("ts"), T.TimestampNTZType)
    assert isinstance(t.schema.data_type("amt"), T.DecimalType)
    assert t.schema.data_type("amt").scale == 2
    got = {r.id: r for r in t.read().collect()}
    assert got[1].d == dt.date(1970, 1, 1) + dt.timedelta(days=19000)
    assert got[1].ts == dt.datetime.utcfromtimestamp(1700000000)
    assert got[1].tsu == dt.datetime.utcfromtimestamp(1700000000)
    assert got[1].amt == Decimal("123.45")
    assert got[2].d == dt.date(1970, 1, 1)
    assert got[2].amt == Decimal("-2.50")
    # precision beyond the 64-bit wire decoder is rejected loudly
    wide = [{"field": "id", "type": "int32"},
            {"field": "big", "type": "bytes",
             "name": "org.apache.kafka.connect.data.Decimal",
             "parameters": {"scale": "0",
                            "connect.decimal.precision": "30"}}]
    with pytest.raises(ValueError, match="precision 30"):
        st(t, _feed(spark, [env("c", {"id": 3,
                                      "big": dec_b64(1, 1)}, wide)]))


def test_zoned_timestamp_semantic_type(spark, wh):
    """io.debezium.time.ZonedTimestamp: ISO-8601 string with offset →
    TIMESTAMP (instant preserved across offsets)."""
    import datetime as dt
    from paimon_spark.functions.cdc_sync import sync_table as st
    fields = [{"field": "id", "type": "int32"},
              {"field": "zts", "type": "string",
               "name": "io.debezium.time.ZonedTimestamp"}]
    env = lambda op, after: json.dumps(  # noqa: E731
        {"schema": {"type": "struct", "fields": [
            {"field": "after", "type": "struct", "fields": fields}]},
         "payload": {"op": op, "after": after}})
    t = Table.create(
        f"{wh}/zts", T.StructType([T.StructField("id", T.IntegerType())]),
        primary_keys=["id"], options={"bucket": "1"}, spark=spark)
    st(t, _feed(spark, [
        env("c", {"id": 1, "zts": "2026-03-01T12:00:00Z"}),
        env("c", {"id": 2, "zts": "2026-03-01T14:00:00+02:00"}),
    ]))
    assert isinstance(t.schema.data_type("zts"), T.TimestampType)
    got = {r.id: r.zts for r in t.read().collect()}
    # both inputs are the same instant (12:00 UTC); session tz is UTC
    assert got[1] == got[2] == dt.datetime(2026, 3, 1, 12, 0, 0)


def test_timestamp_decode_is_session_timezone_invariant(spark, wh):
    """Timestamp/MicroTimestamp decode must NOT round-trip through the
    session timezone (r5 advice): under a non-UTC session zone the
    decoded NTZ wall-clock still equals the reference's UTC LocalDateTime
    conversion (DebeziumSchemaUtils)."""
    import datetime as dt
    from paimon_spark.functions.cdc_sync import sync_table as st

    fields = [
        {"field": "id", "type": "int32"},
        {"field": "ts", "type": "int64",
         "name": "io.debezium.time.Timestamp"},
        {"field": "tsu", "type": "int64",
         "name": "io.debezium.time.MicroTimestamp"},
    ]
    e = {"schema": {"type": "struct", "fields": [
        {"field": "after", "type": "struct", "fields": fields}]},
        "payload": {"op": "c",
                    "after": {"id": 1, "ts": 1700000000123,
                              "tsu": 1700000000123456}}}
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t = Table.create(
            f"{wh}/semtz",
            T.StructType([T.StructField("id", T.IntegerType())]),
            primary_keys=["id"], options={"bucket": "1"}, spark=spark)
        st(t, _feed(spark, [json.dumps(e)]))
        row = t.read().collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    utc = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=1700000000)
    assert row.ts == utc + dt.timedelta(milliseconds=123)
    assert row.tsu == utc + dt.timedelta(microseconds=123456)
