"""In-sandbox CDC ingestion action: sync a debezium-shaped JSON feed into
a table with automatic schema evolution and rowkind routing (SURVEY S11).

The reference's connector actions (MySqlSyncTableAction / Kafka sync)
wrap external services; the ENGINE work they do per batch is:

  parse CDC records → derive the incoming schema → evolve the table
  schema (add columns, widen types) → route rows by RowKind → write

That pipeline is implemented here over any DataFrame of JSON strings
(a file feed, a Kafka value column, a test fixture), Spark-first:

- payload extraction is `get_json_object` / `from_json` (JVM-side);
- schema discovery prefers the debezium `schema` block (declared source
  types, collected driver-side — O(#distinct schema versions), metadata
  plane); schema-less feeds fall back to Spark's JSON inference;
- type widening follows the reference's rules (ref:
  paimon-flink-cdc/.../sink/cdc/UpdatedDataFieldsProcessFunctionBase.java
  canConvert — same-family widen = CONVERT, narrow = IGNORE,
  cross-family = EXCEPTION unless ALLOW_NON_STRING_TO_STRING);
- out-of-order schema versions inside one batch are safe: the batch is
  synced against the WIDEST schema seen, so late old-shape records
  parse with nulls for the columns they predate
  (ref: SchemaEvolutionUtil — old files read through new schema).

(ref: paimon-flink-cdc/.../sink/cdc/RichCdcRecord.java,
 RichCdcSinkBuilder.java, action/cdc/SyncTableActionBase.java)
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F, types as T

from paimon_spark.schema import KIND_COL

if TYPE_CHECKING:
    from paimon_spark.table import Table

# debezium field-schema `type` → Spark type (Kafka Connect names)
_DBZ_TYPES: dict[str, T.DataType] = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(), "float32": T.FloatType(), "float": T.FloatType(),
    "float64": T.DoubleType(), "double": T.DoubleType(),
    "boolean": T.BooleanType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}

# debezium semantic (`name`) types: wire value → real type (ref:
# DebeziumSchemaUtils.java:173-220 — Date = epoch days, Timestamp =
# epoch millis, MicroTimestamp = epoch micros, ZonedTimestamp = ISO
# string, kafka-connect Decimal = base64 big-endian unscaled bytes +
# `scale` parameter)
_DBZ_DATE = "io.debezium.time.Date"
_DBZ_TS_MS = "io.debezium.time.Timestamp"
_DBZ_TS_US = "io.debezium.time.MicroTimestamp"
_DBZ_TS_Z = "io.debezium.time.ZonedTimestamp"
_DBZ_DECIMAL = "org.apache.kafka.connect.data.Decimal"

_INT_FAMILY = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_FAMILY = (T.FloatType, T.DoubleType)

# debezium op → paimon row kind (ref: RowKind.java; debezium c/r/u/d)
_OP_KIND = {"c": "+I", "r": "+I", "u": "+U", "d": "-D"}


def _family_rank(dt: T.DataType, family: tuple) -> int:
    for i, f in enumerate(family):
        if isinstance(dt, f):
            return i
    return -1


def can_convert(old: T.DataType, new: T.DataType,
                allow_non_string_to_string: bool = False) -> str:
    """'convert' | 'ignore' | 'exception' — Spark-type port of the
    reference's UpdatedDataFieldsProcessFunctionBase.canConvert:
    same-family widening converts, narrowing is ignored (keep the wider
    table type), cross-family changes raise unless the target is string
    and ALLOW_NON_STRING_TO_STRING is on."""
    if old == new:
        return "convert"
    oi, ni = _family_rank(old, _INT_FAMILY), _family_rank(new, _INT_FAMILY)
    if oi >= 0 and ni >= 0:
        return "convert" if oi <= ni else "ignore"
    oi, ni = _family_rank(old, _FLOAT_FAMILY), _family_rank(new, _FLOAT_FAMILY)
    if oi >= 0 and ni >= 0:
        return "convert" if oi <= ni else "ignore"
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        if new.precision >= old.precision and new.scale >= old.scale:
            return "convert"
        return "ignore"
    if isinstance(new, T.StringType):
        if isinstance(old, T.StringType) or allow_non_string_to_string:
            return "convert"
    return "exception"


def _widest(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widest of two types within a family (for merging out-of-order
    schema versions inside one batch)."""
    action = can_convert(a, b)
    if action == "convert":
        return b
    if action == "ignore":
        return a
    raise ValueError(
        f"CDC schema conflict inside one batch: {a.simpleString()} vs "
        f"{b.simpleString()} are not same-family convertible")


def _parse_dbz_schema(schema_json: str) \
        -> dict[str, tuple[T.DataType, tuple | None]] | None:
    """debezium envelope `schema` block → {column: (target spark type,
    conversion)} from the `after` (fallback `before`) field struct.
    `conversion` is None for plain wire types, else a tuple tag
    describing how the wire value decodes into the target type
    (ref: DebeziumSchemaUtils.java — semantic `name` handling)."""
    try:
        sch = json.loads(schema_json)
    except (TypeError, ValueError):
        return None
    blocks = {f.get("field"): f for f in sch.get("fields", [])}
    block = blocks.get("after") or blocks.get("before")
    if not block:
        return None
    out: dict[str, tuple[T.DataType, tuple | None]] = {}
    for f in block.get("fields", []):
        col = f.get("field")
        if not col:
            continue
        name = f.get("name")
        if name == _DBZ_DATE:
            out[col] = (T.DateType(), ("epoch-days",))
        elif name == _DBZ_TS_MS:
            out[col] = (T.TimestampNTZType(), ("epoch-millis",))
        elif name == _DBZ_TS_US:
            out[col] = (T.TimestampNTZType(), ("epoch-micros",))
        elif name == _DBZ_TS_Z:
            out[col] = (T.TimestampType(), ("iso-zoned",))
        elif name == _DBZ_DECIMAL:
            params = f.get("parameters", {})
            scale = int(params.get("scale", 0))
            prec = int(params.get("connect.decimal.precision", 16))
            if prec > 16:
                # the base64 unscaled int is decoded with 64-bit
                # arithmetic (conv/shiftleft); BigDecimal-wide sources
                # must widen to string upstream
                raise ValueError(
                    f"CDC decimal column {col}: precision {prec} > 16 "
                    f"not supported by the wire decoder")
            out[col] = (T.DecimalType(prec, scale),
                        ("decimal-bytes", prec, scale))
        else:
            dt = _DBZ_TYPES.get(f.get("type"))
            if dt is not None:
                out[col] = (dt, None)
    return out or None


def _wire_type(conv: tuple | None, target: T.DataType) -> T.DataType:
    """Type the payload JSON literally carries for a column."""
    if conv is None:
        return target
    return {"epoch-days": T.IntegerType(),
            "epoch-millis": T.LongType(),
            "epoch-micros": T.LongType(),
            "iso-zoned": T.StringType(),
            "decimal-bytes": T.StringType()}[conv[0]]


def _convert_expr(conv: tuple, col):
    """Wire value column → target-typed column."""
    kind = conv[0]
    if kind == "epoch-days":
        return F.date_add(F.lit("1970-01-01").cast("date"), col)
    if kind == "epoch-millis":
        # NTZ epoch arithmetic, NOT timestamp_millis().cast(NTZ): that
        # round-trips instant→wall-clock through the SESSION timezone and
        # is only correct under UTC. timestamp_add on a TIMESTAMP_NTZ base
        # is timezone-free, matching the reference's UTC LocalDateTime
        # conversion (DebeziumSchemaUtils) under any user session zone.
        return F.timestamp_add("MILLISECOND", col,
                               F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")))
    if kind == "epoch-micros":
        return F.timestamp_add("MICROSECOND", col,
                               F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")))
    if kind == "iso-zoned":
        return col.cast("timestamp")
    if kind == "decimal-bytes":
        # base64(big-endian two's-complement unscaled int) + scale —
        # kafka-connect Decimal. 64-bit decode (precision ≤ 16 enforced
        # at schema parse).
        _, prec, scale = conv
        b = F.unbase64(col)
        n = F.length(b)
        u = F.conv(F.hex(b), 16, 10).cast(T.DecimalType(20, 0))
        neg = F.conv(F.substring(F.hex(b), 1, 2), 16, 10) \
               .cast("int") >= 128
        # 2^(8n): powers of two are exact in double up to 2^64, so the
        # decimal cast is exact for every supported width (n ≤ 8)
        two_n = F.pow(F.lit(2.0), (8 * n).cast("int")) \
                 .cast(T.DecimalType(21, 0))
        unscaled = F.when(neg, u - two_n).otherwise(u)
        return (unscaled / F.lit(10 ** scale)) \
            .cast(T.DecimalType(prec, scale))
    raise ValueError(f"unknown conversion {conv}")


def discover_schema(ext: DataFrame) \
        -> tuple[dict[str, T.DataType], dict[str, tuple]]:
    """Incoming (column types, wire conversions) for one CDC batch.

    Declared path: distinct `schema` blocks (driver-side collect is
    O(#distinct schema versions) — metadata plane, like the reference's
    per-record CdcSchema comparison). Versions are merged by widening,
    so an out-of-order old-version record cannot narrow the result.
    Fallback (schema-less feed): Spark JSON inference over the payloads
    (no semantic types there — conversions empty)."""
    merged: dict[str, T.DataType] = {}
    convs: dict[str, tuple] = {}
    declared = [r[0] for r in
                ext.select("schemaj").filter(F.col("schemaj").isNotNull())
                .distinct().collect()]
    for sj in declared:
        cols = _parse_dbz_schema(sj)
        if not cols:
            continue
        for name, (dt, conv) in cols.items():
            if name in merged and convs.get(name) != conv:
                raise ValueError(
                    f"CDC column {name}: conflicting semantic types "
                    f"inside one batch ({convs.get(name)} vs {conv})")
            merged[name] = _widest(merged[name], dt) if name in merged else dt
            if conv is not None:
                convs[name] = conv
    if merged:
        return merged, convs
    # schema-less feed: infer from the row payloads themselves
    payloads = ext.select(F.coalesce("afterj", "beforej").alias("p")) \
                  .filter(F.col("p").isNotNull())
    inferred = payloads.sparkSession.read.json(
        payloads.rdd.map(lambda r: r[0]))
    return {f.name: f.dataType for f in inferred.schema.fields
            if not f.name.startswith("_corrupt")}, {}


def evolve_schema(table: "Table", incoming: dict[str, T.DataType],
                  allow_non_string_to_string: bool = False) -> list[str]:
    """Apply CDC schema evolution to the table: new column → add_column,
    same-family widen → update_column_type, narrower → keep, cross-family
    → raise. Returns a change log (for tests/telemetry)."""
    changes: list[str] = []
    for name, new_dt in incoming.items():
        if name not in table.schema.field_names:
            table.alter(lambda s, n=name, d=new_dt: s.add_column(n, d))
            changes.append(f"add {name} {new_dt.simpleString()}")
            continue
        old_dt = table.schema.data_type(name)
        action = can_convert(old_dt, new_dt, allow_non_string_to_string)
        if action == "exception":
            raise ValueError(
                f"CDC schema change on {name}: {old_dt.simpleString()} → "
                f"{new_dt.simpleString()} is not convertible")
        if action == "convert" and old_dt != new_dt:
            if name in table.schema.primary_keys \
                    or name in table.schema.partition_keys:
                raise ValueError(
                    f"CDC schema change would retype key column {name}")
            table.alter(lambda s, n=name, d=new_dt:
                        s.update_column_type(n, d))
            changes.append(f"widen {name} {old_dt.simpleString()} → "
                           f"{new_dt.simpleString()}")
    return changes


def _extract(cdc_df: DataFrame, json_col: str) -> DataFrame:
    """Raw JSON strings → (op, afterj, beforej, schemaj) columns. Both
    envelope shapes are handled declaratively: `$.payload.*` (debezium
    with schemas.enable) wins when present, bare `$.*` otherwise —
    per row, so mixed feeds work."""
    j = F.col(json_col)
    pick = lambda leaf: F.coalesce(  # noqa: E731
        F.get_json_object(j, f"$.payload.{leaf}"),
        F.get_json_object(j, f"$.{leaf}"))
    return cdc_df.select(
        pick("op").alias("op"),
        pick("after").alias("afterj"),
        pick("before").alias("beforej"),
        F.get_json_object(j, "$.schema").alias("schemaj"))


def sync_table(table: "Table", cdc_df: DataFrame, json_col: str = "value",
               schema_evolution: bool = True,
               allow_non_string_to_string: bool = False):
    """One CDC batch → one table commit (the batch body of the
    reference's sync-table action). Returns the committed Snapshot, or
    None for an empty batch.

    Rows route by rowkind: c/r → +I, u → +U, d → -D (delete payload =
    `before`); kinds flow through the PK write path, so deletes retract
    (cross-partition tables included — append() routes them through the
    global index)."""
    ext = _extract(cdc_df, json_col).persist()
    try:
        if ext.isEmpty():
            return None
        incoming, convs = discover_schema(ext)
        if schema_evolution:
            evolve_schema(table, incoming, allow_non_string_to_string)
        schema = table.schema
        if not schema.is_pk_table and not ext.filter(
                F.col("op").isin("u", "d")).isEmpty():
            raise ValueError(
                "CDC update/delete ops need a primary-key table")
        # parse payloads against the EVOLVED schema — but at the WIRE
        # types for semantically-typed columns (epoch days/millis,
        # base64 decimals); late old-shape records yield nulls for
        # columns they predate; unknown extra payload fields are
        # dropped by from_json
        struct = T.StructType([
            T.StructField(f.name,
                          _wire_type(convs.get(f.name), f.dataType), True)
            for f in schema.struct.fields])
        kind = F.coalesce(
            *[F.when(F.col("op") == op, F.lit(k))
              for op, k in _OP_KIND.items()],
            F.lit("+I"))                      # op-less feed = inserts
        payload = F.when(F.col("op") == "d",
                         F.col("beforej")).otherwise(F.col("afterj"))
        rows = (ext.filter(payload.isNotNull())
                .select(F.from_json(payload, struct).alias("r"),
                        kind.alias(KIND_COL))
                .select("r.*", KIND_COL))
        for c, conv in convs.items():
            if c in rows.columns:
                rows = rows.withColumn(c, _convert_expr(conv, F.col(c)))
        if rows.isEmpty():
            return None
        return table.writer().append(rows)
    finally:
        ext.unpersist()


def sync_database(catalog, cdc_df: DataFrame, json_col: str = "value",
                  schema_evolution: bool = True,
                  primary_keys: dict[str, list[str]] | None = None,
                  table_prefix: str = "", table_suffix: str = "",
                  table_options: dict[str, str] | None = None) -> dict:
    """Whole-database sync (the reference's sync-database action): one
    mixed CDC feed routes to per-table commits by the debezium
    `source.table` field. Unknown tables are AUTO-CREATED from the first
    batch's discovered schema (primary_keys[name] supplies their key
    columns; key-less tables are created append-only and accept inserts
    only). Returns {table_name: Snapshot | None}.

    Driver loop is over DISTINCT table names in the batch (metadata
    plane, like the reference's per-table sink routing); each table's
    rows then flow through the distributed sync_table path.
    (ref: paimon-flink-cdc/.../action/cdc/SyncDatabaseActionBase.java,
     sink/cdc/RichCdcMultiplexRecord.java)"""
    j = F.col(json_col)
    src_table = F.coalesce(
        F.get_json_object(j, "$.payload.source.table"),
        F.get_json_object(j, "$.source.table"))
    tagged = cdc_df.withColumn("__tbl", src_table).persist()
    try:
        names = [r[0] for r in
                 tagged.select("__tbl").filter(F.col("__tbl").isNotNull())
                 .distinct().collect()]
        out = {}
        for name in sorted(names):
            target = f"{table_prefix}{name}{table_suffix}"
            rows = tagged.filter(F.col("__tbl") == name).drop("__tbl")
            if not catalog.table_exists(target):
                ext = _extract(rows, json_col).persist()
                try:
                    incoming, _convs = discover_schema(ext)
                finally:
                    ext.unpersist()
                pks = (primary_keys or {}).get(name)
                struct = T.StructType([
                    T.StructField(c, dt, True)
                    for c, dt in incoming.items()])
                opts = dict(table_options or {})
                if pks:
                    opts.setdefault("bucket", "2")
                catalog.create_table(target, struct, primary_keys=pks,
                                     options=opts)
            out[name] = sync_table(catalog.get_table(target), rows,
                                   json_col, schema_evolution)
        return out
    finally:
        tagged.unpersist()


def sync_table_stream(table: "Table", cdc_stream: DataFrame,
                      checkpoint: str, json_col: str = "value",
                      schema_evolution: bool = True, **stream_opts):
    """Streaming wrapper: every micro-batch runs the batch action above
    (schema evolution included) — the foreachBatch shape of the
    reference's continuous sync pipeline. Caller owns the returned
    StreamingQuery lifecycle."""
    return (cdc_stream.writeStream
            .foreachBatch(lambda df, _id: sync_table(
                table, df, json_col, schema_evolution))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start(**stream_opts))
