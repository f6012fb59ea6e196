"""Merge engines: LSM merge-on-read expressed as Catalyst aggregations.

Re-creates the reference's merge functions as declarative DataFrame ops
(ref: paimon-core/src/main/java/org/apache/paimon/mergetree/compact/
 DeduplicateMergeFunction.java:32,48-58, FirstRowMergeFunction.java:32,
 PartialUpdateMergeFunction.java:65,81-102,234-270,
 aggregate/AggregateMergeFunction.java:49 + factory/*.java).

Instead of a per-bucket K-way sort-merge (SortMergeReaderWithLoserTree),
we use `groupBy(pk).agg(max_by(...))`: Spark's partial aggregation does
map-side combining before the shuffle, so the shuffle volume is one row
per key per map task — strictly better than shipping every version of
every key, and it parallelizes across the whole cluster instead of one
thread per bucket.

Ordering: rows are merged by (sequence.field..., _sequence_number) —
user sequence field wins, commit sequence breaks ties
(ref: CoreOptions.java:1115 sequence.field).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from paimon_spark.schema import KIND_COL, SEQ_COL, TIE_COL, TableSchema

ADD_KINDS = ("+I", "+U")
RETRACT_KINDS = ("-U", "-D")


def order_struct(schema: TableSchema, extra: list[str] | None = None,
                 df: DataFrame | None = None) -> Column:
    """Merge-order key: (user sequence fields..., commit sequence).
    `sequence.field.sort-order = descending` reverses the USER fields only
    (smallest value wins) while commit order still breaks ties ascending —
    numeric/timestamp/date fields are negated so a single max_by works.
    (ref: CoreOptions SORT_ORDER :4889-4891, SequenceGenerator)

    When `df` carries TIE_COL (attached by apply_merge from file
    metadata), it breaks equal-sequence ties deterministically —
    concurrent writers both take max_sequence+1, and the reference
    resolves exactly this case by (creationTime, fileName)
    (ref: Levels.java:62-81 L0 comparator)."""
    user = extra or schema.sequence_field
    desc = schema.options.get(
        "sequence.field.sort-order", "ascending") == "descending"
    cols: list[Column] = []
    for c in user:
        col = F.col(c)
        if desc:
            dt = schema.data_type(c) if c in schema.field_names else None
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                col = -F.unix_micros(col.cast("timestamp"))
            elif isinstance(dt, T.DateType):
                col = -F.datediff(col, F.lit("1970-01-01"))
            else:
                col = -col
        cols.append(col)
    cols.append(F.col(SEQ_COL))
    if df is not None and TIE_COL in df.columns:
        cols.append(F.col(TIE_COL))
    return F.struct(*cols)


def _value_cols(schema: TableSchema, df: DataFrame) -> list[str]:
    pks = set(schema.primary_keys)
    return [c for c in df.columns
            if c not in pks and c not in (SEQ_COL, KIND_COL, TIE_COL,
                                          "__bucket")]


def _drop_before_delete(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Exact delete semantics for partial-update / aggregation engines with
    remove-record-on-delete: a -D row resets the key — only rows strictly
    after the latest -D contribute. (ref: CoreOptions.java:1156-1164)"""
    pks = schema.primary_keys
    d_seq = (df.filter(F.col(KIND_COL) == "-D")
               .groupBy(*pks).agg(F.max(SEQ_COL).alias("__d_seq")))
    return (df.join(d_seq, pks, "left")
              .filter(F.col("__d_seq").isNull() | (F.col(SEQ_COL) > F.col("__d_seq")))
              .drop("__d_seq"))


def merge_deduplicate(df: DataFrame, schema: TableSchema,
                      carry_max_seq: bool = False) -> DataFrame:
    """Keep the row with the highest (sequence.field, _sequence_number) per
    PK; drop it if that row is a retraction.
    (ref: DeduplicateMergeFunction.java:48-58 + DropDeleteReader,
     MergeFileSplitRead.java:482)

    carry_max_seq (r14, guide §2.4): compaction must carry each key's
    max commit sequence into the rewritten file; computing it INSIDE
    this aggregation (one more agg expression in the same groupBy) is
    the same value the former separate groupBy(pk).max(SEQ)+join
    produced, minus one full scan of the merge input, one exchange and
    one join."""
    pks = schema.primary_keys
    vals = _value_cols(schema, df)
    top = F.max_by(F.struct(*[F.col(c) for c in vals + [KIND_COL]]),
                   order_struct(schema, df=df)).alias("__top")
    aggs = [top] + ([F.max(SEQ_COL).alias(SEQ_COL)]
                    if carry_max_seq else [])
    out = df.groupBy(*pks).agg(*aggs)
    out = out.select(*pks, *[F.col(f"__top.{c}").alias(c) for c in vals],
                     *([F.col(SEQ_COL)] if carry_max_seq else []),
                     F.col(f"__top.{KIND_COL}").alias(KIND_COL))
    return out.filter(~F.col(KIND_COL).isin(*RETRACT_KINDS)).drop(KIND_COL)


def merge_first_row(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Keep the first row per PK (insert-only semantics).
    (ref: FirstRowMergeFunction.java:32)"""
    pks = schema.primary_keys
    vals = _value_cols(schema, df)
    src = df.filter(F.col(KIND_COL).isin(*ADD_KINDS))
    top = F.min_by(F.struct(*[F.col(c) for c in vals]),
                   order_struct(schema, df=src)).alias("__top")
    out = src.groupBy(*pks).agg(top)
    return out.select(*pks, *[F.col(f"__top.{c}").alias(c) for c in vals])


def merge_partial_update(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Per-PK last non-null value per column; sequence-groups give
    per-column-group ordering. (ref: PartialUpdateMergeFunction.java:65,81-102)

    Column c in sequence group g: merged value = arg-max of c over rows where
    c (or the whole group's seq) is non-null, ordered by (g, _sequence_number).
    Columns without a group use the table-level sequence order.
    """
    pks = schema.primary_keys
    vals = _value_cols(schema, df)
    groups = schema.sequence_groups()           # {seq_col: [cols]}
    col_group = {c: g for g, cols in groups.items() for c in cols}

    if schema.options.get("partial-update.remove-record-on-delete", "false") == "true":
        df = _drop_before_delete(df, schema)
    df = df.filter(~F.col(KIND_COL).isin(*RETRACT_KINDS))

    aggs = []
    for c in vals:
        g = col_group.get(c)
        if g is not None:
            order = F.struct(F.col(g), F.col(SEQ_COL))
            cond = F.when(F.col(g).isNotNull() & F.col(c).isNotNull(), order)
        else:
            order = order_struct(schema, df=df)
            cond = F.when(F.col(c).isNotNull(), order)
        if c in groups:  # c is itself a sequence-group column: plain max
            aggs.append(F.max(F.col(c)).alias(c))
        else:
            aggs.append(F.max_by(F.col(c), cond).alias(c))
    return df.groupBy(*pks).agg(*aggs)


def _sorted_by_order(lst: Column) -> Column:
    """Sort array of {o, v} structs by o only — v may be a map/struct that
    Spark cannot order directly."""
    return F.array_sort(lst, lambda l, r: (
        F.when(l["o"] < r["o"], -1).when(l["o"] > r["o"], 1).otherwise(0)))


def _field_agg(fname: str, c: str, order: Column, order_nn: Column,
               schema: TableSchema | None = None,
               field: str | None = None) -> Column:
    """One merged column for the aggregation engine.
    (ref: mergetree/compact/aggregate/factory/Field*AggFactory.java NAME consts)"""
    col = F.col(c)
    opts = (schema.options if schema is not None else {})
    if fname == "sum":
        return F.sum(col).alias(c)
    if fname == "product":
        return F.product(col).alias(c)
    if fname == "max":
        return F.max(col).alias(c)
    if fname == "min":
        return F.min(col).alias(c)
    if fname == "last_value":
        return F.max_by(col, order).alias(c)
    if fname in ("last_non_null_value", "last_not_null_value"):
        return F.max_by(col, F.when(col.isNotNull(), order)).alias(c)
    if fname == "first_value":
        return F.min_by(col, order).alias(c)
    if fname in ("first_non_null_value", "first_not_null_value"):
        return F.min_by(col, F.when(col.isNotNull(), order)).alias(c)
    if fname == "listagg":
        # deterministic: order elements by sequence before joining
        lst = _sorted_by_order(F.collect_list(F.struct(order.alias("o"), col.alias("v"))))
        return F.array_join(F.transform(lst, lambda x: x["v"]), ",").alias(c)
    if fname == "collect":
        # field type is ARRAY<T>; rows carry (singleton) arrays, merge =
        # distinct union (ref: FieldCollectAgg with distinct=true)
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))).alias(c)
    if fname in ("collect_list", "nested_update", "nested_partial_update"):
        # field type ARRAY<STRUCT>; rows carry arrays; union in seq order
        lst = _sorted_by_order(F.collect_list(F.struct(order.alias("o"), col.alias("v"))))
        rows = F.flatten(F.transform(lst, lambda x: x["v"]))
        nested_key = [k.strip() for k in
                      opts.get(f"fields.{field}.nested-key", "").split(",")
                      if k.strip()]
        if not nested_key:
            if fname == "nested_partial_update":
                raise ValueError("nested_partial_update requires "
                                 f"fields.{field}.nested-key")
            # unkeyed nested_update / collect_list: order-preserving concat
            return rows.alias(c)
        rows = F.filter(rows, lambda r: r.isNotNull())
        kx = lambda r: F.struct(*[r[k].alias(k) for k in nested_key])  # noqa: E731
        if fname == "nested_update":
            # keyed upsert: LAST row per nested key wins whole
            # (ref: FieldNestedUpdateAgg.agg — HashMap.put in input order;
            #  mapKeyDedupPolicy=LAST_WIN gives the same last-wins here)
            m = F.map_from_entries(F.transform(
                rows, lambda r: F.struct(kx(r).alias("key"), r.alias("value"))))
            return F.map_values(m).alias(c)
        # nested_partial_update: per key, per nested field LAST NON-NULL wins
        # (ref: FieldNestedPartialUpdateAgg.partialUpdate). For each distinct
        # key (first-seen order) take, per field, the value of the last row
        # of that key where the field is non-null.
        keys_arr = F.array_distinct(F.transform(rows, kx))

        def _merge_rows(k):
            grp = F.filter(rows, lambda r: kx(r) == k)

            def _lastnn(fld):
                nn = F.filter(grp, lambda r: r[fld].isNotNull())
                return F.get(nn, F.size(nn) - 1)[fld].alias(fld)
            first = F.get(grp, 0)
            names = [f.name for f in schema.data_type(field).elementType.fields]
            return F.struct(*[_lastnn(n) for n in names]) if names else first
        return F.transform(keys_arr, _merge_rows).alias(c)
    if fname == "merge_map_with_keytime":
        # MAP<K, STRUCT<..., ts>>: per key, newer ts wins; a NULL struct
        # removes the key; a NULL ts in the incoming row is skipped
        # (ref: FieldMergeMapWithKeyTimeAgg.mergeInputMap; ts field =
        #  fields.<f>.ts-field option, default = last struct field)
        lst = _sorted_by_order(F.collect_list(F.struct(order.alias("o"), col.alias("v"))))
        ents = F.flatten(F.transform(
            F.filter(lst, lambda x: x["v"].isNotNull()),
            lambda x: F.map_entries(x["v"])))
        vtype = schema.data_type(field).valueType
        ts = opts.get(f"fields.{field}.ts-field", vtype.fields[-1].name)

        def _step(acc, e):
            existing = F.when(F.map_contains_key(acc, e["key"]),
                              F.element_at(acc, e["key"]))
            newer = (existing.isNull() | existing[ts].isNull()
                     | (e["value"][ts] > existing[ts]))
            upsert = F.map_concat(
                F.map_filter(acc, lambda k, _v: k != e["key"]),
                F.map_from_entries(F.array(e)))
            return (F.when(e["value"].isNull(),
                           F.map_filter(acc, lambda k, _v: k != e["key"]))
                    .when(e["value"][ts].isNull(), acc)
                    .when(newer, upsert)
                    .otherwise(acc))
        empty = F.map_from_entries(F.slice(ents, 1, 0))
        return F.aggregate(ents, empty, _step).alias(c)
    if fname == "merge_map":
        # later maps win per key (requires mapKeyDedupPolicy=LAST_WIN)
        lst = _sorted_by_order(F.collect_list(F.struct(order.alias("o"), col.alias("v"))))
        return F.map_from_entries(
            F.flatten(F.transform(lst, lambda x: F.map_entries(x["v"])))).alias(c)
    if fname == "bool_and":
        return F.bool_and(col).alias(c)
    if fname == "bool_or":
        return F.bool_or(col).alias(c)
    if fname in ("rbm32", "rbm64"):
        # roaring-bitmap union ≈ distinct int-set union (semantic equivalent;
        # field type ARRAY<INT|BIGINT>, rows carry arrays)
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))).alias(c)
    if fname == "count":
        return F.count(col).alias(c)
    if fname == "hll_sketch":
        # field type BINARY; rows carry HLL blobs, merge = register-max union
        # (ref: FieldHllSketchAgg.java — DataSketches union, here portable
        #  pure-python sketch, see functions/sketches.py)
        from paimon_spark.functions.sketches import hll_union_agg
        return hll_union_agg(col).alias(c)
    if fname == "theta_sketch":
        # (ref: FieldThetaSketchAgg.java — KMV keep-k union)
        from paimon_spark.functions.sketches import theta_union_agg
        return theta_union_agg(col).alias(c)
    raise ValueError(f"unsupported aggregate-function: {fname}")


def merge_aggregation(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Per-PK per-field aggregation (ref: AggregateMergeFunction.java:49;
    FieldAggregator dispatch). Retraction: `sum` subtracts on -U/-D
    (ref: FieldSumAgg.retract); other fields ignore retract rows
    (ref: FieldIgnoreRetractAgg.java)."""
    pks = schema.primary_keys
    vals = _value_cols(schema, df)
    fns = schema.field_agg_functions()
    default_fn = schema.options.get("fields.default-aggregate-function",
                                    "last_non_null_value")
    if schema.options.get("aggregation.remove-record-on-delete", "false") == "true":
        df = _drop_before_delete(df, schema)

    order = order_struct(schema, df=df)
    is_add = F.col(KIND_COL).isin(*ADD_KINDS)
    aggs = []
    for c in vals:
        fname = fns.get(c, default_fn)
        if fname == "sum":
            # retractable: -U/-D subtract (ref: FieldSumAgg.retract)
            signed = F.when(is_add, F.col(c)).otherwise(-F.col(c))
            aggs.append(F.sum(signed).alias(c))
        elif fname == "count":
            signed = F.when(F.col(c).isNull(), F.lit(0)).otherwise(
                F.when(is_add, F.lit(1)).otherwise(F.lit(-1)))
            aggs.append(F.sum(signed).alias(c))
        else:
            # ignore-retract: only +I/+U rows contribute
            df = df.withColumn(f"__v_{c}", F.when(is_add, F.col(c)))
            aggs.append(_field_agg(fname, f"__v_{c}", order, order,
                                   schema, c).alias(c))
    out = df.groupBy(*pks).agg(*aggs)
    return out


MERGE_FUNCTIONS = {
    "deduplicate": merge_deduplicate,
    "first-row": merge_first_row,
    "partial-update": merge_partial_update,
    "aggregation": merge_aggregation,
}


def _with_tie(df: DataFrame) -> DataFrame:
    """Attach TIE_COL = (file mtime, file path) from the scan's hidden
    _metadata when the plan can resolve it (single file scan — unions
    lose _metadata). Concurrent writers can bake the SAME
    _sequence_number (both read max_sequence+1 before committing); the
    tie must break deterministically, and the reference uses exactly
    (creationTime, fileName) for it (ref: Levels.java:62-81). No-op on
    plans without file metadata (staged writes, unions) — those either
    have unique sequences or keep the pre-r9 arbitrary-tie behavior."""
    if TIE_COL in df.columns:
        return df
    try:
        # Union/Join plans (schema-evolution reads, DV anti-joins) can
        # never resolve _metadata — skip the probe outright so the JVM
        # doesn't log an AnalysisException stack trace on every such
        # read; the except below stays as the backstop for any other
        # unresolvable shape.
        tree = df._jdf.queryExecution().analyzed().toString()
        if re.search(r"^[\s:+|-]*'?(Union|Join)\b", tree, re.M):
            return df
    except Exception:        # noqa: BLE001 — fall through to the probe
        pass
    try:
        cand = df.withColumn(TIE_COL, stable_tie_struct())
        cand.schema          # force analysis; raises if unresolvable
        return cand
    except Exception:        # noqa: BLE001 — analysis failure = no-op
        return df


def stable_tie_struct() -> Column:
    """(mtime µs, hash of the file's STABLE identity) from _metadata —
    two longs (16 B/row through the merge shuffle), not a path string.
    mtime is view-invariant (hardlinks share the inode). Hashing the
    raw path was WRONG: bucketed-view links rename files per view
    token, so the same physical file hashed differently through
    different snapshot views and equal-(seq, mtime) tie winners FLIPPED
    between reads — e.g. a key's value "changing" between two snapshots
    no commit touched (caught by the concurrent-writer ×
    lookup-producer model, r11). Stable identity: a view link embeds
    md5(original basename)[:16] as its 16-hex name segment
    (table._bucketed_view); a raw path hashes its own basename through
    the same md5 — both planes agree file-for-file, mirroring the
    reference's fileName comparator (Levels.java:62-81), which also
    never sees view paths."""
    base = F.element_at(
        F.split(F.col("_metadata.file_path"), "/"), -1)
    embedded = F.regexp_extract(
        base, r"^part-\d{5}-([0-9a-f]{16})_\d{5}\.c000\.", 1)
    stable = F.when(embedded != "", embedded).otherwise(
        F.substring(F.md5(F.encode(base, "UTF-8")), 1, 16))
    return F.struct(
        F.unix_micros(F.col("_metadata.file_modification_time"))
         .alias("t"),
        F.xxhash64(stable).alias("h"))


def apply_merge(df: DataFrame, schema: TableSchema,
                carry_max_seq: bool = False) -> DataFrame:
    """carry_max_seq: also return each key's max(_sequence_number) over
    df as SEQ_COL (the compaction rewrite needs it so later-arriving
    rows still merge in order). The deduplicate engine computes it
    inside its own groupBy (zero extra passes); other engines keep the
    separate groupBy+join, whose semantics their aggregates don't
    absorb as directly."""
    fn = MERGE_FUNCTIONS.get(schema.merge_engine)
    if fn is None:
        raise ValueError(f"unknown merge-engine {schema.merge_engine}")
    if carry_max_seq and schema.merge_engine == "deduplicate":
        out = merge_deduplicate(_with_tie(df), schema, carry_max_seq=True)
        cols = [c for c in schema.field_names if c in out.columns]
        return out.select(*cols, SEQ_COL)
    out = fn(_with_tie(df), schema)
    # restore logical column order
    cols = [c for c in schema.field_names if c in out.columns]
    out = out.select(*cols)
    if carry_max_seq:
        seqs = (df.groupBy(*schema.primary_keys)
                .agg(F.max(SEQ_COL).alias(SEQ_COL)))
        out = out.join(seqs, schema.primary_keys, "left")
    return out
