"""Merge engines: partial-update (sequence groups, delete handling),
aggregation (field functions, retraction), first-row.
Mirrors the reference's merge-function unit tests
(ref: paimon-core/src/test/java/org/apache/paimon/mergetree/compact/)."""

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import Table


def rows(t):
    return sorted(tuple(r) for r in t.read().collect())


PU = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("s_ts", T.LongType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("a_ts", T.LongType()),
    T.StructField("note", T.StringType()),
])


def _pu(spark, wh, extra=None):
    opts = {"bucket": "2", "merge-engine": "partial-update",
            "fields.s_ts.sequence-group": "status",
            "fields.a_ts.sequence-group": "amount"}
    opts.update(extra or {})
    return Table.create(f"{wh}/pu", PU, primary_keys=["id"], options=opts, spark=spark)


def test_partial_update_groups_and_nulls(spark, wh):
    t = _pu(spark, wh)
    t.append(spark.createDataFrame([(1, "NEW", 10, 100.0, 10, "n1")], PU))
    # group A advances, group B stale, note non-null wins by commit order
    t.append(spark.createDataFrame([(1, "SHIPPED", 20, None, None, None),
                                    (1, None, None, 50.0, 5, "n2")], PU))
    assert rows(t) == [(1, "SHIPPED", 20, 100.0, 10, "n2")]


def test_partial_update_remove_on_delete(spark, wh):
    t = _pu(spark, wh, {"partial-update.remove-record-on-delete": "true",
                        "rowkind.field": "kind"})
    pu2 = PU.add(T.StructField("kind", T.StringType()))
    t.alter(lambda s: s.add_column("kind", T.StringType()))
    t.append(spark.createDataFrame([(1, "A", 1, 1.0, 1, "x", "+I"),
                                    (2, "B", 1, 2.0, 1, "y", "+I")], pu2))
    t.append(spark.createDataFrame([(1, None, None, None, None, None, "-D")], pu2))
    got = rows(t)
    assert [r[0] for r in got] == [2]
    # re-insert after delete starts fresh
    t.append(spark.createDataFrame([(1, "C", 9, 9.0, 9, "z", "+I")], pu2))
    assert (1, "C", 9, 9.0, 9, "z", "+I") in rows(t) or \
           (1, "C", 9, 9.0, 9, "z") in [r[:6] for r in rows(t)]


AG = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("s", T.LongType()),
    T.StructField("mx", T.DoubleType()),
    T.StructField("mn", T.DoubleType()),
    T.StructField("lv", T.StringType()),
    T.StructField("fv", T.StringType()),
    T.StructField("lg", T.StringType()),
    T.StructField("cl", T.ArrayType(T.LongType())),  # collect: array field
    T.StructField("ba", T.BooleanType()),
    T.StructField("bo", T.BooleanType()),
])


def _ag(spark, wh):
    fns = {"s": "sum", "mx": "max", "mn": "min", "lv": "last_value",
           "fv": "first_non_null_value", "lg": "listagg", "cl": "collect",
           "ba": "bool_and", "bo": "bool_or"}
    opts = {"bucket": "2", "merge-engine": "aggregation"}
    opts.update({f"fields.{c}.aggregate-function": f for c, f in fns.items()})
    return Table.create(f"{wh}/ag", AG, primary_keys=["k"], options=opts, spark=spark)


def test_aggregation_functions(spark, wh):
    t = _ag(spark, wh)
    t.append(spark.createDataFrame(
        [(1, 5, 1.0, 1.0, "a", None, "x", [7], True, False)], AG))
    t.append(spark.createDataFrame(
        [(1, 3, 9.0, 0.5, "b", "first!", "y", [8, 7], False, False),
         (2, 1, 2.0, 2.0, "z", "zz", "z", [9], True, True)], AG))
    got = {r["k"]: r for r in t.read().collect()}
    r1 = got[1]
    assert r1["s"] == 8 and r1["mx"] == 9.0 and r1["mn"] == 0.5
    assert r1["lv"] == "b" and r1["fv"] == "first!"
    assert r1["lg"] == "x,y" and sorted(r1["cl"]) == [7, 8]
    assert r1["ba"] is False and r1["bo"] is False
    assert got[2]["s"] == 1


def test_aggregation_sum_retract(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("s", T.LongType()),
                           T.StructField("kind", T.StringType())])
    t = Table.create(f"{wh}/ret", schema, primary_keys=["k"],
                     options={"bucket": "1", "merge-engine": "aggregation",
                              "fields.s.aggregate-function": "sum",
                              "rowkind.field": "kind"}, spark=spark)
    t.append(spark.createDataFrame([(1, 10, "+I"), (1, 5, "+I")], schema))
    t.append(spark.createDataFrame([(1, 5, "-D")], schema))  # retract 5
    got = t.read().collect()
    assert got[0]["s"] == 10


def test_merge_map_engine(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    t = Table.create(f"{wh}/mm", schema, primary_keys=["k"],
                     options={"bucket": "1", "merge-engine": "aggregation",
                              "fields.m.aggregate-function": "merge_map"}, spark=spark)
    t.append(spark.createDataFrame([(1, {"a": "1", "b": "2"})], schema))
    t.append(spark.createDataFrame([(1, {"b": "20", "c": "3"})], schema))
    got = t.read().collect()[0]["m"]
    assert got == {"a": "1", "b": "20", "c": "3"}


def test_first_row_engine(spark, wh):
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType()),
                           T.StructField("seq", T.LongType())])
    t = Table.create(f"{wh}/fr", schema, primary_keys=["k"],
                     options={"bucket": "2", "merge-engine": "first-row",
                              "sequence.field": "seq"}, spark=spark)
    t.append(spark.createDataFrame([(1, "second", 2), (2, "only", 1)], schema))
    t.append(spark.createDataFrame([(1, "first", 1)], schema))
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == [(1, "first", 1), (2, "only", 1)]


def test_sequence_field_sort_order_descending(spark, wh):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType()),
                           T.StructField("prio", T.LongType())])
    t = Table.create(f"{wh}/seqdesc", schema, primary_keys=["k"],
                     options={"bucket": "1", "sequence.field": "prio",
                              "sequence.field.sort-order": "descending"},
                     spark=spark)
    # smaller prio wins under descending sort order
    t.append(spark.createDataFrame([(1, "p9", 9), (2, "p5", 5)], schema))
    t.append(spark.createDataFrame([(1, "p3", 3), (2, "p7", 7)], schema))
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(1, "p3"), (2, "p5")}
    # tie on prio: later commit still wins
    t.append(spark.createDataFrame([(1, "p3b", 3)], schema))
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "p3b"), (2, "p5")}


def test_nested_update_keyed_and_partial(spark, wh):
    """nested_update with nested-key = per-key whole-row last-wins;
    nested_partial_update = per-key per-field last-non-null.
    (ref: FieldNestedUpdateAgg / FieldNestedPartialUpdateAgg)"""
    el = T.StructType([T.StructField("nk", T.LongType()),
                       T.StructField("a", T.StringType()),
                       T.StructField("b", T.StringType())])
    sch = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("rows_u", T.ArrayType(el)),
        T.StructField("rows_p", T.ArrayType(el)),
        T.StructField("seq", T.LongType()),
    ])
    t = Table.create(
        f"{wh}/nested_keyed", sch, primary_keys=["pk"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "sequence.field": "seq",
                 "fields.rows_u.aggregate-function": "nested_update",
                 "fields.rows_u.nested-key": "nk",
                 "fields.rows_p.aggregate-function": "nested_partial_update",
                 "fields.rows_p.nested-key": "nk",
                 "fields.seq.aggregate-function": "max"}, spark=spark)
    r = lambda nk, a, b: {"nk": nk, "a": a, "b": b}  # noqa: E731
    t.append(spark.createDataFrame(
        [(1, [r(10, "a1", "b1"), r(20, "a2", "b2")],
             [r(10, "a1", "b1"), r(20, "a2", "b2")], 1)], sch))
    t.append(spark.createDataFrame(
        [(1, [r(10, "a1x", None)], [r(10, None, "b1x")], 2)], sch))
    got = {row.pk: row for row in t.read().collect()}
    u = sorted((x["nk"], x["a"], x["b"]) for x in got[1].rows_u)
    # whole-row replace: b overwritten by None
    assert u == [(10, "a1x", None), (20, "a2", "b2")]
    p = sorted((x["nk"], x["a"], x["b"]) for x in got[1].rows_p)
    # per-field: a kept from seq1, b updated by seq2
    assert p == [(10, "a1", "b1x"), (20, "a2", "b2")]


def test_merge_map_with_keytime(spark, wh):
    """Per map key the row with the larger ts wins; NULL row removes the
    key; NULL incoming ts is ignored. (ref: FieldMergeMapWithKeyTimeAgg)"""
    val = T.StructType([T.StructField("v", T.StringType()),
                        T.StructField("ts", T.StringType())])
    sch = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), val)),
        T.StructField("seq", T.LongType()),
    ])
    t = Table.create(
        f"{wh}/mm_keytime", sch, primary_keys=["pk"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "sequence.field": "seq",
                 "fields.m.aggregate-function": "merge_map_with_keytime",
                 "fields.m.ts-field": "ts",
                 "fields.seq.aggregate-function": "max"}, spark=spark)
    t.append(spark.createDataFrame(
        [(1, {"k1": {"v": "old", "ts": "2024-01-02"},
              "k2": {"v": "keep", "ts": "2024-01-05"},
              "k3": {"v": "gone", "ts": "2024-01-01"}}, 1)], sch))
    t.append(spark.createDataFrame(
        [(1, {"k1": {"v": "new", "ts": "2024-01-03"},      # newer -> wins
              "k2": {"v": "stale", "ts": "2024-01-04"},    # older -> loses
              "k3": None,                                   # remove
              "k4": {"v": "skipped", "ts": None},           # null ts -> skip
              "k5": {"v": "add", "ts": "2024-01-06"}}, 2)], sch))
    got = t.read().collect()[0].m
    flat = {k: (v["v"] if v else None) for k, v in got.items()}
    assert flat == {"k1": "new", "k2": "keep", "k5": "add"}
