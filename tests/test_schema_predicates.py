"""Unit tests for TableSchema (evolution) and the Predicate AST — no Spark."""

import datetime as dt

from pyspark.sql import types as T

from paimon_spark.predicates import P
from paimon_spark.schema import TableSchema


def _schema():
    return TableSchema.create(
        T.StructType([
            T.StructField("dt", T.StringType()),
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]),
        partition_keys=["dt"], primary_keys=["dt", "k"],
        options={"bucket": "4"})


def test_schema_roundtrip():
    s = _schema()
    s2 = TableSchema.from_json(s.to_json())
    assert s2.struct == s.struct
    assert s2.primary_keys == ["dt", "k"]
    assert s2.bucket_keys == ["k"]
    assert s2.num_buckets == 4


def test_schema_evolution():
    s = _schema()
    s = s.add_column("c3", T.DoubleType())
    assert s.schema_id == 1 and s.highest_field_id == 3
    s = s.rename_column("c3", "c3r")
    assert "c3r" in s.field_names and "c3" not in s.field_names
    s = s.update_column_type("v", T.StringType())
    assert isinstance(s.data_type("v"), T.StringType)
    s = s.drop_column("c3r")
    assert "c3r" not in s.field_names
    # ids survive rename path
    assert s.schema_id == 4


def test_predicate_partition_test():
    p = P.eq("dt", "a") & P.gt("k", 5)
    assert p.test_partition({"dt": "a"})
    assert not p.test_partition({"dt": "b"})
    assert P.isin("dt", ["a", "b"]).test_partition({"dt": "b"})
    assert not P.isin("dt", ["a"]).test_partition({"dt": "z"})
    assert (P.eq("dt", "a") | P.eq("dt", "b")).test_partition({"dt": "b"})


def test_predicate_stats_test():
    stats = {"k": {"min": 10, "max": 20, "nulls": 0}}
    assert P.eq("k", 15).test_stats(100, stats)
    assert not P.eq("k", 25).test_stats(100, stats)
    assert not P.lt("k", 10).test_stats(100, stats)
    assert P.le("k", 10).test_stats(100, stats)
    assert not P.gt("k", 20).test_stats(100, stats)
    assert P.between("k", 18, 30).test_stats(100, stats)
    assert not P.between("k", 21, 30).test_stats(100, stats)
    assert P.isin("k", [1, 12]).test_stats(100, stats)
    assert not P.isin("k", [1, 2]).test_stats(100, stats)
    # null handling
    nstats = {"k": {"min": None, "max": None, "nulls": 100}}
    assert P.is_null("k").test_stats(100, nstats)
    assert not P.not_null("k").test_stats(100, nstats)
    assert not P.eq("k", 1).test_stats(100, nstats)
    # unknown column → keep
    assert P.eq("zzz", 1).test_stats(100, stats)
    # date stats
    dstats = {"d": {"min": dt.datetime(1995, 1, 1), "max": dt.datetime(1996, 1, 1), "nulls": 0}}
    assert P.le("d", dt.datetime(1995, 6, 1)).test_stats(10, dstats)
    assert not P.gt("d", dt.datetime(1996, 1, 1)).test_stats(10, dstats)


def test_string_prefix_stats():
    stats = {"s": {"min": "apple", "max": "melon", "nulls": 0}}
    assert P.starts_with("s", "ba").test_stats(10, stats)
    assert not P.starts_with("s", "zz").test_stats(10, stats)
    assert P.contains("s", "anything").test_stats(10, stats)  # may-match


def test_partition_only():
    assert P.eq("dt", "a").partition_only(["dt"])
    assert not (P.eq("dt", "a") & P.gt("k", 1)).partition_only(["dt"])
    assert not P.expr("k % 7 = 3").partition_only(["dt", "k"])


def test_field_id_evolution_reads_old_files(spark, wh):
    """F6 fixture semantics: files written under an old schema version read
    correctly after RENAME / type-widen / ADD via stable field ids."""
    from paimon_spark import P, Table

    schema = T.StructType([T.StructField("a", T.IntegerType()),
                           T.StructField("b", T.StringType())])
    t = Table.create(f"{wh}/evo", schema, spark=spark)
    t.append(spark.createDataFrame([(1, "x")], schema))
    t.alter(lambda s: s.rename_column("b", "b2"))
    t.append(spark.createDataFrame([(2, "y")], "a int, b2 string"))
    assert sorted((r.a, r.b2) for r in t.read().collect()) == \
        [(1, "x"), (2, "y")]
    t.alter(lambda s: s.update_column_type("a", T.LongType()))
    t.append(spark.createDataFrame([(3_000_000_000, "z")], "a long, b2 string"))
    t.alter(lambda s: s.add_column("c", T.DoubleType()))
    t.append(spark.createDataFrame([(4, "w", 1.5)],
                                   "a long, b2 string, c double"))
    got = sorted((r.a, r.b2, r.c) for r in t.read().collect())
    assert got == [(1, "x", None), (2, "y", None), (4, "w", 1.5),
                   (3_000_000_000, "z", None)]
    # predicates across schema versions: renamed col + widened col
    assert t.read(P.eq("b2", "x")).count() == 1
    assert t.read(P.ge("a", 3_000_000_000)).count() == 1
    # metadata-only count still exact across versions
    assert t.new_scan().metadata_count() == 4


def test_evolution_then_compact_and_delete(spark, wh):
    from paimon_spark import P, Table

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/evc", schema, primary_keys=["k"],
                     options={"bucket": "2"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.alter(lambda s: s.rename_column("v", "v2"))
    t.append(spark.createDataFrame([(1, "a2")], "k long, v2 string"))
    t.compact()   # rewrites mixed-schema files under the current schema
    assert sorted((r.k, r.v2) for r in t.read().collect()) == \
        [(1, "a2"), (2, "b")]
    t.delete_where(P.eq("k", 2))
    assert [(r.k, r.v2) for r in t.read().collect()] == [(1, "a2")]


def test_transform_predicate_year_skipping(spark, wh):
    import datetime as dt_
    from paimon_spark import P, Table

    schema = T.StructType([T.StructField("ts", T.TimestampNTZType()),
                           T.StructField("v", T.LongType())])
    t = Table.create(f"{wh}/yr", schema, spark=spark)
    for year in (2023, 2024, 2025):
        t.append(spark.createDataFrame(
            [(dt_.datetime(year, m, 1), year * 100 + m) for m in (1, 6, 12)],
            schema))
    pred = P.transform("year", "eq", "ts", 2024)
    plan = t.new_scan().plan(pred)
    assert plan.files_skipped > 0          # 2023/2025 files pruned by stats
    rows = t.read(pred).collect()
    assert len(rows) == 3 and all(r.ts.year == 2024 for r in rows)
    # to_date transform + between
    p2 = P.transform("to_date", "between", "ts",
                     (dt_.date(2024, 5, 1), dt_.date(2024, 12, 31)))
    assert t.read(p2).count() == 2
    # soundness: never prunes a file that contains a match
    assert t.read(P.transform("year", "ge", "ts", 2025)).count() == 3


def test_schema_change_extras(spark, wh):
    """Nullability / comment / move / remove-option schema changes evolve
    the schema id and keep reads correct (ref: SchemaChange.java:87-166)."""
    from paimon_spark import Table
    schema = T.StructType([T.StructField("a", T.LongType()),
                           T.StructField("b", T.StringType()),
                           T.StructField("c", T.DoubleType())])
    t = Table.create(f"{wh}/sce", schema, options={"k1": "v1"}, spark=spark)
    t.append(spark.createDataFrame([(1, "x", 0.5)], schema))
    t.alter(lambda s: s.update_column_nullability("b", False))
    t.alter(lambda s: s.update_column_comment("b", "the b column"))
    t.alter(lambda s: s.move_column("c", "first"))
    t.alter(lambda s: s.move_column("a", "after", after="c"))
    t.alter(lambda s: s.remove_option("k1"))
    t2 = Table.load(t.path, spark)
    assert [f.name for f in t2.schema.struct.fields] == ["c", "a", "b"]
    assert t2.schema.struct["b"].nullable is False
    assert t2.schema.struct["b"].metadata.get("comment") == "the b column"
    assert "k1" not in t2.schema.options
    # old file still reads correctly (by field id) after the reorder
    assert [tuple(r) for r in t2.read().collect()] == [(0.5, 1, "x")]


def test_like_not_between_is_nan_leaves(spark, wh):
    """The last three reference predicate leaves (ref: predicate/ —
    Like, NotBetween, IsNaN): Spark eval, exact value test, stats
    skipping (prefix LIKE; not_between full-containment)."""
    import math
    from paimon_spark.predicates import Leaf, P
    # exact value semantics
    assert Leaf("like", "s", "ab%")._test_value("abc")
    assert not Leaf("like", "s", "ab%")._test_value("xabc")
    assert Leaf("like", "s", "a_c")._test_value("abc")
    assert not Leaf("like", "s", "a_c")._test_value("abbc")
    assert Leaf("like", "s", "100\\%")._test_value("100%")
    assert Leaf("not_between", "x", (5, 10))._test_value(11)
    assert not Leaf("not_between", "x", (5, 10))._test_value(7)
    assert Leaf("is_nan", "x")._test_value(float("nan"))
    assert not Leaf("is_nan", "x")._test_value(1.5)
    # stats skipping
    stats = {"s": {"min": "apple", "max": "grape", "nulls": 0},
             "x": {"min": 5, "max": 9, "nulls": 0}}
    assert not Leaf("like", "s", "z%").test_stats(10, stats)   # skip
    assert Leaf("like", "s", "b%").test_stats(10, stats)       # maybe
    assert Leaf("like", "s", "%z").test_stats(10, stats)       # no prefix
    assert not Leaf("not_between", "x", (1, 20)).test_stats(10, stats)
    assert Leaf("not_between", "x", (6, 8)).test_stats(10, stats)
    # end to end through a table read
    from pyspark.sql import types as T
    from paimon_spark import Table
    sch = T.StructType([T.StructField("s", T.StringType()),
                        T.StructField("x", T.DoubleType())])
    t = Table.create(f"{wh}/leaves", sch, spark=spark)
    t.append(spark.createDataFrame(
        [("apple", 1.0), ("banana", float("nan")), ("grape", 25.0)], sch))
    assert [r.s for r in t.read(P.like("s", "ba%")).collect()] == ["banana"]
    # Spark orders NaN above every double, so NaN is NOT between 0 and 2
    assert sorted(r.s for r in
                  t.read(P.not_between("x", 0.0, 2.0)).collect()) \
        == ["banana", "grape"]
    got = [r.s for r in t.read(P.is_nan("x")).collect()]
    assert got == ["banana"]


def test_randomized_schema_evolution_model(spark, wh):
    """Seeded random schema-evolution sequence (add column [with
    default], rename, widen int->long, drop, upsert batches) on a PK
    table, replayed against a dict model: Table.read() AND the plain
    Python DataSource batch read (field-id remap + default fills) must
    match the model after every step."""
    import random
    from pyspark.sql import types as T
    from paimon_spark import Table
    from paimon_spark.streaming.datasource import register
    rng = random.Random(11)
    t = Table.create(
        f"{wh}/evorand",
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("c0", T.IntegerType())]),
        primary_keys=["k"], options={"bucket": "2"}, spark=spark)
    cols = ["c0"]                      # value columns, current names
    defaults: dict[str, int] = {}
    model: dict[int, dict] = {}
    n_added = 0

    def verify(step):
        want = {k: tuple(row.get(c, defaults.get(c)) for c in cols)
                for k, row in model.items()}
        got = {r.k: tuple(getattr(r, c) for c in cols)
               for r in t.read().collect()}
        assert got == want, f"step {step}: engine read != model"
        register(spark)
        got_ds = {r.k: tuple(getattr(r, c) for c in cols)
                  for r in (spark.read.format("paimon")
                            .option("path", t.path).load().collect())}
        assert got_ds == want, f"step {step}: python-DS read != model"

    for step in range(12):
        op = rng.choice(["append", "append", "add", "rename", "widen",
                         "drop"])
        if op == "add":
            n_added += 1
            name = f"c{n_added}"
            dflt = rng.random() < 0.5
            t.alter(lambda s, n=name, d=dflt: (
                s.add_column(n, T.IntegerType())
                .set_option(f"fields.{n}.default-value", "77")
                if d else s.add_column(n, T.IntegerType())))
            if dflt:
                defaults[name] = 77
            cols.append(name)
        elif op == "rename" and cols:
            old = rng.choice(cols)
            new = old + "r"
            t.alter(lambda s, o=old, n=new: s.rename_column(o, n))
            cols[cols.index(old)] = new
            if old in defaults:
                defaults[new] = defaults.pop(old)
            for row in model.values():
                if old in row:
                    row[new] = row.pop(old)
        elif op == "widen" and cols:
            c = rng.choice(cols)
            try:
                t.alter(lambda s, cc=c: s.update_column_type(cc, T.LongType()))
            except Exception:
                pass                       # already long: no-op
        elif op == "drop" and len(cols) > 1:
            c = rng.choice(cols)
            t.alter(lambda s, cc=c: s.drop_column(cc))
            cols.remove(c)
            defaults.pop(c, None)
            for row in model.values():
                row.pop(c, None)
        else:
            t = Table.load(t.path, spark)  # pick up evolved schema
            ks = rng.sample(range(40), rng.randint(1, 6))
            rows = []
            for k in ks:
                vals = {c: rng.randint(0, 9999) for c in cols}
                model.setdefault(k, {}).update(vals)
                rows.append((k, *[vals[c] for c in cols]))
            t.append(spark.createDataFrame(rows, t.schema.struct))
        t = Table.load(t.path, spark)
        verify(step)
