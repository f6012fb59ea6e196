"""Randomized LSM round-trip: seeded random upsert/delete batches replayed
against a Python dict model (mirrors the reference's randomized
MergeTreeTestBase, ref: paimon-core/src/test/java/org/apache/paimon/
mergetree/MergeTreeTestBase.java + TestKeyValueGenerator.java:71-106)."""

import random

from pyspark.sql import types as T

from paimon_spark import Table

SCHEMA = T.StructType([
    T.StructField("dt", T.StringType()),
    T.StructField("shop", T.IntegerType()),
    T.StructField("order_id", T.LongType()),
    T.StructField("item", T.LongType()),
    T.StructField("comment", T.StringType()),
    T.StructField("kind", T.StringType()),
])


def test_random_upsert_delete_roundtrip(spark, wh):
    rng = random.Random(42)
    t = Table.create(
        f"{wh}/rand", SCHEMA, partition_keys=["dt"],
        primary_keys=["dt", "shop", "order_id"],
        options={"bucket": "4", "rowkind.field": "kind"}, spark=spark)

    model: dict[tuple, tuple] = {}
    n_batches, batch_size = 5, 400
    for b in range(n_batches):
        batch, seen_in_batch = [], set()
        for _ in range(batch_size):
            key = (f"2026080{rng.randint(1, 3)}", rng.randint(0, 4),
                   rng.randint(0, 150))
            if key in seen_in_batch:
                continue  # same-key-same-commit order is undefined; skip
            seen_in_batch.add(key)
            is_delete = rng.random() < 0.1 and key in model
            if is_delete:
                batch.append((*key, 0, "", "-D"))
                model.pop(key, None)
            else:
                val = (rng.randint(0, 10**6), f"c{rng.randint(0, 999)}")
                batch.append((*key, *val, "+I"))
                model[key] = val
        t.append(spark.createDataFrame(batch, SCHEMA))
        if b == 2:
            t.compact()  # mid-stream compaction must not change results

    got = {(r["dt"], r["shop"], r["order_id"]): (r["item"], r["comment"])
           for r in t.read().collect()}
    assert got == model

    # and after a final full compaction
    t.compact()
    got = {(r["dt"], r["shop"], r["order_id"]): (r["item"], r["comment"])
           for r in t.read().collect()}
    assert got == model


def test_random_roundtrip_with_rescale(spark, wh):
    """Same seeded replay, but the bucket count changes mid-stream and at
    the end — rescale must be invisible to merge results."""
    rng = random.Random(7)
    t = Table.create(
        f"{wh}/rand_rs", SCHEMA, partition_keys=["dt"],
        primary_keys=["dt", "shop", "order_id"],
        options={"bucket": "2", "rowkind.field": "kind"}, spark=spark)

    model: dict[tuple, tuple] = {}
    for b in range(4):
        batch, seen_in_batch = [], set()
        for _ in range(300):
            key = (f"2026080{rng.randint(1, 2)}", rng.randint(0, 3),
                   rng.randint(0, 120))
            if key in seen_in_batch:
                continue
            seen_in_batch.add(key)
            if rng.random() < 0.1 and key in model:
                batch.append((*key, 0, "", "-D"))
                model.pop(key, None)
            else:
                val = (rng.randint(0, 10**6), f"c{rng.randint(0, 999)}")
                batch.append((*key, *val, "+I"))
                model[key] = val
        t.append(spark.createDataFrame(batch, SCHEMA))
        if b == 1:
            t.rescale(5)
        if b == 2:
            t.compact()

    t.rescale(3)
    got = {(r["dt"], r["shop"], r["order_id"]): (r["item"], r["comment"])
           for r in t.read().collect()}
    assert got == model


def test_random_merge_map_with_keytime_vs_model(spark, wh):
    """Seeded random map-merge batches replayed against the reference
    algorithm in pure Python (ref: FieldMergeMapWithKeyTimeAgg.agg)."""
    rng = random.Random(7)
    val = T.StructType([T.StructField("v", T.LongType()),
                        T.StructField("ts", T.StringType())])
    sch = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), val)),
        T.StructField("seq", T.LongType()),
    ])
    t = Table.create(
        f"{wh}/rand_mmkt", sch, primary_keys=["pk"],
        options={"bucket": "2", "merge-engine": "aggregation",
                 "sequence.field": "seq",
                 "fields.m.aggregate-function": "merge_map_with_keytime",
                 "fields.seq.aggregate-function": "max"}, spark=spark)

    model: dict[int, dict] = {}
    seq = 0
    for _batch in range(4):
        rows = []
        for _ in range(30):
            seq += 1
            pk = rng.randrange(8)
            m = {}
            for key in rng.sample("abcdef", rng.randrange(1, 4)):
                if rng.random() < 0.15:
                    m[key] = None                          # remove marker
                elif rng.random() < 0.15:
                    m[key] = {"v": seq, "ts": None}        # skipped
                else:
                    m[key] = {"v": seq,
                              "ts": f"2024-01-{rng.randrange(1, 29):02d}"}
            rows.append((pk, m, seq))
        # replay the reference merge rule on the model, in seq order
        for pk, m, s in sorted(rows, key=lambda r: r[2]):
            acc = model.setdefault(pk, {})
            for key, new in m.items():
                if new is None:
                    acc.pop(key, None)
                    continue
                if new["ts"] is None:
                    continue
                old = acc.get(key)
                if old is None or old["ts"] is None or new["ts"] > old["ts"]:
                    acc[key] = new
        t.append(spark.createDataFrame(rows, sch))

    got = {r.pk: {k: (dict(v.asDict()) if v is not None else None)
                  for k, v in (r.m or {}).items()}
           for r in t.read().collect()}
    for pk, acc in model.items():
        assert got.get(pk) == acc, f"pk {pk}: {got.get(pk)} != {acc}"


def test_chaos_orc_evolution_compaction_roundtrip(spark, wh):
    """Chaos interleaving on an ORC PK table: upserts, deletes, compaction,
    a column rename mid-stream, rescale — replayed against a dict model."""
    from paimon_spark import P
    from paimon_spark.procedures import call
    from pyspark.sql import types as TT

    rng = random.Random(99)
    sch = TT.StructType([TT.StructField("k", TT.LongType()),
                         TT.StructField("v", TT.StringType()),
                         TT.StructField("x", TT.DoubleType())])
    t = Table.create(f"{wh}/chaos_orc", sch, primary_keys=["k"],
                     options={"bucket": "2", "file.format": "orc"},
                     spark=spark)
    model: dict[int, tuple] = {}
    tbl = t
    renamed = False
    for step in range(8):
        batch = [(rng.randrange(40), f"s{step}", float(step))
                 for _ in range(25)]
        uniq = {}
        for k, v, x in batch:
            uniq[k] = (v, x)
        tbl.append(spark.createDataFrame(
            [(k, v, x) for k, (v, x) in uniq.items()], tbl.schema.struct))
        model.update(uniq)
        op = rng.random()
        if op < 0.3:
            victim = rng.randrange(40)
            tbl.delete_where(P.eq("k", victim))
            model.pop(victim, None)
        elif op < 0.5:
            tbl.compact()
        elif op < 0.6 and not renamed:
            tbl.alter(lambda s: s.rename_column("v", "val"))
            tbl = Table.load(tbl.path, spark)
            renamed = True
        elif op < 0.7:
            call(spark, "rescale", table=tbl, bucket=4)
            tbl = Table.load(tbl.path, spark)
    got = {r[0]: (r[1], r[2]) for r in tbl.read().collect()}
    assert got == model
