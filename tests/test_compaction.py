"""Universal compaction picker rules + partial-rewrite correctness."""

from pyspark.sql import types as T

from paimon_spark import Table
from paimon_spark.metadata import FileEntry
from paimon_spark.operators.compaction import pick_compaction


def _run(size, seq):
    return FileEntry("ADD", {}, 0, 0, f"f{seq}.parquet", 10, size, seq, seq, 0, {})


def test_picker_below_trigger_no_pick():
    runs = [_run(100, i) for i in range(3)]
    assert pick_compaction(runs, trigger=5) is None


def test_picker_size_amplification_full():
    # younger runs dwarf the oldest → full rewrite
    runs = [_run(1000, i) for i in range(1, 6)] + [_run(10, 0)]
    pick = pick_compaction(runs, trigger=5)
    assert pick is not None and pick.full and len(pick.entries) == 6


def test_picker_size_ratio_prefix():
    # similar-size young runs chain into a prefix; huge old run excluded
    runs = [_run(100, 5), _run(100, 4), _run(100, 3), _run(100, 2),
            _run(100_000, 1)]
    pick = pick_compaction(runs, trigger=5,
                           max_size_amplification_percent=10**9)
    assert pick is not None and not pick.full
    assert [e.max_seq for e in pick.entries] == [5, 4, 3, 2]


def test_picker_run_count_rule():
    # geometric sizes defeat ratio rule; count rule kicks in
    runs = [_run(10 ** (i + 1), 10 - i) for i in range(6)]
    pick = pick_compaction(runs, trigger=5,
                           max_size_amplification_percent=10**9,
                           size_ratio=0)
    assert pick is not None
    assert len(pick.entries) == 2  # 6 runs → newest 2 → 5 runs left


KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType())])


def test_universal_compaction_end_to_end(spark, wh):
    t = Table.create(f"{wh}/u", KV, primary_keys=["k"],
                     options={"bucket": "1",
                              "num-sorted-run.compaction-trigger": "3"},
                     spark=spark)
    from paimon_spark import P
    for i in range(5):
        t.append(spark.createDataFrame([(j, f"v{i}") for j in range(4)], KV))
    t.delete_where(P.eq("k", 0))
    before = sorted(tuple(r) for r in t.read().collect())
    n_before = len(t.new_scan().plan().entries)
    t.compact(full=False)
    n_after = len(t.new_scan().plan().entries)
    assert n_after < n_before
    after = sorted(tuple(r) for r in t.read().collect())
    assert after == before == [(1, "v4"), (2, "v4"), (3, "v4")]
    # tombstone survived partial compaction: older runs can't resurrect k=0
    t2 = Table.load(f"{wh}/u", spark)
    assert sorted(r["k"] for r in t2.read().collect()) == [1, 2, 3]


def test_partition_filtered_compaction(spark, wh):
    """CALL sys.compact(partitions => 'p=a') compacts ONLY the matching
    partition — untouched partitions keep their file layout
    (ref: CompactProcedure partitions parameter; the only workable shape
    at 100 TB)."""
    from pyspark.sql import types as T
    from paimon_spark import Table
    from paimon_spark.procedures import call
    sch = T.StructType([T.StructField("p", T.StringType()),
                        T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])
    t = Table.create(f"{wh}/pc", sch, partition_keys=["p"],
                     primary_keys=["p", "k"], options={"bucket": "1"},
                     spark=spark)
    for i in range(3):                   # 3 sorted runs per partition
        t.append(spark.createDataFrame(
            [("a", j, f"a{i}") for j in range(5)]
            + [("b", j, f"b{i}") for j in range(5)], sch))

    def files_by_part():
        out = {}
        for e in t.new_scan().plan().entries:
            out.setdefault(e.partition["p"], []).append(e)
        return out

    before = files_by_part()
    assert len(before["a"]) == 3 and len(before["b"]) == 3
    call(spark, "compact", table=t, partitions="p=a")
    after = files_by_part()
    assert len(after["a"]) == 1                     # compacted
    assert {e.file_path for e in after["b"]} == \
        {e.file_path for e in before["b"]}          # untouched
    # data intact, merge semantics preserved
    got = {(r.p, r.k): r.v for r in t.read().collect()}
    assert len(got) == 10 and got[("a", 0)] == "a2" and got[("b", 4)] == "b2"
    # filter referencing a non-partition column raises
    import pytest as _p
    from paimon_spark import P
    with _p.raises(ValueError, match="partition keys only"):
        t.compact(partition_filter=P.eq("k", 1))
