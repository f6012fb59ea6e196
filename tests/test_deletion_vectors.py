"""Deletion vectors: metadata-only deletes via positional sidecars."""

from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table

S = T.StructType([T.StructField("k", T.LongType()),
                  T.StructField("v", T.StringType())])


def _t(spark, wh):
    return Table.create(f"{wh}/dv", S,
                        options={"deletion-vectors.enabled": "true"},
                        spark=spark)


def test_dv_delete_no_rewrite(spark, wh):
    t = _t(spark, wh)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(100)], S))
    data_files_before = {e.file_path for e in t.new_scan().plan().entries}
    t.delete_where(P.lt("k", 10))
    entries = t.new_scan().plan().entries
    # SAME data files, now carrying a deletion vector
    assert {e.file_path for e in entries} == data_files_before
    assert sum(e.dv_count for e in entries) == 10
    assert sorted(r["k"] for r in t.read().collect()) == list(range(10, 100))
    # metadata count is DV-aware
    assert t.new_scan().metadata_count() == 90
    # min/max refuses (a deleted row may have held the extreme)
    assert t.new_scan().metadata_min_max("k") is None


def test_dv_second_delete_merges(spark, wh):
    t = _t(spark, wh)
    t.append(spark.createDataFrame([(i, "x") for i in range(50)], S))
    t.delete_where(P.lt("k", 5))
    t.delete_where(P.ge("k", 45))
    assert sorted(r["k"] for r in t.read().collect()) == list(range(5, 45))
    assert t.new_scan().metadata_count() == 40
    # deleting already-deleted rows is a no-op for counts
    t.delete_where(P.lt("k", 5))
    assert t.new_scan().metadata_count() == 40


def test_dv_update_rewrites_clean(spark, wh):
    t = _t(spark, wh)
    t.append(spark.createDataFrame([(i, "a") for i in range(20)], S))
    t.delete_where(P.eq("k", 0))
    t.update_where(P.eq("k", 5), {"v": "B"})
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert 0 not in got and got[5] == "B" and len(got) == 19
    # the DV survives on untouched files; deleted row stays deleted and
    # the update didn't resurrect it
    assert t.new_scan().metadata_count() == 19


def test_dv_no_forced_broadcast_and_distributed_write(spark, wh):
    """Scale regression (r3 verdict #1): the DV anti-join must NOT carry a
    forced broadcast hint (AQE decides; a delete-heavy table's DV side is
    one row per deleted position), and the DV sidecar write must not
    serialize through a single coalesce(1) task."""
    import os
    t = _t(spark, wh)
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(20_000)], S))
    t.delete_where(P.expr("k % 5 = 0"))          # 20% deleted
    assert t.read().count() == 16_000
    # logical plan: no explicit broadcast hint on the DV side.  AQE may
    # still CHOOSE a broadcast for this small test table — forbidden is
    # only the unconditional hint (ResolvedHint/UnresolvedHint).
    logical = t.read()._jdf.queryExecution().analyzed().toString()
    assert "hint" not in logical.lower(), logical
    # the sidecar is a parquet dataset directory (distributed write path),
    # not a single hand-renamed part file
    dv_entries = [e for e in t.new_scan().plan().entries if e.dv_path]
    assert dv_entries
    for e in dv_entries:
        assert os.path.isdir(os.path.join(t.path, e.dv_path))
    # second delete merges into a fresh dataset and stays correct
    t.delete_where(P.expr("k % 5 = 1"))
    assert t.read().count() == 12_000
    assert t.new_scan().metadata_count() == 12_000


def test_dv_dirs_survive_orphan_cleanup(spark, wh):
    import os
    t = _t(spark, wh)
    t.append(spark.createDataFrame([(i, "x") for i in range(100)], S))
    t.delete_where(P.lt("k", 30))
    from paimon_spark.procedures import call
    call(spark, "remove_orphan_files", table=t)
    assert sorted(r["k"] for r in t.read().collect()) == list(range(30, 100))


def test_dv_compact_clears_vectors(spark, wh):
    t = _t(spark, wh)
    for i in range(3):
        t.append(spark.createDataFrame([(i * 10 + j, "z") for j in range(10)], S))
    t.delete_where(P.expr("k % 2 = 1"))
    before = sorted(r["k"] for r in t.read().collect())
    t.compact()
    assert sorted(r["k"] for r in t.read().collect()) == before
    assert all(not e.dv_path for e in t.new_scan().plan().entries)
    assert t.new_scan().metadata_count() == 15
