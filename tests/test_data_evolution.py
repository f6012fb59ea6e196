"""Data evolution (data-evolution.enabled): UPDATE on a row-tracking
append table writes PATCH files holding only (_ROW_ID, updated columns);
reads stitch the latest patch per row onto the base rows.
(ref: DataEvolutionSplitRead.java, spark DataEvolutionPaimonWriter.scala,
DataEvolutionDeletionTestBase.scala)"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import P, Table
from tests.conftest import *  # noqa: F401,F403  (spark/wh fixtures)

SCH = T.StructType([T.StructField("id", T.IntegerType()),
                    T.StructField("b", T.IntegerType()),
                    T.StructField("c", T.IntegerType())])


def _table(spark, wh, **extra):
    opts = {"row-tracking.enabled": "true",
            "data-evolution.enabled": "true",
            "deletion-vectors.enabled": "true", **extra}
    t = Table.create(f"{wh}/de", SCH, options=opts, spark=spark)
    t.append(spark.createDataFrame([(i, i, i) for i in range(5)], SCH))
    t.append(spark.createDataFrame([(i, i, i) for i in range(5, 10)], SCH))
    return t


def test_patch_write_and_stitch(spark, wh):
    """Column backfill writes patch files (base bytes untouched); reads
    stitch, latest patch wins, explicit NULL updates carry through."""
    t = _table(spark, wh)
    lin_before = {r.id: r._ROW_ID
                  for r in t.read_with_lineage().collect()}
    t.alter(lambda s: s.add_column("d", T.IntegerType()))
    base_files = {e.file_path for e in t.new_scan().plan().entries}
    t.update_where(P.lt("id", 7), {"d": F.col("id") + 100})
    entries = t.new_scan().plan().entries
    assert base_files < {e.file_path for e in entries}       # no rewrite
    assert any(Table._is_patch_entry(e) for e in entries)
    rows = {r.id: (r.b, r.d) for r in t.read().collect()}
    assert rows[3] == (3, 103) and rows[8] == (8, None)
    t.update_where(P.eq("id", 3), {"d": F.lit(999)})          # override
    t.update_where(P.eq("id", 2), {"b": F.lit(None).cast("int")})
    rows = {r.id: (r.b, r.d) for r in t.read().collect()}
    assert rows[3][1] == 999 and rows[6][1] == 106
    assert rows[2] == (None, 102)                             # NULL kept
    # lineage is STABLE through stitching (ids are per-file adopt
    # order, not row values — the contract is they never change)
    lin = {r.id: r._ROW_ID for r in t.read_with_lineage().collect()}
    assert lin == lin_before
    assert sorted(lin.values()) == list(range(10))


def test_predicate_on_patched_column_sees_patches(spark, wh):
    """Base stats are stale for patched columns: file skipping must not
    hide a row whose PATCHED value matches the predicate."""
    t = _table(spark, wh)
    t.update_where(P.eq("id", 4), {"b": F.lit(12345)})
    got = [(r.id, r.b) for r in t.read(P.eq("b", 12345)).collect()]
    assert got == [(4, 12345)]
    assert t.read(P.eq("b", 4)).count() == 0                  # old value gone


def test_delete_over_stitched_values(spark, wh):
    """DELETE evaluates against patched values and rides deletion
    vectors (rewrite would fork _ROW_ID lineage); time travel still
    serves the pre-patch snapshots."""
    t = _table(spark, wh)
    t.alter(lambda s: s.add_column("d", T.IntegerType()))
    t.update_where(P.lt("id", 7), {"d": F.col("id") + 100})
    t.delete_where(P.isin("id", [1, 4]))
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 3, 5, 6, 7, 8, 9]
    t.delete_where(P.eq("d", 106))                            # patched col
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 3, 5, 7, 8, 9]
    assert {r.id for r in t.read(snapshot_id=2).collect()} == set(range(10))
    assert {r.id: r.d for r in t.read(snapshot_id=3).collect()}[3] == 103


def test_guards_and_fold(spark, wh):
    """While patches are live: metadata count/min-max fast paths refuse
    the snapshot (stats are stale for patched columns); streaming now
    SERVES the stitched view (r8, test_streaming covers it) except on
    filesystems without hard links, where it raises. compact() FOLDS
    the patches — stitched values rewritten into plain base files,
    patch entries dropped, fast paths restored, lineage unchanged."""
    t = _table(spark, wh)
    lin_before = {r.id: r._ROW_ID
                  for r in t.read_with_lineage().collect()}
    t.update_where(P.eq("id", 0), {"b": F.lit(777)})
    t.delete_where(P.eq("id", 5))                             # DV folds too
    assert t.new_scan().metadata_count() is None
    assert t.new_scan().metadata_min_max("b") is None
    assert t.read_stream().isStreaming                        # served (r8)
    import errno
    import os as _os
    from paimon_spark import fs as pfs
    real_link = _os.link
    _os.link = lambda *a, **k: (_ for _ in ()).throw(
        OSError(errno.EPERM, "no links"))
    pfs.reset_probe_cache()
    try:
        # no hard links (object store): the Python DataSource stitches
        # executor-side instead of raising (r9, _StitchPartition)
        assert t.read_stream().isStreaming
    finally:
        _os.link = real_link
        pfs.reset_probe_cache()
    t.compact()
    entries = t.new_scan().plan().entries
    assert not any(Table._is_patch_entry(e) for e in entries)
    assert len(entries) == 1                                  # folded+packed
    assert not any(e.dv_path for e in entries)                # DVs folded
    rows = {r.id: r.b for r in t.read().collect()}
    assert rows[0] == 777 and 5 not in rows and len(rows) == 9
    assert t.new_scan().metadata_count() == 9                 # fast path back
    lin = {r.id: r._ROW_ID for r in t.read_with_lineage().collect()}
    assert lin == {k: v for k, v in lin_before.items() if k != 5}
    # post-fold updates start a fresh patch generation
    t.update_where(P.eq("id", 1), {"b": F.lit(888)})
    assert {r.id: r.b for r in t.read().collect()}[1] == 888


def test_sql_update_routes_to_patches(spark, wh):
    """Catalog.sql UPDATE on a data-evolution table writes patches."""
    from paimon_spark import Catalog
    c = Catalog(wh, spark)
    c.sql("CREATE TABLE det (id INT, v DOUBLE) TBLPROPERTIES ("
          "'row-tracking.enabled'='true', 'data-evolution.enabled'='true',"
          "'deletion-vectors.enabled'='true')")
    c.sql("INSERT INTO det SELECT CAST(id AS INT), CAST(id AS DOUBLE) "
          "FROM range(20)")
    c.sql("UPDATE det SET v = v * 10 WHERE id >= 15")
    t = c.get_table("det")
    assert any(Table._is_patch_entry(e) for e in t.new_scan().plan().entries)
    got = {r.id: r.v for r in c.sql("SELECT * FROM det").collect()}
    assert got[17] == 170.0 and got[3] == 3.0


def test_incremental_and_python_ds_over_patches(spark, wh):
    """Patch commits in an incremental range emit the UPDATED ROWS' NEW
    IMAGES (valued at to_snapshot), never raw patch batches; the plain
    Python DataSource refuses patched plans loudly instead of streaming
    bogus rows (r8; ref DataEvolutionSplitRead.java)."""
    t = _table(spark, wh)                      # snapshots 1,2 (appends)
    t.update_where(P.lt("id", 3), {"b": F.col("id") + 100})   # snap 3
    t.update_where(P.eq("id", 1), {"c": F.lit(777)})          # snap 4
    # range covering only the first patch: rows 0-2 new images AT snap 3
    inc3 = {r.id: (r.b, r.c)
            for r in t.read_incremental(2, 3, with_kind=False).collect()}
    assert inc3 == {0: (100, 0), 1: (101, 1), 2: (102, 2)}
    # range covering only the second patch: row 1's image at snap 4
    # carries BOTH patches (valued at to_snapshot)
    inc4 = {r.id: (r.b, r.c)
            for r in t.read_incremental(3, 4, with_kind=False).collect()}
    assert inc4 == {1: (101, 777)}
    # full range: base appends + updated images, no bogus patch rows
    inc = {r.id: (r.b, r.c)
           for r in t.read_incremental(0, 4, with_kind=False).collect()}
    assert inc[5] == (5, 5) and inc[1] == (101, 777) and inc[0] == (100, 0)
    # Python DataSource serves the patched table STITCHED (r9)
    from paimon_spark.streaming.datasource import register
    register(spark)
    ds = {r.id: (r.b, r.c) for r in
          (spark.read.format("paimon").option("path", t.path).load()
           .collect())}
    assert ds == {r.id: (r.b, r.c) for r in t.read().collect()}
    # after fold, the folded base serves directly
    t.compact()
    assert (spark.read.format("paimon").option("path", t.path).load()
            .count()) == 10


def test_pushed_partition_filter_sees_patches(spark, wh):
    """r9 regression: patch entries carry partition={}, so a PUSHED
    partition filter pruned them from the filtered plan and the Python
    DataSource silently served stale, unstitched base rows. With live
    patches the planner now detects them on the UNFILTERED plan and
    serves stitched values (predicate dropped — Spark re-evaluates
    filters row-exact; pruning is the only loss)."""
    sch = T.StructType([T.StructField("pt", T.StringType()),
                        T.StructField("id", T.IntegerType()),
                        T.StructField("b", T.IntegerType())])
    t = Table.create(f"{wh}/dep", sch, partition_keys=["pt"],
                     options={"row-tracking.enabled": "true",
                              "data-evolution.enabled": "true",
                              "deletion-vectors.enabled": "true"},
                     spark=spark)
    t.append(spark.createDataFrame(
        [("a", i, i) for i in range(5)] + [("z", i, i) for i in range(5, 10)],
        sch))
    t.update_where(P.eq("pt", "a"), {"b": F.col("id") + 100})
    from paimon_spark.streaming.datasource import register
    register(spark)
    got = {r.id: r.b for r in
           (spark.read.format("paimon").option("path", t.path).load()
            .filter(F.col("pt") == "a")).collect()}
    assert got == {i: i + 100 for i in range(5)}, got
    # a pushed DATA filter over a PATCHED column must also see stitched
    # values (base stats are stale — no file may be pruned on them)
    got2 = {r.id: r.b for r in
            (spark.read.format("paimon").option("path", t.path).load()
             .filter(F.col("b") >= 102)).collect()}
    assert got2 == {2: 102, 3: 103, 4: 104}, got2


def test_incremental_add_plus_patch_emits_once(spark, wh):
    """r9 regression: an incremental range holding BOTH a base-file ADD
    and a later patch touching its rows must emit each touched row ONCE,
    valued at to_snapshot — not once stale (raw ADD) + once stitched."""
    t = Table.create(f"{wh}/deinc", SCH,
                     options={"row-tracking.enabled": "true",
                              "data-evolution.enabled": "true",
                              "deletion-vectors.enabled": "true"},
                     spark=spark)
    t.append(spark.createDataFrame([(i, i, i) for i in range(5)], SCH))  # s1
    t.append(spark.createDataFrame([(i, i, i) for i in range(5, 10)], SCH))  # s2
    t.update_where(P.ge("id", 7), {"b": F.col("id") + 100})              # s3
    rows = t.read_incremental(1, 3, with_kind=False).collect()
    got = {}
    for r in rows:
        assert r.id not in got, f"id {r.id} emitted twice"
        got[r.id] = (r.b, r.c)
    assert got == {5: (5, 5), 6: (6, 6),
                   7: (107, 7), 8: (108, 8), 9: (109, 9)}
    # full-history range: the s1 rows ride raw, untouched by any patch
    rows = t.read_incremental(0, 3, with_kind=False).collect()
    ids = [r.id for r in rows]
    assert sorted(ids) == list(range(10)) and len(ids) == len(set(ids))


def test_chain_table_rejected_by_datasource(spark, wh):
    """format('paimon') only plans the main table; chain-table.enabled
    reads union chained tables — must refuse loudly (r9)."""
    sch = T.StructType([T.StructField("pt", T.StringType()),
                        T.StructField("k", T.IntegerType()),
                        T.StructField("v", T.IntegerType())])
    t = Table.create(f"{wh}/chain_main", sch, partition_keys=["pt"],
                     primary_keys=["pt", "k"],
                     options={"bucket": "1", "chain-table.enabled": "true",
                              "scan.fallback-snapshot-branch": "snap",
                              "scan.fallback-delta-branch": "delta"},
                     spark=spark)
    t.create_branch("snap")
    t.create_branch("delta")
    t.append(spark.createDataFrame([("a", 1, 1)], sch))
    from paimon_spark.streaming.datasource import register
    register(spark)
    with pytest.raises(Exception, match="chain-table"):
        (spark.read.format("paimon").option("path", t.path).load()
         .collect())


def test_pushdown_default_follows_registering_session(spark):
    """r9: the pushdown reader asserts in sessions without
    spark.sql.python.filterPushdown.enabled — the class default must be
    the plain reader; register() flips it only when the session conf is
    on (get_spark sessions)."""
    from paimon_spark.streaming import datasource as ds
    ds.register(spark)   # test session has the conf ON (get_spark)
    assert ds.PaimonDataSource._pushdown_default == "true"
    # a foreign session (conf off → register leaves default "false")
    # must get the PLAIN reader so batch reads keep working
    saved = ds.PaimonDataSource._pushdown_default
    try:
        ds.PaimonDataSource._pushdown_default = "false"
        src = ds.PaimonDataSource(options={"path": "/nonexistent"})
        # call reader() directly; schema arg unused for class choice
        reader = ds.PaimonDataSource.reader(src, T.StructType([]))
        assert type(reader) is ds.PaimonBatchReader
        ds.PaimonDataSource._pushdown_default = "true"
        reader = ds.PaimonDataSource.reader(src, T.StructType([]))
        assert type(reader) is ds.PaimonPushdownBatchReader
        # explicit per-read option overrides either default
        src2 = ds.PaimonDataSource(
            options={"path": "/x", "filter-pushdown": "false"})
        assert type(ds.PaimonDataSource.reader(src2, T.StructType([]))) \
            is ds.PaimonBatchReader
    finally:
        ds.PaimonDataSource._pushdown_default = saved


def _drain_ds(spark, t, **opts):
    import uuid as _uuid

    from paimon_spark.streaming.datasource import _stream_schema, register
    register(spark)
    sink = f"m_{_uuid.uuid4().hex[:6]}"
    r = (spark.readStream.format("paimon")
         .schema(_stream_schema(t.schema))
         .option("path", t.path).option("availablenow", "true"))
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load().writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(sink).collect()


def test_from_snapshot_full_drain_and_bounds(spark, wh):
    """r9: scan.mode=from-snapshot-full previously fell into the
    deltas-only branch of the Python DataSource and drained EMPTY.
    Bounded (scan.bounded-snapshot) pins the drain to that snapshot's
    state — the time-travel drain read_stream(snapshot_id=) uses;
    unbounded serves state at N plus follow-ups to latest."""
    t = Table.create(f"{wh}/fsf", SCH, spark=spark)
    t.append(spark.createDataFrame([(i, i, i) for i in range(3)], SCH))
    t.append(spark.createDataFrame([(i, i, i) for i in range(3, 6)], SCH))
    bounded = {r.id for r in _drain_ds(
        spark, t, **{"scan.mode": "from-snapshot-full",
                     "scan.snapshot-id": "1",
                     "scan.bounded-snapshot": "1"})}
    assert bounded == {0, 1, 2}
    unbounded = [r.id for r in _drain_ds(
        spark, t, **{"scan.mode": "from-snapshot-full",
                     "scan.snapshot-id": "1"})]
    assert sorted(unbounded) == list(range(6))  # state@1 + delta (1,2]


def test_stream_followup_patches_and_overwrite_skip(spark, wh):
    """r9 follow-up plane (ref DeltaFollowUpScanner.java:33 +
    DataTableStreamScan.java:264): patch commits stream as the touched
    rows' NEW IMAGES valued at the batch end; DV-delete OVERWRITE
    commits are skipped (no re-emission of re-ADDed live files);
    appends stream raw; each row exactly once."""
    t = _table(spark, wh)                       # snaps 1,2
    t.update_where(P.lt("id", 3), {"b": F.col("id") + 100})   # s3
    t.update_where(P.eq("id", 1), {"c": F.lit(777)})          # s4
    t.delete_where(P.eq("id", 4))                             # s5 (DV)
    t.append(spark.createDataFrame([(10, 10, 10)], SCH))      # s6
    rows = _drain_ds(spark, t, **{"scan.mode": "from-snapshot",
                                  "scan.snapshot-id": "3"})
    got = {}
    for r in rows:
        assert r.id not in got, f"id {r.id} emitted twice"
        got[r.id] = (r.b, r.c)
    assert got == {0: (100, 0), 1: (101, 777), 2: (102, 2),
                   10: (10, 10)}, got


def test_stream_checkpoint_resume_over_patches(spark, wh, tmp_path):
    """Pinned consumer (Spark checkpoint) over a patched table: the
    resumed drain serves exactly the new patch images + appends —
    the r9 'pinned follow-up' contract (VERDICT r8 #2)."""
    t = _table(spark, wh)
    ck = str(tmp_path / "ck")
    got1, got2 = [], []

    def mk(opts):
        from paimon_spark.streaming.datasource import (_stream_schema,
                                                       register)
        register(spark)
        r = (spark.readStream.format("paimon")
             .schema(_stream_schema(t.schema))
             .option("path", t.path).option("availablenow", "true"))
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    df = mk({"scan.mode": "from-snapshot-full", "scan.snapshot-id": "2"})
    q = (df.writeStream.foreachBatch(
            lambda d, b: got1.extend((r.id, r.b, r.c) for r in d.collect()))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert sorted(r[0] for r in got1) == list(range(10))
    t.update_where(P.eq("id", 9), {"b": F.lit(999)})
    t.append(spark.createDataFrame([(11, 11, 11)], SCH))
    df = mk({"scan.mode": "from-snapshot-full", "scan.snapshot-id": "2"})
    q = (df.writeStream.foreachBatch(
            lambda d, b: got2.extend((r.id, r.b, r.c) for r in d.collect()))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert {r[0]: (r[1], r[2]) for r in got2} == \
        {9: (999, 9), 11: (11, 11)}, got2
    assert len(got2) == 2


def test_streaming_read_overwrite_opt_in(spark, wh):
    """streaming-read-overwrite=true streams an OVERWRITE commit's
    re-added files (ref CoreOptions.java:1301); default skips them."""
    sch = T.StructType([T.StructField("pt", T.StringType()),
                        T.StructField("k", T.IntegerType())])
    t = Table.create(f"{wh}/ow", sch, partition_keys=["pt"], spark=spark)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], sch))   # s1
    t.overwrite(spark.createDataFrame([("a", 9)], sch))            # s2
    skipped = [r.k for r in _drain_ds(
        spark, t, **{"scan.mode": "from-snapshot", "scan.snapshot-id": "2"})]
    assert skipped == []
    served = [r.k for r in _drain_ds(
        spark, t, **{"scan.mode": "from-snapshot", "scan.snapshot-id": "2",
                     "streaming-read-overwrite": "true"})]
    assert served == [9]
    # append tables also honor the reference's dedicated flag
    # (ref: AppendOnlyFileStoreTable.java:106)
    served2 = [r.k for r in _drain_ds(
        spark, t, **{"scan.mode": "from-snapshot", "scan.snapshot-id": "2",
                     "streaming-read-append-overwrite": "true"})]
    assert served2 == [9]


def test_randomized_patch_model(spark, wh):
    """Seeded random op sequence (append / patch-update / DV-delete /
    fold) on a data-evolution table, replayed against a dict model:
    read(), read_incremental over every adjacent snapshot range, and
    the availableNow drain must all agree with the model throughout."""
    import random
    import uuid as _uuid
    rng = random.Random(7)
    t = Table.create(f"{wh}/derand", SCH,
                     options={"row-tracking.enabled": "true",
                              "data-evolution.enabled": "true",
                              "deletion-vectors.enabled": "true"},
                     spark=spark)
    model: dict[int, tuple] = {}
    next_id = 0
    # (snapshot_id_after_op, op) history for incremental spot-checks
    inc_checks: list[tuple[int, int, dict]] = []

    def snap():
        return t.paths.latest_snapshot_id() or 0

    def drain_equals_read():
        sink = f"m_{_uuid.uuid4().hex[:6]}"
        q = (t.read_stream().writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {r.id: (r.b, r.c) for r in spark.table(sink).collect()}
        assert got == {k: v for k, v in model.items()}, "drain != model"

    for step in range(10):
        op = rng.choice(["append", "update", "update", "delete", "fold"])
        if op == "append" or not model:
            rows = [(next_id + i, next_id + i, next_id + i)
                    for i in range(rng.randint(1, 8))]
            next_id += len(rows)
            t.append(spark.createDataFrame(rows, SCH))
            for i, b, c in rows:
                model[i] = (b, c)
        elif op == "update":
            lo = rng.randrange(0, max(next_id, 1))
            hi = lo + rng.randint(1, 6)
            col = rng.choice(["b", "c"])
            add = rng.randint(100, 999)
            before = snap()
            t.update_where(P.ge("id", lo) & P.lt("id", hi),
                           {col: F.col("id") + add})
            expected = {}
            for i in list(model):
                if lo <= i < hi:
                    b, c = model[i]
                    model[i] = (i + add, c) if col == "b" else (b, i + add)
                    expected[i] = model[i]
            if snap() > before:
                inc_checks.append((before, snap(), expected))
        elif op == "delete":
            victim = rng.choice(sorted(model))
            t.delete_where(P.eq("id", victim))
            del model[victim]
        else:
            t.compact()
        got = {r.id: (r.b, r.c) for r in t.read().collect()}
        assert got == model, f"step {step} op {op}: read != model"
    drain_equals_read()
    # every recorded patch range replays the updated rows' new images
    # VALUED AT to_snapshot (later patches to the same rows apply)
    for frm, to, expected in inc_checks:
        inc = {r.id: (r.b, r.c)
               for r in t.read_incremental(frm, to, with_kind=False)
               .collect()}
        assert set(inc) == set(expected), (frm, to)
    # final incremental over the whole history = current live rows
    # (all adds + updated images), minus nothing that still lives
    full = {r.id: (r.b, r.c)
            for r in t.read_incremental(0, snap(), with_kind=False)
            .collect()}
    for k, v in model.items():
        assert full[k] == v, f"full-range incremental stale for id {k}"
