"""Second batch of maintenance procedures: tag/branch lifecycle extras,
rollback variants, repair, database-wide ops, consumer reset.

(ref: paimon-spark/.../procedure/{RollbackToTimestamp,RollbackToWatermark,
 CreateTagFromTimestamp,ReplaceTag,RenameTag,RenameBranch,MergeBranch,
 PurgeFiles,ResetConsumer,MigrateDatabase,CompactDatabase,
 RemoveUnexistingFiles,TriggerTagAutomaticCreation}Procedure.java)
"""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from paimon_spark import Table
from paimon_spark.procedures import call

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType())])


def _mk(spark, wh, name, n_commits=3, **kw):
    t = Table.create(f"{wh}/{name}", SCHEMA, spark=spark, **kw)
    for i in range(n_commits):
        t.append(spark.createDataFrame([(i * 10 + j, f"c{i}") for j in range(5)],
                                       SCHEMA))
    return t


def test_rollback_to_timestamp(spark, wh):
    t = _mk(spark, wh, "rb_ts")
    s2 = t.paths.read_snapshot(2)
    sid = call(spark, "rollback_to_timestamp", table=t, timestamp=s2.timestamp_ms)
    assert sid == 2
    assert t.paths.latest_snapshot_id() == 2
    assert t.read().count() == 10


def test_rollback_to_timestamp_no_candidate(spark, wh):
    t = _mk(spark, wh, "rb_ts0", n_commits=1)
    with pytest.raises(ValueError):
        call(spark, "rollback_to_timestamp", table=t, timestamp=0)


def test_rollback_to_watermark(spark, wh):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("ev", T.LongType())])
    t = Table.create(f"{wh}/rb_wm", sch,
                     options={"watermark.field": "ev"}, spark=spark)
    for i in range(3):
        t.append(spark.createDataFrame([(i, 1000 * (i + 1))], sch))
    w2 = t.paths.read_snapshot(2).watermark
    assert w2 is not None
    sid = call(spark, "rollback_to_watermark", table=t, watermark=w2)
    assert sid == 2


def test_create_tag_from_timestamp_and_replace_and_rename(spark, wh):
    t = _mk(spark, wh, "tags2")
    s2 = t.paths.read_snapshot(2)
    sid = call(spark, "create_tag_from_timestamp", table=t, tag="tt",
               timestamp=s2.timestamp_ms)
    assert sid == 2 and t.paths.list_tags()["tt"] == 2
    # replace re-points an existing tag; errors on a missing one
    call(spark, "replace_tag", table=t, tag="tt", snapshot=3)
    assert t.paths.list_tags()["tt"] == 3
    with pytest.raises(ValueError):
        call(spark, "replace_tag", table=t, tag="nope")
    call(spark, "rename_tag", table=t, tag="tt", target_tag="tt2")
    tags = t.paths.list_tags()
    assert "tt" not in tags and tags["tt2"] == 3
    # time travel through the renamed tag still works
    assert t.read(tag="tt2").count() == 15


def test_rename_branch(spark, wh):
    t = _mk(spark, wh, "rbr")
    t.create_branch("dev", 2)
    call(spark, "rename_branch", table=t, branch="dev", target_branch="qa")
    assert t.list_branches() == ["qa"]
    assert t.branch("qa").read().count() == 10


def test_merge_branch_appends_diff_files(spark, wh):
    t = _mk(spark, wh, "mb", n_commits=2)           # 10 rows on main
    b = t.create_branch("feature")
    bt = t.branch("feature").with_spark(spark)
    bt.append(spark.createDataFrame([(100 + j, "feat") for j in range(4)],
                                    SCHEMA))
    n = call(spark, "merge_branch", table=t, branch="feature")
    assert n > 0
    got = t.with_spark(spark).read()
    assert got.count() == 14
    assert got.filter(F.col("v") == "feat").count() == 4
    # merging again is a no-op (diff empty)
    assert call(spark, "merge_branch", table=t, branch="feature") == 0


def test_merge_branch_rejects_pk_tables(spark, wh):
    t = Table.create(f"{wh}/mb_pk", SCHEMA, primary_keys=["k"],
                     options={"bucket": "1"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.create_branch("dev")
    with pytest.raises(ValueError):
        call(spark, "merge_branch", table=t, branch="dev")


def test_purge_files(spark, wh):
    t = _mk(spark, wh, "purge")
    t.create_tag("keep", 1)
    t.create_branch("dev", 1)
    os.makedirs(f"{t.path}/consumer", exist_ok=True)
    with open(f"{t.path}/consumer/consumer-c1.json", "w") as f:
        json.dump({"next_snapshot": 2}, f)
    assert call(spark, "purge_files", table=t) == "Success"
    assert t.read().count() == 0
    assert t.paths.list_tags() == {}
    assert t.list_branches() == []
    assert not os.path.exists(f"{t.path}/consumer/consumer-c1.json")


def test_reset_consumer(spark, wh):
    t = _mk(spark, wh, "rc", n_commits=1)
    call(spark, "reset_consumer", table=t, consumer_id="ci", next_snapshot_id=7)
    with open(f"{t.path}/consumer/consumer-ci.json") as f:
        assert json.load(f)["next_snapshot"] == 7
    call(spark, "reset_consumer", table=t, consumer_id="ci")   # delete
    assert not os.path.exists(f"{t.path}/consumer/consumer-ci.json")


def test_migrate_database_and_compact_database(spark, wh, tmp_path):
    src = tmp_path / "db"
    for name in ("ta", "tb"):
        spark.createDataFrame([(1, name)], SCHEMA).write.parquet(
            str(src / name))
    out = call(spark, "migrate_database", source_dir=str(src),
               target_dir=f"{wh}/mdb")
    assert out == ["ta", "tb"]
    for name in ("ta", "tb"):
        assert Table.load(f"{wh}/mdb/{name}", spark).read().count() == 1
    done = call(spark, "compact_database", warehouse=f"{wh}/mdb")
    assert done == ["ta", "tb"]


def test_remove_unexisting_files(spark, wh):
    t = _mk(spark, wh, "repair", n_commits=2)
    latest = t.paths.latest_snapshot()
    victim = t.paths.live_entries(latest)[0]
    os.remove(os.path.join(t.path, victim.file_path))
    listed = call(spark, "remove_unexisting_files", table=t, dry_run=True)
    assert listed == [victim.file_path]
    call(spark, "remove_unexisting_files", table=t)
    # scan no longer references the missing file; reads succeed
    assert t.read().count() == 10 - victim.row_count
    assert call(spark, "remove_unexisting_files", table=t, dry_run=True) == []


def test_trigger_tag_automatic_creation(spark, wh):
    t = Table.create(f"{wh}/autotag", SCHEMA,
                     options={"tag.automatic-creation": "process-time",
                              "tag.creation-period": "daily"}, spark=spark)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    name = call(spark, "trigger_tag_automatic_creation", table=t)
    assert name in t.paths.list_tags()
    # idempotent
    assert call(spark, "trigger_tag_automatic_creation", table=t) == name
    # none-mode tables do nothing
    t2 = _mk(spark, wh, "autotag_none", n_commits=1)
    assert call(spark, "trigger_tag_automatic_creation", table=t2) is None


def test_function_catalog(spark, wh):
    """Persisted SQL scalar functions, registered as native Spark SQL UDFs
    (Catalyst-inlined, no Python round-trip).
    (ref: CreateFunctionProcedure.java, FunctionDefinition.java sql kind)"""
    from paimon_spark.catalog import Catalog
    whf = f"{wh}/fnwh"
    call(spark, "create_function", warehouse=whf, name="disc_price",
         input_params=[("p", "DOUBLE"), ("d", "DOUBLE")],
         return_type="DOUBLE", definition="p * (1 - d)")
    assert spark.sql("SELECT disc_price(10.0, 0.1) AS v").collect()[0].v == 9.0
    # persisted: a fresh Catalog re-registers it
    cat = Catalog(whf, spark)
    assert cat.list_functions() == ["disc_price"]
    call(spark, "alter_function", warehouse=whf, name="disc_price",
         definition="p * (1 - d) * 2")
    assert spark.sql("SELECT disc_price(10.0, 0.1) AS v").collect()[0].v == 18.0
    import pytest as _pytest
    with _pytest.raises(FileExistsError):
        call(spark, "create_function", warehouse=whf, name="disc_price",
             input_params=[("x", "INT")], return_type="INT", definition="x")
    call(spark, "drop_function", warehouse=whf, name="disc_price")
    assert cat.list_functions() == []


def test_persisted_vector_index(spark, wh):
    """IVF index persisted under index/vector/<col>, partition-pruned at
    query time; stale index falls back to the exact scan.
    (ref: CreateGlobalIndexProcedure.java, VectorSearchTable.java)"""
    import os as _os
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    t = Table.create(f"{wh}/vidx", sch, spark=spark)
    t.append(spark.createDataFrame(rows, sch))
    call(spark, "create_global_index", table=t, vec_col="embedding",
         id_col="vid", n_centroids=8)
    meta = t.vector_index_meta("embedding")
    assert meta and meta["n_centroids"] == 8
    assert _os.path.isdir(f"{t.path}/index/vector/embedding/cluster=0")
    q = rows[17][1]
    got = [r.vid for r in t.vector_search(q, k=3, method="ivf").collect()]
    assert got[0] == 17                       # self is its own nearest
    # brute agrees on the top hit
    brute = [r.vid for r in t.vector_search(q, k=3, method="brute").collect()]
    assert brute[0] == 17
    # stale: new commit → falls back to exact scan (still correct)
    t.append(spark.createDataFrame([(999, rows[17][1])], sch))
    got2 = [r.vid for r in t.vector_search(q, k=2, method="ivf").collect()]
    assert set(got2) == {17, 999}
    call(spark, "drop_global_index", table=t, vec_col="embedding")
    assert t.vector_index_meta("embedding") is None


def test_remove_orphans_spares_vector_index(spark, wh):
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    t = Table.create(f"{wh}/vidx_gc", sch, spark=spark)
    t.append(spark.createDataFrame([(i, [float(i), 1.0]) for i in range(20)], sch))
    t.create_vector_index("embedding", id_col="vid", n_centroids=2)
    t.remove_orphan_files()
    assert t.vector_index_meta("embedding") is not None
    assert [r.vid for r in t.vector_search([19.0, 1.0], k=1, method="ivf").collect()] == [19]


def test_copy_files_clones_table(spark, wh):
    """Clone with partition filter; DV sidecars travel so deletes hold.
    (ref: CopyFilesProcedure.java)"""
    from paimon_spark import P
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("p", T.StringType()),
                        T.StructField("v", T.DoubleType())])
    t = Table.create(f"{wh}/cf_src", sch, partition_keys=["p"],
                     options={"deletion-vectors.enabled": "true"}, spark=spark)
    t.append(spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(20)], sch))
    t.delete_where(P.lt("k", 4))          # DV-masked rows
    n = call(spark, "copy_files", source_table=t, target_table=f"{wh}/cf_all")
    assert n > 0
    clone = Table.load(f"{wh}/cf_all", spark)
    assert {tuple(r) for r in clone.read().collect()} == \
           {tuple(r) for r in t.read().collect()}
    # filtered clone: only partition b
    call(spark, "copy_files", source_table=t, target_table=f"{wh}/cf_b",
         where="p = 'b'")
    got = Table.load(f"{wh}/cf_b", spark).read()
    assert got.count() == t.read(P.eq("p", "b")).count()
    assert {r.p for r in got.collect()} == {"b"}


def test_view_catalog(spark, wh):
    """Persisted SQL views with per-engine dialects.
    (ref: view catalog + AlterViewDialectProcedure.java)"""
    from paimon_spark.catalog import Catalog
    cat = Catalog(f"{wh}/vwh", spark)
    t = cat.create_table("base", SCHEMA)
    t.append(spark.createDataFrame([(i, "x") for i in range(10)], SCHEMA))
    cat.register_views()
    cat.create_view("big_k", "SELECT k FROM base WHERE k >= 5")
    cat.alter_view_dialect("big_k", "duckdb",
                           "SELECT k FROM base WHERE k >= 5")
    assert cat.register_sql_views() == ["big_k"]
    assert spark.sql("SELECT count(*) c FROM big_k").collect()[0].c == 5
    assert "WHERE k >= 5" in cat.view_sql("big_k", "duckdb")
    with pytest.raises(FileExistsError):
        cat.create_view("big_k", "SELECT 1")
    cat.drop_view("big_k")
    assert cat.list_views() == []


def test_repair_and_repair_earliest_snapshot(spark, wh):
    t = _mk(spark, wh, "repair2")
    # drift the LATEST hint, then repair fixes it
    t.paths.write_latest_hint(1)
    assert call(spark, "repair", table=t) is True
    assert t.paths.latest_snapshot_id() == 3
    prev = call(spark, "repair_earliest_snapshot", table=t, snapshot=2)
    assert prev == 1
    assert not os.path.exists(t.paths.snapshot_file(1))
    assert t.read().count() == 15            # latest state unaffected
    with pytest.raises(ValueError):
        call(spark, "repair_earliest_snapshot", table=t, snapshot=99)


def test_migrate_table_orc(spark, wh, tmp_path):
    src = str(tmp_path / "legacy_orc")
    spark.createDataFrame([(i, "x") for i in range(30)], SCHEMA) \
        .write.format("orc").save(src)
    t = call(spark, "migrate_table", source_dir=src,
             target_path=f"{wh}/migrated_orc", file_format="orc")
    assert t.read().count() == 30
    assert t.schema.options.get("file.format") == "orc"
    # appends keep working on the migrated table
    t.with_spark(spark).append(spark.createDataFrame([(99, "y")], SCHEMA))
    assert Table.load(t.path, spark).read().count() == 31


def test_ivf_kmeans_recall_vs_brute(spark, wh):
    """r5 verdict #5: IVF centroids are trained k-means clusters, not
    first-n-rows-by-id. On a clustered corpus with ADVERSARIAL id order
    (ids shuffled so first-n-by-id would pick correlated seeds), probed
    IVF search must keep recall@5 >= 0.9 of brute force on held-out
    queries."""
    import random
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    rnd = random.Random(11)
    # 8 well-separated gaussian clusters in 16-d
    centers = [[rnd.uniform(-5, 5) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [x + rnd.gauss(0, 0.3) for x in c]))
    rnd.shuffle(rows)   # id order uncorrelated with cluster structure
    t = Table.create(f"{wh}/vrecall", sch, spark=spark)
    t.append(spark.createDataFrame(rows, sch))
    t.create_vector_index("embedding", id_col="vid", n_centroids=8)
    meta = t.vector_index_meta("embedding")
    assert len(meta["centroids"]) == 8
    by_id = dict(rows)
    hits = total = 0
    for qid in (3, 57, 111, 222, 333):
        q = by_id[qid]
        brute = [r.vid for r in t.vector_search(q, k=5, method="brute").collect()]
        ivf = [r.vid for r in t.vector_search(q, k=5, method="ivf").collect()]
        hits += len(set(brute) & set(ivf))
        total += len(brute)
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_nprobe_knob(spark, wh):
    """nprobe is the IVF recall-vs-cost dial: explicit argument wins,
    the `vector-index.nprobe` table option sets the default, and
    nprobe = n_centroids degrades to exact search (recall 1.0 vs
    brute). `vector-index.num-centroids` likewise drives the build."""
    import random
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding",
                                      T.ArrayType(T.DoubleType()))])
    rnd = random.Random(23)
    centers = [[rnd.uniform(-5, 5) for _ in range(8)] for _ in range(8)]
    rows = [(i, [x + rnd.gauss(0, 0.3) for x in centers[i % 8]])
            for i in range(320)]
    t = Table.create(f"{wh}/vnprobe", sch,
                     options={"vector-index.num-centroids": "8",
                              "vector-index.nprobe": "3"}, spark=spark)
    t.append(spark.createDataFrame(rows, sch))
    t.create_vector_index("embedding", id_col="vid")   # option-driven C
    meta = t.vector_index_meta("embedding")
    assert meta["n_centroids"] == 8
    q = dict(rows)[17]
    brute = [r.vid for r in
             t.vector_search(q, k=5, method="brute").collect()]
    # nprobe=C probes every list — exact
    full = [r.vid for r in
            t.vector_search(q, k=5, method="ivf", nprobe=8).collect()]
    assert full == brute
    # recall is monotone in nprobe (more lists probed ⊇ fewer)
    r1 = set(r.vid for r in
             t.vector_search(q, k=5, method="ivf", nprobe=1).collect())
    r4 = set(r.vid for r in
             t.vector_search(q, k=5, method="ivf", nprobe=4).collect())
    assert len(r4 & set(brute)) >= len(r1 & set(brute))
    # option default (nprobe=3) beats the 1-list probe or ties it
    ropt = set(r.vid for r in
               t.vector_search(q, k=5, method="ivf").collect())
    assert len(ropt & set(brute)) >= len(r1 & set(brute))


def test_ivf_assign_spill_recall(spark, wh):
    """Multi-assignment spill (`vector-index.assign-spill`): each vector
    is replicated into its runner-up lists, so border vectors survive a
    narrow probe — recall at fixed nprobe is >= the single-assignment
    index, results carry no duplicate ids, and the spill setting rides
    index meta through incremental refresh (upsert stays visible)."""
    import random
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding",
                                      T.ArrayType(T.DoubleType()))])
    rnd = random.Random(31)
    # unclustered vectors: the IVF-hostile case where spill must help
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(400)]
    queries = [rows[j][1] for j in (3, 77, 150, 288, 399)]

    def _recall(t, nprobe):
        hits = total = 0
        for q in queries:
            brute = [r.vid for r in
                     t.vector_search(q, k=5, method="brute").collect()]
            got = [r.vid for r in
                   t.vector_search(q, k=5, method="ivf",
                                   nprobe=nprobe).collect()]
            assert len(got) == len(set(got)), "duplicate ids in top-k"
            hits += len(set(got) & set(brute))
            total += len(brute)
        return hits / total

    t0 = Table.create(f"{wh}/vsp0", sch, spark=spark)
    t0.append(spark.createDataFrame(rows, sch))
    t0.create_vector_index("embedding", id_col="vid", n_centroids=8)
    t1 = Table.create(f"{wh}/vsp1", sch,
                      options={"vector-index.assign-spill": "2"},
                      spark=spark)
    t1.append(spark.createDataFrame(rows, sch))
    t1.create_vector_index("embedding", id_col="vid", n_centroids=8)
    assert t1.vector_index_meta("embedding")["spill"] == 2
    assert _recall(t1, 2) >= _recall(t0, 2)
    # nprobe=C stays exact even with replicated entries
    q = queries[0]
    brute = [r.vid for r in
             t0.vector_search(q, k=5, method="brute").collect()]
    assert [r.vid for r in
            t1.vector_search(q, k=5, method="ivf",
                             nprobe=8).collect()] == brute
    # incremental refresh keeps spilling with the meta-pinned setting
    new = (400, [x + 0.01 for x in rows[3][1]])
    t1.append(spark.createDataFrame([new], sch))
    assert t1.refresh_vector_index("embedding") == "incremental"
    got = [r.vid for r in t1.vector_search(new[1], k=2,
                                           method="ivf",
                                           nprobe=8).collect()]
    assert set(got) == {400, 3}


def test_ivf_pq_codes_index(spark, wh):
    """IVF-PQ (`vector-index.pq.m`): inverted lists persist m-int codes
    instead of the d-double vector; searches score codes via ADC lookup
    tables in Catalyst, then re-rank k*refine candidates exactly from
    the table. Codebooks ride the meta through incremental refresh so
    delta codes stay comparable; spill composes with PQ."""
    import random
    sch = T.StructType([T.StructField("vid", T.LongType()),
                        T.StructField("embedding",
                                      T.ArrayType(T.DoubleType()))])
    rnd = random.Random(41)
    centers = [[rnd.uniform(-5, 5) for _ in range(16)] for _ in range(8)]
    rows = [(i, [x + rnd.gauss(0, 0.4) for x in centers[i % 8]])
            for i in range(600)]
    t = Table.create(f"{wh}/vpq", sch,
                     options={"vector-index.pq.m": "4",
                              "vector-index.pq.codes": "32",
                              "vector-index.pq.refine": "8",
                              "vector-index.assign-spill": "1"},
                     spark=spark)
    t.append(spark.createDataFrame(rows, sch))
    t.create_vector_index("embedding", id_col="vid", n_centroids=8)
    meta = t.vector_index_meta("embedding")
    assert meta["pq"]["m"] == 4 and len(meta["pq"]["codebooks"]) == 4
    idx = spark.read.parquet(f"{wh}/vpq/index/vector/embedding")
    assert "codes" in idx.columns and "vec" not in idx.columns
    # recall is asserted against the NON-PQ index at the same nprobe, not
    # an absolute bar: k-means centroids jitter with float summation
    # order, so list assignment luck varies run-to-run — comparing to the
    # plain index isolates what PQ itself loses (ADC + refine re-rank)
    t0 = Table.create(f"{wh}/vplain", sch,
                      options={"vector-index.assign-spill": "1"},
                      spark=spark)
    t0.append(spark.createDataFrame(rows, sch))
    t0.create_vector_index("embedding", id_col="vid", n_centroids=8)

    def _recall(tbl, nprobe):
        hits = total = 0
        for j in (3, 111, 222, 333, 420, 599):
            q = rows[j][1]
            brute = [r.vid for r in
                     tbl.vector_search(q, k=5, method="brute").collect()]
            got = [r.vid for r in
                   tbl.vector_search(q, k=5, method="ivf",
                                     nprobe=nprobe).collect()]
            assert len(got) == len(set(got))
            hits += len(set(got) & set(brute))
            total += 5
        return hits / total

    assert _recall(t, 4) >= _recall(t0, 4) - 0.2, \
        "PQ loses >0.2 recall vs the plain index at the same nprobe"
    # incremental refresh encodes deltas with the EXISTING codebooks
    new = (600, [x + 0.01 for x in rows[3][1]])
    t.append(spark.createDataFrame([new], sch))
    assert t.refresh_vector_index("embedding") == "incremental"
    got = [r.vid for r in
           t.vector_search(new[1], k=2, method="ivf",
                           nprobe=3).collect()]
    assert set(got) == {600, 3}
    # procedure surface passes the knobs; explicit arg beats the option
    call(spark, "create_global_index", table=t, vec_col="embedding",
         id_col="vid", n_centroids=8, pq_m=2)
    assert t.vector_index_meta("embedding")["pq"]["m"] == 2
