"""Catalog.sql(): the SQL DML surface a reference user drives through
Spark SQL — INSERT/UPDATE/DELETE/MERGE/TRUNCATE/CALL/SHOW routed to the
engine, SELECT passthrough over registered views
(ref: SparkCatalog.java:307; commands/UpdatePaimonTableCommand.scala:37,
 MergeIntoPaimonTable.scala:47; procedure/*)."""

import pytest
from pyspark.sql import types as T

from paimon_spark.catalog import Catalog

KV = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("v", T.StringType()),
                   T.StructField("amt", T.DoubleType())])


def _cat(spark, wh):
    return Catalog(wh, spark)


def rows(c, name):
    return sorted(tuple(r) for r in c.get_table(name).read().collect())


def test_insert_values_and_select(spark, wh):
    c = _cat(spark, wh)
    c.create_table("t", KV, primary_keys=["k"], options={"bucket": "2"})
    c.sql("INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    assert rows(c, "t") == [(1, "a", 1.5), (2, "b", 2.5)]
    got = c.sql("SELECT v FROM t WHERE k = 2").collect()
    assert [r.v for r in got] == ["b"]
    # upsert through SQL
    c.sql("INSERT INTO t VALUES (2, 'B', 9.0)")
    assert rows(c, "t") == [(1, "a", 1.5), (2, "B", 9.0)]


def test_insert_select_and_column_list(spark, wh):
    c = _cat(spark, wh)
    c.create_table("src", KV)
    c.create_table("dst", KV)
    c.sql("INSERT INTO src VALUES (1, 'x', 10.0), (2, 'y', 20.0)")
    c.sql("INSERT INTO dst SELECT k, v, amt * 2 AS amt FROM src")
    assert rows(c, "dst") == [(1, "x", 20.0), (2, "y", 40.0)]
    c.sql("INSERT INTO dst (k, v) VALUES (3, 'z')")
    assert (3, "z", None) in rows(c, "dst")


def test_update_delete_truncate(spark, wh):
    c = _cat(spark, wh)
    c.create_table("u", KV, primary_keys=["k"], options={"bucket": "1"})
    c.sql("INSERT INTO u VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    c.sql("UPDATE u SET amt = amt + 100, v = upper(v) WHERE k <= 2")
    assert rows(c, "u") == [(1, "A", 101.0), (2, "B", 102.0), (3, "c", 3.0)]
    c.sql("DELETE FROM u WHERE k = 2")
    assert [r[0] for r in rows(c, "u")] == [1, 3]
    c.sql("TRUNCATE TABLE u")
    assert rows(c, "u") == []


def test_merge_into_sql(spark, wh):
    c = _cat(spark, wh)
    c.create_table("m", KV, primary_keys=["k"], options={"bucket": "1"})
    c.create_table("chg", KV)
    c.sql("INSERT INTO m VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    c.sql("INSERT INTO chg VALUES (2, 'B', 20.0), (9, 'i', 9.0)")
    c.sql("""MERGE INTO m AS t USING chg AS s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET *
             WHEN NOT MATCHED THEN INSERT *""")
    assert rows(c, "m") == [(1, "a", 1.0), (2, "B", 20.0), (9, "i", 9.0)]
    c.sql("""MERGE INTO m AS t USING chg AS s ON t.k = s.k
             WHEN MATCHED THEN DELETE""")
    assert [r[0] for r in rows(c, "m")] == [1]
    # expression update with alias refs
    c.sql("INSERT INTO m VALUES (9, 'i', 9.0)")
    c.sql("""MERGE INTO m AS t USING chg AS s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt""")
    got = {r[0]: r[2] for r in rows(c, "m")}
    assert got[9] == 18.0


def test_call_procedures_sql(spark, wh):
    c = _cat(spark, wh)
    c.create_table("p", KV, primary_keys=["k"], options={"bucket": "1"})
    c.sql("INSERT INTO p VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO p VALUES (1, 'b', 2.0)")
    c.sql("CALL sys.compact(table => 'p')")
    assert rows(c, "p") == [(1, "b", 2.0)]
    c.sql("CALL sys.create_tag(table => 'p', tag => 'v1')")
    assert "v1" in dict(c.get_table("p").paths.list_tags())


def test_show_and_system_views(spark, wh):
    c = _cat(spark, wh)
    sch = T.StructType([T.StructField("dt", T.StringType()),
                        T.StructField("x", T.LongType())])
    c.create_table("sp", sch, partition_keys=["dt"])
    c.sql("INSERT INTO sp VALUES ('d1', 1), ('d2', 2)")
    names = {r.tableName for r in c.sql("SHOW TABLES").collect()}
    assert "sp" in names
    parts = c.sql("SHOW PARTITIONS sp")
    assert parts.count() == 2
    snaps = c.sql("SELECT * FROM sp__snapshots")
    assert snaps.count() >= 1


def test_insert_overwrite_sql(spark, wh):
    c = _cat(spark, wh)
    sch = T.StructType([T.StructField("dt", T.StringType()),
                        T.StructField("x", T.LongType())])
    c.create_table("ow", sch, partition_keys=["dt"])
    c.sql("INSERT INTO ow VALUES ('d1', 1), ('d2', 2)")
    c.sql("INSERT OVERWRITE ow VALUES ('d1', 100)")
    got = sorted((r.dt, r.x) for r in c.get_table("ow").read().collect())
    assert got == [("d1", 100), ("d2", 2)]     # dynamic: d2 untouched


def test_insert_overwrite_static_partition_sql(spark, wh):
    """INSERT OVERWRITE … PARTITION (k=v) replaces ONLY that partition —
    regression for the r3 advice bug where the static path wiped every
    partition of the table."""
    c = _cat(spark, wh)
    sch = T.StructType([T.StructField("dt", T.StringType()),
                        T.StructField("x", T.LongType())])
    c.create_table("owp", sch, partition_keys=["dt"])
    c.sql("INSERT INTO owp VALUES ('d1', 1), ('d1', 11), ('d2', 2), "
          "('d3', 3)")
    c.sql("INSERT OVERWRITE owp PARTITION (dt='d1') VALUES (100)")
    got = sorted((r.dt, r.x) for r in c.get_table("owp").read().collect())
    assert got == [("d1", 100), ("d2", 2), ("d3", 3)]
    # an overwrite of a partition with NO live rows in the source clears it
    c.sql("INSERT OVERWRITE owp PARTITION (dt='d2') "
          "SELECT x FROM owp WHERE x < 0")
    got = sorted((r.dt, r.x) for r in c.get_table("owp").read().collect())
    assert got == [("d1", 100), ("d3", 3)]


def test_insert_overwrite_static_partition_typed(spark, wh):
    """Static spec over a non-string partition key compares typed, not
    string-vs-string."""
    c = _cat(spark, wh)
    sch = T.StructType([T.StructField("pk", T.IntegerType()),
                        T.StructField("x", T.LongType())])
    c.create_table("owi", sch, partition_keys=["pk"])
    c.sql("INSERT INTO owi VALUES (1, 10), (2, 20)")
    c.sql("INSERT OVERWRITE owi PARTITION (pk=1) VALUES (999)")
    got = sorted((r.pk, r.x) for r in c.get_table("owi").read().collect())
    assert got == [(1, 999), (2, 20)]


def test_merge_conditional_clauses_first_match_wins(spark, wh):
    """Multiple WHEN MATCHED AND <cond> clauses evaluate in order; the
    first whose condition holds decides the action
    (ref: MergeIntoPaimonTable.scala:47 matchedActions ordering)."""
    c = _cat(spark, wh)
    c.create_table("mm", KV, primary_keys=["k"], options={"bucket": "1"})
    c.create_table("ms", KV)
    c.sql("INSERT INTO mm VALUES (1, 'a', 5.0), (2, 'b', 50.0), "
          "(3, 'c', 500.0)")
    c.sql("INSERT INTO ms VALUES (1, 'X', 1.0), (2, 'Y', 2.0), "
          "(3, 'Z', 3.0), (4, 'W', 4.0)")
    c.sql("""MERGE INTO mm AS t USING ms AS s ON t.k = s.k
             WHEN MATCHED AND t.amt < 10 THEN DELETE
             WHEN MATCHED AND t.amt < 100 THEN UPDATE SET v = s.v
             WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt
             WHEN NOT MATCHED AND s.amt > 3 THEN INSERT *""")
    # k=1: amt<10 → deleted (even though later clauses also match)
    # k=2: amt<100 → v updated only
    # k=3: fallback → amt += s.amt
    # k=4: insert (cond s.amt > 3 holds)
    assert rows(c, "mm") == [(2, "Y", 50.0), (3, "c", 503.0),
                             (4, "W", 4.0)]


def test_merge_not_matched_by_source_sql(spark, wh):
    c = _cat(spark, wh)
    c.create_table("nb", KV, primary_keys=["k"], options={"bucket": "1"})
    c.create_table("nbs", KV)
    c.sql("INSERT INTO nb VALUES (1, 'a', 1.0), (2, 'b', 2.0), "
          "(3, 'c', 3.0)")
    c.sql("INSERT INTO nbs VALUES (1, 'A', 10.0)")
    c.sql("""MERGE INTO nb AS t USING nbs AS s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET *
             WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE
             WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    assert rows(c, "nb") == [(1, "A", 10.0), (3, "stale", 3.0)]


def test_merge_insert_cols_values_sql(spark, wh):
    c = _cat(spark, wh)
    c.create_table("iv", KV, primary_keys=["k"], options={"bucket": "1"})
    c.create_table("ivs", KV)
    c.sql("INSERT INTO iv VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO ivs VALUES (1, 'A', 10.0), (5, 'e', 55.0)")
    c.sql("""MERGE INTO iv AS t USING ivs AS s ON t.k = s.k
             WHEN NOT MATCHED THEN
               INSERT (k, v) VALUES (s.k, upper(s.v))""")
    assert rows(c, "iv") == [(1, "a", 1.0), (5, "E", None)]


def test_merge_unsupported_clause_raises(spark, wh):
    """A clause the parser can't understand must raise, never be
    silently dropped (r3 ADVICE: re.findall swallowed conditional
    clauses)."""
    c = _cat(spark, wh)
    c.create_table("mr", KV, primary_keys=["k"], options={"bucket": "1"})
    c.create_table("mrs", KV)
    c.sql("INSERT INTO mr VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO mrs VALUES (1, 'A', 10.0)")
    with pytest.raises(ValueError):
        c.sql("""MERGE INTO mr AS t USING mrs AS s ON t.k = s.k
                 WHEN MATCHED THEN FROBNICATE""")


def test_merge_append_table_full_surface_sql(spark, wh):
    """Conditional matched clauses + NOT MATCHED BY SOURCE on an
    append (non-PK) table run through the COW path."""
    c = _cat(spark, wh)
    c.create_table("ap", KV)            # no primary keys
    c.create_table("aps", KV)
    c.sql("INSERT INTO ap VALUES (1, 'a', 1.0), (2, 'b', 2.0), "
          "(3, 'c', 3.0), (4, 'd', 4.0)")
    c.sql("INSERT INTO aps VALUES (1, 'A', 10.0), (2, 'B', 0.5), "
          "(9, 'i', 9.0)")
    c.sql("""MERGE INTO ap AS t USING aps AS s ON t.k = s.k
             WHEN MATCHED AND s.amt < 1 THEN DELETE
             WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
             WHEN NOT MATCHED THEN INSERT *
             WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN DELETE
             WHEN NOT MATCHED BY SOURCE THEN UPDATE SET amt = t.amt * 2""")
    # k=1 updated, k=2 deleted (s.amt<1), k=3 amt doubled, k=4 deleted,
    # k=9 inserted
    assert rows(c, "ap") == [(1, "A", 10.0), (3, "c", 6.0), (9, "i", 9.0)]


def test_alter_table_sql(spark, wh):
    """ALTER TABLE through SQL: add/rename/drop/retype columns,
    properties, table rename (ref: SparkCatalog.alterTable →
    SchemaChange.java)."""
    c = _cat(spark, wh)
    c.create_table("al", KV)
    c.sql("INSERT INTO al VALUES (1, 'a', 1.0)")
    c.sql("ALTER TABLE al ADD COLUMN note STRING")
    c.sql("INSERT INTO al VALUES (2, 'b', 2.0, 'hello')")
    t = c.get_table("al")
    got = {r.k: r.note for r in t.read().collect()}
    assert got == {1: None, 2: "hello"}          # evolution fills nulls
    c.sql("ALTER TABLE al RENAME COLUMN note TO comment")
    assert "comment" in c.get_table("al").schema.field_names
    # old files still readable through the rename (field-id mapping)
    got = {r.k: r.comment for r in c.get_table("al").read().collect()}
    assert got == {1: None, 2: "hello"}
    c.sql("ALTER TABLE al DROP COLUMN comment")
    assert "comment" not in c.get_table("al").schema.field_names
    c.sql("ALTER TABLE al SET TBLPROPERTIES ('write.batch' = '9')")
    assert c.get_table("al").schema.options["write.batch"] == "9"
    c.sql("ALTER TABLE al UNSET TBLPROPERTIES ('write.batch')")
    assert "write.batch" not in c.get_table("al").schema.options
    c.sql("ALTER TABLE al ADD COLUMNS (x BIGINT, y DOUBLE)")
    fn = c.get_table("al").schema.field_names
    assert "x" in fn and "y" in fn
    c.sql("ALTER TABLE al RENAME TO al2")
    assert c.get_table("al2").read().count() == 2
    assert not c.table_exists("al")
    with pytest.raises(ValueError):
        c.sql("ALTER TABLE al2 FROBNICATE")


def test_create_drop_table_sql(spark, wh):
    """CREATE TABLE with the reference's Spark DDL conventions —
    primary keys / bucketing via TBLPROPERTIES — plus CTAS and DROP."""
    c = _cat(spark, wh)
    c.sql("""CREATE TABLE ct (k BIGINT, v STRING, amt DOUBLE)
             PARTITIONED BY (v)
             TBLPROPERTIES ('primary-key' = 'k,v', 'bucket' = '2')""")
    t = c.get_table("ct")
    assert t.schema.primary_keys == ["k", "v"]
    assert t.schema.partition_keys == ["v"]
    assert t.schema.options["bucket"] == "2"
    c.sql("INSERT INTO ct VALUES (1, 'a', 1.0), (1, 'a', 9.0)")
    assert rows(c, "ct") == [(1, "a", 9.0)]      # PK upsert works
    # IF NOT EXISTS is a no-op; bare duplicate raises
    c.sql("CREATE TABLE IF NOT EXISTS ct (k BIGINT)")
    with pytest.raises(FileExistsError):
        c.sql("CREATE TABLE ct (k BIGINT)")
    # CTAS
    c.sql("""CREATE TABLE ct2 TBLPROPERTIES ('primary-key'='k',
             'bucket'='1') AS SELECT k, amt FROM ct""")
    assert sorted(tuple(r) for r in c.get_table("ct2").read().collect()) \
        == [(1, 9.0)]
    c.sql("DROP TABLE ct2")
    assert not c.table_exists("ct2")
    c.sql("DROP TABLE IF EXISTS ct2")            # no-op
    with pytest.raises(FileNotFoundError):
        c.sql("DROP TABLE ct2")


def test_time_travel_describe_show_create_sql(spark, wh):
    c = _cat(spark, wh)
    c.sql("""CREATE TABLE tt (k BIGINT, v STRING, amt DOUBLE)
             TBLPROPERTIES ('primary-key'='k', 'bucket'='1')""")
    c.sql("INSERT INTO tt VALUES (1, 'a', 1.0)")          # snapshot 1
    c.sql("INSERT INTO tt VALUES (1, 'b', 2.0), (2, 'c', 3.0)")  # snap 2
    cur = c.sql("SELECT * FROM tt ORDER BY k").collect()
    assert [(r.k, r.v) for r in cur] == [(1, "b"), (2, "c")]
    old = c.sql("SELECT * FROM tt VERSION AS OF 1").collect()
    assert [(r.k, r.v) for r in old] == [(1, "a")]
    # DESCRIBE
    d = {r.col_name: (r.data_type, r.comment)
         for r in c.sql("DESCRIBE TABLE tt").collect()}
    assert d["k"] == ("bigint", "primary key")
    assert d["v"][0] == "string"
    # SHOW CREATE TABLE round-trips through the parser
    ddl = c.sql("SHOW CREATE TABLE tt").collect()[0].createtab_stmt
    assert "primary-key" in ddl and "bucket" in ddl
    c.sql(ddl.replace("CREATE TABLE tt", "CREATE TABLE tt_copy"))
    assert c.get_table("tt_copy").schema.primary_keys == ["k"]


def test_incremental_tvfs_sql(spark, wh):
    """paimon_incremental_* table-valued functions through SQL
    (ref: PaimonTableValuedFunctions.scala:56-67)."""
    c = _cat(spark, wh)
    c.sql("""CREATE TABLE iq (k BIGINT, v STRING, amt DOUBLE)
             TBLPROPERTIES ('primary-key'='k', 'bucket'='1')""")
    c.sql("INSERT INTO iq VALUES (1, 'a', 1.0)")            # snap 1
    c.sql("INSERT INTO iq VALUES (2, 'b', 2.0)")            # snap 2
    c.sql("INSERT INTO iq VALUES (1, 'A', 9.0)")            # snap 3
    got = c.sql("SELECT k, v FROM paimon_incremental_query('iq', 1, 3) "
                "ORDER BY k").collect()
    assert [(r.k, r.v) for r in got] == [(1, "A"), (2, "b")]
    # auto-tag variant
    from paimon_spark.procedures import call
    t = c.get_table("iq")
    call(spark, "create_tag", table=t, tag="2026-01-01", snapshot=1)
    call(spark, "create_tag", table=t, tag="2026-01-02", snapshot=3)
    got = c.sql("SELECT k, v FROM "
                "paimon_incremental_to_auto_tag('iq', '2026-01-02') "
                "ORDER BY k").collect()
    assert [(r.k, r.v) for r in got] == [(1, "A"), (2, "b")]


def test_dollar_system_table_syntax(spark, wh):
    """The reference's `t$snapshots` system-table spelling (backticked
    for Spark's parser) resolves to the registered system views."""
    c = _cat(spark, wh)
    c.create_table("st", KV, primary_keys=["k"], options={"bucket": "1"})
    c.sql("INSERT INTO st VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO st VALUES (2, 'b', 2.0)")
    n = c.sql("SELECT count(*) AS n FROM `st$snapshots`").collect()[0].n
    assert n == 2
    f = c.sql("SELECT count(*) AS n FROM `st$files`").collect()[0].n
    assert f >= 1


def test_extended_system_views(spark, wh):
    """`$ro` / `$read_optimized`, `$statistics` and `$binlog` system
    tables through SQL (ref: table/system/ReadOptimizedTable,
    StatisticsTable, BinlogTable)."""
    c = _cat(spark, wh)
    c.create_table("sv", KV, primary_keys=["k"], options={"bucket": "1"})
    c.sql("INSERT INTO sv VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO sv VALUES (1, 'b', 2.0)")
    t = c.get_table("sv")
    t.compact()
    t.analyze()
    ro = c.sql("SELECT * FROM `sv$ro`").collect()
    assert [(r.k, r.v) for r in ro] == [(1, "b")]
    st = c.sql("SELECT * FROM `sv$statistics`")
    assert st.count() >= 1
    bl = c.sql("SELECT * FROM `sv$binlog`")
    assert bl.count() >= 1


def test_database_ddl_sql(spark, wh):
    c = _cat(spark, wh)
    c.sql("CREATE DATABASE sales")
    assert "sales" in [r.namespace
                       for r in c.sql("SHOW DATABASES").collect()]
    c.sql("CREATE TABLE sales.fact (k BIGINT, v STRING)")
    c.sql("INSERT INTO sales.fact VALUES (1, 'x')")
    assert c.get_table("sales.fact").read().count() == 1
    with pytest.raises(ValueError, match="CASCADE"):
        c.sql("DROP DATABASE sales")
    c.sql("DROP DATABASE sales CASCADE")
    assert "sales" not in [r.namespace
                           for r in c.sql("SHOW DATABASES").collect()]


def test_search_tvfs(spark, wh):
    """paimon_full_text_search / paimon_vector_search TVFs (ref:
    FullTextSearchTable / VectorSearchTable)."""
    from paimon_spark import Catalog
    from pyspark.sql import types as T
    cat = Catalog(wh, spark)
    sch = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    t = cat.create_table("docs_s", sch)
    t.append(spark.createDataFrame([
        (1, "spark engine query plan", [1.0, 0.0]),
        (2, "cooking pasta recipe", [0.0, 1.0]),
        (3, "query optimizer spark shuffle", [0.9, 0.1])], sch))
    top = cat.sql("SELECT doc_id FROM "
                  "paimon_full_text_search('docs_s', 'spark query', 2)") \
        .collect()
    assert {r.doc_id for r in top} == {1, 3}
    vs = cat.sql("SELECT doc_id FROM "
                 "paimon_vector_search('docs_s', '1.0,0.05', 1)").first()
    assert vs.doc_id in (1, 3)
    # search options (ref: VectorSearchOptionsTest): method + nprobe
    # route through the persisted IVF index
    t.create_vector_index("embedding", id_col="doc_id", n_centroids=2)
    vi = cat.sql("SELECT doc_id FROM paimon_vector_search("
                 "'docs_s', '1.0,0.05', 1, 'ivf', 2)").first()
    assert vi.doc_id in (1, 3)
    hs = cat.sql(
        "SELECT doc_id FROM "
        "paimon_hybrid_search('docs_s', 'spark query', '0.9,0.1', 2)") \
        .collect()
    assert {r.doc_id for r in hs} <= {1, 3} and hs


def test_tag_sql_extensions_and_create_table_like(spark, wh):
    """The reference's SQL extension statements
    (PaimonSqlExtensions.g4): SHOW TAGS, ALTER TABLE ... CREATE/
    DELETE/RENAME TAG, CREATE TABLE LIKE."""
    c = _cat(spark, wh)
    c.create_table("src", KV, primary_keys=["k"],
                   options={"bucket": "2"})
    c.sql("INSERT INTO src VALUES (1, 'a', 1.0)")
    c.sql("INSERT INTO src VALUES (2, 'b', 2.0)")

    c.sql("ALTER TABLE src CREATE TAG t1 AS OF VERSION 1")
    c.sql("ALTER TABLE src CREATE TAG t2")
    tags = {r.tag_name: r.snapshot_id
            for r in c.sql("SHOW TAGS src").collect()}
    assert tags == {"t1": 1, "t2": 2}
    # IF NOT EXISTS no-op; bare duplicate raises; OR REPLACE repoints
    c.sql("ALTER TABLE src CREATE TAG IF NOT EXISTS t1")
    with pytest.raises(FileExistsError):
        c.sql("ALTER TABLE src CREATE TAG t1")
    c.sql("ALTER TABLE src CREATE OR REPLACE TAG t1 AS OF VERSION 2")
    assert {r.tag_name: r.snapshot_id
            for r in c.sql("SHOW TAGS src").collect()}["t1"] == 2
    c.sql("ALTER TABLE src RENAME TAG t2 TO t2r")
    c.sql("ALTER TABLE src DELETE TAG t1")
    c.sql("ALTER TABLE src DELETE TAG IF EXISTS missing")
    with pytest.raises(FileNotFoundError):
        c.sql("ALTER TABLE src DELETE TAG missing")
    assert set(c.get_table("src").paths.list_tags()) == {"t2r"}

    # CREATE TABLE LIKE copies schema/pk/options, no data
    c.sql("CREATE TABLE dst LIKE src TBLPROPERTIES ('bucket' = '4')")
    d = c.get_table("dst")
    assert d.schema.primary_keys == ["k"]
    assert d.schema.options["bucket"] == "4"
    assert [f.name for f in d.schema.struct.fields] == ["k", "v", "amt"]
    assert d.read().count() == 0
    c.sql("CREATE TABLE IF NOT EXISTS dst LIKE src")   # no-op
    with pytest.raises(FileExistsError):
        c.sql("CREATE TABLE dst LIKE src")


def test_copy_into_sql_statements(spark, wh, tmp_path):
    """COPY INTO SQL routing (PaimonSqlExtensions.g4 #copyIntoTable /
    #copyIntoLocation / #copyIntoLocationFromQuery) + PATTERN / FORCE /
    ON_ERROR clauses and self-expiring tags via RETAIN."""
    import os
    c = _cat(spark, wh)
    c.create_table("cp", KV)
    src = str(tmp_path / "stage")
    os.makedirs(src)
    spark.createDataFrame([(1, "a", 1.0)], KV).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}/b1")
    spark.createDataFrame([(2, "b", 2.0)], KV).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}/b2")
    # pattern restricts to one batch dir
    got = c.sql("COPY INTO cp FROM '%s' FILE_FORMAT = (TYPE = PARQUET) "
                "PATTERN = 'b1/.*'" % src).collect()
    assert got[0].rows_loaded == 1
    # second run loads only the remaining delta (idempotent history)
    got = c.sql("COPY INTO cp FROM '%s' "
                "FILE_FORMAT = (TYPE = PARQUET)" % src).collect()
    assert got[0].rows_loaded == 1
    assert rows(c, "cp") == [(1, "a", 1.0), (2, "b", 2.0)]
    # FORCE reloads everything
    got = c.sql("COPY INTO cp FROM '%s' FILE_FORMAT = (TYPE = PARQUET) "
                "FORCE = true" % src).collect()
    assert got[0].rows_loaded == 2
    # ON_ERROR = CONTINUE skips an unreadable file instead of aborting
    with open(f"{src}/broken.parquet", "w") as f:
        f.write("not parquet")
    got = c.sql("COPY INTO cp FROM '%s' FILE_FORMAT = (TYPE = PARQUET) "
                "FORCE = true ON_ERROR = CONTINUE" % src).collect()
    assert got[0].rows_loaded == 2

    # export: COPY INTO location FROM table / query
    out1 = str(tmp_path / "out1")
    c.sql("COPY INTO '%s' FROM cp FILE_FORMAT = (TYPE = PARQUET)" % out1)
    assert spark.read.parquet(out1).count() == 6
    out2 = str(tmp_path / "out2")
    c.sql("COPY INTO '%s' FROM (SELECT k FROM cp WHERE k = 1) "
          "FILE_FORMAT = (TYPE = PARQUET) OVERWRITE = true" % out2)
    assert spark.read.parquet(out2).columns == ["k"]

    # RETAIN tag expires on the next commit's maintenance sweep
    c.sql("ALTER TABLE cp CREATE TAG ephemeral RETAIN 1 MINUTES")
    t = c.get_table("cp")
    meta_path = t.paths.tag_file("ephemeral")
    import json as _json
    with open(meta_path) as f:
        meta = _json.load(f)
    assert meta["time_retained_ms"] == 60_000
    meta["created_ms"] -= 120_000          # age it past its retention
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    c.sql("INSERT INTO cp VALUES (9, 'z', 9.0)")   # commit → sweep
    assert "ephemeral" not in t.paths.list_tags()


def test_sql_colocated_join_no_exchange(spark, wh):
    """SQL joins between co-bucketed tables plan with ZERO Exchange:
    registered views wrap Table.read(), which exposes planned files as a
    Spark bucketed table, so Catalyst sees matching HashPartitioning on
    both sides of the join (the reference's bucketed-scan co-location,
    ref: paimon-spark/.../PaimonScan.scala:115 KeyGroupedPartitioning;
    DisableUnnecessaryPaimonBucketedScanSuite)."""
    c = _cat(spark, wh)
    c.create_table("codim", T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType())]),
        primary_keys=["k"], options={"bucket": "4"})
    c.create_table("cofact", T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("amt", T.DoubleType())]),
        primary_keys=["k"], options={"bucket": "4"})
    c.sql("INSERT INTO codim SELECT id, concat('v', id) FROM range(300)")
    c.sql("INSERT INTO cofact SELECT id, cast(id AS double) "
          "FROM range(300)")
    c.get_table("codim").compact()
    c.get_table("cofact").compact()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q = ("SELECT d.k, d.v, f.amt FROM codim d "
             "JOIN cofact f ON d.k = f.k")
        df = c.sql(q)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 2
        assert "Exchange" not in plan
        assert df.count() == 300
        # the EXPLAIN surface a user would check shows the same thing
        txt = "\n".join(r[0] for r in c.sql("EXPLAIN " + q).collect())
        assert "Exchange" not in txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sql_partition_management(spark, wh):
    """ALTER TABLE DROP PARTITION / TRUNCATE TABLE PARTITION — the
    reference's partition management surface
    (PaimonPartitionManagement.scala: dropPartitions = file-level
    truncate commit; createPartitions is metastore-only, a no-op on a
    filesystem catalog). Batch + partial specs, typed values, NULL
    partitions."""
    c = _cat(spark, wh)
    c.sql("CREATE TABLE pmgmt (id BIGINT, dt STRING, hh INT, v DOUBLE) "
          "PARTITIONED BY (dt, hh)")
    c.sql("INSERT INTO pmgmt VALUES "
          "(1, '20240101', 0, 1.0), (2, '20240101', 1, 2.0), "
          "(3, '20240102', 0, 3.0), (4, '20240102', 1, 4.0), "
          "(5, NULL, 0, 5.0)")
    t = c.get_table("pmgmt")
    pre_files = {e.file_path for e in t.new_scan().plan().entries}
    # full-spec drop
    c.sql("ALTER TABLE pmgmt DROP PARTITION (dt='20240101', hh=0)")
    assert {r.id for r in c.sql("SELECT id FROM pmgmt").collect()} == \
        {2, 3, 4, 5}
    # the drop is file-level: surviving files are untouched (no rewrite)
    t = c.get_table("pmgmt")
    post_files = {e.file_path for e in t.new_scan().plan().entries}
    assert post_files < pre_files
    # batch + partial specs in one statement = one commit
    s0 = t.paths.latest_snapshot_id()
    c.sql("ALTER TABLE pmgmt DROP PARTITION (dt='20240101'), "
          "PARTITION (dt='20240102', hh=1)")
    t = c.get_table("pmgmt")
    assert t.paths.latest_snapshot_id() == s0 + 1
    assert {r.id for r in c.sql("SELECT id FROM pmgmt").collect()} == \
        {3, 5}
    # NULL partition drop (ref test: drop null partition)
    c.sql("ALTER TABLE pmgmt DROP PARTITION (dt=null)")
    assert {r.id for r in c.sql("SELECT id FROM pmgmt").collect()} == {3}
    # TRUNCATE TABLE ... PARTITION
    c.sql("INSERT INTO pmgmt VALUES (6, '20240103', 2, 6.0)")
    c.sql("TRUNCATE TABLE pmgmt PARTITION (dt='20240103')")
    assert {r.id for r in c.sql("SELECT id FROM pmgmt").collect()} == {3}
    # ADD PARTITION: accepted no-op (metastore-only in the reference)
    c.sql("ALTER TABLE pmgmt ADD PARTITION (dt='20240109', hh=9)")
    # non-partition column is rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a partition column"):
        c.sql("ALTER TABLE pmgmt DROP PARTITION (id=1)")


def test_sql_drop_partition_pk_physical_truncate(spark, wh):
    """DROP PARTITION on a partition-keyed PK table drops whole files
    (truncate commit) instead of writing -D tombstones — matching
    PaimonPartitionManagement.dropPartitions; SHOW PARTITIONS stops
    listing the partition and time travel still sees the old rows.
    Cross-partition-update tables keep the tombstone path (their
    global index needs the retractions)."""
    c = _cat(spark, wh)
    c.sql("CREATE TABLE ppk (id BIGINT, d DATE, v DOUBLE) "
          "PARTITIONED BY (d) "
          "TBLPROPERTIES ('primary-key'='id,d', 'bucket'='2')")
    c.sql("INSERT INTO ppk VALUES (1, DATE'2024-01-01', 1.0), "
          "(2, DATE'2024-01-02', 2.0), (3, DATE'2024-01-02', 3.0)")
    c.sql("ALTER TABLE ppk DROP PARTITION (d='2024-01-02')")
    t = c.get_table("ppk")
    # physical: no file of the dropped partition survives, no new files
    assert all("2024-01-02" not in e.file_path
               for e in t.new_scan().plan().entries)
    parts = [r[0] for r in c.sql("SHOW PARTITIONS ppk").collect()]
    assert all("2024-01-02" not in p for p in parts)
    assert sorted(r.id for r in c.sql("SELECT id FROM ppk").collect()) \
        == [1]
    assert t.read(snapshot_id=1).count() == 3
    # PK upsert still works afterwards
    c.sql("INSERT INTO ppk VALUES (9, DATE'2024-01-05', 1.0)")
    c.sql("INSERT INTO ppk VALUES (9, DATE'2024-01-05', 7.5)")
    vals = {r.id: r.v for r in c.sql("SELECT id, v FROM ppk").collect()}
    assert vals == {1: 1.0, 9: 7.5}


def test_sql_msck_show_columns_refresh(spark, wh):
    """MSCK REPAIR TABLE (hint/dir re-sync on a filesystem catalog),
    SHOW COLUMNS, REFRESH TABLE — the remaining Spark maintenance verbs
    (ref suites: CatalogManagedPartitionMsckRepairTest,
    PaimonShowColumnsTest, RefreshTableTest)."""
    import os
    c = _cat(spark, wh)
    c.sql("CREATE TABLE mk (id BIGINT, dt STRING, v DOUBLE) "
          "PARTITIONED BY (dt)")
    c.sql("INSERT INTO mk VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    cols = [r.col_name for r in c.sql("SHOW COLUMNS FROM mk").collect()]
    assert cols == ["id", "dt", "v"]
    t = c.get_table("mk")
    hint = os.path.join(t.path, "snapshot", "LATEST")
    os.remove(hint)                       # drift: hint lost
    c.sql("MSCK REPAIR TABLE mk SYNC PARTITIONS")
    assert os.path.exists(hint)
    assert c.sql("SELECT * FROM mk").count() == 2
    # REFRESH TABLE re-registers the view over the newest snapshot
    c.sql("INSERT INTO mk VALUES (3, 'c', 3.0)")
    c.sql("REFRESH TABLE mk")
    assert spark.sql("SELECT count(*) c FROM mk").collect()[0].c == 3
