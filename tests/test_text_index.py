"""Persisted inverted text index: term-bucketed posting lists with
partition pruning; index path == exact index-free BM25 path.

(ref shape: paimon-full-text/.../NativeFullTextGlobalIndexer.java; the
repo's persisted-IVF vector index follows the same contract.)"""

import os

import pytest
from pyspark.sql import types as T

from paimon_spark import Table

SCH = T.StructType([T.StructField("id", T.LongType()),
                    T.StructField("text", T.StringType())])

DOCS = [
    (1, "spark engine for big data processing"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark streaming engine"),
    (4, "a persisted inverted index for text search"),
    (5, "quick data engine"),
    (6, "completely unrelated content about cats"),
]


@pytest.fixture()
def docs_table(spark, wh):
    t = Table.create(f"{wh}/docs", SCH, spark=spark)
    t.append(spark.createDataFrame(DOCS, SCH))
    return t


def _ranked(df):
    return [(r.id, round(r._score, 9)) for r in df.collect()]


def test_index_path_equals_exact_path(spark, docs_table):
    t = docs_table
    exact = _ranked(t.full_text_search("spark engine", k=6))
    assert t.text_index_meta() is None          # no index yet → exact
    t.create_text_index(n_buckets=8)
    assert t.text_index_meta()["n_docs"] == 6
    indexed = _ranked(t.full_text_search("spark engine", k=6))
    assert sorted(indexed) == sorted(exact)
    # scores must rank doc 3 (3x spark) and 1/5 (engine+one term) high
    assert indexed[0][0] == 3


def test_index_prunes_to_query_term_buckets(spark, docs_table):
    t = docs_table
    t.create_text_index(n_buckets=16)
    idx_dir = t._text_index_dir("text")
    n_parts = len([d for d in os.listdir(idx_dir)
                   if d.startswith("bucket=")])
    assert n_parts > 2                          # enough spread to prune
    # the posting-list scan must carry a partition filter on bucket
    import contextlib
    import io
    df = t.full_text_search("spark", k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert "bucket" in buf.getvalue()
    # behavioral proof: corrupt every bucket EXCEPT the query term's —
    # if the search still succeeds, no other partition was read
    bucket = Table._term_bucket("spark", 16)
    for d in os.listdir(idx_dir):
        if d.startswith("bucket=") and d != f"bucket={bucket}":
            for fn in os.listdir(os.path.join(idx_dir, d)):
                if fn.endswith(".parquet"):
                    with open(os.path.join(idx_dir, d, fn), "wb") as f:
                        f.write(b"not parquet")
    got = t.full_text_search("spark", k=3).collect()
    assert {r.id for r in got} == {1, 3}


def test_stale_index_falls_back_to_exact(spark, docs_table):
    t = docs_table
    t.create_text_index(n_buckets=8)
    t.append(t.spark.createDataFrame(
        [(7, "fresh spark doc after the index build")], SCH))
    got = t.full_text_search("fresh spark", k=3)
    assert 7 in {r.id for r in got.collect()}   # stale index NOT used
    # rebuilding re-enables the index path and sees the new doc
    t.create_text_index(n_buckets=8)
    assert t.text_index_meta()["snapshot_id"] == \
        t.paths.latest_snapshot_id()
    got2 = {r.id for r in t.full_text_search("fresh spark", k=3).collect()}
    assert 7 in got2


def test_multi_term_df_and_missing_terms(spark, docs_table):
    t = docs_table
    t.create_text_index(n_buckets=8)
    exact = _ranked(t.full_text_search("quick zebra data", k=6))
    t.drop_text_index()
    rebuilt = _ranked(t.full_text_search("quick zebra data", k=6))
    assert sorted(exact) == sorted(rebuilt)


def test_text_index_via_procedure(spark, wh, docs_table):
    """CALL sys.create_text_index / drop_text_index surface."""
    from paimon_spark.procedures import call
    t = docs_table
    call(spark, "create_text_index", table=t.path, n_buckets=8)
    assert t.text_index_meta() is not None
    exact_vs_index = t.full_text_search("spark engine", k=6)
    assert exact_vs_index.count() > 0
    call(spark, "drop_text_index", table=t.path)
    assert t.text_index_meta() is None
