"""End-to-end driver-contract parity at sf0.001 (fast subset of the full
sf0.01 gate; run `python tools/check_oracle.py` for the full one)."""

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracle import TABLES, canon

SF = "/root/testdata/sf0.001"

FAST = [
    "q1_pricing_summary", "q6_revenue", "topn_orders", "point_lookup",
    "metadata_count", "pk_upsert_latest", "pk_after_delete",
    "incremental_diff", "agg_engine_user_stats", "partial_update_orders",
    "first_row_events", "dedup_exact", "dedup_simhash", "text_quality",
    "text_langid", "ann_brute_topk", "window_user_ranks",
    "dedup_embedding_cosine", "ann_ivf_topk", "q21_waiting_suppliers",
    "rollup_pricing", "multimodal_bytes_meta", "q2_min_cost_supplier",
    "q20_excess_shipments", "pipeline_clean_corpus",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(E.oracle_sql()[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon([tuple(r) for r in srows], scols) == canon(drows, dcols)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
