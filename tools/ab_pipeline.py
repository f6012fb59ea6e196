"""Interleaved A/B for the r14 pipeline_curated_corpus restructure:
OLD = inner-join soft_dedup_weights + doc_id==cluster_id filter;
NEW = anti-join against cc_nonsurvivors (what the query now does).
Also reports Spark job counts per variant (load-immune) and verifies
the two outputs are identical (exceptAll both ways).

Usage: python tools/ab_pipeline.py [sf_dir] [pairs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from paimon_spark import functions as PF  # noqa: E402
from paimon_spark.functions import dedup as DD  # noqa: E402
from paimon_spark.functions import text as TX  # noqa: E402
from paimon_spark.session import get_spark  # noqa: E402


def old_variant(spark, sf_dir):
    docs = E._read(spark, sf_dir, "documents")
    lm = TX.ngram_lm_quality(docs, "doc_id", "text")
    w = DD.soft_dedup_weights(docs, "doc_id", "text", 16, 4)
    joined = (docs.join(lm, "doc_id").join(w, "doc_id")
              .filter((F.col("lm_score") >= -6.5)
                      & (F.col("doc_id") == F.col("cluster_id"))))
    toks = joined.select(
        "doc_id", "lang", "lm_score",
        TX.token_count(F.col("text")).cast("long").alias("__nt"))
    return (toks.groupBy("lang")
            .agg(F.count("*").cast("long").alias("docs_kept"),
                 F.sum("__nt").cast("long").alias("total_tokens"),
                 F.round(F.avg("lm_score"), 6).alias("mean_lm")))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-pipeline", cpus=32)
    st = spark.sparkContext.statusTracker()

    new_fn = E.pipeline_curated_corpus

    # one-time equality check
    a = old_variant(spark, sf_dir)
    b = new_fn(spark, sf_dir)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"equality: exceptAll old-new={d1} new-old={d2}", flush=True)
    spark.catalog.clearCache()

    def run(fn):
        spark.range(1).count()
        j0 = len(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        el = time.perf_counter() - t0
        j1 = len(st.getJobIdsForGroup(None) or [])
        spark.catalog.clearCache()
        return el, j1 - j0 - 1, n

    olds, news = [], []
    for i in range(pairs):
        eo, jo, _ = run(old_variant)
        en, jn, _ = run(new_fn)
        olds.append(eo)
        news.append(en)
        print(f"pair{i}: old={eo:.3f}s ({jo} jobs)  "
              f"new={en:.3f}s ({jn} jobs)", flush=True)
    print(f"min: old={min(olds):.3f}  new={min(news):.3f}", flush=True)


if __name__ == "__main__":
    main()
