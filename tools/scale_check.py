"""Scale posture evidence: run headline queries at sf0.001 / 0.01 / 0.1
(100× data spread) and — with --with-sf1 — at a generated sf1 (1000×).
A query whose time grows far slower than data size is dominated by fixed
overhead (fine); one whose time grows FASTER than data is super-linear —
a red flag for 100 TB.

sf1 is derived from sf0.1 by replicating the FACT tables 10× with
disjoint key ranges (dims unchanged, FK offsets consistent, document
texts deterministically perturbed so dedup workloads stay near-dup
rather than exact-copy). Cached under $SPARK_GRAFT_SF1_DIR
(default /tmp/paimon_sf1) — generated once, ~1 min.

Usage: python tools/scale_check.py [--with-sf1] [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/paimon_sf1")
HEADLINE = ["q1_pricing_summary", "q5_region_revenue", "q6_revenue",
            "q21_waiting_suppliers", "pk_upsert_latest", "dedup_exact",
            "dedup_minhash_pairs", "ann_ivf_topk", "window_user_ranks",
            "iceberg_mirror_read", "contamination_4gram", "pii_redact",
            "clustered_write_prune", "blob_roundtrip", "dedup_clusters",
            "pipeline_clean_corpus", "text_langid", "sketch_hll_users",
            "dedup_embedding_cosine", "cdc_sync_evolution",
            "stream_window_counts", "pack_training_sequences",
            "mixture_token_budget", "changelog_old_vs_new",
            "changelog_decoupled_window"]

# fact tables get disjoint id ranges per copy; dims are shared
_FACT_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIMS = ["region", "nation", "customer", "supplier", "part"]
_OFF = 10_000_000_000


def ensure_sf1(spark, src="/root/testdata/sf0.1", dst=SF1_DIR):
    from pyspark.sql import functions as F
    os.makedirs(dst, exist_ok=True)
    for name in _DIMS:
        out = os.path.join(dst, f"{name}.parquet")
        if not os.path.exists(out):
            spark.read.parquet(os.path.join(src, f"{name}.parquet")) \
                .write.mode("overwrite").parquet(out)
    for name, keys in _FACT_OFFSETS.items():
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = []
        for i in range(10):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * _OFF))
                                 .cast(base.schema[k].dataType))
            if name == "documents" and i > 0:
                # perturb so replicas are NEAR-dups, not exact copies —
                # keeps the dedup workloads representative
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rep{i}")))
            parts.append(c)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
    return dst


def main():
    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    args = sys.argv[1:]
    with_sf1 = "--with-sf1" in args
    only = [a for a in args if not a.startswith("--")] or HEADLINE
    spark = get_spark("scale-check", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    sfs = list(SFS)
    if with_sf1:
        sfs.append(ensure_sf1(spark))
    # warehouse ingest (build ~15 engine tables from the raw parquet,
    # multiple commits each) is charged to its OWN row — first-toucher
    # queries would otherwise absorb it and read dirty (r7 verdict #7)
    ingest_times = []
    for sf in sfs:
        t0 = time.perf_counter()
        E._wh(spark, sf)
        ingest_times.append(time.perf_counter() - t0)
    qs = E.queries()
    heads = ["sf0.001", "sf0.01", "sf0.1"] + (["sf1"] if with_sf1 else [])
    spread = 1000 if with_sf1 else 100
    print(f"{'query':28s} " + " ".join(f"{h:>8s}" for h in heads)
          + f" {'t(max)/t(min-sf)':>17s}  (data is {spread}x)")
    iratio = (ingest_times[-1] / ingest_times[0] if ingest_times[0]
              else float("inf"))
    print(f"{'ingest (warehouse build)':28s} "
          + " ".join(f"{t:8.3f}" for t in ingest_times)
          + f" {iratio:17.1f}"
          + ("  (0.000 = cached from an earlier run)"
             if min(ingest_times) < 0.05 else ""))
    for name in only:
        fn = qs[name]
        times = []
        for sf in sfs:
            # count(), not collect(): full-table queries (pk_upsert,
            # time travel) would otherwise charge driver-side row
            # serialization — ~9 s for 1.5 M rows at sf1 — to the
            # engine (bench.py times count() for the same reason)
            fn(spark, sf).count()              # warm plan+code paths
            t0 = time.perf_counter()
            fn(spark, sf).count()
            times.append(time.perf_counter() - t0)
        ratio = times[-1] / times[0] if times[0] else float("inf")
        flag = "  <-- SUPERLINEAR" if ratio > spread else ""
        print(f"{name:28s} " + " ".join(f"{t:8.3f}" for t in times)
              + f" {ratio:17.1f}{flag}")


if __name__ == "__main__":
    main()
