"""Scale posture evidence: run headline queries at sf0.001 / 0.01 / 0.1
(100× data spread) and report wall-time scaling. A query whose time grows
far slower than data size is dominated by fixed overhead (fine); one whose
time grows FASTER than data is super-linear — a red flag for 100 TB.

Usage: python tools/scale_check.py [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
HEADLINE = ["q1_pricing_summary", "q5_region_revenue", "q6_revenue",
            "q21_waiting_suppliers", "pk_upsert_latest", "dedup_exact",
            "dedup_minhash_pairs", "ann_ivf_topk", "window_user_ranks",
            "iceberg_mirror_read", "contamination_4gram", "pii_redact",
            "clustered_write_prune", "blob_roundtrip", "dedup_clusters"]


def main():
    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    only = sys.argv[1:] or HEADLINE
    spark = get_spark("scale-check", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    for sf in SFS:
        E._wh(spark, sf)                       # ingest outside timing
    qs = E.queries()
    print(f"{'query':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'t(0.1)/t(0.001)':>16s}  (data is 100x)")
    for name in only:
        fn = qs[name]
        times = []
        for sf in SFS:
            fn(spark, sf).collect()            # warm plan+code paths
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            times.append(time.perf_counter() - t0)
        ratio = times[-1] / times[0] if times[0] else float("inf")
        flag = "  <-- SUPERLINEAR" if ratio > 100 else ""
        print(f"{name:28s} {times[0]:8.3f} {times[1]:8.3f} {times[2]:8.3f} "
              f"{ratio:16.1f}{flag}")


if __name__ == "__main__":
    main()
