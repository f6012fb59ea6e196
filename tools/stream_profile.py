"""Decompose the streaming bench queries' wall time (r14, VERDICT #1).

Phases per query: warehouse (amortized), query construction (driver),
stream start -> termination (the drain), batch-side summary count.
Plus Spark's own durationMs from the last progress and the Spark job
count attributable to the drain (statusTracker delta).

Usage: python tools/stream_profile.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from paimon_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("stream_profile", cpus=32)
    t0 = time.perf_counter()
    E._wh(spark, sf_dir)
    print(f"warehouse: {time.perf_counter() - t0:.2f}s", flush=True)
    st = spark.sparkContext.statusTracker()

    for name in ("stream_patched_followup", "stream_patched_drain",
                 "stream_window_counts"):
        fn = getattr(E, name)
        for r in range(reps):
            spark.range(1).count()
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            print(f"{name} rep{r}: total={t2-t0:.3f} fn={t1-t0:.3f} "
                  f"count={t2-t1:.3f} rows={n}", flush=True)

    # fine-grained: followup phases inside fn
    import uuid as _uuid
    from paimon_spark.streaming.datasource import _stream_schema, register
    t = E._wh(spark, sf_dir)["docs_de"]
    for r in range(reps):
        spark.range(1).count()
        p0 = time.perf_counter()
        register(spark)
        p1 = time.perf_counter()
        sink = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (spark.readStream.format("paimon")
             .schema(_stream_schema(t.schema))
             .option("path", t.path).option("availablenow", "true")
             .option("scan.mode", "from-snapshot")
             .option("scan.snapshot-id", "2")
             .load()
             .select("lang", "n_chars", "quality")
             .writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        p2 = time.perf_counter()
        q.awaitTermination(300)
        p3 = time.perf_counter()
        lp = q.lastProgress
        dur = lp["durationMs"] if lp else {}
        spark.table(sink).count()
        p4 = time.perf_counter()
        print(f"followup rep{r}: register={p1-p0:.3f} start={p2-p1:.3f} "
              f"drain={p3-p2:.3f} summary={p4-p3:.3f} durationMs={dur}",
              flush=True)


if __name__ == "__main__":
    main()
