"""Time individual declared queries (min-of-N, same methodology as
bench.py: fn() + .count(), drain barrier between reps) and optionally
dump .explain("formatted") to a file.

Usage:
  python tools/bench_one.py [--sf DIR] [--reps N] [--plans OUTDIR] q1 q2 ...
  python tools/bench_one.py --sf /root/testdata/sf0.1 dedup_embedding_cosine

With no query names: times every declared query (ingest first, reported
separately). SPARK_GRAFT_CPUS honored (default 32).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="dir to write <query>_<suffix>.txt explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-one", cpus=cpus)

    t0 = time.perf_counter()
    E._wh(spark, args.sf)
    print(f"{'ingest':34s} {time.perf_counter() - t0:7.3f}s", flush=True)

    qs = E.queries()
    names = args.queries or [n for n in qs]
    for name in names:
        fn = qs[name]
        best = float("inf")
        for r in range(args.reps):
            spark.range(1).count()          # drain barrier
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.count()
            el = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = min(best, el)
        print(f"{name:34s} {best:7.3f}s", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                df = fn(spark, args.sf)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception as exc:   # noqa: BLE001
                txt = f"explain failed: {exc!r}"
            with open(os.path.join(args.plans,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)


if __name__ == "__main__":
    main()
