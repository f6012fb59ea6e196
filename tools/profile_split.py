"""Split each query's wall time into plan-construction (fn call, incl.
any eager driver work it does) vs action (count), min-of-N.

Usage: python tools/profile_split.py [--sf DIR] [--reps N] [q ...]
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
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    spark = get_spark("profile-split",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    t0 = time.perf_counter()
    E._wh(spark, args.sf)
    print(f"{'ingest':34s} {time.perf_counter() - t0:7.3f}", flush=True)

    qs = E.queries()
    for name in (args.queries or qs):
        fn = qs[name]
        bb, bp, ba = float("inf"), None, None
        for _ in range(args.reps):
            spark.range(1).count()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            if t2 - t0 < bb:
                bb, bp, ba = t2 - t0, t1 - t0, t2 - t1
        print(f"{name:34s} {bb:7.3f}  fn={bp:7.3f}  action={ba:7.3f}",
              flush=True)


if __name__ == "__main__":
    main()
