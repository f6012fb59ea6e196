"""Plan-quality audit: run every contract query, dump physical-plan facts.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.01)
Prints one line per query: joins (broadcast vs sort-merge), shuffle count,
whole-stage-codegen span count, whether scans carry PushedFilters.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", cpus=8)
    E._wh(spark, sf)   # ingest once so plans reflect warm tables

    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf)
            df.collect()  # run so AQE finalizes and codegen ids are real
            plan = df._jdf.queryExecution().executedPlan().toString()
            # AQE prints final + initial plan; keep the final section only
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as exc:  # streaming queries have no batch plan
            print(f"{name:32s} SKIP ({type(exc).__name__})")
            continue
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        ex = len(re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan))
        wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        pushed = bool(re.search(r"PushedFilters: \[[^\],]", plan))
        print(f"{name:32s} bhj={bhj:2d} smj={smj:2d} shuffles={ex:2d} "
              f"codegen={wsc:2d} pushed={'Y' if pushed else '-'}")


if __name__ == "__main__":
    main()
