"""r13 scale check: lookup-producer COMMIT cost must scale with the
BATCH, not the table. Builds a lookup-producer PK table at increasing
sizes, then times one identical small commit (localized key range) at
each size. The commit path = LSM write + driver-side keys sidecar +
range-restricted rows derivation; all three are O(batch) when file
skipping works, so the ratio across a 40x table-size spread should
stay ~flat (< ~2x tolerated for noise).

Usage: python tools/scale_check_commit.py  → one JSON line.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from paimon_spark import Table
    from paimon_spark.session import get_spark
    spark = get_spark("scale_commit", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")))
    root = tempfile.mkdtemp(prefix="scale_commit_")
    sizes = [250_000, 2_500_000, 10_000_000]
    batch_n = 20_000
    out = {}
    for n in sizes:
        base = (spark.range(n)
                .select(F.col("id").alias("k"),
                        (F.col("id") % 97).alias("v"),
                        F.md5(F.col("id").cast("string")).alias("pad")))
        t = Table.create(f"{root}/t{n}", base.schema, primary_keys=["k"],
                         options={"bucket": "8",
                                  "changelog-producer": "lookup"},
                         spark=spark)
        t.append(base)
        # steady state: compacted table (the common shape at scale)
        t.compact(full=True)
        # localized batch: recent keys, the common update shape
        batch = (spark.range(n - batch_n, n)
                 .select(F.col("id").alias("k"),
                         F.lit(-1).cast("long").alias("v"),
                         F.lit("upd").alias("pad")))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            t.append(batch)
            reps.append(time.perf_counter() - t0)
        out[str(n)] = round(min(reps), 3)
    spread = sizes[-1] / sizes[0]
    ratio = round(out[str(sizes[-1])] / out[str(sizes[0])], 2)
    print(json.dumps({"commit_sec_by_table_rows": out,
                      "size_spread": spread,
                      "commit_cost_ratio": ratio,
                      "flat": ratio < 2.0}))


if __name__ == "__main__":
    main()
