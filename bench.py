"""Benchmark: run the declared query set at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

`ingest` = building the lakehouse tables (write path incl. LSM commits);
each query then measures the engine read path + Catalyst execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("bench", cpus=cpus)

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    E._wh(spark, sf_dir)
    timings["ingest"] = round(time.perf_counter() - t0, 3)

    for name, fn in E.queries().items():
        # drain barrier: leftover scheduler/GC work from the PREVIOUS
        # query otherwise gets charged to whichever query runs next
        # (measured: a 1-row count() took 3 s right after a heavy
        # shuffle). Untimed, so each timing is the query's own work.
        spark.range(1).count()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
        # queries are independent: drop persisted intermediates (LSH/IVF
        # signature caches) so they can't pile up GC pressure on later ones
        spark.catalog.clearCache()

    # plain spark.read.parquet baselines for representative queries —
    # BASELINE.json's anchor is "within 2x of raw parquet on this machine".
    # Identical query expressions, raw parquet instead of the engine read
    # path — the per-query RATIO isolates engine overhead (planning,
    # layout, merge) independent of machine load, so a ratio drift flags a
    # real regression where wall-time drift may be noise.
    from pyspark.sql import functions as F
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def raw_q1():
        (li.filter(F.col("l_shipdate") <= E.CUTOFF)
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(E._dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(E._dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(E._dec(disc, 18, 6)).cast("double").alias("sum_disc_price"),
                F.sum(E._dec(disc * (1 + F.col("l_tax")), 18, 6)).cast("double").alias("sum_charge"),
                F.count("*").alias("count_order"))
           .count())

    def raw_q6():
        (li.filter((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1997-01-01")
                   & F.col("l_discount").between(0.05, 0.07)
                   & (F.col("l_quantity") < 24))
           .agg(F.sum(E._dec(F.col("l_extendedprice") * F.col("l_discount"), 18, 6))
                .cast("double").alias("revenue"), F.count("*").alias("n_rows"))
           .collect())

    def raw_q3():
        rev = F.sum(E._dec(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           18, 6)).cast("double").alias("revenue")
        (li.filter(F.col("l_shipdate") > E.Q3_DATE)
           .join(orders.filter(F.col("o_orderdate") < E.Q3_DATE),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
                 F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("l_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                    "o_orderpriority")
           .agg(rev)
           .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
           .limit(10).collect())

    def raw_topn():
        (orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
         .limit(10).collect())

    def raw_point():
        orders.filter(F.col("o_orderkey") == 20).collect()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def raw_window():
        from pyspark.sql import Window
        counts = (ev.groupBy("user_id", "event_type")
                  .agg(F.count("*").alias("cnt")))
        w = Window.partitionBy("user_id").orderBy(F.desc("cnt"),
                                                  F.asc("event_type"))
        (counts.withColumn("rnk", F.row_number().over(w).cast("long"))
         .filter(F.col("rnk") <= 2).count())

    def raw_stream():
        # batch equivalent of the streaming windowed agg over raw
        # parquet — the ratio isolates the streaming-machinery overhead
        # (microbatch planning, state store) from the agg itself
        (ev.withColumn("ets", E._event_time(ev))
         .groupBy(F.window("ets", "5 minutes").alias("w"), "event_type")
         .agg(F.count("*").alias("cnt")).count())

    pairs = [
        ("q1", raw_q1, lambda: E.q1_pricing_summary(spark, sf_dir).count()),
        ("q6", raw_q6, lambda: E.q6_revenue(spark, sf_dir).collect()),
        ("q3", raw_q3, lambda: E.q3_top_revenue(spark, sf_dir).collect()),
        ("topn", raw_topn, lambda: E.topn_orders(spark, sf_dir).collect()),
        ("point", raw_point,
         lambda: E.point_lookup(spark, sf_dir).collect()),
        ("window", raw_window,
         lambda: E.window_user_ranks(spark, sf_dir).count()),
        ("stream", raw_stream,
         lambda: E.stream_window_counts(spark, sf_dir).count()),
    ]
    base: dict[str, float] = {}
    ratios: dict[str, float] = {}

    def _best(fn, reps=3):
        # min-of-N: the sub-second raw baselines are scheduler-noise
        # dominated; the minimum is the standard noise-robust estimator
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for name, raw_fn, engine_fn in pairs:
        reps = 1 if name == "stream" else 3   # a stream drain is ~4 s
        base[f"{name}_raw"] = _best(raw_fn, reps)
        # engine path re-measured at equal warmth for the ratio
        base[f"{name}_engine_warm"] = _best(engine_fn, reps)
        if base[f"{name}_raw"] > 0:
            ratios[name] = round(
                base[f"{name}_engine_warm"] / base[f"{name}_raw"], 2)

    engine = base["q1_engine_warm"] + base["q6_engine_warm"]
    raw = base["q1_raw"] + base["q6_raw"]
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # the driver captures a bounded tail of stdout — keep the line compact
    # (2-decimal timings, no spaces) so it never gets truncated mid-JSON
    payload = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "raw_vs_engine": {k: round(v, 2) for k, v in base.items()},
        "ratios": ratios,
        "ratio_q1q6": round(engine / raw, 2) if raw else None,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1800:  # last-ditch: drop the per-query dict detail
        payload.pop("raw_vs_engine", None)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
