"""Benchmark: run the declared query set at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

`ingest` = building the lakehouse tables (write path incl. LSM commits);
each query then measures the engine read path + Catalyst execution.

Fresh-session best-of-N (r10, VERDICT r9 #2): a single JVM session's
numbers carry that session's GC/JIT/VM-noise fingerprint — r9's committed
payload showed 2-4x inflation on four queries that re-measured at r8
levels in fresh sessions. main() now forks SPARK_GRAFT_BENCH_SESSIONS
(default 2) fully fresh interpreter+JVM sessions and commits the
per-query MINIMUM across sessions, so the payload is reproducible rather
than one session's draw. Set SPARK_GRAFT_BENCH_SESSIONS=1 to get the old
single-session in-process behavior.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure() -> dict:
    import __spark_entry__ as E
    from paimon_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("bench", cpus=cpus)

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    E._wh(spark, sf_dir)
    timings["ingest"] = round(time.perf_counter() - t0, 3)
    # per-builder attribution (threads overlap: sums to > wall-clock)
    ingest_profile = dict(sorted(E.INGEST_PROFILE.items(),
                                 key=lambda kv: -kv[1]))

    for name, fn in E.queries().items():
        # min-of-N payload (r7, VERDICT r6 #6): single-shot numbers
        # manufactured fake regressions whenever anything else touched
        # the machine — the ratio section always used min-of-3; the
        # payload now does too. Sub-2s queries get 3 reps (scheduler
        # noise dominates them), heavier ones 2 (stable, and the rerun
        # is warm).
        best = float("inf")
        first_el = None
        reps = 3
        r = 0
        while r < reps:
            # drain barrier: leftover scheduler/GC work from the
            # PREVIOUS query otherwise gets charged to whichever query
            # runs next (measured: a 1-row count() took 3 s right after
            # a heavy shuffle). Untimed, so each timing is the query's
            # own work.
            spark.range(1).count()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.perf_counter() - t0
            _ = n
            # queries are independent: drop persisted intermediates
            # (LSH/IVF signature caches) so they can't pile up GC
            # pressure on later ones
            spark.catalog.clearCache()
            best = min(best, el)
            if r == 0:
                first_el = el
                if el >= 2.0:
                    reps = 2
            r += 1
        timings[name] = round(best, 3)
        if name == "zorder_cluster_preserves" and first_el is not None:
            # VERDICT r13 #7 (additions-only): rep 0 in a fresh session
            # pays the real z-order REWRITE (no idempotence marker yet);
            # reps >= 2 hit sort_compact's idempotent skip, which is what
            # min-of-reps reports under the original name. Both costs
            # stay observable: this row is the first-call rewrite.
            timings["zorder_first_rewrite"] = round(first_el, 3)

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

    def raw_changelog():
        # batch equivalent of changelog_old_vs_new's merged-state diff:
        # rebuild orders_pk's state@1 and state@current from raw parquet
        # (same update/delete rules the warehouse applies), full-outer
        # join on the pk, classify -U/+U/-D, aggregate by row kind —
        # the identical plan shape the changelog derivation runs
        odf = orders.select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority")
        s2 = (odf.withColumn(
                  "o_totalprice",
                  F.when(F.col("o_orderkey") % 10 == 0,
                         F.col("o_totalprice") + 1000.0)
                  .otherwise(F.col("o_totalprice")))
              .withColumn(
                  "o_orderpriority",
                  F.when(F.col("o_orderkey") % 10 == 0, F.lit("9-UPDATED"))
                  .otherwise(F.col("o_orderpriority")))
              .filter(F.col("o_orderkey") % 7 != 3))
        a = odf.alias("a")
        b = s2.alias("b")
        j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"),
                   "full_outer")
        changed = (F.col("b.o_orderkey").isNotNull()
                   & F.col("a.o_orderkey").isNotNull()
                   & ((F.col("a.o_totalprice") != F.col("b.o_totalprice"))
                      | (F.col("a.o_orderpriority")
                         != F.col("b.o_orderpriority"))))
        kinds = j.select(
            F.when(F.col("b.o_orderkey").isNull(), F.lit("-D"))
            .when(changed, F.lit("+U")).otherwise(F.lit(None))
            .alias("_row_kind"),
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
            .alias("k")).filter(F.col("_row_kind").isNotNull())
        pairs_df = kinds.unionByName(
            kinds.filter(F.col("_row_kind") == "+U")
            .withColumn("_row_kind", F.lit("-U")))
        (pairs_df.groupBy("_row_kind")
         .agg(F.count("*").alias("cnt"), F.min("k").alias("min_key"),
              F.max("k").alias("max_key")).count())

    def raw_stream():
        # batch equivalent of the streaming windowed agg over raw
        # parquet — the ratio isolates the streaming-machinery overhead
        # (microbatch planning, state store) from the agg itself
        (ev.withColumn("ets", E._event_time(ev))
         .groupBy(F.window("ets", "5 minutes").alias("w"), "event_type")
         .agg(F.count("*").alias("cnt")).count())

    def raw_stream_jvm():
        # IDENTICAL windowed agg + sink + availableNow trigger through a
        # JVM-native file-stream source: the engine/THIS ratio is the
        # Python-DataSource-attributable share, with Spark's own
        # streaming machinery (state store, microbatch planning, sink)
        # cancelled out (see PERF.md stream decomposition)
        import tempfile
        import uuid as _uuid
        d = tempfile.mkdtemp()
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   f"{d}/events.parquet")
        sink = f"jvmctl_{_uuid.uuid4().hex[:8]}"
        sdf = spark.readStream.schema(ev.schema).format("parquet").load(d)
        q = (sdf.withColumn("ets", E._event_time(sdf))
             .withWatermark("ets", "7 days")
             .groupBy(F.window("ets", "5 minutes").alias("w"),
                      "event_type")
             .agg(F.count("*").alias("cnt"))
             .writeStream.format("memory").queryName(sink)
             .outputMode("complete")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        spark.table(sink).count()

    pairs = [
        ("q1", raw_q1, lambda: E.q1_pricing_summary(spark, sf_dir).count()),
        ("q6", raw_q6, lambda: E.q6_revenue(spark, sf_dir).collect()),
        ("q3", raw_q3, lambda: E.q3_top_revenue(spark, sf_dir).collect()),
        ("topn", raw_topn, lambda: E.topn_orders(spark, sf_dir).collect()),
        ("point", raw_point,
         lambda: E.point_lookup(spark, sf_dir).collect()),
        ("window", raw_window,
         lambda: E.window_user_ranks(spark, sf_dir).count()),
        ("changelog", raw_changelog,
         lambda: E.changelog_old_vs_new(spark, sf_dir).count()),
        # named for what it measures: ONE cold availableNow drain, all
        # of Spark's fixed query-start cost charged to a single small
        # batch — the amortized counterpart is ratios.stream_steady
        # below (VERDICT r11 #2)
        ("stream_cold_drain", raw_stream,
         lambda: E.stream_window_counts(spark, sf_dir).count()),
        ("stream_vs_jvm_source", raw_stream_jvm,
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
        reps = 1 if name.startswith("stream") else 3  # a drain is ~4 s
        base[f"{name}_raw"] = _best(raw_fn, reps)
        # engine path re-measured at equal warmth for the ratio
        base[f"{name}_engine_warm"] = _best(engine_fn, reps)
        if base[f"{name}_raw"] > 0:
            ratios[name] = round(
                base[f"{name}_engine_warm"] / base[f"{name}_raw"], 2)

    # steady-state streaming (VERDICT r10 #5): the `stream` row above is
    # ONE cold availableNow drain — all of Spark's fixed microbatch
    # machinery (query start, state-store init, sink setup) charged to a
    # single batch, which is the number that does NOT matter at scale. A
    # production stream pays those once and then processes follow-up
    # commits; this measures N follow-up batches through a CONTINUOUS
    # query over the engine's stream view and reports the per-batch
    # marginal cost (Spark's own triggerExecution metric — planning +
    # offset mgmt + execution of exactly that batch, idle waits
    # excluded).
    base.update(_stream_steady(spark, E, ev, sf_dir))
    # the HEADLINE stream ratio (VERDICT r11 #2): engine marginal batch
    # vs the identical marginal batch through a JVM-native file-stream
    # source — the number a 1000-executor deployment actually pays per
    # follow-up commit, with the one-time query-start cost excluded on
    # BOTH sides
    if base.get("stream_steady_jvm_per_batch"):
        ratios["stream_steady"] = round(
            base["stream_steady_per_batch"]
            / base["stream_steady_jvm_per_batch"], 2)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    return _assemble(timings, base, ratios, sf_val, cpus,
                     ingest_profile)


def _stream_steady(spark, E, ev, sf_dir, n_batches: int = 8) -> dict:
    """Marginal per-batch cost of the engine's continuous stream vs the
    IDENTICAL workload through a JVM-native parquet file-stream source:
    same windowed agg, same update-mode memory sink, same 2k-row
    follow-up batches, cold initial drain excluded on both sides. The
    engine/jvm ratio is the scale-relevant stream number (a production
    stream pays query-start once, then processes follow-up commits
    forever)."""
    import statistics
    import uuid as _uuid

    from pyspark.sql import functions as F

    from paimon_spark.table import Table

    def _run(sdf, ckpt, append_fn):
        sink = f"steady_{_uuid.uuid4().hex[:6]}"
        q = (sdf.withColumn("ets", E._event_time(sdf))
             .withWatermark("ets", "7 days")
             .groupBy(F.window("ets", "5 minutes").alias("w"),
                      "event_type")
             .agg(F.count("*").alias("cnt"))
             .writeStream.format("memory").queryName(sink)
             # update mode: a steady-state batch emits only the windows
             # it touched (complete mode would rewrite the whole result
             # table per batch and charge state-size costs to the
             # marginal number)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(processingTime="200 milliseconds").start())

        # track data batches by batchId (recentProgress evicts past
        # ~100 entries and the 200 ms trigger fills it with empty
        # batches, so a plain recentProgress scan could lose earlier
        # data batches)
        seen: dict[int, float] = {}

        def _poll():
            for p in [q.lastProgress, *q.recentProgress]:
                if p and p["numInputRows"] > 0:
                    seen[p["batchId"]] = \
                        p["durationMs"]["triggerExecution"] / 1000.0

        def _wait_past(prev_n, timeout=120.0):
            t0 = time.perf_counter()
            while True:
                _poll()
                if len(seen) > prev_n:
                    return
                if time.perf_counter() - t0 > timeout:
                    raise TimeoutError(
                        f"steady stream stuck at {len(seen)} batches")
                time.sleep(0.03)

        try:
            _wait_past(0)                  # the cold initial drain
            for _ in range(n_batches):
                n_before = len(seen)
                append_fn()
                _wait_past(n_before)
            initial = min(seen)            # first data batch = drain
            return [v for k, v in seen.items() if k != initial]
        finally:
            q.stop()

    d = tempfile.mkdtemp(prefix="steady_")
    t = Table.create(f"{d}/steady", ev.schema, spark=spark)
    t.append(ev.limit(50_000))
    batch = ev.limit(2_000).collect()
    # one file per follow-up batch on BOTH sides (the JVM control
    # writes coalesce(1); an un-coalesced engine append would charge
    # extra per-file listing/open cost to the engine's marginal number)
    bdf = spark.createDataFrame(batch, ev.schema).coalesce(1)
    # read_stream() drains a SNAPSHOT-pinned view (appends never enter
    # it) — the continuous live view is the follow-up-capable surface
    t.create_stream_view()
    eng = _run(t.read_stream_continuous(), f"{d}/ckpt",
               lambda: t.append(bdf))

    # JVM control: native FileStreamSource over a watched directory,
    # fed the same seed + the same follow-up batches as new files
    jd = tempfile.mkdtemp(prefix="steady_jvm_")
    ev.limit(50_000).write.mode("append").parquet(f"{jd}/data")
    jvm_sdf = (spark.readStream.schema(ev.schema)
               .format("parquet").load(f"{jd}/data"))
    jvm = _run(jvm_sdf, f"{jd}/ckpt",
               lambda: bdf.coalesce(1).write.mode("append")
               .parquet(f"{jd}/data"))
    return {
        "stream_steady_per_batch": round(statistics.median(eng), 3),
        "stream_steady_batches": len(eng),
        "stream_steady_jvm_per_batch": round(statistics.median(jvm), 3),
    }


def _assemble(timings: dict, base: dict, ratios: dict, sf_val, cpus,
              ingest_profile: dict | None = None) -> dict:
    engine = base["q1_engine_warm"] + base["q6_engine_warm"]
    raw = base["q1_raw"] + base["q6_raw"]
    return {
        "metric": "total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "raw_vs_engine": base,
        "ratios": ratios,
        "ratio_q1q6": round(engine / raw, 2) if raw else None,
        "ingest_profile": ingest_profile or {},
        "sf": sf_val,
        "cpus": cpus,
    }


def _merge_sessions(sessions: list[dict]) -> dict:
    """Per-query minimum across fresh sessions: the minimum is the standard
    noise-robust location estimator for one-sided timing noise, and taking
    it across SESSIONS (not reps within one) also cancels session-lifetime
    effects (JVM JIT warmup skew, heap shape, code-cache pollution)."""
    timings: dict[str, float] = {}
    base: dict[str, float] = {}
    for s in sessions:
        for k, v in s["queries"].items():
            timings[k] = min(timings.get(k, float("inf")), v)
        for k, v in s["raw_vs_engine"].items():
            base[k] = min(base.get(k, float("inf")), v)
    ratios = {}
    for k in sessions[0].get("ratios", {}):
        if base.get(f"{k}_raw"):
            ratios[k] = round(base[f"{k}_engine_warm"] / base[f"{k}_raw"], 2)
    # stream_steady's numerator/denominator live under their own keys
    if base.get("stream_steady_jvm_per_batch"):
        ratios["stream_steady"] = round(
            base["stream_steady_per_batch"]
            / base["stream_steady_jvm_per_batch"], 2)
    # ingest profile from the session with the fastest ingest (same
    # min-as-location-estimator stance as the timings)
    prof_session = min(sessions, key=lambda s: s["queries"].get("ingest", 1e9))
    full = _assemble(timings, base, ratios,
                     sessions[0]["sf"], sessions[0]["cpus"],
                     prof_session.get("ingest_profile"))
    full["sessions"] = len(sessions)
    full["session_totals"] = [s["value"] for s in sessions]
    return full


def main():
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        full = measure()
        with open(os.environ["SPARK_GRAFT_BENCH_OUT"], "w") as f:
            json.dump(full, f)
        return

    n = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))
    sessions: list[dict] = []
    if n > 1:
        for i in range(n):
            with tempfile.NamedTemporaryFile(suffix=".json",
                                             delete=False) as tf:
                out = tf.name
            env = dict(os.environ,
                       SPARK_GRAFT_BENCH_CHILD="1",
                       SPARK_GRAFT_BENCH_OUT=out)
            # child stdout -> parent stderr so the parent's single JSON
            # line stays the only thing on stdout
            rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                env=env, stdout=sys.stderr).returncode
            try:
                if rc == 0:
                    with open(out) as f:
                        sessions.append(json.load(f))
            except (OSError, json.JSONDecodeError):
                pass
            finally:
                try:
                    os.unlink(out)
                except OSError:
                    pass
    full = _merge_sessions(sessions) if sessions else measure()

    # human-readable claim derived FROM the payload (VERDICT r12 #6:
    # the round-closing commit message must quote THESE numbers — they
    # are computed from the same dict that is written to disk, so the
    # claim and the committed artifact cannot diverge)
    _batch = {k: v for k, v in full["ratios"].items()
              if not k.startswith("stream")}
    _worst = max(_batch, key=_batch.get) if _batch else None
    full["claim"] = (
        f"total {full['value']}s for {len(full['queries'])} queries at "
        f"sf{full['sf']}; ingest {full['queries'].get('ingest')}s; "
        "batch ratios "
        + ", ".join(f"{k}={v}" for k, v in sorted(_batch.items()))
        + (f" (worst {_worst}={_batch[_worst]})" if _worst else "")
        + f"; stream_steady={full['ratios'].get('stream_steady')}")

    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        full_path = None                       # read-only checkout: stdout only
    timings = full["queries"]
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    # the driver captures only a ~2000-char TAIL of stdout+stderr (every
    # BENCH_r*.json tail is exactly 2000 chars), and 117 full-length
    # query names alone are ~2.4 KB — a full per-query map would push
    # the JSON line's HEAD out of the capture window and break parsing.
    # VERDICT r13 #2 asked for per-query seconds in the one-liner so the
    # round-over-round PERF join stops landing on n_common=0; the
    # compromise (additions-only): `queries` carries as many per-query
    # entries as fit a fixed line budget, DESCENDING by seconds, with
    # the dropped sub-tail summarized (q_rest_n / q_rest_sum). The
    # COMPLETE map is still committed in BENCH_FULL.json.
    payload = {
        "metric": "total_sec",
        "value": full["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "sessions": full.get("sessions", 1),
        "slowest": {k: round(v, 2) for k, v in slowest.items()},
        "queries": {},
        "ratios": full["ratios"],
        "ratio_q1q6": full["ratio_q1q6"],
        "sf": full["sf"],
        "queries_file": "BENCH_FULL.json" if full_path else None,
    }
    _budget = 1800                       # chars; tail window is 2000
    by_time = sorted(timings.items(), key=lambda kv: -kv[1])
    for i, (k, v) in enumerate(by_time):
        payload["queries"][k] = round(v, 2)
        rest = by_time[i + 1:]
        payload["q_rest_n"] = len(rest)
        payload["q_rest_sum"] = round(sum(v2 for _k2, v2 in rest), 2)
        if len(json.dumps(payload, separators=(",", ":"))) > _budget:
            del payload["queries"][k]
            payload["q_rest_n"] = len(by_time) - i
            payload["q_rest_sum"] = round(
                sum(v2 for _k2, v2 in by_time[i:]), 2)
            break
    # CLAIM first, JSON line LAST: the tail window truncates from the
    # FRONT, so the machine-parsed line must be the final bytes written.
    print("CLAIM:", full["claim"], file=sys.stderr)
    sys.stderr.flush()
    print(json.dumps(payload, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
