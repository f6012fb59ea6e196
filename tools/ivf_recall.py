"""IVF recall@k and latency evidence vs brute force (r7 verdict/IVF knob).

Builds a table over <sf_dir>/embeddings.parquet, persists the IVF index
(Table.create_vector_index — k-means-trained, cluster-partitioned
inverted lists), then sweeps `nprobe` and reports recall@k against the
exact brute-force answer plus warm per-query wall-clock. Prints one
JSON line:

  {"sf_dir": ..., "n": N, "n_centroids": C, "k": K,
   "brute_s": t, "sweep": [{"nprobe": p, "recall": r, "s_per_query": t}]}

Usage:
  python tools/ivf_recall.py [sf_dir] [--sf1] [--k 10] [--queries 20]
  --sf1 replicates sf0.1 10x first (tools/scale_check.ensure_sf1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:]]
    k = 10
    n_queries = 20
    spill = 0
    if "--k" in args:
        k = int(args[args.index("--k") + 1])
    if "--queries" in args:
        n_queries = int(args[args.index("--queries") + 1])
    if "--spill" in args:
        spill = int(args[args.index("--spill") + 1])
    pq_m = 0
    if "--pq" in args:
        pq_m = int(args[args.index("--pq") + 1])
    reps = 0
    jitter = 0.05
    if "--reps" in args:       # clustered corpus: reps jittered copies
        reps = int(args[args.index("--reps") + 1])
    if "--jitter" in args:
        jitter = float(args[args.index("--jitter") + 1])
    mog = 0
    if "--mog" in args:        # REAL cluster structure (r7 verdict #3)
        mog = int(args[args.index("--mog") + 1])
    sf_dir = next((a for a in args if not a.startswith("--")
                   and not a.isdigit()), "/root/testdata/sf0.1")

    from paimon_spark.session import get_spark
    from paimon_spark import Table
    from pyspark.sql import functions as F

    spark = get_spark("ivf_recall")
    if "--sf1" in args:
        from tools.scale_check import ensure_sf1
        sf_dir = ensure_sf1(spark)

    if mog:
        # Mixture-of-Gaussians corpus with genuine cluster structure:
        # random vectors UNDERSTATE IVF (no structure to exploit),
        # jittered replication OVERSTATES it (clusters collapse to
        # points). Here: Zipf-weighted topic clusters whose intra-
        # cluster spread is comparable to the inter-center separation
        # (real-embedding-like overlap), plus near-dup families (10% of
        # points carry 1-3 close copies). Seeded — reruns are identical.
        import numpy as np
        rng = np.random.default_rng(12345)
        d, G = 64, 48
        centers = rng.normal(size=(G, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        w = 1.0 / np.arange(1, G + 1)               # Zipf topic sizes
        w /= w.sum()
        assign = rng.choice(G, size=mog, p=w)
        # unit-norm centers are ~sqrt(2) apart; sigma=0.1 per-dim gives
        # noise norm ~0.8 — clusters overlap but remain real structure
        base = centers[assign] + rng.normal(scale=0.1, size=(mog, d))
        fam_src = rng.random(mog) < 0.10
        fams = [base]
        for j in range(3):
            pick = fam_src & (rng.random(mog) < (0.8 ** j))
            if pick.any():
                fams.append(base[pick]
                            + rng.normal(scale=0.0025,
                                         size=(int(pick.sum()), d)))
        allv = np.vstack(fams)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(allv)],
            "vec_id long, embedding array<double>")
    else:
        emb = (spark.read.parquet(os.path.join(sf_dir,
                                               "embeddings.parquet"))
               .select("vec_id",
                       F.col("embedding").cast("array<double>")
                       .alias("embedding")))
    if reps > 1:
        # deterministic near-dup clusters: each source vector becomes a
        # cluster of `reps` jittered copies (hash-derived noise, no RNG)
        # — the honest middle ground between random vectors (IVF worst
        # case) and exact replication (trivially easy)
        r = spark.range(reps).select(F.col("id").alias("__rep"))
        emb = (emb.crossJoin(r)
               .select(
                   (F.col("vec_id") * reps + F.col("__rep"))
                   .alias("vec_id"),
                   F.transform(
                       "embedding",
                       lambda x, i: x + jitter * F.sin(F.xxhash64(
                           F.col("vec_id"), F.col("__rep"), i)
                           .cast("double"))).alias("embedding")))
    n = emb.count()
    # sqrt(N) lists is the standard IVF sizing; queries then score
    # ~nprobe*sqrt(N) vectors instead of N
    n_centroids = max(8, int(n ** 0.5 / 2))

    wh = tempfile.mkdtemp(prefix="ivf_recall_")
    try:
        t = Table.create(
            os.path.join(wh, "emb"), emb.schema, spark=spark)
        t.append(emb)
        t0 = time.time()
        t.create_vector_index("embedding", id_col="vec_id",
                              n_centroids=n_centroids, spill=spill,
                              pq_m=pq_m)
        build_s = time.time() - t0
        idx_dir = os.path.join(wh, "emb", "index", "vector", "embedding")
        idx_bytes = sum(os.path.getsize(os.path.join(r, f))
                        for r, _d, fs in os.walk(idx_dir) for f in fs
                        if f.endswith(".parquet"))

        qrows = (emb.orderBy("vec_id").limit(max(200, n_queries * 7))
                 .collect())
        queries = [(r.vec_id, list(r.embedding))
                   for r in qrows[::7][:n_queries]]

        # exact answers once (also warms the JVM)
        truth = {}
        t0 = time.time()
        for qid, q in queries:
            truth[qid] = [r.vec_id for r in
                          t.vector_search(q, k=k, method="brute")
                          .collect()]
        brute_s = (time.time() - t0) / len(queries)

        sweep = []
        # None = the engine's default knob (vector-index.nprobe table
        # option, else max(2, C//8)) — the recall a user gets unconfigured
        for nprobe in (None, 1, 2, 4, 8, max(1, n_centroids // 4),
                       n_centroids):
            if any(s["nprobe"] == nprobe for s in sweep):
                continue
            hits = total = 0
            t0 = time.time()
            for qid, q in queries:
                got = [r.vec_id for r in
                       t.vector_search(q, k=k, method="ivf",
                                       nprobe=nprobe).collect()]
                hits += len(set(got) & set(truth[qid]))
                total += len(truth[qid])
            sweep.append({"nprobe": nprobe if nprobe is not None
                          else f"default({max(2, n_centroids // 8)})",
                          "recall": round(hits / total, 4),
                          "s_per_query": round(
                              (time.time() - t0) / len(queries), 3)})
        print(json.dumps({
            "sf_dir": "mog" if mog else sf_dir, "n": n,
            "n_centroids": n_centroids,
            "spill": spill, "pq_m": pq_m, "reps": reps, "mog": mog,
            "jitter": jitter if reps > 1 else None, "k": k,
            "n_queries": len(queries),
            "index_build_s": round(build_s, 2),
            "index_bytes": idx_bytes,
            "brute_s_per_query": round(brute_s, 3),
            "sweep": sweep}))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
