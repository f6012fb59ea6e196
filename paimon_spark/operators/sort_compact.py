"""Sort-compact: rewrite table data clustered by ORDER / ZORDER / HILBERT.

(ref: paimon-spark/.../sort/TableSorter.java:70-74, ZorderSorter.java,
 HilbertSorter.java:32-48, zvalue UDF SparkZOrderUDF.java; invoked from
 procedure/CompactProcedure.java:113,678 `order_strategy`/`order_by`)

Spark-first design: the z-value is a pure Catalyst expression (bit
interleaving over normalized columns), clustering is
`repartitionByRange(zvalue) + sortWithinPartitions` — Spark's range
partitioner samples the z distribution, so output files get near-equal
sizes and disjoint z-ranges → min/max file skipping works on ALL the
clustered dimensions at once. No UDFs, no windows, no driver bottleneck:
column normalization uses min/max from MANIFEST STATS (free), so the
whole job is scan → map → range shuffle → write at any scale.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from paimon_spark.metadata import COMMIT_COMPACT, DELETE, FileEntry
from paimon_spark.table import COMPACTED_LEVEL, Table

Z_BITS = 16  # bits per dimension (16 bits × up to 4 dims fits a BIGINT)
MAXV = (1 << Z_BITS) - 1


def _normalized(table: Table, c: str,
                bounds: tuple | None = None) -> Column:
    """Map column c to [0, 2^Z_BITS) preserving order.

    Numerics/dates: linear min-max scaling — bounds from manifest stats
    for table rewrites, or pass `bounds` explicitly (write-time
    clustering computes them from the INPUT batch; an empty table has
    no stats). Skewed data clusters less evenly but stays correct —
    same trade-off as the reference's byte-slice zvalues. Strings:
    first-2-bytes ordinal."""
    dtype = table.schema.data_type(c)
    col = F.col(c)
    if isinstance(dtype, T.StringType):
        # first-2-bytes ordinal: order-preserving for the leading prefix
        return (F.coalesce(F.ascii(F.substring(col, 1, 1)), F.lit(0)) * 256
                + F.coalesce(F.ascii(F.substring(col, 2, 1)), F.lit(0))
                ).cast("long") % (MAXV + 1)
    mm = bounds if bounds is not None else \
        table.new_scan().metadata_min_max(c)
    if mm is None or mm[0] is None or mm[0] == mm[1]:
        return F.lit(0).cast("long")
    mn, mx = mm
    epoch = dt.datetime(1970, 1, 1)
    if isinstance(mn, dt.datetime):
        lo, hi = (mn - epoch).total_seconds(), (mx - epoch).total_seconds()
        num = F.unix_timestamp(col).cast("double")
    elif isinstance(mn, dt.date):
        lo, hi = float(mn.toordinal()), float(mx.toordinal())
        num = F.datediff(col, F.lit("1970-01-01")).cast("double") + 719163.0
    else:
        lo, hi = float(mn), float(mx)
        num = col.cast("double")
    span = (hi - lo) or 1.0
    scaled = (num - F.lit(float(lo))) / F.lit(span) * MAXV
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(MAXV))


def zvalue(table: Table, cols: list[str],
           bounds: dict | None = None) -> Column:
    """Bit-interleaved z-value over the normalized columns."""
    n = len(cols)
    norm = {c: _normalized(table, c, (bounds or {}).get(c))
            for c in cols}
    acc = F.lit(0).cast("long")
    for bit in range(Z_BITS):
        for i, c in enumerate(cols):
            b = F.shiftright(norm[c], bit).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(b.cast("long"), bit * n + i)
    return acc


def hilbert_index(coords, bits: int):
    """True Hilbert index (Skilling's transpose algorithm, "Programming
    the Hilbert curve", AIP 2004) — vectorized numpy over an (N, n)
    uint64 array of coordinates in [0, 2^bits). Returns (N,) uint64.

    Unlike the z-order interleave, consecutive Hilbert indexes are always
    adjacent cells (Manhattan distance 1), so range-partitioning the index
    yields files whose min/max boxes are tighter on every dimension.
    (ref: HilbertSorter.java:32-48 — the reference delegates to a Hilbert
    library; this is the same curve computed directly.)"""
    import numpy as np

    X = np.ascontiguousarray(coords, dtype=np.uint64).copy()
    n = X.shape[1]
    # inverse undo excess work
    Q = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        for i in range(n):
            cond = (X[:, i] & Q) != 0
            X[:, 0] = np.where(cond, X[:, 0] ^ P, X[:, 0])        # invert
            t = np.where(~cond, (X[:, 0] ^ X[:, i]) & P,
                         np.uint64(0))                            # exchange
            X[:, 0] ^= t
            X[:, i] ^= t
        Q >>= one
    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(X.shape[0], dtype=np.uint64)
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        t = np.where((X[:, n - 1] & Q) != 0, t ^ (Q - one), t)
        Q >>= one
    for i in range(n):
        X[:, i] ^= t
    # untranspose: bit j of dim i → index bit j*n + (n-1-i)
    h = np.zeros(X.shape[0], dtype=np.uint64)
    for j in range(bits):
        for i in range(n):
            h |= ((X[:, i] >> np.uint64(j)) & one) << np.uint64(j * n + (n - 1 - i))
    return h


def hilbert_value(table: Table, cols: list[str],
                  bounds: dict | None = None) -> Column:
    """Hilbert index column over normalized dimensions. The normalization
    is the same manifest-stats min-max scaling as z-order (JVM-side); only
    the bit transform runs in an Arrow-batched pandas UDF — a genuine
    can't-express-in-Catalyst case (per-row loop-carried bit swaps)."""
    from pyspark.sql.functions import pandas_udf

    n = len(cols)
    bits = min(Z_BITS, 62 // n)   # keep the index inside a signed BIGINT
    shift = Z_BITS - bits

    def _go(*series):
        import numpy as np
        coords = np.stack(
            [s.to_numpy(dtype="int64").astype(np.uint64) >> np.uint64(shift)
             for s in series], axis=1)
        return pd.Series(hilbert_index(coords, bits).astype("int64"))

    # fixed-arity wrappers: pandas_udf's type-hint inference rejects *args
    if n == 1:
        def _h(a: pd.Series) -> pd.Series: return _go(a)
    elif n == 2:
        def _h(a: pd.Series, b: pd.Series) -> pd.Series: return _go(a, b)
    elif n == 3:
        def _h(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
            return _go(a, b, c)
    elif n == 4:
        def _h(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
            return _go(a, b, c, d)
    else:
        raise ValueError("hilbert supports 1-4 dimensions")
    return pandas_udf("long")(_h)(
        *[_normalized(table, c, (bounds or {}).get(c)) for c in cols])


_LAYOUT_MARKER = "clustering_layout.json"


def _layout_marker_path(table: Table) -> str:
    import os
    return os.path.join(table.paths.meta_root, _LAYOUT_MARKER)


def _write_layout_marker(table: Table, snap, order_by: list[str],
                         strategy: str) -> None:
    """Record the layout a successful sort-compact produced, pinned to
    the snapshot it committed — the idempotence witness for the skip in
    sort_compact (atomic tmp+rename; a lost/stale marker only costs an
    unnecessary rewrite, never a wrong skip)."""
    import json
    import os
    import tempfile
    p = _layout_marker_path(table)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), prefix="_tmp-lay")
    with os.fdopen(fd, "w") as f:
        json.dump({"snapshot_id": snap.id,
                   "snapshot_ts": snap.timestamp_ms,
                   "order_by": list(order_by),
                   "strategy": strategy}, f)
    os.replace(tmp, p)


def _layout_current(table: Table, order_by: list[str],
                    strategy: str):
    """The latest snapshot IFF it is exactly the one a prior sort-compact
    with the SAME columns+strategy committed (id and timestamp pinned —
    id re-use after rollback can't fake it); else None."""
    import json
    try:
        with open(_layout_marker_path(table)) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    if m.get("order_by") != list(order_by) \
            or m.get("strategy") != strategy:
        return None
    latest = table.paths.latest_snapshot()
    if latest is None or latest.id != m.get("snapshot_id") \
            or latest.timestamp_ms != m.get("snapshot_ts"):
        return None
    return latest


def sort_compact(table: Table, order_by: list[str],
                 strategy: str = "zorder", n_files: int | None = None):
    """Rewrite the whole table clustered by `order_by`.

    strategy: 'order' (lexicographic range), 'zorder', or 'hilbert'
    (true Hilbert curve via `hilbert_index`).

    Idempotent (r13): when the latest snapshot IS the commit a prior
    sort-compact with the same order_by+strategy produced (nothing
    written since — marker pinned by snapshot id AND timestamp), the
    table is already in the requested layout and the rewrite is
    skipped, same as plain compact()'s nothing-to-do no-op. At 100 TB a
    re-triggered maintenance job on an unchanged table costs metadata
    reads instead of a full-table rewrite.
    """
    done = _layout_current(table, order_by, strategy)
    if done is not None:
        return done
    plan = table.new_scan().plan()
    if not plan.entries:
        return None
    if n_files is None:
        # explicit partition count: sized by target-file-size, and explicit
        # so AQE's coalescePartitions can't merge the clustered ranges
        target = int(table.schema.options.get("target-file-size",
                                              str(128 << 20)))
        total = sum(e.file_size for e in plan.entries)
        n_files = max(1, (total + target - 1) // target)
    w = table.writer()
    df = table.read()
    if strategy == "order":
        out = df.repartitionByRange(int(n_files), *[F.col(c) for c in order_by]) \
                .sortWithinPartitions(*order_by)
    elif strategy in ("zorder", "hilbert"):
        idx = (hilbert_value(table, order_by) if strategy == "hilbert"
               else zvalue(table, order_by))
        z = df.withColumn("__z", idx)
        out = (z.repartitionByRange(int(n_files), F.col("__z"))
               .sortWithinPartitions("__z").drop("__z"))
    else:
        raise ValueError(f"unknown sort strategy {strategy}")
    adds = w.stage(out.select(*table.schema.field_names), level=COMPACTED_LEVEL)
    deletes = [FileEntry(**{**e.__dict__, "kind": DELETE}) for e in plan.entries]
    snap = w.commit(adds + deletes, COMMIT_COMPACT)
    _write_layout_marker(table, snap, order_by, strategy)
    return snap


def cluster_compact_incremental(table: Table,
                                col: str | None = None) -> "object":
    """Incremental clustering compaction (ref: CoreOptions
    clustering.incremental — cluster only what overlaps instead of
    re-sorting the whole table; a full sort over 100 TB is a job you
    run once, not per maintenance cycle).

    For tables clustered with a total ORDER on one column (the
    clustering.columns single-column strategy), files whose [min, max]
    ranges are disjoint are ALREADY clustered — only overlapping range
    groups need a rewrite. Interval-merge the per-file stats (driver,
    O(files log files)), rewrite each overlapping group with a range
    shuffle, and leave everything else untouched."""
    ccols = [c.strip() for c in
             table.schema.options.get("clustering.columns", "").split(",")
             if c.strip()]
    col = col or (ccols[0] if len(ccols) == 1 else None)
    if col is None:
        raise ValueError(
            "incremental cluster compaction needs a single total-order "
            "cluster column; multi-dimensional layouts (zorder/hilbert) "
            "need sort_compact")
    plan = table.new_scan().plan()
    spans = []
    for e in plan.entries:
        s = (e.stats or {}).get(col) or {}
        if s.get("min") is None:
            spans.append((None, None, e))        # no stats: always merge
        else:
            spans.append((s["min"], s["max"], e))
    known = sorted([x for x in spans if x[0] is not None],
                   key=lambda x: (x[0], x[1]))
    unknown = [x[2] for x in spans if x[0] is None]
    groups: list[list] = []
    cur, cur_hi = [], None
    for lo, hi, e in known:
        if cur and lo <= cur_hi:                 # overlap (inclusive)
            cur.append(e)
            cur_hi = max(cur_hi, hi)
        else:
            if cur:
                groups.append(cur)
            cur, cur_hi = [e], hi
    if cur:
        groups.append(cur)
    victims = [e for g in groups if len(g) > 1 for e in g] + unknown
    if not victims:
        return table.paths.latest_snapshot()     # already clustered
    w = table.writer()
    target = int(table.schema.options.get("target-file-size",
                                          str(128 << 20)))
    total = sum(e.file_size for e in victims)
    n_out = max(1, (total + target - 1) // target)
    df = table._rewrite_source_df(victims)
    out = (df.select(*table.schema.field_names)
           .repartitionByRange(int(n_out), F.col(col))
           .sortWithinPartitions(col))
    adds = w.stage(out, level=COMPACTED_LEVEL)
    deletes = [FileEntry(**{**e.__dict__, "kind": DELETE})
               for e in victims]
    return w.commit(adds + deletes, COMMIT_COMPACT)
