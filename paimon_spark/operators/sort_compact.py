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

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from paimon_spark.metadata import COMMIT_COMPACT, DELETE, FileEntry
from paimon_spark.table import COMPACTED_LEVEL, Table

Z_BITS = 16  # bits per dimension (16 bits × up to 4 dims fits a BIGINT)
MAXV = (1 << Z_BITS) - 1


def _normalized(table: Table, c: str) -> Column:
    """Map column c to [0, 2^Z_BITS) preserving order.

    Numerics/dates: linear min-max scaling with bounds from manifest stats
    (skewed data clusters less evenly but stays correct — same trade-off as
    the reference's byte-slice zvalues). Strings: first-2-bytes ordinal."""
    dtype = table.schema.data_type(c)
    col = F.col(c)
    if isinstance(dtype, T.StringType):
        # first-2-bytes ordinal: order-preserving for the leading prefix
        return (F.coalesce(F.ascii(F.substring(col, 1, 1)), F.lit(0)) * 256
                + F.coalesce(F.ascii(F.substring(col, 2, 1)), F.lit(0))
                ).cast("long") % (MAXV + 1)
    mm = table.new_scan().metadata_min_max(c)
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


def zvalue(table: Table, cols: list[str]) -> Column:
    """Bit-interleaved z-value over the normalized columns."""
    n = len(cols)
    norm = {c: _normalized(table, c) for c in cols}
    acc = F.lit(0).cast("long")
    for bit in range(Z_BITS):
        for i, c in enumerate(cols):
            b = F.shiftright(norm[c], bit).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(b.cast("long"), bit * n + i)
    return acc


def sort_compact(table: Table, order_by: list[str],
                 strategy: str = "zorder", n_files: int | None = None):
    """Rewrite the whole table clustered by `order_by`.

    strategy: 'order' (lexicographic range), 'zorder', 'hilbert'
    (hilbert ≈ zorder here: same bit-interleave backbone — documented
    approximation; the reference's Hilbert curve differs in rotation).
    """
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
        z = df.withColumn("__z", zvalue(table, order_by))
        out = (z.repartitionByRange(int(n_files), F.col("__z"))
               .sortWithinPartitions("__z").drop("__z"))
    else:
        raise ValueError(f"unknown sort strategy {strategy}")
    adds = w.stage(out.select(*table.schema.field_names), level=COMPACTED_LEVEL)
    deletes = [FileEntry(**{**e.__dict__, "kind": DELETE}) for e in plan.entries]
    return w.commit(adds + deletes, COMMIT_COMPACT)
