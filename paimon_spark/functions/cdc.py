"""CDC computed-column expressions: the reference's ingestion connectors
let users derive columns (e.g. a partition column) from source fields with
a small named-function vocabulary. The connectors themselves are de-scoped
(SURVEY S11) but the expression vocabulary is engine work, so it's covered
here as a name→Catalyst mapping usable in any ingestion pipeline:

    df.withColumn("dt", computed_column("date_format", "ts", "yyyy-MM-dd"))

(ref: paimon-flink/paimon-flink-cdc/.../cdc/Expression.java:65-150 —
 YEAR/MONTH/DAY/HOUR/MINUTE/SECOND/DATE_FORMAT/SUBSTRING/TRUNCATE/CAST/
 NOW/UPPER/LOWER/TRIM)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def computed_column(expr_name: str, field: str, *args: str) -> Column:
    """Build the named computed-column expression over `field`.
    Names and argument shapes follow the reference's Expression registry."""
    name = expr_name.lower()
    col = F.col(field)
    if name == "year":
        return F.year(col)
    if name == "month":
        return F.month(col)
    if name == "day":
        return F.dayofmonth(col)
    if name == "hour":
        return F.hour(col)
    if name == "minute":
        return F.minute(col)
    if name == "second":
        return F.second(col)
    if name == "date_format":
        return F.date_format(col, args[0])
    if name == "substring":
        # (begin_inclusive[, end_exclusive]) — reference is 0-based
        begin = int(args[0])
        if len(args) > 1:
            return F.substring(col, begin + 1, int(args[1]) - begin)
        return F.substring(col, begin + 1, 2147483647)
    if name == "truncate":
        # numeric truncate to a multiple of width (ref TruncateComputer)
        width = int(args[0])
        return col - (col % F.lit(width))
    if name == "cast":
        return col.cast(args[0])
    if name == "now":
        return F.current_timestamp()
    if name == "upper":
        return F.upper(col)
    if name == "lower":
        return F.lower(col)
    if name == "trim":
        return F.trim(col)
    raise ValueError(f"unknown computed-column function {expr_name}")
