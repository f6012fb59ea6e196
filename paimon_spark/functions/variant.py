"""Variant (semi-structured) column support — Spark 4 native.

(ref: paimon-common/.../types/VariantType.java:29; paimon-spark/.../read/
 VariantPushDownUtils.scala — variant_get extraction pushdown. Spark 4 has
 VariantType + parse_json/variant_get built in (JVM-side, codegen), so the
 engine's job is only the convenience surface; shredding pushdown is
 Catalyst's.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_variant(col) -> Column:
    """JSON string → VARIANT (binary semi-structured encoding)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_json(c)


def try_to_variant(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.try_parse_json(c)


def variant_get(col, path: str, dtype: str = "string") -> Column:
    """Extract a typed field from a VARIANT column, e.g.
    variant_get(v, '$.user.id', 'bigint')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.variant_get(c, path, dtype)


def is_variant_null(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.is_variant_null(c)
