"""Predicate AST for scan planning: partition pruning + per-file stats skipping.

Mirrors the reference's predicate layer
(ref: paimon-common/src/main/java/org/apache/paimon/predicate/ — one leaf
class per op, PredicateBuilder.java; stats test = each leaf's
test(rowCount, minValues, maxValues, nullCounts)).

A Predicate serves three roles here:
1. `to_spark()`   — residual filter Column (Catalyst pushes it into parquet
                    row-group pruning too, so nothing is lost by also
                    filtering post-scan).
2. `test_partition(values)` — can a partition possibly match? (exact values)
3. `test_stats(row_count, stats)` — can a file possibly contain a match,
                    judged from per-column min/max/null-count.

All tests are *may-match* (three-valued: unknown ⇒ keep the file).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cmp_ok(a, b) -> bool:
    """Whether a/b are comparable (avoid str<int TypeErrors → unknown)."""
    try:
        a < b  # noqa: B015
        return True
    except TypeError:
        return False


class Predicate:
    def __and__(self, other: "Predicate") -> "Predicate":
        return And([self, other])

    def __or__(self, other: "Predicate") -> "Predicate":
        return Or([self, other])

    # --- interface ---
    def to_spark(self) -> Column: ...
    def refs(self) -> set[str]: ...
    def test_partition(self, values: dict[str, Any]) -> bool: ...
    def test_stats(self, row_count: int, stats: dict[str, dict]) -> bool: ...

    def test_file_index(self, lookup) -> bool:
        """May-match against a per-file index. lookup(col, value) returns
        False (definitely absent), True (maybe), or None (not indexed).
        Conservative default: maybe. (ref: fileindex/FileIndexPredicate.java)"""
        return True

    def partition_only(self, partition_keys: Sequence[str]) -> bool:
        return self.refs() <= set(partition_keys)


@dataclass
class Leaf(Predicate):
    op: str
    field: str
    literal: Any = None

    def refs(self) -> set[str]:
        return {self.field}

    def to_spark(self) -> Column:
        c = F.col(self.field)
        v = self.literal
        return {
            "eq": lambda: c == F.lit(v),
            "ne": lambda: c != F.lit(v),
            "lt": lambda: c < F.lit(v),
            "le": lambda: c <= F.lit(v),
            "gt": lambda: c > F.lit(v),
            "ge": lambda: c >= F.lit(v),
            "in": lambda: c.isin(list(v)),
            "not_in": lambda: ~c.isin(list(v)),
            "is_null": lambda: c.isNull(),
            "not_null": lambda: c.isNotNull(),
            "starts_with": lambda: c.startswith(v),
            "ends_with": lambda: c.endswith(v),
            "contains": lambda: c.contains(v),
            "between": lambda: c.between(F.lit(v[0]), F.lit(v[1])),
            "not_between": lambda: ~c.between(F.lit(v[0]), F.lit(v[1])),
            "like": lambda: c.like(v),
            "is_nan": lambda: F.isnan(c),
        }[self.op]()

    def _like_re(self):
        """SQL LIKE pattern → anchored regex (%→.*, _→.)."""
        import re as _re
        out, i, v = [], 0, str(self.literal)
        while i < len(v):
            ch = v[i]
            if ch == "\\" and i + 1 < len(v):
                out.append(_re.escape(v[i + 1]))
                i += 2
                continue
            out.append(".*" if ch == "%" else "." if ch == "_"
                       else _re.escape(ch))
            i += 1
        return _re.compile("".join(out), _re.DOTALL)

    def _test_value(self, x: Any) -> bool:
        """Exact per-value evaluation of this leaf (None = SQL NULL)."""
        v = self.literal
        if x is None:
            return self.op == "is_null"
        try:
            return {
                "eq": lambda: x == v, "ne": lambda: x != v,
                "lt": lambda: x < v, "le": lambda: x <= v,
                "gt": lambda: x > v, "ge": lambda: x >= v,
                "in": lambda: x in v, "not_in": lambda: x not in v,
                "is_null": lambda: False, "not_null": lambda: True,
                "starts_with": lambda: isinstance(x, str) and x.startswith(v),
                "ends_with": lambda: isinstance(x, str) and x.endswith(v),
                "contains": lambda: isinstance(x, str) and v in x,
                "between": lambda: v[0] <= x <= v[1],
                "not_between": lambda: not (v[0] <= x <= v[1]),
                "like": lambda: isinstance(x, str)
                and self._like_re().fullmatch(x) is not None,
                "is_nan": lambda: isinstance(x, float)
                and x != x,
            }[self.op]()
        except TypeError:
            return True

    # --- partition exact-value test (ref: predicate/PartitionPredicateVisitor.java) ---
    def test_partition(self, values: dict[str, Any]) -> bool:
        if self.field not in values:
            return True
        return self._test_value(values[self.field])

    # --- file stats may-match test (ref: predicate leaf test(min,max,nullCount)) ---
    def test_stats(self, row_count: int, stats: dict[str, dict]) -> bool:
        s = stats.get(self.field)
        if s is None:
            return True
        mn, mx, nulls = s.get("min"), s.get("max"), s.get("nulls")
        all_null = nulls is not None and row_count and nulls >= row_count
        if self.op == "is_null":
            return nulls is None or nulls > 0
        if self.op == "not_null":
            return not all_null
        if all_null:
            return False
        v = self.literal
        if mn is None or mx is None:
            # no min/max stats; only null-based pruning possible
            return True
        probe = v
        if self.op == "in":
            probe = next(iter(v), None)
        elif self.op == "between":
            probe = v[0]
        if self.op in ("eq", "lt", "le", "gt", "ge", "between", "in") \
                and not _cmp_ok(mn, probe):
            return True
        try:
            if self.op == "eq":
                return mn <= v <= mx
            if self.op == "lt":
                return mn < v
            if self.op == "le":
                return mn <= v
            if self.op == "gt":
                return mx > v
            if self.op == "ge":
                return mx >= v
            if self.op == "in":
                return any(mn <= x <= mx for x in v)
            if self.op == "between":
                lo, hi = v
                return not (mx < lo or mn > hi)
            if self.op == "not_between":
                # no row can match only when EVERY row is inside [lo, hi]
                lo, hi = v
                return not (lo <= mn and mx <= hi)
            if self.op == "starts_with" and isinstance(mn, str) and isinstance(mx, str):
                # file may contain strings with prefix v iff range overlaps [v, v+∞)
                return mx >= v and mn[: len(v)] <= v
            if self.op == "like" and isinstance(mn, str) and isinstance(mx, str):
                # literal prefix before the first wildcard prunes like
                # starts_with; wildcard-led patterns can't use stats
                p = str(v)
                cut = len(p)
                for i, ch in enumerate(p):
                    if ch in "%_":
                        cut = i
                        break
                    if ch == "\\":
                        cut = i
                        break
                prefix = p[:cut]
                if prefix:
                    return mx >= prefix and mn[: len(prefix)] <= prefix
        except TypeError:
            return True
        # ne / not_in / ends_with / contains: min==max exact-file shortcut
        if self.op == "ne":
            return not (mn == mx == v)
        if self.op == "not_in":
            return not (mn == mx and mn in v)
        return True

    def test_file_index(self, lookup) -> bool:
        """Bloom refutes membership (eq/in). A bitmap index carries the
        file's EXACT distinct-value set, so EVERY leaf op evaluates
        exactly over it — eq/in without false positives, ne/NOT IN (skip
        when the whole set is rejected), and range/string ops where
        min/max overlaps but no actual value falls in the window (the
        file-granularity analog of the reference's range-bitmap/BSI
        indexes; ref: fileindex/bitmap/BitmapFileIndex.java,
        rangebitmap/RangeBitmapFileIndex.java)."""
        dfn = getattr(lookup, "distinct", None)
        d = dfn(self.field) if dfn is not None else None
        if d is not None:
            values, has_null = d
            if self.op == "is_null":
                return has_null
            return any(self._test_value(x) for x in values)
        if self.op == "eq":
            r = lookup(self.field, self.literal)
            return True if r is None else r
        if self.op == "in":
            results = [lookup(self.field, v) for v in self.literal]
            if any(r is None for r in results):
                return True
            return any(results)
        return True


@dataclass
class And(Predicate):
    children: list[Predicate]

    def refs(self): return set().union(*(c.refs() for c in self.children))

    def to_spark(self):
        col = self.children[0].to_spark()
        for c in self.children[1:]:
            col = col & c.to_spark()
        return col

    def test_partition(self, values): return all(c.test_partition(values) for c in self.children)
    def test_stats(self, rc, stats): return all(c.test_stats(rc, stats) for c in self.children)
    def test_file_index(self, lookup): return all(c.test_file_index(lookup) for c in self.children)

    def partition_pruning_part(self, partition_keys: Sequence[str]) -> "Predicate | None":
        """Conjuncts referencing only partition keys (safe to prune with)."""
        parts = [c for c in self.children if c.refs() <= set(partition_keys)]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else And(parts)


@dataclass
class Or(Predicate):
    children: list[Predicate]

    def refs(self): return set().union(*(c.refs() for c in self.children))

    def to_spark(self):
        col = self.children[0].to_spark()
        for c in self.children[1:]:
            col = col | c.to_spark()
        return col

    def test_partition(self, values): return any(c.test_partition(values) for c in self.children)
    def test_stats(self, rc, stats): return any(c.test_stats(rc, stats) for c in self.children)
    def test_file_index(self, lookup): return any(c.test_file_index(lookup) for c in self.children)


def _xf_year(v):
    if hasattr(v, "year"):
        return v.year
    if isinstance(v, str):
        return int(v[:4])
    return None


def _xf_to_date(v):
    import datetime as _dt
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    if isinstance(v, str):
        return _dt.date.fromisoformat(v[:10])
    return None


@dataclass
class Transform(Leaf):
    """Monotone function-transform predicate, e.g. year(ts) = 2024 — the
    skipping-capable subset of the reference's transform predicates
    (ref: predicate/Transform.java:36-42; only monotone transforms can use
    min/max stats: a file's [min,max] maps to [fn(min), fn(max)]).
    Non-monotone transforms (month, hour, substring-mid) stay residual-only
    via P.expr."""
    fn: str = "year"

    _FNS = {"year": (_xf_year, F.year),
            "to_date": (_xf_to_date, F.to_date)}

    def to_spark(self) -> Column:
        _py, sp = self._FNS[self.fn]
        return {
            "eq": lambda c: c == F.lit(self.literal),
            "ne": lambda c: c != F.lit(self.literal),
            "lt": lambda c: c < F.lit(self.literal),
            "le": lambda c: c <= F.lit(self.literal),
            "gt": lambda c: c > F.lit(self.literal),
            "ge": lambda c: c >= F.lit(self.literal),
            "in": lambda c: c.isin(*self.literal),
            "between": lambda c: c.between(F.lit(self.literal[0]),
                                           F.lit(self.literal[1])),
        }[self.op](sp(F.col(self.field)))

    def _apply(self, v):
        try:
            return self._FNS[self.fn][0](v)
        except (ValueError, TypeError):
            return None

    def test_partition(self, values):
        if self.field not in values:
            return True
        x = self._apply(values[self.field])
        if x is None:
            return True
        return Leaf(self.op, self.field, self.literal).test_partition(
            {self.field: x})

    def test_stats(self, row_count, stats):
        s = stats.get(self.field)
        if s is None:
            return True
        mn, mx = self._apply(s.get("min")), self._apply(s.get("max"))
        if mn is None or mx is None:
            return True
        return Leaf(self.op, self.field, self.literal).test_stats(
            row_count, {self.field: {"min": mn, "max": mx,
                                     "nulls": s.get("nulls")}})

    def test_file_index(self, lookup):
        return True     # indexes hold raw values, not transformed ones


@dataclass
class Expr(Predicate):
    """Opaque SQL expression predicate: participates in residual filtering
    only — never prunes (refs() reports an unknown column so partition_only
    is False and every file may-match)."""
    sql: str

    def refs(self) -> set[str]:
        return {"__opaque_expr__"}

    def to_spark(self) -> Column:
        return F.expr(self.sql)

    def test_partition(self, values): return True
    def test_stats(self, rc, stats): return True


class P:
    """Predicate builders (≈ PredicateBuilder.java:626)."""
    @staticmethod
    def eq(f, v): return Leaf("eq", f, v)
    @staticmethod
    def ne(f, v): return Leaf("ne", f, v)
    @staticmethod
    def lt(f, v): return Leaf("lt", f, v)
    @staticmethod
    def le(f, v): return Leaf("le", f, v)
    @staticmethod
    def gt(f, v): return Leaf("gt", f, v)
    @staticmethod
    def ge(f, v): return Leaf("ge", f, v)
    @staticmethod
    def isin(f, vs): return Leaf("in", f, list(vs))
    @staticmethod
    def not_in(f, vs): return Leaf("not_in", f, list(vs))
    @staticmethod
    def is_null(f): return Leaf("is_null", f)
    @staticmethod
    def not_null(f): return Leaf("not_null", f)
    @staticmethod
    def starts_with(f, v): return Leaf("starts_with", f, v)
    @staticmethod
    def ends_with(f, v): return Leaf("ends_with", f, v)
    @staticmethod
    def contains(f, v): return Leaf("contains", f, v)
    @staticmethod
    def between(f, lo, hi): return Leaf("between", f, (lo, hi))
    @staticmethod
    def not_between(f, lo, hi): return Leaf("not_between", f, (lo, hi))
    @staticmethod
    def like(f, pattern): return Leaf("like", f, pattern)
    @staticmethod
    def is_nan(f): return Leaf("is_nan", f)
    @staticmethod
    def transform(fn, op, f, v):
        """Monotone transform predicate with stats skipping:
        P.transform('year', 'eq', 'ts', 2024)."""
        if fn not in Transform._FNS:
            raise ValueError(f"unsupported transform {fn}; "
                             f"use P.expr for residual-only predicates")
        return Transform(op, f, v, fn=fn)
    @staticmethod
    def and_(*ps): return And(list(ps))
    @staticmethod
    def or_(*ps): return Or(list(ps))
    @staticmethod
    def expr(sql): return Expr(sql)
