"""Property tests: stats-based file skipping and bloom indexes must never
produce false skips (soundness), whatever the data and predicate.

A file may be read unnecessarily (completeness is best-effort) but a file
containing a matching row must never be pruned — that's the invariant that
keeps pruning correctness-free at any scale.
"""

from hypothesis import given, settings, strategies as st

from paimon_spark.fileindex import BloomFilter
from paimon_spark.predicates import P

values_ints = st.lists(st.integers(-1000, 1000), min_size=1, max_size=50)
values_strs = st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=50)


def _stats(field, vals):
    nn = [v for v in vals if v is not None]
    return {field: {"min": min(nn) if nn else None,
                    "max": max(nn) if nn else None,
                    "nulls": sum(v is None for v in vals)}}


def _leaf_preds(vals, extra):
    pool = list(vals) + list(extra)
    out = []
    for v in pool:
        out += [P.eq("x", v), P.ne("x", v), P.lt("x", v), P.le("x", v),
                P.gt("x", v), P.ge("x", v)]
    out.append(P.isin("x", pool[:3]))
    if len(pool) >= 2:
        lo, hi = sorted(pool[:2])
        out.append(P.between("x", lo, hi))
    out += [P.is_null("x"), P.not_null("x")]
    return out


@settings(max_examples=200, deadline=None)
@given(values_ints, st.integers(-1000, 1000))
def test_stats_skip_soundness_ints(vals, probe):
    stats = _stats("x", vals)
    for pred in _leaf_preds(vals, [probe]):
        matched = [v for v in vals if pred.test_partition({"x": v})]
        if matched:
            assert pred.test_stats(len(vals), stats), (pred, vals)


@settings(max_examples=100, deadline=None)
@given(values_strs, st.text(max_size=8))
def test_stats_skip_soundness_strings(vals, probe):
    stats = _stats("x", vals)
    preds = [P.eq("x", probe), P.le("x", probe), P.ge("x", probe),
             P.between("x", "a", "m"), P.starts_with("x", probe[:2])]
    for pred in preds:
        matched = [v for v in vals if pred.test_partition({"x": v})]
        if matched:
            assert pred.test_stats(len(vals), stats), (pred, vals)


@settings(max_examples=100, deadline=None)
@given(values_ints, st.integers(-1000, 1000))
def test_stats_skip_soundness_with_nulls(vals, probe):
    vals = vals + [None]
    stats = _stats("x", vals)
    for pred in [P.is_null("x"), P.not_null("x"), P.eq("x", probe)]:
        matched = [v for v in vals if pred.test_partition({"x": v})]
        if matched:
            assert pred.test_stats(len(vals), stats), (pred, vals)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.integers(-10**9, 10**9),
                          st.text(max_size=12),
                          st.floats(allow_nan=False, allow_infinity=False)),
                min_size=1, max_size=200))
def test_bloom_no_false_negatives(vals):
    bf = BloomFilter.build(vals)
    for v in vals:
        assert bf.may_contain(v)


@settings(max_examples=100, deadline=None)
@given(values_ints, values_ints)
def test_bloom_predicate_soundness(in_file, probes):
    """Composite predicates tested through test_file_index must keep files
    containing matches."""
    bf = BloomFilter.build(in_file)
    lookup = lambda col, v: bf.may_contain(v)
    for v in probes:
        pred = P.eq("x", v) | P.isin("x", [v, v + 1])
        matched = [x for x in in_file if x in (v, v + 1)]
        if matched:
            assert pred.test_file_index(lookup)
