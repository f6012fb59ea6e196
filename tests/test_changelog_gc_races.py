"""Models of the decoupled-changelog GC racing live readers (VERDICT
r12 #7): long-lived records / sidecars being GC'd while a windowed
derived-changelog read or CDC tail is in flight, consumer pins against
the changelog horizon, and branch × retention isolation.

Pinned contracts:
  1. Consumer pin extends to CHANGELOG expiry (ref: consumer docs —
     progress prevents snapshot and changelog deletion before
     consumption): a consumer positioned below the earliest snapshot,
     reading preserved changelog, blocks the horizon from sweeping the
     records/sidecars it has not consumed yet.
  2. A read raced by GC is fail-or-correct, never wrong: every
     successful collect equals the full-history diff; a raced plan may
     fail (file swept between plan and scan) but a RETRY re-plans from
     the surviving tiers and converges — either the correct diff or
     the typed expired error once the window passed the horizon.
  3. Branch isolation: the main table's changelog GC never touches a
     branch's sidecars and vice versa (meta roots are branch-scoped).
"""

import json
import os
import threading

import pytest
from pyspark.sql import types as T

from paimon_spark import P, Table

SCH = T.StructType([T.StructField("k", T.LongType()),
                    T.StructField("v", T.LongType())])


def _mk_decoupled(spark, wh, name, commits=6):
    t = Table.create(f"{wh}/{name}", SCH, primary_keys=["k"],
                     options={"bucket": "1",
                              "changelog-producer": "lookup",
                              "snapshot.num-retained.max": "50",
                              "changelog.num-retained.max": "100"},
                     spark=spark)
    for i in range(commits):
        t.append(spark.createDataFrame([(i % 3, i), (10 + i, i)], SCH))
    return t


def _sidecar_sids(t):
    d = os.path.join(t.paths.meta_root, "changelog-rows")
    if not os.path.isdir(d):
        return []
    return sorted(int(n.split("-")[1]) for n in os.listdir(d)
                  if not n.startswith("_"))


def _pin_consumer(t, cid, next_snapshot):
    d = os.path.join(t.path, "consumer")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"consumer-{cid}.json"), "w") as f:
        json.dump({"next_snapshot": next_snapshot}, f)


def test_consumer_pins_changelog_horizon(spark, wh):
    """Contract 1: a consumer below the earliest snapshot pins the
    preserved changelog from the horizon GC; removing it (or consumer
    expiration) releases the pin."""
    t = _mk_decoupled(spark, wh, "cl_pin")
    t.expire_snapshots(retain_last=2)            # s1..s4 expired
    assert t.paths.earliest_snapshot_id() == 5
    assert _sidecar_sids(t) == [1, 2, 3, 4, 5, 6]

    # fresh CDC tail at snapshot 3 — sids >= 2 (floor) must survive a
    # horizon that would otherwise drop everything below earliest
    _pin_consumer(t, "tail", 3)
    t = t.alter(lambda sc: sc.set_option("changelog.num-retained.max",
                                         "1"))
    # cl_max=1 < snapshot retention → lifecycle now COUPLED; only
    # sub-floor, sub-earliest sidecars are reclaimable
    t._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [2, 3, 4, 5, 6]

    # consumer done → pin released → coupled GC reclaims below earliest
    os.remove(os.path.join(t.path, "consumer", "consumer-tail.json"))
    t._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [5, 6]


def test_consumer_changelog_only_releases_snapshot_pin(spark, wh):
    """r13 (ref: CoreOptions.CONSUMER_CHANGELOG_ONLY:1666,
    ExpireSnapshotsImpl:140): with a decoupled lifecycle and
    consumer.changelog-only=true, a consumer stops pinning SNAPSHOT
    expiry — it only pins the changelog horizon. Without the option
    the consumer blocks snapshot expiry as before."""
    t = _mk_decoupled(spark, wh, "cl_conly")
    _pin_consumer(t, "tail", 2)

    # default: consumer blocks snapshot expiry past its position
    t.expire_snapshots(retain_last=2)
    assert t.paths.earliest_snapshot_id() == 1

    # changelog-only: snapshots expire past the consumer, changelog is
    # preserved (decoupled) and the horizon GC still honors the pin
    t = t.alter(lambda sc: sc.set_option("consumer.changelog-only",
                                         "true"))
    t.expire_snapshots(retain_last=2)
    assert t.paths.earliest_snapshot_id() == 5
    assert _sidecar_sids(t) == [1, 2, 3, 4, 5, 6]
    t._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [1, 2, 3, 4, 5, 6]   # pinned at floor 1

    # consumer gone → horizon applies again on the next GC pass
    os.remove(os.path.join(t.path, "consumer", "consumer-tail.json"))
    t = t.alter(lambda sc: sc.set_option("changelog.num-retained.max",
                                         "1"))      # now coupled
    t._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [5, 6]


def test_gc_racing_windowed_read_fail_or_correct(spark, wh):
    """Contract 2 (seeded): reader threads loop the full-history
    derived-changelog window while a GC thread expires snapshots and
    tightens the horizon. Every successful read must equal the
    pre-race diff; failures must be plan/scan errors, not wrong rows;
    the post-quiescence retry must raise the typed expired error once
    history is gone."""
    from paimon_spark.operators.changelog import derive_changelog
    t = _mk_decoupled(spark, wh, "cl_race", commits=5)

    def canon():
        t._read_cache.clear()
        return sorted((r.k, r.v, r._row_kind)
                      for r in derive_changelog(t, 1).collect())

    expected = canon()
    results, stop = [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                results.append(("ok", canon()))
            except Exception as e:             # noqa: BLE001 — checked
                results.append(("err", type(e).__name__))

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for th in threads:
        th.start()
    try:
        # let the readers land at least one pre-GC result so the
        # "fail-or-correct" claim is exercised on both sides of the GC
        import time as _time
        deadline = _time.time() + 60
        while not any(k == "ok" for k, _r in results) \
                and _time.time() < deadline:
            _time.sleep(0.2)
        t.expire_snapshots(retain_last=2)
        # tighten to coupled → records+sidecars below earliest sweep
        t.alter(lambda sc: sc.set_option("changelog.num-retained.max",
                                         "1"))
        for _ in range(3):
            t._drop_expired_changelog_keys()
    finally:
        stop.set()
        for th in threads:
            th.join()

    oks = [r for kind, r in results if kind == "ok"]
    assert oks, "no read ever succeeded"
    # fail-or-correct: successful reads are never partial
    for got in oks:
        assert got == expected, "raced read returned WRONG rows"
    # post-quiescence: history below earliest is gone → typed refusal
    with pytest.raises((ValueError, FileNotFoundError)):
        canon()
    # ... and live windows still answer
    t._read_cache.clear()
    live = derive_changelog(t, t.paths.earliest_snapshot_id())
    assert live.count() >= 0


def test_branch_and_main_changelog_gc_isolated(spark, wh):
    """Contract 3: main GC with a tight horizon leaves a branch's
    sidecars alone (branch meta roots are separate)."""
    t = _mk_decoupled(spark, wh, "cl_branch", commits=4)
    t.create_branch("b1", snapshot_id=2)
    bt = Table.load(t.path, spark, branch="b1")
    bt.append(spark.createDataFrame([(77, 77)], SCH))     # branch s3
    branch_before = _sidecar_sids(bt)
    assert branch_before, "branch writes produced no sidecars"

    # main: expire + couple + GC → main sidecars below earliest drop
    t.expire_snapshots(retain_last=1)
    t.alter(lambda sc: sc.set_option("changelog.num-retained.max", "1"))
    t._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [4]
    # branch untouched
    assert _sidecar_sids(bt) == branch_before
    # branch GC runs against branch state only; main's survivor stays
    bt._drop_expired_changelog_keys()
    assert _sidecar_sids(t) == [4]
