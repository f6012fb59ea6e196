"""Filesystem capability probes.

The zero-exchange machinery (snapshot-scoped bucketed hardlink views,
JVM FileStreamSource drains, live stream views) relies on `os.link`
being cheap and atomic — true on local filesystems and most
POSIX-compliant DFS mounts, FALSE on object stores (S3/GCS/ABFS via
FUSE shims typically refuse hard links, or emulate them with a full
object copy). The reference gets the same no-shuffle property
connector-side instead, by reporting bucketing through the DSv2 scan
(ref: paimon-spark/.../PaimonScan.scala:115-117
SupportsReportPartitioning), which works on any storage.

`supports_hardlinks(dir)` probes ONCE per filesystem (keyed by
`st_dev`) by actually linking a scratch file, caches the answer, and —
on the first negative probe — logs a single warning naming the exact
downgrade cost so a 100 TB deployment sees the de-optimization instead
of silently eating an extra Exchange per merge read:

  * merge-on-read / PK groupBy / co-located join: +1 Exchange
    (hash repartition on the bucket keys) above each scan;
  * availableNow streaming: JVM FileStreamSource drain falls back to
    the Python DataSource path (~1 s/batch fixed overhead);
  * follow-up streams: live hardlink views unavailable, Python
    DataSource path serves them (correct, slower).

All callers already fall back to plain reads when linking fails; the
probe makes the downgrade explicit, early, and logged exactly once.
"""

from __future__ import annotations

import logging
import os
import uuid

_CACHE: dict[int, bool] = {}
_WARNED = False

_DOWNGRADE_MSG = (
    "filesystem at %s does not support hard links: bucketed "
    "zero-exchange views are disabled (merge-on-read, PK groupBys and "
    "co-located joins each gain one Exchange; availableNow/follow-up "
    "streams use the Python DataSource path). Correctness is "
    "unaffected. On object stores this is expected — see COVERAGE.md "
    "'Object-store scale caveats'."
)


def supports_hardlinks(dir_path: str) -> bool:
    """True iff `os.link` works inside `dir_path` (probed once per
    st_dev and cached). Never raises; an unprobeable directory simply
    reports False and the caller takes its plain-read fallback."""
    global _WARNED
    try:
        dev = os.stat(dir_path).st_dev
    except OSError:
        return False
    hit = _CACHE.get(dev)
    if hit is not None:
        return hit
    src = os.path.join(dir_path, f".lnkprobe-{uuid.uuid4().hex[:12]}")
    dst = src + ".l"
    ok = False
    try:
        with open(src, "w", encoding="utf-8") as f:
            f.write("probe")
        os.link(src, dst)
        ok = True
    except OSError:
        ok = False
    finally:
        for p in (src, dst):
            try:
                os.unlink(p)
            except OSError:
                pass
    _CACHE[dev] = ok
    if not ok and not _WARNED:
        _WARNED = True
        logging.getLogger(__name__).warning(_DOWNGRADE_MSG, dir_path)
    return ok


def reset_probe_cache() -> None:
    """Test hook: forget all cached probe results."""
    global _WARNED
    _CACHE.clear()
    _WARNED = False
