"""Universal compaction: pick which sorted runs to rewrite, per bucket.

Re-implements the three decision rules of the reference's universal
strategy from their documented semantics
(ref: paimon-core/.../mergetree/compact/UniversalCompaction.java:42,67-108 —
size-amplification :79, size-ratio :88, run-count :97; triggers
CoreOptions.java:909 num-sorted-run.compaction-trigger, :985 size-ratio):

1. size amplification: if the younger runs together exceed
   `max-size-amplification-percent` of the oldest run, rewrite everything
   (bounds space amplification).
2. size ratio: walk newest→oldest accumulating sizes; while the next run
   is no bigger than (100+size_ratio)% of the accumulated prefix, extend
   the prefix; compact the prefix if it covers >1 run.
3. run count: if the bucket still has more than `trigger` runs, compact
   the newest (count - trigger + 1) runs.

The picker is pure driver-side Python over manifest entries (O(#files));
the rewrite is a Spark job per picked set. Partial (non-full) compaction
preserves delete tombstones and per-key sequence numbers so read-time
merging with the untouched older runs stays correct.
"""

from __future__ import annotations

from dataclasses import dataclass

from paimon_spark.metadata import FileEntry


@dataclass
class CompactionPick:
    entries: list[FileEntry]     # runs to rewrite (newest-first prefix)
    full: bool                   # covers every live run in the bucket


def pick_compaction(runs: list[FileEntry],
                    trigger: int = 5,
                    max_size_amplification_percent: int = 200,
                    size_ratio: int = 1) -> CompactionPick | None:
    """`runs` = live files of one (partition, bucket), any order.
    Returns the newest-first prefix to compact, or None."""
    if len(runs) < 2:
        return None
    # newest first: higher max_seq = younger run
    ordered = sorted(runs, key=lambda e: e.max_seq, reverse=True)
    if len(ordered) < trigger:
        return None

    # rule 1: size amplification
    younger = sum(e.file_size for e in ordered[:-1])
    oldest = ordered[-1].file_size or 1
    if younger * 100 > max_size_amplification_percent * oldest:
        return CompactionPick(ordered, full=True)

    # rule 2: size ratio — grow a newest-first prefix
    acc = ordered[0].file_size
    prefix = 1
    for e in ordered[1:]:
        if acc * (100 + size_ratio) >= e.file_size * 100:
            acc += e.file_size
            prefix += 1
        else:
            break
    if prefix > 1:
        return CompactionPick(ordered[:prefix], full=prefix == len(ordered))

    # rule 3: reduce run count below the trigger
    n = len(ordered) - trigger + 1
    if n > 1:
        return CompactionPick(ordered[:n], full=n == len(ordered))
    return None
