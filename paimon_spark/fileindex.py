"""Standalone per-file indexes: bloom filters + exact bitmaps at plan time.

(ref: paimon-common/src/main/java/org/apache/paimon/fileindex/
 bloomfilter/BloomFilterFileIndex.java — file-index.bloom-filter.columns;
 bitmap/BitmapFileIndex.java — file-index.bitmap.columns.
 Paimon writes an index sidecar per data file and tests predicates against
 it during scan planning, skipping files min/max stats can't.)

Two index kinds:
- **bloom** (high-cardinality point lookups): probabilistic, refutes
  eq/in membership — a false positive only costs a scan.
- **bitmap** (LOW-cardinality columns): the EXACT distinct-value set of
  the file (plus per-value counts and a null marker). Exactness enables
  pruning bloom cannot do: eq/in on unsorted low-card data without false
  positives, and crucially ne / NOT IN — a file whose whole value set is
  contained in the rejected set is skipped. The reference stores one
  roaring bitmap of row positions per value; at FILE granularity (the
  only granularity this planner prunes) that collapses to the value set +
  counts, so that is what the sidecar stores. Columns above
  `file-index.bitmap.max-cardinality` (default 1024) are left unindexed
  in that file (sound: absent index → never skipped).

Spark-first shape: the index is built from the staged parquet file with a
single pyarrow column read at commit time and stored as one small JSON
sidecar under index/ at the table root. Plan-time testing is driver-side —
for a 100 TB table the indexes are ~0.01% of data size and the scan plan
drops whole files before Spark ever schedules a task.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
import struct
import uuid
from typing import Any, Callable

INDEX_DIR = "index"


def _h128(data: bytes) -> tuple[int, int]:
    d = hashlib.md5(data).digest()
    return (struct.unpack("<Q", d[:8])[0], struct.unpack("<Q", d[8:])[0])


def _encode(value: Any) -> bytes:
    """Canonical hash encoding per logical type: int-valued floats hash like
    ints so a literal 5 finds rows written as 5.0 and vice versa."""
    if isinstance(value, bool):
        return b"b%d" % value
    if isinstance(value, float) and value.is_integer():
        value = int(value)
    if isinstance(value, int):
        return b"i" + str(value).encode()
    if isinstance(value, float):
        return b"f" + repr(value).encode()
    if isinstance(value, bytes):
        return b"y" + value
    return b"s" + str(value).encode()


class BloomFilter:
    """Double-hashing bloom filter (h1 + i*h2 mod m), pure-python bitset."""

    def __init__(self, bits: bytearray, m: int, k: int):
        self.bits, self.m, self.k = bits, m, k

    @staticmethod
    def build(values, fpp: float = 0.01) -> "BloomFilter":
        vals = [v for v in values if v is not None]
        n = max(len(vals), 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        bf = BloomFilter(bytearray((m + 7) // 8), m, k)
        for v in vals:
            h1, h2 = _h128(_encode(v))
            for i in range(k):
                pos = (h1 + i * h2) % m
                bf.bits[pos >> 3] |= 1 << (pos & 7)
        return bf

    def may_contain(self, value: Any) -> bool:
        if value is None:
            return True
        h1, h2 = _h128(_encode(value))
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (self.bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True

    def to_json(self) -> dict:
        return {"m": self.m, "k": self.k,
                "bits": base64.b64encode(bytes(self.bits)).decode()}

    @staticmethod
    def from_json(d: dict) -> "BloomFilter":
        return BloomFilter(bytearray(base64.b64decode(d["bits"])), d["m"], d["k"])


class BitmapIndex:
    """Exact distinct-value index of ONE file's column (+counts, +null).
    Values are kept as DECODED python objects so plan-time predicate
    leaves (ranges, string ops, negations) evaluate exactly over them.

    Optionally also stores per-value ROW POSITIONS as run-length ranges
    ([start, end) pairs — the run-encoded flavor of the reference's
    roaring position bitmaps, ref: fileindex/bitmap/BitmapFileIndex.java).
    Positions enable sub-file pruning: an eq/IN over an indexed column
    turns into `_metadata.row_index` range filters so only matching row
    runs of a huge unsorted file flow into the query. When the data is so
    scattered the runs stop compressing (> max_runs total), positions are
    dropped and the index stays value-set-only — sound, file-granularity
    pruning still applies."""

    def __init__(self, values: dict[Any, int], has_null: bool,
                 positions: dict[Any, list] | None = None):
        self.values = values           # distinct value -> row count
        self.has_null = has_null
        self.positions = positions     # value -> [start,end) flat pairs

    @staticmethod
    def build(raw, max_cardinality: int = 1024,
              max_runs: int = 4096) -> "BitmapIndex | None":
        vals: dict[Any, int] = {}
        runs: dict[Any, list] | None = {}
        total_runs = 0
        has_null = False
        for i, v in enumerate(raw):
            if v is None:
                has_null = True
                continue
            vals[v] = vals.get(v, 0) + 1
            if len(vals) > max_cardinality:
                return None            # too wide for a bitmap — no index
            if runs is not None:
                r = runs.get(v)
                if r is not None and r[-1] == i:
                    r[-1] = i + 1      # extend current run
                else:
                    if r is None:
                        r = runs[v] = []
                    r.extend((i, i + 1))
                    total_runs += 1
                    if total_runs > max_runs:
                        runs = None    # too scattered — value set only
        return BitmapIndex(vals, has_null, runs)

    def may_contain(self, value) -> bool:
        if value is None:
            return self.has_null
        try:
            return value in self.values
        except TypeError:
            return True

    def distinct(self) -> tuple[frozenset, bool]:
        return frozenset(self.values), self.has_null

    def ranges_for(self, literals) -> list[tuple[int, int]] | None:
        """Merged [start, end) row ranges containing every row whose value
        is in `literals`, or None when positions weren't retained."""
        if self.positions is None:
            return None
        pairs: list[tuple[int, int]] = []
        for v in literals:
            try:
                flat = self.positions.get(v)
            except TypeError:
                return None            # unhashable literal — no pruning
            if flat:
                pairs.extend(zip(flat[::2], flat[1::2]))
        if not pairs:
            return []
        pairs.sort()
        merged = [list(pairs[0])]
        for s, e in pairs[1:]:
            if s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        return [(s, e) for s, e in merged]

    def to_json(self) -> dict:
        from paimon_spark.metadata import stat_to_json
        out = {"t": "bm",
               "vals": [[stat_to_json(v), n]
                        for v, n in self.values.items()],
               "null": self.has_null}
        if self.positions is not None:
            out["pos"] = [[stat_to_json(v), r]
                          for v, r in self.positions.items()]
        return out

    @staticmethod
    def from_json(d: dict) -> "BitmapIndex":
        from paimon_spark.metadata import stat_from_json
        pos = None
        if "pos" in d:
            pos = {stat_from_json(v): r for v, r in d["pos"]}
        return BitmapIndex({stat_from_json(v): n for v, n in d["vals"]},
                           bool(d["null"]), pos)


def index_spec(options: dict) -> dict | None:
    """Parse file-index options → {"bloom": [...], "fpp": f, "bitmap": [...],
    "max_card": n} or None when no index is configured."""
    bloom = [c.strip() for c in options.get(
        "file-index.bloom-filter.columns", "").split(",") if c.strip()]
    bitmap = [c.strip() for c in options.get(
        "file-index.bitmap.columns", "").split(",") if c.strip()]
    if not bloom and not bitmap:
        return None
    return {"bloom": [c for c in bloom if c not in bitmap],
            "fpp": float(options.get("file-index.bloom-filter.fpp", "0.01")),
            "bitmap": bitmap,
            "max_card": int(options.get("file-index.bitmap.max-cardinality",
                                        "1024")),
            "max_runs": int(options.get(
                "file-index.bitmap.position-runs-max", "4096"))}


def write_file_index(table_root: str, data_file_abs: str,
                     spec: dict | list | None,
                     fpp: float = 0.01) -> str | None:
    """Build the configured index sidecar for one data file. `spec` is an
    index_spec() dict (a bare column list means bloom-only, kept for older
    callers). Returns the sidecar path relative to table root."""
    if isinstance(spec, (list, tuple)):
        spec = {"bloom": list(spec), "fpp": fpp, "bitmap": [],
                "max_card": 1024}
    if not spec:
        return None
    columns = list(dict.fromkeys(spec["bloom"] + spec["bitmap"]))
    if data_file_abs.endswith(".orc"):
        import pyarrow.orc as _orc
        pf = _orc.ORCFile(data_file_abs)
        present = [c for c in columns if c in pf.schema.names]
        if not present:
            return None
        tbl = pf.read(columns=present)
    else:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(data_file_abs)
        present = [c for c in columns if c in pf.schema_arrow.names]
        if not present:
            return None
        tbl = pf.read(columns=present)
    payload = {}
    for c in present:
        raw = tbl.column(c).to_pylist()
        if c in spec["bitmap"]:
            bm = BitmapIndex.build(raw, spec["max_card"],
                                   spec.get("max_runs", 4096))
            if bm is not None:
                payload[c] = bm.to_json()
                continue               # over-cardinality: no index for c
        if c in spec["bloom"]:
            payload[c] = BloomFilter.build(raw, spec["fpp"]).to_json()
    if not payload:
        return None
    os.makedirs(os.path.join(table_root, INDEX_DIR), exist_ok=True)
    rel = os.path.join(INDEX_DIR, f"index-{uuid.uuid4().hex}.json")
    tmp = os.path.join(table_root, rel + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
    os.replace(tmp, os.path.join(table_root, rel))
    return rel


_index_cache: dict[str, dict[str, Any]] = {}
_INDEX_CACHE_MAX = 8192


def load_file_index(table_root: str, rel_path: str) -> dict[str, Any]:
    """Immutable once written → process-wide cache (like manifests)."""
    key = os.path.join(table_root, rel_path)
    hit = _index_cache.get(key)
    if hit is not None:
        return hit
    with open(key) as f:
        payload = json.load(f)
    out = {c: (BitmapIndex.from_json(d) if d.get("t") == "bm"
               else BloomFilter.from_json(d))
           for c, d in payload.items()}
    if len(_index_cache) < _INDEX_CACHE_MAX:
        _index_cache[key] = out
    return out


def make_lookup(table_root: str, rel_path: str | None) -> Callable[[str, Any], bool | None]:
    """lookup(col, value) -> False = definitely absent, True = maybe,
    None = column not indexed. The callable also carries a `.distinct(col)`
    attribute → (frozenset of encoded values, has_null) for bitmap-indexed
    columns (exact-set pruning: ne / NOT IN), else None."""
    if not rel_path:
        fn = lambda col, value: None               # noqa: E731
        fn.distinct = lambda col: None
        fn.ranges = lambda col, literals: None
        return fn
    idx = load_file_index(table_root, rel_path)

    def lookup(col: str, value: Any):
        ix = idx.get(col)
        if ix is None:
            return None
        return ix.may_contain(value)

    def distinct(col: str):
        ix = idx.get(col)
        return ix.distinct() if isinstance(ix, BitmapIndex) else None

    def ranges(col: str, literals):
        ix = idx.get(col)
        return (ix.ranges_for(literals)
                if isinstance(ix, BitmapIndex) else None)

    lookup.distinct = distinct
    lookup.ranges = ranges
    return lookup
