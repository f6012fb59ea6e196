"""Standalone per-file indexes: bloom filters evaluated at plan time.

(ref: paimon-common/src/main/java/org/apache/paimon/fileindex/
 bloomfilter/BloomFilterFileIndex.java; docs: file-index.bloom-filter.columns.
 Paimon writes an index sidecar per data file and tests equality predicates
 against it during scan planning, skipping files min/max stats can't —
 high-cardinality point lookups where every file's [min,max] spans the key.)

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


def write_file_index(table_root: str, data_file_abs: str, columns: list[str],
                     fpp: float = 0.01) -> str | None:
    """Build bloom filters for `columns` of one data file → sidecar under
    index/. Returns the sidecar path relative to table root."""
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
    payload = {c: BloomFilter.build(tbl.column(c).to_pylist(), fpp).to_json()
               for c in present}
    os.makedirs(os.path.join(table_root, INDEX_DIR), exist_ok=True)
    rel = os.path.join(INDEX_DIR, f"index-{uuid.uuid4().hex}.json")
    tmp = os.path.join(table_root, rel + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
    os.replace(tmp, os.path.join(table_root, rel))
    return rel


_index_cache: dict[str, dict[str, BloomFilter]] = {}
_INDEX_CACHE_MAX = 8192


def load_file_index(table_root: str, rel_path: str) -> dict[str, BloomFilter]:
    """Immutable once written → process-wide cache (like manifests)."""
    key = os.path.join(table_root, rel_path)
    hit = _index_cache.get(key)
    if hit is not None:
        return hit
    with open(key) as f:
        payload = json.load(f)
    out = {c: BloomFilter.from_json(d) for c, d in payload.items()}
    if len(_index_cache) < _INDEX_CACHE_MAX:
        _index_cache[key] = out
    return out


def make_lookup(table_root: str, rel_path: str | None) -> Callable[[str, Any], bool | None]:
    """lookup(col, value) -> False = definitely absent, True = maybe,
    None = column not indexed."""
    if not rel_path:
        return lambda col, value: None
    idx = load_file_index(table_root, rel_path)

    def lookup(col: str, value: Any):
        bf = idx.get(col)
        if bf is None:
            return None
        return bf.may_contain(value)

    return lookup
