"""Portable cardinality sketches: HyperLogLog and theta (KMV) as bytes.

(ref: paimon-common/.../mergetree/compact/aggregate/FieldHllSketchAgg.java,
 FieldThetaSketchAgg.java — fields typed VARBINARY carrying sketch blobs;
 rows contribute sketches, the merge engine unions them. The reference uses
 Apache DataSketches; that library isn't in this container, so these are
 self-contained deterministic implementations with the same algebra:
 build → union (commutative, associative, idempotent) → estimate.)

Layout:
  HLL   b"HLL1" + uint8 p + 2^p registers (1 byte each)
  theta b"THT1" + uint16 k + uint32 n + n*uint64 sorted min-hashes (n<=k)

Spark integration is Arrow-batched: sketches are unioned per PK group via a
scalar pandas UDF over collect_list(binary) — blobs are kilobytes, groups
are small, and build typically happens once at ingestion.
"""

import hashlib
import math
import struct
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

HLL_P = 12                 # 4096 registers → ~1.6% standard error
THETA_K = 1024             # KMV keep-k → ~3% standard error


def _hash64(value) -> int:
    if isinstance(value, bool):
        data = b"b%d" % value
    elif isinstance(value, float) and value.is_integer():
        data = b"i" + str(int(value)).encode()
    elif isinstance(value, int):
        data = b"i" + str(value).encode()
    elif isinstance(value, bytes):
        data = b"y" + value
    else:
        data = b"s" + str(value).encode()
    return struct.unpack("<Q", hashlib.md5(data).digest()[:8])[0]


# ---------------- HyperLogLog ----------------

def hll_build(values: Iterable, p: int = HLL_P) -> bytes:
    m = 1 << p
    reg = bytearray(m)
    for v in values:
        if v is None:
            continue
        h = _hash64(v)
        idx = h & (m - 1)
        w = h >> p
        # rank = leading-zero count of the remaining 64-p bits, +1
        rank = (64 - p) - w.bit_length() + 1
        if rank > reg[idx]:
            reg[idx] = rank
    return b"HLL1" + bytes([p]) + bytes(reg)


def hll_union(sketches: Iterable[bytes]) -> bytes | None:
    out = None
    p = HLL_P
    for s in sketches:
        if s is None:
            continue
        if not s.startswith(b"HLL1"):
            raise ValueError("not an HLL1 sketch")
        sp, body = s[4], s[5:]
        if out is None:
            out, p = bytearray(body), sp
        else:
            if sp != p:
                raise ValueError("HLL precision mismatch")
            for i, r in enumerate(body):
                if r > out[i]:
                    out[i] = r
    return None if out is None else b"HLL1" + bytes([p]) + bytes(out)


def hll_estimate(sketch: bytes | None) -> int:
    if sketch is None:
        return 0
    p, reg = sketch[4], sketch[5:]
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** -r for r in reg)
    zeros = reg.count(0)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)          # linear counting
    return int(round(e))


# ---------------- theta (KMV keep-k minimum values) ----------------

def theta_build(values: Iterable, k: int = THETA_K) -> bytes:
    hs = {_hash64(v) for v in values if v is not None}
    keep = sorted(hs)[:k]
    return (b"THT1" + struct.pack("<HI", k, len(keep))
            + struct.pack(f"<{len(keep)}Q", *keep))


def theta_union(sketches: Iterable[bytes]) -> bytes | None:
    acc: set[int] = set()
    k = THETA_K
    seen = False
    for s in sketches:
        if s is None:
            continue
        if not s.startswith(b"THT1"):
            raise ValueError("not a THT1 sketch")
        sk, n = struct.unpack("<HI", s[4:10])
        k = min(k, sk) if seen else sk
        seen = True
        acc.update(struct.unpack(f"<{n}Q", s[10:10 + 8 * n]))
    if not seen:
        return None
    keep = sorted(acc)[:k]
    return (b"THT1" + struct.pack("<HI", k, len(keep))
            + struct.pack(f"<{len(keep)}Q", *keep))


def theta_estimate(sketch: bytes | None) -> int:
    if sketch is None:
        return 0
    k, n = struct.unpack("<HI", sketch[4:10])
    if n < k:
        return n                              # exact below capacity
    kth = struct.unpack("<Q", sketch[10 + 8 * (k - 1):10 + 8 * k])[0]
    theta = kth / 2.0 ** 64
    return int(round((k - 1) / theta))


# ---------------- Spark surface ----------------

def _udfs():
    """Lazily-built pandas UDFs (deferred so plain-python use of the sketch
    algebra never touches Spark)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _hll_from_list(vals: pd.Series) -> pd.Series:
        return vals.map(lambda xs: hll_build([] if xs is None else list(xs)))

    @pandas_udf(T.BinaryType())
    def _hll_union_list(sketches: pd.Series) -> pd.Series:
        return sketches.map(lambda xs: hll_union([] if xs is None else list(xs)))

    @pandas_udf(T.LongType())
    def _hll_est(s: pd.Series) -> pd.Series:
        return s.map(hll_estimate)

    @pandas_udf(T.BinaryType())
    def _theta_from_list(vals: pd.Series) -> pd.Series:
        return vals.map(lambda xs: theta_build([] if xs is None else list(xs)))

    @pandas_udf(T.BinaryType())
    def _theta_union_list(sketches: pd.Series) -> pd.Series:
        return sketches.map(lambda xs: theta_union([] if xs is None else list(xs)))

    @pandas_udf(T.LongType())
    def _theta_est(s: pd.Series) -> pd.Series:
        return s.map(theta_estimate)

    return {"hll_from_list": _hll_from_list, "hll_union_list": _hll_union_list,
            "hll_est": _hll_est, "theta_from_list": _theta_from_list,
            "theta_union_list": _theta_union_list, "theta_est": _theta_est}


_UDFS = None


def udfs():
    global _UDFS
    if _UDFS is None:
        _UDFS = _udfs()
    return _UDFS


def hll_sketch_agg(col) -> Column:
    """Aggregate expression: build one HLL sketch over a raw-value column."""
    return udfs()["hll_from_list"](F.collect_list(col))


def hll_union_agg(col) -> Column:
    """Aggregate expression: union a column of HLL sketch blobs."""
    return udfs()["hll_union_list"](F.collect_list(col))


def hll_estimate_col(col) -> Column:
    return udfs()["hll_est"](col)


def theta_sketch_agg(col) -> Column:
    return udfs()["theta_from_list"](F.collect_list(col))


def theta_union_agg(col) -> Column:
    return udfs()["theta_union_list"](F.collect_list(col))


def theta_estimate_col(col) -> Column:
    return udfs()["theta_est"](col)
