"""Spark-compatible xxhash64 in Python/numpy for executor-side bucket
routing.

The fixed-bucket assignment is `pmod(xxhash64(bucket_keys), n)` evaluated
by Spark (writer.py bucket_expr). The Python DataSource Arrow writer
needs the SAME hash inside its write tasks (no SparkSession there) so a
`df.write.format("paimon")` file lands in the bucket every other code
path — stage(), bucket-pruned point lookup, merge grouping — expects.

This is the XXH64 algorithm with Spark's field chaining
(ref: spark/sql/catalyst/expressions/hash.scala XxHash64Function,
 common/sketch XXH64.java; seed 42, per-field: hash_i = xxh64(field_i,
 seed=hash_{i-1}), null fields skipped):
- int-like 32-bit (int, short, byte, boolean, date) → 4-byte path of
  the unsigned 32-bit pattern
- long-like (long, timestamp micros) → 8-byte path
- float → 4-byte of floatToIntBits; double → 8-byte of doubleToLongBits
- string → full XXH64 over UTF-8 bytes

Fixed-width columns are vectorized with numpy uint64 (wrapping
arithmetic); strings take a per-row pure-Python path.
tests/test_streaming.py::test_xxhash64_parity proves byte-exact parity
against F.xxhash64 across types, including negatives and nulls.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import types as T

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_MASK = 0xFFFFFFFFFFFFFFFF
SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _hash_long_vec(v: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """8-byte path: v and seed are uint64 arrays."""
    h = seed + _P5 + np.uint64(8)
    k1 = _rotl(v * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def _hash_int_vec(v: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """4-byte path: v holds the unsigned 32-bit pattern in uint64."""
    h = seed + _P5 + np.uint64(4)
    h = h ^ ((v & np.uint64(0xFFFFFFFF)) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


# ---------------- scalar full XXH64 (strings) ----------------

def _rotl_s(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix_s(h: int) -> int:
    h ^= h >> 33
    h = (h * int(_P2)) & _MASK
    h ^= h >> 29
    h = (h * int(_P3)) & _MASK
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark hashUnsafeBytes)."""
    p1, p2, p3, p4, p5 = (int(_P1), int(_P2), int(_P3), int(_P4), int(_P5))
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & _MASK
        v2 = (seed + p2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - p1) & _MASK
        while i + 32 <= n:
            k = struct.unpack_from("<4Q", data, i)
            v1 = (_rotl_s((v1 + k[0] * p2) & _MASK, 31) * p1) & _MASK
            v2 = (_rotl_s((v2 + k[1] * p2) & _MASK, 31) * p1) & _MASK
            v3 = (_rotl_s((v3 + k[2] * p2) & _MASK, 31) * p1) & _MASK
            v4 = (_rotl_s((v4 + k[3] * p2) & _MASK, 31) * p1) & _MASK
            i += 32
        h = (_rotl_s(v1, 1) + _rotl_s(v2, 7)
             + _rotl_s(v3, 12) + _rotl_s(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl_s((v * p2) & _MASK, 31) * p1) & _MASK
            h = ((h * p1) + p4) & _MASK
    else:
        h = (seed + p5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k1 = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl_s((k1 * p2) & _MASK, 31) * p1) & _MASK
        h = ((_rotl_s(h, 27) * p1) + p4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * p1) & _MASK
        h = ((_rotl_s(h, 23) * p2) + p3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * p5) & _MASK
        h = (_rotl_s(h, 11) * p1) & _MASK
        i += 1
    return _fmix_s(h)


# ---------------- Spark column chaining ----------------

_INT32_TYPES = (T.IntegerType, T.ShortType, T.ByteType, T.DateType)
_INT64_TYPES = (T.LongType, T.TimestampType, T.TimestampNTZType)


def supported_bucket_type(dtype: T.DataType) -> bool:
    return isinstance(dtype, _INT32_TYPES + _INT64_TYPES
                      + (T.BooleanType, T.FloatType, T.DoubleType,
                         T.StringType))


def xxhash64_table(tbl, fields: list[T.StructField],
                   col_names: list[str]) -> np.ndarray:
    """Per-row Spark xxhash64 over `col_names` of a pyarrow Table.
    Returns SIGNED int64 hashes (what F.xxhash64 yields)."""
    n = tbl.num_rows
    h = np.full(n, SEED, dtype=np.uint64)
    by_name = {f.name: f.dataType for f in fields}
    for c in col_names:
        dtype = by_name[c]
        arr = tbl.column(c).combine_chunks()
        nulls = np.asarray(arr.is_null())
        if isinstance(dtype, T.StringType):
            hv = h.copy()
            py = arr.to_pylist()
            for i, s in enumerate(py):
                if s is not None:
                    hv[i] = np.uint64(xxh64_bytes(s.encode("utf-8"),
                                                  int(h[i])))
            h = hv
            continue
        if isinstance(dtype, T.BooleanType):
            vals = np.asarray(arr.cast("int32").fill_null(0)) \
                     .astype(np.int64)
        elif isinstance(dtype, T.FloatType):
            f32 = np.asarray(arr.fill_null(0.0), dtype=np.float32)
            f32 = np.where(f32 == 0.0, np.float32(0.0), f32)  # -0f → 0f
            vals = f32.view(np.int32).astype(np.int64)
        elif isinstance(dtype, T.DoubleType):
            f64 = np.asarray(arr.fill_null(0.0), dtype=np.float64)
            f64 = np.where(f64 == 0.0, 0.0, f64)              # -0d → 0d
            vals = f64.view(np.int64)
        elif isinstance(dtype, _INT32_TYPES):
            base = arr
            if str(arr.type).startswith("date"):
                base = arr.cast("int32")
            vals = np.asarray(base.cast("int32").fill_null(0)) \
                     .astype(np.int64)
        elif isinstance(dtype, _INT64_TYPES):
            import pyarrow as pa
            base = arr
            if pa.types.is_timestamp(arr.type):
                # Spark hashes the MICROSECOND count — normalize unit
                base = arr.cast(pa.timestamp("us", tz=arr.type.tz))
            vals = np.asarray(base.cast("int64").fill_null(0)) \
                     .astype(np.int64)
        else:
            raise ValueError(
                f"bucket key type {dtype} not supported by the DataSource "
                f"writer hash — use Table.append")
        u = vals.view(np.uint64) if vals.dtype == np.int64 \
            else vals.astype(np.uint64)
        if isinstance(dtype, _INT32_TYPES + (T.BooleanType, T.FloatType)):
            u32 = (vals & 0xFFFFFFFF).astype(np.uint64)
            new = _hash_int_vec(u32, h)
        else:
            new = _hash_long_vec(u, h)
        h = np.where(nulls, h, new)
    return h.view(np.int64)


# ---------------- Spark Murmur3_x86_32 (F.hash parity) ----------------
# New-table default bucket hash (r7): pmod(hash(keys), n) with Spark's
# OWN Murmur3 is exactly HashPartitioning.partitionIdExpression, which
# lets bucketed reads report HashPartitioning and join/agg against
# Spark-shuffled sides without an Exchange
# (ref: spark/sql/catalyst/expressions/hash.scala Murmur3Hash,
#  common/unsafe Murmur3_x86_32.java; seed 42, same null-skip chaining
#  as xxhash64 above).

_MC1 = np.uint32(0xCC9E2D51)
_MC2 = np.uint32(0x1B873593)
_M32 = 0xFFFFFFFF


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint32(r)
    return (x << r) | (x >> (np.uint32(32) - r))


def _mm_mixk1(k1: np.ndarray) -> np.ndarray:
    return _rotl32(k1 * _MC1, 15) * _MC2


def _mm_mixh1(h1: np.ndarray, k1: np.ndarray) -> np.ndarray:
    h1 = _rotl32(h1 ^ k1, 13)
    return h1 * np.uint32(5) + np.uint32(0xE6546B64)


def _mm_fmix(h1: np.ndarray, length: int) -> np.ndarray:
    h1 = h1 ^ np.uint32(length)
    h1 = h1 ^ (h1 >> np.uint32(16))
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> np.uint32(13))
    h1 = h1 * np.uint32(0xC2B2AE35)
    return h1 ^ (h1 >> np.uint32(16))


def _mm_hash_int_vec(v_u32: np.ndarray, seed: np.ndarray) -> np.ndarray:
    return _mm_fmix(_mm_mixh1(seed, _mm_mixk1(v_u32)), 4)


def _mm_hash_long_vec(v_i64: np.ndarray, seed: np.ndarray) -> np.ndarray:
    u = v_i64.view(np.uint64)
    low = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    high = (u >> np.uint64(32)).astype(np.uint32)
    h1 = _mm_mixh1(seed, _mm_mixk1(low))
    h1 = _mm_mixh1(h1, _mm_mixk1(high))
    return _mm_fmix(h1, 8)


def murmur3_bytes(data: bytes, seed: int) -> int:
    """Spark Murmur3_x86_32.hashUnsafeBytes: 4-byte LE words each get a
    full mix round; tail bytes are SIGN-EXTENDED and each gets a full
    round too (unlike standard murmur3 tails). Returns uint32."""
    h1 = seed & _M32
    n = len(data)
    na = n - n % 4

    def mixk1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & _M32
        k1 = ((k1 << 15) | (k1 >> 17)) & _M32
        return (k1 * 0x1B873593) & _M32

    def mixh1(h: int, k1: int) -> int:
        h = (h ^ k1) & _M32
        h = ((h << 13) | (h >> 19)) & _M32
        return (h * 5 + 0xE6546B64) & _M32

    for i in range(0, na, 4):
        h1 = mixh1(h1, mixk1(struct.unpack_from("<I", data, i)[0]))
    for i in range(na, n):
        b = data[i]
        if b >= 128:
            b -= 256                       # signed byte, sign-extended
        h1 = mixh1(h1, mixk1(b & _M32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    return h1 ^ (h1 >> 16)


def murmur3_table(tbl, fields: list[T.StructField],
                  col_names: list[str]) -> np.ndarray:
    """Per-row Spark murmur3 (F.hash) over `col_names` of a pyarrow
    Table. Returns SIGNED int32 hashes (what F.hash yields)."""
    n = tbl.num_rows
    h = np.full(n, np.uint32(42), dtype=np.uint32)
    by_name = {f.name: f.dataType for f in fields}
    for c in col_names:
        dtype = by_name[c]
        arr = tbl.column(c).combine_chunks()
        nulls = np.asarray(arr.is_null())
        if isinstance(dtype, T.StringType):
            hv = h.copy()
            for i, s in enumerate(arr.to_pylist()):
                if s is not None:
                    hv[i] = np.uint32(murmur3_bytes(s.encode("utf-8"),
                                                    int(h[i])))
            h = hv
            continue
        if isinstance(dtype, T.BooleanType):
            vals = np.asarray(arr.cast("int32").fill_null(0)).astype(np.int64)
        elif isinstance(dtype, T.FloatType):
            f32 = np.asarray(arr.fill_null(0.0), dtype=np.float32)
            f32 = np.where(f32 == 0.0, np.float32(0.0), f32)  # -0f → 0f
            vals = f32.view(np.int32).astype(np.int64)
        elif isinstance(dtype, T.DoubleType):
            f64 = np.asarray(arr.fill_null(0.0), dtype=np.float64)
            f64 = np.where(f64 == 0.0, 0.0, f64)              # -0d → 0d
            vals = f64.view(np.int64)
        elif isinstance(dtype, _INT32_TYPES):
            base = arr
            if str(arr.type).startswith("date"):
                base = arr.cast("int32")
            vals = np.asarray(base.cast("int32").fill_null(0)).astype(np.int64)
        elif isinstance(dtype, _INT64_TYPES):
            import pyarrow as pa
            base = arr
            if pa.types.is_timestamp(arr.type):
                base = arr.cast(pa.timestamp("us", tz=arr.type.tz))
            vals = np.asarray(base.cast("int64").fill_null(0)).astype(np.int64)
        else:
            raise ValueError(
                f"bucket key type {dtype} not supported by the task-side "
                f"murmur3 — use Table.append")
        if isinstance(dtype, _INT32_TYPES + (T.BooleanType, T.FloatType)):
            u32 = (vals & 0xFFFFFFFF).astype(np.uint32)
            new = _mm_hash_int_vec(u32, h)
        else:
            new = _mm_hash_long_vec(vals, h)
        h = np.where(nulls, h, new)
    return h.view(np.int32)


def bucket_of(tbl, fields: list[T.StructField], bucket_keys: list[str],
              num_buckets: int,
              hash_function: str = "xxhash64") -> np.ndarray:
    """pmod(<hash>(bucket_keys), n) per row — writer.py bucket_expr
    evaluated task-side. hash_function matches the table's
    bucket.hash-function option (murmur3 = Spark HashPartitioning
    parity; xxhash64 = pre-r7 tables)."""
    with np.errstate(over="ignore"):
        if hash_function == "murmur3":
            h = murmur3_table(tbl, fields, bucket_keys).astype(np.int64)
        else:
            h = xxhash64_table(tbl, fields, bucket_keys)
    return (h % num_buckets + num_buckets) % num_buckets
