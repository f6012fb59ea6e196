"""Minimal pure-Python Avro object-container-file writer/reader.

Implements exactly the subset of the Apache Avro 1.x specification
(https://avro.apache.org/docs/current/specification/) that Iceberg
metadata files need: null/boolean/int/long/float/double/bytes/string
primitives, records, arrays, maps, and ["null", T] unions, with the
`null` codec. Written so the Iceberg-compatible metadata sink
(paimon_spark/iceberg.py; ref: paimon-core/.../iceberg/manifest/
IcebergManifestFile.java writes manifests as avro) does not depend on
the external spark-avro module, which a bare pyspark install lacks.

Binary encoding (spec "Binary Encoding"):
  int/long   zig-zag base-128 varint
  float      4 bytes IEEE-754 little-endian
  double     8 bytes IEEE-754 little-endian
  bytes/string  long(length) + data
  record     fields in declaration order, concatenated
  array/map  blocks: long(count) items… repeated, then long(0)
  union      long(branch index) + encoded value
Container file (spec "Object Container Files"):
  magic b"Obj\\x01", file-metadata map (avro.schema, avro.codec),
  16-byte sync marker, then data blocks of
  long(#records) long(#bytes) records sync.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (spec: any 16 bytes)


# ---------------- binary primitives ----------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc)


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# ---------------- schema-driven encode/decode ----------------

def _encode(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):                       # union
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                write_long(buf, i)
                _encode(buf, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(buf, f["type"], value.get(f["name"])
                        if isinstance(value, dict) else getattr(value, f["name"]))
            return
        if t == "array":
            items = list(value or [])
            if items:
                write_long(buf, len(items))
                for it in items:
                    _encode(buf, schema["items"], it)
            write_long(buf, 0)
            return
        if t == "map":
            entries = dict(value or {})
            if entries:
                write_long(buf, len(entries))
                for k, v in entries.items():
                    write_bytes(buf, str(k).encode())
                    _encode(buf, schema["values"], v)
            write_long(buf, 0)
            return
        t_name = t                                     # {"type": "int", ...}
        return _encode(buf, t_name, value)
    # primitive by name
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        write_long(buf, int(value))
    elif schema == "float":
        buf.write(struct.pack("<f", float(value)))
    elif schema == "double":
        buf.write(struct.pack("<d", float(value)))
    elif schema == "bytes":
        write_bytes(buf, bytes(value))
    elif schema == "string":
        write_bytes(buf, str(value).encode())
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


def _matches(branch: Any, value: Any) -> bool:
    if branch == "null" or (isinstance(branch, dict)
                            and branch.get("type") == "null"):
        return value is None
    return value is not None


def _decode(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):                       # union
        return _decode(buf, schema[read_long(buf)])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(buf, f["type"])
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:                              # block with byte size
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(_decode(buf, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    k = read_bytes(buf).decode()
                    out[k] = _decode(buf, schema["values"])
        return _decode(buf, t)
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return read_bytes(buf)
    if schema == "string":
        return read_bytes(buf).decode()
    raise ValueError(f"unsupported avro type: {schema!r}")


# ---------------- container files ----------------

def write_avro_file(path: str, schema: dict, records: list[Any],
                    block_size: int = 1000) -> None:
    """Write records as an Avro object container file (null codec)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta_schema = {"type": "map", "values": "bytes"}
    _encode(buf, meta_schema, {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    })
    buf.write(SYNC)
    for i in range(0, max(len(records), 1), block_size):
        block = records[i:i + block_size]
        if not block:
            break
        body = io.BytesIO()
        for r in block:
            _encode(body, schema, r)
        write_long(buf, len(block))
        write_bytes(buf, body.getvalue())
        buf.write(SYNC)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def read_avro_file(path: str) -> tuple[dict, list[Any]]:
    """Read an Avro container file → (schema, records as dicts)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro object container file")
    meta = _decode(buf, {"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", ""):
        raise ValueError(f"{path}: unsupported avro codec {codec}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf.read(16)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = read_long(buf)
        body = io.BytesIO(read_bytes(buf))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        for _ in range(n):
            records.append(_decode(body, schema))
    return schema, records
