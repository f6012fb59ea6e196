"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode support (r8): REAL pure-numpy decoders for the container-less
formats — BMP (24/32-bit uncompressed) and PPM P6 images, RIFF/WAVE PCM
(8/16-bit) audio — plus nearest-neighbor resize and deterministic
feature extraction over the decoded arrays. Compressed codecs
(JPEG/PNG/MP4/...) still raise NotImplementedError with a clear message:
they genuinely need external libraries (PIL/torchaudio/decord) absent
from this container; swap DECODERS['real'] in deployment to extend.

At 100 TB: binary payloads stay in parquet (never hit the driver);
mapInPandas streams Arrow batches through Python workers. Partition size
is controlled by `spark.sql.files.maxPartitionBytes` so a batch of
payloads fits executor memory; metadata-only transforms (resize plan,
frame sampling schedule) never touch the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_sha", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature: 8 floats derived from sha256 bytes."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


# ---------------------------------------------------------------------------
# pure-numpy codecs (no external media libraries)
# ---------------------------------------------------------------------------

def decode_image(payload: bytes):
    """(H, W, 3) uint8 array from an uncompressed BMP (24/32-bit,
    BITMAPINFOHEADER) or binary PPM (P6) payload. Pure numpy."""
    import numpy as np
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp not in (24, 32) or comp not in (0, 3):
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only uncompressed "
                "24/32-bit supported without external libraries")
        if comp == 3:
            # BI_BITFIELDS: channel masks live at absolute offset 54
            # (right after a 40-byte BITMAPINFOHEADER, or as the V2+/V4
            # header mask fields — same byte position either way). The
            # de-interleave below assumes the standard BGR(A) layout;
            # a BMP with swapped masks (e.g. RGBA order) would decode
            # with swapped channels, silently corrupting features —
            # accept only the standard masks, refuse the rest loudly.
            r_m = int.from_bytes(payload[54:58], "little")
            g_m = int.from_bytes(payload[58:62], "little")
            b_m = int.from_bytes(payload[62:66], "little")
            if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
                raise NotImplementedError(
                    f"BMP BI_BITFIELDS with non-standard channel masks "
                    f"(R={r_m:#010x} G={g_m:#010x} B={b_m:#010x}): only "
                    "the standard BGRA byte order is supported without "
                    "external libraries")
        flip = h > 0                       # positive height = bottom-up
        h = abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3         # rows pad to 4 bytes
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        px = rows[:, :w * nb].reshape(h, w, nb)
        img = px[:, :, 2::-1]              # BGR(A) → RGB
        return (img[::-1] if flip else img).copy()
    if payload[:2] == b"P6":
        # header: "P6" <ws> W <ws> H <ws> MAXVAL <single-ws> raster
        pos, vals = 2, []
        while len(vals) < 3:
            while payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            end = pos
            while not payload[end:end + 1].isspace():
                end += 1
            vals.append(int(payload[pos:end]))
            pos = end
        pos += 1
        w, h, maxv = vals
        if maxv > 255:
            raise NotImplementedError("16-bit PPM unsupported")
        return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                             offset=pos).reshape(h, w, 3).copy()
    raise NotImplementedError(
        "image codec not recognized (supported lib-free: BMP, PPM P6; "
        "JPEG/PNG need PIL — swap DECODERS['real'] in deployment)")


def encode_bmp(img) -> bytes:
    """(H, W, 3) uint8 → 24-bit bottom-up BMP bytes (test/export util)."""
    import numpy as np
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = raster.tobytes()
    header = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + b"\0" * 24)
    return header + body


def decode_audio(payload: bytes):
    """(samples[n, channels] float64 in [-1, 1], sample_rate) from a
    RIFF/WAVE PCM (8/16-bit) payload. Pure numpy."""
    import numpy as np
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio codec not recognized (supported lib-free: WAV PCM; "
            "mp3/flac need torchaudio — swap DECODERS['real'])")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAV format={audio_fmt} bits={bits}: only PCM 8/16-bit "
            "supported without external libraries")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8)
             .astype(np.float64) - 128.0) / 128.0
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), rate


def encode_wav(samples, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    import numpy as np
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    ch = s.shape[1]
    fmt = ((1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * ch * 2).to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)


def resize_nearest(img, width: int, height: int):
    """Nearest-neighbor resize of an (H, W, C) array via index maps —
    the standard thumbnail/normalize step, numpy-only."""
    import numpy as np
    h, w = img.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[yi][:, xi]


def _real_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic 8-dim features from REAL decoded media.
    image → [w, h, mean_r, mean_g, mean_b, std_lum, edge_energy, 0]
    audio → [duration_s, rate_khz, rms, zcr, peak, mean, channels, 1]
    Raises NotImplementedError for codecs that need external libraries
    (JPEG/PNG/MP4 …) — honest gap, see module docstring."""
    import numpy as np
    if payload is None:
        return None
    if kind == "audio":
        x, rate = decode_audio(payload)
        mono = x.mean(axis=1)
        zcr = (float(np.mean(np.abs(np.diff(np.sign(mono))) > 0))
               if len(mono) > 1 else 0.0)
        return [len(mono) / rate, rate / 1000.0,
                float(np.sqrt(np.mean(mono ** 2))), zcr,
                float(np.max(np.abs(mono), initial=0.0)),
                float(np.mean(mono)), float(x.shape[1]), 1.0]
    img = decode_image(payload)            # image; video keyframes ditto
    small = resize_nearest(img, 32, 32).astype(np.float64)
    lum = small.mean(axis=2)
    edge = float(np.abs(np.diff(lum, axis=0)).mean()
                 + np.abs(np.diff(lum, axis=1)).mean())
    return [float(img.shape[1]), float(img.shape[0]),
            float(small[:, :, 0].mean()), float(small[:, :, 1].mean()),
            float(small[:, :, 2].mean()), float(lum.std()), edge, 0.0]


DECODERS: dict[str, Callable[[bytes, str], list[float]]] = {
    "fake": _fake_decode,
    "real": _real_decode,
}


def extract_features(assets: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract binary payloads via Arrow-batched mapInPandas.
    One Python roundtrip per Arrow batch, not per row."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                "content_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None),
                "feature": [decode(b, k) for b, k in zip(pdf["payload"], pdf["kind"])],
            })
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, fps: float = 1.0) -> DataFrame:
    """Metadata-only video frame-sampling schedule: which timestamps to
    decode. Pure Catalyst (explode over a generated sequence) — payload
    bytes are never read."""
    from pyspark.sql import functions as F
    videos = assets.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    step_ms = int(1000 / fps)
    return videos.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(step_ms))
                  ).alias("frame_ts_ms"),
    )


def object_table(spark, directory: str, pattern: str | None = None):
    """Table over unstructured object files (≈ ObjectTable,
    ref: paimon-core/.../table/object/ObjectTable.java — a readonly view
    of a file directory with path/size/mtime metadata plus content).
    Spark's binaryFile source does exactly this: distributed listing,
    predicate pushdown on path/length/modificationTime, lazy content
    loading. Pair with `extract_features`/`frame_sample_plan` for the
    decode pipeline."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(directory)
