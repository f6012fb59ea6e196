"""Multimodal plumbing: binary payload columns through mapInPandas."""

import pytest

from paimon_spark.functions import multimodal as MM


@pytest.fixture()
def assets(spark):
    rows = [
        (1, "image", b"\x89PNGfake", "image/png", 64, 64, None),
        (2, "audio", b"RIFFfake", "audio/wav", None, None, 2500),
        (3, "video", b"\x00mp4fake", "video/mp4", 320, 240, 3000),
        (4, "image", None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, MM.ASSET_SCHEMA)


def test_extract_features_fake_decoder(assets):
    out = {r["asset_id"]: r for r in MM.extract_features(assets, "fake").collect()}
    assert len(out) == 4
    assert out[1]["n_bytes"] == 8 and len(out[1]["content_sha"]) == 64
    assert len(out[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in out[1]["feature"])
    # deterministic across runs
    again = {r["asset_id"]: r["feature"]
             for r in MM.extract_features(assets, "fake").collect()}
    assert again[1] == out[1]["feature"]
    # null payload → nulls, no crash
    assert out[4]["n_bytes"] is None and out[4]["feature"] is None


def test_real_decoder_is_stubbed(assets):
    with pytest.raises(Exception):
        MM.extract_features(assets, "real").collect()


def test_frame_sample_plan_metadata_only(assets):
    plan = MM.frame_sample_plan(assets, fps=1.0).collect()
    # one video, 3000 ms, 1 fps → ts 0,1000,2000
    assert [(r["asset_id"], r["frame_ts_ms"]) for r in plan] == \
        [(3, 0), (3, 1000), (3, 2000)]


def test_object_table(spark, tmp_path):
    from paimon_spark.functions.multimodal import object_table
    d = tmp_path / "objs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"hello")
    (d / "b.bin").write_bytes(b"world!!")
    (d / "skip.txt").write_bytes(b"nope")
    df = object_table(spark, str(d), pattern="*.bin")
    rows = {(r.path.rsplit("/", 1)[-1], r.length, bytes(r.content))
            for r in df.collect()}
    assert rows == {("a.bin", 5, b"hello"), ("b.bin", 7, b"world!!")}


def test_bmp_roundtrip_exact():
    """encode_bmp → decode_image is byte-exact, including stride padding
    (w=3 → 9-byte rows padded to 12) and bottom-up row order."""
    import numpy as np
    rng = np.random.default_rng(7)
    for h, w in [(5, 3), (4, 4), (1, 7), (8, 2)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(MM.decode_image(MM.encode_bmp(img)), img)


def test_ppm_decode_with_comments():
    import numpy as np
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(MM.decode_image(payload), img)


def test_wav_roundtrip():
    import numpy as np
    t = np.arange(800) / 8000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, rate = MM.decode_audio(MM.encode_wav(mono, 8000))
    assert rate == 8000 and x.shape == (800, 1)
    assert np.allclose(x[:, 0], mono, atol=1 / 32000)
    stereo = np.stack([mono, -mono], axis=1)
    x2, _ = MM.decode_audio(MM.encode_wav(stereo, 8000))
    assert x2.shape == (800, 2) and np.allclose(x2[:, 1], -mono,
                                                atol=1 / 32000)


def test_resize_nearest():
    import numpy as np
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 255                       # top-left quadrant white
    small = MM.resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 255 and small[1, 1, 0] == 0
    big = MM.resize_nearest(img, 8, 8)
    assert big.shape == (8, 8, 3) and big[0, 0, 0] == 255


def test_extract_features_real_decoder(spark):
    """The REAL decoder through the Spark mapInPandas plumbing: BMP and
    WAV payloads decode (pure numpy), features are deterministic, and a
    codec that genuinely needs external libs still fails loudly."""
    import numpy as np
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    t = np.arange(1600) / 16000.0
    wav = MM.encode_wav(0.25 * np.sin(2 * np.pi * 220 * t), 16000)
    rows = [
        (1, "image", bytearray(MM.encode_bmp(img)), "image/bmp", 12, 16, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, 100),
        (3, "image", None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in
           MM.extract_features(df, "real").collect()}
    fi = out[1]["feature"]
    assert fi[0] == 12.0 and fi[1] == 16.0          # width, height
    small = MM.resize_nearest(img, 32, 32).astype(np.float64)
    assert abs(fi[2] - small[:, :, 0].mean()) < 1e-3
    fa = out[2]["feature"]
    assert abs(fa[0] - 0.1) < 1e-6                   # 1600/16000 s
    assert abs(fa[1] - 16.0) < 1e-9                  # kHz
    assert abs(fa[2] - 0.25 / np.sqrt(2)) < 0.01     # sine RMS
    assert out[3]["feature"] is None
    # JPEG still needs PIL: loud NotImplementedError, not silent junk
    bad = spark.createDataFrame(
        [(9, "image", bytearray(b"\xff\xd8\xffJFIFfake"), "image/jpeg",
          None, None, None)], MM.ASSET_SCHEMA)
    with pytest.raises(Exception, match="codec not recognized|PIL"):
        MM.extract_features(bad, "real").collect()


def test_bmp32_and_wav8():
    """32-bit BMP (BGRA) and 8-bit PCM WAV decode paths."""
    import numpy as np
    # hand-build a 2x2 32-bit top-down BMP (negative height)
    px = np.array([[[10, 20, 30, 255], [40, 50, 60, 255]],
                   [[70, 80, 90, 255], [100, 110, 120, 255]]],
                  dtype=np.uint8)            # BGRA rows, no padding @ w=2
    body = px.tobytes()
    hdr = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\0\0\0\0"
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (2).to_bytes(4, "little")
           + (-2).to_bytes(4, "little", signed=True)     # top-down
           + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + b"\0" * 24)
    img = MM.decode_image(hdr + body)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [30, 20, 10]   # BGR -> RGB, row 0 first
    assert list(img[1, 1]) == [120, 110, 100]
    # 8-bit unsigned PCM: value 128 = silence = 0.0
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    data = bytes([128, 255, 0, 128])
    wav = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + fmt
           + b"data" + len(data).to_bytes(4, "little") + data)
    x, rate = MM.decode_audio(wav)
    assert rate == 8000 and x.shape == (4, 1)
    assert abs(x[0, 0]) < 1e-9 and x[1, 0] > 0.99 and x[2, 0] <= -0.99


def test_bmp_bitfields_masks(spark=None):
    """r9: BI_BITFIELDS BMPs decode only with the standard BGRA masks;
    swapped masks must raise, never silently swap channels."""
    import numpy as np

    import pytest
    px = np.array([[[10, 20, 30, 255], [40, 50, 60, 255]]], dtype=np.uint8)
    body = px.tobytes()

    def bmp(r_m, g_m, b_m, a_m=0xFF000000):
        return (b"BM" + (70 + len(body)).to_bytes(4, "little") + b"\0\0\0\0"
                + (70).to_bytes(4, "little") + (40).to_bytes(4, "little")
                + (2).to_bytes(4, "little")
                + (-1).to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
                + (3).to_bytes(4, "little")            # BI_BITFIELDS
                + b"\0" * 20
                + r_m.to_bytes(4, "little") + g_m.to_bytes(4, "little")
                + b_m.to_bytes(4, "little") + a_m.to_bytes(4, "little"))

    img = MM.decode_image(bmp(0x00FF0000, 0x0000FF00, 0x000000FF) + body)
    assert list(img[0, 0]) == [30, 20, 10]             # standard masks OK
    with pytest.raises(NotImplementedError, match="mask"):
        MM.decode_image(bmp(0x000000FF, 0x0000FF00, 0x00FF0000) + body)


def _png_filter_row(f, row, prev, bpp):
    """Spec-reference scanline FILTER (encoder side) — independent
    arithmetic from the decoder's unfilter, so the round-trip test
    cross-checks both directions."""
    import numpy as np
    r = row.astype(np.int32)
    out = np.zeros_like(r)
    for i in range(len(r)):
        left = r[i - bpp] if i >= bpp else 0
        up = int(prev[i])
        ul = int(prev[i - bpp]) if i >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = left
        elif f == 2:
            pred = up
        elif f == 3:
            pred = (left + up) >> 1
        else:
            p0 = left + up - ul
            pa, pb, pc = abs(p0 - left), abs(p0 - up), abs(p0 - ul)
            pred = left if (pa <= pb and pa <= pc) else \
                (up if pb <= pc else ul)
        out[i] = (int(r[i]) - pred) & 0xFF
    return out.astype(np.uint8)


def _encode_png(img, ctype, filters, palette=None):
    """Minimal spec-reference PNG encoder for the tests: 8-bit,
    non-interlaced, one chosen filter byte per row."""
    import struct
    import zlib

    import numpy as np
    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    flat = img.reshape(h, w * ch).astype(np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        raw += _png_filter_row(f, flat[y], prev, ch).tobytes()
        prev = flat[y]

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_png_decode_all_filters_and_types():
    """PNG decode (r9): every scanline filter (None/Sub/Up/Average/
    Paeth) on gradient-ish content where the filters actually change
    the bytes; RGB, RGBA (alpha dropped), gray, gray+alpha and palette
    color types all land on the same (H, W, 3) uint8."""
    import numpy as np
    rng = np.random.RandomState(7)
    h, w = 13, 17
    base = (np.arange(h)[:, None, None] * 11
            + np.arange(w)[None, :, None] * 7
            + np.arange(3)[None, None, :] * 29
            + rng.randint(0, 9, (h, w, 3))).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = MM.decode_image(_encode_png(base, 2, filters))
        assert (got == base).all(), f"RGB filters={filters}"
    # RGBA drops alpha
    rgba = np.dstack([base, rng.randint(0, 255, (h, w, 1))]).astype(np.uint8)
    assert (MM.decode_image(_encode_png(rgba, 6, [4])) == base).all()
    # gray and gray+alpha replicate to 3 channels
    g = base[:, :, 0]
    got = MM.decode_image(_encode_png(g[:, :, None], 0, [3]))
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()
    ga = np.dstack([g, rng.randint(0, 255, (h, w))]).astype(np.uint8)
    got = MM.decode_image(_encode_png(ga, 4, [1, 2]))
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()
    # palette
    pal = rng.randint(0, 255, (16, 3)).astype(np.uint8)
    pidx = rng.randint(0, 16, (h, w)).astype(np.uint8)
    got = MM.decode_image(_encode_png(pidx[:, :, None], 3, [0, 4],
                                      palette=pal))
    assert (got == pal[pidx]).all()
    # features run on PNG payloads through the real decoder
    feats = MM._real_decode(_encode_png(base, 2, [4]), "image")
    assert feats[0] == w and feats[1] == h


def test_png_refusals():
    """16-bit and interlaced PNGs refuse loudly; truncated refuses."""
    import struct
    import zlib

    import numpy as np
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _encode_png(img, 2, [0])

    def patch_ihdr(depth=None, interlace=None):
        b = bytearray(good)
        if depth is not None:
            b[8 + 8 + 8] = depth         # sig + len/type + w/h
        if interlace is not None:
            b[8 + 8 + 12] = interlace
        # fix the IHDR crc so only the guard under test fires
        data = bytes(b[8 + 8:8 + 8 + 13])
        b[8 + 8 + 13:8 + 8 + 17] = struct.pack(
            ">I", zlib.crc32(b"IHDR" + data))
        return bytes(b)

    with pytest.raises(NotImplementedError, match="bit depth 16"):
        MM.decode_image(patch_ihdr(depth=16))
    with pytest.raises(NotImplementedError, match="interlace 1"):
        MM.decode_image(patch_ihdr(interlace=1))


def test_audio_frame_features_sine_physics(spark):
    """Frame-level DSP must recover physical ground truth: a pure
    440 Hz tone's spectral centroid sits at ~440 Hz, its rolloff at or
    above the centroid, its RMS at amp/√2; a silent asset has zero
    energy everywhere; a higher-pitch tone has a higher centroid and
    zcr."""
    import math

    rate, dur = 16000, 0.5
    n = int(rate * dur)

    def tone(freq, amp=0.5):
        return MM.encode_wav(
            [amp * math.sin(2 * math.pi * freq * i / rate)
             for i in range(n)], rate)

    rows = [(1, tone(440.0)), (2, tone(2200.0)), (3, MM.encode_wav([0.0] * n, rate))]
    assets = spark.createDataFrame(
        rows, "asset_id long, payload binary")
    out = MM.audio_frame_features(assets, frame=512).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert len(by_asset[1]) == (n - 512) // 512 + 1
    import statistics
    c440 = statistics.mean(r.centroid_hz for r in by_asset[1])
    c2200 = statistics.mean(r.centroid_hz for r in by_asset[2])
    assert abs(c440 - 440.0) < 40.0, c440
    assert abs(c2200 - 2200.0) < 120.0, c2200
    assert all(r.rolloff_hz >= r.centroid_hz * 0.9 for r in by_asset[1])
    rms = statistics.mean(r.rms for r in by_asset[1])
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01, rms
    assert all(r.rms == 0.0 and r.centroid_hz == 0.0 for r in by_asset[3])
    zcr440 = statistics.mean(r.zcr for r in by_asset[1])
    zcr2200 = statistics.mean(r.zcr for r in by_asset[2])
    assert zcr2200 > zcr440 > 0.0


def test_image_dhash_near_dup_pairs(spark):
    """dHash banding must pair an image with its noisy/re-scaled copy
    and NOT with a different image; hamming verify is exact (bit_count
    over XOR); pigeonhole keeps banding lossless for d < bands."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    # structured gradient so dhash bits are stable under mild noise
    gx = np.linspace(0, 200, 32, dtype=np.float64)
    base = np.clip(base * 0.2 + gx[None, :, None], 0, 255).astype(np.uint8)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-6, 7, size=base.shape), 0,
                    255).astype(np.uint8)
    scaled = MM.resize_nearest(base, 64, 64)
    other = np.clip(255 - base.astype(np.int16), 0, 255).astype(np.uint8)
    rows = [(1, MM.encode_bmp(base)), (2, MM.encode_bmp(noisy)),
            (3, MM.encode_bmp(scaled)), (9, MM.encode_bmp(other)),
            (10, b"not an image at all")]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in MM.image_near_dup_pairs(assets,
                                              max_hamming=3).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs, pairs
    assert all(9 not in p and 10 not in p for p in pairs), pairs
    # exact-hamming ground truth against driver-side dhash
    h1 = MM.dhash64(base)
    h2 = MM.dhash64(noisy)
    assert pairs[(1, 2)] == bin(h1 ^ h2).count("1")
    # guard no-op on all-distinct dHashes (drop the rescale, whose
    # dHash EQUALS base's): guarded == unguarded exactly
    distinct_assets = assets.filter("asset_id != 3")
    g = {(r.id_a, r.id_b): r.hamming
         for r in MM.image_near_dup_pairs(distinct_assets,
                                          max_hamming=3).collect()}
    raw = {(r.id_a, r.id_b): r.hamming
           for r in MM.image_near_dup_pairs(
               distinct_assets, max_hamming=3,
               dedupe_exact_first=False).collect()}
    assert g == raw and (1, 2) in g
    # on the FULL corpus the guard may rewire equal-hash pairs into a
    # chain, but connected components must be identical
    from paimon_spark.functions.dedup import connected_components
    cc_g = {(r.doc_id, r.cluster_id) for r in connected_components(
        MM.image_near_dup_pairs(assets, max_hamming=3)).collect()}
    cc_raw = {(r.doc_id, r.cluster_id) for r in connected_components(
        MM.image_near_dup_pairs(assets, max_hamming=3,
                                dedupe_exact_first=False)).collect()}
    assert cc_g == cc_raw


def test_image_near_dup_hot_band_guard(spark):
    """ADVICE r10: a blank-image-heavy corpus (all payloads share dHash
    0 — blank thumbnails / tracking pixels at crawl scale) must emit
    the O(m) chain, not the m(m-1)/2 clique: 5k identical images →
    4999 (rep, member, hamming=0) pairs, NOT 12.5M candidate rows.
    Components are unchanged: an outside near-dup still pairs with the
    group rep."""
    import numpy as np

    blank = MM.encode_bmp(np.zeros((16, 16, 3), dtype=np.uint8))
    # near-blank outside image: flip a faint gradient so its dhash is
    # within a couple bits of the blank hash but not equal
    tweak = np.zeros((16, 16, 3), dtype=np.uint8)
    tweak[:, -1, :] = 3
    rows = [(i, blank) for i in range(5_000)]
    rows.append((9_001, MM.encode_bmp(tweak)))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = MM.image_near_dup_pairs(assets, max_hamming=3)
    got = pairs.collect()
    chain = [(r.id_a, r.id_b) for r in got if r.hamming == 0
             and r.id_b < 9_001]
    assert len(chain) == 4_999 and all(a == 0 for a, _ in chain)
    # the near-blank outsider pairs with the representative only
    outside = [(r.id_a, r.id_b, r.hamming) for r in got if r.id_b == 9_001]
    h_blank = MM.dhash64(np.zeros((16, 16, 3), dtype=np.uint8))
    h_tweak = MM.dhash64(tweak)
    d = bin(h_blank ^ h_tweak).count("1")
    if d <= 3:
        assert outside == [(0, 9_001, d)], (outside, d)
    assert len(got) == len(chain) + len(outside)


def test_image_near_dup_max_band_size_cap(spark):
    """max_band_size caps near-identical (unequal-hash) band groups:
    output is a subset of the unguarded pairs and never exceeds the
    per-band quadratic bound."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
    gx = np.linspace(0, 180, 24, dtype=np.float64)
    base = np.clip(base * 0.25 + gx[None, :, None], 0, 255).astype(np.uint8)
    rows = []
    for i in range(12):
        v = np.clip(base.astype(np.int16)
                    + rng.integers(-4, 5, size=base.shape), 0,
                    255).astype(np.uint8)
        rows.append((i, MM.encode_bmp(v)))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    full = {(r.id_a, r.id_b)
            for r in MM.image_near_dup_pairs(assets, max_hamming=6,
                                             bands=8).collect()}
    capped = {(r.id_a, r.id_b)
              for r in MM.image_near_dup_pairs(assets, max_hamming=6,
                                               bands=8,
                                               max_band_size=3).collect()}
    assert capped <= full
    # capped members are the lowest ids per band: pair (0, 1) survives
    if (0, 1) in full:
        assert (0, 1) in capped
