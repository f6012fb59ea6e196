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
