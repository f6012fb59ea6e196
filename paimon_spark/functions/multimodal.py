"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the actual media decode is stubbed — the container has no
image/audio libraries — behind DECODERS: a deterministic fake for tests,
and a NotImplementedError-raising real hook.

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


def _real_decode(payload: bytes, kind: str) -> list[float]:
    raise NotImplementedError(
        "media decode requires PIL/torchaudio/decord — not available in "
        "this container; swap DECODERS['real'] in deployment")


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
