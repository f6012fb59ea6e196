"""Watermark propagation: commit-time watermark from footer stats,
watermark-based time travel."""

from pyspark.sql import types as T

from paimon_spark import Table

S = T.StructType([T.StructField("k", T.LongType()),
                  T.StructField("event_ms", T.LongType())])


def test_watermark_committed_and_monotonic(spark, wh):
    t = Table.create(f"{wh}/w", S,
                     options={"watermark.field": "event_ms",
                              "watermark.delay-ms": "100"}, spark=spark)
    t.append(spark.createDataFrame([(1, 1000), (2, 2000)], S))
    s1 = t.paths.latest_snapshot()
    assert s1.watermark == 2000 - 100
    t.append(spark.createDataFrame([(3, 5000)], S))
    s2 = t.paths.latest_snapshot()
    assert s2.watermark == 4900
    # late data does not move the watermark backwards
    t.append(spark.createDataFrame([(4, 1500)], S))
    assert t.paths.latest_snapshot().watermark == 4900


def test_watermark_time_travel(spark, wh):
    t = Table.create(f"{wh}/wt", S,
                     options={"watermark.field": "event_ms"}, spark=spark)
    t.append(spark.createDataFrame([(1, 1000)], S))
    t.append(spark.createDataFrame([(2, 2000)], S))
    t.append(spark.createDataFrame([(3, 3000)], S))
    # earliest snapshot whose watermark >= 1500 is snapshot 2
    got = sorted(r["k"] for r in t.read(watermark=1500).collect())
    assert got == [1, 2]
    assert t.read(watermark=99999).count() == 0  # no snapshot that far yet


def test_bounded_watermark_stream(spark, wh):
    """scan.bounded.watermark (ref: CoreOptions.java:1251 +
    BoundedChecker.watermark): the stream ends BEFORE the first
    snapshot whose watermark strictly passes the bound; later batches
    return None forever."""
    from paimon_spark.streaming.source import StreamScanner
    t = Table.create(f"{wh}/wb", S,
                     options={"watermark.field": "event_ms"}, spark=spark)
    t.append(spark.createDataFrame([(1, 1000)], S))   # wm 1000
    t.append(spark.createDataFrame([(2, 2000)], S))   # wm 2000
    t.append(spark.createDataFrame([(3, 3000)], S))   # wm 3000 (> bound)
    sc = StreamScanner(t, mode="from-snapshot", from_snapshot=1,
                       bounded_watermark=2000)
    b = sc.next_batch()
    got = sorted(r.k for r in b.collect())
    assert got == [1, 2], got                   # snapshot 3 not consumed
    assert sc.next_batch() is None
    t.append(spark.createDataFrame([(4, 1500)], S))
    assert sc.next_batch() is None              # bounded: ended for good
    # bound on the very first pending snapshot → empty stream
    sc2 = StreamScanner(t, mode="from-snapshot", from_snapshot=3,
                        bounded_watermark=2000)
    assert sc2.next_batch() is None
