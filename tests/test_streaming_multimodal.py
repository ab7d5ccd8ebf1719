"""Structured Streaming twins + multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import multimodal as MM
from translator_tm_provider_pipelines_spark.streaming import ingest


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "click", 1.0),
            (2, "2024-01-01 10:20:00", 7, "click", 2.0),
            (3, "2024-01-01 11:05:00", 7, "view", 3.0),
            (4, "2024-01-01 10:10:00", 8, "click", 4.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "events")
    df.coalesce(1).write.parquet(path)
    return path, df.schema


def _run_stream(spark, result_df, name):
    q = (
        result_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return spark.sql(f"select * from {name}")


def test_windowed_counts_stream(spark, event_stream_dir):
    path, schema = event_stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    out = ingest.windowed_event_counts_stream(stream, window="1 hour")
    got = {
        (r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
        for r in _run_stream(spark, out, "win_counts").collect()
    }
    assert got[(10, "click")] == (3, 7.0)
    assert got[(11, "view")] == (1, 3.0)


def test_sessionized_stream(spark, event_stream_dir):
    path, schema = event_stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    out = ingest.sessionized_events_stream(stream, gap="30 minutes")
    rows = _run_stream(spark, out, "sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    # user 7: events at 10:00/10:20 merge (gap 20m), 11:05 is a new session
    assert sorted(by_user[7]) == [1, 2]
    assert by_user[8] == [1]


def test_incremental_pipeline_foreachbatch(spark, event_stream_dir, tmp_path):
    path, schema = event_stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    seen = []

    def stage(df):
        return df.where(F.col("event_type") == "click")

    def sink(df, batch_id):
        seen.append((batch_id, df.count()))

    q = ingest.incremental_pipeline(
        stream, stage, sink, checkpoint_dir=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(60)
    assert sum(n for _, n in seen) == 3


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture()
def media_df(spark):
    rows = [
        ("img1", "image", "image/png", b"\x89PNGfake", None, None, None, {}),
        ("vid1", "video", "video/mp4", b"\x00mp4fake", None, None, 3500, {}),
    ]
    return spark.createDataFrame(rows, schema=schemas.MEDIA)


def test_fake_decode_deterministic(spark, media_df):
    out1 = {r.media_id: r for r in MM.extract_media_features(media_df).collect()}
    out2 = {r.media_id: r for r in MM.extract_media_features(media_df).collect()}
    digest = hashlib.sha256(b"\x89PNGfake").digest()
    assert out1["img1"].width == 16 + digest[0]
    assert out1["img1"].features == pytest.approx([b / 255.0 for b in digest[:16]])
    assert out1["img1"].features == out2["img1"].features
    assert out1["vid1"].n_bytes == 8


def test_strict_stub_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        MM.extract_media_features(media_df, strict=True).collect()


def test_real_decoder_pluggable(spark, media_df):
    def decoder(payload, mime):
        return {"width": 1, "height": 2, "features": [0.5] * MM.FEATURE_DIM}

    out = MM.extract_media_features(media_df, decoder=decoder).collect()[0]
    assert (out.width, out.height) == (1, 2)


def test_frame_sample_plan(spark, media_df):
    frames = MM.frame_sample_plan(media_df, every_ms=1000).collect()
    # duration 3500ms → frames at 0,1000,2000,3000 ce(+1 boundary)
    ts = sorted(r.frame_ts_ms for r in frames)
    assert ts == [0, 1000, 2000, 3000]


def test_media_from_binary_files(spark, tmp_path):
    (tmp_path / "x.png").write_bytes(b"fakepng")
    raw = spark.read.format("binaryFile").load(str(tmp_path))
    media = MM.media_from_binary_files(raw, "image")
    r = media.collect()[0]
    assert r.media_id == "x.png" and r.mime_type == "image/png"
    assert bytes(r.payload) == b"fakepng"
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in schemas.MEDIA
    ]


def test_streaming_first_seen(spark, tmp_path):
    from translator_tm_provider_pipelines_spark.streaming import stateful

    df = spark.createDataFrame(
        [("k1", "v1"), ("k1", "v1-dup"), ("k2", "v2")], "key string, value string"
    )
    path = str(tmp_path / "stream_in")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stateful.streaming_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.key: r for r in spark.sql("select * from first_seen").collect()}
    assert set(rows) == {"k1", "k2"}
    assert rows["k1"].n_dropped == 1
    assert rows["k2"].n_dropped == 0


def test_resize_media_contract(spark):
    """Resize plumbing: Arrow-batched mapInPandas, w*h payload contract,
    source dims preserved for scale arithmetic, strict stub boundary."""
    from translator_tm_provider_pipelines_spark.operators import multimodal

    media = spark.createDataFrame(
        [("m1", "image", "image/png", bytearray(b"\x01\x02\x03"))],
        "media_id string, modality string, mime_type string, payload binary",
    )
    out = multimodal.resize_media(media, 8, 4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (8, 4)
    assert len(r.payload) == 8 * 4
    assert r.src_width >= 16 and r.src_height >= 16
    # deterministic: same payload -> same resized bytes
    again = multimodal.resize_media(media, 8, 4).collect()[0]
    assert bytes(again.payload) == bytes(r.payload)
    # strict mode raises at the stub boundary
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|resiz"):
        multimodal.resize_media(media, 8, 4, strict=True).collect()


# ---------------------------------------------------------------------------
# real image decode: built-in NetPBM codec through the same plumbing
# ---------------------------------------------------------------------------


def _make_ppm(w, h):
    """Deterministic RGB gradient PPM (P6) with a header comment."""
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)),
         ((x + y) * 255 // max(w + h - 2, 1))], axis=2
    ).astype(np.uint8)
    return (f"P6\n# gradient {w}x{h}\n{w} {h}\n255\n".encode() + px.tobytes(), px)


def test_real_netpbm_decode_end_to_end(spark):
    """A REAL image decode (not the digest fake) through the Arrow-batched
    mapInPandas pipeline: exact dimensions and 4x4-grid luminance features
    matching numpy ground truth computed outside Spark."""
    import numpy as np

    payload, px = _make_ppm(20, 12)
    media = spark.createDataFrame(
        [("ppm1", "image", "image/x-portable-pixmap", payload, None, None, None, {})],
        schema=schemas.MEDIA,
    )
    row = MM.extract_media_features(media, decoder=MM.netpbm_decoder).first()
    assert (row.width, row.height, row.n_bytes) == (20, 12, len(payload))
    lum = px.mean(axis=2)
    expect = [
        float(c.mean() / 255)
        for r in np.array_split(lum, 4, axis=0)
        for c in np.array_split(r, 4, axis=1)
    ]
    assert row.features == pytest.approx(expect, abs=1e-6)


def test_real_netpbm_resize_roundtrip(spark):
    """Real resize through resize_media: output payload is a valid PPM at
    the target size whose pixels equal numpy nearest-neighbor sampling,
    and src dims survive for bbox scale arithmetic."""
    import numpy as np

    payload, px = _make_ppm(16, 8)
    media = spark.createDataFrame(
        [("ppm2", "image", "image/x-portable-pixmap", payload, None, None, None, {})],
        schema=schemas.MEDIA,
    )
    row = MM.resize_media(media, 4, 4, resizer=MM.netpbm_resizer).first()
    assert (row.width, row.height, row.src_width, row.src_height) == (4, 4, 16, 8)
    magic, w, h, maxval, out = MM._parse_netpbm(bytes(row.payload))
    assert (magic, w, h) == ("P6", 4, 4)
    yi = np.minimum((np.arange(4) * 8) // 4, 7)
    xi = np.minimum((np.arange(4) * 16) // 4, 15)
    assert np.array_equal(out, px[yi][:, xi])


def test_netpbm_decoder_rejects_non_netpbm():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MM.netpbm_decoder(b"\x89PNGfake", "image/png")
    with _pytest.raises(ValueError):
        MM.netpbm_decoder(b"", None)
    # P5 grayscale parses too
    gray = b"P5\n3 2\n255\n" + bytes(range(6))
    d = MM.netpbm_decoder(gray, "image/x-portable-graymap")
    assert (d["width"], d["height"]) == (3, 2)
    assert len(d["features"]) == MM.FEATURE_DIM
