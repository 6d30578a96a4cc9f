"""Multimodal plumbing tests: schema, Arrow batch shape, decode/
feature/resize/frame-sample stages on the FakeCodec fixture format,
and the explicit NotImplementedError stub for real decode."""

from __future__ import annotations

import numpy as np
import pytest

from web_crawler_spark.fixtures.media import generate_media
from web_crawler_spark.operators.multimodal import (
    FakeCodec,
    RealCodec,
    decode_media,
    extract_features,
    media_refs_from_documents,
    resize_plan,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(generate_media(n=30)).cache()


def test_decode_metadata(media_df):
    out = decode_media(media_df).toPandas().set_index("media_ref")
    assert len(out) == 31
    ok = out[out["ok"] == "ok"]
    assert len(ok) == 30
    img = ok[ok["kind"] == "image"]
    assert (img["width"] > 0).all() and (img["height"] > 0).all()
    vid = ok[ok["kind"] == "video"]
    assert (vid["n_frames"] > 0).all() and (vid["duration_ms"] > 0).all()
    bad = out[out["ok"] != "ok"]
    assert list(bad.index) == ["https://host0.example.test/media/corrupt.bin"]


def test_decode_deterministic(media_df):
    a = decode_media(media_df).toPandas().sort_values("media_ref")
    b = decode_media(media_df).toPandas().sort_values("media_ref")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_features_unit_norm(media_df):
    out = extract_features(media_df, bins=64).toPandas()
    assert len(out) == 31
    for feats in out["features"]:
        assert len(feats) == 64
        n = np.linalg.norm(feats)
        assert n == 0 or abs(n - 1.0) < 1e-3


def test_resize_plan(media_df):
    dec = decode_media(media_df)
    out = resize_plan(dec, max_dim=100).filter("kind = 'image' AND ok = 'ok'")
    pdf = out.toPandas()
    assert (pdf["target_width"] <= 100).all()
    assert (pdf["target_height"] <= 100).all()
    # aspect preserved within rounding
    big = pdf[pdf[["width", "height"]].max(axis=1) > 100]
    assert len(big) > 0
    assert (big[["target_width", "target_height"]].max(axis=1) == 100).all()


def test_frame_sampling(media_df):
    dec = decode_media(media_df)
    frames = sample_frames(dec, every_ms=500).toPandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] >= 0).all()
    assert (frames["frame_idx"] < frames["n_frames"]).all()
    g = frames.groupby("media_ref")["frame_ts_ms"]
    assert (g.min() == 0).all()
    assert (frames.groupby("media_ref").size()
            == (frames.groupby("media_ref")["duration_ms"].first() - 1) // 500 + 1
            ).all()


def test_real_codec_pixel_decode_is_gated():
    """Non-image payloads still need PIL/av → explicit stub."""
    with pytest.raises(NotImplementedError):
        RealCodec.decode(b"RIFF....WAVEfmt not an image")


def test_header_codec_real_images():
    """HeaderCodec decodes GENUINE stdlib-built PNG/GIF/JPEG bytes —
    the real (library-free) metadata path."""
    from web_crawler_spark.fixtures.media import generate_real_images
    from web_crawler_spark.operators.multimodal import HeaderCodec

    imgs = generate_real_images(n=12)
    for r in imgs.itertuples(index=False):
        meta = HeaderCodec.decode(r.payload)
        assert meta["ok"] == "ok", (r.media_ref, meta)
        assert meta["width"] == r.true_width
        assert meta["height"] == r.true_height
    # RealCodec delegates to the header path for images
    meta = RealCodec.decode(imgs.iloc[0]["payload"])
    assert meta["ok"] == "ok"


def test_header_codec_via_spark_pipeline(spark):
    from web_crawler_spark.fixtures.media import generate_real_images
    from web_crawler_spark.operators.multimodal import HeaderCodec

    df = spark.createDataFrame(
        generate_real_images(n=12).drop(columns=["true_width", "true_height"])
    )
    out = decode_media(df, codec=HeaderCodec).toPandas()
    assert (out["ok"] == "ok").all()
    assert (out["width"] > 0).all() and (out["height"] > 0).all()


def test_media_refs_from_documents(spark):
    from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
    from web_crawler_spark.functions.html import extract_spans_udf
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        generate_pages(WebGraphConfig(hosts=1, pages_per_host=4))
    )
    docs = pages.select(
        F.col("url").alias("doc_id"),
        extract_spans_udf(F.col("html"), F.col("url")).alias("spans"),
    )
    refs = media_refs_from_documents(docs).toPandas()
    assert len(refs) > 0
    assert refs["media_ref"].str.contains("/img/").any()


def test_fake_codec_roundtrip():
    p = FakeCodec.encode("video", 0, 0, 4000, 25, seed=1)
    m = FakeCodec.decode(p)
    assert m == {"width": 0, "height": 0, "duration_ms": 4000,
                 "n_frames": 25, "ok": "ok"}
