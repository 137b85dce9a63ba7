"""Multimodal column plumbing: pack, fake-decode, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    pack_media,
)
from tinyerp_etl_spark.sources.catalog import load_table


@pytest.fixture
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return pack_media(docs, "doc_id", "text", "text/plain")


def test_pack_media_schema_and_metadata(spark, media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["content"])
    assert len(row["meta"]["checksum"]) == 32  # md5 hex
    assert isinstance(row["content"], (bytes, bytearray))


def test_fake_decode_deterministic_and_shaped(spark, media):
    out1 = {r["media_id"]: r for r in decode_media(media, mode="fake").collect()}
    out2 = {r["media_id"]: r for r in decode_media(media, mode="fake").collect()}
    assert out1.keys() == out2.keys()
    for mid, r in out1.items():
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert r["n_channels"] in (1, 2, 3)
        assert len(r["feature"]) == 8
        # determinism across runs (same bytes → same pseudo-decode)
        assert r == out2[mid]


def test_real_decode_is_explicitly_stubbed(spark, media):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(media, mode="real")


def test_frame_sample_plan_counts(spark, media):
    plan = frame_sample_plan(media, every_nth=10)
    joined = (
        plan.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("frame_index").alias("max_idx"))
        .join(
            media.select("media_id", (F.col("meta.n_bytes") / 1024).cast("int").alias("kb")),
            "media_id",
        )
    )
    for r in joined.collect():
        expected = (r["kb"] + 1 + 9) // 10  # ceil((kb+1)/10)
        assert r["n_sampled"] == expected
        assert r["max_idx"] % 10 == 0


def test_resize_media_dims_and_payload(spark, media):
    from tinyerp_etl_spark.operators.multimodal import resize_media

    decoded = decode_media(media)
    staged = decoded.join(media.select("media_id", "content"), "media_id")
    out = resize_media(staged, max_side=16).collect()
    assert len(out) == staged.count()
    for r in out:
        # aspect-preserving fit: bounded, never upscaled, ratio kept
        assert 1 <= r["out_width"] <= max(16, 1)
        assert 1 <= r["out_height"] <= 16
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        if max(r["width"], r["height"]) > 16:
            assert max(r["out_width"], r["out_height"]) == 16
        assert len(r["content"]) >= 1
    # deterministic across runs
    again = resize_media(staged, max_side=16).collect()
    assert sorted((r["media_id"], bytes(r["content"])) for r in out) == sorted(
        (r["media_id"], bytes(r["content"])) for r in again
    )


def test_resize_media_real_mode_stubbed(spark, media):
    from tinyerp_etl_spark.operators.multimodal import resize_media

    decoded = decode_media(media)
    staged = decoded.join(media.select("media_id", "content"), "media_id")
    with pytest.raises(NotImplementedError):
        resize_media(staged, mode="real")
