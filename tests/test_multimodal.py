"""Multimodal plumbing tests: schemas, Arrow batching, deterministic
stub features (real decode is stubbed — no codecs in this container)."""

from __future__ import annotations

import hashlib

from kinesis_alerts_consumer_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    resize_plan,
)


def media_df(spark):
    rows = [
        (1, "image/png", b"\x89PNG fake bytes 1", 800, 600, None),
        (2, "image/png", b"\x89PNG fake bytes 22", 300, 200, None),
        (3, "video/mp4", b"\x00mp4 fake", 1920, 1080, 3500),
        (4, "audio/wav", b"RIFF fake", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic_and_projects_payload(spark):
    out = extract_features(media_df(spark), target_partitions=2)
    assert "payload" not in out.columns
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    expect = hashlib.md5(b"\x89PNG fake bytes 1").hexdigest()
    assert rows[1].checksum == expect
    assert rows[1].n_bytes == len(b"\x89PNG fake bytes 1")
    assert 0.0 <= rows[1].feat_mean <= 1.0
    # rerun -> identical (stub decode is deterministic)
    again = {r.media_id: r for r in extract_features(media_df(spark)).collect()}
    assert rows[1].feat_mean == again[1].feat_mean


def test_frame_sample_offsets(spark):
    frames = frame_sample(media_df(spark), every_ms=1000).collect()
    assert {r.media_id for r in frames} == {3}
    assert sorted(r.frame_offset_ms for r in frames) == [0, 1000, 2000, 3000]


def test_resize_plan_aspect_preserving(spark):
    plans = {r.media_id: r for r in resize_plan(media_df(spark), 512).collect()}
    assert set(plans) == {1, 2}
    assert (plans[1].target_width, plans[1].target_height) == (512, 384)
    # already smaller than max side -> unchanged
    assert (plans[2].target_width, plans[2].target_height) == (300, 200)
