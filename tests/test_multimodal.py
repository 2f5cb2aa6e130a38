"""Multimodal plumbing: binary payload columns + Arrow mapInPandas decode
(fake deterministic decoder — media libs aren't in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_binary_payload,
    decode_media,
)
from modware_loader_spark.session import load_tables


def test_decode_media_fake_batch_path(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(20)
    media = attach_binary_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = decode_media(media, fake=True)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_bytes > 0
        assert 0 <= r.decoded_width < 1024
        assert len(r.feature) == 4
    # deterministic: same payload → same fake decode
    again = {r.media_id: (r.decoded_width, r.decoded_height) for r in decode_media(media, fake=True).collect()}
    assert {r.media_id: (r.decoded_width, r.decoded_height) for r in rows} == again


def test_decode_media_real_path_raises(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(2)
    media = attach_binary_payload(docs)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_media(media, fake=False).collect()


def test_resize_media_fake(spark, sf_dir):
    from modware_loader_spark.operators.multimodal import RESIZED_SCHEMA, resize_media

    docs = load_tables(spark, sf_dir)["documents"].limit(10)
    media = attach_binary_payload(docs)
    resized = resize_media(media, 16, 8, fake=True)
    assert resized.schema == RESIZED_SCHEMA
    rows = resized.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.payload) == 16 * 8
        assert (r.meta_width, r.meta_height) == (16, 8)


def test_sample_frames_fake_expands_rows(spark, sf_dir):
    from modware_loader_spark.operators.multimodal import FRAME_SCHEMA, sample_frames

    docs = load_tables(spark, sf_dir)["documents"].limit(5)
    media = attach_binary_payload(docs)
    frames = sample_frames(media, 4, fake=True)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    assert len(rows) == 5 * 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_id.values())


def test_resize_and_frames_real_path_raise(spark, sf_dir):
    from modware_loader_spark.operators.multimodal import resize_media, sample_frames

    docs = load_tables(spark, sf_dir)["documents"].limit(2)
    media = attach_binary_payload(docs)
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        resize_media(media, 4, 4, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        sample_frames(media, 2, fake=False).collect()
