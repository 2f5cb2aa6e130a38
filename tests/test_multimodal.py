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
