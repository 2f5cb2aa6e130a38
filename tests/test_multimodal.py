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


def test_decode_media_real_path_rejects_non_media(spark, sf_dir):
    """Text bytes are not a decodable payload: strict mode fails the
    stage, on_error='null' yields NULL dims/feature."""
    docs = load_tables(spark, sf_dir)["documents"].limit(2)
    media = attach_binary_payload(docs)
    with pytest.raises(Exception, match="ValueError|dimensions|decode"):
        decode_media(media, fake=False).collect()
    rows = decode_media(media, fake=False, on_error="null").collect()
    assert len(rows) == 2
    assert all(
        r.decoded_width is None and r.decoded_height is None and r.feature is None
        for r in rows
    )
    assert all(r.n_bytes > 0 for r in rows)


# ---------------------------------------------------------------- real codecs


def _chunk(t, d):
    import struct
    import zlib

    return (
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )


def _png(w, h, rows, colortype=2, filters=None, palette=None):
    """Minimal PNG writer (8-bit, filters 0/2) — test-local, so the
    decoder under test is exercised against independently built bytes."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w * channels)
    for y, row in enumerate(rows):
        f = (filters or [0] * h)[y]
        if f == 0:
            raw += b"\x00" + bytes(row)
        else:  # Up filter
            raw += b"\x02" + bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = bytes(row)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _bmp24(w, h, pixels_topdown):
    """Uncompressed 24-bit bottom-up BMP from [(r,g,b)] rows."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels_topdown):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\0" * (stride - len(line))
        body += line
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + bytes(body)


def _wav(seconds=0.5, rate=8000, amp=16384):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        n = int(seconds * rate)
        wf.writeframes(
            b"".join(
                struct.pack("<h", int(amp * math.sin(2 * math.pi * 440 * i / rate)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def _jpeg_header(w, h):
    import struct

    return (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3)
    )


def test_stdlib_codecs_unit():
    from modware_loader_spark.functions import media_codecs as MC

    # PNG RGB, one Up-filtered scanline (exercises unfiltering)
    rows = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]]
    png = _png(2, 2, rows, colortype=2, filters=[0, 2])
    assert MC.sniff_media_type(png) == "png"
    assert MC.decode_dims(png) == (2, 2)
    w, h, rgb = MC.decode_rgb(png)
    assert (w, h) == (2, 2)
    assert list(rgb) == [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]

    # grayscale PNG replicates to RGB
    gray = _png(2, 1, [[7, 200]], colortype=0)
    assert MC.decode_rgb(gray)[2] == bytes([7, 7, 7, 200, 200, 200])

    # BMP round-trip (BGR + bottom-up + padding all exercised)
    pix = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    bmp = _bmp24(3, 1, pix)
    assert MC.sniff_media_type(bmp) == "bmp"
    assert MC.decode_rgb(bmp)[2] == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])

    # PPM P6 with a comment line
    ppm = b"P6\n# c\n2 1\n255\n" + bytes([9, 8, 7, 6, 5, 4])
    assert MC.decode_rgb(ppm) == (2, 1, bytes([9, 8, 7, 6, 5, 4]))

    # header-only formats give real dims
    assert MC.decode_dims(_jpeg_header(31, 17)) == (31, 17)
    gif = b"GIF89a" + (64).to_bytes(2, "little") + (48).to_bytes(2, "little")
    assert MC.decode_dims(gif) == (64, 48)

    # WAV stats
    nch, rate, dur, rms = MC.decode_wav_stats(_wav(seconds=0.25, rate=8000))
    assert (nch, rate) == (1, 8000)
    assert abs(dur - 0.25) < 1e-6
    assert 0.3 < rms < 0.4  # sine at half amplitude → rms ≈ amp/√2/32768


def test_decode_media_real_formats(spark):
    """The real decode path through Spark: every stdlib-decodable format
    in one frame, plus a corrupt payload under on_error='null'."""
    png = _png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]])
    payloads = [
        (1, "image/png", bytearray(png)),
        (2, "image/bmp", bytearray(_bmp24(3, 1, [[(10, 20, 30)] * 3]))),
        (3, "image/ppm", bytearray(b"P6\n2 1\n255\n" + bytes([0, 0, 0, 255, 255, 255]))),
        (4, "image/gif", bytearray(b"GIF89a" + (5).to_bytes(2, "little") + (7).to_bytes(2, "little"))),
        (5, "image/jpeg", bytearray(_jpeg_header(12, 34))),
        (6, "audio/wav", bytearray(_wav(seconds=0.25))),
        (7, "application/junk", bytearray(b"not media at all")),
    ]
    media = spark.createDataFrame(
        payloads, "media_id long, media_type string, payload binary"
    )
    rows = {r.media_id: r for r in decode_media(media, on_error="null").collect()}
    assert (rows[1].decoded_width, rows[1].decoded_height) == (2, 2)
    # png mean color: R=(255+0+0+255)/4, G=(0+255+0+255)/4, B=(0+0+255+255)/4
    assert rows[1].feature[0] == pytest.approx(510 / 4 / 255, abs=1e-5)
    assert rows[2].feature[:3] == [
        pytest.approx(10 / 255, abs=1e-5),
        pytest.approx(20 / 255, abs=1e-5),
        pytest.approx(30 / 255, abs=1e-5),
    ]
    assert (rows[4].decoded_width, rows[4].decoded_height) == (5, 7)
    # header-only gif: no image block -> raster decode falls back to
    # header dims (FULL gifs raster fine as of r7, tests/test_gif_raster.py)
    assert rows[4].feature is None
    assert (rows[5].decoded_width, rows[5].decoded_height) == (12, 34)
    assert rows[6].decoded_width is None and rows[6].feature[0] == pytest.approx(0.25)
    assert rows[7].decoded_width is None and rows[7].feature is None


def test_resize_media_real(spark):
    from modware_loader_spark.functions import media_codecs as MC
    from modware_loader_spark.operators.multimodal import resize_media

    png = _png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]])
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(png))],
        "media_id long, media_type string, payload binary",
    )
    rows = resize_media(media, 4, 4, fake=False).collect()
    assert len(rows) == 1
    out = bytes(rows[0].payload)
    # stdlib path emits PPM; PIL path (if installed) emits PNG — both decode
    w, h, rgb = MC.decode_rgb(out)
    assert (w, h) == (4, 4)
    # nearest-neighbor: top-left quadrant stays red
    assert rgb[0:3] == bytes([255, 0, 0])
    assert (rows[0].meta_width, rows[0].meta_height) == (4, 4)


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


def test_frames_real_path_rejects_non_video(spark, sf_dir):
    """Non-container payloads fail the strict real path but null under
    on_error='null' (one corrupt video must not kill a 100 TB stage)."""
    from modware_loader_spark.operators.multimodal import sample_frames

    docs = load_tables(spark, sf_dir)["documents"].limit(2)
    media = attach_binary_payload(docs)
    with pytest.raises(Exception, match="unsupported video container"):
        sample_frames(media, 2, fake=False).collect()
    rows = sample_frames(media, 2, fake=False, on_error="null").collect()
    assert len(rows) == 2
    assert all(r.payload is None and r.frame_index == 0 for r in rows)


def test_resize_media_real_on_error_null(spark):
    """resize_media matches decode_media's corrupt-payload policy."""
    from modware_loader_spark.operators.multimodal import resize_media

    png = _png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]])
    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png)),
            (2, "application/junk", bytearray(b"not an image")),
            (3, "image/png", None),
        ],
        "media_id long, media_type string, payload binary",
    )
    with pytest.raises(Exception):
        resize_media(media, 4, 4, fake=False).collect()
    rows = {r.media_id: r for r in resize_media(media, 4, 4, fake=False, on_error="null").collect()}
    assert len(rows) == 3
    assert rows[1].payload is not None and (rows[1].meta_width, rows[1].meta_height) == (4, 4)
    for bad in (2, 3):
        assert rows[bad].payload is None
        assert rows[bad].meta_width is None and rows[bad].meta_height is None


def test_payload_size_cap_policies(spark):
    """Payloads past max_payload_bytes fail fast under on_error='raise'
    and NULL out (without being decoded) under 'null' — the Arrow
    batch-residency guard for mislabeled giant media."""
    from modware_loader_spark.operators.multimodal import (
        decode_media,
        resize_media,
        sample_frames,
    )

    png = _png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]])
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(png)), (2, "image/png", bytearray(b"x" * 2048))],
        "media_id long, media_type string, payload binary",
    )
    with pytest.raises(Exception, match="max_payload_bytes"):
        decode_media(media, max_payload_bytes=1024).collect()
    rows = {
        r.media_id: r
        for r in decode_media(
            media, on_error="null", max_payload_bytes=1024
        ).collect()
    }
    assert rows[1].decoded_width == 2 and rows[2].decoded_width is None
    with pytest.raises(Exception, match="max_payload_bytes"):
        resize_media(media, 4, 4, max_payload_bytes=1024).collect()
    r2 = {
        r.media_id: r
        for r in resize_media(
            media, 4, 4, on_error="null", max_payload_bytes=1024
        ).collect()
    }
    assert r2[1].payload is not None and r2[2].payload is None
    # restrict the raise-check to the oversized row: the PNG row would
    # also raise (it is not a video container) with a different message,
    # and whichever task fails first wins the match
    big_only = media.filter("media_id = 2")
    with pytest.raises(Exception, match="max_payload_bytes"):
        sample_frames(big_only, 2, max_payload_bytes=1024).collect()
    f2 = sample_frames(
        big_only, 2, on_error="null", max_payload_bytes=1024
    ).collect()
    assert any(r.media_id == 2 and r.payload is None for r in f2)


# ------------------------------------------------------- video containers


def _mjpeg_avi(n=6, w=8, h=6):
    from modware_loader_spark.functions import media_codecs as MC

    frames = [_jpeg_header(w, h) + bytes([i]) * 11 for i in range(n)]
    return frames, MC.encode_mjpeg_avi(frames, w, h, fps=10)


def test_video_container_codecs_unit():
    """AVI writer→splitter round-trip and GIF frame split, stdlib only.

    Writer and splitter are independent walks over the published RIFF /
    GIF89a layouts, so agreement is evidence, not tautology."""
    from modware_loader_spark.functions import media_codecs as MC

    frames, avi = _mjpeg_avi(7)
    assert MC.sniff_video_type(avi) == "avi"
    assert MC.split_avi_frames(avi) == frames

    # odd-length frames exercise RIFF word alignment
    odd = [b"\xff\xd8\xffabc", b"\xff\xd8\xffde"]
    assert MC.split_avi_frames(MC.encode_mjpeg_avi(odd, 2, 2)) == odd

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    idx_frames = [bytes([0, 1, 2, 3]), bytes([3, 2, 1, 0]), bytes([1, 1, 2, 2])]
    gif = MC.encode_gif_frames(idx_frames, 2, 2, pal)
    singles = MC.split_gif_frames(gif)
    assert len(singles) == 3
    for s in singles:
        assert s.startswith(b"GIF89a") and s.endswith(b"\x3b")
        assert MC.decode_dims(s) == (2, 2)


def test_sample_frames_real_avi_round_trip(spark):
    """A real container through the Spark operator: MJPEG AVI in, the
    container's own JPEG frame payloads out, uniform-stride sampled."""
    from modware_loader_spark.operators.multimodal import sample_frames

    frames, avi = _mjpeg_avi(n=6)
    _, short_avi = _mjpeg_avi(n=2)
    media = spark.createDataFrame(
        [(1, "video/avi", bytearray(avi)), (2, "video/avi", bytearray(short_avi))],
        "media_id long, media_type string, payload binary",
    )
    rows = sample_frames(media, 3, fake=False).collect()
    got = {}
    for r in rows:
        got.setdefault(r.media_id, {})[r.frame_index] = bytes(r.payload)
    # 6 frames sampled to 3 at uniform stride → source indices 0, 2, 4
    assert got[1] == {0: frames[0], 1: frames[2], 2: frames[4]}
    # fewer frames than requested → all frames, no padding
    assert sorted(got[2]) == [0, 1]
    # frame payloads are standalone JPEGs (header dims survive)
    from modware_loader_spark.functions import media_codecs as MC

    assert MC.decode_dims(got[1][0]) == (8, 6)


def test_sample_frames_real_gif(spark):
    from modware_loader_spark.functions import media_codecs as MC
    from modware_loader_spark.operators.multimodal import sample_frames

    pal = bytes([0, 0, 0, 255, 255, 255])
    gif = MC.encode_gif_frames(
        [bytes([0, 1, 1, 0]), bytes([1, 0, 0, 1])], 2, 2, pal
    )
    media = spark.createDataFrame(
        [(9, "image/gif", bytearray(gif))],
        "media_id long, media_type string, payload binary",
    )
    rows = sample_frames(media, 8, fake=False).collect()
    assert len(rows) == 2  # container has 2 frames; no synthetic padding
    for r in rows:
        assert MC.decode_dims(bytes(r.payload)) == (2, 2)


def test_sample_frames_pyav_path(spark):
    """PyAV-preferred decode (any codec → PPM rasters); exercised only
    where PyAV is installed — this container ships without it."""
    pytest.importorskip("av")
    from modware_loader_spark.operators.multimodal import sample_frames

    frames, avi = _mjpeg_avi(n=4)
    media = spark.createDataFrame(
        [(1, "video/avi", bytearray(avi))],
        "media_id long, media_type string, payload binary",
    )
    rows = sample_frames(media, 2, fake=False).collect()
    assert all(bytes(r.payload).startswith(b"P6") for r in rows)


def test_synth_wav_tones_round_trip_and_determinism(spark):
    """Synth payloads are REAL WAVs (decodable by wav_samples) and the
    tone parameters depend on id % 7 / id % 11 only."""
    import numpy as np

    from modware_loader_spark.functions.audio_features import wav_samples
    from modware_loader_spark.operators.multimodal import synth_wav_tones

    docs = spark.createDataFrame([(0,), (77,), (1,)], ["doc_id"])
    out = {r["media_id"]: bytes(r["payload"]) for r in synth_wav_tones(docs).collect()}
    rate, x0 = wav_samples(out[0])
    assert rate == 1600 and x0.size == 72
    # 77 % 7 == 0 and 77 % 11 == 0 -> same tones as doc 0
    assert out[77] == out[0]
    assert out[1] != out[0]
    # samples match the documented formula after int16 quantization
    n = np.arange(72)
    want = np.trunc(
        (0.4 * np.sin(2 * np.pi * 100 * n / 1600)
         + 0.3 * np.sin(2 * np.pi * 300 * n / 1600)) * 32767.0
    ) / 32768.0
    assert np.array_equal(x0, want)


def test_synth_video_frames_cut_semantics(spark):
    """Frames share the per-segment base: the dHash jump at the cut
    dwarfs within-shot noise, and shot_boundaries flags exactly the
    first frame and the cut for a typical document."""
    from modware_loader_spark.operators import image_hash as IH

    docs = spark.createDataFrame([(3,), (12,)], ["doc_id"])
    frames = IH.synth_video_frames(docs, n_frames=4, cut_at=2)
    out = {
        (r["media_id"], r["frame_index"]): (r["hamming_prev"], r["is_boundary"])
        for r in IH.shot_boundaries(frames, max_hamming=16).collect()
    }
    assert len(out) == 8
    for mid in (3, 12):
        assert out[(mid, 0)] == (None, 1)
        assert out[(mid, 2)][0] > 16 and out[(mid, 2)][1] == 1
        for f in (1, 3):
            assert out[(mid, f)][0] <= 16 and out[(mid, f)][1] == 0
