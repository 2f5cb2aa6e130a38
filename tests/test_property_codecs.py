"""Hypothesis fuzz for the stdlib codecs: random rasters through the
JPEG encode→decode loop must stay within quantization error bounds at
every size/subsampling/quality corner, and GIF encode→split→decode must
be EXACT (palette indices are lossless). Catches bit-packing and block
-edge bugs the hand-picked sizes in the unit suites might miss."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_baseline_jpeg,
)
from modware_loader_spark.functions.media_codecs import (
    _gif_rgb,
    encode_gif_frames,
    split_gif_frames,
)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _smooth_image(w: int, h: int, seed: int) -> np.ndarray:
    """JPEG-friendly random raster: random low-frequency gradients plus
    mild noise (hard edges would make max-error bounds meaningless)."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-2, 2, 3)
    gy = rng.uniform(-2, 2, 3)
    base = rng.uniform(60, 190, 3)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [base[c] + gx[c] * xx + gy[c] * yy for c in range(3)], axis=2
    )
    img += rng.normal(0, 3, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 10**6),
    quality=st.sampled_from([60, 85, 95]),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    rst=st.sampled_from([0, 3]),
)
def test_jpeg_round_trip_fuzz(w, h, seed, quality, sub, rst):
    img = _smooth_image(w, h, seed)
    enc = encode_baseline_jpeg(
        w, h, img.tobytes(), quality=quality, subsampling=sub,
        restart_interval=rst,
    )
    dw, dh, rgb = decode_jpeg(enc)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(float)
    err = np.abs(got - img.astype(float))
    # quantization-scaled bounds: low quality widens the budget
    budget = {95: 16.0, 85: 26.0, 60: 45.0}[quality] + (12.0 if sub == "4:2:0" else 0.0)
    assert err.max() <= budget, (err.max(), quality, sub, (w, h))
    assert err.mean() <= budget / 2.5


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ncols=st.integers(2, 17),
    seed=st.integers(0, 10**6),
)
def test_gif_round_trip_fuzz(w, h, ncols, seed):
    rng = np.random.default_rng(seed)
    pal = bytes(rng.integers(0, 256, 3 * ncols, dtype=np.uint8).tolist())
    frames = [
        bytes(rng.integers(0, ncols, w * h, dtype=np.uint8).tolist())
        for _ in range(2)
    ]
    gif = encode_gif_frames(frames, w, h, pal)
    for fr, idxs in zip(split_gif_frames(gif), frames):
        dw, dh, rgb = _gif_rgb(fr)
        assert (dw, dh) == (w, h)
        assert rgb == b"".join(pal[3 * i : 3 * i + 3] for i in idxs)
