"""MFCC audio features: numpy-model semantics (tone separation, frame
math, silence behavior, mel filterbank shape) plus the Spark operator's
batch contract and error policies."""

from __future__ import annotations

import numpy as np
import pytest

from modware_loader_spark.functions.audio_features import (
    encode_wav_pcm16,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    mfcc,
    wav_samples,
)


def _tone(freq: float, rate: int = 16000, seconds: float = 0.5) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


def test_wav_round_trip_and_mono_mix():
    rate, x = wav_samples(encode_wav_pcm16(16000, _tone(440)))
    assert rate == 16000 and x.size == 8000
    assert np.abs(x).max() == pytest.approx(0.5, abs=1e-3)


def test_mel_scale_inverts():
    f = np.array([0.0, 440.0, 4000.0, 8000.0])
    assert np.allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-6)


def test_filterbank_covers_band_with_triangles():
    fb = mel_filterbank(26, 512, 16000)
    assert fb.shape == (26, 257)
    assert (fb >= 0).all() and fb.max() <= 1.0
    # interior bins are covered by at least one filter
    covered = fb.sum(axis=0)
    assert (covered[5:250] > 0).all()


def test_frame_count_and_determinism():
    x = _tone(440, rate=16000, seconds=0.5)
    m = mfcc(x, 16000)
    # 8000 samples, 400-frame window, 160 hop -> 1 + (8000-400)//160 = 48
    assert m.shape == (48, 13)
    assert np.array_equal(m, mfcc(x, 16000))


def test_tones_separate_and_silence_is_flat():
    lo = mfcc(_tone(300), 16000).mean(axis=0)
    hi = mfcc(_tone(4000), 16000).mean(axis=0)
    same = mfcc(_tone(300, seconds=0.7), 16000).mean(axis=0)
    d_diff = float(np.linalg.norm(lo - hi))
    d_same = float(np.linalg.norm(lo - same))
    assert d_diff > 5 * d_same  # different pitches are far, same pitch near
    sil = mfcc(np.zeros(8000), 16000)
    assert np.isfinite(sil).all()
    assert sil.std(axis=0).max() < 1e-6  # every frame identical


def test_short_clip_pads_to_one_frame():
    m = mfcc(np.ones(10), 16000)
    assert m.shape[0] == 1 and np.isfinite(m).all()


def test_spark_audio_features_operator(spark):
    from modware_loader_spark.operators.multimodal import audio_features

    rows = [
        (1, bytearray(encode_wav_pcm16(16000, _tone(300)))),
        (2, bytearray(encode_wav_pcm16(16000, _tone(4000)))),
        (3, bytearray(b"not audio")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(Exception):
        audio_features(media).collect()
    out = {r.media_id: r for r in audio_features(media, on_error="null").collect()}
    assert out[1].sample_rate == 16000 and out[1].n_frames == 48
    assert out[1].duration_s == pytest.approx(0.5)
    assert len(out[1].mfcc_mean) == 13 and len(out[1].mfcc_std) == 13
    a = np.array(out[1].mfcc_mean)
    b = np.array(out[2].mfcc_mean)
    assert np.linalg.norm(a - b) > 1.0  # pitch separation survives pooling
    for bad in (3, 4):
        assert out[bad].sample_rate is None and out[bad].mfcc_mean is None
    # clip-level vector plugs into the ANN operators like any embedding
    assert all(isinstance(v, float) for v in out[1].mfcc_mean)
