"""Audio feature extraction (MFCC) with stdlib + numpy only.

Completes the audio leg of the multimodal family: ``media_codecs``
already parses WAV headers to duration/RMS; this module decodes PCM
samples and computes the classic ASR/audio-dedup front-end — MFCCs
(Davis & Mermelstein 1980): framing → Hann window → power spectrum →
HTK mel filterbank → log → DCT-II. Everything is deterministic
float64 numpy, so re-runs and retries produce identical features, and
the whole computation sits inside Arrow ``mapInPandas`` workers (plain
bytes in, plain arrays out, no Spark imports — cloudpickle ships it by
value like the codecs).

No librosa/scipy in the container; the formulas here are the public
textbook definitions (HTK mel = 2595*log10(1 + f/700), orthonormal
DCT-II), so any engine with those libraries reproduces the pipeline
shape (exact float parity with librosa is NOT claimed — window/
filterbank conventions differ across libraries).
"""

from __future__ import annotations

import numpy as np

from modware_loader_spark.functions.media_codecs import wave_open


def wav_samples(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono float64 samples in [-1, 1]) from 8/16-bit PCM
    WAV bytes; multi-channel audio is averaged to mono."""
    with wave_open(payload) as wf:
        nch, sampwidth, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, x


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, mel-equally spaced."""
    fmax = rate / 2.0 if fmax is None else fmax
    mpts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz(mpts) / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m - 1, k] = (hi - k) / (hi - ctr)
    return fb


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    mat[0, :] *= 1.0 / np.sqrt(2.0)
    return mat


def mfcc(
    samples: np.ndarray,
    rate: int,
    n_mfcc: int = 13,
    n_mels: int = 26,
    frame_s: float = 0.025,
    hop_s: float = 0.010,
    n_fft: int | None = None,
    log_floor: float = 1e-10,
) -> np.ndarray:
    """(n_frames, n_mfcc) MFCC matrix; empty input → (0, n_mfcc).

    Frames of ``frame_s`` seconds every ``hop_s`` seconds, Hann window,
    ``|rfft|^2`` power, mel filterbank energies floored at ``log_floor``
    (silence stays finite), natural log, orthonormal DCT-II.
    """
    frame_len = max(1, int(round(frame_s * rate)))
    hop = max(1, int(round(hop_s * rate)))
    if n_fft is None:
        n_fft = 1 << (frame_len - 1).bit_length()
    x = np.asarray(samples, dtype=np.float64)
    if x.size < frame_len:
        x = np.pad(x, (0, frame_len - x.size))
    n_frames = 1 + (x.size - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(frame_len)[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    fb = mel_filterbank(n_mels, n_fft, rate)
    logmel = np.log(np.maximum(spec @ fb.T, log_floor))
    return logmel @ _dct2_ortho(n_mfcc, n_mels).T


def encode_wav_pcm16(rate: int, samples: np.ndarray) -> bytes:
    """Mono 16-bit PCM WAV bytes from float samples in [-1, 1] — the
    test-fixture writer (this container has no audio files to decode)."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
