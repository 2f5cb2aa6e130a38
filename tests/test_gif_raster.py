"""Stdlib GIF raster decode (LZW): round trips against the repo's own
GIF writer, third-party-encoder files, interlacing, sub-canvas image
blocks, and the frame-split → decode composition."""

from __future__ import annotations

import glob
import os
import random
import struct

import numpy as np
import pytest

from modware_loader_spark.functions.media_codecs import (
    _gif_lzw_decode,
    _gif_rgb,
    decode_rgb,
    encode_gif_frames,
    split_gif_frames,
)


def _expected_rgb(idxs: bytes, pal: bytes) -> bytes:
    return b"".join(pal[3 * i : 3 * i + 3] for i in idxs)


PAL4 = bytes([10, 20, 30, 200, 50, 50, 50, 200, 50, 50, 50, 200])


def test_round_trip_single_and_animated():
    random.seed(11)
    w, h = 13, 9
    f1 = bytes(random.randrange(4) for _ in range(w * h))
    f2 = bytes(random.randrange(4) for _ in range(w * h))
    gif = encode_gif_frames([f1, f2], w, h, PAL4)
    frames = split_gif_frames(gif)
    assert len(frames) == 2
    for fr, idxs in zip(frames, (f1, f2)):
        dw, dh, rgb = _gif_rgb(fr)
        assert (dw, dh) == (w, h)
        assert rgb == _expected_rgb(idxs, PAL4)
    # decode_rgb dispatches gif to the raster path (first frame)
    dw, dh, rgb = decode_rgb(gif)
    assert (dw, dh) == (w, h) and rgb == _expected_rgb(f1, PAL4)


def test_interlaced_gif_deinterlaces():
    random.seed(7)
    w, h = 8, 11
    idxs = bytes(random.randrange(4) for _ in range(w * h))
    rows = [idxs[r * w : (r + 1) * w] for r in range(h)]
    # feed rows in interlace pass order, then set the interlace flag
    order = [
        r
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for r in range(start, h, step)
    ]
    interlaced_rows = b"".join(rows[r] for r in order)
    gif = bytearray(encode_gif_frames([interlaced_rows], w, h, PAL4))
    # image descriptor sits after header(13) + GCT + GCE(8 bytes)
    gct_len = 3 * (2 << (gif[10] & 7))
    desc = 13 + gct_len + 8
    assert gif[desc] == 0x2C
    gif[desc + 9] |= 0x40  # interlaced
    dw, dh, rgb = _gif_rgb(bytes(gif))
    assert (dw, dh) == (w, h)
    assert rgb == _expected_rgb(idxs, PAL4)


def test_sub_canvas_block_pads_with_background():
    # hand-build: 6x4 canvas, bg index 0, one 2x2 image block at (3, 1)
    depth = 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 6, 4, 0x80 | (depth - 1), 0, 0)
    out += PAL4
    out += b"\x2c" + struct.pack("<HHHHB", 3, 1, 2, 2, 0)
    mcs = depth
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = [clear]
    for px in [1, 2, 3, 1]:
        codes += [px, clear]
    codes[-1] = end
    bits = bitpos = 0
    acc = bytearray()
    for code in codes:
        bits |= code << bitpos
        bitpos += mcs + 1
        while bitpos >= 8:
            acc.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8
    if bitpos:
        acc.append(bits & 0xFF)
    out += bytes([mcs, len(acc)]) + acc + b"\x00\x3b"
    w, h, rgb = _gif_rgb(bytes(out))
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(4, 6, 3)
    bg = np.array(list(PAL4[0:3]), dtype=np.uint8)
    assert (a[0] == bg).all() and (a[:, :3] == bg).all()
    assert tuple(a[1, 3]) == tuple(PAL4[3:6])
    assert tuple(a[1, 4]) == tuple(PAL4[6:9])
    assert tuple(a[2, 3]) == tuple(PAL4[9:12])
    assert tuple(a[2, 4]) == tuple(PAL4[3:6])


def test_lzw_dictionary_growth_and_kwkwk():
    """A repeating sequence forces dictionary entries AND the KwKwK
    (code == next_code) case; decode must reproduce any real encoder's
    output — validated here against a hand-run LZW encode."""
    # repeating pattern drives dictionary growth and the code==next_code
    # (KwKwK) branch; 180 symbols pushes past one width increase
    seq = ([0, 1] * 30) + ([2, 2, 1] * 40)
    mcs = 2
    clear, end = 1 << mcs, (1 << mcs) + 1
    bits = bitpos = 0
    acc = bytearray()
    w_ = mcs + 1

    def pack(code):
        nonlocal bits, bitpos
        bits |= code << bitpos
        bitpos += w_
        while bitpos >= 8:
            acc.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8

    pack(clear)
    table = {(i,): i for i in range(clear)}
    nc = end + 1
    buf = ()
    for s in seq:
        cand = buf + (s,)
        if cand in table:
            buf = cand
            continue
        pack(table[buf])
        if nc < 4096:
            table[cand] = nc
            nc += 1
            # the decoder's table lags the encoder's by one entry (it
            # adds E_k only after reading C_{k+1}), so the encoder must
            # bump width ONE code later than its own count suggests —
            # the classic GIF late-change convention
            if nc == (1 << w_) + 1 and w_ < 12:
                w_ += 1
        buf = (s,)
    pack(table[buf])
    pack(end)
    if bitpos:
        acc.append(bits & 0xFF)
    got = _gif_lzw_decode(mcs, bytes(acc))
    assert got == seq


def test_third_party_gifs_decode_when_present():
    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.gif"
    ) + glob.glob("/root/.pyenv/versions/*/lib/python*/idlelib/Icons/tk.gif")
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no third-party GIF fixtures on this host")
    for p in found[:3]:
        with open(p, "rb") as fh:
            w, h, rgb = decode_rgb(fh.read())
        assert w > 0 and h > 0 and len(rgb) == w * h * 3
