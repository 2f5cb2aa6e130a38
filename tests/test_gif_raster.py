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


def test_png_adam7_interlaced_decode():
    """Adam7 PNG: build an interlaced file by packing each pass as its
    own filtered mini-image; decode must reproduce the raster exactly
    and match the non-interlaced encoding of the same pixels."""
    import random as _random
    import zlib

    from modware_loader_spark.functions.media_codecs import _png_rgb

    _random.seed(5)
    w, h = 11, 7
    px = [bytes(_random.randrange(256) for _ in range(3)) for _ in range(w * h)]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body))
        )

    def png(interlace: int, raw: bytes) -> bytes:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # non-interlaced: filter-0 scanlines
    flat = b"".join(b"\x00" + b"".join(px[y * w : (y + 1) * w]) for y in range(h))
    # Adam7: per-pass filter-0 scanlines
    passes = []
    for x0, y0, dx, dy in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                           (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                           (0, 1, 1, 2)]:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for sy in range(ph):
            row = b"".join(
                px[(y0 + sy * dy) * w + (x0 + sx * dx)] for sx in range(pw)
            )
            passes.append(b"\x00" + row)
    lace = b"".join(passes)

    want = b"".join(px)
    assert _png_rgb(png(0, flat)) == (w, h, want)
    assert _png_rgb(png(1, lace)) == (w, h, want)
