"""Pure-stdlib media codecs backing ``operators/multimodal.py``.

The container ships no PIL/ffmpeg, but "no Pillow" does not have to mean
"no decode": PNG (zlib inflate + scanline unfiltering), BMP (24/32-bit
uncompressed), binary PPM, GIF (LZW, interlacing, local color tables)
and JPEG (baseline + progressive, via ``jpeg_codec``) all decode to
full RGB rasters with stdlib+numpy alone; WAV parses with ``wave``.
Pillow, when importable, takes over as the preferred decoder (it
additionally covers WebP/TIFF and the exotic JPEG processes).

Everything here is deterministic and runs inside Arrow-batched
``mapInPandas`` workers — plain bytes in, plain tuples out, no Spark
imports (cloudpickle ships these functions by value).
"""

from __future__ import annotations

import io
import struct
import zlib

__all__ = [
    "sniff_media_type",
    "decode_dims",
    "decode_rgb",
    "decode_wav_stats",
    "resize_rgb_nearest",
    "encode_ppm",
    "pil_available",
]


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def sniff_media_type(payload: bytes | None) -> str:
    """Magic-byte sniff: png | jpeg | gif | bmp | ppm | wav | unknown."""
    p = payload or b""
    if p.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if p.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if p.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if p.startswith(b"BM"):
        return "bmp"
    if p.startswith((b"P6", b"P5")):
        return "ppm"
    if p.startswith(b"RIFF") and p[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------- dims


def _png_chunks(p: bytes):
    off = 8
    while off + 8 <= len(p):
        (length,) = struct.unpack_from(">I", p, off)
        ctype = p[off + 4 : off + 8]
        data = p[off + 8 : off + 8 + length]
        yield ctype, data
        off += 12 + length
        if ctype == b"IEND":
            break


def _png_dims(p: bytes) -> tuple[int, int]:
    for ctype, data in _png_chunks(p):
        if ctype == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            return w, h
    raise ValueError("PNG without IHDR")


def _jpeg_dims(p: bytes) -> tuple[int, int]:
    """Walk JPEG markers to the first SOF segment (C0-CF minus C4/C8/CC)."""
    off = 2
    while off + 4 <= len(p):
        if p[off] != 0xFF:
            off += 1
            continue
        marker = p[off + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2
            continue
        (seglen,) = struct.unpack_from(">H", p, off + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", p, off + 5)
            return w, h
        off += 2 + seglen
    raise ValueError("JPEG without SOF marker")


def _gif_dims(p: bytes) -> tuple[int, int]:
    w, h = struct.unpack_from("<HH", p, 6)
    return w, h


def _bmp_header(p: bytes):
    (data_off,) = struct.unpack_from("<I", p, 10)
    w, h = struct.unpack_from("<ii", p, 18)
    (bpp,) = struct.unpack_from("<H", p, 28)
    (compression,) = struct.unpack_from("<I", p, 30)
    return data_off, w, h, bpp, compression


def _ppm_header(p: bytes):
    """(magic, w, h, maxval, pixel_offset) — whitespace/comment-tolerant."""
    tokens, off, need = [], 2, 3
    while len(tokens) < need and off < len(p):
        c = p[off : off + 1]
        if c == b"#":
            while off < len(p) and p[off : off + 1] != b"\n":
                off += 1
        elif c.isspace():
            off += 1
        else:
            start = off
            while off < len(p) and not p[off : off + 1].isspace():
                off += 1
            tokens.append(int(p[start:off]))
    off += 1  # single whitespace after maxval
    w, h, maxval = tokens
    return p[:2], w, h, maxval, off


def decode_dims(payload: bytes) -> tuple[int, int]:
    """Real (width, height) from the payload's own header bytes."""
    kind = sniff_media_type(payload)
    if kind == "png":
        return _png_dims(payload)
    if kind == "jpeg":
        return _jpeg_dims(payload)
    if kind == "gif":
        return _gif_dims(payload)
    if kind == "bmp":
        _, w, h, _, _ = _bmp_header(payload)
        return w, abs(h)
    if kind == "ppm":
        _, w, h, _, _ = _ppm_header(payload)
        return w, h
    raise ValueError(f"cannot read dimensions of {kind!r} payload")


# ---------------------------------------------------------------- rasters


def _paeth(a: int, b: int, c: int) -> int:
    pp = a + b - c
    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, width_px: int, height: int,
                  channels: int) -> tuple[bytearray, int]:
    """Unfilter ``height`` scanlines of ``width_px`` pixels starting at
    ``pos``; returns (pixel bytes, new position). Filters 0-4."""
    stride = width_px * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out, pos


def _png_rgb(p: bytes) -> tuple[int, int, bytes]:
    """Decode 8-bit PNG (gray/RGB/palette/with-alpha; non-interlaced or
    Adam7) to a packed RGB raster — inflate + per-scanline unfilter
    (filters 0-4), with per-pass reassembly for interlaced files."""
    w = h = None
    colortype = bitdepth = interlace = None
    palette = b""
    idat = bytearray()
    for ctype, data in _png_chunks(p):
        if ctype == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            bitdepth, colortype, _, _, interlace = data[8:13]
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if bitdepth != 8 or interlace not in (0, 1):
        raise ValueError("stdlib PNG decode supports 8-bit depth only")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if interlace == 0:
        out, _ = _png_unfilter(raw, 0, w, h, channels)
    else:  # Adam7: each pass is its own filtered mini-image
        out = bytearray(h * stride)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _png_unfilter(raw, pos, pw, ph, channels)
            for sy in range(ph):
                oy = y0 + sy * dy
                for sx in range(pw):
                    ox = x0 + sx * dx
                    si = (sy * pw + sx) * channels
                    oi = (oy * w + ox) * channels
                    out[oi : oi + channels] = sub[si : si + channels]
    # normalize to RGB
    if colortype == 2:
        return w, h, bytes(out)
    rgb = bytearray(w * h * 3)
    if colortype == 0:
        for i in range(w * h):
            rgb[3 * i : 3 * i + 3] = out[i : i + 1] * 3
    elif colortype == 4:
        for i in range(w * h):
            rgb[3 * i : 3 * i + 3] = out[2 * i : 2 * i + 1] * 3
    elif colortype == 6:
        for i in range(w * h):
            rgb[3 * i : 3 * i + 3] = out[4 * i : 4 * i + 3]
    elif colortype == 3:
        for i in range(w * h):
            pi = out[i] * 3
            rgb[3 * i : 3 * i + 3] = palette[pi : pi + 3]
    return w, h, bytes(rgb)


def _bmp_rgb(p: bytes) -> tuple[int, int, bytes]:
    data_off, w, h, bpp, compression = _bmp_header(p)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError("stdlib BMP decode supports uncompressed 24/32-bit only")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    bytespp = bpp // 8
    row_stride = (w * bytespp + 3) & ~3
    rgb = bytearray(w * h * 3)
    for y in range(h):
        src_y = (h - 1 - y) if flip else y
        row = p[data_off + src_y * row_stride :]
        for x in range(w):
            b, g, r = row[x * bytespp : x * bytespp + 3]
            i = (y * w + x) * 3
            rgb[i : i + 3] = bytes((r, g, b))
    return w, h, bytes(rgb)


def _ppm_rgb(p: bytes) -> tuple[int, int, bytes]:
    magic, w, h, maxval, off = _ppm_header(p)
    if maxval != 255:
        raise ValueError("PPM decode supports maxval=255 only")
    if magic == b"P6":
        return w, h, p[off : off + w * h * 3]
    gray = p[off : off + w * h]  # P5
    rgb = bytearray(w * h * 3)
    for i in range(w * h):
        rgb[3 * i : 3 * i + 3] = gray[i : i + 1] * 3
    return w, h, bytes(rgb)


def _gif_lzw_decode(mcs: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first variable-width codes, clear/end codes,
    dictionary growth to 12 bits, KwKwK case (T.81-era GIF89a spec)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    nbits = len(data) * 8
    pos = 0
    out: list[int] = []
    table: dict[int, list[int]] = {}
    next_code = end + 1
    prev: list[int] | None = None

    def read() -> int:
        nonlocal pos
        v = 0
        for i in range(width):
            v |= ((data[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        return v

    while pos + width <= nbits:
        code = read()
        if code == clear:
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + [prev[0]]
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_rgb(p: bytes) -> tuple[int, int, bytes]:
    """First image block of a GIF as a full-canvas RGB raster.

    Handles global/local color tables, interlacing, and LZW
    decompression; pixels outside the (possibly smaller) image block
    take the background color; a GCE transparent index renders as its
    palette color (still-image contract — no compositing stack).
    Animated GIFs: ``split_gif_frames`` re-wraps each frame as a
    standalone GIF, which this function then rasters — the stdlib
    frame-sampling → decode composition.
    """
    if sniff_media_type(p) != "gif":
        raise ValueError("not a GIF")
    try:
        return _gif_rgb_inner(p)
    except (IndexError, struct.error) as exc:
        # truncated/header-only payloads surface as ValueError so
        # decode_media can fall back to header-dims parsing
        raise ValueError(f"truncated or malformed GIF: {exc}") from exc


def _gif_rgb_inner(p: bytes) -> tuple[int, int, bytes]:
    w, h = struct.unpack("<HH", p[6:10])
    flags, bg = p[10], p[11]
    gct_n = (2 << (flags & 7)) if flags & 0x80 else 0
    gct = p[13 : 13 + 3 * gct_n]
    pos = 13 + 3 * gct_n

    def skip_subblocks(q: int) -> int:
        while p[q]:
            q += 1 + p[q]
        return q + 1

    while pos < len(p):
        b0 = p[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            pos = skip_subblocks(pos + 2)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", p[pos + 1 : pos + 9])
        dflags = p[pos + 9]
        lct_n = (2 << (dflags & 7)) if dflags & 0x80 else 0
        pal = p[pos + 10 : pos + 10 + 3 * lct_n] if lct_n else gct
        if not pal:
            raise ValueError("GIF image has no color table")
        q = pos + 10 + 3 * lct_n
        mcs = p[q]
        q += 1
        data = bytearray()
        while p[q]:
            ln = p[q]
            data += p[q + 1 : q + 1 + ln]
            q += 1 + ln
        idxs = _gif_lzw_decode(mcs, bytes(data))
        if len(idxs) < iw * ih:
            raise ValueError("GIF LZW stream shorter than raster")
        if dflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = [idxs[r * iw : (r + 1) * iw] for r in range(ih)]
            order = [
                r for start, step in _INTERLACE_PASSES for r in range(start, ih, step)
            ]
            deinterlaced = [None] * ih
            for src, dst in enumerate(order):
                deinterlaced[dst] = rows[src]
            idxs = [px for row in deinterlaced for px in row]
        npal = len(pal) // 3
        bg_rgb = (
            pal[3 * bg : 3 * bg + 3] if bg < npal and gct else b"\x00\x00\x00"
        )
        canvas = bytearray(bytes(bg_rgb) * (w * h))
        for r in range(ih):
            cy = top + r
            if cy >= h:
                break
            for c in range(iw):
                cx = left + c
                if cx >= w:
                    continue
                px = idxs[r * iw + c]
                if px >= npal:
                    raise ValueError("palette index out of range")
                o = 3 * (cy * w + cx)
                canvas[o : o + 3] = pal[3 * px : 3 * px + 3]
        return w, h, bytes(canvas)
    raise ValueError("GIF contains no image block")


def decode_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Full RGB raster: Pillow when importable (any format it knows),
    else the stdlib decoders (png/bmp/ppm, baseline+progressive jpeg
    via ``jpeg_codec``, gif via LZW)."""
    if pil_available():
        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        return img.width, img.height, img.tobytes()
    kind = sniff_media_type(payload)
    if kind == "png":
        return _png_rgb(payload)
    if kind == "bmp":
        return _bmp_rgb(payload)
    if kind == "ppm":
        return _ppm_rgb(payload)
    if kind == "jpeg":
        from modware_loader_spark.functions.jpeg_codec import (
            decode_baseline_jpeg,
        )

        return decode_baseline_jpeg(payload)
    if kind == "gif":
        return _gif_rgb(payload)
    raise ValueError(
        f"raster decode of {kind!r} requires Pillow "
        "(stdlib path covers png/bmp/ppm/jpeg/gif)"
    )


def decode_wav_stats(payload: bytes) -> tuple[int, int, float, float]:
    """(channels, framerate, duration_s, rms in [0,1]) via ``wave``."""
    with wave_open(payload) as wf:
        nch, sampwidth, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        frames = wf.readframes(nframes)
    duration = nframes / rate if rate else 0.0
    if sampwidth == 2:
        n = len(frames) // 2
        if n:
            acc = 0
            for (s,) in struct.iter_unpack("<h", frames):
                acc += s * s
            rms = (acc / n) ** 0.5 / 32768.0
        else:
            rms = 0.0
    elif sampwidth == 1:
        n = len(frames)
        rms = ((sum((b - 128) ** 2 for b in frames) / n) ** 0.5 / 128.0) if n else 0.0
    else:
        rms = float("nan")
    return nch, rate, round(duration, 6), round(rms, 6)


def wave_open(payload: bytes):
    import wave

    return wave.open(io.BytesIO(payload), "rb")


# ---------------------------------------------------------------- resize


def resize_rgb_nearest(
    w: int, h: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a packed RGB raster."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = min(h - 1, y * h // out_h)
        row = sy * w
        for x in range(out_w):
            sx = min(w - 1, x * w // out_w)
            si = (row + sx) * 3
            di = (y * out_w + x) * 3
            out[di : di + 3] = rgb[si : si + 3]
    return bytes(out)


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    """Pack an RGB raster as binary PPM (P6) — the stdlib-writable format."""
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


# ------------------------------------------------------- video containers
#
# Container video is frame-*splittable* with the standard library even
# though codec decode is not: AVI is a RIFF chunk stream whose video
# chunks ARE the per-frame payloads (standalone JPEGs for MJPEG, the
# dominant "simple AVI" codec), and animated GIF is a block stream whose
# image blocks re-wrap into standalone single-frame GIFs byte-for-byte.
# PyAV, when importable, takes over as the preferred decoder (any codec,
# raster output); these splitters are the no-dependency path.


def sniff_video_type(payload: bytes | None) -> str:
    """Magic-byte sniff for frame-splittable containers: avi | gif | unknown."""
    p = payload or b""
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "avi"
    if p.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return "unknown"


def split_avi_frames(payload: bytes) -> list[bytes]:
    """Ordered raw video-chunk payloads of an AVI (RIFF) container.

    Walks the chunk tree to the ``movi`` LIST and collects ``##db`` /
    ``##dc`` (uncompressed / compressed video) chunks, recursing into
    ``rec `` grouping LISTs. For MJPEG AVIs each returned payload is a
    standalone JPEG. Pure struct parsing — no codec work.
    """
    if sniff_video_type(payload) != "avi":
        raise ValueError("not an AVI container")
    frames: list[bytes] = []

    def walk(buf: bytes, lo: int, hi: int, in_movi: bool) -> None:
        pos = lo
        while pos + 8 <= hi:
            ckid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_lo, body_hi = pos + 8, min(pos + 8 + size, hi)
            if ckid == b"LIST":
                list_type = buf[body_lo : body_lo + 4]
                walk(
                    buf,
                    body_lo + 4,
                    body_hi,
                    in_movi or list_type in (b"movi", b"rec "),
                )
            elif (
                in_movi
                and ckid[:2].isdigit()
                and ckid[2:4] in (b"db", b"dc")
            ):
                frames.append(buf[body_lo:body_hi])
            pos = body_hi + (size & 1)  # chunks are word-aligned
    walk(payload, 12, len(payload), False)
    return frames


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Minimal spec-valid MJPEG AVI container around standalone JPEGs.

    Exists so the frame-sampling round-trip test has a real container to
    split without shipping a binary fixture: writer and splitter are
    independent code paths over the published RIFF/AVI layout.
    """
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)

    def chunk(ckid: bytes, body: bytes) -> bytes:
        return ckid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0, 0, 0,  # flags, priority, language
            0,  # initial frames
            1, fps,  # scale, rate → fps frames/sec
            0, n,  # start, length
            max_bytes,  # suggested buffer size
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies per frame)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi_body = b"movi"
    idx_entries = []
    for f in jpeg_frames:
        # idx1 offsets point at the chunk id, relative to the 'movi' fourcc
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def split_gif_frames(payload: bytes) -> list[bytes]:
    """Each image block of an (animated) GIF, re-wrapped as a standalone
    single-frame GIF: shared header + logical screen descriptor + global
    color table, the frame's own graphic-control extension when present,
    its image descriptor (+ local color table) and LZW data, trailer.
    Byte-level block walking only — the LZW stream is copied, not decoded.
    """
    p = payload
    if sniff_video_type(p) != "gif":
        raise ValueError("not a GIF")
    lsd_flags = p[10]
    gct_len = 3 * (2 << (lsd_flags & 7)) if lsd_flags & 0x80 else 0
    header = p[: 13 + gct_len]
    pos = 13 + gct_len

    def skip_subblocks(pos: int) -> int:
        while p[pos]:
            pos += 1 + p[pos]
        return pos + 1

    frames: list[bytes] = []
    pending_gce = b""
    while pos < len(p):
        b0 = p[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = p[pos + 1]
            end = skip_subblocks(pos + 2)
            if label == 0xF9:  # graphic control: belongs to the next image
                pending_gce = p[pos:end]
            pos = end
        elif b0 == 0x2C:  # image descriptor
            desc_flags = p[pos + 9]
            lct_len = 3 * (2 << (desc_flags & 7)) if desc_flags & 0x80 else 0
            data_start = pos + 10 + lct_len
            end = skip_subblocks(data_start + 1)  # +1: LZW min code size byte
            frames.append(header + pending_gce + p[pos:end] + b"\x3b")
            pending_gce = b""
            pos = end
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x} at {pos}")
    return frames


def encode_gif_frames(
    index_frames: list[bytes], width: int, height: int, palette: bytes
) -> bytes:
    """Minimal animated GIF from palette-index rasters (stdlib writer for
    round-trip tests). LZW is emitted with the constant-width trick — a
    clear code before every pixel code keeps the dictionary empty and the
    code width fixed — spec-valid output without a dictionary encoder.
    """
    ncols = len(palette) // 3
    depth = max(2, (ncols - 1).bit_length())
    gct = palette + b"\0" * (3 * ((1 << depth) - ncols))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += gct
    clear, end_code = 1 << depth, (1 << depth) + 1
    for idxs in index_frames:
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 10 cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([depth])
        # pack codes LSB-first at fixed width depth+1
        bits = bitpos = 0
        acc = bytearray()
        codes = [clear]
        for px in idxs:
            codes += [px, clear]
        codes[-1] = end_code
        for code in codes:
            bits |= code << bitpos
            bitpos += depth + 1
            while bitpos >= 8:
                acc.append(bits & 0xFF)
                bits >>= 8
                bitpos -= 8
        if bitpos:
            acc.append(bits & 0xFF)
        for i in range(0, len(acc), 255):
            block = acc[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
