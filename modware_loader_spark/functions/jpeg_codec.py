"""Pure-stdlib+numpy baseline JPEG codec (ITU T.81 sequential DCT).

Closes the last honest gap in the no-Pillow raster path
(``media_codecs.decode_rgb`` used to read JPEG header dims only, so
image dHash over a JPEG corpus required Pillow). Scope — the baseline
profile that covers the overwhelming majority of real-world JPEGs:

- **decode**: SOF0/SOF1 (baseline/extended sequential) AND SOF2
  (progressive: spectral selection + successive approximation, EOB
  runs, interleaved DC / single-component AC scans) with 1 or 3
  components and any h/v sampling factors up to 2 (4:4:4, 4:2:2,
  4:2:0), standard or custom DQT/DHT, DRI/RSTn restart markers,
  byte-stuffed entropy data. The exotic remainder (lossless,
  arithmetic-coded, hierarchical) raises with a clear message — use
  Pillow for those.
- **encode**: quality-scaled Annex K quantization + standard Annex K
  Huffman tables, grayscale or YCbCr at 4:4:4 / 4:2:0, optional restart
  interval. The encoder exists so the decoder is testable in this
  container (no Pillow to produce fixtures) — the same
  encoder-validates-decoder pattern as ``media_codecs.encode_mjpeg_avi``
  round-tripping ``split_avi_frames``.

Everything is deterministic; the hot loops are numpy (blockwise DCT as
an 8x8 matrix sandwich), the bit I/O is plain Python — fine for the
Arrow-batched decode stages whose unit of work is one image.

All tables below are the public ITU T.81 Annex K constants.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

def _zigzag() -> list[int]:
    """ZIGZAG[k] = natural (row-major) index of the k-th zigzag element
    — built programmatically (a 64-literal table is unreviewable)."""
    order = []
    for s in range(15):
        idx = [(i, s - i) for i in range(s + 1) if 0 <= s - i < 8 and i < 8]
        if s % 2 == 0:
            idx.reverse()
        order.extend(r * 8 + c for r, c in idx)
    return order


ZIGZAG = _zigzag()

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis (orthonormal): dct = C @ block @ C.T, idct = C.T @ X @ C
_K, _N = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _N + 1) * _K * np.pi / 16)
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry divisor in 1..255."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ------------------------------------------------------- huffman tables


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value → (code, length)) canonical Huffman assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """((length, code) → value) lookup for the decoder."""
    return {(ln, c): v for v, (c, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # 1-fill per spec


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, surfaces RSTn markers.

    The accumulator is masked to its live bits on every refill — letting
    consumed high bits pile up turns it into an ever-growing bigint and
    the whole decode into arbitrary-precision arithmetic (a 10x slowdown
    on megabyte-scale progressive scans, found by profiling f3.jpg)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill_to(self, need: int) -> None:
        buf = self.buf
        while self._n < need:
            if self.marker is not None:
                raise EOFError("bit read past marker")
            b = buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # T.81 B.1.1.2: a marker may be preceded by any run
                    # of 0xFF fill bytes — consume the run and take the
                    # first non-0xFF byte as the marker code (a trailing
                    # 0xFF 0x00 in the run is a stuffed data byte)
                    while nxt == 0xFF:
                        self.pos += 1
                        nxt = buf[self.pos]
                    if nxt == 0x00:
                        self.pos += 1
                    else:
                        self.marker = nxt
                        self.pos += 1
                        raise EOFError("marker in entropy data")
            self._acc = ((self._acc & ((1 << self._n) - 1)) << 8) | b
            self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill_to(1)
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._n < n:
            self._fill_to(n)
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def align_restart(self) -> int:
        """Consume an RSTn marker at a restart boundary; returns n."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # the marker may not have been hit yet — scan it
            while True:
                b = self.buf[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = self.buf[self.pos]
                    self.pos += 1
                    if nxt == 0x00:
                        continue
                    while nxt == 0xFF:  # fill-byte run (B.1.1.2)
                        nxt = self.buf[self.pos]
                        self.pos += 1
                    if nxt == 0x00:
                        continue
                    self.marker = nxt
                    break
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RSTn at restart boundary, got {m!r}")
        self.marker = None
        return m - 0xD0


def _huff_read(reader: _BitReader, table) -> int:
    # hot path: keep the accumulator in locals, one dict probe per bit
    acc, nn = reader._acc, reader._n
    get = table.get
    code = 0
    for ln in range(1, 17):
        if nn == 0:
            reader._acc, reader._n = acc, nn
            reader._fill_to(1)
            acc, nn = reader._acc, reader._n
        nn -= 1
        code = (code << 1) | ((acc >> nn) & 1)
        v = get((ln, code))
        if v is not None:
            reader._acc, reader._n = acc, nn
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit magnitude to signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size s, s-bit code) for DC/AC coefficient coding."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


# --------------------------------------------------------------- encode


def _encode_blocks(plane: np.ndarray, q: np.ndarray) -> list[np.ndarray]:
    """Level-shift, DCT and quantize every 8x8 block (row-major order)."""
    h, w = plane.shape
    q2 = q.reshape(8, 8).astype(np.float64)
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _C @ blk @ _C.T
            out.append(np.round(coef / q2).astype(np.int32))
    return out


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad to (h, w) — the standard encoder fill."""
    ph, pw = plane.shape
    if ph == h and pw == w:
        return plane
    out = np.empty((h, w), dtype=plane.dtype)
    out[:ph, :pw] = plane
    if pw < w:
        out[:ph, pw:] = plane[:, -1:]
    if ph < h:
        out[ph:, :] = out[ph - 1 : ph, :]
    return out


def encode_baseline_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    subsampling: str = "4:4:4",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an interleaved RGB raster as a baseline JFIF JPEG.

    ``subsampling``: ``"4:4:4"`` (one block of each component per MCU)
    or ``"4:2:0"`` (2x2 luma blocks per chroma block). ``grayscale``
    emits a single-component scan (subsampling ignored).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — exists chiefly so the decoder's restart path is testable.
    """
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql = _quality_scaled(QUANT_LUMA, quality)
    qc = _quality_scaled(QUANT_CHROMA, quality)

    if grayscale:
        comps = [("y", y, ql, 0, 1, 1)]
    elif subsampling == "4:4:4":
        comps = [("y", y, ql, 0, 1, 1), ("cb", cb, qc, 1, 1, 1), ("cr", cr, qc, 1, 1, 1)]
    elif subsampling == "4:2:0":
        # chroma planes average 2x2 neighborhoods (pad odd dims first)
        ph, pw = (height + 1) // 2 * 2, (width + 1) // 2 * 2
        cbp = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [("y", y, ql, 0, 2, 2), ("cb", cbp, qc, 1, 1, 1), ("cr", crp, qc, 1, 1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(c[4] for c in comps)
    vmax = max(c[5] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component quantized block grids, padded to the MCU lattice
    grids = []
    for _name, plane, q, _tq, hf, vf in comps:
        gh, gw = mcuy * vf * 8, mcux * hf * 8
        blocks = _encode_blocks(_pad_to(np.clip(plane, 0, 255), gh, gw), q)
        grids.append((blocks, gw // 8, hf, vf))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def write_block(wtr: _BitWriter, coef: np.ndarray, pred: int, dc, ac) -> int:
        zz = coef.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred
        s, bitsv = _magnitude(diff)
        code, ln = dc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(bitsv, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            s, bitsv = _magnitude(v)
            code, ln = ac[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(bitsv, s)
            run = 0
        if last_nz != 63:
            code, ln = ac[0x00]  # EOB
            wtr.write(code, ln)
        return int(zz[0])

    wtr = _BitWriter()
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.pad_to_byte()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (blocks, bw, hf, vf) in enumerate(grids):
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for dy in range(vf):
                    for dx in range(hf):
                        bi = (my * vf + dy) * bw + (mx * hf + dx)
                        preds[ci] = write_block(wtr, blocks[bi], preds[ci], dc, ac)
            mcu_count += 1
    wtr.pad_to_byte()

    # ----- marker segments
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if not grayscale:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for ci, (_n, _p, _q, tq, hf, vf) in enumerate(comps):
        sof += bytes([ci + 1, (hf << 4) | vf, tq])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if not grayscale:
        out += seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential (SOF0/SOF1) or progressive (SOF2)
    Huffman JPEG → (width, height, RGB bytes).

    Grayscale scans replicate Y into R=G=B. Raises ValueError on the
    remaining exotic processes (lossless, arithmetic, hierarchical) and
    on truncated/corrupt streams.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _parse_and_decode(payload)
    except (IndexError, struct.error) as exc:
        # truncated/header-only payloads must surface as ValueError so
        # callers (decode_media) can fall back to header-dims parsing
        raise ValueError(f"truncated or malformed JPEG: {exc}") from exc


#: historical name from when only SOF0/SOF1 decoded; kept for callers
decode_baseline_jpeg = decode_jpeg


def _parse_and_decode(payload: bytes) -> tuple[int, int, bytes]:
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    progressive = False
    prog: "_ProgressiveState | None" = None
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte preceding a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            if prog is not None:
                return prog.finish(qtabs)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tab = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    tab[ZIGZAG[i]] = body[b + 1 + i]
                qtabs[tq] = tab
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                htabs[(tc, th)] = _decode_table(bits, vals)
                b += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG process (lossless/arithmetic/hierarchical)"
                " — needs Pillow"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if not progressive:
                return _decode_scan(
                    payload, pos + seglen, frame, scan, qtabs, htabs,
                    restart_interval,
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            # T.81 G.1: DC scans are exactly Ss=Se=0; AC scans are a
            # 1..63 band over exactly one component. Anything else is a
            # corrupt or mislabeled stream (e.g. a baseline scan whose
            # SOF was rewritten to SOF2).
            if ss == 0 and se != 0:
                raise ValueError("invalid progressive spectral range")
            if ss > 0 and (se < ss or se > 63 or ns != 1):
                raise ValueError("invalid progressive AC scan header")
            pos = prog.decode_scan(
                payload, pos + seglen, scan, ss, se, a >> 4, a & 0x0F,
                htabs, restart_interval,
            )
            continue
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(buf, pos, frame, scan, qtabs, htabs, restart_interval):
    w, h, comps = frame
    if len(scan) < len(comps):
        # Non-interleaved multi-scan sequential JPEG (Ns < Nf): this
        # path decodes exactly one scan, so rendering just the first
        # (e.g. Y-only) would silently return a grayscale image for a
        # 3-component file. Raise instead — decode_media falls back to
        # Pillow / header-dims parsing (same policy as the unsupported
        # processes above).
        raise ValueError(
            "non-interleaved multi-scan sequential JPEG — needs Pillow"
        )
    byid = {cid: (hf, vf, tq) for cid, hf, vf, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    single = len(scan) == 1
    if single:
        # T.81 A.2.2: a single-component scan has one data unit per MCU
        # and walks the component's own row-major block grid — the
        # interleaved MCU lattice (dy/dx sub-loops over hf x vf) would
        # misorder blocks whenever hf or vf > 1.
        mcux = (w + 7) // 8
        mcuy = (h + 7) // 8
    else:
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    meta = []  # (hf, vf, q, dc_table, ac_table, plane)
    for cs, td, ta in scan:
        hf, vf, tq = byid[cs]
        if single:
            hf = vf = 1
        plane = np.zeros((mcuy * vf * 8, mcux * hf * 8), dtype=np.float64)
        q = qtabs[tq].reshape(8, 8).astype(np.float64)
        meta.append((hf, vf, q, htabs[(0, td)], htabs[(1, ta)], plane))
        planes.append(plane)

    reader = _BitReader(buf, pos)
    preds = [0] * len(meta)
    mcu_count = 0
    zz = np.zeros(64, dtype=np.float64)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(meta)
            for ci, (hf, vf, q, dct, act, plane) in enumerate(meta):
                for dy in range(vf):
                    for dx in range(hf):
                        zz[:] = 0.0
                        s = _huff_read(reader, dct)
                        diff = _extend(reader.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        blk = _C.T @ (coef.reshape(8, 8) * q) @ _C + 128.0
                        by, bx = (my * vf + dy) * 8, (mx * hf + dx) * 8
                        plane[by : by + 8, bx : bx + 8] = blk
            mcu_count += 1

    # upsample to full resolution and crop (a single-component scan's
    # plane is already the component's own full-resolution grid)
    full = []
    for hf, vf, _q, _d, _a, plane in meta:
        if not single and (hf != hmax or vf != vmax):
            plane = np.repeat(np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1)
        full.append(plane[:h, :w])
    return _planes_to_rgb(full, w, h)


def _planes_to_rgb(full: list, w: int, h: int) -> tuple[int, int, bytes]:
    """Upsampled full-resolution planes → (w, h, RGB bytes); one plane
    means grayscale (Y replicated), three means JFIF YCbCr."""
    if len(full) == 1:
        yp = np.clip(full[0], 0, 255)
        gray = np.round(yp).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return w, h, rgb.tobytes()
    yp, cbp, crp = full
    cbp = cbp - 128.0
    crp = crp - 128.0
    r = yp + 1.402 * crp
    g = yp - 0.344136 * cbp - 0.714136 * crp
    b = yp + 1.772 * cbp
    rgb = np.stack(
        [np.round(np.clip(c, 0, 255)).astype(np.uint8) for c in (r, g, b)], axis=2
    )
    return w, h, rgb.tobytes()


class _ProgressiveState:
    """Coefficient accumulator for progressive (SOF2) scans.

    Each component keeps an MCU-padded grid of 64-coefficient blocks in
    ZIGZAG index space; successive SOS scans fill spectral bands
    (Ss..Se) at successive-approximation precision (Ah/Al) per ITU T.81
    G.2; ``finish`` dequantizes, IDCTs, upsamples and color-converts.
    """

    def __init__(self, frame) -> None:
        w, h, comps = frame
        self.w, self.h, self.comps = w, h, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef: dict[int, np.ndarray] = {}
        self.eobrun = 0
        for cid, hf, vf, _tq in comps:
            self.coef[cid] = np.zeros(
                (self.mcuy * vf, self.mcux * hf, 64), dtype=np.int64
            )

    # -- per-block band decoders (T.81 G.1.2 / libjpeg shapes) ----------

    def _dc_first(self, reader, blk, dct, preds, ci, al) -> None:
        s = _huff_read(reader, dct)
        diff = _extend(reader.bits(s), s) if s else 0
        preds[ci] += diff
        blk[0] = preds[ci] << al

    @staticmethod
    def _dc_refine(reader, blk, al) -> None:
        if reader.bit():
            blk[0] |= 1 << al

    def _ac_first(self, reader, blk, act, ss, se, al) -> None:
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_read(reader, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += reader.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1

    def _ac_refine(self, reader, blk, act, ss, se, al) -> None:
        p1, m1 = 1 << al, -1 << al

        def correct(k) -> None:
            if reader.bit() and not (blk[k] & p1):
                blk[k] += p1 if blk[k] > 0 else m1

        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _huff_read(reader, act)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += reader.bits(r)
                        break
                else:
                    if s != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if reader.bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            self.eobrun -= 1

    # -- scan walker ----------------------------------------------------

    def decode_scan(
        self, buf, pos, scan, ss, se, ah, al, htabs, restart_interval
    ) -> int:
        """Decode one SOS's entropy data; returns the buffer position of
        the next marker (the main segment loop resumes there)."""
        byid = {cid: (hf, vf) for cid, hf, vf, _tq in self.comps}
        reader = _BitReader(buf, pos)
        preds = [0] * len(scan)
        self.eobrun = 0
        is_dc = ss == 0

        def units():
            """Yield per-restart-unit lists of (ci, block, dc_table, ac_table)."""
            if len(scan) > 1:
                # interleaved (Ns > 1): MCU walk with sampling factors
                for my in range(self.mcuy):
                    for mx in range(self.mcux):
                        group = []
                        for ci, (cs, td, ta) in enumerate(scan):
                            hf, vf = byid[cs]
                            for dy in range(vf):
                                for dx in range(hf):
                                    group.append(
                                        (
                                            ci,
                                            self.coef[cs][
                                                my * vf + dy, mx * hf + dx
                                            ],
                                            htabs.get((0, td)),
                                            htabs.get((1, ta)),
                                        )
                                    )
                        yield group
            else:
                # non-interleaved: the component's own ceil(dim/8) grid
                cs, td, ta = scan[0]
                hf, vf = byid[cs]
                cw = (self.w * hf + 8 * self.hmax - 1) // (8 * self.hmax)
                ch = (self.h * vf + 8 * self.vmax - 1) // (8 * self.vmax)
                for by in range(ch):
                    for bx in range(cw):
                        yield [
                            (
                                0,
                                self.coef[cs][by, bx],
                                htabs.get((0, td)),
                                htabs.get((1, ta)),
                            )
                        ]

        count = 0
        for group in units():
            if restart_interval and count and count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(scan)
                self.eobrun = 0
            for ci, blk, dct, act in group:
                if is_dc:
                    if ah == 0:
                        self._dc_first(reader, blk, dct, preds, ci, al)
                    else:
                        self._dc_refine(reader, blk, al)
                else:
                    if ah == 0:
                        self._ac_first(reader, blk, act, ss, se, al)
                    else:
                        self._ac_refine(reader, blk, act, ss, se, al)
            count += 1
        # find the next marker for the caller's segment loop
        if reader.marker is not None:
            return reader.pos - 2
        p = reader.pos
        while p < len(buf) - 1:
            if buf[p] == 0xFF and buf[p + 1] != 0x00:
                return p
            p += 1
        return len(buf)

    # -- finalize ---------------------------------------------------------

    def finish(self, qtabs) -> tuple[int, int, bytes]:
        full = []
        for cid, hf, vf, tq in self.comps:
            q = np.zeros(64, dtype=np.float64)
            qt = qtabs[tq]
            for k in range(64):
                q[k] = qt[ZIGZAG[k]]  # quant value for zigzag index k
            grid = self.coef[cid].astype(np.float64) * q
            bh, bw, _ = grid.shape
            nat = np.zeros((bh, bw, 64), dtype=np.float64)
            nat[..., ZIGZAG] = grid  # zigzag index -> natural position
            blocks = np.einsum(
                "ij,xyjk,kl->xyil", _C.T, nat.reshape(bh, bw, 8, 8), _C
            ) + 128.0
            plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            if hf != self.hmax or vf != self.vmax:
                plane = np.repeat(
                    np.repeat(plane, self.vmax // vf, axis=0),
                    self.hmax // hf,
                    axis=1,
                )
            full.append(plane[: self.h, : self.w])
        return _planes_to_rgb(full, self.w, self.h)
