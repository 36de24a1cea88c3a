"""Baseline JFIF (JPEG) encoder + decoder in pure numpy — the codec
behind the MJPEG-AVI path (``multimodal.encode_avi_mjpeg`` /
``decode_avi``).

Scope: baseline sequential DCT (SOF0), single interleaved scan, 8-bit
samples, no chroma subsampling (4:4:4) or grayscale, no restart
markers. Everything is implemented from the public JPEG/JFIF layout:
SOI / APP0 / DQT / SOF0 / DHT / SOS / EOI markers, level shift, BT.601
RGB↔YCbCr, 8×8 forward/inverse DCT (orthonormal matrix form), zigzag,
uniform quantization, DC difference coding, run-length AC coding with
EOB/ZRL, canonical Huffman codes with 0xFF byte stuffing.

Huffman tables: rather than transcribing the (optional) Annex K example
tables, the encoder emits its own canonical tables — 4-bit codes for
the 12 DC categories, 9-bit codes for all 256 AC symbols — in DHT
segments. That is fully spec-valid (tables always travel in the
stream), and the decoder builds its tables FROM the DHT segments, so it
decodes any baseline 4:4:4/grayscale JPEG, not just its sibling's.

Losslessness contract used by the driver gate (the closed-form-oracle
pattern of the uncompressed-AVI gate): with unit quantization tables,
frames that are (a) gray (R=G=B, so the color transform round-trips
exactly: Y rounds to the gray value, Cb=Cr round to 128) and (b)
constant within each 8×8 block with dimensions that are multiples of 8
(so every DCT is DC-only and the DC value 8·(v−128) is integral) decode
back BIT-EXACTLY. Generic content is covered by pytest with the
quantization-error bound instead. Reference parity note: the reference
engine has no video codecs at all (SURVEY §2.8 marks multimodal as
graft-added scope); this module exists for the LLM-pipeline operators.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# DCT basis (orthonormal): B = D @ block @ D.T, block = D.T @ B @ D
# ---------------------------------------------------------------------------

def _dct_matrix() -> np.ndarray:
    d = np.empty((8, 8), dtype=np.float64)
    for k in range(8):
        c = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            d[k, n] = c * math.cos((2 * n + 1) * k * math.pi / 16.0)
    return d


_D = _dct_matrix()

#: zigzag order: zigzag_index -> (row, col) flattened position
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

#: unit quantization table (max fidelity; any 1..255 table is valid)
UNIT_QUANT = np.ones(64, dtype=np.int64)


# ---------------------------------------------------------------------------
# canonical Huffman tables (spec-valid custom tables, carried in DHT)
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code procedure
    (Annex C): codes of ascending length, incrementing within a length,
    doubling at each length step."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: DC: 12 categories (0..11), 4 bits each → 12 of 16 slots used
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
#: AC: all 256 (run<<4 | size) symbols — 255 at 9 bits + 1 at 10 bits
#: (a DHT length count is one byte, so 256-at-one-length is not
#: representable; Kraft: 255/512 + 1/1024 < 1)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_VALUES = list(range(256))

_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALUES)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy segment truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("unexpected marker inside entropy segment")
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC diff / AC coefficient —
    negative values use the one's-complement convention (F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(v: int, size: int) -> int:
    """Inverse of ``_magnitude``'s extra-bits convention (F.2.2.1)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks, 8, 8), row-major block order; pads by edge
    replication to multiples of 8."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF BT.601 full-range, rounded to uint8-range ints."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.int64)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 128.0
    cr = ycc[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], values: list[int]) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(values)


def encode_jpeg(img: np.ndarray, quant: np.ndarray = UNIT_QUANT) -> bytes:
    """Baseline JFIF encode of (h, w, 3) uint8 RGB or (h, w) uint8
    grayscale. ``quant`` is one zigzag-order table used for every
    component (unit table by default)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError(f"encode_jpeg needs (h,w[,3]) uint8, got {img.dtype} {img.shape}")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError(f"JPEG dims out of range: {w}x{h}")
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    if quant.min() < 1 or quant.max() > 255:
        raise ValueError("quant table entries must be in 1..255")

    if gray:
        planes = [img.astype(np.int64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[:, :, c] for c in range(3)]

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(q) for q in quant))  # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0
    out += _seg(0xC0, sof)  # SOF0
    out += _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALUES))  # DC table 0
    out += _seg(0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALUES))  # AC table 0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])  # full spectral selection, no approximation
    out += _seg(0xDA, sos)

    # entropy-coded segment: interleaved MCUs = one block per component
    # (4:4:4), block row-major
    qblocks = []
    for plane in planes:
        blocks = _to_blocks(plane).astype(np.float64) - 128.0
        coefs = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qb = np.round(coefs.reshape(-1, 64)[:, _ZIGZAG] / quant[None, :]).astype(np.int64)
        qblocks.append(qb)

    bw = _BitWriter()
    pred = [0] * ncomp
    for b in range(qblocks[0].shape[0]):
        for c in range(ncomp):
            zz = qblocks[c][b]
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            size, extra = _magnitude(diff)
            code, length = _DC_CODES[size]
            bw.put(code, length)
            if size:
                bw.put(extra, size)
            run = 0
            last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _AC_CODES[0xF0]  # ZRL
                    bw.put(code, length)
                    run -= 16
                size, extra = _magnitude(v)
                if size > 10:
                    raise ValueError("AC coefficient magnitude exceeds baseline range")
                code, length = _AC_CODES[(run << 4) | size]
                bw.put(code, length)
                bw.put(extra, size)
                run = 0
            if last_nz < 63:
                code, length = _AC_CODES[0x00]  # EOB
                bw.put(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    codes = _canonical_codes(bits, values)
    return {(length, code): sym for sym, (code, length) in codes.items()}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (or grayscale) JFIF payload → (h, w, 3)
    uint8 RGB (grayscale replicated to 3 channels). Tables come from
    the stream's DQT/DHT segments."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            # EOI before any SOS: there is no scan to decode — raising
            # here (instead of break) keeps a truncated stream from
            # silently decoding to a solid-gray frame (review r5)
            raise ValueError("JPEG scan not found (EOI before SOS)")
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (baseline)")
                quants[tq] = np.frombuffer(body, dtype=np.uint8, count=64, offset=off + 1).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nval = sum(bits)
                values = list(body[off + 17 : off + 17 + nval])
                huff[(tc, th)] = _build_decode_table(bits, values)
                off += 17 + nval
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            for i in range(nc):
                cid, sampling, tq = body[6 + 3 * i : 9 + 3 * i]
                if sampling != 0x11:
                    raise ValueError("only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for i in range(ns):
                cid, tables = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(k for k, (c, _) in enumerate(comps) if c == cid)
                scan.append((idx, tables >> 4, tables & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    else:
        raise ValueError("JPEG scan not found")
    if not comps or h == 0 or w == 0:
        raise ValueError("JPEG missing SOF0 header")

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    nblocks = bh * bw_
    ncomp = len(comps)
    coefs = np.zeros((ncomp, nblocks, 64), dtype=np.int64)
    reader = _BitReader(payload, pos)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    pred = [0] * ncomp
    for b in range(nblocks):
        for ci, dc_t, ac_t in scan:
            dc_table = huff.get((0, dc_t))
            ac_table = huff.get((1, ac_t))
            if dc_table is None or ac_table is None:
                raise ValueError("JPEG scan references undefined Huffman table")
            size = read_symbol(dc_table)
            diff = _extend(reader.bits(size), size)
            pred[ci] += diff
            coefs[ci, b, 0] = pred[ci]
            k = 1
            while k <= 63:
                sym = read_symbol(ac_table)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                coefs[ci, b, k] = _extend(reader.bits(size), size)
                k += 1

    planes = []
    for ci, (cid, tq) in enumerate(comps):
        if tq not in quants:
            raise ValueError("JPEG component references undefined quant table")
        deq = (coefs[ci] * quants[tq][None, :]).astype(np.float64)
        blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        plane = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        planes.append(plane[:h, :w])
    if ncomp == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    ycc = np.clip(np.round(np.stack(planes, axis=2)), 0, 255).astype(np.int64)
    return _ycbcr_to_rgb(ycc)
