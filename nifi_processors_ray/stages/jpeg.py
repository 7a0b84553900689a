"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

The container ships no codec libraries, but real training corpora are
JPEG — so the decode path is REAL: marker parse, canonical-Huffman
entropy decode, dequantize, dezigzag, vectorized 8x8 IDCT (orthonormal
DCT matrix, einsum over all blocks), chroma upsampling and JFIF
YCbCr->RGB. The encoder (used to synthesize deterministic test payloads)
emits baseline sequential 8-bit JFIF with the Annex-K quantization and
Huffman tables at 4:4:4 or 4:2:0 sampling.

Supported subset (loud ValueError otherwise): baseline DCT (SOF0), 8-bit,
1 or 3 components, sampling factors <= 2, optional restart markers.
Progressive (SOF2) and arithmetic coding are rejected, not mis-decoded.

Scale note: per-image Huffman decoding is a Python loop over symbols —
the right wiring is small batches through an actor pool
(``ImageFeatureStage`` pattern); block-level math is fully vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables (public, ITU-T T.81) ------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal 8x8 DCT-II matrix: forward F = D @ B @ D.T, inverse D.T @ F @ D
_D = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
    _D[_k] = _c * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex-K table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits, vals):
    """(length, code) per symbol from the DHT BITS/HUFFVAL lists."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (ln, code)
            i += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(length, code) -> symbol map for the bit-at-a-time decoder."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (ln, code) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    px = img.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255
                   ).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded-to-8 plane -> (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Level-shift, vectorized DCT, quantize: (by, bx, 8, 8) int coeffs."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
    q = coef / quant.astype(np.float64)
    return np.round(q).astype(np.int64)


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) -> baseline JFIF bytes."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB or (H, W) gray")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img)
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if subsampling == "444":
        hy = vy = 1
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        hy = vy = 2
        ypad = _pad_edge(ycc[..., 0], 2, 2)
        # 2x2 mean chroma downsample on the padded plane
        cb = ycc[..., 1]
        cr = ycc[..., 2]
        cbp, crp = _pad_edge(cb, 2, 2), _pad_edge(cr, 2, 2)
        cbd = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
                          ).mean(axis=(1, 3))
        crd = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
                          ).mean(axis=(1, 3))
        planes = [ypad, cbd, crd]

    mcu_h, mcu_w = 8 * vy, 8 * hy
    coefs = []
    for ci, plane in enumerate(planes):
        mult = (mcu_h, mcu_w) if ci == 0 else (8, 8)
        padded = _pad_edge(plane, *mult)
        coefs.append(_encode_plane_blocks(padded,
                                          ql if ci == 0 else qc))

    enc_dc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(block: np.ndarray, ci: int):
        tbl = 0 if ci == 0 else 1
        zz = block.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat, bits = _magnitude(diff)
        ln, code = enc_dc[tbl][cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        nz = np.flatnonzero(zz[1:])
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                ln, code = enc_ac[tbl][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            cat, bits = _magnitude(int(zz[1 + idx]))
            ln, code = enc_ac[tbl][(run << 4) | cat]
            bw.write(code, ln)
            bw.write(bits, cat)
            pos = int(idx) + 1
        if pos < 63:
            ln, code = enc_ac[tbl][0x00]  # EOB
            bw.write(code, ln)

    mcus_y = coefs[0].shape[0] // vy
    mcus_x = coefs[0].shape[1] // hy
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):
                for bx in range(hy):
                    put_block(coefs[0][my * vy + by, mx * hy + bx], 0)
            put_block(coefs[1][my, mx], 1)
            put_block(coefs[2][my, mx], 2)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql.reshape(64)[ZIGZAG].tolist()))
    out += seg(0xFFDB, bytes([1]) + bytes(qc.reshape(64)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hy << 4) | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xFFC0, sof)
    for tc, th, bits, vals in (
            (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        out += seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy segment")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed a padding byte, don't consume the marker
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1

    def decode_symbol(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB ((H, W) stays 3-chan
    via gray replication)."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    dri = 0
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (marker cut short)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(body[i:i + 128],
                                         dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64],
                                         dtype=np.uint8).astype(np.int64)
                    i += 64
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                quant[tq] = nat.reshape(8, 8)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (marker 0xFF{marker:02X});"
                " only baseline sequential (SOF0) is implemented")
        elif marker == 0xC0:  # SOF0
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hf, vf = hv >> 4, hv & 0xF
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError("sampling factors > 2 unsupported")
                comps.append({"id": cid, "h": hf, "v": vf, "tq": tq})
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tda = body[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append((comp, tda >> 4, tda & 0xF))
            pos += ln
            break
        pos += ln
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["coef"] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8),
                             dtype=np.float64)

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                br.byte_align()
                # consume RSTn
                p = br.pos
                if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                    br.pos = p + 2
                    br.acc = br.nbits = 0
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan_comps:
                dct, act = huff[(0, td)], huff[(1, ta)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = br.decode_symbol(dct)
                        diff = _extend(br.read_bits(s), s)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        comp["coef"][my * comp["v"] + by,
                                     mx * comp["h"] + bx] = zz[_UNZIGZAG
                                                               ].reshape(8, 8)
            mcu_index += 1

    planes = []
    for c in comps:
        q = quant[c["tq"]].astype(np.float64)
        blocks = c["coef"] * q
        px = np.einsum("ji,abjk,kl->abil", _D, blocks, _D) + 128.0
        by, bx = px.shape[:2]
        plane = px.swapaxes(1, 2).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
