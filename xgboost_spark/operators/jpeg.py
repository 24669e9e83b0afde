"""JPEG (JFIF) codec in pure NumPy — no external libraries.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2) —
spectral selection, successive approximation (DC and AC refinement
scans, EOB runs), 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling, restart markers; arithmetic coding raises cleanly.  Both
directions are real: DCT via the orthonormal DCT-II matrix, canonical
Huffman coding, byte stuffing, chroma up/down-sampling; the
progressive encoder uses the conventional 10-scan script (DC first +
refinement, spectral bands, two AC approximation passes) so the
decoder's refinement paths are exercised by honest in-repo vectors.
All per ITU-T T.81 (public spec): F.2 sequential decode, G.1/G.2
progressive code/decode flowcharts.

This is the last of the common image formats — with PPM/BMP/PNG/GIF in
`multimodal.py`, every mainstream still-image format decodes in-repo.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K Huffman specs: (bits[1..16] counts, values)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_C = None  # orthonormal DCT-II matrix, built lazily


def _dct_matrix() -> np.ndarray:
    global _C
    if _C is None:
        k = np.arange(8)[:, None]
        n = np.arange(8)[None, :]
        m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
        m[0] /= np.sqrt(2)
        _C = m
    return _C


def _canonical_codes(bits, values):
    """(length-counts, symbols) -> {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """-> {(length, code): symbol} for the bit-walking decoder."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)          # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)    # pad with 1s


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.d):
            byte = self.d[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 1              # stuffed byte
                else:
                    # marker (e.g. RST/EOI): stop feeding; caller resyncs
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                return 0                       # past-the-end padding
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def resync_restart(self) -> bool:
        """Skip to just after an RSTn marker.  True when one was found."""
        self.acc = 0
        self.n = 0
        d, i = self.d, self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return True
            i += 1
        return False


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = int(a).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """HxW (gray) or HxWx3 RGB uint8 -> baseline JFIF bytes.
    ``subsample``: True -> 4:2:0, False -> 4:4:4, "422" -> 4:2:2;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real camera files use)."""
    coefs, samp, (qt_l, qt_c), h, w, gray = _quantized_coefs(
        img, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)

    dc_l = _canonical_codes(*_HUFF_DC_LUM)
    ac_l = _canonical_codes(*_HUFF_AC_LUM)
    dc_c = _canonical_codes(*_HUFF_DC_CHROM)
    ac_c = _canonical_codes(*_HUFF_AC_CHROM)
    huffs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(coefs) - 1)

    bw = _BitWriter()
    pred = [0] * len(coefs)
    mcu_n = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * len(coefs)
            mcu_n += 1
            for ci, ((sh, sv), (dct_t, act)) in enumerate(zip(samp, huffs)):
                for by in range(sv):
                    for bx in range(sh):
                        qd = coefs[ci][my * sv + by, mx * sh + bx]
                        diff = int(qd[0]) - pred[ci]
                        pred[ci] = int(qd[0])
                        t, bits = _magnitude(diff)
                        code, ln = dct_t[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
                        run = 0
                        for k in range(1, 64):
                            v = int(qd[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            t, bits = _magnitude(v)
                            code, ln = act[(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits, t)
                            run = 0
                        if run:
                            code, ln = act[0x00]      # EOB
                            bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")     # APP0 (density 1x1)
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt.reshape(-1)[_ZZ])
    nf = len(coefs)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci, (sh, sv) in enumerate(samp):
        out += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    for tc, th, (bits, vals) in ((0, 0, _HUFF_DC_LUM), (1, 0, _HUFF_AC_LUM),
                                 (0, 1, _HUFF_DC_CHROM), (1, 1, _HUFF_AC_CHROM)):
        if gray and th == 1:
            continue
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        td = 0 if ci == 0 else 1
        out += struct.pack("BB", ci + 1, (td << 4) | td)
    out += b"\x00\x3F\x00"
    out += bw.buf
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


def _quantized_coefs(img: np.ndarray, quality: int, subsample):
    """Shared front half of both encoders: color transform, subsample,
    pad to the MCU grid, DCT + quantize.  Returns (coefs, samp, qts,
    h, w, gray) with coefs[ci] shaped (blocks_y, blocks_x, 64) in
    ZIGZAG order."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt_l = np.clip((_QT_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    qt_c = np.clip((_QT_CHROM * scale + 50) // 100, 1, 255).astype(np.int32)
    C = _dct_matrix()
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128

        def ds(p, fy, fx):
            ph = (p.shape[0] + fy - 1) // fy * fy
            pw = (p.shape[1] + fx - 1) // fx * fx
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                        mode="edge")
            return pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        if subsample == "422":
            planes = [y - 128.0, ds(cb, 1, 2) - 128.0, ds(cr, 1, 2) - 128.0]
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            planes = [y - 128.0, ds(cb, 2, 2) - 128.0, ds(cr, 2, 2) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    for p, (sh, sv), qt in zip(planes, samp, qts):
        ph, pw = mcy * 8 * sv, mcx * 8 * sh
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        grid = np.zeros((mcy * sv, mcx * sh, 64), np.int32)
        for by in range(mcy * sv):
            for bx in range(mcx * sh):
                blk = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = C @ blk @ C.T
                grid[by, bx] = np.round(coef / qt).astype(np.int32) \
                                 .reshape(-1)[_ZZ]
        coefs.append(grid)
    return coefs, samp, (qt_l, qt_c), h, w, gray


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = True) -> bytes:
    """HxW (gray) or HxWx3 RGB uint8 -> PROGRESSIVE (SOF2) JFIF bytes.

    Scan script (conventional shape, exercising every progressive
    decode path): interleaved DC first at Al=1, per-component AC first
    scans 1..63 at Al=1 (spectral selection), then DC refinement and
    per-component AC refinement scans to Al=0 (successive
    approximation with correction bits).  EOB runs are emitted as EOB0
    per block, which keeps the Annex K Huffman tables sufficient
    (EOBn>0 symbols are absent from them)."""
    coefs, samp, (qt_l, qt_c), h, w, gray = _quantized_coefs(
        img, quality, subsample)
    nf = len(coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcy, mcx = coefs[0].shape[0] // samp[0][1], coefs[0].shape[1] // samp[0][0]
    dc_tabs = [_canonical_codes(*_HUFF_DC_LUM)] + \
              [_canonical_codes(*_HUFF_DC_CHROM)] * (nf - 1)
    ac_tabs = [_canonical_codes(*_HUFF_AC_LUM)] + \
              [_canonical_codes(*_HUFF_AC_CHROM)] * (nf - 1)

    def comp_blocks(ci):
        """Non-interleaved block grid (T.81 A.2.2)."""
        sh, sv = samp[ci]
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def dc_first_scan(al):
        bw = _BitWriter()
        pred = [0] * nf
        for my in range(mcy):
            for mx in range(mcx):
                for ci in range(nf):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> al
                            diff = v - pred[ci]
                            pred[ci] = v
                            t, bits = _magnitude(diff)
                            code, ln = dc_tabs[ci][t]
                            bw.write(code, ln)
                            if t:
                                bw.write(bits, t)
        bw.flush()
        return bw.buf

    def dc_refine_scan(al):
        bw = _BitWriter()
        for my in range(mcy):
            for mx in range(mcx):
                for ci in range(nf):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            bw.write((v >> al) & 1, 1)
        bw.flush()
        return bw.buf

    def ac_first_scan(ci, ss, se, al):
        bw = _BitWriter()
        act = ac_tabs[ci]
        sh_b, sw_b = comp_blocks(ci)
        for by in range(sh_b):
            for bx in range(sw_b):
                zz = coefs[ci][by, bx]
                run = 0
                for k in range(ss, se + 1):
                    c = int(zz[k])
                    v = abs(c) >> al
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    if c < 0:
                        v = -v
                    t, bits = _magnitude(v)
                    code, ln = act[(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if run:
                    code, ln = act[0x00]          # EOB0 per block
                    bw.write(code, ln)
        bw.flush()
        return bw.buf

    def ac_refine_scan(ci, ss, se, al):
        # T.81 G.1.2.3 encoder: runs count zero-history positions,
        # correction bits for already-significant coefficients are
        # buffered and flushed after the next symbol
        bw = _BitWriter()
        act = ac_tabs[ci]
        sh_b, sw_b = comp_blocks(ci)
        for by in range(sh_b):
            for bx in range(sw_b):
                zz = coefs[ci][by, bx]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob = -1
                for idx, v in enumerate(absv):
                    if v == 1:
                        eob = idx
                run = 0
                br_bits: list[int] = []
                for idx, v in enumerate(absv):
                    if v == 0:
                        run += 1
                        continue
                    while run > 15 and idx <= eob:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                        for bbit in br_bits:
                            bw.write(bbit, 1)
                        br_bits = []
                    if v > 1:
                        br_bits.append(v & 1)
                        continue
                    code, ln = act[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(0 if int(zz[ss + idx]) < 0 else 1, 1)
                    for bbit in br_bits:
                        bw.write(bbit, 1)
                    br_bits = []
                    run = 0
                if run or br_bits:
                    code, ln = act[0x00]          # EOB0 + its buffered bits
                    bw.write(code, ln)
                    for bbit in br_bits:
                        bw.write(bbit, 1)
        bw.flush()
        return bw.buf

    out = bytearray(b"\xFF\xD8")
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt.reshape(-1)[_ZZ])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci, (sh, sv) in enumerate(samp):
        out += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    for tc, th, (bits, vals) in ((0, 0, _HUFF_DC_LUM), (1, 0, _HUFF_AC_LUM),
                                 (0, 1, _HUFF_DC_CHROM), (1, 1, _HUFF_AC_CHROM)):
        if gray and th == 1:
            continue
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th) \
            + bytes(bits) + bytes(vals)

    def sos(comp_list, ss, se, ah, al, data):
        hdr = bytearray(b"\xFF\xDA")
        hdr += struct.pack(">HB", 6 + 2 * len(comp_list), len(comp_list))
        for ci in comp_list:
            td = 0 if ci == 0 else 1
            hdr += struct.pack("BB", ci + 1, (td << 4) | td)
        hdr += struct.pack("BBB", ss, se, (ah << 4) | al)
        return bytes(hdr) + data

    out += sos(list(range(nf)), 0, 0, 0, 1, dc_first_scan(1))
    for ci in range(nf):
        out += sos([ci], 1, 63, 0, 1, ac_first_scan(ci, 1, 63, 1))
    out += sos(list(range(nf)), 0, 0, 1, 0, dc_refine_scan(0))
    for ci in range(nf):
        out += sos([ci], 1, 63, 1, 0, ac_refine_scan(ci, 1, 63, 0))
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _next_marker(b: bytes, j: int) -> int:
    """First non-RST, non-stuffed marker position at or after j."""
    while j + 1 < len(b):
        if b[j] == 0xFF:
            n = b[j + 1]
            if n == 0x00 or 0xD0 <= n <= 0xD7:
                j += 2
                continue
            if n == 0xFF:
                j += 1
                continue
            return j
        j += 1
    return len(b)


def _decode_scan(br: _BitReader, comps, coefs, huff, restart,
                 scan_comps, ss, se, ah, al, geom, progressive):
    """Decode one scan's entropy data into the coefficient store.

    Sequential: ss=0,se=63,ah=al=0.  Progressive DC scans (ss=0) may be
    interleaved; AC scans (ss>=1) are single-component with EOB runs
    and, at ah>0, the T.81 G.1.2.3 refinement algorithm.
    """
    mcx, mcy, hmax, vmax, w, h = geom
    pred = [0] * len(comps)
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al

    def dc_block(ci, zz, td):
        nonlocal pred
        if ah == 0:
            t = br.decode_huff(huff[(0, td)])
            diff = _extend(br.receive(t), t)
            pred[ci] += diff
            zz[0] = pred[ci] << al
        else:
            if br.read_bit():
                zz[0] |= p1

    def ac_first(zz, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_huff(huff[(1, ta)])
            r, t = rs >> 4, rs & 15
            if t == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    break
                k += 16
                continue
            k += r
            if k > se:
                break
            zz[k] = _extend(br.receive(t), t) << al
            k += 1

    def ac_refine(zz, ta):
        # T.81 G.1.2.3: correction bit per already-nonzero coefficient,
        # runs count only zero-history positions
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode_huff(huff[(1, ta)])
                r, t = rs >> 4, rs & 15
                newval = 0
                if t == 0:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += br.receive(r)
                        break          # this block finishes in EOB phase
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    newval = p1 if br.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        if br.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if t and k <= se:
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    def seq_block(ci, zz, td, ta):
        dc_block(ci, zz, td)
        k = 1
        while k < 64:
            rs = br.decode_huff(huff[(1, ta)])
            r, t = rs >> 4, rs & 15
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += r
            if k > 63:
                break
            zz[k] = _extend(br.receive(t), t)
            k += 1

    def do_block(ci, by, bx, td, ta):
        zz = coefs[ci][by, bx]
        if not progressive:
            seq_block(ci, zz, td, ta)
        elif ss == 0:
            dc_block(ci, zz, td)
        elif ah == 0:
            ac_first(zz, ta)
        else:
            ac_refine(zz, ta)

    mcu_count = 0
    if len(scan_comps) > 1:
        for my in range(mcy):
            for mx in range(mcx):
                if restart and mcu_count and mcu_count % restart == 0:
                    br.resync_restart()
                    pred = [0] * len(comps)
                    eobrun = 0
                mcu_count += 1
                for ci, td, ta in scan_comps:
                    comp = comps[ci]
                    for byy in range(comp["v"]):
                        for bxx in range(comp["h"]):
                            do_block(ci, my * comp["v"] + byy,
                                     mx * comp["h"] + bxx, td, ta)
    else:
        ci, td, ta = scan_comps[0]
        comp = comps[ci]
        # non-interleaved geometry (T.81 A.2.2): the component's OWN
        # block grid, ceil of its downsampled dimensions
        cw = (w * comp["h"] + hmax - 1) // hmax
        ch = (h * comp["v"] + vmax - 1) // vmax
        sw = (cw + 7) // 8
        sh = (ch + 7) // 8
        for by in range(sh):
            for bx in range(sw):
                if restart and mcu_count and mcu_count % restart == 0:
                    br.resync_restart()
                    pred = [0] * len(comps)
                    eobrun = 0
                mcu_count += 1
                do_block(ci, by, bx, td, ta)


def decode_jpeg(b: bytes) -> np.ndarray:
    """JFIF bytes (baseline SOF0/1 or progressive SOF2) -> HxWx3 uint8
    RGB (gray replicates).  Multi-scan: coefficients accumulate across
    scans; dequantize + IDCT happen once at the end."""
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    i = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart = 0
    progressive = False
    coefs = None
    geom = None
    saw_scan = False
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        m = b[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        if i + 4 > len(b):
            break
        ln = struct.unpack_from(">H", b, i + 2)[0]
        seg = b[i + 4:i + 2 + ln]
        if m == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int32)
                tbl[_ZZ] = np.frombuffer(seg, np.uint8, 64, j + 1)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                j += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):
            progressive = (m == 0xC2)
            _prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nf):
                cid, sf, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 15, "tq": tq})
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/lossless/arithmetic JPEG unsupported")
        elif m == 0xDD:
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF")
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcx = (w + 8 * hmax - 1) // (8 * hmax)
                mcy = (h + 8 * vmax - 1) // (8 * vmax)
                geom = (mcx, mcy, hmax, vmax, w, h)
                coefs = [np.zeros((mcy * c["v"], mcx * c["h"], 64), np.int32)
                         for c in comps]
            ns = seg[0]
            by_id = {c["id"]: k for k, c in enumerate(comps)}
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((by_id[cs], tt >> 4, tt & 15))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            data_start = i + 2 + ln
            br = _BitReader(b[data_start:])
            _decode_scan(br, comps, coefs, huff, restart, scan_comps,
                         ss, se, a >> 4, a & 15, geom, progressive)
            saw_scan = True
            i = _next_marker(b, data_start)
            continue
        i += 2 + ln
    if comps is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

    mcx, mcy, hmax, vmax, _, _ = geom
    C = _dct_matrix()
    planes = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]].reshape(-1)[_ZZ]
        bh, bw = coefs[ci].shape[:2]
        p = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64)
                blk[_ZZ] = coefs[ci][by, bx] * qt
                p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    C.T @ blk.reshape(8, 8) @ C
        planes.append(p)
    up = []
    for p, c in zip(planes, comps):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        up.append(p[:h, :w] + 128.0)
    if len(up) == 1:
        g = np.clip(up[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)
