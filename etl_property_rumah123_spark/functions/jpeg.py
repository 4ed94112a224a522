"""JPEG (ITU-T T.81), numpy/stdlib only: baseline sequential AND
progressive (Annex G), from the public specification — no image
library.

  encode (baseline): RGB -> JFIF YCbCr (4:4:4/4:2:0/4:2:2/4:4:0) -> 8x8 blocks
          (edge-replicated padding) -> orthonormal 2-D DCT ->
          quantization (Annex K tables, libjpeg quality scaling) ->
          zigzag -> DC differential + AC run-length -> canonical
          Huffman (Annex K tables) with 0xFF byte stuffing ->
          SOI/APP0/DQT/SOF0/DHT/SOS/EOI stream
  encode (progressive, :func:`encode_jpeg_progressive`): same front
          half, then a 13-scan Annex G script exercising BOTH
          progressive dimensions — spectral selection (DC scan, AC
          bands 1-5 / 6-63 per component) and successive
          approximation (DC Al=1 + refinement; AC Al=2 + two
          refinement passes) with EOB-run coding across blocks.
  decode: sequential marker walk (DQT/DHT may appear between scans)
          -> per-scan entropy decode into a per-component coefficient
          store (baseline full-band scans and all four progressive
          scan kinds: DC first/refine interleaved or not, AC
          first/refine with EOB runs) -> dequantize -> vectorized
          IDCT -> upsample -> YCbCr -> RGB, clamp, crop.

Round-6 scope — EVERY T.81 coding process, all dispatched through
:func:`decode_jpeg`: SOF0 baseline, SOF1 extended sequential (8 AND
12 bit — 16-bit DQT entries, extended Huffman alphabets,
:func:`encode_jpeg_extended`), SOF2 progressive (8 AND 12 bit via
``precision=12`` on :func:`encode_jpeg_progressive`), SOF9/SOF10
arithmetic (QM coder + sequential AND progressive conditioning in
:mod:`.jpeg_arith`, Annexes D/F/G.2 — also 8 AND 12 bit, completing
the table-B.2 precision matrix for every DCT frame type),
SOF3/SOF11 lossless at
precision 2-16 (:mod:`.jpeg_lossless`, Annex H), and hierarchical
DHP pyramids with differential SOF5 frames (:mod:`.jpeg_hier`,
Annex J). Sampling factors 1-4 per axis with integer upsampling
ratios (4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1; fractional mixes refuse
loudly), restart intervals (DRI/RSTn). The DCT modes are lossy; the
test bounds are error <= 2/channel at quality 100 (x16 scaled at
12-bit) and EXACT pixel parity between the baseline and progressive
decode of the same quantized coefficients (the two paths share
nothing past quantization).
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (luminance, chrominance) -----------------

QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# --- Annex K Huffman tables: (bits[1..16], values) ------------------------

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal DCT-II matrix: F = A @ block @ A.T reproduces T.81's
# 1/4 C(u)C(v) double-cosine sum exactly (sqrt(2/8)^2 = 1/4)
_A = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


#: luma (hs, vs) per subsampling name; chroma is always 1x1
SUBSAMPLING_FACTORS = {
    "444": (1, 1),
    "420": (2, 2),
    "422": (2, 1),  # chroma halved horizontally
    "440": (1, 2),  # chroma halved vertically
    "411": (4, 1),  # chroma quartered horizontally (DV/camcorder)
}


def scaled_quant_tables(quality: int):
    """libjpeg quality scaling: 1 (worst) .. 100 (all-ones tables)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QT_LUM), s(QT_CHROM)


def _rgb_to_ycbcr(px: np.ndarray, precision: int = 8) -> np.ndarray:
    half = float(1 << (precision - 1))
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + half,
            0.5 * r - 0.418688 * g - 0.081312 * b + half,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray, precision: int = 8) -> np.ndarray:
    half = float(1 << (precision - 1))
    y = ycc[..., 0]
    cb = ycc[..., 1] - half
    cr = ycc[..., 2] - half
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    top = (1 << precision) - 1
    dtype = np.uint8 if precision <= 8 else np.uint16
    return np.clip(np.round(rgb), 0, top).astype(dtype)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_restart(self) -> int:
        """Byte-align (discard partial bits) and consume an RSTn
        marker; returns n (0-7). Restart markers are the ONLY markers
        legal inside entropy-coded data, and they are not stuffed."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"expected RSTn, got 0xFF{m:02X}")
        self.pos += 2
        return m - 0xD0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


def _build_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): value -> (code, len)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(mincode/maxcode/valptr per length) for canonical decoding."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in scan")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


_ZZ_R = [p[0] for p in ZIGZAG]
_ZZ_C = [p[1] for p in ZIGZAG]


def _encode_block(writer, block, quant, dc_codes, ac_codes, prev_dc):
    """FDCT + quantize + entropy-code one 8x8 block; returns the new
    DC predictor."""
    coef = _A @ block @ _A.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q[_ZZ_R, _ZZ_C]
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline JFIF JPEG.

    ``subsampling``: '444' (full-resolution chroma) or '420' (chroma
    averaged 2x2 — the dominant layout of real-world JPEGs; MCUs
    interleave four Y blocks with one Cb and one Cr block).

    ``restart_interval``: if > 0, emit a DRI segment and a
    byte-aligned RSTn marker every that-many MCUs, resetting the DC
    predictors — the resync points real-world encoders insert so a
    corrupted scan loses one interval, not the image."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if subsampling not in SUBSAMPLING_FACTORS:
        raise ValueError(
            f"subsampling must be one of {sorted(SUBSAMPLING_FACTORS)}, "
            f"got {subsampling}"
        )
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("restart_interval must be 0..65535")
    h, w, _ = pixels.shape
    qlum, qchrom = scaled_quant_tables(quality)
    hs, vs = SUBSAMPLING_FACTORS[subsampling]
    mcu_w, mcu_h = 8 * hs, 8 * vs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - np.array([128.0, 128.0, 128.0])

    dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_build_codes(AC_LUM_BITS, AC_LUM_VALS),
                _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    n_mcu_total = (ph // mcu_h) * (pw // mcu_w)
    n_mcu = 0

    def emit_restart() -> None:
        # byte-align, then the cycling RSTn marker (raw — markers are
        # never stuffed); DC prediction restarts from zero
        nonlocal n_mcu
        n_mcu += 1
        if (
            restart_interval
            and n_mcu % restart_interval == 0
            and n_mcu < n_mcu_total
        ):
            writer.flush()
            writer.out += bytes(
                [0xFF, 0xD0 + (n_mcu // restart_interval - 1) % 8]
            )
            prev_dc[0] = prev_dc[1] = prev_dc[2] = 0

    if subsampling == "444":
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for comp in range(3):
                    t = 0 if comp == 0 else 1
                    prev_dc[comp] = _encode_block(
                        writer, ycc[by : by + 8, bx : bx + 8, comp],
                        qlum if comp == 0 else qchrom,
                        dc_codes[t], ac_codes[t], prev_dc[comp],
                    )
                emit_restart()
    else:  # subsampled: chroma planes are vs x hs means
        yplane = ycc[..., 0]
        chroma = [
            ycc[..., c].reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            for c in (1, 2)
        ]
        for by in range(0, ph, mcu_h):
            for bx in range(0, pw, mcu_w):
                for dy in range(0, mcu_h, 8):  # vs x hs luma blocks, raster
                    for dx in range(0, mcu_w, 8):
                        prev_dc[0] = _encode_block(
                            writer,
                            yplane[by + dy : by + dy + 8, bx + dx : bx + dx + 8],
                            qlum, dc_codes[0], ac_codes[0], prev_dc[0],
                        )
                cy, cx = by // vs, bx // hs
                for comp in (1, 2):
                    prev_dc[comp] = _encode_block(
                        writer,
                        chroma[comp - 1][cy : cy + 8, cx : cx + 8],
                        qchrom, dc_codes[1], ac_codes[1], prev_dc[comp],
                    )
                emit_restart()
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = bytes(int(table[r][c]) for r, c in ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(tclass: int, tid: int, bits, vals) -> bytes:
        return seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    y_sampling = (hs << 4) | vs
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, qlum) + dqt(1, qchrom)
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sof + dri + sos + bytes(writer.out) + b"\xff\xd9"
    )


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG (8-bit, sampling factors 1-2 per axis,
    single interleaved scan) into an (H, W, 3) uint8 RGB array.

    Raises ``ValueError`` — and ONLY ``ValueError`` — for non-JPEG
    bytes, truncated/corrupt streams, or unsupported modes. The
    ``mapInPandas`` stages in ``operators/multimodal.py`` catch
    ``ValueError`` to turn a corrupt sample into NULLs instead of
    failing the whole Spark task, so every malformed-input failure
    mode (short segment indexing, ``struct.unpack`` on truncated
    payloads, oversized Huffman magnitudes overflowing int64) must
    surface as ``ValueError`` here. Fuzz-pinned in
    ``tests/test_multimodal.py::test_decode_jpeg_only_raises_valueerror``.
    """
    try:
        return _decode_jpeg_impl(data)
    except ValueError:
        raise
    except (IndexError, OverflowError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _find_scan_end(data: bytes, start: int) -> int:
    """End offset of an entropy-coded segment: the next 0xFF followed
    by a real marker — 0x00 stuffing and RSTn restart markers (the
    only markers legal INSIDE a scan) are part of the segment."""
    i = start
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (
            0xD0 <= data[i + 1] <= 0xD7
        ):
            return i
        i += 1
    raise ValueError("unterminated entropy-coded segment")


def _decode_dc_block(reader, dc_t, pred, al):
    size = _decode_symbol(reader, dc_t)
    diff = _extend(reader.read(size), size) if size else 0
    pred += diff
    return pred, pred << al


def _decode_ac_first(reader, ac_t, zz, ss, se, al, eobrun):
    """Progressive AC initial scan for one block's band (G.1.2.2 /
    F.2.2.2). Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index overflow in band")
        zz[k] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _refine_nonzero(reader, zz, k, p1):
    """Correction bit for an already-nonzero coefficient (G.1.2.3)."""
    if reader.read(1) and (abs(int(zz[k])) & p1) == 0:
        zz[k] += p1 if zz[k] > 0 else -p1


def _decode_ac_refine(reader, ac_t, zz, ss, se, al, eobrun):
    """Progressive AC refinement for one block's band. Newly
    significant coefficients arrive as (run, 1) symbols with a sign
    bit; already-nonzero coefficients consume one correction bit each
    as the run advances; EOB runs cover whole blocks whose remaining
    nonzeros still take correction bits."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                val = 0  # ZRL: 16 zero-history positions, no new coef
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement")
                val = p1 if reader.read(1) else -p1
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(reader, zz, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(reader, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    arith_cond: dict[tuple, object] = {}  # DAC conditioning
    arith = False
    precision = 8
    frame = None          # (progressive, h, w, comps)
    coeffs: list[np.ndarray] = []   # per comp: (bh_pad, bw_pad, 64) int32
    dims: list[tuple] = []          # per comp: (bw_true, bh_true, bw_pad, bh_pad)
    preds_scan_seen = False
    restart_interval = 0

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # 0xFF fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (Pq=0: 8-bit entries; Pq=1: 16-bit)
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0xF
                if prec not in (0, 1):
                    raise ValueError(f"bad DQT precision {prec}")
                step = 1 + prec
                if i + 1 + 64 * step > len(payload):
                    raise ValueError("truncated DQT")
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    off = i + 1 + k * step
                    t[r][c] = (
                        payload[off]
                        if prec == 0
                        else (payload[off] << 8) | payload[off + 1]
                    )
                qtables[tid] = t
                i += 1 + 64 * step
        elif marker == 0xC4:  # DHT — may appear BETWEEN scans
            i = 0
            while i < len(payload):
                tclass, tid = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                htables[(tclass, tid)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xCC:  # DAC: arithmetic conditioning tables
            if len(payload) % 2:
                raise ValueError("odd-length DAC segment")
            i = 0
            while i + 1 < len(payload):
                tclass, tid = payload[i] >> 4, payload[i] & 0xF
                cs = payload[i + 1]
                if tclass == 0:
                    up, low = cs >> 4, cs & 0xF
                    if low > up:
                        raise ValueError("bad DAC DC conditioning (L > U)")
                    arith_cond[("dc", tid)] = (low, up)
                elif tclass == 1:
                    if not 1 <= cs <= 63:
                        raise ValueError("bad DAC AC conditioning Kx")
                    arith_cond[("ac", tid)] = cs
                else:
                    raise ValueError(
                        f"bad DAC table class {tclass} (0 or 1 only)"
                    )
                i += 2
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended sequential (8 or 12 bit) /
            # SOF2 progressive / SOF9 sequential arithmetic / SOF10
            # progressive arithmetic
            if frame is not None:
                raise ValueError("multiple SOF markers")
            arith = marker in (0xC9, 0xCA)
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            # T.81 table B.2: baseline (SOF0) is 8-bit only; extended
            # sequential, progressive and both arithmetic frames allow
            # 8 or 12. The entropy decoders are size-generic (Huffman
            # symbols carry SSSS; the QM magnitude trees cap at the
            # 12-bit 32767 bound), so precision only gates here and in
            # the level shift.
            allowed = (8,) if marker == 0xC0 else (8, 12)
            if prec not in allowed or ncomp != 3:
                raise ValueError(
                    f"precision {prec} not supported for SOF{marker - 0xC0} "
                    f"/ ncomp={ncomp} (3 only)"
                )
            precision = prec
            comps = []
            for c in range(ncomp):
                cid, sampling, qsel = payload[6 + 3 * c : 9 + 3 * c]
                hs, vs = sampling >> 4, sampling & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"sampling factors {hs}x{vs} out of the T.81 "
                        "1-4 range"
                    )
                comps.append((cid, hs, vs, qsel))
            frame = (marker in (0xC2, 0xCA), h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for _cid, hs, vs, _q in comps:
                bw_pad, bh_pad = mcux * hs, mcuy * vs
                bw_true = -(-(-(-w * hs // hmax)) // 8)
                bh_true = -(-(-(-h * vs // vmax)) // 8)
                coeffs.append(
                    np.zeros((bh_pad, bw_pad, 64), dtype=np.int64)
                )
                dims.append((bw_true, bh_true, bw_pad, bh_pad))
        elif marker in (0xC3, 0xCB):
            # SOF3/SOF11 lossless: an entirely different data model
            # (spatial prediction, no blocks/quant) — hand the whole
            # stream to the Annex H decoder
            if frame is not None:
                raise ValueError("multiple SOF markers")
            from etl_property_rumah123_spark.functions import jpeg_lossless

            return jpeg_lossless.decode_jpeg_lossless(data)
        elif marker == 0xDE:
            # DHP: a hierarchical (Annex J) pyramid — multi-frame
            # stream, decoded by its own driver
            if frame is not None:
                raise ValueError("DHP after SOF")
            from etl_property_rumah123_spark.functions import jpeg_hier

            return jpeg_hier.decode_jpeg_hierarchical(data)
        elif marker in (0xC5, 0xC6, 0xC7):
            raise ValueError(
                "differential frames only appear inside hierarchical "
                "(DHP) streams"
            )
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            if len(payload) != 2:
                raise ValueError("bad DRI segment")
            restart_interval = struct.unpack(">H", payload)[0]
        elif marker == 0xDA:  # SOS — decode this scan now
            if frame is None:
                raise ValueError("SOS before SOF")
            progressive, h, w, comps = frame
            ns = payload[0]
            scan_comps = []  # (comp_index, dc_tid, ac_tid)
            cid_index = {c[0]: i for i, c in enumerate(comps)}
            for c in range(ns):
                cid, tsels = payload[1 + 2 * c], payload[2 + 2 * c]
                if cid not in cid_index:
                    raise ValueError("scan references unknown component")
                scan_comps.append((cid_index[cid], tsels >> 4, tsels & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            end = _find_scan_end(data, pos + 2 + length)
            if arith:
                from etl_property_rumah123_spark.functions import (
                    jpeg_arith,
                )

                jpeg_arith.decode_scan_arith(
                    data[pos + 2 + length : end], comps, scan_comps,
                    ss, se, ah, al, coeffs, dims, arith_cond,
                    restart_interval, progressive=progressive,
                )
            else:
                reader = _BitReader(data[pos + 2 + length : end])
                _decode_scan(
                    reader, progressive, comps, scan_comps, ss, se, ah,
                    al, coeffs, dims, htables, qtables, restart_interval,
                )
            preds_scan_seen = True
            pos = end
            continue
        pos += 2 + length
    if frame is None or not preds_scan_seen:
        raise ValueError("missing SOF/SOS")

    progressive, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, hs, vs, qsel) in enumerate(comps):
        if qsel not in qtables:
            raise ValueError("frame references missing quant table")
        if hmax % hs or vmax % vs:
            # T.81 allows e.g. 3-vs-2 factor mixes; reproducing them
            # needs fractional resampling we do not implement
            raise ValueError(
                f"non-integer upsampling ratio ({hs}x{vs} vs max "
                f"{hmax}x{vmax}) unsupported"
            )
        quant = qtables[qsel].astype(np.float64)
        bw_true, bh_true, bw_pad, bh_pad = dims[ci]
        zz = coeffs[ci].astype(np.float64)  # (bh, bw, 64)
        blocks = np.zeros((bh_pad, bw_pad, 8, 8), dtype=np.float64)
        blocks[:, :, _ZZ_R, _ZZ_C] = zz
        blocks *= quant  # dequantize
        # IDCT all blocks at once: A.T @ B @ A
        plane = np.einsum(
            "ur,yxrc,cv->yxuv", _A.T, blocks, _A
        ) + float(1 << (precision - 1))
        plane = plane.transpose(0, 2, 1, 3).reshape(bh_pad * 8, bw_pad * 8)
        if vs < vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        if hs < hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        planes.append(plane[: -(-h // (8 * vmax)) * 8 * vmax,
                            : -(-w // (8 * hmax)) * 8 * hmax])
    out = np.stack(planes, axis=-1)
    return _ycbcr_to_rgb(out[:h, :w], precision)


def _decode_scan(
    reader, progressive, comps, scan_comps, ss, se, ah, al,
    coeffs, dims, htables, qtables, restart_interval=0,
):
    """Decode one entropy-coded scan into the coefficient store.

    Baseline: single interleaved (or single-component) scan with
    Ss=0, Se=63, Ah=Al=0 — full blocks. Progressive (T.81 Annex G):
    DC scans (Ss=Se=0) may be interleaved, AC scans (Ss>=1) are
    single-component; Ah=0 first scans vs Ah>0 refinements."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if ss > se or se > 63:
            raise ValueError("bad spectral selection")
        if ah not in range(14) or al not in range(14) or (ah and ah != al + 1):
            raise ValueError("bad successive approximation")
    else:
        if ss != 0 or se != 63 or ah != 0 or al != 0:
            raise ValueError("baseline scan must cover the full band")

    def tables(ci_pos, tclass):
        _, dc_tid, ac_tid = scan_comps[ci_pos]
        t = htables.get((tclass, dc_tid if tclass == 0 else ac_tid))
        # Which tables a scan actually needs (T.81): baseline needs
        # both; progressive DC FIRST needs only DC (the AC selector in
        # a DC scan header is meaningless, and real encoders define AC
        # tables only before their AC scans); DC REFINEMENT needs
        # neither (raw bits); AC scans need only AC.
        if tclass == 0:
            needed = not (progressive and ah > 0) and ss == 0
        else:
            needed = not progressive or ss > 0
        if t is None and needed:
            raise ValueError("missing Huffman table for scan")
        return t

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # Restart handling (T.81 E.2.4 / DRI): after every
    # ``restart_interval`` MCUs the stream carries a byte-aligned RSTn
    # marker and DC predictors + EOB run reset. In non-interleaved
    # scans one MCU is one block.
    state = {"preds": [0] * len(scan_comps), "eobrun": 0, "n": 0}

    def maybe_restart(total_units: int) -> None:
        state["n"] += 1
        if (
            restart_interval
            and state["n"] % restart_interval == 0
            and state["n"] < total_units
        ):
            reader.read_restart()
            state["preds"] = [0] * len(scan_comps)
            state["eobrun"] = 0

    if ss == 0:  # DC (or full baseline) scan
        if len(scan_comps) > 1:  # interleaved MCU order
            ci0 = scan_comps[0][0]
            mcux = dims[ci0][2] // comps[ci0][1]
            mcuy = dims[ci0][3] // comps[ci0][2]
            for my in range(mcuy):
                for mx in range(mcux):
                    for pos_in_scan, (ci, _dc, _ac) in enumerate(scan_comps):
                        _, hs, vs, _q = comps[ci]
                        for vy in range(vs):
                            for hx in range(hs):
                                by, bx = my * vs + vy, mx * hs + hx
                                _decode_dc_unit(
                                    reader, progressive, ah, al,
                                    coeffs[ci][by, bx], state["preds"],
                                    pos_in_scan,
                                    tables(pos_in_scan, 0),
                                    tables(pos_in_scan, 1),
                                )
                    maybe_restart(mcux * mcuy)
        else:  # non-interleaved: the component's true block grid
            ci = scan_comps[0][0]
            bw_true, bh_true, _, _ = dims[ci]
            for by in range(bh_true):
                for bx in range(bw_true):
                    _decode_dc_unit(
                        reader, progressive, ah, al,
                        coeffs[ci][by, bx], state["preds"], 0,
                        tables(0, 0), tables(0, 1),
                    )
                    maybe_restart(bw_true * bh_true)
    else:  # progressive AC scan, single component, raster block order
        ci = scan_comps[0][0]
        ac_t = tables(0, 1)
        bw_true, bh_true, _, _ = dims[ci]
        for by in range(bh_true):
            for bx in range(bw_true):
                zz = coeffs[ci][by, bx]
                if ah == 0:
                    state["eobrun"] = _decode_ac_first(
                        reader, ac_t, zz, ss, se, al, state["eobrun"]
                    )
                else:
                    state["eobrun"] = _decode_ac_refine(
                        reader, ac_t, zz, ss, se, al, state["eobrun"]
                    )
                maybe_restart(bw_true * bh_true)


def _decode_dc_unit(reader, progressive, ah, al, zz, preds, pi, dc_t, ac_t):
    """One block's worth of a DC (or full baseline) scan."""
    if progressive and ah > 0:  # DC refinement: one raw bit
        if reader.read(1):
            zz[0] |= 1 << al
        return
    if dc_t is None:
        raise ValueError("missing DC Huffman table")
    preds[pi], zz[0] = _decode_dc_block(reader, dc_t, preds[pi], al)
    if progressive:
        return
    # baseline: ACs follow in the same block
    if ac_t is None:
        raise ValueError("missing AC Huffman table")
    i = 1
    while i < 64:
        rs = _decode_symbol(reader, ac_t)
        run, size = rs >> 4, rs & 0xF
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            i += 16
            continue
        i += run
        if i > 63:
            raise ValueError("AC coefficient index overflow")
        zz[i] = _extend(reader.read(size), size)
        i += 1


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G): spectral selection + successive
# approximation, used to produce real progressive fixtures the decoder
# is pixel-parity-tested against (no image library in this container).
# ---------------------------------------------------------------------------


# Progressive AC Huffman table: the Annex K sequential AC tables have
# exactly ZERO Kraft slack (the reserved all-ones 16-bit code is the
# only free slot), so they cannot host the EOBn run-length symbols
# (0x10..0xE0) progressive scans need. This dedicated table assigns a
# flat 8-bit code to every symbol the progressive encoder can emit —
# (run<<4)|size for size 1..10, ZRL, EOB0..EOB14 — 176 symbols x 2^-8
# = 0.6875 Kraft, a valid (if uncompressed) canonical Huffman table.
PROG_AC_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
)
PROG_AC_BITS = [0] * 7 + [len(PROG_AC_VALS)] + [0] * 8


def _quantize_planes(
    pixels: np.ndarray, quality: int, subsampling: str, precision: int = 8
):
    """Shared front half of encoding: pad, YCbCr, per-component block
    grids of quantized zigzag coefficients. Returns (h, w, comps,
    coeff arrays (bh, bw, 64) int64, true block dims).

    ``precision`` 8 or 12. At 12 the level shift is 2048 and the
    Annex K tables are scaled x16 (16-bit DQT entries) — the same
    floor as :func:`encode_jpeg_extended`, keeping every quantized
    coefficient inside the 14-size AC alphabet (|coef| <=
    8 * 2048 / 16 = 1024) and inside the QM coder's magnitude caps."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if subsampling not in SUBSAMPLING_FACTORS:
        raise ValueError(
            f"subsampling must be one of {sorted(SUBSAMPLING_FACTORS)}, "
            f"got {subsampling}"
        )
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12 and (pixels.min() < 0 or pixels.max() > 4095):
        raise ValueError("12-bit samples must be 0..4095")
    h, w, _ = pixels.shape
    qlum, qchrom = scaled_quant_tables(quality)
    if precision == 12:
        qlum, qchrom = qlum * 16, qchrom * 16
    half = float(1 << (precision - 1))
    hs, vs = SUBSAMPLING_FACTORS[subsampling]
    mcu_w, mcu_h = 8 * hs, 8 * vs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded, precision) - np.array([half, half, half])
    if subsampling == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        samp = [(hs, vs), (1, 1), (1, 1)]
        planes = [ycc[..., 0]] + [
            ycc[..., c].reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            for c in (1, 2)
        ]
    coeff_arrays = []
    true_dims = []
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    for ci, ((hs, vs), plane) in enumerate(zip(samp, planes)):
        quant = (qlum if ci == 0 else qchrom).astype(np.float64)
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ur,yxrc,cv->yxuv", _A, blocks, _A.T)
        q = np.round(coef / quant).astype(np.int64)
        coeff_arrays.append(q[:, :, _ZZ_R, _ZZ_C])  # (bh, bw, 64) zigzag
        bw_true = -(-(-(-w * hs // hmax)) // 8)
        bh_true = -(-(-(-h * vs // vmax)) // 8)
        true_dims.append((bw_true, bh_true))
    return h, w, samp, coeff_arrays, true_dims


class _ProgScanState:
    """AC-scan run state shared across blocks. TWO correction-bit
    buffers with different wire positions (the decoder reads
    corrections either right after the EOBn symbol, for blocks the
    run covers, or during the positional advance after the next
    in-block symbol):

    - ``eob_bits``: corrections belonging to blocks already counted
      in the pending EOB run — emitted after the EOBn symbol;
    - ``bits``: the CURRENT block's corrections since its last
      emitted symbol — emitted after the next ZRL/(run,1) symbol.

    Conflating the two desyncs the stream (caught by the band-level
    roundtrip fuzz in tests/test_multimodal.py)."""

    def __init__(self, writer, ac_codes):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.eob_bits: list[int] = []
        self.bits: list[int] = []

    def flush(self) -> None:
        """Emit the pending EOB run and the covered blocks' bits."""
        if self.eobrun > 0:
            rr = self.eobrun.bit_length() - 1
            code, length = self.ac[rr << 4]
            self.w.write(code, length)
            if rr:
                self.w.write(self.eobrun - (1 << rr), rr)
            self.eobrun = 0
        for b in self.eob_bits:
            self.w.write(b, 1)
        self.eob_bits = []

    def emit_bits(self) -> None:
        """Emit the current block's pending corrections (post-symbol)."""
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []

    def count_eob(self) -> None:
        """End of a block with trailing content: the block joins the
        EOB run, and its pending corrections move to the run buffer."""
        self.eob_bits.extend(self.bits)
        self.bits = []
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first_block(state, zz, ss, se, al):
    band = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # point transform truncates toward zero
        band.append(t if v >= 0 else -t)
    last_nz = -1
    for i in range(len(band) - 1, -1, -1):
        if band[i]:
            last_nz = i
            break
    if last_nz < 0:
        state.count_eob()
        return
    state.flush()
    r = 0
    for i in range(last_nz + 1):
        v = band[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = state.ac[0xF0]
            state.w.write(code, length)
            r -= 16
        size, bits = _magnitude(v)
        code, length = state.ac[(r << 4) | size]
        state.w.write(code, length)
        state.w.write(bits, size)
        r = 0
    if last_nz < len(band) - 1:
        state.count_eob()


def _enc_ac_refine_block(state, zz, ss, se, al):
    """One block of an AC refinement scan (the G.1.2.3 shape): newly
    significant coefficients as (zero-history-run, 1) symbols + sign,
    already-nonzero coefficients as buffered correction bits emitted
    after the next symbol, trailing content folded into the EOB run."""
    t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    sign = [int(zz[k]) > 0 for k in range(ss, se + 1)]
    r = 0
    emitted_any = False
    for i in range(len(t)):
        if t[i] == 0:
            r += 1
            continue
        # nonzero history or newly significant: fold pending ZRLs first
        while r > 15:
            state.flush()
            code, length = state.ac[0xF0]
            state.w.write(code, length)
            r -= 16
            state.emit_bits()
        if t[i] > 1:
            state.bits.append(t[i] & 1)
            continue
        state.flush()
        code, length = state.ac[(r << 4) | 1]
        state.w.write(code, length)
        state.w.write(1 if sign[i] else 0, 1)
        state.emit_bits()
        r = 0
        emitted_any = True
    if r > 0 or state.bits or not emitted_any:
        state.count_eob()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    precision: int = 8,
) -> bytes:
    """Encode an (H, W, 3) RGB array as a PROGRESSIVE JFIF JPEG
    (SOF2) exercising both Annex G dimensions: spectral selection (DC
    scan, AC band 1-5, AC band 6-63 per component) and successive
    approximation (DC at Al=1 then a refinement pass; AC at Al=2 then
    Ah=2->1 and Ah=1->0 refinement passes). Coefficients are quantized
    identically to :func:`encode_jpeg`, so decoding both streams
    yields bit-identical pixels — the decoder pixel-parity test.

    ``precision`` 12 (uint16 samples 0..4095) swaps in the flat
    extended Huffman alphabets (DC categories to 15, AC sizes to 14
    with the full EOBn set) and 16-bit DQT entries — T.81 table B.2
    allows 12-bit for every non-baseline frame type."""
    h, w, samp, coeffs, true_dims = _quantize_planes(
        pixels, quality, subsampling, precision
    )
    if precision == 8:
        dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                    _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
        prog_ac = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
        ac_codes = [prog_ac, prog_ac]
    else:
        dc12 = _build_codes(DC12_BITS, DC12_VALS)
        dc_codes = [dc12, dc12]
        prog_ac = _build_codes(PROG_AC12_BITS, PROG_AC12_VALS)
        ac_codes = [prog_ac, prog_ac]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            tsel = 0x00 if cid == 1 else 0x11
            body += bytes([cid, tsel])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    scans = []

    # --- DC first scan: interleaved, Al=1 ---
    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcux = coeffs[0].shape[1] // samp[0][0]
    mcuy = coeffs[0].shape[0] // samp[0][1]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hs, vs = samp[ci]
                tbl = dc_codes[0 if ci == 0 else 1]
                for vy in range(vs):
                    for hx in range(hs):
                        dc = int(coeffs[ci][my * vs + vy, mx * hs + hx, 0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size, bits = _magnitude(diff)
                        code, length = tbl[size]
                        wtr.write(code, length)
                        if size:
                            wtr.write(bits, size)
    wtr.flush()
    scans.append((sos_header([1, 2, 3], 0, 0, 0, 1), bytes(wtr.out)))

    # --- AC first scans per component: bands 1-5 and 6-63 at Al=2 ---
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(3):
            wtr = _BitWriter()
            state = _ProgScanState(wtr, ac_codes[0 if ci == 0 else 1])
            bw_true, bh_true = true_dims[ci]
            for by in range(bh_true):
                for bx in range(bw_true):
                    _enc_ac_first_block(state, coeffs[ci][by, bx], ss, se, 2)
            state.flush()
            wtr.flush()
            scans.append((sos_header([ci + 1], ss, se, 0, 2), bytes(wtr.out)))

    # --- DC refinement: one raw bit per block, Ah=1 Al=0 ---
    wtr = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hs, vs = samp[ci]
                for vy in range(vs):
                    for hx in range(hs):
                        wtr.write(int(coeffs[ci][my * vs + vy, mx * hs + hx, 0]) & 1, 1)
    wtr.flush()
    scans.append((sos_header([1, 2, 3], 0, 0, 1, 0), bytes(wtr.out)))

    # --- AC refinement passes: Ah=2 Al=1, then Ah=1 Al=0, full band ---
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(3):
            wtr = _BitWriter()
            state = _ProgScanState(wtr, ac_codes[0 if ci == 0 else 1])
            bw_true, bh_true = true_dims[ci]
            for by in range(bh_true):
                for bx in range(bw_true):
                    _enc_ac_refine_block(state, coeffs[ci][by, bx], 1, 63, al)
            state.flush()
            wtr.flush()
            scans.append((sos_header([ci + 1], 1, 63, ah, al), bytes(wtr.out)))

    qlum, qchrom = scaled_quant_tables(quality)
    if precision == 12:
        qlum, qchrom = qlum * 16, qchrom * 16

    def dqt(tid: int, table: np.ndarray) -> bytes:
        if precision == 12:
            vals = b"".join(
                struct.pack(">H", int(table[r][c])) for r, c in ZIGZAG
            )
            return seg(0xFFDB, bytes([0x10 | tid]) + vals)
        zzb = bytes(int(table[r][c]) for r, c in ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zzb)

    def dht(tclass: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    if precision == 8:
        tables = (
            dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
            + dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
            + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
            + dht(1, 1, PROG_AC_BITS, PROG_AC_VALS)
        )
    else:
        tables = (
            dht(0, 0, DC12_BITS, DC12_VALS)
            + dht(1, 0, PROG_AC12_BITS, PROG_AC12_VALS)
            + dht(0, 1, DC12_BITS, DC12_VALS)
            + dht(1, 1, PROG_AC12_BITS, PROG_AC12_VALS)
        )
    y_sampling = (samp[0][0] << 4) | samp[0][1]
    sof = seg(
        0xFFC2,
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out = b"\xff\xd8" + app0 + dqt(0, qlum) + dqt(1, qchrom) + tables + sof
    for header, body in scans:
        out += header + body
    return out + b"\xff\xd9"


# --- 12-bit extended sequential (SOF1) ------------------------------------

#: Flat canonical Huffman tables for 12-bit data, where DC categories
#: reach 15 and AC sizes reach 14 — past what the Annex K 8-bit
#: tables encode. Every DC symbol gets 5 bits (Kraft 16/32), every AC
#: symbol 8 bits (226/256; the all-ones codeword stays unused per
#: C.2). Deliberately simple over optimal: validity and decode
#: coverage are the point, the adaptive QM paths own compression.
DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))
AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

#: Progressive variant of the 12-bit AC alphabet: the full (run, size)
#: grid INCLUDING every size-0 symbol — EOB0..EOB14 (run 0-14) and ZRL
#: (run 15) — since Annex G AC-first scans emit banded EOB runs. 240
#: symbols at 8 bits each (Kraft 240/256, all-ones codeword unused
#: per C.2).
PROG_AC12_VALS = [
    (run << 4) | size for run in range(16) for size in range(15)
]
PROG_AC12_BITS = [
    0, 0, 0, 0, 0, 0, 0, len(PROG_AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0,
]


def encode_jpeg_extended(
    pixels: np.ndarray, quality: int = 85
) -> bytes:
    """Encode an (H, W, 3) uint16 RGB array (samples 0..4095) as a
    12-bit extended sequential JPEG (SOF1): the baseline pipeline at
    precision 12 — level shift 2048, Annex K quantization scaled x16
    (16-bit DQT entries), 4:4:4, the extended flat Huffman tables
    above. The x16 quant floor keeps every quantized coefficient
    within the 14-size AC alphabet by construction (|coef| <=
    8 * 2048 / 16 = 1024)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if pixels.min() < 0 or pixels.max() > 4095:
        raise ValueError("12-bit samples must be 0..4095")
    h, w, _ = pixels.shape
    qlum, qchrom = scaled_quant_tables(quality)
    qlum, qchrom = qlum * 16, qchrom * 16

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded, precision=12) - 2048.0

    dc_codes = _build_codes(DC12_BITS, DC12_VALS)
    ac_codes = _build_codes(AC12_BITS, AC12_VALS)
    writer = _BitWriter()
    prev = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                prev[comp] = _encode_block(
                    writer,
                    ycc[by : by + 8, bx : bx + 8, comp],
                    qlum if comp == 0 else qchrom,
                    dc_codes,
                    ac_codes,
                    prev[comp],
                )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt16(tid: int, table: np.ndarray) -> bytes:
        vals = b"".join(
            struct.pack(">H", int(table[r][c])) for r, c in ZIGZAG
        )
        return seg(0xFFDB, bytes([0x10 | tid]) + vals)

    def dht(tclass: int, tid: int, bits, vals) -> bytes:
        return seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    sof = seg(
        0xFFC1,
        struct.pack(">BHHB", 12, h, w, 3)
        + b"".join(
            struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
            for cid in (1, 2, 3)
        ),
    )
    sos = seg(
        0xFFDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8"
        + dqt16(0, qlum)
        + dqt16(1, qchrom)
        + dht(0, 0, DC12_BITS, DC12_VALS)
        + dht(1, 0, AC12_BITS, AC12_VALS)
        + sof + sos + bytes(writer.out) + b"\xff\xd9"
    )
