"""Baseline sequential JPEG (ITU-T T.81), numpy/stdlib only.

Implements the full baseline pipeline from the public specification —
no image library:

  encode: RGB -> JFIF YCbCr -> 8x8 blocks (edge-replicated padding)
          -> orthonormal 2-D DCT -> quantization (Annex K tables,
          libjpeg quality scaling) -> zigzag -> DC differential +
          AC run-length -> canonical Huffman (Annex K tables) with
          0xFF byte stuffing -> SOI/APP0/DQT/SOF0/DHT/SOS/EOI stream
  decode: marker parse (DQT/DHT/SOF0/SOS) -> entropy decode ->
          dequantize -> IDCT -> YCbCr -> RGB, clamp, crop padding

Scope (deliberate): 8-bit, 3-component 4:4:4 (no chroma subsampling),
single interleaved scan, no restart intervals, no progressive mode —
the subset the encoder emits, which is a strictly valid baseline JPEG
any standard decoder reads. JPEG is lossy; the test bound is error
<= 2/channel at quality 100 (all-ones quant tables leave only DCT
float rounding) and sane PSNR at lower qualities.
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


def scaled_quant_tables(quality: int):
    """libjpeg quality scaling: 1 (worst) .. 100 (all-ones tables)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QT_LUM), s(QT_CHROM)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline JFIF JPEG.

    ``subsampling``: '444' (full-resolution chroma) or '420' (chroma
    averaged 2x2 — the dominant layout of real-world JPEGs; MCUs
    interleave four Y blocks with one Cb and one Cr block)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling}")
    h, w, _ = pixels.shape
    qlum, qchrom = scaled_quant_tables(quality)
    mcu = 8 if subsampling == "444" else 16
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - np.array([128.0, 128.0, 128.0])

    dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_build_codes(AC_LUM_BITS, AC_LUM_VALS),
                _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
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
    else:  # 4:2:0 — chroma planes are 2x2 means at half resolution
        yplane = ycc[..., 0]
        chroma = [
            ycc[..., c].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for c in (1, 2)
        ]
        for by in range(0, ph, 16):
            for bx in range(0, pw, 16):
                for dy in (0, 8):  # 4 luma blocks, raster order
                    for dx in (0, 8):
                        prev_dc[0] = _encode_block(
                            writer,
                            yplane[by + dy : by + dy + 8, bx + dx : bx + dx + 8],
                            qlum, dc_codes[0], ac_codes[0], prev_dc[0],
                        )
                cy, cx = by // 2, bx // 2
                for comp in (1, 2):
                    prev_dc[comp] = _encode_block(
                        writer,
                        chroma[comp - 1][cy : cy + 8, cx : cx + 8],
                        qchrom, dc_codes[1], ac_codes[1], prev_dc[comp],
                    )
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

    y_sampling = 0x11 if subsampling == "444" else 0x22
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt(0, qlum) + dqt(1, qchrom)
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sof + sos + bytes(writer.out) + b"\xff\xd9"
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


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    t[r][c] = payload[i + 1 + k]
                qtables[tid] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(payload):
                tclass, tid = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                htables[(tclass, tid)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp != 3:
                raise ValueError(
                    f"only 8-bit 3-component baseline supported "
                    f"(prec={prec}, ncomp={ncomp})"
                )
            comps = []
            for c in range(ncomp):
                cid, sampling, qsel = payload[6 + 3 * c : 9 + 3 * c]
                hs, vs = sampling >> 4, sampling & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hs}x{vs} unsupported (1 or 2 only)"
                    )
                comps.append((cid, hs, vs, qsel))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            sel = {}
            for c in range(ns):
                cid, tsels = payload[1 + 2 * c], payload[2 + 2 * c]
                sel[cid] = (tsels >> 4, tsels & 0xF)
            scan = (sel, pos + 2 + length)
            break
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
    sel, scan_start = scan
    # entropy-coded data runs until EOI
    end = data.rfind(b"\xff\xd9")
    if end < scan_start:
        raise ValueError("missing EOI")
    reader = _BitReader(data[scan_start:end])

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    prev_dc = [0] * len(comps)

    def decode_block(dc_t, ac_t, ci, qsel):
        zz = np.zeros(64, dtype=np.int64)
        size = _decode_symbol(reader, dc_t)
        diff = _extend(reader.read(size), size) if size else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
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
        coef = np.zeros((8, 8), dtype=np.float64)
        coef[_ZZ_R, _ZZ_C] = zz
        coef *= qtables[qsel]
        return _A.T @ coef @ _A + 128.0

    try:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, hs, vs, qsel) in enumerate(comps):
                    if qsel not in qtables or cid not in sel:
                        raise ValueError("scan references missing tables")
                    dc_t = htables.get((0, sel[cid][0]))
                    ac_t = htables.get((1, sel[cid][1]))
                    if dc_t is None or ac_t is None:
                        raise ValueError("missing Huffman tables")
                    for vy in range(vs):
                        for hx in range(hs):
                            block = decode_block(dc_t, ac_t, ci, qsel)
                            r0 = (my * vs + vy) * 8
                            c0 = (mx * hs + hx) * 8
                            planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
    except IndexError as e:
        raise ValueError(f"corrupt scan: {e}") from e

    # upsample subsampled components to full resolution (nearest)
    full = []
    for plane, (_cid, hs, vs, _q) in zip(planes, comps):
        if vs < vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        if hs < hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        full.append(plane[: mcuy * 8 * vmax, : mcux * 8 * hmax])
    out = np.stack(full, axis=-1)
    return _ycbcr_to_rgb(out[:h, :w])
