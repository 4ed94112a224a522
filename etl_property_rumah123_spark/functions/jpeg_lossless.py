"""Lossless JPEG (T.81 Annex H): the spatial-prediction processes of
the public JPEG specification — no DCT, no quantization, exact
roundtrip by construction.

Implements, from the specification only (no image library):
  encode (:func:`encode_jpeg_lossless`, SOF3): per-sample prediction
          with any of the seven Annex H.1 predictors, optional point
          transform, difference coding with the DC-style
          SSSS-category + amplitude-bits Huffman code (symbols 0-16),
          optional restart intervals aligned to sample rows;
          SOI/DHT/SOF3/DRI/SOS/EOI stream
  encode (:func:`encode_jpeg_lossless_arithmetic`, SOF11): the same
          prediction front half with the QM coder and the H.2
          spatial (Da, Db) conditioning replacing Huffman; DAC
          segment declares the L/U bounds
  decode (:func:`decode_jpeg_lossless`): full marker parse for both
          entropy paths, the same prediction reconstruction mod 2^16,
          restart resync

Components are coded as RGB directly (identity color transform — a
YCbCr roundtrip would defeat losslessness), interleaved, all sampling
factors 1x1 (the only layout this encoder emits; anything else is
refused loudly on decode). The shared Huffman/bit-I/O machinery comes
from :mod:`etl_property_rumah123_spark.functions.jpeg`; parity with
that module's error contract (ValueError and only ValueError for
corrupt input) is part of the decode surface, fuzz-pinned in
tests/test_multimodal.py.

Reference behavior modeled on the reference repo's media-ingest needs
only in shape (opaque binary columns decoded in batch stages); the
reference itself (rlukafiardi/etl-property-rumah123) ships no codec —
this is extension-layer capability for multimodal training data.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_property_rumah123_spark.functions import jpeg as J

#: Canonical Huffman table covering difference categories 0..16
#: (lossless differences can need SSSS up to 16; the standard DC
#: tables stop at 11). Lengths: 2,3,3,3,3,3,4,5,6,7,8,9,10,11,12,13,14
#: for symbols 0..16 — Kraft sum < 1, so the all-ones codeword stays
#: reserved per C.2.
LOSSLESS_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
LOSSLESS_VALS = list(range(17))

_PRECISION = 8


def _predict(a: int, b: int, c: int, sel: int) -> int:
    """Annex H.1 predictor ``sel`` over left/above/above-left."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def _diffs_for_plane(
    plane: np.ndarray, predictor: int, pt: int, precision: int = _PRECISION
) -> np.ndarray:
    """Vectorized per-plane difference image for one component.

    Row 0 uses the H.1.2.2 start-up rules (default prediction
    ``1 << (P - Pt - 1)`` for the corner, left-neighbor for the rest);
    column 0 of later rows predicts from above; everywhere else the
    selected predictor applies. All arithmetic in int32 — differences
    of (P - Pt)-bit samples fit with room to spare. When P - Pt is the
    full 16 bits, differences are folded into [-32768, 32767] (the
    Annex H modulo-2^16 arithmetic; narrower precisions never leave
    that range to begin with).
    """
    v = (plane.astype(np.int32)) >> pt
    h, w = v.shape
    pred = np.empty((h, w), dtype=np.int32)
    default = 1 << (precision - pt - 1)
    pred[0, 0] = default
    if w > 1:
        pred[0, 1:] = v[0, :-1]
    if h > 1:
        pred[1:, 0] = v[:-1, 0]
        if w > 1:
            a = v[1:, :-1]
            b = v[:-1, 1:]
            c = v[:-1, :-1]
            if predictor == 1:
                p = a
            elif predictor == 2:
                p = b
            elif predictor == 3:
                p = c
            elif predictor == 4:
                p = a + b - c
            elif predictor == 5:
                p = a + ((b - c) >> 1)
            elif predictor == 6:
                p = b + ((a - c) >> 1)
            else:
                p = (a + b) >> 1
            pred[1:, 1:] = p
    d = v - pred
    if precision - pt == 16:
        d = ((d + 32768) & 0xFFFF) - 32768  # modulo-2^16 fold
    return d


def _prepare_diffs(
    pixels: np.ndarray,
    predictor: int,
    point_transform: int,
    restart_rows: int,
    precision: int,
) -> list[np.ndarray]:
    """Shared encoder front half: validate parameters, build the
    per-plane difference images, re-deriving each restart interval's
    rows independently (restarts re-engage the start-of-scan
    prediction rules)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if not 2 <= precision <= 16:
        raise ValueError("lossless precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 0 <= point_transform <= precision - 1:
        raise ValueError(
            f"point transform must be 0..{precision - 1} for "
            f"{precision}-bit data"
        )
    if pixels.min() < 0 or pixels.max() >= (1 << precision):
        raise ValueError(f"samples out of {precision}-bit range")
    h, w, _ = pixels.shape
    if restart_rows < 0 or restart_rows > 0xFFFF // max(w, 1):
        raise ValueError("restart_rows out of range for DRI")
    diffs = [
        _diffs_for_plane(
            pixels[:, :, ci], predictor, point_transform, precision
        )
        for ci in range(3)
    ]
    if restart_rows:
        v = (pixels.astype(np.int32)) >> point_transform
        for start in range(restart_rows, h, restart_rows):
            stop = min(start + restart_rows, h)
            for ci in range(3):
                diffs[ci][start:stop] = _diffs_for_plane(
                    (v[start:stop, :, ci] << point_transform),
                    predictor,
                    point_transform,
                    precision,
                )
    return diffs


def encode_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
    restart_rows: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (H, W, 3) RGB array as a lossless JPEG (SOF3).

    ``predictor``: Annex H.1 selector 1-7 (carried in the scan
    header's Ss field). ``point_transform``: drop that many low bits
    before prediction (Al field; 0 = bit-exact roundtrip).
    ``restart_rows``: emit an RSTn marker every that many sample rows
    (0 = none); DRI is written as rows x W MCUs so restarts land
    exactly on row starts, where the H.1.2.2 start-of-scan prediction
    rules re-engage. ``precision``: sample bits 2-16 (the full Annex H
    range; uint16 input for P > 8) — at P - Pt = 16 the difference
    -32768 rides the SSSS=16 no-amplitude-bits codeword.
    """
    diffs = _prepare_diffs(
        pixels, predictor, point_transform, restart_rows, precision
    )
    h, w, _ = pixels.shape
    codes = J._build_codes(LOSSLESS_BITS, LOSSLESS_VALS)
    writer = J._BitWriter()
    rst = 0
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
        for x in range(w):
            for ci in range(3):  # interleaved MCU = one sample per comp
                d = int(diffs[ci][y, x])
                if d == -32768:  # mod-2^16 alias of +32768: SSSS 16
                    code, length = codes[16]
                    writer.write(code, length)
                    continue
                size, bits = J._magnitude(d)
                code, length = codes[size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(LOSSLESS_BITS) + bytes(LOSSLESS_VALS),
    )
    sof = seg(
        0xFFC3,
        struct.pack(">BHHB", precision, h, w, 3)
        + b"".join(struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3)),
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_rows * w))
        if restart_rows
        else b""
    )
    sos = seg(
        0xFFDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([predictor, 0, point_transform]),
    )
    return (
        b"\xff\xd8" + dht + sof + dri + sos + bytes(writer.out) + b"\xff\xd9"
    )


def _decode_scan_lossless(
    reader: "J._BitReader",
    h: int,
    w: int,
    ncomp: int,
    dc_tables: list,
    predictor: int,
    pt: int,
    restart_interval: int,
    precision: int = _PRECISION,
) -> np.ndarray:
    """Entropy-decode one interleaved lossless scan into (H, W, ncomp)
    int32 reconstructed (P - Pt)-bit samples."""
    out = np.zeros((h, w, ncomp), dtype=np.int32)
    default = 1 << (precision - pt - 1)
    mask = (1 << 16) - 1
    val_mask = (1 << (precision - pt)) - 1
    n_mcu = 0
    expected_rst = 0
    # restart_y: row where the current restart interval began — the
    # H.1.2.2 "first line" rules apply relative to it
    restart_y = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                got = reader.read_restart()
                if got != expected_rst & 7:
                    raise ValueError(
                        f"restart marker out of order: RST{got}, "
                        f"expected RST{expected_rst & 7}"
                    )
                expected_rst += 1
                if x != 0:
                    raise ValueError(
                        "restart interval not aligned to sample rows"
                    )
                restart_y = y
            for ci in range(ncomp):
                size = J._decode_symbol(reader, dc_tables[ci])
                if size > 16:
                    raise ValueError(f"bad lossless SSSS {size}")
                if size == 16:  # no amplitude bits; difference 32768
                    diff = 32768
                else:
                    diff = J._extend(reader.read(size), size) if size else 0
                if y == restart_y:
                    pred = default if x == 0 else int(out[y, x - 1, ci])
                elif x == 0:
                    pred = int(out[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(out[y, x - 1, ci]),
                        int(out[y - 1, x, ci]),
                        int(out[y - 1, x - 1, ci]),
                        predictor,
                    )
                out[y, x, ci] = ((pred + diff) & mask) & val_mask
            n_mcu += 1
    return out


def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Decode a lossless JPEG (SOF3 Huffman / SOF11 arithmetic,
    precision 2-16, 3 components, 1x1 sampling, single interleaved
    scan) to an (H, W, 3) RGB array — uint8 for P <= 8, else uint16.

    Dispatched to from :func:`jpeg.decode_jpeg` when the frame marker
    is SOF3, and bound by the same contract: ``ValueError`` and only
    ``ValueError`` for anything malformed.
    """
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    htables: dict[int, dict] = {}
    frame = None
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    restart_interval = 0
    result = None
    pt = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("truncated segment")
        if marker == 0xC4:  # DHT (class 0 only is meaningful here)
            i = 0
            while i < len(payload):
                if i + 17 > len(payload):
                    raise ValueError("truncated DHT")
                tclass, tid = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT values")
                if tclass == 0:
                    htables[tid] = J._build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xCC:  # DAC: arithmetic conditioning (class 0)
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
                    dc_cond[tid] = (low, up)
                elif tclass != 1:  # AC tables are legal but unused here
                    raise ValueError(
                        f"bad DAC table class {tclass} (0 or 1 only)"
                    )
                i += 2
        elif marker in (0xC3, 0xCB):  # SOF3 Huffman / SOF11 arithmetic
            if frame is not None:
                raise ValueError("multiple SOF markers")
            arith = marker == 0xCB
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if not 2 <= prec <= 16 or ncomp != 3:
                raise ValueError(
                    f"lossless precision 2-16, 3 components only "
                    f"(prec={prec}, ncomp={ncomp})"
                )
            if h == 0 or w == 0:
                raise ValueError("empty frame")
            comps = []
            for c in range(ncomp):
                cid, sampling, _q = payload[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ValueError(
                        "lossless decode supports 1x1 sampling only"
                    )
                comps.append(cid)
            frame = (h, w, comps, prec)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("not a lossless (SOF3/SOF11) frame")
        elif marker == 0xDD:
            if len(payload) != 2:
                raise ValueError("bad DRI segment")
            restart_interval = struct.unpack(">H", payload)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps, prec = frame
            ns = payload[0]
            if ns != 3 or len(payload) < 1 + 2 * ns + 3:
                raise ValueError("lossless scan must cover 3 components")
            cid_index = {cid: i for i, cid in enumerate(comps)}
            dc_tables: list = [None, None, None]
            cond = None
            for c in range(ns):
                cid, tsels = payload[1 + 2 * c], payload[2 + 2 * c]
                if cid not in cid_index:
                    raise ValueError("scan references unknown component")
                tid = tsels >> 4
                if arith:
                    tcond = dc_cond.get(tid)
                    if tcond is None:
                        from etl_property_rumah123_spark.functions import (
                            jpeg_arith as JA,
                        )

                        tcond = JA.DEFAULT_DC_COND
                    if cond is not None and tcond != cond:
                        raise ValueError(
                            "interleaved lossless scan needs one "
                            "shared conditioning"
                        )
                    cond = tcond
                else:
                    if tid not in htables:
                        raise ValueError("scan references missing DC table")
                    dc_tables[cid_index[cid]] = htables[tid]
            sel, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            pt = ahal & 0xF
            if not 1 <= sel <= 7:
                raise ValueError(f"bad lossless predictor {sel}")
            if se != 0 or (ahal >> 4) != 0:
                raise ValueError("bad lossless scan header (Se/Ah)")
            if pt > prec - 1:
                raise ValueError(f"bad point transform {pt}")
            end = J._find_scan_end(data, pos + 2 + length)
            if arith:
                result = _decode_scan_lossless_arith(
                    data[pos + 2 + length : end], h, w, sel, pt,
                    restart_interval, cond, prec,
                )
            else:
                reader = J._BitReader(data[pos + 2 + length : end])
                result = _decode_scan_lossless(
                    reader, h, w, 3, dc_tables, sel, pt,
                    restart_interval, prec,
                )
            pos = end
            continue
        pos += 2 + length
    if result is None:
        raise ValueError("missing SOF/SOS")
    _, _, _, prec = frame
    shifted = result.astype(np.int64) << pt
    if prec <= 8:
        return np.clip(shifted, 0, 255).astype(np.uint8)
    return np.clip(shifted, 0, (1 << prec) - 1).astype(np.uint16)


# --- H.2: lossless with arithmetic coding (SOF11) --------------------------
#
# The difference-coding decision tree is the sequential-DC one (zero /
# sign / magnitude-category / mantissa under the QM coder), but the
# CONTEXT is spatial: Da (the difference coded at the left neighbor)
# and Db (above) are each classified into the five L/U conditioning
# classes {0-or-small, +small, -small, +large, -large}, and the 25
# (Da, Db) combinations index separate 4-bin state blocks. Magnitude
# category and mantissa bits use one of two shared X/M trees, chosen
# by whether Db's class is large (H.2.2's second state set for the
# high-activity rows).

_LL_XA = 100           # X/M tree when Db class is 0/+S/-S
_LL_XB = 100 + 29      # X/M tree when Db class is +L/-L
_LL_BINS = 158         # 25 contexts x 4 + 2 x (15 X + 14 M)


def _ll_classify(d: int, low: int, up: int) -> int:
    """Five-class L/U conditioning of a difference value — identical
    thresholds to the sequential DC next-context rule (F.1.4.4.1.2):
    0 = zero-or-small, 1/2 = +/- small, 3/4 = +/- large."""
    if d == 0:
        return 0
    sign = 1 if d < 0 else 0
    v = (-d if sign else d) - 1
    m = 0
    if v:
        m = 1
        while v >> 1:
            v >>= 1
            m <<= 1
    if m < (1 << low) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 3 + sign
    return 1 + sign


def _ll_ctx(da: int, db: int, low: int, up: int) -> tuple[int, int]:
    """(context block base, X/M tree base) for neighbor diffs."""
    ca = _ll_classify(da, low, up)
    cb = _ll_classify(db, low, up)
    return 4 * (5 * cb + ca), (_LL_XA if cb < 3 else _LL_XB)


def _ll_encode_diff(enc, stats, diff: int, ctx: int, xbase: int) -> None:
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    v = (-diff if sign else diff) - 1
    enc.encode(stats, ctx + 1, sign)
    st = ctx + 2 + sign
    m = 0
    if v:
        enc.encode(stats, st, 1)
        m = 1
        st = xbase
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
    enc.encode(stats, st, 0)
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(stats, st, 1 if (mm & v) else 0)


def _ll_decode_diff(dec, stats, ctx: int, xbase: int) -> int:
    if dec.read_bit(stats, ctx) == 0:
        return 0
    sign = dec.read_bit(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.read_bit(stats, st)
    if m:
        st = xbase
        while dec.read_bit(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError(
                    "arithmetic lossless magnitude overflow"
                )
            st += 1
    v = m
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.read_bit(stats, st):
            v |= mm
    v += 1
    return -v if sign else v


def encode_jpeg_lossless_arithmetic(
    pixels: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
    restart_rows: int = 0,
    conditioning: tuple[int, int] | None = None,
    precision: int = 8,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an arithmetic-coded
    lossless JPEG (SOF11): same prediction/difference front half as
    :func:`encode_jpeg_lossless`, with the QM coder and the H.2
    spatial (Da, Db) conditioning replacing the Huffman stage. A DAC
    segment declares the conditioning bounds (default L=0, U=1)."""
    from etl_property_rumah123_spark.functions import jpeg_arith as JA

    low, up = conditioning if conditioning is not None else JA.DEFAULT_DC_COND
    if not (0 <= low <= up <= 15):
        raise ValueError("bad DC conditioning bounds")
    diffs = _prepare_diffs(
        pixels, predictor, point_transform, restart_rows, precision
    )
    h, w, _ = pixels.shape

    enc = JA.ArithEncoder()
    stats = JA._Stats(_LL_BINS)
    rst = 0
    restart_y = 0
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            enc.restart(rst)
            rst += 1
            stats.reset()
            restart_y = y
        for x in range(w):
            for ci in range(3):
                da = int(diffs[ci][y, x - 1]) if x > 0 else 0
                db = int(diffs[ci][y - 1, x]) if y > restart_y else 0
                ctx, xbase = _ll_ctx(da, db, low, up)
                _ll_encode_diff(
                    enc, stats, int(diffs[ci][y, x]), ctx, xbase
                )
    enc.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dac = seg(0xFFCC, bytes([0x00, (up << 4) | low]))
    sof = seg(
        0xFFCB,
        struct.pack(">BHHB", precision, h, w, 3)
        + b"".join(struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3)),
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_rows * w))
        if restart_rows
        else b""
    )
    sos = seg(
        0xFFDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([predictor, 0, point_transform]),
    )
    return (
        b"\xff\xd8" + dac + sof + dri + sos + bytes(enc.out) + b"\xff\xd9"
    )


def _decode_scan_lossless_arith(
    data: bytes,
    h: int,
    w: int,
    predictor: int,
    pt: int,
    restart_interval: int,
    cond: tuple[int, int],
    precision: int = _PRECISION,
) -> np.ndarray:
    """QM-decode one interleaved SOF11 scan into (H, W, 3) int32
    reconstructed samples — the arithmetic twin of
    :func:`_decode_scan_lossless`, tracking decoded differences for
    the (Da, Db) conditioning."""
    from etl_property_rumah123_spark.functions import jpeg_arith as JA

    low, up = cond
    dec = JA.ArithDecoder(data)
    stats = JA._Stats(_LL_BINS)
    out = np.zeros((h, w, 3), dtype=np.int32)
    dif = np.zeros((h, w, 3), dtype=np.int32)
    default = 1 << (precision - pt - 1)
    mask = (1 << 16) - 1
    val_mask = (1 << (precision - pt)) - 1
    n_mcu = 0
    expected_rst = 0
    restart_y = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                dec.restart(expected_rst)
                expected_rst += 1
                stats.reset()
                if x != 0:
                    raise ValueError(
                        "restart interval not aligned to sample rows"
                    )
                restart_y = y
            for ci in range(3):
                da = int(dif[y, x - 1, ci]) if x > 0 else 0
                db = int(dif[y - 1, x, ci]) if y > restart_y else 0
                ctx, xbase = _ll_ctx(da, db, low, up)
                diff = _ll_decode_diff(dec, stats, ctx, xbase)
                dif[y, x, ci] = diff
                if y == restart_y:
                    pred = default if x == 0 else int(out[y, x - 1, ci])
                elif x == 0:
                    pred = int(out[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(out[y, x - 1, ci]),
                        int(out[y - 1, x, ci]),
                        int(out[y - 1, x - 1, ci]),
                        predictor,
                    )
                out[y, x, ci] = ((pred + diff) & mask) & val_mask
            n_mcu += 1
    return out
