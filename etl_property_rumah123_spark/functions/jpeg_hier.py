"""Hierarchical JPEG (T.81 Annex J): DHP-framed multi-resolution
pyramids with differential frames — the last of the T.81 coding
processes, built from the public specification only.

Stream shape produced by :func:`encode_jpeg_hierarchical`:

    SOI  DHP(final dims)
         [tables]  SOF0(level-N dims)  SOS  ...      <- base frame
         EXP  [tables]  SOF5(level-N-1 dims)  SOS ...<- differential
         ...                                            frames, one
         EOI                                            per level

The base frame is an ordinary sequential-DCT frame at the coarsest
resolution; each subsequent frame doubles the reference with the
J.1.1.2 bilinear upsampling filter (even samples copied, odd samples
``(a + b + 1) >> 1`` with edge replication) and codes the residual as
a differential sequential frame (SOF5): no level shift, DC coded with
zero prediction, quantized coefficients clamped to the frame
alphabet's category bounds (8-bit baseline tables: +-2047 DC /
+-1023 AC; 12-bit flat tables: +-32767 / +-16383 — an encoder-side
choice the format permits; clamping only costs residual accuracy,
never validity). Both table-B.2 precisions are supported: at
``precision=12`` the base frame is SOF1 (baseline SOF0 is 8-bit-only)
with 16-bit DQT entries and 2048 level shift.

Components are coded as RGB directly (identity color transform, 1x1
sampling): hierarchical accumulation happens in the coded component
domain, and keeping that domain RGB avoids compounding YCbCr rounding
into every pyramid level. Scale note for the Spark pipeline: like the
other codecs this runs inside Arrow-batched ``mapInPandas`` stages —
per-payload work, embarrassingly parallel at any corpus size.

Decoding reuses the sequential scan machinery of
:mod:`etl_property_rumah123_spark.functions.jpeg` (``_decode_scan``
into a per-frame coefficient store) and carries the same
ValueError-only corrupt-input contract, fuzz-pinned in
tests/test_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_property_rumah123_spark.functions import jpeg as J

#: Differential-coefficient clamps per precision: the largest values
#: the frame's Huffman alphabet can code (8-bit baseline tables: DC
#: category 11 / AC size 10; 12-bit flat tables: DC 15 / AC 14).
#: Clamping is an encoder-side choice the format permits — it only
#: costs residual accuracy, never validity.
_CLAMPS = {8: (2047, 1023), 12: (32767, 16383)}


def _upsample2(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 upsampling filter, applied per axis when the EXP flag
    for that axis is set: out[2i] = in[i], out[2i+1] = (in[i] +
    in[i+1] + 1) >> 1 with edge replication."""
    out = plane
    if ev:
        h = out.shape[0]
        up = np.empty((2 * h, out.shape[1]), dtype=out.dtype)
        up[0::2] = out
        nxt = np.vstack([out[1:], out[-1:]])
        up[1::2] = (out + nxt + 1) >> 1
        out = up
    if eh:
        w = out.shape[1]
        up = np.empty((out.shape[0], 2 * w), dtype=out.dtype)
        up[:, 0::2] = out
        nxt = np.hstack([out[:, 1:], out[:, -1:]])
        up[:, 1::2] = (out + nxt + 1) >> 1
        out = up
    return out


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """Encoder-side 2x2 mean downsample (the downsampling filter is
    the encoder's choice per J.1.1.1); odd edges replicate."""
    h, w = plane.shape
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    p = np.pad(
        plane.astype(np.int32), ((0, ph - h), (0, pw - w)), mode="edge"
    )
    return (
        p.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) + 2
    ) // 4


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad a plane to 8x8 multiples (edge replication) and return the
    (by, bx, 8, 8) float64 block view."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(
        plane.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
    )
    return (
        p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    )


def _quantize_frame(
    planes: list[np.ndarray],
    quant: np.ndarray,
    differential: bool,
    precision: int = 8,
) -> list[np.ndarray]:
    """FDCT + quantize every block of every plane; returns per-plane
    (by, bx, 64) int zigzag coefficients (clamped for differential
    frames so every value fits the frame's Huffman alphabet)."""
    half = float(1 << (precision - 1))
    clamp_dc, clamp_ac = _CLAMPS[precision]
    out = []
    for plane in planes:
        blocks = _blocks_of(
            plane if differential else plane.astype(np.float64) - half
        )
        coef = np.einsum("ur,yxrc,cv->yxuv", J._A, blocks, J._A.T)
        q = np.round(coef / quant).astype(np.int64)
        if differential:
            q[:, :, 0, 0] = np.clip(q[:, :, 0, 0], -clamp_dc, clamp_dc)
            q = np.clip(q, -clamp_ac, clamp_ac)  # re-clamps DC harmlessly
        out.append(q[:, :, J._ZZ_R, J._ZZ_C])
    return out


def _reconstruct_frame(
    zz_planes: list[np.ndarray],
    quant: np.ndarray,
    h: int,
    w: int,
    differential: bool,
    precision: int = 8,
) -> list[np.ndarray]:
    """Dequantize + IDCT back to (H, W) int32 planes — the SHARED
    reconstruction the encoder uses to form residuals and the decoder
    uses to rebuild frames, so both sides agree sample-for-sample."""
    out = []
    for zz in zz_planes:
        by, bx, _ = zz.shape
        blocks = np.zeros((by, bx, 8, 8), dtype=np.float64)
        blocks[:, :, J._ZZ_R, J._ZZ_C] = zz.astype(np.float64)
        blocks *= quant
        plane = np.einsum("ur,yxrc,cv->yxuv", J._A.T, blocks, J._A)
        if not differential:
            plane += float(1 << (precision - 1))
        plane = plane.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        out.append(np.rint(plane[:h, :w]).astype(np.int32))
    return out


def _entropy_encode_frame(
    zz_planes: list[np.ndarray], differential: bool, precision: int = 8
) -> bytes:
    """Huffman-code the interleaved (1x1) MCUs of a frame. DC uses
    zero prediction in differential frames (F.2.1.3.1)."""
    if precision == 8:
        dc_codes = J._build_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)
        ac_codes = J._build_codes(J.AC_LUM_BITS, J.AC_LUM_VALS)
    else:
        dc_codes = J._build_codes(J.DC12_BITS, J.DC12_VALS)
        ac_codes = J._build_codes(J.AC12_BITS, J.AC12_VALS)
    writer = J._BitWriter()
    by, bx, _ = zz_planes[0].shape
    prev = [0, 0, 0]
    for y in range(by):
        for x in range(bx):
            for ci, zz_plane in enumerate(zz_planes):
                zz = zz_plane[y, x]
                diff = int(zz[0]) - prev[ci]
                if not differential:
                    prev[ci] = int(zz[0])
                size, bits = J._magnitude(diff)
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
                        code, length = ac_codes[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits = J._magnitude(v)
                    code, length = ac_codes[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if last_nz != 63:
                    code, length = ac_codes[0x00]
                    writer.write(code, length)
    writer.flush()
    return bytes(writer.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _frame_header(marker: int, h: int, w: int, precision: int = 8) -> bytes:
    return _seg(
        marker,
        struct.pack(">BHHB", precision, h, w, 3)
        + b"".join(struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3)),
    )


def encode_jpeg_hierarchical(
    pixels: np.ndarray, quality: int = 85, levels: int = 2,
    precision: int = 8,
) -> bytes:
    """Encode an (H, W, 3) RGB array as a hierarchical JPEG
    (Annex J): a sequential base frame at 1/2^(levels-1) resolution
    plus one differential (SOF5) refinement frame per doubling.
    ``precision`` 12 (uint16 samples 0..4095) uses the x16-scaled
    16-bit DQT, 2048 level shift, and the flat extended Huffman
    alphabets — completing the table-B.2 precision pair for the
    hierarchical process too."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    if not 2 <= levels <= 4:
        raise ValueError("levels must be 2..4 (1 would not be hierarchical)")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12 and (pixels.min() < 0 or pixels.max() > 4095):
        raise ValueError("12-bit samples must be 0..4095")
    h, w, _ = pixels.shape
    qlum, _ = J.scaled_quant_tables(quality)
    if precision == 12:
        qlum = qlum * 16
    quant = qlum.astype(np.float64)
    top = (1 << precision) - 1

    # resolution pyramid, full -> coarse
    level_planes = [[pixels[:, :, c].astype(np.int32) for c in range(3)]]
    for _lv in range(levels - 1):
        level_planes.append(
            [_downsample2(p) for p in level_planes[-1]]
        )
    level_planes.reverse()  # coarse -> full

    out = bytearray(b"\xff\xd8")
    # DHP (SOF syntax)
    out += _seg(0xFFDE, _frame_header(0xFFDE, h, w, precision)[4:])
    if precision == 8:
        dqt = _seg(
            0xFFDB,
            bytes([0x00])
            + bytes(int(quant[r][c]) for r, c in J.ZIGZAG),
        )
        dht = (
            _seg(
                0xFFC4,
                bytes([0x00]) + bytes(J.DC_LUM_BITS) + bytes(J.DC_LUM_VALS),
            )
            + _seg(
                0xFFC4,
                bytes([0x10]) + bytes(J.AC_LUM_BITS) + bytes(J.AC_LUM_VALS),
            )
        )
    else:
        dqt = _seg(
            0xFFDB,
            bytes([0x10])
            + b"".join(
                struct.pack(">H", int(quant[r][c])) for r, c in J.ZIGZAG
            ),
        )
        dht = (
            _seg(
                0xFFC4,
                bytes([0x00]) + bytes(J.DC12_BITS) + bytes(J.DC12_VALS),
            )
            + _seg(
                0xFFC4,
                bytes([0x10]) + bytes(J.AC12_BITS) + bytes(J.AC12_VALS),
            )
        )
    sos = _seg(
        0xFFDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([0, 63, 0]),
    )

    ref: list[np.ndarray] | None = None
    base_marker = 0xFFC0 if precision == 8 else 0xFFC1
    for li, planes in enumerate(level_planes):
        lh, lw = planes[0].shape
        if li == 0:
            zz = _quantize_frame(planes, quant, False, precision)
            recon = _reconstruct_frame(zz, quant, lh, lw, False, precision)
            ref = [np.clip(p, 0, top) for p in recon]
            out += dqt + dht + _frame_header(base_marker, lh, lw, precision)
            out += sos
            out += _entropy_encode_frame(zz, False, precision)
        else:
            ref = [
                _upsample2(p, 1, 1)[:lh, :lw] for p in ref  # type: ignore[union-attr]
            ]
            residual = [planes[c] - ref[c] for c in range(3)]
            zz = _quantize_frame(residual, quant, True, precision)
            recon = _reconstruct_frame(zz, quant, lh, lw, True, precision)
            ref = [
                np.clip(ref[c] + recon[c], -32768, 32767) for c in range(3)
            ]
            out += _seg(0xFFDF, bytes([0x11]))  # EXP: expand both axes
            out += _frame_header(0xFFC5, lh, lw, precision) + sos
            out += _entropy_encode_frame(zz, True, precision)
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_hierarchical(data: bytes) -> np.ndarray:
    """Decode a hierarchical JPEG (DHP + SOF0 base + SOF5 differential
    frames, 8-bit, 3 components, 1x1 sampling) to (H, W, 3) uint8."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    dhp = None
    precision = 8
    ref: list[np.ndarray] | None = None
    cur = None  # (differential, h, w, comps)
    coeffs: list[np.ndarray] = []
    dims: list[tuple] = []
    restart_interval = 0
    pending_exp = None

    def finalize_frame() -> None:
        nonlocal ref, cur, coeffs, dims
        differential, fh, fw, comps = cur
        qsel = comps[0][3]
        if qsel not in qtables:
            raise ValueError("frame references missing quant table")
        quant = qtables[qsel].astype(np.float64)
        zz = [c.astype(np.int64) for c in coeffs]
        if differential:
            # Differential frames code DC with ZERO prediction
            # (F.2.1.3.1); the shared _decode_scan accumulated its
            # usual per-component prefix sums in raster MCU order, so
            # undo them here (restart intervals would reset the
            # prefix mid-stream — refused above for these frames).
            for c in zz:
                dc = c[:, :, 0].reshape(-1)
                c[:, :, 0] = np.diff(dc, prepend=0).reshape(
                    c.shape[0], c.shape[1]
                )
        recon = _reconstruct_frame(zz, quant, fh, fw, differential, precision)
        if differential:
            if ref is None:
                raise ValueError("differential frame without a reference")
            if ref[0].shape != (fh, fw):
                raise ValueError(
                    "differential frame dims do not match the "
                    "(expanded) reference"
                )
            ref = [
                np.clip(ref[c] + recon[c], -32768, 32767) for c in range(3)
            ]
        else:
            if ref is not None:
                raise ValueError("second non-differential frame")
            ref = [np.clip(p, 0, (1 << precision) - 1) for p in recon]
        cur = None
        coeffs, dims = [], []

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
        if marker == 0xDB:
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0xF
                if prec not in (0, 1):
                    raise ValueError(f"bad DQT precision {prec}")
                step = 1 + (prec + 1) * 64
                if i + step > len(payload):
                    raise ValueError("truncated DQT")
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(J.ZIGZAG):
                    if prec:
                        t[r][c] = struct.unpack(
                            ">H", payload[i + 1 + 2 * k : i + 3 + 2 * k]
                        )[0]
                    else:
                        t[r][c] = payload[i + 1 + k]
                qtables[tid] = t
                i += step
        elif marker == 0xC4:
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
                htables[(tclass, tid)] = J._build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDE:  # DHP
            if dhp is not None:
                raise ValueError("multiple DHP markers")
            prec, fh, fw, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec not in (8, 12) or ncomp != 3:
                raise ValueError(
                    "only 8/12-bit 3-component hierarchical supported"
                )
            precision = prec
            dhp = (fh, fw)
        elif marker == 0xDF:  # EXP
            if len(payload) != 1:
                raise ValueError("bad EXP segment")
            if ref is None:
                raise ValueError("EXP before any frame")
            eh, ev = payload[0] >> 4, payload[0] & 0xF
            if eh not in (0, 1) or ev not in (0, 1):
                raise ValueError("EXP expands by at most 2 per axis")
            pending_exp = (eh, ev)
        elif marker in (0xC0, 0xC1, 0xC5):
            # base frame: SOF0 (8-bit) or SOF1 (extended sequential,
            # the 12-bit base a hierarchical stream must use, since
            # baseline is 8-bit-only per table B.2); SOF5 differential
            if dhp is None:
                raise ValueError("hierarchical frame before DHP")
            if cur is not None:
                raise ValueError("frame started before previous finished")
            differential = marker == 0xC5
            prec, fh, fw, ncomp = struct.unpack(">BHHB", payload[:6])
            allowed = (8,) if marker == 0xC0 else (8, 12)
            if prec not in allowed or ncomp != 3:
                raise ValueError(
                    "unsupported precision/component count for "
                    f"hierarchical SOF{marker - 0xC0}"
                )
            if prec != precision:
                raise ValueError("frame precision differs from DHP")
            if fh == 0 or fw == 0:
                raise ValueError("empty frame")
            comps = []
            for c in range(ncomp):
                cid, sampling, qsel = payload[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ValueError(
                        "hierarchical decode supports 1x1 sampling only"
                    )
                comps.append((cid, 1, 1, qsel))
            if differential and pending_exp is not None:
                ref = [
                    _upsample2(p, *pending_exp)[:fh, :fw] for p in ref
                ]
                pending_exp = None
            cur = (differential, fh, fw, comps)
            bx, by = -(-fw // 8), -(-fh // 8)
            coeffs = [np.zeros((by, bx, 64), dtype=np.int64) for _ in range(3)]
            dims = [(bx, by, bx, by) for _ in range(3)]
        elif marker in (0xC2, 0xC3, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "hierarchical decode supports sequential base "
                "(SOF0/SOF1) and differential sequential (SOF5) "
                "frames only"
            )
        elif marker == 0xDD:
            if len(payload) != 2:
                raise ValueError("bad DRI segment")
            restart_interval = struct.unpack(">H", payload)[0]
        elif marker == 0xDA:
            if cur is None:
                raise ValueError("SOS outside a frame")
            differential, fh, fw, comps = cur
            ns = payload[0]
            scan_comps = []
            cid_index = {c[0]: i for i, c in enumerate(comps)}
            for c in range(ns):
                cid, tsels = payload[1 + 2 * c], payload[2 + 2 * c]
                if cid not in cid_index:
                    raise ValueError("scan references unknown component")
                scan_comps.append((cid_index[cid], tsels >> 4, tsels & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            if ss != 0 or se != 63 or ahal != 0:
                raise ValueError(
                    "hierarchical scans must cover the full band"
                )
            if differential and restart_interval:
                raise ValueError(
                    "restart intervals unsupported in differential frames"
                )
            end = J._find_scan_end(data, pos + 2 + length)
            reader = J._BitReader(data[pos + 2 + length : end])
            J._decode_scan(
                reader, False, comps, scan_comps, 0, 63, 0, 0,
                coeffs, dims, htables, qtables, restart_interval,
            )
            finalize_frame()
            pos = end
            continue
        pos += 2 + length
    if ref is None:
        raise ValueError("missing frames")
    if cur is not None:
        raise ValueError("unterminated frame")
    fh, fw = dhp
    if ref[0].shape != (fh, fw):
        raise ValueError("decoded pyramid does not reach the DHP dims")
    top = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    return np.clip(np.stack(ref, axis=-1), 0, top).astype(dtype)
