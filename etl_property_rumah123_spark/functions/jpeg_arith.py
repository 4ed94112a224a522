"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D and F), numpy/stdlib
only — the QM binary arithmetic coder plus the sequential DC/AC
statistical models, closing the last in-scope codec gap left by the
Huffman baseline/progressive decoder in :mod:`.jpeg`.

Public algorithm provenance: the QM-coder state machine (Table D.3's
113 probability-estimation states + the non-adaptive "fixed" state),
the encoder/decoder register procedures (D.1 CODELPS/CODEMPS/BYTEOUT/
FLUSH, D.2 DECODE/BYTEIN with zero-byte unstuffing and zero-fed
marker tails), and the conditioning models (F.1.4 encode / F.2.1
decode: 5-class DC DIFF contexts driven by the L/U thresholds, per-
index AC EOB/run/magnitude bins split at Kx) are all from the public
T.81 specification; the register formulation follows the widely-
published IJG realization of those flowcharts (count-deferred byte
output with 0xFF stacking and carry resolution on the encode side,
shift-counted comparison on the decode side), re-implemented here in
Python against our zigzag-order coefficient store.

Scope: sequential DC+AC (SOF9) with interleaved or single-component
scans AND progressive (SOF10, Annex G.2: DC-first on Al-scaled DIFFs,
fixed-bin DC refinement, spectrally-windowed AC-first, in-place AC
refinement with EOB decisions past the previous scan's end), DAC
conditioning tables (defaults L=0, U=1, Kx=5 when absent), restart
intervals (encoder flushes + emits RSTn + full statistics reset;
decoder resynchronizes and reinitializes), the same 8-bit 3-component
sampling-factor envelope as the Huffman path. Correctness bar
(tests/test_multimodal.py): EXACT pixel parity with the Huffman
decode of the same quantized coefficients — entropy coding is
lossless, so all four paths (baseline/progressive x Huffman/
arithmetic) must agree bit-for-bit after IDCT.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Table D.3: Qe probability-estimation state machine -------------------
# (Qe, NMPS, NLPS, SWITCH); index 113 is the non-adaptive ~0.5 state the
# AC sign decision uses (NMPS = NLPS = self, never switches).

_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

#: default conditioning (F.1.4.4.1.2 / F.1.4.4.2): DC DIFF class
#: thresholds (L, U) and the AC low/high spectral split Kx
DEFAULT_DC_COND = (0, 1)
DEFAULT_AC_COND = 5

# Statistics-area layout (Table F.4, zigzag index space):
#   DC: 5 context classes x 4 bins (S0,SS,SP,SN) = 0..19, X1..X15 at
#       20..34, shared magnitude-bit bin at Xn+14 -> 49 bins.
#   AC: 3 bins (SE,S0,SP/SN) per k = 0..188, then the X2.. chains at
#       189 (k <= Kx) and 217 (k > Kx), magnitude bits at Xn+14 -> 245.
_DC_BINS = 49
_AC_BINS = 245
_X1 = 20
_AC_XLOW = 189
_AC_XHIGH = 217


class _Stats:
    """One statistics area: per-bin (state index, MPS sense)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int) -> None:
        self.idx = bytearray(n)
        self.mps = bytearray(n)

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


def _fixed_bin() -> _Stats:
    s = _Stats(1)
    s.idx[0] = 113  # non-adaptive ~0.5 state (NMPS = NLPS = 113)
    return s


class ArithEncoder:
    """QM arithmetic encoder (T.81 D.1): 16-bit interval register A,
    carry-deferred byte output (pending ``buffer`` byte, stacked 0xFF
    count ``sc``, deferred zero count ``zc``), 0xFF -> 0xFF 0x00 byte
    stuffing identical to the Huffman entropy segment convention."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._reinit()

    def _reinit(self) -> None:
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # -1: nothing pending yet
        self.sc = 0
        self.zc = 0

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)

    def _flush_zeros(self) -> None:
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def _byte_out(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry ripples into the pending byte and every stacked 0xFF
            if self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer + 1)
            self.zc += self.sc  # carried 0xFF bytes became 0x00
            self.sc = 0
            self.buffer = temp & 0xFF  # spacer bits keep this < 0xFF
        elif temp == 0xFF:
            self.sc += 1  # withhold: a later carry may bump it
        else:
            if self.buffer == 0:
                self.zc += 1  # defer zeros: trailing ones are dropped
            elif self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, stats: _Stats, i: int, val: int) -> None:
        qe, nmps, nlps, switch = _QE[stats.idx[i]]
        mps = stats.mps[i]
        self.a -= qe
        if val != mps:
            # LPS: upper subinterval (size qe) unless the conditional
            # exchange applies (the MPS subinterval shrank below qe)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                stats.mps[i] = 1 - mps
            stats.idx[i] = nlps
        else:
            if self.a >= 0x8000:
                return  # MPS fast path: lower subinterval, no renorm
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats.idx[i] = nmps
        while True:  # renormalize (D.1.6)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a >= 0x8000:
                break

    def flush(self) -> None:
        """Terminate (D.1.8): pick the in-interval code point with the
        most trailing zeros, drain pending bytes, drop trailing zeros."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:  # final carry
            if self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer + 1)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        if self.c & 0x7FFF800:
            self._flush_zeros()
            self._emit((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self._emit((self.c >> 11) & 0xFF)
        self.buffer = -1

    def restart(self, n: int) -> None:
        """Flush, emit the cycling RSTn marker, reinitialize registers
        (statistics areas are the caller's to reset — E.2.4)."""
        self.flush()
        self.out.extend(bytes([0xFF, 0xD0 + (n % 8)]))
        self._reinit()


class ArithDecoder:
    """QM arithmetic decoder (T.81 D.2) over one entropy-coded
    segment: 0xFF 0x00 unstuffs to a 0xFF data byte; any real marker
    (or end of segment) switches the feed to zero bytes, which is how
    the final symbols drain per the spec's termination convention."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.marker_pos: int | None = None  # offset of the 0xFF
        self._reinit()

    def _reinit(self) -> None:
        self.c = 0
        self.a = 0
        self.ct = -16  # forces two initial byte fetches

    def _fetch(self) -> int:
        if self.marker_pos is not None:
            return 0
        d, n = self.data, len(self.data)
        if self.bp >= n:
            self.marker_pos = n
            return 0
        b = d[self.bp]
        if b != 0xFF:
            self.bp += 1
            return b
        j = self.bp + 1
        while j < n and d[j] == 0xFF:  # fill bytes before a marker
            j += 1
        if j >= n:
            self.marker_pos = self.bp
            return 0
        if d[j] == 0:
            self.bp = j + 1
            return 0xFF  # stuffed zero: the data byte was 0xFF
        self.marker_pos = j - 1
        return 0

    def read_bit(self, stats: _Stats, i: int) -> int:
        # renormalize + feed (D.2.6); the shift-counted comparison
        # keeps C unshifted and scales A instead
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._fetch()
                self.ct += 8
                if self.ct < 0:  # still initializing
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # doubled to 0x10000 below
            self.a <<= 1
        qe, nmps, nlps, switch = _QE[stats.idx[i]]
        mps = stats.mps[i]
        self.a -= qe
        temp = self.a << self.ct
        if self.c >= temp:
            self.c -= temp
            # upper subinterval: LPS unless conditionally exchanged
            if self.a < qe:
                d = mps
                stats.idx[i] = nmps
            else:
                d = 1 - mps
                if switch:
                    stats.mps[i] = 1 - mps
                stats.idx[i] = nlps
            self.a = qe
        elif self.a < 0x8000:
            # lower subinterval, renorm pending: exchange possible
            if self.a < qe:
                d = 1 - mps
                if switch:
                    stats.mps[i] = 1 - mps
                stats.idx[i] = nlps
            else:
                d = mps
                stats.idx[i] = nmps
        else:
            d = mps  # lower subinterval, fast path: no estimation
        return d

    def restart(self, n: int) -> None:
        """Resynchronize at the expected RSTn marker and reinitialize
        (statistics + predictors are the scan loop's to reset)."""
        if self.marker_pos is None:
            # scan forward for the next marker, honoring B.1.1.2: a
            # RUN of 0xFF bytes is fill before the marker byte, and
            # 0xFF 0x00 is stuffed data — naive first-0xFF matching
            # misread '... FF FF D0' as a bad marker
            d, nlen = self.data, len(self.data)
            j = self.bp
            while j < nlen:
                if d[j] != 0xFF:
                    j += 1
                    continue
                m = j
                while m + 1 < nlen and d[m + 1] == 0xFF:
                    m += 1  # skip fill bytes
                if m + 1 >= nlen:
                    break
                if d[m + 1] == 0x00:
                    j = m + 2  # stuffed data byte, keep scanning
                    continue
                self.marker_pos = m  # the 0xFF adjacent to the marker
                break
            if self.marker_pos is None:
                raise ValueError(
                    "expected RSTn restart marker in arithmetic scan"
                )
        mp = self.marker_pos
        if (
            mp + 1 >= len(self.data)
            or self.data[mp] != 0xFF
            or self.data[mp + 1] != 0xD0 + (n % 8)
        ):
            raise ValueError(
                "expected RSTn restart marker in arithmetic scan"
            )
        self.bp = mp + 2
        self.marker_pos = None
        self._reinit()


# --- F.1.4 / F.2.1: sequential DC and AC statistical models ---------------


def _encode_dc_diff(enc, dcs: _Stats, diff: int, ctx: int, cond) -> int:
    """Encode one DC DIFF in context class ``ctx``; returns the next
    block's context class per the L/U classification (F.1.4.4.1.2)."""
    low, up = cond
    if diff == 0:
        enc.encode(dcs, ctx, 0)
        return 0
    enc.encode(dcs, ctx, 1)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(dcs, ctx + 1, sign)
    st = ctx + 2 + sign  # SP or SN
    m = 0
    v -= 1
    if v:
        enc.encode(dcs, st, 1)
        m = 1
        st = _X1
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.encode(dcs, st, 1)
            m <<= 1
            st += 1
    enc.encode(dcs, st, 0)
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(dcs, st, 1 if (mm & v) else 0)
    return nctx


def _decode_dc_diff(dec, dcs: _Stats, ctx: int, cond) -> tuple[int, int]:
    """Decode one DC DIFF; returns (diff, next context class)."""
    low, up = cond
    if dec.read_bit(dcs, ctx) == 0:
        return 0, 0
    sign = dec.read_bit(dcs, ctx + 1)
    st = ctx + 2 + sign
    m = dec.read_bit(dcs, st)
    if m:
        st = _X1
        while dec.read_bit(dcs, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    v = m
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.read_bit(dcs, st):
            v |= mm
    v += 1
    return (-v if sign else v), nctx


def _encode_ac_coefs(
    enc, acs: _Stats, fixed: _Stats, zz, kx: int,
    ss: int = 1, se: int = 63, al: int = 0,
) -> None:
    """Encode zz[ss..se] (zigzag) per F.1.4.3 / G.1.3.2: per-index
    EOB decision, zero-run, fixed-bin sign, magnitude category split
    at Kx. ``al`` is the successive-approximation point transform
    (progressive AC-first scans code ``|coef| >> al``); the
    sequential case is ss=1, se=63, al=0."""
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)  # not EOB at this index
        c = int(zz[k])
        v = abs(c) >> al
        while v == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
            c = int(zz[k])
            v = abs(c) >> al
        enc.encode(acs, st + 1, 1)
        sign = 1 if c < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(acs, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(acs, st, 1)  # same bin decides category 2
                m <<= 1
                st = _AC_XLOW if k <= kx else _AC_XHIGH
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(acs, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(acs, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(acs, st, 1 if (mm & v) else 0)
        k += 1
    if ke < se:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB


def _decode_ac_coefs(
    dec, acs: _Stats, fixed: _Stats, zz, kx: int,
    ss: int = 1, se: int = 63, al: int = 0,
) -> None:
    """Decode AC coefficients into zz[ss..se] (zigzag) per F.2.1.3.2
    / G.2.2; decoded values are scaled back up by ``al`` (two's-
    complement shift, matching the Huffman progressive store)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.read_bit(acs, st):
            return  # EOB
        while dec.read_bit(acs, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC index overflow")
        sign = dec.read_bit(fixed, 0)
        st += 2
        m = dec.read_bit(acs, st)
        if m:
            if dec.read_bit(acs, st):
                m <<= 1
                st = _AC_XLOW if k <= kx else _AC_XHIGH
                while dec.read_bit(acs, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if dec.read_bit(acs, st):
                v |= mm
        v += 1
        if sign:
            v = -v
        zz[k] = v << al
        k += 1


def _encode_ac_refine(
    enc, acs: _Stats, fixed: _Stats, zz, ss: int, se: int, al: int
) -> None:
    """AC successive-approximation refinement encode (G.1.3.3): for
    each index up to the NEW end-of-band — EOB decisions only past
    the PREVIOUS scan's end (kex, magnitude at Ah = al+1 precision) —
    previously-nonzero coefficients get their next bit (st+2),
    newly-nonzero ones a significance flag (st+1) plus a fixed-bin
    sign, zeros a run continuation."""
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zz[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(acs, st, 0)  # not EOB yet
        while True:
            c = int(zz[k])
            v = abs(c) >> al
            if v:
                if v > 1:  # previously nonzero: next magnitude bit
                    enc.encode(acs, st + 2, v & 1)
                else:  # newly nonzero at this precision
                    enc.encode(acs, st + 1, 1)
                    enc.encode(fixed, 0, 1 if c < 0 else 0)
                break
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB


def _decode_ac_refine(
    dec, acs: _Stats, fixed: _Stats, zz, ss: int, se: int, al: int
) -> None:
    """AC refinement decode (G.2.2), in-place on the zigzag store."""
    p1 = 1 << al
    m1 = (-1) << al
    kex = se
    while kex >= ss and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.read_bit(acs, st):
                return  # EOB
        while True:
            c = int(zz[k])
            if c:
                if dec.read_bit(acs, st + 2):
                    zz[k] = c + (m1 if c < 0 else p1)
                break
            if dec.read_bit(acs, st + 1):
                zz[k] = m1 if dec.read_bit(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refine index overflow")
        k += 1


# --- scan-level decode (called from jpeg._decode_jpeg_impl) ---------------


class _ScanStats:
    """Per-scan statistics state: areas per table id + per-component
    DC conditioning, reset together at scan start and restarts."""

    def __init__(self, ncomp: int) -> None:
        self.dc = {tid: _Stats(_DC_BINS) for tid in range(4)}
        self.ac = {tid: _Stats(_AC_BINS) for tid in range(4)}
        self.fixed = _fixed_bin()
        self.ncomp = ncomp
        self.reset_context()

    def reset_context(self) -> None:
        self.dc_context = [0] * self.ncomp
        self.last_dc = [0] * self.ncomp

    def reset_all(self) -> None:
        for s in self.dc.values():
            s.reset()
        for s in self.ac.values():
            s.reset()
        self.reset_context()


def decode_scan_arith(
    data: bytes, comps, scan_comps, ss, se, ah, al,
    coeffs, dims, conditioning, restart_interval=0,
    progressive=False,
) -> None:
    """Decode one arithmetic-coded scan into the zigzag coefficient
    store — the arithmetic twin of ``jpeg._decode_scan``. Sequential
    (SOF9): one full-band pass per block. Progressive (SOF10, Annex
    G.2): DC-first scans run the sequential DC model on Al-scaled
    DIFFs, DC refinement is one fixed-bin bit per block, AC-first is
    the sequential AC model windowed to [Ss, Se] with Al scaling, AC
    refinement codes correction/significance bits in-place.
    ``conditioning`` maps ('dc'|'ac', table id) -> (L, U) | Kx from
    DAC segments; defaults apply per table when absent."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError(
                "progressive AC scan must be single-component"
            )
        if ss > se or se > 63:
            raise ValueError("bad spectral selection")
        if ah not in range(14) or al not in range(14) or (
            ah and ah != al + 1
        ):
            raise ValueError("bad successive approximation")
    elif ss != 0 or se != 63 or ah != 0 or al != 0:
        raise ValueError(
            "sequential arithmetic scan must cover the full band"
        )
    stats = _ScanStats(len(scan_comps))
    dec = ArithDecoder(data)
    n_restart = 0

    def dc_cond(tid):
        return conditioning.get(("dc", tid), DEFAULT_DC_COND)

    def ac_cond(tid):
        return conditioning.get(("ac", tid), DEFAULT_AC_COND)

    def decode_dc_unit(zz, pos_in_scan, dc_tid):
        if progressive and ah > 0:  # DC refinement: one fixed-bin bit
            if dec.read_bit(stats.fixed, 0):
                zz[0] |= 1 << al
            return
        diff, nctx = _decode_dc_diff(
            dec, stats.dc[dc_tid],
            stats.dc_context[pos_in_scan], dc_cond(dc_tid),
        )
        stats.dc_context[pos_in_scan] = nctx
        stats.last_dc[pos_in_scan] += diff
        zz[0] = stats.last_dc[pos_in_scan] << al

    def decode_block(zz, pos_in_scan, dc_tid, ac_tid):
        decode_dc_unit(zz, pos_in_scan, dc_tid)
        if not progressive:
            _decode_ac_coefs(
                dec, stats.ac[ac_tid], stats.fixed, zz, ac_cond(ac_tid)
            )

    state = {"n": 0}

    def maybe_restart(total_units: int) -> None:
        nonlocal n_restart
        state["n"] += 1
        if (
            restart_interval
            and state["n"] % restart_interval == 0
            and state["n"] < total_units
        ):
            dec.restart(n_restart)
            n_restart += 1
            stats.reset_all()

    if progressive and ss > 0:  # AC scan: single component, raster
        ci, _dc_tid, ac_tid = scan_comps[0]
        bw_true, bh_true, _, _ = dims[ci]
        for by in range(bh_true):
            for bx in range(bw_true):
                zz = coeffs[ci][by, bx]
                if ah == 0:
                    _decode_ac_coefs(
                        dec, stats.ac[ac_tid], stats.fixed, zz,
                        ac_cond(ac_tid), ss, se, al,
                    )
                else:
                    _decode_ac_refine(
                        dec, stats.ac[ac_tid], stats.fixed, zz,
                        ss, se, al,
                    )
                maybe_restart(bw_true * bh_true)
    elif len(scan_comps) > 1:  # interleaved MCU order (DC/full scans)
        ci0 = scan_comps[0][0]
        mcux = dims[ci0][2] // comps[ci0][1]
        mcuy = dims[ci0][3] // comps[ci0][2]
        for my in range(mcuy):
            for mx in range(mcux):
                for pos_in_scan, (ci, dc_tid, ac_tid) in enumerate(
                    scan_comps
                ):
                    _, hs, vs, _q = comps[ci]
                    for vy in range(vs):
                        for hx in range(hs):
                            by, bx = my * vs + vy, mx * hs + hx
                            decode_block(
                                coeffs[ci][by, bx], pos_in_scan,
                                dc_tid, ac_tid,
                            )
                maybe_restart(mcux * mcuy)
    else:  # single component: its true block grid
        ci, dc_tid, ac_tid = scan_comps[0]
        bw_true, bh_true, _, _ = dims[ci]
        for by in range(bh_true):
            for bx in range(bw_true):
                decode_block(coeffs[ci][by, bx], 0, dc_tid, ac_tid)
                maybe_restart(bw_true * bh_true)


# --- encoder --------------------------------------------------------------


def encode_jpeg_arithmetic(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (H, W, 3) RGB array as a sequential
    arithmetic-coded JPEG (SOF9): the SHARED quantization front half
    (``jpeg._quantize_planes`` — same coefficients as every other
    encoder in the module, which is what makes the cross-path
    pixel-parity contract hold by construction) with the QM coder
    replacing Huffman in the entropy stage, and a DAC segment
    declaring the (default) conditioning so the parser path is
    exercised. ``precision`` 12 (uint16, 0..4095) uses the x16-scaled
    16-bit DQT front half; the QM magnitude trees already span the
    12-bit coefficient range (F.1.4.4.1.2 caps at 32767), so the
    entropy stage is unchanged."""
    from etl_property_rumah123_spark.functions import jpeg as J

    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("restart_interval must be 0..65535")
    h, w, samp, coeffs, _true_dims = J._quantize_planes(
        pixels, quality, subsampling, precision
    )

    enc = ArithEncoder()
    stats = _ScanStats(3)
    mcux = coeffs[0].shape[1] // samp[0][0]
    mcuy = coeffs[0].shape[0] // samp[0][1]
    state = {"n": 0, "r": 0}

    def encode_block(zz, comp):
        tid = 0 if comp == 0 else 1
        diff = int(zz[0]) - stats.last_dc[comp]
        stats.last_dc[comp] = int(zz[0])
        stats.dc_context[comp] = _encode_dc_diff(
            enc, stats.dc[tid], diff,
            stats.dc_context[comp], DEFAULT_DC_COND,
        )
        _encode_ac_coefs(
            enc, stats.ac[tid], stats.fixed, zz, DEFAULT_AC_COND
        )

    def emit_restart() -> None:
        state["n"] += 1
        if (
            restart_interval
            and state["n"] % restart_interval == 0
            and state["n"] < mcux * mcuy
        ):
            enc.restart(state["r"])
            state["r"] += 1
            stats.reset_all()

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hs, vs = samp[ci]
                for vy in range(vs):
                    for hx in range(hs):
                        encode_block(
                            coeffs[ci][my * vs + vy, mx * hs + hx], ci
                        )
            emit_restart()
    enc.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        if precision == 12:
            vals = b"".join(
                struct.pack(">H", int(table[r][c])) for r, c in J.ZIGZAG
            )
            return seg(0xFFDB, bytes([0x10 | tid]) + vals)
        zzb = bytes(int(table[r][c]) for r, c in J.ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zzb)

    low, up = DEFAULT_DC_COND
    dac = seg(
        0xFFCC,
        bytes([
            0x00, (up << 4) | low,   # DC table 0: (U, L)
            0x01, (up << 4) | low,   # DC table 1
            0x10, DEFAULT_AC_COND,   # AC table 0: Kx
            0x11, DEFAULT_AC_COND,   # AC table 1
        ]),
    )
    qlum, qchrom = J.scaled_quant_tables(quality)
    if precision == 12:
        qlum, qchrom = qlum * 16, qchrom * 16
    y_sampling = (samp[0][0] << 4) | samp[0][1]
    sof = seg(
        0xFFC9,  # SOF9: extended sequential, arithmetic coding
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, qlum) + dqt(1, qchrom)
        + dac + sof + dri + sos + bytes(enc.out) + b"\xff\xd9"
    )


def encode_jpeg_progressive_arithmetic(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    precision: int = 8,
) -> bytes:
    """Encode a PROGRESSIVE arithmetic-coded JPEG (SOF10) exercising
    both Annex G dimensions under the QM coder: spectral selection
    (interleaved DC scan; AC bands 1-5 / 6-63 per component) and
    successive approximation (DC at Al=1 + one refinement pass; AC at
    Al=2 + Ah=2->1 and Ah=1->0 refinement passes). Same quantized
    coefficients as every other encoder in this module, so decoding
    is pixel-identical to the Huffman paths. ``precision`` 12 swaps
    the front half only (see :func:`encode_jpeg_arithmetic`)."""
    from etl_property_rumah123_spark.functions import jpeg as J

    h, w, samp, coeffs, true_dims = J._quantize_planes(
        pixels, quality, subsampling, precision
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            tsel = 0x00 if cid == 1 else 0x11
            body += bytes([cid, tsel])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    scans = []
    mcux = coeffs[0].shape[1] // samp[0][0]
    mcuy = coeffs[0].shape[0] // samp[0][1]

    # --- DC first scan: interleaved, Al=1 (sequential DC model on
    # the Al-scaled DIFFs, per G.1.3.1) ---
    enc = ArithEncoder()
    stats = _ScanStats(3)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hs, vs = samp[ci]
                tid = 0 if ci == 0 else 1
                for vy in range(vs):
                    for hx in range(hs):
                        scaled = int(
                            coeffs[ci][my * vs + vy, mx * hs + hx, 0]
                        ) >> 1
                        diff = scaled - stats.last_dc[ci]
                        stats.last_dc[ci] = scaled
                        stats.dc_context[ci] = _encode_dc_diff(
                            enc, stats.dc[tid], diff,
                            stats.dc_context[ci], DEFAULT_DC_COND,
                        )
    enc.flush()
    scans.append((sos_header([1, 2, 3], 0, 0, 0, 1), bytes(enc.out)))

    # --- AC first scans per component: bands 1-5 and 6-63 at Al=2 ---
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(3):
            enc = ArithEncoder()
            stats = _ScanStats(1)
            tid = 0 if ci == 0 else 1
            bw_true, bh_true = true_dims[ci]
            for by in range(bh_true):
                for bx in range(bw_true):
                    _encode_ac_coefs(
                        enc, stats.ac[tid], stats.fixed,
                        coeffs[ci][by, bx], DEFAULT_AC_COND, ss, se, 2,
                    )
            enc.flush()
            scans.append(
                (sos_header([ci + 1], ss, se, 0, 2), bytes(enc.out))
            )

    # --- DC refinement: one fixed-bin bit per block, Ah=1 Al=0 ---
    enc = ArithEncoder()
    stats = _ScanStats(3)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hs, vs = samp[ci]
                for vy in range(vs):
                    for hx in range(hs):
                        enc.encode(
                            stats.fixed, 0,
                            int(coeffs[ci][my * vs + vy, mx * hs + hx, 0])
                            & 1,
                        )
    enc.flush()
    scans.append((sos_header([1, 2, 3], 0, 0, 1, 0), bytes(enc.out)))

    # --- AC refinement passes: Ah=2 Al=1, then Ah=1 Al=0 ---
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(3):
            enc = ArithEncoder()
            stats = _ScanStats(1)
            tid = 0 if ci == 0 else 1
            bw_true, bh_true = true_dims[ci]
            for by in range(bh_true):
                for bx in range(bw_true):
                    _encode_ac_refine(
                        enc, stats.ac[tid], stats.fixed,
                        coeffs[ci][by, bx], 1, 63, al,
                    )
            enc.flush()
            scans.append(
                (sos_header([ci + 1], 1, 63, ah, al), bytes(enc.out))
            )

    qlum, qchrom = J.scaled_quant_tables(quality)
    if precision == 12:
        qlum, qchrom = qlum * 16, qchrom * 16

    def dqt(tid: int, table: np.ndarray) -> bytes:
        if precision == 12:
            vals = b"".join(
                struct.pack(">H", int(table[r][c])) for r, c in J.ZIGZAG
            )
            return seg(0xFFDB, bytes([0x10 | tid]) + vals)
        zzb = bytes(int(table[r][c]) for r, c in J.ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zzb)

    low, up = DEFAULT_DC_COND
    dac = seg(
        0xFFCC,
        bytes([
            0x00, (up << 4) | low,
            0x01, (up << 4) | low,
            0x10, DEFAULT_AC_COND,
            0x11, DEFAULT_AC_COND,
        ]),
    )
    y_sampling = (samp[0][0] << 4) | samp[0][1]
    sof = seg(
        0xFFCA,  # SOF10: progressive, arithmetic coding
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out = b"\xff\xd8" + app0 + dqt(0, qlum) + dqt(1, qchrom) + dac + sof
    for header, body in scans:
        out += header + body
    return out + b"\xff\xd9"
