"""Real codecs for uncompressed public media formats, numpy/stdlib
only: 24-bit BI_RGB Windows BMP (BITMAPINFOHEADER) and 16-bit PCM WAV
(RIFF, via the stdlib ``wave`` module).

These exist so the multimodal decode stage can run a *genuine* parse
of real-format bytes end-to-end in this container — no image/audio
libraries required. Compressed codecs (JPEG/PNG/H.264/MP3) are out of
scope here and remain a documented production swap in
``operators/multimodal.py``.

Both formats are public specifications:
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  bottom-up BGR rows padded to 4-byte boundaries, biCompression=0.
- WAV: RIFF/WAVE container, fmt + data chunks, little-endian PCM.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    image_size = stride * h
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size

    # BGR channel order, bottom row first, zero-padded rows
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)

    out = io.BytesIO()
    out.write(_BMP_FILE_HEADER.pack(b"BM", offset + image_size, 0, 0, offset))
    out.write(
        _BMP_INFO_HEADER.pack(
            _BMP_INFO_HEADER.size, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
        )
    )
    out.write(rows.tobytes())
    return out.getvalue()


def decode_bmp24(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (H, W, 3) uint8 RGB
    array. Handles bottom-up and top-down rows and 4-byte row padding;
    raises ``ValueError`` for non-BMP bytes, compressed BMPs, or other
    bit depths."""
    if len(data) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    if offset < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        # a crafted offset pointing inside the headers would silently
        # decode header bytes as pixels
        raise ValueError(f"pixel offset {offset} overlaps the headers")
    (
        hdr_size,
        w,
        h,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _used,
        _important,
    ) = _BMP_INFO_HEADER.unpack_from(data, _BMP_FILE_HEADER.size)
    if hdr_size < _BMP_INFO_HEADER.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (planes={planes}, bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    end = offset + stride * h
    if end > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM WAV."""
    if samples.ndim != 1:
        raise ValueError(f"expected mono 1-D samples, got {samples.shape}")
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return out.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV into (mono int16 samples, sample rate).

    Multi-channel input is averaged down to mono (the shape feature
    extractors want); raises ``ValueError`` for non-WAV bytes or other
    sample widths."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM supported, got width {wf.getsampwidth()}"
                )
            n_ch = wf.getnchannels()
            rate = wf.getframerate()
            if rate <= 0:
                # wave accepts a zeroed fmt-chunk rate; callers divide
                # by the rate for durations
                raise ValueError(f"bad sample rate {rate}")
            raw = wf.readframes(wf.getnframes())
    # wave raises EOFError (not wave.Error) on severely truncated input
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    samples = np.frombuffer(raw, dtype="<i2")
    if n_ch > 1:
        samples = (
            samples.reshape(-1, n_ch).mean(axis=1).astype(np.int16)
        )
    return samples, rate
