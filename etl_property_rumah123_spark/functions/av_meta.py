"""Metadata-grade A/V container support: MP3 frame-header walk and
MP4 (ISO BMFF) box walk — duration / dimensions / rates WITHOUT a
decoder.

A 100 TB multimodal corpus is full of MP3/MP4, and the pipeline
operations that matter at ingest (route, bucket by duration, filter
out corrupt/over-long samples, compute storage stats) need only the
container metadata. Full sample/pixel decode stays the documented
ffmpeg production swap (operators/multimodal.py:decode_compressed);
everything here is implemented from the public specs:

- MP3: ISO/IEC 11172-3 (MPEG-1 audio) + the MPEG-2/2.5 extensions —
  frame sync, version/layer bits, the bitrate and sample-rate index
  tables, frame-length arithmetic, and ID3v2 (id3.org spec) syncsafe
  tag skipping. Duration = sum over frames of samples-per-frame /
  sample-rate, by walking real frame boundaries (not file-size
  division, which lies for VBR streams).
- MP4: ISO/IEC 14496-12 box structure — size/type walk with
  64-bit ``largesize`` support, recursion into container boxes,
  ``mvhd`` (movie timescale + duration, version 0 and 1) and ``tkhd``
  (track dims as 16.16 fixed point, version 0 and 1).

Parity anchor: the reference pipeline has no media path at all
(/root/reference/src/transform.py is listing-text cleaning only);
this module belongs to the training-data extension layer, same tier
as functions/codecs.py (BMP/WAV/PNG) and functions/jpeg*.py (T.81).
"""

from __future__ import annotations

# --- MP3 (MPEG audio) -------------------------------------------------

#: bitrate kbps by [version_group][layer][index]; 0 = "free", None = bad.
#: version_group: 0 = MPEG1, 1 = MPEG2/2.5. Layer: 1/2/3.
_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: sample rate Hz by [version_bits][index] (version bits from header:
#: 0=MPEG2.5, 2=MPEG2, 3=MPEG1; 1 is reserved).
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

#: samples per frame by [version_group][layer].
_SAMPLES_PER_FRAME = {
    (0, 1): 384, (0, 2): 1152, (0, 3): 1152,
    (1, 1): 384, (1, 2): 1152, (1, 3): 576,
}


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent). The tag
    size is SYNCSAFE (7 bits per byte — id3.org v2.3 §3.1) and counts
    the body only, so the tag occupies 10 + size bytes."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        return 0  # malformed syncsafe int: treat as no tag
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size


#: ID3v2 text-frame ids -> friendly names (id3.org v2.3 §4.2.1).
_ID3_TEXT_FRAMES = {
    b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
    b"TYER": "year", b"TDRC": "year", b"TCON": "genre",
}


def parse_id3v2_tags(data: bytes) -> dict:
    """Extract the common text frames (title/artist/album/year/genre)
    from a leading ID3v2.3/2.4 tag. Frame sizes are plain 32-bit in
    v2.3 and syncsafe in v2.4 (the spec's one incompatible change);
    text encodings 0 (latin-1), 1 (UTF-16 w/ BOM), 3 (UTF-8) decode,
    others are skipped. Returns {} when no tag or nothing parseable —
    tags are enrichment, never a failure."""
    total = _id3v2_size(data)
    if total == 0 or len(data) < 10:
        return {}
    version = data[3]
    out: dict = {}
    pos, end = 10, min(total, len(data))
    while pos + 10 <= end:
        fid = data[pos:pos + 4]
        if not fid.strip(b"\x00"):  # zero padding reached
            break
        raw_sz = data[pos + 4:pos + 8]
        if version >= 4:
            if any(b & 0x80 for b in raw_sz):
                break
            sz = (
                (raw_sz[0] << 21) | (raw_sz[1] << 14)
                | (raw_sz[2] << 7) | raw_sz[3]
            )
        else:
            sz = int.from_bytes(raw_sz, "big")
        body = data[pos + 10:pos + 10 + sz]
        pos += 10 + sz
        if sz <= 0 or pos > end:
            break
        name = _ID3_TEXT_FRAMES.get(fid)
        if name is None or name in out or len(body) < 2:
            continue
        enc, text = body[0], body[1:]
        try:
            if enc == 0:
                val = text.decode("latin-1")
            elif enc == 1:
                val = text.decode("utf-16")
            elif enc == 3:
                val = text.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        val = val.rstrip("\x00").strip()
        if val:
            out[name] = val
    return out


def _parse_frame_header(h: bytes):
    """Parse a 4-byte MPEG audio frame header. Returns
    ``(frame_len, samples, sample_rate, bitrate_kbps)`` or None."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version_bits = (h[1] >> 3) & 0x3
    layer_bits = (h[1] >> 1) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3->1, 2->2, 1->3
    vgroup = 0 if version_bits == 3 else 1
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 0x3
    padding = (h[2] >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/bad bitrate or reserved rate
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    sample_rate = _SAMPLE_RATES[version_bits][sr_idx]
    samples = _SAMPLES_PER_FRAME[(vgroup, layer)]
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        # layers 2/3: coefficient is samples/8 (144 for 1152, 72 for
        # MPEG2 layer-3's 576-sample frames)
        frame_len = (samples // 8) * bitrate // sample_rate + padding
    return frame_len, samples, sample_rate, bitrate // 1000


def parse_mp3_meta(data: bytes) -> dict | None:
    """Walk every MPEG audio frame; return stream metadata or None if
    no valid frame sequence exists.

    ``{"n_frames", "duration_ms", "sample_rate", "bitrate_kbps"}`` —
    bitrate is the FIRST frame's (header-grade; a VBR average would
    need the whole walk anyway and is trivially summed here), duration
    is exact frame-by-frame accumulation. Trailing garbage shorter
    than a frame header ends the walk; a corrupt header mid-stream
    ends the walk at the last good frame (salvage-what-parses, the
    same contract as the image decoders' NULL fallback)."""
    pos = _id3v2_size(data)
    n_frames = 0
    # exact integer duration: samples accumulated per sample-rate so
    # the ms floor is deterministic (float accumulation can land one
    # ulp under an exact boundary and floor a ms short)
    samples_by_rate: dict[int, int] = {}
    first_rate = first_kbps = None
    while pos + 4 <= len(data):
        parsed = _parse_frame_header(data[pos:pos + 4])
        if parsed is None:
            break
        frame_len, samples, rate, kbps = parsed
        if pos + frame_len > len(data):
            break  # truncated final frame: not counted
        if first_rate is None:
            first_rate, first_kbps = rate, kbps
        n_frames += 1
        samples_by_rate[rate] = samples_by_rate.get(rate, 0) + samples
        pos += frame_len
    if n_frames == 0:
        return None
    return {
        "n_frames": n_frames,
        "duration_ms": sum(
            s * 1000 // r for r, s in samples_by_rate.items()
        ),
        "sample_rate": first_rate,
        "bitrate_kbps": first_kbps,
    }


def encode_mp3_stub(
    filler: bytes, n_frames: int, tags: dict | None = None
) -> bytes:
    """Deterministic MPEG-1 Layer III fixture stream: a minimal ID3v2.3
    tag (32-byte zero body, or real text frames when ``tags`` maps
    title/artist/album/year/genre to strings) + ``n_frames`` 417-byte
    frames at 128 kbps / 44.1 kHz / padding 0, each frame's payload
    the filler bytes cycled. Every header field is real, so any
    spec-conforming MP3 parser reads the same frame count/duration —
    this is fixture synthesis for :func:`parse_mp3_meta`, not an
    encoder (the frame payloads are not Huffman audio data)."""
    if tags:
        ids = {v: k for k, v in _ID3_TEXT_FRAMES.items() if k != b"TDRC"}
        body = b""
        for name, val in tags.items():
            fid = ids[name]
            frame_body = b"\x03" + val.encode("utf-8")
            body += (
                fid + len(frame_body).to_bytes(4, "big") + b"\x00\x00"
                + frame_body
            )
        sz = len(body)
        syncsafe = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        tag = b"ID3" + bytes([3, 0, 0]) + syncsafe + body
    else:
        tag = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 32]) + b"\x00" * 32
    header = bytes([0xFF, 0xFB, 0x90, 0x00])  # V1 L3, 128k, 44100, pad 0
    body_len = 417 - 4
    if filler:
        body = (filler * (body_len // len(filler) + 1))[:body_len]
    else:
        body = b"\x00" * body_len
    return tag + (header + body) * n_frames


# --- MP4 (ISO base media file format) ---------------------------------


def _be(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off:off + n], "big")


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield ``(box_type, body_start, body_end)`` for each box in
    ``data[start:end]`` (ISO 14496-12 §4.2: 32-bit size, 64-bit
    ``largesize`` when size==1, to-end-of-enclosure when size==0).
    Stops at the first malformed box (salvage-what-parses)."""
    pos = start
    while pos + 8 <= end:
        size = _be(data, pos, 4)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = _be(data, pos + 8, 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def parse_mp4_meta(data: bytes) -> dict | None:
    """Box-walk an ISO BMFF (MP4/MOV/M4A) stream: movie duration from
    ``moov/mvhd`` (version 0: 32-bit times, version 1: 64-bit), the
    first video track's pixel dims from ``moov/trak/tkhd`` (16.16
    fixed point; audio-only tracks carry 0x0 and are skipped),
    per-track handler types from ``mdia/hdlr`` (``vide``/``soun`` →
    video/audio track counts), and the first audio track's sample
    rate from its ``mdia/mdhd`` media timescale (the container-level
    rate — by convention the audio sampling rate). Returns
    ``{"duration_ms", "timescale", "width", "height", "n_tracks",
    "n_video", "n_audio", "audio_sample_rate"}`` or None when no
    ``moov`` exists. No sample tables are touched — this is O(header
    bytes) regardless of mdat size, which is the property that makes
    it safe inside an ingest kernel."""
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        return None
    mstart, mend = moov
    out: dict = {"duration_ms": None, "timescale": None,
                 "width": None, "height": None, "n_tracks": 0,
                 "n_video": 0, "n_audio": 0, "audio_sample_rate": None}
    mvhd = _find_box(data, mstart, mend, b"mvhd")
    if mvhd is not None:
        b, e = mvhd
        version = data[b]
        if version == 1 and e - b >= 32:
            timescale = _be(data, b + 20, 4)
            duration = _be(data, b + 24, 8)
        elif e - b >= 20:
            timescale = _be(data, b + 12, 4)
            duration = _be(data, b + 16, 4)
        else:
            timescale = duration = None
        if timescale:
            out["timescale"] = timescale
            out["duration_ms"] = duration * 1000 // timescale
    for t, b, e in _walk_boxes(data, mstart, mend):
        if t != b"trak":
            continue
        out["n_tracks"] += 1
        tkhd = _find_box(data, b, e, b"tkhd")
        if tkhd is not None:
            tb, te = tkhd
            version = data[tb]
            # width/height are the LAST 8 bytes of tkhd in both versions
            if te - tb >= (92 if version == 0 else 104) - 8:
                w = _be(data, te - 8, 4) >> 16
                h = _be(data, te - 4, 4) >> 16
                if w and h and out["width"] is None:
                    out["width"], out["height"] = w, h
        mdia = _find_box(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(data, mdia[0], mdia[1], b"hdlr")
        handler = None
        if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
            handler = data[hdlr[0] + 8:hdlr[0] + 12]
        if handler == b"vide":
            out["n_video"] += 1
        elif handler == b"soun":
            out["n_audio"] += 1
            if out["audio_sample_rate"] is None:
                mdhd = _find_box(data, mdia[0], mdia[1], b"mdhd")
                if mdhd is not None:
                    hb, he = mdhd
                    v = data[hb]
                    if v == 1 and he - hb >= 24:
                        out["audio_sample_rate"] = _be(data, hb + 20, 4)
                    elif he - hb >= 16:
                        out["audio_sample_rate"] = _be(data, hb + 12, 4)
    return out


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "big")


#: Identity transform matrix shared by mvhd/tkhd (9 × 32-bit fixed).
_MATRIX = (
    _u32(0x00010000) + _u32(0) + _u32(0)
    + _u32(0) + _u32(0x00010000) + _u32(0)
    + _u32(0) + _u32(0) + _u32(0x40000000)
)


def encode_mp4_stub(
    width: int,
    height: int,
    duration_ms: int,
    mdat: bytes,
    audio_rate: int | None = None,
) -> bytes:
    """Deterministic minimal-but-valid ISO BMFF fixture:
    ``ftyp(isom) + moov(mvhd v0 timescale=1000 + trak(tkhd v0)) +
    mdat``. Every box size and field is real per 14496-12, so any
    conforming parser reads the same dims/duration; only the media
    sample data inside mdat is opaque filler. ``audio_rate`` appends
    a second track carrying ``mdia/hdlr('soun')`` and a ``mdhd``
    whose media timescale is the audio sample rate — the shape
    :func:`parse_mp4_meta` reads rates and track kinds from."""
    ftyp = _u32(20) + b"ftypisom" + _u32(0x200) + b"isom"
    mvhd = (
        _u32(108) + b"mvhd" + _u32(0)          # version 0, flags 0
        + _u32(0) + _u32(0)                     # creation/modification
        + _u32(1000) + _u32(duration_ms)        # timescale=ms
        + _u32(0x00010000)                      # rate 1.0
        + (0x0100).to_bytes(2, "big") + b"\x00" * 2  # volume + reserved
        + b"\x00" * 8 + _MATRIX
        + b"\x00" * 24 + _u32(2)                # pre_defined + next track
    )
    tkhd = (
        _u32(92) + b"tkhd" + _u32(7)            # v0, enabled|in-movie|preview
        + _u32(0) + _u32(0)                     # creation/modification
        + _u32(1) + _u32(0)                     # track id + reserved
        + _u32(duration_ms) + b"\x00" * 8       # duration + reserved
        + b"\x00" * 8                           # layer/group/volume/reserved
        + _MATRIX
        + _u32(width << 16) + _u32(height << 16)
    )
    trak = _u32(8 + len(tkhd)) + b"trak" + tkhd
    traks = trak
    if audio_rate is not None:
        tkhd2 = (
            _u32(92) + b"tkhd" + _u32(7)
            + _u32(0) + _u32(0)
            + _u32(2) + _u32(0)                 # track id 2
            + _u32(duration_ms) + b"\x00" * 8
            + b"\x00" * 8
            + _MATRIX
            + _u32(0) + _u32(0)                 # audio: no pixel dims
        )
        mdhd = (
            _u32(32) + b"mdhd" + _u32(0)
            + _u32(0) + _u32(0)                 # creation/modification
            + _u32(audio_rate)                  # media timescale = rate
            + _u32(duration_ms * audio_rate // 1000)
            + _u32(0x55C40000)                  # language 'und' + pre_def
        )
        hdlr = (
            _u32(33) + b"hdlr" + _u32(0)
            + _u32(0) + b"soun" + b"\x00" * 12 + b"\x00"
        )
        mdia = _u32(8 + len(mdhd) + len(hdlr)) + b"mdia" + mdhd + hdlr
        traks += _u32(8 + len(tkhd2) + len(mdia)) + b"trak" + tkhd2 + mdia
    moov = _u32(8 + len(mvhd) + len(traks)) + b"moov" + mvhd + traks
    return ftyp + moov + _u32(8 + len(mdat)) + b"mdat" + mdat
