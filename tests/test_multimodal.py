"""Multimodal tests: the BMP/WAV codecs round-trip for real, and the
decode / feature-extract / frame-sample stages are deterministic,
shape-correct, and Arrow-batched."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_property_rumah123_spark.functions import codecs
from etl_property_rumah123_spark.functions import jpeg as jpeg_mod
from etl_property_rumah123_spark.functions import jpeg_arith as jpeg_arith_mod
from etl_property_rumah123_spark.functions import jpeg_hier as jpeg_hier_mod
from etl_property_rumah123_spark.functions import jpeg_lossless as jpeg_lossless_mod
from etl_property_rumah123_spark.operators import multimodal
from etl_property_rumah123_spark.sources.catalog import table
from tests.conftest import SF_SMOKE


def media(spark, n=60):
    docs = table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < n)
    return multimodal.synthesize_media(docs)


# ---------------------------------------------------------------------------
# Codec round-trips (pure Python, no Spark)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(16, 4), (3, 5), (1, 1), (7, 2)])
def test_bmp24_roundtrip_exact(w, h):
    """encode->decode is pixel-exact, including widths whose rows need
    4-byte padding (w=3 -> 9-byte rows padded to 12)."""
    rng = np.random.default_rng(42 + w * 10 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codecs.encode_bmp24(px)
    assert data[:2] == b"BM"
    out = codecs.decode_bmp24(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, px)


def test_bmp_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_bmp24(b"not a bitmap at all, just text")
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp24(px))
    data[28] = 8  # biBitCount 24 -> 8 (palettized, unsupported)
    with pytest.raises(ValueError):
        codecs.decode_bmp24(bytes(data))
    with pytest.raises(ValueError):
        codecs.decode_bmp24(codecs.encode_bmp24(px)[:30])  # truncated


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_exact_every_filter(filter_type):
    """encode->decode is pixel-exact for each of the five PNG scanline
    filters — a REAL compressed format (stdlib zlib DEFLATE) with no
    image library involved."""
    rng = np.random.default_rng(7 + filter_type)
    for h, w in [(1, 1), (4, 16), (9, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = codecs.encode_png(px, filter_type=filter_type)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = codecs.decode_png(data)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, px)
    # filtering + DEFLATE actually compress redundant content
    flat = np.full((32, 32, 3), 200, dtype=np.uint8)
    assert len(codecs.encode_png(flat)) < flat.size // 4


def test_png_decoder_rejects_garbage_crc_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"definitely not a png")
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(px)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside a CRC-protected chunk
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        codecs.decode_png(good[:30])  # truncated
    gray = bytearray(good)
    gray[25] = 0  # IHDR color type 2 -> 0 (grayscale, unsupported)
    # (CRC now mismatches -> still ValueError, which is the contract)
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(gray))


def test_decode_compressed_routes_png_jpeg_and_refuses_av():
    px = np.random.default_rng(3).integers(0, 256, (5, 4, 3), dtype=np.uint8)
    out = multimodal.decode_compressed(codecs.encode_png(px))
    assert np.array_equal(out, px)
    jout = multimodal.decode_compressed(codecs.encode_jpeg(px, quality=100))
    assert jout.shape == px.shape
    assert np.abs(jout.astype(int) - px.astype(int)).max() <= 2
    with pytest.raises(NotImplementedError):
        multimodal.decode_compressed(b"\x00\x00\x01\xbaMPEG-PS-ish")


@pytest.mark.parametrize("w,h", [(8, 8), (24, 16), (9, 13), (1, 1)])
def test_jpeg_roundtrip_bounds(w, h):
    """Baseline JPEG from the T.81 spec: at quality 100 the Annex K
    tables scale to all-ones, so the only loss is DCT float rounding —
    round trips within +-2 per channel; lossy qualities stay sane and
    flat content survives exactly."""
    rng = np.random.default_rng(77 + w + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codecs.encode_jpeg(px, quality=100)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = codecs.decode_jpeg(data)
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
    flat = np.full((h, w, 3), 130, dtype=np.uint8)
    assert np.array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg(flat, quality=75)), flat
    )
    # lossy quality actually compresses noise below quality-100 size
    assert len(codecs.encode_jpeg(px, quality=50)) < len(data)


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 — the dominant real-world JPEG layout: interleaved MCUs
    of four Y blocks + averaged chroma. Grayscale content (constant
    chroma) survives subsampling almost exactly; colored noise
    compresses well below the 4:4:4 size; smooth color stays close."""
    rng = np.random.default_rng(21)
    gray = np.repeat(rng.integers(0, 256, (24, 24, 1), dtype=np.uint8), 3, axis=2)
    out = codecs.decode_jpeg(
        codecs.encode_jpeg(gray, quality=100, subsampling="420")
    )
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2
    noise = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    d444 = codecs.encode_jpeg(noise, quality=90)
    d420 = codecs.encode_jpeg(noise, quality=90, subsampling="420")
    assert len(d420) < len(d444)
    assert codecs.decode_jpeg(d420).shape == noise.shape
    # smooth color: chroma varies slowly, 4:2:0 stays close everywhere
    xx, yy = np.meshgrid(np.arange(40), np.arange(40))
    smooth = np.stack(
        [(xx * 3) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = codecs.decode_jpeg(
        codecs.encode_jpeg(smooth, quality=95, subsampling="420")
    )
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 8


def test_jpeg_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"definitely not a jpeg")
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    good = codecs.encode_jpeg(px)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(good[:40])  # truncated mid-segment
    # a baseline stream with the SOF marker swapped to SOF2 carries a
    # scan header (Ss=0, Se=63) that is INVALID in progressive mode —
    # must be refused as corrupt, never mis-decoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(prog)


def test_decode_jpeg_only_raises_valueerror():
    """Fuzz pin for the corrupt-sample-becomes-NULLs contract: the
    mapInPandas stages catch ONLY ValueError, so any other exception
    type escaping decode_jpeg (IndexError on short DQT/DHT payloads,
    struct.error on truncated SOF, OverflowError on oversized Huffman
    magnitudes hitting the int64 coefficient array) would fail a whole
    Spark task for one bad payload. Mutate valid JPEGs every way and
    assert the only raised type is ValueError."""
    rng = np.random.RandomState(7)
    base = [
        codecs.encode_jpeg(
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8), quality=q, subsampling=sub
        )
        for (h, w, q, sub) in [(16, 16, 90, "444"), (24, 8, 60, "420"), (8, 40, 100, "444")]
    ] + [
        # progressive stream: the Annex G scan paths (EOB runs,
        # refinement bits, between-scan DHT handling) obey the same
        # only-ValueError contract
        jpeg_mod.encode_jpeg_progressive(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), quality=85
        ),
        # restart-interval stream: RSTn resync paths too
        codecs.encode_jpeg(
            rng.randint(0, 256, (24, 24, 3)).astype(np.uint8),
            quality=80, restart_interval=2,
        ),
        # arithmetic-coded stream (SOF9): the QM-coder decode paths
        # must also fail only as ValueError (or decode to garbage
        # pixels — arithmetic streams have no self-synchronization,
        # so silent wrong output is spec-expected for bit flips)
        jpeg_arith_mod.encode_jpeg_arithmetic(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), quality=85
        ),
        # progressive arithmetic (SOF10): G.2 scan kinds under the QM
        # coder obey the same contract
        jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), quality=85
        ),
        # lossless (SOF3): the Annex H spatial-prediction decode path,
        # dispatched through the same decode_jpeg entry
        jpeg_lossless_mod.encode_jpeg_lossless(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8),
            predictor=4, restart_rows=5,
        ),
        # arithmetic lossless (SOF11): QM coder + H.2 spatial contexts
        jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8),
            predictor=4, restart_rows=5,
        ),
        # hierarchical (DHP/EXP/SOF5): the multi-frame Annex J driver
        jpeg_hier_mod.encode_jpeg_hierarchical(
            rng.randint(0, 256, (16, 24, 3)).astype(np.uint8), quality=90
        ),
        # 12-bit extended sequential (SOF1): 16-bit DQT + extended
        # Huffman alphabets under the same contract
        jpeg_mod.encode_jpeg_extended(
            rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16), quality=90
        ),
        # 12-bit progressive (SOF2 prec 12): extended alphabets in the
        # Annex G scan paths
        jpeg_mod.encode_jpeg_progressive(
            rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16),
            quality=90, precision=12,
        ),
        # 12-bit hierarchical (DHP + SOF1 base + SOF5 differentials)
        jpeg_hier_mod.encode_jpeg_hierarchical(
            rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16),
            quality=90, precision=12,
        ),
        # 12-bit arithmetic, sequential and progressive
        jpeg_arith_mod.encode_jpeg_arithmetic(
            rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16),
            quality=90, precision=12,
        ),
        jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
            rng.randint(0, 4096, (16, 24, 3)).astype(np.uint16),
            quality=90, precision=12,
        ),
    ]
    n_mutations = 0
    for good in base:
        buf = bytearray(good)
        for trial in range(400):
            kind = trial % 4
            b = bytearray(buf)
            if kind == 0:  # single byte flip anywhere
                i = rng.randint(0, len(b))
                b[i] ^= 1 << rng.randint(0, 8)
            elif kind == 1:  # truncate at arbitrary point
                b = b[: rng.randint(2, len(b))]
            elif kind == 2:  # corrupt a marker byte
                i = rng.randint(2, len(b) - 1)
                b[i - 1 : i + 1] = b"\xff" + bytes([rng.randint(0, 256)])
            else:  # slam random bytes into a random window
                i = rng.randint(0, len(b) - 4)
                ln = rng.randint(1, 16)
                b[i : i + ln] = bytes(rng.randint(0, 256, ln).tolist())
            n_mutations += 1
            try:
                codecs.decode_jpeg(bytes(b))
            except ValueError:
                pass  # the one allowed failure type
            except Exception as e:  # pragma: no cover - the assertion
                raise AssertionError(
                    f"decode_jpeg raised {type(e).__name__} ({e!r}) on "
                    f"mutation kind={kind} of a valid JPEG"
                ) from e
    assert n_mutations == 6000


def test_decode_stage_handles_jpeg(spark):
    """The Arrow decode stage extracts true dims from JPEG payloads
    (frame header + full entropy decode); corrupt scans -> NULLs."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    good = codecs.encode_jpeg(px, quality=90)
    rows = [
        (1, "image", bytearray(good), "image/jpeg"),
        (2, "image", bytearray(good[:60]), "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, modality string, payload binary, mime_type string"
    )
    got = {
        r["sample_id"]: (r["decoded_width"], r["decoded_height"])
        for r in multimodal.decode_media(df).collect()
    }
    assert got == {1: (24, 16), 2: (None, None)}
    resized = {
        r["sample_id"]: r
        for r in multimodal.resize_images(df, width=16, height=16).collect()
    }
    assert (resized[1]["out_width"], resized[1]["in_width"]) == (16, 24)
    # re-encoded as JPEG, decodable, right shape
    assert codecs.decode_jpeg(bytes(resized[1]["payload"])).shape == (16, 16, 3)
    assert resized[2]["payload"] is None


def test_decode_and_resize_stages_handle_png(spark):
    """The Arrow decode stage extracts true dims from PNG payloads
    (corrupt PNGs -> NULL dims, not failures), and resize re-encodes
    PNG as PNG with exact nearest-neighbor content."""
    rng = np.random.default_rng(11)
    px_a = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    px_b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(codecs.encode_png(px_a)), "image/png"),
        (2, "image", bytearray(codecs.encode_png(px_b)), "image/png"),
        (3, "image", bytearray(b"\x89PNG\r\n\x1a\nbroken"), "image/png"),
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, modality string, payload binary, mime_type string"
    )
    got = {
        r["sample_id"]: (r["decoded_width"], r["decoded_height"])
        for r in multimodal.decode_media(df).collect()
    }
    assert got == {1: (6, 8), 2: (32, 32), 3: (None, None)}

    resized = {
        r["sample_id"]: r
        for r in multimodal.resize_images(df, width=16, height=16).collect()
    }
    assert (resized[1]["out_width"], resized[1]["in_width"]) == (16, 6)
    out_px = codecs.decode_png(bytes(resized[2]["payload"]))
    ri = (np.arange(16) * 32) // 16
    assert np.array_equal(out_px, px_b[ri][:, ri])
    assert resized[3]["payload"] is None  # corrupt passes through as NULL


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_bmp24_roundtrip_property(w, h, seed):
        """Any (H, W, 3) uint8 array survives encode->decode exactly,
        across padding widths."""
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(codecs.decode_bmp24(codecs.encode_bmp24(px)), px)

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_png_roundtrip_property(w, h, ft, seed):
        """Any (H, W, 3) uint8 array survives PNG encode->decode
        exactly under every scanline filter."""
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(
            codecs.decode_png(codecs.encode_png(px, filter_type=ft)), px
        )

    @given(
        n=st.integers(0, 4096),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_wav_pcm16_roundtrip_property(n, rate, seed):
        samples = (
            np.random.default_rng(seed)
            .integers(-32768, 32768, size=n)
            .astype(np.int16)
        )
        out, r = codecs.decode_wav_pcm16(codecs.encode_wav_pcm16(samples, rate))
        assert r == rate and np.array_equal(out, samples)

    @given(data=st.binary(min_size=0, max_size=256))
    @settings(max_examples=100, deadline=None)
    def test_av_meta_parsers_total_on_arbitrary_bytes(data):
        """The A/V metadata parsers are TOTAL on arbitrary bytes: any
        input returns a dict/None, never raises — these run inside an
        Arrow ingest kernel where one hostile byte string must not
        kill a 10k-row batch. Also seeds with valid-prefix mutations
        (a plausible header followed by garbage)."""
        from etl_property_rumah123_spark.functions import av_meta

        for blob in (
            data,
            b"ID3" + data,
            b"\xff\xfb" + data,
            (len(data) + 8).to_bytes(4, "big") + b"moov" + data,
            b"\x00\x00\x00\x01moov" + data,  # largesize header, truncated
        ):
            out = av_meta.parse_id3v2_tags(blob)
            assert isinstance(out, dict)
            m3 = av_meta.parse_mp3_meta(blob)
            assert m3 is None or isinstance(m3, dict)
            m4 = av_meta.parse_mp4_meta(blob)
            assert m4 is None or isinstance(m4, dict)

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


def test_wav_pcm16_roundtrip_exact():
    samples = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    data = codecs.encode_wav_pcm16(samples, rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    out, rate = codecs.decode_wav_pcm16(data)
    assert rate == 8000
    assert np.array_equal(out, samples)
    with pytest.raises(ValueError):
        codecs.decode_wav_pcm16(b"RIFFxxxxWAVEbroken")
    with pytest.raises(ValueError):
        codecs.decode_wav_pcm16(b"RI")  # wave raises EOFError here
    with pytest.raises(ValueError):
        codecs.decode_wav_pcm16(b"")


def test_wav_zero_rate_raises_not_zerodivision():
    """A crafted fmt chunk with sample-rate 0 must be ValueError (the
    decode stage divides by the rate for duration)."""
    samples = np.arange(32, dtype=np.int16)
    data = bytearray(codecs.encode_wav_pcm16(samples, rate=8000))
    i = data.find(b"fmt ")
    assert i > 0
    data[i + 12 : i + 16] = b"\x00\x00\x00\x00"  # nSamplesPerSec := 0
    with pytest.raises(ValueError):
        codecs.decode_wav_pcm16(bytes(data))


def test_bmp_offset_inside_headers_raises():
    """bfOffBits pointing inside the headers must not silently decode
    header bytes as pixels."""
    px = np.zeros((4, 16, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp24(px))
    data[10:14] = (0).to_bytes(4, "little")  # bfOffBits := 0
    with pytest.raises(ValueError):
        codecs.decode_bmp24(bytes(data))


# ---------------------------------------------------------------------------
# Spark stages over synthesized mixed-modality media
# ---------------------------------------------------------------------------


def test_synthesized_payloads_are_real_formats(spark):
    """Every image payload parses with the BMP decoder, every audio
    payload with the WAV decoder, and the decoded dims/duration equal
    the metadata the synthesizer declared."""
    rows = media(spark).collect()
    assert {r["modality"] for r in rows} == {"text", "image", "audio"}
    for r in rows:
        raw = bytes(r["payload"])
        if r["modality"] == "image":
            px = codecs.decode_bmp24(raw)
            assert (px.shape[0], px.shape[1]) == (r["height"], r["width"])
        elif r["modality"] == "audio":
            samples, rate = codecs.decode_wav_pcm16(raw)
            assert len(samples) * 1000 // rate == r["duration_ms"]


def test_decode_extracts_true_dims_and_duration(spark):
    """The decode stage's output equals ground truth computed
    driver-side from the same payload bytes — a real parse, not
    pseudo-dims."""
    m = media(spark)
    src = {r["sample_id"]: r for r in m.collect()}
    out = {r["sample_id"]: r for r in multimodal.decode_media(m).collect()}
    assert set(out) == set(src)
    for sid, s in src.items():
        r = out[sid]
        raw = bytes(s["payload"])
        assert r["payload_bytes"] == len(raw)
        assert r["payload_digest"] == hashlib.md5(raw).hexdigest()
        if s["modality"] == "image":
            assert (r["decoded_width"], r["decoded_height"]) == (
                s["width"],
                s["height"],
            )
            assert r["decoded_ms"] is None
        elif s["modality"] == "audio":
            assert r["decoded_ms"] == s["duration_ms"]
            assert r["decoded_width"] is None
        else:
            assert r["decoded_width"] is None and r["decoded_ms"] is None


def test_decode_corrupt_media_yields_nulls_not_failure(spark):
    """A payload claiming image/bmp but holding garbage decodes to
    NULL dims — corrupt samples are data, not exceptions."""
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(b"BMgarbage-not-a-real-bitmap"))],
        "sample_id long, modality string, mime_type string, payload binary",
    )
    r = multimodal.decode_media(df).collect()[0]
    assert r["decoded_width"] is None and r["decoded_height"] is None
    assert r["payload_bytes"] == 27


def test_feature_vectors_shape_and_norm(spark):
    out = multimodal.extract_features(media(spark), feat_dim=8).collect()
    assert out
    for r in out:
        assert len(r["feat"]) == 8
        assert abs(sum(r["feat"]) - 1.0) < 1e-5  # normalized histogram


def test_features_use_decoded_content_not_container_bytes(spark):
    """Two WAVs with identical sample content but different container
    byte layouts (extra rate -> different header) must NOT be forced
    apart by header bytes; conversely the image feature must reflect
    pixels, not BMP header bytes. We check the audio case directly:
    same samples, different rate -> same magnitude histogram."""
    samples = (np.arange(400) % 251).astype(np.int16)
    rows = [
        (1, "audio/wav", bytearray(codecs.encode_wav_pcm16(samples, 8000))),
        (2, "audio/wav", bytearray(codecs.encode_wav_pcm16(samples, 16000))),
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, mime_type string, payload binary"
    )
    out = {
        r["sample_id"]: r["feat"]
        for r in multimodal.extract_features(df, feat_dim=8).collect()
    }
    assert out[1] == out[2]


def test_materialize_persist_mode_matches_localcheckpoint(spark, monkeypatch):
    """SPARK_GRAFT_MATERIALIZE=persist (the preemptible-cluster mode)
    produces identical results to the default localCheckpoint path."""
    base = {
        (r["sample_id"], r["payload_digest"])
        for r in multimodal.decode_media(media(spark, n=20)).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    from etl_property_rumah123_spark.operators.common import materialize

    again = {
        (r["sample_id"], r["payload_digest"])
        for r in multimodal.decode_media(
            materialize(media(spark, n=20))
        ).collect()
    }
    assert base == again
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        materialize(media(spark, n=5))


def test_frame_sampling_expands_rows(spark):
    m = media(spark)
    n_samples = m.count()
    out = multimodal.sample_frames(m, n_frames=4)
    rows = out.collect()
    # every sample yields up to 4 frames, indexed 0..3, digests stable
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r["sample_id"], []).append(r)
    assert len(by_sample) == n_samples
    for frames in by_sample.values():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(idxs)))
        assert all(len(f["frame_digest"]) == 32 for f in frames)
    # determinism across runs
    again = {(r["sample_id"], r["frame_idx"]): r["frame_digest"]
             for r in multimodal.sample_frames(m, n_frames=4).collect()}
    assert {(r["sample_id"], r["frame_idx"]): r["frame_digest"] for r in rows} == again


def test_resize_images_nearest_neighbor_exact(spark):
    """Resize output is the exact nearest-neighbor index mapping of
    the decoded source pixels (verified pixel-for-pixel driver-side),
    re-encoded as a valid BMP; non-image and corrupt rows pass
    through with NULLs."""
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    good = codecs.encode_bmp24(px)
    df = spark.createDataFrame(
        [
            (1, "image", "image/bmp", bytearray(good)),
            (2, "text", "text/plain", bytearray(b"hello")),
            (3, "image", "image/bmp", bytearray(b"BMnope")),
        ],
        "sample_id long, modality string, mime_type string, payload binary",
    )
    out = {
        r["sample_id"]: r
        for r in multimodal.resize_images(df, width=2, height=3).collect()
    }
    r1 = out[1]
    assert (r1["in_width"], r1["in_height"]) == (4, 6)
    assert (r1["out_width"], r1["out_height"]) == (2, 3)
    got = codecs.decode_bmp24(bytes(r1["payload"]))
    ri = (np.arange(3) * 6) // 3
    ci = (np.arange(2) * 4) // 2
    assert np.array_equal(got, px[ri][:, ci])
    for sid in (2, 3):
        r = out[sid]
        assert r["payload"] is None and r["out_width"] is None
        assert r["in_width"] is None


def test_progressive_jpeg_pixel_parity_with_baseline():
    """Progressive (SOF2) decode — spectral selection + successive
    approximation + EOB runs — must reconstruct EXACTLY the pixels the
    baseline path produces from the same quantized coefficients, for
    4:4:4 and 4:2:0 and non-multiple-of-MCU sizes."""
    rng = np.random.RandomState(11)
    for shape, q, sub in [
        ((16, 16), 100, "444"), ((24, 40), 80, "444"), ((17, 23), 90, "444"),
        ((32, 16), 75, "420"), ((30, 22), 90, "420"), ((8, 8), 50, "444"),
    ]:
        px = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        base = codecs.decode_jpeg(
            codecs.encode_jpeg(px, quality=q, subsampling=sub)
        )
        prog = codecs.decode_jpeg(
            jpeg_mod.encode_jpeg_progressive(px, quality=q, subsampling=sub)
        )
        assert np.array_equal(base, prog), (shape, q, sub)


def test_progressive_jpeg_band_roundtrip_fuzz():
    """The AC first/refine encode<->decode pair at band level: random
    coefficient blocks through the 3-scan successive-approximation
    schedule must reproduce every coefficient exactly (this fuzz
    caught the EOB-run/current-block correction-bit buffer split)."""
    from etl_property_rumah123_spark.functions.jpeg import (
        PROG_AC_BITS, PROG_AC_VALS, _BitReader, _BitWriter,
        _ProgScanState, _build_codes, _build_decoder, _decode_ac_first,
        _decode_ac_refine, _enc_ac_first_block, _enc_ac_refine_block,
    )

    code_table = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    dec_table = _build_decoder(PROG_AC_BITS, PROG_AC_VALS)
    rng = np.random.RandomState(21)
    for _ in range(300):
        blocks = []
        for _ in range(rng.randint(1, 7)):
            zz = np.zeros(64, dtype=np.int64)
            for _ in range(rng.randint(0, 25)):
                zz[rng.randint(1, 64)] = rng.randint(-100, 101)
            blocks.append(zz)
        dec = [np.zeros(64, dtype=np.int64) for _ in blocks]
        for phase, al in [("first", 2), ("refine", 1), ("refine", 0)]:
            wtr = _BitWriter()
            st = _ProgScanState(wtr, code_table)
            for zz in blocks:
                if phase == "first":
                    _enc_ac_first_block(st, zz, 1, 63, al)
                else:
                    _enc_ac_refine_block(st, zz, 1, 63, al)
            st.flush()
            wtr.flush()
            rd = _BitReader(bytes(wtr.out))
            eob = 0
            for dz in dec:
                if phase == "first":
                    eob = _decode_ac_first(rd, dec_table, dz, 1, 63, al, eob)
                else:
                    eob = _decode_ac_refine(rd, dec_table, dz, 1, 63, al, eob)
        for zz, dz in zip(blocks, dec):
            assert np.array_equal(zz, dz)


def test_progressive_jpeg_routes_through_decode_compressed():
    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    data = jpeg_mod.encode_jpeg_progressive(px, quality=95)
    out = multimodal.decode_compressed(data)
    assert out.shape == (16, 16, 3)
    base = multimodal.decode_compressed(codecs.encode_jpeg(px, quality=95))
    assert np.array_equal(out, base)


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn (T.81 E.2.4): encoding with restart intervals must
    decode to EXACTLY the same pixels as the restart-free stream (the
    entropy payload differs — byte-aligned RSTn markers, DC predictor
    resets — but the coefficients are identical), for both 4:4:4 and
    4:2:0 and interval 1 (every MCU) through sparse intervals."""
    rng = np.random.RandomState(9)
    for shape, q, sub, ri in [
        ((24, 16), 100, "444", 1), ((40, 40), 85, "444", 2),
        ((32, 48), 90, "420", 1), ((30, 22), 75, "420", 2),
        ((17, 23), 95, "444", 5),
    ]:
        px = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        with_rst = codecs.encode_jpeg(
            px, quality=q, subsampling=sub, restart_interval=ri
        )
        plain = codecs.encode_jpeg(px, quality=q, subsampling=sub)
        assert any(
            with_rst[i] == 0xFF and 0xD0 <= with_rst[i + 1] <= 0xD7
            for i in range(len(with_rst) - 1)
        )
        assert np.array_equal(
            codecs.decode_jpeg(with_rst), codecs.decode_jpeg(plain)
        ), (shape, q, sub, ri)
    # corrupt restart sequencing must fail loudly, not desync
    good = codecs.encode_jpeg(
        rng.randint(0, 256, (24, 24, 3)).astype(np.uint8),
        quality=90, restart_interval=1,
    )
    # replace the first RSTn with a non-restart marker byte
    for i in range(len(good) - 1):
        if good[i] == 0xFF and 0xD0 <= good[i + 1] <= 0xD7:
            bad = good[:i + 1] + bytes([0xC8]) + good[i + 2:]
            with pytest.raises(ValueError):
                codecs.decode_jpeg(bad)
            break


def test_jpeg_422_and_440_layouts_roundtrip():
    """One-axis chroma subsampling (4:2:2 horizontal, 4:4:0 vertical):
    encode in each layout, decode through the general sampling-factor
    path (previously only reachable for 4:4:4/4:2:0 fixtures), with
    progressive pixel-parity and restart intervals in both layouts;
    grayscale content (constant chroma) survives near-exactly."""
    rng = np.random.RandomState(17)
    for sub in ("422", "440"):
        px = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
        base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=90, subsampling=sub))
        assert base.shape == px.shape
        prog = codecs.decode_jpeg(
            jpeg_mod.encode_jpeg_progressive(px, quality=90, subsampling=sub)
        )
        assert np.array_equal(prog, base), sub
        rst = codecs.decode_jpeg(
            codecs.encode_jpeg(px, quality=90, subsampling=sub, restart_interval=2)
        )
        assert np.array_equal(rst, base), sub
        gray = np.repeat(
            rng.randint(0, 256, (24, 24, 1), dtype=np.uint8), 3, axis=2
        )
        out = codecs.decode_jpeg(
            codecs.encode_jpeg(gray, quality=100, subsampling=sub)
        )
        assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2, sub


def test_jpeg_411_layout_all_entropy_paths():
    """4:1:1 chroma (sampling factor 4 — the DV/camcorder layout):
    decode loops and repeat-upsampling are ratio-generic, so the only
    round-6 change was widening validation to T.81's 1-4 range. All
    three entropy paths (baseline Huffman, progressive, arithmetic)
    must agree pixel-exactly, restarts included; a non-integer factor
    mix still refuses loudly."""
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (23, 37, 3)).astype(np.uint8)
    base = codecs.decode_jpeg(
        codecs.encode_jpeg(px, quality=90, subsampling="411")
    )
    assert base.shape == px.shape
    for data in (
        jpeg_mod.encode_jpeg_progressive(px, quality=90, subsampling="411"),
        jpeg_arith_mod.encode_jpeg_arithmetic(
            px, quality=90, subsampling="411"
        ),
        codecs.encode_jpeg(
            px, quality=90, subsampling="411", restart_interval=2
        ),
    ):
        assert np.array_equal(codecs.decode_jpeg(data), base)
    gray = np.repeat(
        rng.randint(0, 256, (16, 32, 1), dtype=np.uint8), 3, axis=2
    )
    out = codecs.decode_jpeg(
        codecs.encode_jpeg(gray, quality=100, subsampling="411")
    )
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2

    # a 3-vs-2 factor mix needs fractional resampling: loud refusal
    # (SOF layout: j+10..12 Y triple, j+13..15 Cb triple)
    good = codecs.encode_jpeg(px, quality=90, subsampling="420")
    j = good.index(b"\xff\xc0")
    sof = bytearray(good[j : j + 19])
    sof[11] = 0x31  # Y 3x1
    sof[14] = 0x21  # Cb 2x1 -> hmax 3 not divisible by 2
    bad = good[:j] + bytes(sof) + good[j + 19 :]
    with pytest.raises(ValueError, match="upsampling|sampling"):
        codecs.decode_jpeg(bad)


def test_arithmetic_jpeg_exact_parity_with_huffman():
    """Sequential arithmetic coding (SOF9, T.81 Annex D/F): entropy
    coding is lossless, so the arithmetic encode -> decode of an image
    must be PIXEL-IDENTICAL to the Huffman decode of the same image at
    the same quality/subsampling (the two paths share the DCT/quant
    front half and diverge only in the entropy stage). Checked across
    all four chroma layouts, several qualities, non-multiple-of-MCU
    dimensions, and a restart-interval stream; the arithmetic file
    must also be smaller (the QM coder's whole point)."""
    rng = np.random.RandomState(99)
    cases = [
        ((24, 31), "444", 90), ((17, 22), "420", 50),
        ((16, 16), "422", 75), ((40, 9), "440", 95),
        ((8, 8), "444", 100), ((33, 45), "420", 30),
    ]
    smaller = 0
    for (h, w), sub, q in cases:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        huff_bytes = codecs.encode_jpeg(px, quality=q, subsampling=sub)
        arith_bytes = jpeg_arith_mod.encode_jpeg_arithmetic(
            px, quality=q, subsampling=sub
        )
        assert np.array_equal(
            codecs.decode_jpeg(arith_bytes), codecs.decode_jpeg(huff_bytes)
        ), (sub, q)
        smaller += len(arith_bytes) < len(huff_bytes)
    assert smaller >= len(cases) - 1  # allow one tiny-image exception

    # restart intervals: flush + RSTn + full statistics reset per
    # interval must reproduce the same coefficients
    px = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=85))
    for sub, ri in [("444", 3), ("420", 1)]:
        got = codecs.decode_jpeg(
            jpeg_arith_mod.encode_jpeg_arithmetic(
                px, quality=85, subsampling=sub, restart_interval=ri
            )
        )
        huff = codecs.decode_jpeg(
            codecs.encode_jpeg(px, quality=85, subsampling=sub)
        )
        assert np.array_equal(got, huff), (sub, ri)


def test_progressive_arithmetic_jpeg_parity():
    """SOF10 (Annex G.2 x Annex D): the 14-scan progressive
    arithmetic script — interleaved DC-first at Al=1, per-component
    AC bands 1-5/6-63 at Al=2, fixed-bin DC refinement, two AC
    refinement passes — must decode pixel-identically to the baseline
    Huffman stream of the same image (all four entropy/structure
    paths share the quantized coefficients). Checked across all five
    chroma layouts and odd dimensions."""
    rng = np.random.RandomState(12)
    cases = [
        ((24, 31), "444", 90), ((17, 22), "420", 50),
        ((16, 16), "422", 75), ((40, 9), "440", 95),
        ((23, 37), "411", 85), ((8, 8), "444", 100),
    ]
    for (h, w), sub, q in cases:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        base = codecs.decode_jpeg(
            codecs.encode_jpeg(px, quality=q, subsampling=sub)
        )
        got = codecs.decode_jpeg(
            jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
                px, quality=q, subsampling=sub
            )
        )
        assert np.array_equal(got, base), (sub, q)
    # the stream really is SOF10 + DAC
    data = jpeg_arith_mod.encode_jpeg_progressive_arithmetic(px)
    assert b"\xff\xca" in data and b"\xff\xcc" in data


def test_arithmetic_jpeg_marker_contracts():
    """SOF9 stream structure: DAC conditioning is parsed and
    validated (L > U and out-of-range Kx raise), progressive
    arithmetic (SOF10) refuses loudly, and a DAC-less SOF9 stream
    decodes with the spec defaults (L=0, U=1, Kx=5)."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    data = jpeg_arith_mod.encode_jpeg_arithmetic(px, quality=90)

    # the emitted stream carries a DAC segment
    assert b"\xff\xcc" in data
    # strip DAC -> defaults apply, decode unchanged (the emitted DAC
    # IS the default conditioning)
    i = data.index(b"\xff\xcc")
    seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
    stripped = data[:i] + data[i + 2 + seg_len :]
    assert np.array_equal(
        codecs.decode_jpeg(stripped), codecs.decode_jpeg(data)
    )

    # corrupt DAC: DC conditioning with L > U
    bad = bytearray(data)
    bad[i + 5] = 0x0F  # (U=0, L=15)
    with pytest.raises(ValueError, match="DAC"):
        codecs.decode_jpeg(bytes(bad))
    # corrupt DAC: AC Kx = 0
    bad = bytearray(data)
    bad[i + 9] = 0x00  # first AC pair's Kx
    with pytest.raises(ValueError, match="DAC"):
        codecs.decode_jpeg(bytes(bad))

    # relabeling the sequential stream as SOF10 contradicts its
    # full-band scan header (progressive DC scans need Se=0): loud
    j = data.index(b"\xff\xc9")
    sof10 = data[:j] + b"\xff\xca" + data[j + 2 :]
    with pytest.raises(ValueError, match="Se=0|progressive"):
        codecs.decode_jpeg(sof10)
    # relabeling as lossless (SOF3) dispatches to the Annex H decoder,
    # where the sequential scan header (Ss=0 = predictor 0) is invalid
    sof3 = data[:j] + b"\xff\xc3" + data[j + 2 :]
    # (an arithmetic stream carries no DHT, so the lossless path
    # refuses at the table lookup before reaching the Ss check)
    with pytest.raises(ValueError, match="predictor|lossless|DC table"):
        codecs.decode_jpeg(sof3)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_jpeg_roundtrip_exact_every_predictor(predictor):
    """SOF3 is lossless by construction: decode(encode(x)) must be
    BIT-exact for every Annex H predictor, including 1-pixel and
    single-row/column shapes where only the start-up rules apply."""
    rng = np.random.default_rng(100 + predictor)
    for h, w in [(1, 1), (1, 9), (8, 1), (16, 24), (33, 17)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=predictor)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        out = jpeg_lossless_mod.decode_jpeg_lossless(data)
        assert out.dtype == np.uint8 and np.array_equal(out, px)


def test_lossless_jpeg_dispatches_through_decode_jpeg():
    """The shared decode_jpeg entry must route SOF3 frames to the
    Annex H decoder (the mapInPandas stages only ever call
    decode_jpeg)."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    out = codecs.decode_jpeg(
        jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=4)
    )
    assert np.array_equal(out, px)


def test_lossless_jpeg_point_transform_and_restarts():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (15, 11, 3), dtype=np.uint8)
    # Pt drops low bits BEFORE prediction; reconstruction shifts back
    out = jpeg_lossless_mod.decode_jpeg_lossless(
        jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=2, point_transform=2)
    )
    assert np.array_equal(out, (px >> 2) << 2)
    # restart rows re-engage the start-of-scan prediction rules
    for rows in (1, 3, 7):
        out = jpeg_lossless_mod.decode_jpeg_lossless(
            jpeg_lossless_mod.encode_jpeg_lossless(
                px, predictor=6, restart_rows=rows
            )
        )
        assert np.array_equal(out, px)
    # combined: point transform + restarts
    out = jpeg_lossless_mod.decode_jpeg_lossless(
        jpeg_lossless_mod.encode_jpeg_lossless(
            px, predictor=7, point_transform=3, restart_rows=4
        )
    )
    assert np.array_equal(out, (px >> 3) << 3)


def test_lossless_jpeg_rejects_bad_params_and_streams():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=0)
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=8)
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless(px, point_transform=8)
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless(np.zeros((4, 4), dtype=np.uint8))
    good = jpeg_lossless_mod.encode_jpeg_lossless(
        np.full((4, 4, 3), 9, dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        jpeg_lossless_mod.decode_jpeg_lossless(good[:20])  # truncated
    with pytest.raises(ValueError):
        jpeg_lossless_mod.decode_jpeg_lossless(b"not a jpeg")
    # a BASELINE stream handed to the lossless decoder is refused
    base = codecs.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_lossless_mod.decode_jpeg_lossless(base)


def test_decode_stage_handles_lossless_jpeg(spark):
    """SOF3 payloads flow through the same Arrow decode stage (magic
    bytes route to decode_jpeg, which dispatches on the frame marker)
    — and losslessly, so decoded dims AND a re-decode are exact."""
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    good = jpeg_lossless_mod.encode_jpeg_lossless(px, predictor=4)
    rows = [
        (1, "image", bytearray(good), "image/jpeg"),
        (2, "image", bytearray(good[:30]), "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, modality string, payload binary, mime_type string"
    )
    got = {
        r["sample_id"]: (r["decoded_width"], r["decoded_height"])
        for r in multimodal.decode_media(df).collect()
    }
    assert got == {1: (14, 10), 2: (None, None)}


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_arith_lossless_jpeg_roundtrip_exact(predictor):
    """SOF11 (Annex H.2): the QM coder with spatial (Da, Db)
    conditioning must reproduce every pixel bit-exactly for every
    predictor, like the Huffman lossless path."""
    rng = np.random.default_rng(200 + predictor)
    for h, w in [(1, 1), (1, 9), (8, 1), (16, 24)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
            px, predictor=predictor
        )
        assert np.array_equal(
            jpeg_lossless_mod.decode_jpeg_lossless(data), px
        )


def test_arith_lossless_jpeg_variants():
    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, (15, 11, 3), dtype=np.uint8)
    # dispatch through the shared decode_jpeg entry
    assert np.array_equal(
        codecs.decode_jpeg(
            jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(px)
        ),
        px,
    )
    # restart rows reset QM registers + statistics + prediction
    for rows in (1, 4):
        assert np.array_equal(
            jpeg_lossless_mod.decode_jpeg_lossless(
                jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
                    px, predictor=5, restart_rows=rows
                )
            ),
            px,
        )
    # non-default DAC conditioning changes contexts, not values
    assert np.array_equal(
        jpeg_lossless_mod.decode_jpeg_lossless(
            jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
                px, conditioning=(2, 5)
            )
        ),
        px,
    )
    # point transform composes
    assert np.array_equal(
        jpeg_lossless_mod.decode_jpeg_lossless(
            jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
                px, predictor=7, point_transform=3
            )
        ),
        (px >> 3) << 3,
    )
    # adaptation earns its keep: smooth content codes far smaller
    # under the QM coder than under the fixed lossless Huffman table
    xx, yy = np.meshgrid(np.arange(48), np.arange(48))
    smooth = np.stack(
        [(xx * 2) % 256, (yy * 2) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    assert len(
        jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(smooth)
    ) < len(jpeg_lossless_mod.encode_jpeg_lossless(smooth)) // 4
    # bad params refused
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(px, predictor=0)
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless_arithmetic(
            px, conditioning=(5, 2)  # L > U
        )


# ---------------------------------------------------------------------------
# Hierarchical JPEG (Annex J: DHP + EXP + differential frames)
# ---------------------------------------------------------------------------


def test_hierarchical_jpeg_roundtrip_quality_ladder():
    """Annex J pyramid: base frame + differential refinements. At
    q=100 the residual quant table is all-ones, so the full pyramid
    reconstructs within float rounding; lossy qualities degrade
    gracefully on the hardest (noise) content."""
    rng = np.random.default_rng(31)
    for h, w in [(16, 24), (33, 17), (1, 1), (7, 5)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = jpeg_hier_mod.encode_jpeg_hierarchical(px, quality=100)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert b"\xff\xde" in data and b"\xff\xc5" in data  # DHP + SOF5
        assert b"\xff\xdf" in data                          # EXP
        out = jpeg_hier_mod.decode_jpeg_hierarchical(data)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 1
        lossy = jpeg_hier_mod.decode_jpeg_hierarchical(
            jpeg_hier_mod.encode_jpeg_hierarchical(px, quality=80)
        )
        assert lossy.shape == px.shape
        assert np.abs(lossy.astype(int) - px.astype(int)).mean() < 16


def test_hierarchical_jpeg_three_levels_and_dispatch():
    rng = np.random.default_rng(32)
    px = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    data = jpeg_hier_mod.encode_jpeg_hierarchical(px, quality=100, levels=3)
    # two EXP + two differential frames in a 3-level pyramid
    assert data.count(b"\xff\xdf\x00\x03\x11") == 2
    out = codecs.decode_jpeg(data)  # dispatched via the DHP marker
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1
    # smooth content: the pyramid actually helps — residuals are tiny
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    smooth = np.stack(
        [(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    sm = jpeg_hier_mod.decode_jpeg_hierarchical(
        jpeg_hier_mod.encode_jpeg_hierarchical(smooth, quality=90)
    )
    assert np.abs(sm.astype(int) - smooth.astype(int)).mean() < 6


def test_hierarchical_jpeg_rejects_bad_streams_and_params():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        jpeg_hier_mod.encode_jpeg_hierarchical(px, levels=1)
    with pytest.raises(ValueError):
        jpeg_hier_mod.encode_jpeg_hierarchical(px, quality=0)
    good = jpeg_hier_mod.encode_jpeg_hierarchical(
        np.full((12, 12, 3), 77, dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        jpeg_hier_mod.decode_jpeg_hierarchical(good[:40])
    with pytest.raises(ValueError):
        jpeg_hier_mod.decode_jpeg_hierarchical(b"nope")
    # a plain baseline stream has no DHP -> the hier decoder refuses
    base = codecs.encode_jpeg(px)
    with pytest.raises(ValueError):
        jpeg_hier_mod.decode_jpeg_hierarchical(base)


def test_lossless_jpeg_full_precision_range():
    """Annex H spans sample precisions 2-16; both entropy paths must
    round-trip bit-exactly across the ladder, including the P=16
    modulo-2^16 fold where the difference -32768 rides the SSSS=16
    no-amplitude-bits codeword (Huffman) / the 15-level X tree (QM)."""
    rng = np.random.default_rng(41)
    for prec in (2, 4, 12, 16):
        hi = 1 << prec
        dt = np.uint16 if prec > 8 else np.uint8
        px = rng.integers(0, hi, (9, 13, 3)).astype(dt)
        for enc in (
            jpeg_lossless_mod.encode_jpeg_lossless,
            jpeg_lossless_mod.encode_jpeg_lossless_arithmetic,
        ):
            out = jpeg_lossless_mod.decode_jpeg_lossless(
                enc(px, predictor=4, precision=prec)
            )
            assert out.dtype == dt and np.array_equal(out, px)
    # adversarial 16-bit alternation: every diff lands at the fold
    ext = np.zeros((4, 6, 3), dtype=np.uint16)
    ext[:, 1::2] = 65535
    for predictor in (1, 2, 4, 7):
        for enc in (
            jpeg_lossless_mod.encode_jpeg_lossless,
            jpeg_lossless_mod.encode_jpeg_lossless_arithmetic,
        ):
            assert np.array_equal(
                jpeg_lossless_mod.decode_jpeg_lossless(
                    enc(ext, predictor=predictor, precision=16)
                ),
                ext,
            )
    # 12-bit composes with point transform + restarts
    px12 = rng.integers(0, 4096, (11, 7, 3)).astype(np.uint16)
    out = jpeg_lossless_mod.decode_jpeg_lossless(
        jpeg_lossless_mod.encode_jpeg_lossless(
            px12, precision=12, point_transform=3, restart_rows=4
        )
    )
    assert np.array_equal(out, (px12 >> 3) << 3)
    # out-of-range samples refused loudly
    with pytest.raises(ValueError, match="range"):
        jpeg_lossless_mod.encode_jpeg_lossless(
            np.full((2, 2, 3), 300, np.uint16), precision=8
        )
    with pytest.raises(ValueError):
        jpeg_lossless_mod.encode_jpeg_lossless(
            np.zeros((2, 2, 3), np.uint8), precision=17
        )


def test_extended_sequential_12bit_roundtrip():
    """SOF1 at precision 12: level shift 2048, x16-scaled 16-bit DQT,
    extended flat Huffman tables (DC categories to 15, AC sizes to
    14). Quality 100 error scales with the x16 quant floor — the
    12-bit analog of the 8-bit +-2 bound — and flat content survives
    exactly."""
    rng = np.random.default_rng(51)
    px = rng.integers(0, 4096, (16, 24, 3)).astype(np.uint16)
    data = jpeg_mod.encode_jpeg_extended(px, quality=100)
    assert b"\xff\xc1" in data
    out = codecs.decode_jpeg(data)
    assert out.dtype == np.uint16 and out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 40
    flat = np.full((9, 7, 3), 2222, np.uint16)
    assert np.array_equal(
        codecs.decode_jpeg(jpeg_mod.encode_jpeg_extended(flat, quality=90)),
        flat,
    )
    # range and shape validation are loud
    with pytest.raises(ValueError):
        jpeg_mod.encode_jpeg_extended(
            np.full((4, 4, 3), 5000, np.uint16)
        )
    # SOF0 stays 8-bit-only: relabeling a 12-bit stream as SOF0 fails
    sof0 = data.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError, match="precision"):
        codecs.decode_jpeg(sof0)


def test_12bit_progressive_and_arithmetic_modes():
    """T.81 table B.2 allows 12-bit for every non-baseline DCT frame.
    Progressive (SOF2), sequential arithmetic (SOF9) and progressive
    arithmetic (SOF10) at precision 12 share `_quantize_planes`'
    x16-scaled front half, so all three must decode to BIT-IDENTICAL
    uint16 pixels — the same cross-path parity contract the 8-bit
    paths pin, now across the full precision matrix."""
    rng = np.random.default_rng(52)
    for (h, w, q, sub) in [(16, 24, 90, "444"), (21, 13, 75, "444"),
                           (24, 16, 90, "420")]:
        px = rng.integers(0, 4096, (h, w, 3)).astype(np.uint16)
        streams = {
            "sof2": jpeg_mod.encode_jpeg_progressive(
                px, quality=q, subsampling=sub, precision=12
            ),
            "sof9": jpeg_arith_mod.encode_jpeg_arithmetic(
                px, quality=q, subsampling=sub, precision=12
            ),
            "sof10": jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
                px, quality=q, subsampling=sub, precision=12
            ),
        }
        assert b"\xff\xc2" in streams["sof2"]
        assert b"\xff\xc9" in streams["sof9"]
        assert b"\xff\xca" in streams["sof10"]
        outs = {k: codecs.decode_jpeg(v) for k, v in streams.items()}
        for k, out in outs.items():
            assert out.dtype == np.uint16 and out.shape == px.shape, k
        assert np.array_equal(outs["sof2"], outs["sof9"])
        assert np.array_equal(outs["sof2"], outs["sof10"])
    # flat content survives exactly through every path (x16 quant
    # floor divides the all-DC blocks evenly)
    flat = np.full((9, 7, 3), 2222, np.uint16)
    for enc in (
        lambda p: jpeg_mod.encode_jpeg_progressive(p, 90, precision=12),
        lambda p: jpeg_arith_mod.encode_jpeg_arithmetic(p, 90, precision=12),
        lambda p: jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
            p, 90, precision=12
        ),
    ):
        assert np.array_equal(codecs.decode_jpeg(enc(flat)), flat)
    # sequential arithmetic at 12-bit with restart intervals: RSTn
    # resync composes with the wider precision
    px = rng.integers(0, 4096, (24, 24, 3)).astype(np.uint16)
    with_rst = jpeg_arith_mod.encode_jpeg_arithmetic(
        px, quality=85, restart_interval=2, precision=12
    )
    no_rst = jpeg_arith_mod.encode_jpeg_arithmetic(
        px, quality=85, precision=12
    )
    assert b"\xff\xdd" in with_rst
    assert np.array_equal(
        codecs.decode_jpeg(with_rst), codecs.decode_jpeg(no_rst)
    )
    # range validation stays loud on every 12-bit entry
    bad = np.full((4, 4, 3), 5000, np.uint16)
    for enc in (
        lambda p: jpeg_mod.encode_jpeg_progressive(p, 90, precision=12),
        lambda p: jpeg_arith_mod.encode_jpeg_arithmetic(p, 90, precision=12),
        lambda p: jpeg_arith_mod.encode_jpeg_progressive_arithmetic(
            p, 90, precision=12
        ),
    ):
        with pytest.raises(ValueError, match="12-bit"):
            enc(bad)


def test_12bit_hierarchical_roundtrip():
    """Hierarchical (Annex J) at precision 12: SOF1 base frame
    (baseline SOF0 is 8-bit-only per table B.2), 16-bit DQT, 2048
    level shift, widened differential clamps. Error scale matches the
    8-bit hierarchical bound x the 16x quant scale; flat content
    survives exactly; dispatch flows through decode_jpeg."""
    rng = np.random.default_rng(53)
    y, x = np.mgrid[0:37, 0:29]
    img = np.stack(
        [(y * 53 + x * 11) % 4096, (x * 97) % 4096, ((x + y) * 157) % 4096],
        axis=-1,
    ).astype(np.uint16)
    img = (img // 4 + 1024).astype(np.uint16)
    for levels in (2, 3):
        data = jpeg_hier_mod.encode_jpeg_hierarchical(
            img, quality=90, levels=levels, precision=12
        )
        assert b"\xff\xde" in data  # DHP
        assert b"\xff\xc1" in data  # SOF1 base
        assert b"\xff\xc5" in data  # SOF5 differential
        out = codecs.decode_jpeg(data)
        assert out.dtype == np.uint16 and out.shape == img.shape
        # 8-bit hierarchical bounds ~13/255 at q90 on this content;
        # scaled x16 for the 12-bit quant floor with headroom
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 400
    flat = np.full((10, 9, 3), 2222, np.uint16)
    assert np.array_equal(
        codecs.decode_jpeg(
            jpeg_hier_mod.encode_jpeg_hierarchical(
                flat, quality=90, precision=12
            )
        ),
        flat,
    )
    with pytest.raises(ValueError, match="12-bit"):
        jpeg_hier_mod.encode_jpeg_hierarchical(
            np.full((4, 4, 3), 5000, np.uint16), precision=12
        )
    # frame/DHP precision mismatch is loud: relabel the SOF1 base of
    # a 12-bit stream as SOF0 (8-bit-only marker)
    data = jpeg_hier_mod.encode_jpeg_hierarchical(
        flat, quality=90, precision=12
    )
    bad = data.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bad)


# ---------------------------------------------------------------------------
# A/V container metadata (functions/av_meta.py): MP3 frame walk + MP4 box walk
# ---------------------------------------------------------------------------


def test_mp3_meta_fixture_roundtrip_and_id3_skip():
    from etl_property_rumah123_spark.functions import av_meta

    for nf in (1, 4, 7):
        data = av_meta.encode_mp3_stub(b"payload bytes", nf)
        m = av_meta.parse_mp3_meta(data)
        assert m["n_frames"] == nf
        assert m["sample_rate"] == 44100 and m["bitrate_kbps"] == 128
        assert m["duration_ms"] == nf * 1152 * 1000 // 44100
    # same frames without the ID3 tag parse identically
    raw = av_meta.encode_mp3_stub(b"x", 3)[42:]
    assert av_meta.parse_mp3_meta(raw)["n_frames"] == 3
    # a truncated final frame is not counted (salvage-what-parses)
    cut = av_meta.encode_mp3_stub(b"x", 3)[:-10]
    assert av_meta.parse_mp3_meta(cut)["n_frames"] == 2


def test_mp3_meta_parses_other_spec_shapes_not_just_the_fixture():
    """The parser implements the 11172-3 tables, not the fixture: a
    hand-built MPEG-2 Layer III mono frame (16 kHz, 64 kbps — 576
    samples, coefficient 72) and an MPEG-1 Layer II frame parse with
    the right arithmetic."""
    from etl_property_rumah123_spark.functions import av_meta

    # MPEG2 (version bits 10 -> 0xF3), L3, bitrate idx 8=64k, rate idx 1=16k?
    # _SAMPLE_RATES[2] = (22050, 24000, 16000) -> idx 2 = 16000
    h = bytes([0xFF, 0xF3, 0x80 | (2 << 2), 0x00])
    flen = 72 * 64000 // 16000  # 288
    m = av_meta.parse_mp3_meta(h + b"\x00" * (flen - 4))
    assert m["n_frames"] == 1 and m["sample_rate"] == 16000
    assert m["duration_ms"] == 576 * 1000 // 16000  # 36 ms
    # MPEG1 Layer II (layer bits 10 -> 0xFD), idx 9=160k, 44100
    h2 = bytes([0xFF, 0xFD, 0x90, 0x00])
    flen2 = 144 * 160000 // 44100
    m2 = av_meta.parse_mp3_meta(h2 + b"\x00" * (flen2 - 4))
    assert m2["n_frames"] == 1 and m2["duration_ms"] == 1152 * 1000 // 44100
    # free-format (idx 0) and reserved rate refuse
    assert av_meta.parse_mp3_meta(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 500) is None
    assert av_meta.parse_mp3_meta(bytes([0xFF, 0xFB, 0x9C, 0x00]) + b"\x00" * 500) is None


def test_mp4_meta_box_walk_v0_v1_and_largesize():
    from etl_property_rumah123_spark.functions import av_meta

    data = av_meta.encode_mp4_stub(640, 360, 2500, b"mdat body")
    m = av_meta.parse_mp4_meta(data)
    assert (m["width"], m["height"], m["duration_ms"]) == (640, 360, 2500)
    assert m["timescale"] == 1000 and m["n_tracks"] == 1

    # version-1 mvhd (64-bit duration) with timescale 90000
    u32, u64 = (lambda v: v.to_bytes(4, "big")), (lambda v: v.to_bytes(8, "big"))
    mvhd_v1 = (
        u32(120) + b"mvhd" + bytes([1, 0, 0, 0])
        + u64(0) + u64(0) + u32(90000) + u64(90000 * 7)
        + b"\x00" * (120 - 8 - 4 - 8 - 8 - 4 - 8)
    )
    moov = u32(8 + len(mvhd_v1)) + b"moov" + mvhd_v1
    m1 = av_meta.parse_mp4_meta(moov)
    assert m1["duration_ms"] == 7000 and m1["timescale"] == 90000

    # 64-bit largesize box wrapping the same moov content
    large = u32(1) + b"moov" + u64(16 + len(mvhd_v1)) + mvhd_v1
    assert av_meta.parse_mp4_meta(large)["duration_ms"] == 7000

    # malformed: size pointing past the buffer stops the walk cleanly
    bad = u32(10_000) + b"moov" + b"\x00" * 8
    assert av_meta.parse_mp4_meta(bad) is None

    # truncated version-1 mvhd (body 28..31 bytes): the 8-byte
    # duration at offset 24 needs a 32-byte body — a shorter box must
    # be REJECTED (duration None), never read the next box's header
    # bytes as duration
    for body_len in (28, 31):
        short = (
            u32(8 + body_len) + b"mvhd" + bytes([1, 0, 0, 0])
            + b"\x00" * (body_len - 4)
        )
        trailer = u32(16) + b"free" + b"\xff" * 8
        moov_short = u32(8 + len(short) + len(trailer)) + b"moov" + short + trailer
        ms = av_meta.parse_mp4_meta(moov_short)
        assert ms["duration_ms"] is None and ms["timescale"] is None


def test_decode_media_extracts_av_container_metadata(spark):
    """The Arrow-batched decode stage reads MP3 duration and MP4
    dims+duration through the mime router — NULL pixel dims for audio,
    no sample decode anywhere."""
    from etl_property_rumah123_spark.operators.multimodal import (
        decode_media,
        synthesize_av_media,
    )

    docs = table(spark, SF_SMOKE, "documents").limit(40)
    out = decode_media(synthesize_av_media(docs)).collect()
    assert out, "no av rows synthesized"
    by_id = {r["sample_id"]: r for r in out}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for sid, r in by_id.items():
        n = len((texts[sid] or "").encode("utf-8"))
        if sid % 2 == 0:
            assert r["modality"] == "mp3"
            assert r["decoded_ms"] == (1 + n % 7) * 1152 * 1000 // 44100
            assert r["decoded_width"] is None and r["decoded_height"] is None
            assert r["payload_bytes"] == 42 + 417 * (1 + n % 7)
        else:
            assert r["modality"] == "mp4"
            assert r["decoded_width"] == 16 * (1 + sid % 4)
            assert r["decoded_height"] == 16 * (1 + sid % 3)
            assert r["decoded_ms"] == 1000 + n % 5000
            assert r["payload_bytes"] == 244 + n


def test_id3v2_text_frames_and_mp4_track_metadata():
    """Tag/track enrichment: ID3v2.3 (plain frame sizes) and v2.4
    (syncsafe) text frames decode across latin-1/UTF-16/UTF-8; the
    MP4 walk counts handler types and reads the first audio track's
    sample rate from its mdhd media timescale. Default fixture bytes
    are UNCHANGED (the suite oracle rebuilds them in SQL)."""
    from etl_property_rumah123_spark.functions import av_meta

    # default stubs stay byte-stable for the DuckDB oracle
    assert av_meta.encode_mp3_stub(b"hello", 3)[:10] == (
        b"ID3\x03\x00\x00\x00\x00\x00\x20"
    )
    assert len(av_meta.encode_mp4_stub(16, 32, 1234, b"x")) == 245

    tags = {"title": "Nightfall", "artist": "Band ünïcode", "year": "1999"}
    data = av_meta.encode_mp3_stub(b"x", 2, tags=tags)
    assert av_meta.parse_id3v2_tags(data) == tags
    assert av_meta.parse_mp3_meta(data)["n_frames"] == 2  # frames follow tag
    assert av_meta.parse_id3v2_tags(b"not a tag") == {}

    # v2.4 syncsafe frame size + UTF-16 text encoding
    body = b"TIT2" + bytes([0, 0, 0, 5]) + b"\x00\x00" + b"\x03abcd"
    sz = len(body)
    tag24 = b"ID3" + bytes([4, 0, 0]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + body
    assert av_meta.parse_id3v2_tags(tag24) == {"title": "abcd"}
    fb = b"\x01" + "Tïtle".encode("utf-16")
    body = b"TIT2" + len(fb).to_bytes(4, "big") + b"\x00\x00" + fb
    tag = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, len(body)]) + body
    assert av_meta.parse_id3v2_tags(tag) == {"title": "Tïtle"}

    v = av_meta.encode_mp4_stub(640, 360, 2500, b"pay", audio_rate=48000)
    m = av_meta.parse_mp4_meta(v)
    assert m["n_tracks"] == 2 and m["n_audio"] == 1
    assert m["audio_sample_rate"] == 48000
    assert (m["width"], m["height"], m["duration_ms"]) == (640, 360, 2500)
    m0 = av_meta.parse_mp4_meta(av_meta.encode_mp4_stub(16, 32, 9, b""))
    assert m0["n_video"] == 0 and m0["audio_sample_rate"] is None
