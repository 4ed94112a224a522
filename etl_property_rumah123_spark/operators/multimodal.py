"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature-extract plumbing.

Design for 100 TB: media bytes live in a binary column that only the
decode stage ever touches; all filtering/joining/partitioning happens
on the typed metadata columns, so Parquet column pruning keeps scans
of metadata-only queries payload-free. Decode and feature extraction
run as ``mapInPandas`` — Arrow batches in, Arrow batches out, one
Python worker per core, no driver involvement.

The actual image/audio codecs are NOT available in this environment,
so the decode kernels are deterministic stubs behind the same
interface (clearly marked); the Spark-side plumbing — schema, batch
shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stub (DDL form for mapInPandas).
DECODE_SCHEMA = (
    "sample_id long, modality string, payload_bytes long, "
    "payload_digest string, decoded_width int, decoded_height int"
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapt the documents table into the MEDIA_SCHEMA shape: payload =
    utf-8 bytes of the text (a stand-in for image/audio bytes), typed
    metadata alongside."""
    return df.select(
        F.col("doc_id").alias("sample_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("text").alias("caption"),
    )


def _decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas kernel: per-batch 'decode' of payload bytes.

    STUB: real image decode (PIL/ffmpeg) is unavailable in this
    container. The stub computes deterministic pseudo-dimensions from
    the payload digest so the pipeline shape (binary in -> metadata
    out, Arrow both ways) is fully exercised.
    """
    import hashlib

    import pandas as pd

    for pdf in batches:
        digests = pdf["payload"].map(
            lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
        )
        yield pd.DataFrame(
            {
                "sample_id": pdf["sample_id"],
                "modality": pdf["modality"],
                "payload_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0
                ),
                "payload_digest": digests,
                # deterministic fake dims in lieu of a real codec
                "decoded_width": digests.map(
                    lambda d: (int(d[:4], 16) % 1920) + 1 if d else None
                ),
                "decoded_height": digests.map(
                    lambda d: (int(d[4:8], 16) % 1080) + 1 if d else None
                ),
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Run the Arrow-batched decode stage over a MEDIA_SCHEMA frame."""
    cols = df.select("sample_id", "modality", "payload")
    return cols.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


#: Output schema of the feature-extract stage.
FEATURE_SCHEMA = "sample_id long, feat array<float>"

#: Output schema of frame sampling: one row per sampled frame.
FRAME_SCHEMA = "sample_id long, frame_idx int, frame_digest string"


def extract_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction: payload bytes -> fixed-size
    float vector.

    STUB kernel (no vision/audio models in this container): per-sample
    byte histogram folded into ``feat_dim`` buckets and normalized —
    deterministic, shape-correct. The Spark-side contract is the real
    part: binary in, array<float> out, one vector per sample, batches
    never leave Arrow. Swap the kernel for a model forward pass (or an
    ONNX session held per-worker) in production.
    """

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                if b is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % feat_dim, minlength=feat_dim).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"sample_id": pdf["sample_id"], "feat": feats})

    return df.select("sample_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit ``n_frames`` evenly
    spaced 'frames' per sample (one output row each — a 1:N expansion
    inside mapInPandas, the shape real video pipelines need).

    STUB kernel: each frame is the md5 of its byte slice; a real
    implementation seeks the container's keyframes instead.
    """

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out_id, out_idx, out_digest = [], [], []
            for sid, b in zip(pdf["sample_id"], pdf["payload"]):
                if b is None:
                    continue
                raw = bytes(b)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    sl = raw[i * step : (i + 1) * step]
                    if not sl:
                        break
                    out_id.append(sid)
                    out_idx.append(i)
                    out_digest.append(hashlib.md5(sl).hexdigest())
            yield pd.DataFrame(
                {"sample_id": out_id, "frame_idx": out_idx, "frame_digest": out_digest}
            )

    return df.select("sample_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)


def real_image_decode(payload: bytes) -> "np.ndarray":  # noqa: F821
    """Placeholder for the production decode kernel.

    Raises until a codec library (PIL / torchvision / ffmpeg) is
    installed; ``decode_media`` uses the deterministic stub instead.
    """
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "swap _decode_batches' stub for a real kernel in production"
    )
