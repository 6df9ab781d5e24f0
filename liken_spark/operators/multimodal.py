"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's contract for media columns (audio is first-class — see
sources/audio.py for REAL decode): payloads are BinaryType columns with
codec/shape metadata beside them; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through per-row Python.

Audio decode is fully implemented (WAV PCM16 + mu-law, numpy). Image and
video decoders need PIL/ffmpeg, which this container does not ship, so the
decode *kernels* are stubbed: either a clearly-marked NotImplementedError
(default) or a deterministic fake (``fake=True``) that preserves the real
schema, batch shape, and partitioning so the Spark-side plumbing is fully
exercised and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from liken_spark.sources.audio import decode_clip

# ---------------------------------------------------------------------------
# audio (real)

AUDIO_FEATURES_SCHEMA = (
    "clip_id string, n_samples long, rms double, zero_cross_rate double, peak double"
)


def audio_features(df: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Decode audio bytes and extract waveform features — REAL decode
    (WAV PCM16 / mu-law), vectorized per Arrow batch."""

    def extract(iterator):
        import pyarrow as pa

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            codecs = batch.column(2).to_pylist()
            rows = []
            for k, cid in enumerate(ids):
                pcm = decode_clip(payloads[k], codecs[k]).astype(np.float64)
                n = len(pcm)
                rms = float(np.sqrt(np.mean(pcm**2))) if n else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.signbit(pcm))))) if n > 1 else 0.0
                rows.append((cid, n, rms, zcr, float(np.abs(pcm).max() if n else 0.0)))
            cols = list(zip(*rows)) if rows else [[], [], [], [], []]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], type=pa.string()),
                    pa.array(cols[1], type=pa.int64()),
                    pa.array(cols[2], type=pa.float64()),
                    pa.array(cols[3], type=pa.float64()),
                    pa.array(cols[4], type=pa.float64()),
                ],
                names=["clip_id", "n_samples", "rms", "zero_cross_rate", "peak"],
            )

    return df.select(F.col(id_col), "bytes", "codec").mapInArrow(
        extract, AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# images (stubbed decode, real plumbing)

IMAGE_FEATURES_SCHEMA = (
    "image_id string, width int, height int, n_channels int, mean_luma double, phash long"
)


def _fake_image_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: expands a hash of the payload into an
    (h, w, 3) uint8 array. Preserves the real kernel's contract (shape,
    dtype, determinism) without PIL."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def image_features(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    width_col: str = "width",
    height_col: str = "height",
    fake: bool = False,
) -> DataFrame:
    """Decode images and extract (luma, perceptual-hash) features.

    STUB: real decode requires PIL/libjpeg, absent in this container —
    raises NotImplementedError unless ``fake=True`` (deterministic fake
    decode; the Spark plumbing — schema, Arrow batching, partition
    behavior — is identical to the real path and is what the tests pin)."""

    def extract(iterator):
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in iterator:
            ids = pdf[id_col].to_numpy()
            payloads = pdf[bytes_col].to_numpy()
            widths = pdf[width_col].to_numpy()
            heights = pdf[height_col].to_numpy()
            rows = []
            for rid, payload, w, h in zip(ids, payloads, widths, heights):
                w, h = int(w), int(h)
                if have_pil:
                    import io

                    from PIL import Image

                    arr = np.asarray(Image.open(io.BytesIO(bytes(payload))).convert("RGB"))
                elif fake:
                    arr = _fake_image_decode(bytes(payload), w, h)
                else:
                    raise NotImplementedError(
                        "image decode requires PIL (not available in this container); "
                        "pass fake=True to exercise the pipeline with a deterministic "
                        "fake decoder"
                    )
                luma = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                # 8x8 average-hash (pHash-lite): resize by block means
                bh, bw = max(arr.shape[0] // 8, 1), max(arr.shape[1] // 8, 1)
                small = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
                bits = (small > small.mean()).flatten()
                phash = 0
                for i, b in enumerate(bits):
                    if b:
                        phash |= 1 << i
                rows.append(
                    (
                        rid,
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        float(luma.mean()),
                        np.int64(np.uint64(phash).astype(np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "width", "height", "n_channels", "mean_luma", "phash"],
            )

    return df.select(
        F.col(id_col), F.col(bytes_col), F.col(width_col), F.col(height_col)
    ).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    every_n: int = 30,
) -> DataFrame:
    """Video frame sampling: STUB — requires ffmpeg/pyav (absent). The
    signature and output schema are the real contract; calling it raises a
    clearly-marked NotImplementedError at plan execution."""

    def extract(iterator):
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg (not available in this "
            "container); schema contract: (video_id string, frame_idx int, "
            "frame_bytes binary)"
        )
        yield  # pragma: no cover

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        extract, "video_id string, frame_idx int, frame_bytes binary"
    )
