"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's contract for media columns (audio is first-class — see
sources/audio.py for REAL decode): payloads are BinaryType columns with
codec/shape metadata beside them; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInArrow`` stages so bytes never
round-trip through per-row Python or pandas object boxing.

REAL decode coverage:

- audio: WAV PCM16 + mu-law (sources/audio.py)
- image: BMP + binary PPM/PGM (pure numpy, sources/image.py); JPEG/PNG
  additionally when PIL is installed
- video: Y4M (YUV4MPEG2) frame sampling (pure numpy, sources/video.py);
  compressed codecs (H.264 etc.) need ffmpeg/pyav, absent in this
  container, and raise a clearly-marked NotImplementedError. A
  deterministic fake decode path (``fake=True``) keeps the Spark plumbing
  exercisable for compressed images without PIL.
"""

from __future__ import annotations

import hashlib

import numpy as np
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
# images (REAL decode for BMP/PPM/PGM; fake/PIL fallback for JPEG/PNG)

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

    REAL decode for BMP and binary PPM/PGM payloads (pure numpy, see
    sources/image.py) and, when PIL is installed, for JPEG/PNG too.
    Compressed payloads without PIL fall back to the deterministic fake
    decoder if ``fake=True`` (preserving schema, Arrow batching and
    partition behavior), else raise a clearly-marked NotImplementedError."""

    def extract(iterator):
        import pyarrow as pa

        from liken_spark.sources.image import decode_image

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            widths = batch.column(2).to_pylist()
            heights = batch.column(3).to_pylist()
            rows = []
            for rid, payload, w, h in zip(ids, payloads, widths, heights):
                try:
                    arr = decode_image(payload)
                except ValueError:
                    if fake:
                        arr = _fake_image_decode(payload, int(w), int(h))
                    else:
                        raise NotImplementedError(
                            "payload is a compressed format (JPEG/PNG) and PIL is "
                            "unavailable in this container; supply BMP/PPM/PGM "
                            "payloads (decoded natively) or pass fake=True"
                        ) from None
                luma = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                # 8x8 average-hash (pHash-lite): nearest-upsample tiny
                # dimensions to >= 8, then resize by block means
                if luma.shape[0] < 8:
                    luma = luma[(np.arange(8) * luma.shape[0]) // 8]
                if luma.shape[1] < 8:
                    luma = luma[:, (np.arange(8) * luma.shape[1]) // 8]
                bh, bw = max(luma.shape[0] // 8, 1), max(luma.shape[1] // 8, 1)
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
                        int(np.uint64(phash).astype(np.int64)),
                    )
                )
            cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], type=pa.string()),
                    pa.array(cols[1], type=pa.int32()),
                    pa.array(cols[2], type=pa.int32()),
                    pa.array(cols[3], type=pa.int32()),
                    pa.array(cols[4], type=pa.float64()),
                    pa.array(cols[5], type=pa.int64()),
                ],
                names=["image_id", "width", "height", "n_channels", "mean_luma", "phash"],
            )

    return df.select(
        F.col(id_col), F.col(bytes_col), F.col(width_col), F.col(height_col)
    ).mapInArrow(extract, IMAGE_FEATURES_SCHEMA)


def image_resize(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Resize image payloads to (out_w, out_h) — REAL for BMP/PPM/PGM
    payloads (nearest-neighbor via numpy fancy indexing, re-encoded as
    24-bit BMP); JPEG/PNG additionally when PIL is present. Returns
    (image_id, bytes, width, height)."""

    def transform(iterator):
        import pyarrow as pa

        from liken_spark.sources.image import bmp_encode, decode_image

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            out_ids, out_bytes = [], []
            for rid, payload in zip(ids, payloads):
                arr = decode_image(payload)
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out_bytes.append(bmp_encode(np.ascontiguousarray(arr[yi][:, xi])))
                out_ids.append(rid)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=pa.string()),
                    pa.array(out_bytes, type=pa.binary()),
                    pa.array([out_w] * len(out_ids), type=pa.int32()),
                    pa.array([out_h] * len(out_ids), type=pa.int32()),
                ],
                names=["image_id", "bytes", "width", "height"],
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInArrow(
        transform, "image_id string, bytes binary, width int, height int"
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    every_n: int = 30,
) -> DataFrame:
    """Video frame sampling — REAL decode for Y4M (YUV4MPEG2) payloads
    (pure numpy, sources/video.py: C420*/C444/Cmono). Frames are fixed
    size in the container, so sampling is offset arithmetic: only the kept
    frames' bytes are decoded, and each is re-encoded as a standalone
    24-bit BMP. Output: one row per sampled frame,
    (video_id, frame_idx, frame_bytes).

    Compressed codecs (H.264 etc.) need ffmpeg/pyav — absent in this
    container — and raise a clearly-marked NotImplementedError."""

    def extract(iterator):
        import pyarrow as pa

        from liken_spark.sources.image import bmp_encode
        from liken_spark.sources.video import y4m_decode

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            out_ids, out_idx, out_frames = [], [], []
            for vid, payload in zip(ids, payloads):
                try:
                    idx, frames = y4m_decode(payload, every_n=every_n)
                except ValueError:
                    raise NotImplementedError(
                        "payload is a compressed video codec; only Y4M "
                        "(YUV4MPEG2) decodes natively here — sampling "
                        "compressed clips requires pyav/ffmpeg (not "
                        "available in this container)"
                    ) from None
                for k, fi in enumerate(idx):
                    out_ids.append(vid)
                    out_idx.append(fi)
                    out_frames.append(bmp_encode(np.ascontiguousarray(frames[k])))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=pa.string()),
                    pa.array(out_idx, type=pa.int32()),
                    pa.array(out_frames, type=pa.binary()),
                ],
                names=["video_id", "frame_idx", "frame_bytes"],
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInArrow(
        extract, "video_id string, frame_idx int, frame_bytes binary"
    )
