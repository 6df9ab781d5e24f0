"""Deterministic synthetic audio-clip + transcript table (the north-star
input shape from BASELINE.json input_hint):

    (clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
     transcript string)

No external data, no wall clock — everything derives from (seed, clip index)
so any row can be re-synthesized bit-exactly anywhere (that's what makes the
per-row invariant checkable: decoded PCM must match the re-synthesized
reference at SNR >= 30 dB, plus transcript equality).

Planted duplicate structure (groups of 5 consecutive clips):

    p0 base | p1 exact copy | p2 near copy (char edits) |
    p3 containment (base embedded in longer text)       | p4 singleton

so the truth clustering is {p0,p1,p2,p3} per group — exact dups exercise the
exact/hash path, near copies the MinHash/SimHash path, containments the
suffix/substring pass. ``truth_clusters`` is the out-of-band recall oracle.

Audio: seeded sine mixtures + low noise, encoded as WAV PCM16 ("pcm_s16le")
or raw G.711-style mu-law bytes ("mulaw"). Generation and decoding are
vectorized numpy inside mapInPandas/pandas UDFs — no per-row Python on the
Spark side of the boundary.
"""

from __future__ import annotations

import functools
import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GROUP = 5  # clips per planted group
_SRS = (8000, 16000, 44100)
_MU = 255.0

# deterministic ~2600-word vocabulary (syllable product). Size matters: a
# low-entropy vocabulary makes RANDOM transcripts collide in LSH bands /
# share 30-char windows at corpus scale, collapsing most of the corpus
# into one mega "near-dup" cluster — unrepresentative of real speech.
_SYL1 = ["ba", "de", "ki", "lo", "mu", "na", "po", "ra", "su", "ti", "vo", "ze"]
_SYL2 = ["can", "dor", "fen", "gal", "hex", "jin", "kor", "lum", "mar", "nis",
         "pel", "qua", "rix", "sol", "tan", "ur", "vex", "wol"]
_SYL3 = ["a", "en", "ik", "ol", "um", "ar", "es", "it", "on", "ur", "ay", "ox"]
VOCAB = [a + b + c for a in _SYL1 for b in _SYL2 for c in _SYL3]
# ndarray twin for rng.choice: Generator.choice converts a list argument to
# an object array on EVERY call (~0.5 ms for 2592 strings — as expensive as
# the waveform synthesis it sits next to); sampling from the prebuilt array
# draws the identical stream
_VOCAB_ARR = np.array(VOCAB)


def _rng(seed: int, *keys: int) -> np.random.Generator:
    h = hashlib.blake2b(np.array([seed, *keys], dtype=np.int64).tobytes(), digest_size=8)
    return np.random.default_rng(int.from_bytes(h.digest(), "little"))


# ---------------------------------------------------------------------------
# transcripts


@functools.lru_cache(maxsize=8192)
def _base_text(seed: int, group: int) -> str:
    # memoized: positions 0-3 of a group each re-derive the base text, and
    # consecutive ids in a partition share the group — deterministic, so
    # caching is purely physical
    rng = _rng(seed, group, 0)
    n_words = int(rng.integers(8, 30))
    words = rng.choice(_VOCAB_ARR, size=n_words)
    return " ".join(words.tolist())


def _near_copy(seed: int, group: int, text: str) -> str:
    """Character substitutions at ~2% rate, never touching spaces."""
    rng = _rng(seed, group, 1)
    chars = list(text)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for i in range(len(chars)):
        if chars[i] != " " and rng.random() < 0.02:
            chars[i] = letters[int(rng.integers(0, 26))]
    return "".join(chars)


def _containment(seed: int, group: int, text: str) -> str:
    rng = _rng(seed, group, 2)
    pre = " ".join(rng.choice(_VOCAB_ARR, size=int(rng.integers(2, 6))).tolist())
    post = " ".join(rng.choice(_VOCAB_ARR, size=int(rng.integers(2, 6))).tolist())
    return f"{pre} {text} {post}"


def _singleton_text(seed: int, idx: int) -> str:
    rng = _rng(seed, idx, 3)
    n_words = int(rng.integers(8, 30))
    return " ".join(rng.choice(_VOCAB_ARR, size=n_words).tolist())


def transcript_for(seed: int, idx: int) -> str:
    group, pos = divmod(idx, GROUP)
    if pos == 0:
        return _base_text(seed, group)
    if pos == 1:
        return _base_text(seed, group)
    if pos == 2:
        return _near_copy(seed, group, _base_text(seed, group))
    if pos == 3:
        return _containment(seed, group, _base_text(seed, group))
    return _singleton_text(seed, idx)


def true_cluster_for(idx: int) -> int:
    """Truth label: group id for planted members, own id for singletons."""
    group, pos = divmod(idx, GROUP)
    return group * GROUP if pos < 4 else idx


# ---------------------------------------------------------------------------
# audio synthesis + codecs


_TIME_BASE: dict[int, np.ndarray] = {}


def _time_base(sr_hz: int, n: int) -> np.ndarray:
    """Read-only prefix of arange(n)/sr — bit-identical to computing it per
    clip (integer arange is exact, division is elementwise), but the array
    is built once per (sample rate, max length seen) instead of twice per
    clip. The synthesis loop never writes into it."""
    base = _TIME_BASE.get(sr_hz)
    if base is None or len(base) < n:
        base = np.arange(max(n, sr_hz * 2), dtype=np.float32)
        base /= np.float32(sr_hz)
        base.setflags(write=False)
        _TIME_BASE[sr_hz] = base
    return base[:n]


def synth_pcm(seed: int, idx: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """float32 PCM in [-1, 1]: 3 seeded sines + light noise.

    All array math is float32 with preallocated ``out=`` buffers: the
    invariant stage re-synthesizes every clip, and on a many-core box the
    stage is DRAM-bandwidth-bound, not FLOP-bound — float64 intermediates
    double the traffic for no observable effect (16-bit quantization noise
    ~45 dB dominates; float32 sine-argument rounding sits near 48 dB). The
    rng draw ORDER and dtypes are unchanged, so seeded parameters match
    tables generated by earlier revisions."""
    rng = _rng(seed, idx, 4)
    n = int(sr_hz * dur_ms / 1000)
    t = _time_base(sr_hz, n)
    x = np.zeros(n, dtype=np.float32)
    buf = np.empty(n, dtype=np.float32)
    for _ in range(3):
        freq = float(rng.uniform(80.0, min(3800.0, sr_hz / 2.5)))
        amp = float(rng.uniform(0.1, 0.3))
        phase = float(rng.uniform(0, 2 * np.pi))
        np.multiply(t, np.float32(2.0 * np.pi * freq), out=buf)
        buf += np.float32(phase)
        np.sin(buf, out=buf)
        buf *= np.float32(amp)
        x += buf
    x += rng.normal(0.0, 0.003, size=n).astype(np.float32)
    np.clip(x, -1.0, 1.0, out=x)
    return x


def params_for(seed: int, idx: int) -> tuple[int, int, str]:
    rng = _rng(seed, idx, 5)
    sr = _SRS[idx % len(_SRS)]
    dur = int(rng.integers(200, 2001))
    codec = "pcm_s16le" if idx % 2 == 0 else "mulaw"
    return sr, dur, codec


def wav_encode_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Minimal RIFF/WAVE container, 16-bit mono PCM."""
    q = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    data = q.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def wav_decode_pcm16(raw: bytes) -> tuple[np.ndarray, int]:
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sr = struct.unpack("<I", raw[24:28])[0]
    size = struct.unpack("<I", raw[40:44])[0]
    q = np.frombuffer(raw[44 : 44 + size], dtype="<i2")
    return (q.astype(np.float32) / 32767.0), sr


def mulaw_encode(pcm: np.ndarray) -> bytes:
    y = np.sign(pcm) * np.log1p(_MU * np.abs(pcm)) / np.log1p(_MU)
    q = np.clip(np.round((y + 1.0) / 2.0 * 255.0), 0, 255).astype(np.uint8)
    return q.tobytes()


def mulaw_decode(raw: bytes) -> np.ndarray:
    # 256 possible byte values -> decode via a precomputed lookup table
    # (one gather per sample instead of sign/pow/abs array passes)
    q = np.frombuffer(raw, dtype=np.uint8)
    return _MULAW_LUT[q]


def _build_mulaw_lut() -> np.ndarray:
    q = np.arange(256, dtype=np.float64)
    y = q / 255.0 * 2.0 - 1.0
    x = np.sign(y) * ((1.0 + _MU) ** np.abs(y) - 1.0) / _MU
    return x.astype(np.float32)


_MULAW_LUT = _build_mulaw_lut()


def decode_clip(raw: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        pcm, _ = wav_decode_pcm16(raw)
        return pcm
    if codec == "mulaw":
        return mulaw_decode(raw)
    raise ValueError(f"unknown codec {codec!r}")


def encode_clip(pcm: np.ndarray, codec: str, sr_hz: int) -> bytes:
    if codec == "pcm_s16le":
        return wav_encode_pcm16(pcm, sr_hz)
    if codec == "mulaw":
        return mulaw_encode(pcm)
    raise ValueError(f"unknown codec {codec!r}")


def snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    n = min(len(ref), len(dec))
    ref, dec = ref[:n].astype(np.float64), dec[:n].astype(np.float64)
    noise = float(np.sum((ref - dec) ** 2))
    if noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(float(np.sum(ref**2)) / noise)


# ---------------------------------------------------------------------------
# table generation (distributed)

AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sr_hz", IntegerType(), False),
        StructField("dur_ms", IntegerType(), False),
        StructField("codec", StringType(), False),
        StructField("transcript", StringType(), False),
    ]
)


def synth_audio_table(
    spark: SparkSession,
    n_clips: int,
    seed: int = 42,
    partitions: int | None = None,
    with_audio: bool = True,
) -> DataFrame:
    """Distributed generation over spark.range — each partition synthesizes
    its id range independently (scales linearly with executors).
    ``with_audio=False`` skips waveform synthesis for transcript-only runs.
    """
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n_clips, numPartitions=partitions)

    def gen(iterator):
        import pyarrow as pa

        for batch in iterator:
            ids, raws, srs, durs, codecs, texts = [], [], [], [], [], []
            for idx in batch.column(0).to_pylist():
                sr, dur, codec = params_for(seed, idx)
                if with_audio:
                    pcm = synth_pcm(seed, idx, sr, dur)
                    raw = encode_clip(pcm, codec, sr)
                else:
                    raw = b""
                ids.append(f"clip{idx:012d}")
                raws.append(raw)
                srs.append(sr)
                durs.append(dur)
                codecs.append(codec)
                texts.append(transcript_for(seed, idx))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(raws, type=pa.binary()),
                    pa.array(srs, type=pa.int32()),
                    pa.array(durs, type=pa.int32()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(texts, type=pa.string()),
                ],
                names=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
            )

    return base.mapInArrow(gen, schema=AUDIO_SCHEMA)


def truth_clusters(spark: SparkSession, n_clips: int, partitions: int | None = None) -> DataFrame:
    """Out-of-band planted-cluster oracle: (clip_id, true_cluster)."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n_clips, numPartitions=partitions)
    pos = F.col("id") % GROUP
    group_rep = (F.col("id") - pos).cast(LongType())
    return base.select(
        F.format_string("clip%012d", F.col("id")).alias("clip_id"),
        F.when(pos < 4, group_rep).otherwise(F.col("id")).alias("true_cluster"),
    )


def audio_invariant(df: DataFrame, seed: int = 42, min_snr_db: float = 30.0) -> DataFrame:
    """Per-row invariant vs the reference synthesis (BASELINE.json
    input_hint): decode ``bytes`` -> PCM inside a vectorized UDF, SNR vs the
    re-synthesized reference >= 30 dB, and transcript equality. Returns
    (clip_id, snr_db, audio_ok, transcript_ok).

    Runs as ``mapInArrow``, NOT ``mapInPandas``: the Arrow->pandas
    conversion of a multi-GB binary column boxes every payload into a
    pandas object cell, which measured ~5x slower than consuming the Arrow
    record batch directly — and this byte-shuttle is the stage's
    bottleneck, not the numpy kernel."""

    out_schema = "clip_id string, snr_db double, audio_ok boolean, transcript_ok boolean"

    def check(iterator):
        import pyarrow as pa

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            codecs = batch.column(2).to_pylist()
            transcripts = batch.column(3).to_pylist()
            n = len(ids)
            snrs = np.empty(n, dtype=np.float64)
            audio_ok = np.empty(n, dtype=bool)
            tr_ok = np.empty(n, dtype=bool)
            for k in range(n):
                idx = int(ids[k][4:])
                sr, dur, codec = params_for(seed, idx)
                dec = decode_clip(payloads[k], codecs[k])
                ref = synth_pcm(seed, idx, sr, dur)
                s = snr_db(ref, dec)
                snrs[k] = min(s, 1e9)
                audio_ok[k] = s >= min_snr_db and len(dec) == len(ref)
                tr_ok[k] = transcripts[k] == transcript_for(seed, idx)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(snrs),
                    pa.array(audio_ok),
                    pa.array(tr_ok),
                ],
                names=["clip_id", "snr_db", "audio_ok", "transcript_ok"],
            )

    return df.select("clip_id", "bytes", "codec", "transcript").mapInArrow(check, out_schema)
