"""Numpy MinHash signatures, bit-compatible with the datasketch defaults.

The reference's ``lsh`` deduper (src/liken/dedupers/lsh.py:19-77) delegates
to datasketch ``MinHash(num_perm)`` / ``MinHashLSH(threshold, num_perm)``.
To reproduce its cluster assignments at the same (ngram, num_perm,
threshold) config without the dependency, we re-derive the *public*
datasketch defaults from its documented scheme:

- token hash: first 4 bytes of SHA1, little-endian (``sha1_hash32``)
- permutations: ``a*h + b mod p`` with p = 2^61 - 1, (a, b) drawn from
  ``numpy.random.RandomState(seed=1)`` — note datasketch computes
  ``a*h + b`` in uint64 (wrapping mod 2^64) *before* the mod-p, which we
  replicate exactly
- signature values masked to 32 bits
- LSH banding: (b, r) chosen by minimizing the weighted FP/FN integral at
  weights (0.5, 0.5) — datasketch's ``_optimal_param``

Everything here is vectorized numpy over a batch of documents; it is the
kernel invoked from Arrow-batched pandas UDFs (no per-row Python on the
Spark side).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

_MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)


@lru_cache(maxsize=32)
def permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation parameters datasketch would generate."""
    gen = np.random.RandomState(seed)
    # datasketch draws (a, b) pairs interleaved from the stream — the draw
    # order is part of the bit-compatibility contract.
    pairs = [
        (
            gen.randint(1, int(_MERSENNE_PRIME), dtype=np.uint64),
            gen.randint(0, int(_MERSENNE_PRIME), dtype=np.uint64),
        )
        for _ in range(num_perm)
    ]
    arr = np.array(pairs, dtype=np.uint64).T
    return arr[0], arr[1]


def sha1_hash32_batch(tokens: list[bytes]) -> np.ndarray:
    """sha1_hash32 per token -> uint64 array (values < 2^32)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    sha1 = hashlib.sha1
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(sha1(t).digest()[:4], "little")
    return out


def shingles(text: str, ngram: int) -> list[bytes]:
    """Character shingles as the reference generates them
    (lsh.py:44-46: ``text[i:i+ngram]`` sliding window, utf-8 encoded).
    Strings shorter than ``ngram`` produce no shingles (empty signature
    stays at the max-hash fill, exactly like an un-updated MinHash).
    """
    return [text[i : i + ngram].encode("utf-8") for i in range(len(text) - ngram + 1)]


def minhash_signature(hashes: np.ndarray, num_perm: int, seed: int = 1) -> np.ndarray:
    """Signature over a set of 32-bit token hashes. Returns uint64[num_perm]."""
    a, b = permutations(num_perm, seed)
    if hashes.size == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (P, K): uint64 wraparound then mod-p then 32-bit mask — the exact
        # datasketch arithmetic (MinHash.update).
        phv = (a[:, None] * hashes[None, :] + b[:, None]) % _MERSENNE_PRIME
    phv &= _MAX_HASH
    return phv.min(axis=1)


def minhash_text(text: str, ngram: int, num_perm: int) -> np.ndarray:
    return minhash_signature(sha1_hash32_batch(shingles(text, ngram)), num_perm)


@lru_cache(maxsize=64)
def optimal_param(
    threshold: float,
    num_perm: int,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> tuple[int, int]:
    """datasketch's ``_optimal_param``: search all (b, r) with b*r <= num_perm
    minimizing weighted FP/FN probability integrals.

    The integrands are evaluated as whole-grid numpy expressions instead of
    a per-point Python lambda loop — same IEEE-double power/trapezoid
    arithmetic, so the chosen (b, r) is identical (verified over a
    13-threshold x 4-num_perm sweep against the per-point form), but the
    search drops from ~1.0 s to ~40 ms — it used to be a visible
    driver-serial slice of every first lsh() plan build per config."""
    xs_fp = np.linspace(0.0, threshold, 2001)
    xs_fn = np.linspace(threshold, 1.0, 2001)
    best = (0, 0)
    min_error = float("inf")
    for b in range(1, num_perm + 1):
        fb = float(b)
        for r in range(1, num_perm // b + 1):
            fr = float(r)
            fp = float(np.trapz(1.0 - (1.0 - xs_fp**fr) ** fb, xs_fp))
            fn = float(np.trapz((1.0 - xs_fn**fr) ** fb, xs_fn))
            err = fp * false_positive_weight + fn * false_negative_weight
            if err < min_error:
                min_error = err
                best = (b, r)
    return best


def band_hashes(signature: np.ndarray, b: int, r: int) -> np.ndarray:
    """Collapse each of the b bands (r consecutive signature values) to one
    64-bit key via blake2b. Equal bands <=> equal keys (up to negligible
    64-bit collision probability); this is what lets the Spark side bucket
    with a plain groupBy on (band_index, band_key) instead of shipping the
    full r-slice around."""
    out = np.empty(b, dtype=np.int64)
    sig = np.ascontiguousarray(signature[: b * r], dtype=np.uint64)
    for i in range(b):
        h = hashlib.blake2b(sig[i * r : (i + 1) * r].tobytes(), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little", signed=True)
    return out


# --- SimHash (Layer-2 addition; not in the reference) ---------------------


def simhash64(tokens: list[bytes]) -> int:
    """64-bit SimHash over token hashes (Charikar 2002). Deterministic:
    token hash = first 8 bytes of blake2b.

    Vectorized bit-exactly over the whole token list (one unpackbits +
    column sum instead of a 64-element numpy pass per token — measured
    ~10x on 80-token documents; the golden signature tests pin equality
    with the original per-token formulation)."""
    if not tokens:
        return 0
    blake = hashlib.blake2b
    buf = b"".join(blake(t, digest_size=8).digest() for t in tokens)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    # acc[i] = (#ones - #zeros) at bit i; set the output bit where acc > 0
    acc = bits.sum(axis=0, dtype=np.int64) * 2 - len(tokens)
    out_bits = (acc > 0).astype(np.uint8)
    val = int.from_bytes(np.packbits(out_bits, bitorder="little").tobytes(), "little")
    return int(np.uint64(val).astype(np.int64))
