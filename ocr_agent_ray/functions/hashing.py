"""Deterministic hashing kernels: rolling hashes, MinHash, SimHash.

All vectorized numpy over uint64 with wrap-around arithmetic; stable across
processes and numpy versions (no python hash(), no RNG at call time).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_BASE = _U64(1099511628211)  # FNV prime as polynomial base


def splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer — a strong, cheap uint64 mixer."""
    x = x.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def rolling_hashes(text: str, k: int) -> np.ndarray:
    """All k-byte-window polynomial hashes of ``text`` (uint64, mixed).

    Vectorized: sliding windows over the utf-8 bytes x precomputed base
    powers, wrap-mod 2^64, then splitmix64.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=_U64)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=_U64)
        powers[-1] = _U64(1)
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _BASE
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(_U64)
        h = (win * powers).sum(axis=1, dtype=_U64)
        return splitmix64(h)


def char_shingle_set(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (the MinHash input set)."""
    return np.unique(rolling_hashes(text, k))


def minhash_signature(shingles: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """MinHash signature: sig[i] = min over shingles of mix(shingle ^ seed_i).

    XOR-and-mix per permutation is the standard cheap substitute for true
    random permutations (Broder '97 family); seeds are fixed constants.
    """
    if shingles.size == 0:
        return np.zeros(num_perm, dtype=_U64)
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    # (num_perm, n) table of mixed values; min along shingles
    mixed = splitmix64(shingles[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def lsh_band_keys(signature: np.ndarray, num_bands: int) -> list[int]:
    """Collapse each band of the signature to one uint64 bucket key."""
    assert signature.size % num_bands == 0
    rows = signature.size // num_bands
    with np.errstate(over="ignore"):
        bands = signature.reshape(num_bands, rows)
        # order-sensitive combine: polynomial over the band rows, then mix
        key = np.zeros(num_bands, dtype=_U64)
        for r in range(rows):
            key = key * _BASE + bands[:, r]
        # 63-bit keys so band_key columns stay int64-safe
        return [int(v) & 0x7FFFFFFFFFFFFFFF for v in splitmix64(key)]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique uint64 shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def token_hashes(text: str) -> np.ndarray:
    """One mixed uint64 per whitespace token (SimHash input)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=_U64)
    out = np.empty(len(toks), dtype=_U64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            h = _U64(14695981039346656037)  # FNV-1a over the token bytes
            for byte in t.encode("utf-8"):
                h = (h ^ _U64(byte)) * _BASE
            out[i] = h
    return splitmix64(out)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar '02)."""
    h = token_hashes(text)
    if h.size == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(value: int, num_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into num_bands chunks; near-dups within
    hamming distance < num_bands share at least one chunk (pigeonhole)."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [((value >> (i * width)) & mask) | (i << 60) for i in range(num_bands)]
