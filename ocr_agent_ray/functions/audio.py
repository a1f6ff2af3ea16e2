"""Audio DSP kernels — pure numpy, NO external audio libs.

The DECODE step (container → PCM) is the only stubbed piece (see
``stages/media.py`` codecs, same discipline as image decode); everything
here operates on raw int16 mono PCM bytes and is real, deterministic
signal processing: framing, log-energy envelope, zero-crossing rate,
spectral centroid (rfft), and a 64-bit envelope fingerprint (the dHash
idea applied to the energy envelope — robust to gain changes because
only the DIRECTION of energy deltas is kept).
"""

from __future__ import annotations

import numpy as np


def pcm_from_bytes(payload: bytes) -> np.ndarray:
    """int16 little-endian mono PCM → float64 in [-1, 1)."""
    pcm = np.frombuffer(payload[: len(payload) - (len(payload) % 2)],
                        dtype="<i2")
    return pcm.astype(np.float64) / 32768.0


def frame_signal(x: np.ndarray, n_frames: int) -> np.ndarray:
    """Split a signal into ``n_frames`` equal windows (truncating the
    tail remainder); zero-pads signals shorter than n_frames."""
    if len(x) < n_frames:
        x = np.pad(x, (0, n_frames - len(x)))
    w = len(x) // n_frames
    return x[: w * n_frames].reshape(n_frames, w)


def log_energy_envelope(x: np.ndarray, n_frames: int = 65) -> np.ndarray:
    """Per-frame log energy, length n_frames."""
    f = frame_signal(x, n_frames)
    return np.log((f * f).mean(axis=1) + 1e-12)


def zero_crossing_rates(x: np.ndarray, n_frames: int = 16) -> np.ndarray:
    f = frame_signal(x, n_frames)
    s = np.signbit(f)
    return (s[:, 1:] != s[:, :-1]).mean(axis=1)


def spectral_centroids(x: np.ndarray, n_frames: int = 16) -> np.ndarray:
    """Normalized spectral centroid per frame (0..1 of Nyquist)."""
    f = frame_signal(x, n_frames)
    mag = np.abs(np.fft.rfft(f, axis=1))
    freqs = np.arange(mag.shape[1], dtype=np.float64)
    denom = mag.sum(axis=1)
    denom[denom == 0] = 1.0
    return (mag * freqs[None, :]).sum(axis=1) / denom / max(
        mag.shape[1] - 1, 1)


def audio_feature_vector(payload: bytes, dim: int = 48) -> np.ndarray:
    """Fixed-dim float32 feature: 16 log-energies + 16 ZCRs + 16
    spectral centroids — the model-free analog of an MFCC front end,
    suitable for the embedding family ops (kNN, near-dup, outliers)."""
    assert dim == 48
    x = pcm_from_bytes(payload)
    v = np.concatenate([
        log_energy_envelope(x, 16),
        zero_crossing_rates(x, 16),
        spectral_centroids(x, 16),
    ]).astype(np.float32)
    return v


def audio_fingerprint64(payload: bytes) -> int:
    """64-bit envelope fingerprint: bit i = energy[i+1] > energy[i] over
    a 65-frame log-energy envelope. Gain-invariant (log energy shifts,
    deltas keep sign); re-encodes/level changes land at small Hamming
    distance, unrelated audio at ~32. Returned as the int64
    two's-complement bit pattern (Arrow-friendly)."""
    env = log_energy_envelope(pcm_from_bytes(payload), 65)
    bits = env[1:] > env[:-1]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits.astype(np.uint64) * weights).sum(
        dtype=np.uint64).astype(np.int64))
