"""Audio DSP kernels + the audio dedup path (decode stubbed, DSP real)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _pcm(x: np.ndarray) -> bytes:
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()


def _sine(freq: float, sec: float = 1.0, rate: int = 16000,
          amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sec * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_spectral_centroid_orders_frequencies():
    from ocr_agent_ray.functions.audio import (pcm_from_bytes,
                                               spectral_centroids)

    lo = spectral_centroids(pcm_from_bytes(_pcm(_sine(200)))).mean()
    hi = spectral_centroids(pcm_from_bytes(_pcm(_sine(4000)))).mean()
    assert hi > lo > 0


def test_zcr_orders_frequencies():
    from ocr_agent_ray.functions.audio import (pcm_from_bytes,
                                               zero_crossing_rates)

    lo = zero_crossing_rates(pcm_from_bytes(_pcm(_sine(100)))).mean()
    hi = zero_crossing_rates(pcm_from_bytes(_pcm(_sine(2000)))).mean()
    assert hi > lo
    # ~2 crossings per cycle: 100 Hz over 1 s -> ~200 crossings total
    total = zero_crossing_rates(
        pcm_from_bytes(_pcm(_sine(100))), n_frames=1)[0] * 16000
    assert 150 < total < 250


def test_fingerprint_gain_invariant_and_discriminative():
    from ocr_agent_ray.functions.audio import audio_fingerprint64

    rng = np.random.default_rng(41)
    # amplitude-modulated noise -> a structured energy envelope
    env = np.repeat(rng.uniform(0.05, 0.8, 65), 250)
    x = env * rng.standard_normal(len(env))
    fp_full = audio_fingerprint64(_pcm(x))
    fp_half = audio_fingerprint64(_pcm(0.5 * x))   # gain change
    ham = bin((fp_full ^ fp_half) & (2**64 - 1)).count("1")
    assert ham <= 2    # log-energy deltas keep their sign under gain

    y = np.repeat(rng.uniform(0.05, 0.8, 65), 250) \
        * rng.standard_normal(len(env))
    fp_other = audio_fingerprint64(_pcm(y))
    assert bin((fp_full ^ fp_other) & (2**64 - 1)).count("1") > 10


def test_feature_vector_shape_and_determinism():
    from ocr_agent_ray.functions.audio import audio_feature_vector

    v1 = audio_feature_vector(_pcm(_sine(440)))
    v2 = audio_feature_vector(_pcm(_sine(440)))
    assert v1.shape == (48,) and v1.dtype == np.float32
    assert (v1 == v2).all()


def test_audio_stage_and_dup_pairs(ray_session):
    import ray.data as rd

    from ocr_agent_ray.pipelines.dedup import audio_dup_pairs
    from ocr_agent_ray.stages.media import AudioFeatureStage

    # stage: features + fingerprint appended, null ref passes through
    import pyarrow as pa

    batch = pa.table({"unit_id": pa.array([1, 2], pa.int64()),
                      "media_ref": pa.array(["audio://a", None])})
    out = AudioFeatureStage()(batch)
    assert out["audio_fp64"][0].as_py() is not None
    assert out["audio_fp64"][1].as_py() is None
    assert len(out["audio_features"][0].as_py()) == 48

    # pairs: same ref -> hamming 0; distinct refs -> no pair
    units = pd.DataFrame({
        "unit_id": np.arange(4, dtype=np.int64),
        "media_ref": ["audio://x", "audio://x",
                      "audio://y", "audio://z"],
    })
    got = audio_dup_pairs(rd.from_pandas(units), max_hamming=0).to_pandas()
    assert len(got) == 1
    assert (int(got["doc_id_a"][0]), int(got["doc_id_b"][0])) == (0, 1)


def test_audio_dup_pairs_query_planted(ray_session):
    from ocr_agent_ray.pipelines.dedup import audio_dup_pairs_query

    got = (audio_dup_pairs_query("/root/testdata/sf0.001").to_pandas()
           .sort_values("unit_a").reset_index(drop=True))
    expect = [(k * 10, k * 10 + 1) for k in range(50)]
    assert list(zip(got["unit_a"], got["unit_b"])) == expect
