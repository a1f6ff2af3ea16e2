"""LSH-blocked embedding near-dup: planted duplicates found, cosine exact."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.pipelines.dedup import embedding_near_dup_lsh


def test_planted_near_dups_found(ray_session):
    rng = np.random.default_rng(6)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i]} for i in range(200)]
    # plant 5 near-dup pairs (ids 1000+i ~ i with small noise)
    for i in range(5):
        noisy = base[i] + 0.02 * rng.standard_normal(32).astype(np.float32)
        rows.append({"vec_id": 1000 + i, "embedding": noisy})
    df = pd.DataFrame(rows)

    out = embedding_near_dup_lsh(rd.from_pandas(df), threshold=0.95).to_pandas()
    pairs = set(zip(out["vec_id_a"], out["vec_id_b"]))
    found = sum((i, 1000 + i) in pairs for i in range(5))
    assert found >= 4  # LSH recall: allow one miss of five planted pairs

    # exact verification: reported cosine equals double-precision truth
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in rows}
    for a, b, c in zip(out["vec_id_a"], out["vec_id_b"], out["cosine"]):
        va, vb = vecs[a], vecs[b]
        truth = (va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert abs(c - round(float(truth), 6)) <= 1e-6
        assert c >= 0.95


def test_bpe_token_counts_kernel():
    from ocr_agent_ray.functions.textstats import bpe_token_counts

    s = pd.Series(["I can't stop, won't stop!", "", "hello world"])
    # "I" "'t"? tokenization: I, " can", 't, " stop", ",", " won", 't,
    # " stop", "!" -> 9
    assert list(bpe_token_counts(s)) == [9, 0, 2]
