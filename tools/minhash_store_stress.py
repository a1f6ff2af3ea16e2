"""MinHashStore admission stress (BASELINE.md): waves of docs with
planted cross-wave near-duplicates through the persistent LSH store.

Each wave is half novel docs, half ~3%-mutated variants of docs from the
PREVIOUS wave — the variants must be rejected (recall), the novels must
survive (precision). Usage:

    python tools/minhash_store_stress.py [docs_per_wave] [n_waves]
"""

from __future__ import annotations

import shutil
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def _mk_docs(rng, vocab, n, start_id):
    import numpy as np
    import pandas as pd

    words = rng.choice(vocab, size=(n, 60))
    return pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + n, dtype=np.int64),
        "text": [" ".join(w) for w in words],
    }), words


def _mutate(rng, words, start_id):
    import numpy as np
    import pandas as pd

    w = words.copy()
    for r in range(len(w)):  # ~3% token mutation
        idx = rng.choice(60, size=2, replace=False)
        w[r, idx] = "MUT" + str(r)
    return pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + len(w), dtype=np.int64),
        "text": [" ".join(x) for x in w],
    })


def main() -> None:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    per_wave = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.pipelines.dedup import MinHashStore

    root = "/tmp/minhash_store_stress"
    shutil.rmtree(root, ignore_errors=True)
    rng = np.random.default_rng(29)
    vocab = np.array([f"w{i}" for i in range(5000)], dtype=object)
    store = MinHashStore(root, threshold=0.7, num_buckets=32)

    prev_words = None
    next_id = 0
    for wave in range(n_waves):
        novel, words = _mk_docs(rng, vocab, per_wave // 2, next_id)
        next_id += per_wave // 2
        if prev_words is not None:
            dups = _mutate(rng, prev_words[: per_wave // 2], next_id)
            next_id += len(dups)
            batch = pd.concat([novel, dups], ignore_index=True)
            expected = set(novel["doc_id"])
        else:
            batch = novel
            expected = set(novel["doc_id"])
        t0 = time.monotonic()
        got = set(store.admit(rd.from_pandas(batch))
                  .to_pandas()["doc_id"])
        sec = time.monotonic() - t0
        missed = expected - got          # novel docs wrongly rejected
        leaked = got - expected          # dups wrongly admitted
        print(f"wave {wave}: {len(batch)} docs -> admitted {len(got)} "
              f"in {sec:.2f} s ({len(batch) / sec:.0f} docs/s); "
              f"false-rejects {len(missed)}, dup-leaks {len(leaked)}")
        assert not missed, list(missed)[:5]
        assert not leaked, list(leaked)[:5]
        prev_words = words
    ray.shutdown()


if __name__ == "__main__":
    main()
