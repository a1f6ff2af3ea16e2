"""Near-dup dedup stress: 50k docs with planted duplicate families.

Generates a deterministic corpus of ``--families`` base documents × 5
variants each (one exact copy + three word-level mutations per family),
then runs the full distributed MinHash-LSH pipeline (banding →
signature-estimate prefilter → distinct → exact-Jaccard verification via
two bucket_hash_joins) and reports wall time, candidate/pair counts and
per-family recall. ``--no-prefilter`` reruns without the signature
estimate so the prefilter's effect is measured, not asserted.

Usage: python tools/dedup_stress.py [--docs-per-family 5]
       [--families 10000] [--no-prefilter]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "the a and of to in is on for with data table row key value hash sort "
    "merge scan filter group join shuffle batch block spark ray arrow slow "
    "fast small big query plan stage actor pool window stream lineage"
).split()


def build_corpus(families: int, variants: int, seed: int = 7):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows_id, rows_text = [], []
    did = 0
    for f in range(families):
        n = int(rng.integers(40, 120))
        base = [WORDS[i] for i in rng.integers(0, len(WORDS), n)]
        for v in range(variants):
            toks = list(base)
            if v >= 2:  # three mutated variants: swap ~3% of words
                for _ in range(max(1, n // 32)):
                    toks[int(rng.integers(0, n))] = WORDS[int(rng.integers(0, len(WORDS)))]
            rows_id.append(did)
            rows_text.append(" ".join(toks))
            did += 1
    return pd.DataFrame({"doc_id": rows_id, "text": rows_text})


def main() -> None:
    families = int(sys.argv[sys.argv.index("--families") + 1]) \
        if "--families" in sys.argv else 10_000
    variants = int(sys.argv[sys.argv.index("--docs-per-family") + 1]) \
        if "--docs-per-family" in sys.argv else 5
    margin = None if "--no-prefilter" in sys.argv else 0.25

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from ocr_agent_ray.serialization import register_for_ray_workers

    register_for_ray_workers()

    from ocr_agent_ray.pipelines.dedup import minhash_lsh_dedup

    corpus = build_corpus(families, variants)
    n_docs = len(corpus)
    ds = rd.from_pandas(corpus).repartition(64).materialize()

    t0 = time.monotonic()
    pairs = minhash_lsh_dedup(ds, threshold=0.7, est_margin=margin)
    pdf = pairs.to_pandas()
    wall = time.monotonic() - t0

    # recall: variants of one family live in a contiguous id block
    fam = lambda d: d // variants  # noqa: E731
    within = (pdf["doc_id_a"] // variants == pdf["doc_id_b"] // variants)
    # how many families have at least one recovered pair
    found_fams = pdf.loc[within, "doc_id_a"].floordiv(variants).nunique()

    print(json.dumps({
        "docs": n_docs,
        "families": families,
        "prefilter": margin is not None,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "pairs_found": int(len(pdf)),
        "cross_family_pairs": int((~within).sum()),
        "families_with_pairs": int(found_fams),
        "family_recall": round(found_fams / families, 4),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
