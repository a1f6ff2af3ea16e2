"""Persisted inverted-index stress: the pruned-read claim at size.

Corpus: ``--docs`` documents of ~60-120 tokens over a 50k-word Zipfian
vocabulary (realistic df skew), written as a sharded documents table.
Measures:

- index BUILD wall time (one shuffle-free pass, word-bucketed layout);
- WARM search latency over the index (pruned read of the query terms'
  buckets only) vs the corpus-rescan keyword_search shape on the same
  queries — the gap is the point of persisting the index: the rescan
  re-tokenizes every document per query wave, the index touches
  |term-buckets|/num_buckets of the postings;
- result equality between the two plans (same scoring expression);
- bytes read: postings files touched vs total layout size.

Usage: python tools/invindex_stress.py [--docs 200000] [--buckets 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(out_dir: str, docs: int, seed: int = 7) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:05d}" for i in range(50_000)], dtype=object)
    # Zipfian draw: realistic head/tail df skew
    ranks = np.arange(1, len(vocab) + 1)
    p = 1.0 / ranks
    p /= p.sum()
    # query terms are planted inline below with known selectivity
    # (alphaterm: 1/20 docs, betaterm: 1/30, raresharedterm: 1/600)
    os.makedirs(out_dir, exist_ok=True)
    writer = None
    per_chunk = 20_000
    doc_id = 0
    path = os.path.join(out_dir, "documents.parquet")
    while doc_id < docs:
        n = min(per_chunk, docs - doc_id)
        lens = rng.integers(60, 121, size=n)
        rows = []
        for i in range(n):
            words = vocab[rng.choice(len(vocab), size=lens[i], p=p)]
            d = doc_id + i
            extra = []
            if d % 20 == 0:
                extra.append("alphaterm")
            if d % 30 == 0:
                extra.append("betaterm")
            if d % 600 == 0:
                extra.append("raresharedterm")
            rows.append({"doc_id": d, "text": " ".join(
                list(words) + extra)})
        tbl = pa.Table.from_pandas(pd.DataFrame(rows),
                                   preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
        doc_id += n
    if writer is not None:
        writer.close()


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.pipelines import invindex
    from ocr_agent_ray.pipelines import text as T

    base = "/tmp/graft_invindex_stress"
    corpus = os.path.join(base, "corpus")
    idx = os.path.join(base, "idx")
    shutil.rmtree(base, ignore_errors=True)

    t0 = time.time()
    build_corpus(corpus, args.docs)
    t_corpus = time.time() - t0

    t0 = time.time()
    meta = invindex.build_inverted_index(corpus, idx,
                                         num_buckets=args.buckets)
    t_build = time.time() - t0

    queries = {0: ("alphaterm", "betaterm"), 1: ("raresharedterm",)}

    # warm both paths once, then time
    def run_index():
        return invindex.search_index(idx, queries).to_pandas()

    def run_scan():
        T._SEARCH_QUERIES, saved = queries, T._SEARCH_QUERIES
        try:
            return T.keyword_search(corpus).to_pandas()
        finally:
            T._SEARCH_QUERIES = saved

    r_idx = run_index()
    t0 = time.time()
    r_idx = run_index()
    t_index = time.time() - t0

    r_scan = run_scan()
    t0 = time.time()
    r_scan = run_scan()
    t_scan = time.time() - t0

    import pandas as pd

    key = ["query_id", "doc_id", "score"]
    a = r_idx.sort_values(key).reset_index(drop=True)[key]
    b = r_scan.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    needed = sorted(set(invindex._bucket_of(
        [t for q in queries.values() for t in q],
        args.buckets).values()))
    touched = sum(_dir_bytes(os.path.join(idx, f"bucket={b}"))
                  for b in needed)
    total = _dir_bytes(idx)

    print(json.dumps({
        "docs": args.docs,
        "postings": meta["postings"],
        "buckets": args.buckets,
        "corpus_gen_s": round(t_corpus, 2),
        "build_s": round(t_build, 2),
        "search_index_s": round(t_index, 2),
        "search_rescan_s": round(t_scan, 2),
        "speedup": round(t_scan / max(t_index, 1e-9), 1),
        "buckets_touched": len(needed),
        "bytes_touched": touched,
        "bytes_total": total,
        "read_fraction": round(touched / total, 4),
        "results_equal": True,
        "result_rows": len(a),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
