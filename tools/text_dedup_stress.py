"""Line-dedup + duplicate-gram-span stress: 50k docs with heavy planted
cross-document duplication.

Corpus: each doc is ~8-14 lines; half its lines are drawn from a shared
pool of ``--pool`` boilerplate lines (so most lines are corpus-wide
duplicates — the C4 worst case), half are unique. A shared 12-token
span is additionally planted into ~10% of docs for the gram-span pass.

Reports wall time and cheap invariants (clean_text conservation, span
detection rate) for both operators at a size where any driver-side
materialization or per-row Python would be obvious.

Usage: python tools/text_dedup_stress.py [--docs 50000] [--pool 2000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "the a and of to in is on for with data table row key value hash sort "
    "merge scan filter group join shuffle batch block spark ray arrow slow "
    "fast small big query plan stage actor pool window stream lineage"
).split()

SHARED_SPAN = ("canonical duplicated span marker alpha beta gamma delta "
               "epsilon zeta eta theta")  # 12 tokens


def build_corpus(out_dir: str, docs: int, pool: int, seed: int = 11) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    shared_pool = [
        " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), 8))
        + f" pool{p}"
        for p in range(pool)
    ]
    rows = []
    for d in range(docs):
        n_lines = int(rng.integers(8, 15))
        lines = []
        for li in range(n_lines):
            if rng.random() < 0.5:
                lines.append(shared_pool[int(rng.integers(0, pool))])
            else:
                lines.append(
                    " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), 9))
                    + f" uniq{d}_{li}")
        if d % 10 == 0:
            lines.insert(int(rng.integers(0, len(lines))), SHARED_SPAN)
        rows.append("\n".join(lines))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    pq.write_table(
        pa.table({"doc_id": list(range(docs)), "text": rows}),
        os.path.join(out_dir, "documents.parquet"),
    )


def main() -> None:
    docs = int(sys.argv[sys.argv.index("--docs") + 1]) \
        if "--docs" in sys.argv else 50_000
    pool = int(sys.argv[sys.argv.index("--pool") + 1]) \
        if "--pool" in sys.argv else 2_000

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.serialization import register_for_ray_workers

    register_for_ray_workers()

    from ocr_agent_ray.pipelines.dedup import duplicate_gram_spans
    from ocr_agent_ray.pipelines.text import line_dedup
    from ocr_agent_ray.sources.readers import read_table

    out_dir = f"/tmp/graft_text_stress/{docs}_{pool}"
    build_corpus(out_dir, docs, pool)

    t0 = time.monotonic()
    ld = line_dedup(out_dir)
    n_docs_out = 0
    kept = total = 0
    for b in ld.iter_batches(batch_format="pandas", batch_size=8192):
        n_docs_out += len(b)
        kept += int(b["n_kept_lines"].sum())
        total += int(b["n_lines"].sum())
    line_wall = time.monotonic() - t0

    t0 = time.monotonic()
    gs = duplicate_gram_spans(
        read_table(out_dir, "documents", ["doc_id", "text"]), n=8)
    with_spans = 0
    any_dup = 0
    gs_docs = 0
    for b in gs.iter_batches(batch_format="pandas", batch_size=8192):
        gs_docs += len(b)
        # the planted 12-token span = a run of 12-8+1 = 5 dup 8-grams;
        # duplicated pool LINES only yield runs of ~2, so >=5 isolates it
        with_spans += int((b["max_dup_run"] >= 5).sum())
        any_dup += int((b["n_dup_grams"] > 0).sum())
    gram_wall = time.monotonic() - t0

    print(json.dumps({
        "docs": docs,
        "pool_lines": pool,
        "line_dedup_wall_sec": round(line_wall, 2),
        "line_dedup_docs_per_sec": round(docs / line_wall, 1),
        "docs_out": n_docs_out,
        "lines_total": total,
        "lines_kept": kept,
        "dup_line_fraction": round(1 - kept / total, 4),
        "gram_spans_wall_sec": round(gram_wall, 2),
        "gram_spans_docs_per_sec": round(docs / gram_wall, 1),
        "docs_with_planted_span_run": with_spans,
        "expected_span_docs": docs // 10,
        "docs_with_any_dup_gram": any_dup,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
