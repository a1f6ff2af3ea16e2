"""Stress datapoints for the round-4 curation extras (BASELINE.md).

- Pareto skyline over N random 2-D points (default 10M): the local-prune
  property is what makes it scale — reports survivor counts per stage.
- boilerplate_strip over a planted multi-line corpus (default 200k docs
  × 20 lines, 10% boilerplate lines per source): exercises the
  hash-only wire + reassembly at line volume, verifies planted lines
  were stripped and uniques survived.

Usage: python tools/curation_extras_stress.py [n_points] [n_docs]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def main() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.pipelines.relational import pareto_skyline
    from ocr_agent_ray.pipelines.text import boilerplate_strip

    # ---- skyline ----
    root = "/tmp/curation_stress"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(17)
    # continuous domain: expected skyline size ~ H(n) (log n) — the
    # local prune does nearly all the work
    df = pd.DataFrame({
        "p_partkey": np.arange(n_points, dtype=np.int64),
        "p_retailprice": rng.random(n_points),
        "p_size": rng.integers(0, 1 << 30, n_points),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{root}/part.parquet", row_group_size=1 << 20)
    t0 = time.monotonic()
    sky = pareto_skyline(root).to_pandas()
    sky_sec = time.monotonic() - t0
    # brute-check a sample of survivors against the full frame
    pts = df[["p_retailprice", "p_size"]].to_numpy()
    for pk in sky["p_partkey"].head(5):
        p, s = pts[pk]
        dom = ((pts[:, 0] <= p) & (pts[:, 1] >= s)
               & ((pts[:, 0] < p) | (pts[:, 1] > s))).any()
        assert not dom, pk
    print(f"skyline: {n_points} pts -> {len(sky)} frontier in "
          f"{sky_sec:.2f} s ({n_points / sky_sec / 1e6:.1f}M pts/s)")

    # ---- boilerplate ----
    n_sources = 50
    lines_per_doc = 20
    boiler_pool = [f"BOILER-{s}-{i}" for s in range(n_sources)
                   for i in range(10)]
    rows = []
    for d in range(n_docs):
        s = d % n_sources
        # rotate through the source's 10-line pool across its docs
        # (d // n_sources enumerates the docs WITHIN a source; d % 10
        # would be constant per source since d ≡ s mod n_sources)
        r = d // n_sources
        body = [f"uniq-{d}-{j}" for j in range(lines_per_doc - 2)]
        body.insert(3, boiler_pool[s * 10 + r % 10])
        body.insert(9, boiler_pool[s * 10 + (r + 3) % 10])
        rows.append((d, f"src{s}", "\n".join(body)))
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs["doc_id"] = docs["doc_id"].astype(np.int64)
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{root}/documents.parquet", row_group_size=1 << 14)
    t0 = time.monotonic()
    out = boilerplate_strip(root, min_docs=2)
    stats = out.map_batches(
        lambda b: pd.DataFrame({
            "docs": [len(b)],
            "boiler": [int(b["n_boiler_lines"].sum())],
            "lines": [int(b["n_lines"].sum())]}),
        batch_format="pandas").to_pandas().sum()
    bp_sec = time.monotonic() - t0
    n_lines = n_docs * lines_per_doc
    assert stats["docs"] == n_docs
    assert stats["boiler"] == n_docs * 2, stats  # exactly the planted 2
    print(f"boilerplate: {n_docs} docs / {n_lines} lines -> "
          f"{stats['boiler']} stripped in {bp_sec:.2f} s "
          f"({n_lines / bp_sec / 1e3:.0f}k lines/s)")
    ray.shutdown()


if __name__ == "__main__":
    main()
