"""Per-operator profile of the flagship pipeline (ds.stats() breakdown).

Usage: python tools/profile_flagship.py [num_docs] [num_cpus] [work_ms]

Prints TOTAL wall time plus each operator's span — the feedback loop for
tuning batch sizes / balance_blocks / pool width per round.
"""

from __future__ import annotations

import functools
import re
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    work_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from ocr_agent_ray.config import PipelineSettings
    from ocr_agent_ray.pipelines.extract import build_extract_pipeline
    from ocr_agent_ray.sources.corpus import (
        read_documents,
        write_corpus_parquet_ray,
    )
    from ocr_agent_ray.stages.ocr import MockOcrEngine

    corpus = f"/tmp/graft_profile/corpus_{num_docs}"
    import os

    if not os.path.exists(corpus):
        write_corpus_parquet_ray(corpus, num_docs, rows_per_file=2000)

    settings = PipelineSettings(
        ocr_concurrency=max(2, num_cpus - 2),
        ocr_min_actors=max(2, num_cpus - 2),
        ocr_batch_size=128,
        fanout_batch_size=256,
        num_partitions=4 * num_cpus,
        balance_blocks=4 * num_cpus,
    )
    t0 = time.monotonic()
    ds = build_extract_pipeline(
        read_documents(corpus, num_blocks=2 * num_cpus),
        engine_factory=functools.partial(MockOcrEngine, work_ms=work_ms),
        settings=settings,
    )
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        n += len(b)
    total = time.monotonic() - t0
    print(f"TOTAL {total:.2f}s  docs={n}  docs/s={n / total:.1f}")
    for line in ds.stats().splitlines():
        m = re.match(r"Operator (\d+) (\S+).* in ([\d.]+)s", line)
        if m:
            print(f"  op{m.group(1)} {m.group(2)[:60]:60s} {m.group(3)}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
