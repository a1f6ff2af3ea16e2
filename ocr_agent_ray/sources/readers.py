"""Column-pruned, parallelism-aware parquet readers.

A single parquet file reads as ONE block by default, which serializes every
downstream map stage. ``read_table`` overrides the block count to the
cluster CPU count so the pipeline is parallel from the first operator —
the single-node stand-in for "one block per input fragment" on a real
multi-node read.
"""

from __future__ import annotations


def _default_blocks() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               num_blocks: int | None = None):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/{name}.parquet",
        columns=columns,
        override_num_blocks=num_blocks or _default_blocks(),
    )
