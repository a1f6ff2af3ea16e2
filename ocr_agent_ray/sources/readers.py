"""Column-pruned, parallelism-aware readers (parquet + Lance).

A single parquet file reads as ONE block by default, which serializes every
downstream map stage. ``read_table`` overrides the block count to the
cluster CPU count so the pipeline is parallel from the first operator —
the single-node stand-in for "one block per input fragment" on a real
multi-node read.

Lance (BASELINE.json input_hint names Lance tables of interleaved docs):
``ray.data.read_lance`` is used whenever the path is a Lance dataset and
the ``lance`` package is importable. This container ships no lance wheel,
so the path is availability-gated (tests skip without it) — on a real
deployment the same call sites read Lance with zero code changes.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_dataset(path: str) -> bool:
    """A Lance dataset is a directory holding a ``_versions`` manifest dir
    (conventionally named ``*.lance``)."""
    return os.path.isdir(path) and (
        path.rstrip("/").endswith(".lance")
        or os.path.isdir(os.path.join(path, "_versions"))
    )


def _default_blocks() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def read_lance_table(path: str, columns: list[str] | None = None,
                     num_blocks: int | None = None):
    """Lance dataset → Ray Dataset (column-projected at the scan)."""
    if not lance_available():
        raise ImportError(
            f"{path} is a Lance dataset but the 'lance' package is not "
            "installed; pip install pylance (or read the parquet mirror)"
        )
    import ray.data as rd

    kwargs = {"columns": columns} if columns else {}
    try:
        return rd.read_lance(
            path, override_num_blocks=num_blocks or _default_blocks(), **kwargs
        )
    except TypeError:
        # older read_lance signatures lack override_num_blocks
        return rd.read_lance(path, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               num_blocks: int | None = None):
    """Read ``{sf_dir}/{name}`` preferring a Lance dataset dir
    (``{name}.lance``) when present and readable, else parquet."""
    import ray.data as rd

    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if is_lance_dataset(lance_path) and lance_available():
        return read_lance_table(lance_path, columns=columns,
                                num_blocks=num_blocks)
    return rd.read_parquet(
        f"{sf_dir}/{name}.parquet",
        columns=columns,
        override_num_blocks=num_blocks or _default_blocks(),
    )
