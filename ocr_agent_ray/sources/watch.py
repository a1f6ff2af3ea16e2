"""Incremental ingestion — the watch-folder protocol as data (SURVEY §2.9).

The reference polls an inbox and processes each ready bundle exactly once,
marking it ``.processed`` (/root/reference/gui/src-tauri/src/watch_folder.rs:
162-219, atomic O_CREAT|O_EXCL claim). Here the "bundle" is an input
parquet shard and the marker is a per-shard committed checkpoint:

    poll_and_ingest(corpus_dir, out_dir)
      -> lists shards in sorted-name order (watch_folder.rs:198 ordering),
         anti-joins against the committed-shard manifest, and runs the
         extraction pipeline over ONLY the new shards, committing each
         shard's output under out_dir/shards/<shard>/ atomically.

Exactly-once comes from the commit marker, not a lock: a crashed ingest
leaves no marker, so the shard is simply reprocessed (idempotent —
outputs are a pure function of shard content). Failed shards are parked
with a .failed marker and skipped until it is removed, mirroring
watch_folder.rs:189-195 (no automatic retry).

Producer contract (the `.ready` watermark analog): shards must be written
tmp+rename so a listed ``*.parquet`` file is always complete — the corpus
writers in sources/corpus.py follow this.
"""

from __future__ import annotations

import json
import os
import traceback


def _shard_name(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def list_ready_shards(corpus_dir: str, out_dir: str) -> list[str]:
    """Sorted shard paths that are neither committed nor parked failed."""
    done_dir = os.path.join(out_dir, "shards")
    committed = set()
    failed = set()
    if os.path.isdir(done_dir):
        for name in os.listdir(done_dir):
            if name.endswith(".done"):
                committed.add(name[:-5])
            elif name.endswith(".failed"):
                failed.add(name[:-7])
    out = []
    for name in sorted(os.listdir(corpus_dir)):
        if not name.endswith(".parquet"):
            continue
        stem = _shard_name(name)
        if stem in committed or stem in failed:
            continue
        out.append(os.path.join(corpus_dir, name))
    return out


def ingest_shard(shard_path: str, out_dir: str, *, engine_factory=None,
                 settings=None) -> dict:
    """Process one shard through the extraction pipeline, atomic commit."""
    from ocr_agent_ray.pipelines.extract import run_extract_checkpointed
    from ocr_agent_ray.sources.corpus import read_documents
    from ocr_agent_ray.stages.ocr import MockOcrEngine

    stem = _shard_name(shard_path)
    shard_out = os.path.join(out_dir, "shards", stem)
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    marker = os.path.join(out_dir, "shards", f"{stem}.done")
    failed_marker = os.path.join(out_dir, "shards", f"{stem}.failed")
    try:
        summary = run_extract_checkpointed(
            read_documents(shard_path),
            shard_out,
            engine_factory=engine_factory or MockOcrEngine,
            settings=settings,
        )
    except Exception:
        with open(failed_marker, "w") as f:  # park, never auto-retry
            f.write(traceback.format_exc())
        raise
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"shard": stem, **summary}, f)
    os.replace(tmp, marker)
    return summary


def poll_and_ingest(corpus_dir: str, out_dir: str, *, engine_factory=None,
                    settings=None, max_shards: int | None = None) -> dict:
    """One poll cycle: ingest every new shard (or up to max_shards).

    The reference processes one bundle per poll (main.rs:1300-1311) because
    a desktop GPU runs one job at a time; here the executor owns
    concurrency, so a poll drains the backlog unless capped.
    """
    ready = list_ready_shards(corpus_dir, out_dir)
    if max_shards is not None:
        ready = ready[:max_shards]
    done = []
    for shard in ready:
        ingest_shard(shard, out_dir, engine_factory=engine_factory,
                     settings=settings)
        done.append(_shard_name(shard))
    return {"ingested": done, "remaining": len(list_ready_shards(corpus_dir, out_dir))}


def read_ingested_output(out_dir: str):
    """All committed shard outputs as one Dataset."""
    import ray.data as rd

    shards_dir = os.path.join(out_dir, "shards")
    files = []
    for name in sorted(os.listdir(shards_dir)):
        if name.endswith(".done"):
            data = os.path.join(shards_dir, name[:-5], "data")
            files.extend(
                os.path.join(data, f)
                for f in sorted(os.listdir(data))
                if f.endswith(".parquet")
            )
    if not files:
        raise FileNotFoundError(f"no committed shards under {out_dir}")
    return rd.read_parquet(files)
