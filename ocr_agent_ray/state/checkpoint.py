"""Partitioned checkpoint store: atomic commits, lineage, exact resume.

The reference's checkpoint is its SQLite task table — statuses survive a
restart and completed work is skipped (/root/reference/src/ocr_agent/
queue_store.py:50-62, 125-138) — but a crash mid-task strands rows in
'running' forever (pop selects only 'pending'). This store fixes that with
write-then-commit per partition:

    out_dir/
      data/part-{pid}.parquet        # written to *.tmp then os.replace
      manifest/part-{pid}.json       # existence == committed (atomic rename)
      metrics/part-{pid}.json        # per-stage lineage + metrics rows

A partition either has a committed manifest entry (data file is complete)
or it doesn't (any partial tmp data is ignored and rewritten). Resume =
anti-join of work against ``committed_ids()`` — broadcast as a small set
into a ``map_batches`` filter, never a shuffle (SURVEY.md §2.4).

Concurrent-writer safety: partition outputs are pure functions of input
content, so two racing runs write byte-identical files and the atomic
``os.replace`` makes the race harmless (last writer rewrites the same
bytes) — no distributed lock needed, matching the reference's
exactly-once-by-marker design rather than its O_EXCL claim lock.

Commit markers are one file per partition, so concurrent writers never
contend on a shared manifest file; the committed set is the directory
listing. Metrics follow FIXTURES.md F3; ``groupby('status').count()`` over
them reproduces the reference's status-count query (queue_store.py:191-196).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

from ocr_agent_ray.schema import PARTITION_MANIFEST_SCHEMA, STAGE_METRICS_SCHEMA


class CheckpointStore:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.metrics_dir = os.path.join(out_dir, "metrics")

    def initialize(self, run_meta: dict | None = None) -> "CheckpointStore":
        """Create the store layout; optionally pin the run configuration.

        ``run_meta`` (num_partitions, engine id, math style, ...) is
        persisted to meta.json on first initialize. A later initialize
        with a DIFFERENT run_meta refuses to resume: committed_ids()
        reflects the old partitioning scheme, so resuming with e.g. a
        different --num-partitions would skip wrong partitions and
        silently drop documents.
        """
        for d in (self.data_dir, self.manifest_dir, self.metrics_dir):
            os.makedirs(d, exist_ok=True)
        if run_meta is not None:
            mpath = os.path.join(self.out_dir, "meta.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    existing = json.load(f)
                if existing != run_meta:
                    diff = {
                        k: {"checkpoint": existing.get(k), "run": run_meta.get(k)}
                        for k in sorted(set(existing) | set(run_meta))
                        if existing.get(k) != run_meta.get(k)
                    }
                    raise ValueError(
                        f"checkpoint at {self.out_dir} was created with a "
                        f"different run configuration ({diff}); resume with "
                        "the original settings, reset the partitions, or use "
                        "a fresh out_dir"
                    )
            else:
                _atomic_write_json(mpath, run_meta)
        return self

    # --- commit path (called from inside write tasks) ---------------------

    def data_path(self, partition_id: int) -> str:
        return os.path.join(self.data_dir, f"part-{partition_id:05d}.parquet")

    def write_partition(
        self,
        partition_id: int,
        table: pa.Table,
        metrics_rows: list[dict],
    ) -> str:
        """Atomically write one partition's output and commit it.

        Order matters: data first (tmp+rename), then metrics, then the
        manifest marker LAST — a marker implies everything else is durable.
        """
        import pyarrow.parquet as pq

        final = self.data_path(partition_id)
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)

        mpath = os.path.join(self.metrics_dir, f"part-{partition_id:05d}.json")
        _atomic_write_json(mpath, metrics_rows)

        num_spans = sum(len(s) for s in table["spans"].to_pylist()) if "spans" in table.column_names else len(table)
        entry = {
            "partition_id": partition_id,
            "committed_at_unix_ms": int(time.time() * 1000),
            "num_docs": len(table),
            "num_spans": int(num_spans),
            "output_fragment": final,
        }
        _atomic_write_json(
            os.path.join(self.manifest_dir, f"part-{partition_id:05d}.json"), entry
        )
        return final

    def reset_partition(self, partition_id: int) -> bool:
        """Un-commit one partition so the next run reprocesses it — the
        analog of the reference's queue `reset` for stale failed rows
        (README.md:75-79). Removes the manifest marker FIRST (the commit
        point), then best-effort cleans data/metrics; returns whether the
        partition had been committed."""
        marker = os.path.join(self.manifest_dir, f"part-{partition_id:05d}.json")
        existed = os.path.exists(marker)
        if existed:
            os.remove(marker)
        for p in (
            self.data_path(partition_id),
            os.path.join(self.metrics_dir, f"part-{partition_id:05d}.json"),
        ):
            try:
                os.remove(p)
            except OSError:
                pass
        return existed

    # --- read / resume path ----------------------------------------------

    def committed_ids(self) -> set[int]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("part-") and name.endswith(".json"):
                out.add(int(name[5:-5]))
        return out

    def load_manifest(self) -> pa.Table:
        rows = []
        if os.path.isdir(self.manifest_dir):
            for name in sorted(os.listdir(self.manifest_dir)):
                if name.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        rows.append(json.load(f))
        return pa.Table.from_pylist(rows, schema=PARTITION_MANIFEST_SCHEMA)

    def load_metrics(self) -> pa.Table:
        rows: list[dict] = []
        if os.path.isdir(self.metrics_dir):
            for name in sorted(os.listdir(self.metrics_dir)):
                if name.endswith(".json"):
                    with open(os.path.join(self.metrics_dir, name)) as f:
                        rows.extend(json.load(f))
        return pa.Table.from_pylist(rows, schema=STAGE_METRICS_SCHEMA)

    def read_output(self):
        """Committed output as a Ray Dataset (only committed fragments)."""
        import ray.data as rd

        files = [self.data_path(pid) for pid in sorted(self.committed_ids())]
        if not files:
            raise FileNotFoundError(f"no committed partitions under {self.out_dir}")
        return rd.read_parquet(files)


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class MetricsSpool:
    """Per-stage lineage/metrics writer usable from inside map stages.

    Bounded-file-count design: each spool instance owns a rotating json
    file under ``<out_dir>/metrics`` that is atomically REWRITTEN with the
    accumulated buffer on every append and sealed (rotated to a new
    sequence number) at ``rows_per_file`` rows. So:

    - totals are exact after every batch (nothing is held back waiting
      for a flush — actor teardown runs no finalizer in Ray, measured),
    - file count is ~total_rows/rows_per_file per actor, not one per
      batch (millions of tiny files at real scale),
    - a crash loses nothing (the last atomic rewrite holds every row up
      to the last completed batch).

    The instance id is assigned lazily in the worker (task-pool stages
    deserialize the UDF per task; a driver-assigned id would collide).
    ``CheckpointStore.load_metrics`` merges spool files with the
    per-partition commit metrics.
    """

    def __init__(self, out_dir: str, rows_per_file: int = 512) -> None:
        self.dir = os.path.join(out_dir, "metrics")
        self.rows_per_file = rows_per_file
        self._buf: list[dict] = []
        self._seq = 0
        self._uid: str | None = None

    def append(self, stage: str, rows: list[dict]) -> None:
        if not rows:
            return
        if self._uid is None:
            import uuid

            os.makedirs(self.dir, exist_ok=True)
            self._uid = f"{os.getpid()}-{uuid.uuid4().hex[:12]}"
        self._buf.extend(rows)
        name = f"spool-{self._uid}-{self._seq:05d}.json"
        _atomic_write_json(os.path.join(self.dir, name), self._buf)
        if len(self._buf) >= self.rows_per_file:
            self._seq += 1
            self._buf = []

    def rows_for(self, stage: str, batch_partition_ids, wall_ms: int,
                 rows_out: int | None = None,
                 error_message: str | None = None) -> list[dict]:
        """Build one metrics row per partition present in a batch."""
        import collections

        counts = collections.Counter(int(p) for p in batch_partition_ids)
        n = sum(counts.values()) or 1
        return [
            {
                "partition_id": pid,
                "stage": stage,
                "status": "failed" if error_message else "completed",
                "rows_in": c,
                "rows_out": c if rows_out is None else int(rows_out * c / n),
                "wall_ms": int(wall_ms * c / n),
                "error_message": error_message,
            }
            for pid, c in sorted(counts.items())
        ]


def compute_eta_seconds(metrics: pa.Table, total_partitions: int) -> float | None:
    """ETA: mean committed-partition wall time × remaining partitions.

    Parity with the reference's estimator `elapsed/completed × remaining`
    (/root/reference/gui/src-tauri/src/main.rs:800-828), with its 0-guards.
    """
    if total_partitions <= 0 or metrics.num_rows == 0:
        return None
    rows = [
        r for r in metrics.to_pylist()
        if r["stage"] == "assemble" and r["status"] == "completed"
    ]
    if not rows:
        return None
    done = len({r["partition_id"] for r in rows})
    remaining = total_partitions - done
    if remaining <= 0:
        return 0.0
    mean_ms = sum(r["wall_ms"] for r in rows) / len(rows)
    return mean_ms * remaining / 1000.0
