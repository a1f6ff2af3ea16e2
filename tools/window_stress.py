"""Window-family stress: the bucketed whole-bucket kernels at high user
cardinality (5M events, 200k users, 32 CPUs) — the profile where the old
per-user map_groups shape paid ~10 ms of pandas per-group setup per user
(would be ~2,000 s of pure overhead at 200k users).

Generates a deterministic event table in /tmp, then times sessionize,
event_window_ranks, event_transitions, rolling_avg_value and
trailing_week_active_users end-to-end. Prints one JSON line.

Usage: python tools/window_stress.py [--events 5000000] [--users 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(path: str, n_events: int, n_users: int) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(42)
    shard = 1_000_000
    types = np.array(["view", "click", "purchase", "error", "signup"])
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    for s, lo in enumerate(range(0, n_events, shard)):
        n = min(shard, n_events - lo)
        ids = np.arange(lo, lo + n, dtype=np.int64)
        ts_us = base + rng.integers(0, 30 * 86400 * 1_000_000, size=n)
        df = pd.DataFrame({
            "event_id": ids,
            "ts": pd.to_datetime(ts_us, unit="us").astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, size=n),
            "event_type": types[rng.integers(0, len(types), size=n)],
            "value": np.round(rng.uniform(0, 500, size=n), 2),
            "props": "{}",
        })
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(path, f"events-{s:03d}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_agent_ray.serialization import register_for_ray_workers

    register_for_ray_workers()

    sf = f"/tmp/window_stress_{args.events}_{args.users}"
    if not os.path.exists(os.path.join(sf, "events-000.parquet")):
        t0 = time.monotonic()
        build_corpus(sf, args.events, args.users)
        print(f"corpus built in {time.monotonic() - t0:.1f}s",
              file=sys.stderr)

    # events.parquet glob: read_table reads {sf}/events.parquet; the
    # stress corpus is sharded, so point pipelines at the directory via a
    # symlink-compatible layout (readers accept a directory path too).
    os.makedirs(os.path.join(sf, "events.parquet"), exist_ok=True)
    for f in os.listdir(sf):
        if f.startswith("events-"):
            dst = os.path.join(sf, "events.parquet", f)
            if not os.path.exists(dst):
                os.link(os.path.join(sf, f), dst)

    from ocr_agent_ray.pipelines.streaming import (
        event_transitions,
        event_window_ranks,
        rolling_avg_value,
        sessionize,
        trailing_week_active_users,
    )

    def consume(res):
        # batch_size matters: the iter_batches DEFAULT (256 rows) slices a
        # 5M-row result into ~20k tiny pyarrow batches and the per-batch
        # overhead (~3 ms) then dwarfs the pipeline itself (measured: ranks
        # 9 s pipeline, 66+ s "consumed" at the default). Stream whole
        # blocks so the number reported is pipeline wall time.
        if hasattr(res, "iter_batches"):
            n = 0
            for b in res.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
                n += b.num_rows
            return n
        return len(res)

    results = {}
    for name, fn in [
        ("sessionize", sessionize),
        ("event_window_ranks", event_window_ranks),
        ("event_transitions", event_transitions),
        ("rolling_avg_value", rolling_avg_value),
        ("trailing_week_active", trailing_week_active_users),
    ]:
        t0 = time.monotonic()
        rows = consume(fn(sf))
        dt = time.monotonic() - t0
        results[name] = {"sec": round(dt, 2), "rows": rows,
                         "events_per_sec": round(args.events / dt)}
        print(f"{name}: {dt:.2f}s ({rows} rows)", file=sys.stderr)

    print(json.dumps({"events": args.events, "users": args.users,
                      "num_cpus": args.num_cpus, "results": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
