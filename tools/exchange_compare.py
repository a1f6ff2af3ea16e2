"""A/B/C comparison for the window-family exchange, in ONE Ray session so
machine noise hits all variants equally:

  A. sort-based groupby("__b").map_groups (Ray 2.49 default)
  B. raw-Ray object-store hash exchange (pipelines/exchange.bucket_map_groups)
  C. groupby under a dataset-scoped HASH_SHUFFLE context copy

Uses the window_stress corpus (reuses the /tmp cache). Prints one JSON line.

Usage: python tools/exchange_compare.py [--events 5000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=2)
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

    from tools.window_stress import build_corpus

    sf = f"/tmp/window_stress_{args.events}_{args.users}"
    if not os.path.exists(os.path.join(sf, "events-000.parquet")):
        build_corpus(sf, args.events, args.users)
    os.makedirs(os.path.join(sf, "events.parquet"), exist_ok=True)
    for f in os.listdir(sf):
        if f.startswith("events-"):
            dst = os.path.join(sf, "events.parquet", f)
            if not os.path.exists(dst):
                os.link(os.path.join(sf, f), dst)

    import pandas as pd

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups
    from ocr_agent_ray.pipelines.streaming import _read_events

    NUM_BUCKETS = 64
    GAP_US = 30 * 60 * 1_000_000

    def _key(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(__b=(batch["user_id"] % NUM_BUCKETS).astype("int32"))

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "session_start": pd.Series([], dtype="datetime64[us]"),
                                 "session_end": pd.Series([], dtype="datetime64[us]"),
                                 "n_events": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].astype("int64")
        new = (g["user_id"].ne(g["user_id"].shift())
               | ts_us.sub(ts_us.shift()).gt(GAP_US))
        sid = new.cumsum()
        out = g.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            session_end=("ts", "last"),
            n_events=("ts", "size"),
        )
        return out.reset_index(drop=True)

    def keyed_ds():
        return _read_events(sf, columns=("event_id", "ts", "user_id")) \
            .map_batches(_key, batch_format="pandas", batch_size=65536)

    def variant_sort():
        return keyed_ds().groupby("__b").map_groups(
            _sessions, batch_format="pandas")

    def variant_exchange():
        return bucket_map_groups(keyed_ds(), _sessions,
                                 num_buckets=NUM_BUCKETS)

    def variant_hash():
        from ray.data.context import ShuffleStrategy
        ctx = DataContext.get_current()
        prev = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            # read_datasource copies the context, so the strategy is
            # captured by this dataset only
            ds = keyed_ds().groupby("__b").map_groups(
                _sessions, batch_format="pandas")
        finally:
            ctx.shuffle_strategy = prev
        return ds

    def consume(ds):
        n = 0
        # batch_size=None streams whole blocks; the 256-row default would
        # add ~3 ms per slice and dominate multi-million-row results
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            n += b.num_rows
        return n

    variants = [("sort", variant_sort), ("exchange", variant_exchange),
                ("hash", variant_hash)]
    results: dict[str, list] = {name: [] for name, _ in variants}
    rows_seen = {}
    for rep in range(args.reps):
        for name, fn in variants:
            t0 = time.monotonic()
            rows = consume(fn())
            dt = time.monotonic() - t0
            results[name].append(round(dt, 2))
            rows_seen.setdefault(name, rows)
            assert rows_seen[name] == rows, (name, rows_seen[name], rows)
            print(f"rep{rep} {name}: {dt:.2f}s ({rows} rows)",
                  file=sys.stderr, flush=True)

    assert len(set(rows_seen.values())) == 1, rows_seen
    print(json.dumps({"events": args.events, "users": args.users,
                      "num_cpus": args.num_cpus,
                      "rows": rows_seen["sort"], "sec": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
