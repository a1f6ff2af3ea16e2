"""Interval-join stress: views_before_purchase at high event/user
cardinality. Two phases:

1. exactness — 300k events / 10k users, result compared cell-for-cell
   against the DuckDB range-join oracle (the same SQL shape as the
   q_views_before_purchase oracle);
2. throughput — 5M events / 200k users (reuses the window_stress corpus
   layout), end-to-end wall time through one user-bucket exchange.

Prints one JSON line. Usage:
    python tools/interval_stress.py [--events 5000000] [--users 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.window_stress import build_corpus  # noqa: E402


def _link_events_dir(sf: str) -> None:
    os.makedirs(os.path.join(sf, "events.parquet"), exist_ok=True)
    for f in os.listdir(sf):
        if f.startswith("events-"):
            dst = os.path.join(sf, "events.parquet", f)
            if not os.path.exists(dst):
                os.link(os.path.join(sf, f), dst)


def _consume(res) -> int:
    n = 0
    for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
        n += b.num_rows
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--window-minutes", type=int, default=360)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.pipelines.streaming import views_before_purchase

    out: dict = {"metric": "interval_join_stress", "unit": "sec",
                 "num_cpus": args.num_cpus,
                 "window_minutes": args.window_minutes}

    # --- phase 1: exactness at 300k/10k vs the DuckDB range join ------
    small = "/tmp/interval_stress_300000_10000"
    if not os.path.exists(os.path.join(small, "events-000.parquet")):
        build_corpus(small, 300_000, 10_000)
    _link_events_dir(small)

    got = views_before_purchase(
        small, window_minutes=args.window_minutes).to_pandas()

    import duckdb

    con = duckdb.connect()
    want = con.execute(f"""
        WITH e AS (SELECT * FROM read_parquet('{small}/events-*.parquet'))
        SELECT p.event_id AS event_id, p.user_id AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_views,
               CAST(date_diff('microsecond', MAX(v.ts), p.ts) AS BIGINT)
                 AS last_gap_us
        FROM e p JOIN e v ON v.user_id = p.user_id
          AND v.event_type = 'view' AND v.ts < p.ts
          AND v.ts >= p.ts - INTERVAL {args.window_minutes} MINUTE
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id, p.ts""").df()

    import pandas as pd

    key = ["event_id", "user_id", "n_views", "last_gap_us"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    out["exact_rows"] = int(len(g))

    # --- phase 2: throughput at full size ------------------------------
    sf = f"/tmp/window_stress_{args.events}_{args.users}"
    if not os.path.exists(os.path.join(sf, "events-000.parquet")):
        build_corpus(sf, args.events, args.users)
    _link_events_dir(sf)

    # warm object store/actors with one pass, then time
    for tag in ("warm", "timed"):
        t0 = time.monotonic()
        n = _consume(views_before_purchase(
            sf, window_minutes=args.window_minutes))
        out[f"{tag}_sec"] = round(time.monotonic() - t0, 2)
        out[f"{tag}_rows"] = n
    out["events_per_sec"] = round(args.events / out["timed_sec"])

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
