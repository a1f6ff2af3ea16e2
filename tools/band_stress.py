"""Band-join stress: the range-bucketed exchange at web-scale row
counts — verifies exact parity vs DuckDB at 200k rows, then times the
5M-row / ~1.3M-pair shape (delta sized so output stays bounded; the
operator's cost model is rows·log(bucket) + output, independent of the
n² naive pair space).

Usage: python tools/band_stress.py [--verify-rows 200000] [--rows 5000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(path: str, n: int, seed: int = 42) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n), 2),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(path, "orders.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-rows", type=int, default=200_000)
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--delta", type=float, default=0.05)
    args = ap.parse_args()

    import ray

    from ocr_agent_ray.serialization import register_for_ray_workers

    register_for_ray_workers()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_agent_ray.pipelines.relational import price_band_join

    out: dict = {"tool": "band_stress", "delta": args.delta}

    # 1) exact parity vs DuckDB at the verify scale
    vdir = "/tmp/band_stress_verify"
    build(vdir, args.verify_rows)
    t0 = time.perf_counter()
    got = price_band_join(vdir, delta=args.delta).to_pandas()
    out["verify_rows"] = args.verify_rows
    out["verify_sec"] = round(time.perf_counter() - t0, 2)
    out["verify_pairs"] = len(got)

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{vdir}/orders.parquet')")
    want = con.execute(
        "SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b "
        "FROM orders a JOIN orders b ON "
        "b.o_totalprice >= a.o_totalprice AND "
        f"b.o_totalprice <= a.o_totalprice + {args.delta} AND "
        "(a.o_totalprice < b.o_totalprice OR (a.o_totalprice = "
        "b.o_totalprice AND a.o_orderkey < b.o_orderkey))").df()
    got_set = set(zip(got["key_a"], got["key_b"]))
    want_set = set(zip(want["key_a"], want["key_b"]))
    out["verify_exact"] = got_set == want_set
    if not out["verify_exact"]:
        out["missing"] = len(want_set - got_set)
        out["spurious"] = len(got_set - want_set)

    # 2) the big shape
    bdir = "/tmp/band_stress_big"
    build(bdir, args.rows, seed=7)
    t0 = time.perf_counter()
    big = price_band_join(bdir, delta=args.delta, num_buckets=128)
    n_pairs = int(big.count())
    out["rows"] = args.rows
    out["sec"] = round(time.perf_counter() - t0, 2)
    out["pairs"] = n_pairs
    out["rows_per_sec"] = int(args.rows / out["sec"])

    print(json.dumps(out))
    ray.shutdown()
    return 0 if out["verify_exact"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
