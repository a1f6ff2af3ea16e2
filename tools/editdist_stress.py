"""Scale stress for relational.edit_distance_pairs (FastSS Levenshtein≤1).

Generates N synthetic part-number-style names (9-digit ids, a fraction
corrupted by one random substitution/deletion so true distance-1 pairs
exist), writes them as a customer.parquet table, and times the FastSS
path. At --check sizes it also brute-forces the exact pair set
(O(n²) numpy Hamming + deletion check) and asserts equality — recall
AND precision 1.0 by construction or the run fails.

Usage: python tools/editdist_stress.py [N ...] (default 20000 200000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def make_names(n: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = [f"Item#{i:09d}" for i in range(n)]
    # corrupt 10%: substitution (5%) or deletion (5%) of one char
    idx = rng.choice(n, size=n // 10, replace=False)
    names = list(base)
    for r, i in enumerate(idx):
        s = names[i]
        p = int(rng.integers(5, len(s)))
        if r % 2 == 0:
            names[i] = s[:p] + chr(ord("0") + int(rng.integers(10))) + s[p + 1:]
        else:
            names[i] = s[:p] + s[p + 1:]
    return pd.DataFrame({"c_custkey": np.arange(n, dtype=np.int64),
                         "c_name": names})


def brute_force(df: pd.DataFrame) -> set[tuple[int, int, int]]:
    names = df["c_name"].to_numpy()
    keys = df["c_custkey"].to_numpy()
    enc = [n.encode() for n in names]
    lens = np.asarray([len(e) for e in enc])
    w = lens.max()
    mat = np.frombuffer(b"".join(e.ljust(int(w), b"\x00") for e in enc),
                        dtype=np.uint8).reshape(len(enc), int(w))
    out = set()
    for i in range(len(names)):
        dL = lens - lens[i]
        cand = np.flatnonzero((np.abs(dL) <= 1) & (keys > keys[i]))
        if not len(cand):
            continue
        eq = mat[cand] == mat[i][None, :]
        ham = (~eq).sum(axis=1)
        same = dL[cand] == 0
        for c, s, h in zip(cand, same, ham):
            if s:
                if h <= 1:
                    out.add((int(keys[i]), int(keys[c]), int(h)))
            else:
                a, b = (names[i], names[c]) if lens[i] > lens[c] \
                    else (names[c], names[i])
                # deletion check: common prefix + suffix covers shorter
                p = 0
                while p < len(b) and a[p] == b[p]:
                    p += 1
                s2 = 0
                while s2 < len(b) - 0 and a[len(a) - 1 - s2] == b[len(b) - 1 - s2]:
                    s2 += 1
                if p + s2 >= len(b):
                    out.add((int(keys[i]), int(keys[c]), 1))
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ocr_agent_ray.pipelines.relational import edit_distance_pairs

    for n in sizes:
        d = f"/tmp/editdist_stress/{n}"
        os.makedirs(d, exist_ok=True)
        df = make_names(n)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       f"{d}/customer.parquet")
        t0 = time.perf_counter()
        got = pd.concat(
            [b for b in edit_distance_pairs(d).iter_batches(
                batch_format="pandas", batch_size=None)],
            ignore_index=True)
        sec = time.perf_counter() - t0
        print(f"n={n}: {len(got)} pairs in {sec:.1f}s "
              f"({n / sec:,.0f} names/s)")
        if n <= 20_000:
            want = brute_force(df)
            have = set(zip(got["custkey_a"].astype(int),
                           got["custkey_b"].astype(int),
                           got["edit_dist"].astype(int)))
            assert have == want, (
                f"mismatch: missing={len(want - have)} extra={len(have - want)}")
            print(f"  exactness vs brute force: OK ({len(want)} pairs)")
    ray.shutdown()


if __name__ == "__main__":
    main()
