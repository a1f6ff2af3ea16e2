"""HyperLogLog sketch: accuracy, mergeability, determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.functions.sketch import HyperLogLog, hll_distinct


def test_hll_accuracy_ints():
    for true_n in (100, 5_000, 50_000):
        hll = HyperLogLog(p=12)
        hll.add_ints(np.arange(true_n))
        est = hll.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single():
    a, b = HyperLogLog(), HyperLogLog()
    a.add_ints(np.arange(0, 10_000))
    b.add_ints(np.arange(5_000, 15_000))
    merged = a.merge(b)
    single = HyperLogLog()
    single.add_ints(np.arange(15_000))
    assert merged.estimate() == single.estimate()  # identical registers
    # round-trip
    back = HyperLogLog.deserialize(merged.serialize())
    assert back.estimate() == merged.estimate()


def test_hll_strings_and_duplicates():
    h = HyperLogLog()
    h.add_strings([f"user-{i % 500}" for i in range(20_000)])
    assert abs(h.estimate() - 500) / 500 < 0.06


def test_hll_distinct_over_dataset(ray_session):
    df = pd.DataFrame({"user_id": np.arange(30_000) % 2_000})
    est = hll_distinct(rd.from_pandas(df), "user_id")
    assert abs(est - 2_000) / 2_000 < 0.05
    # deterministic across runs / batchings
    est2 = hll_distinct(rd.from_pandas(df).repartition(7), "user_id")
    assert est == est2
