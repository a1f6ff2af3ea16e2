"""Aggregation strategies vs pandas oracles on randomized frames."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ocr_agent_ray.pipelines.agg import (
    combine_partials_driver,
    distinct_rows,
    hash_partition_aggregate,
)

SPEC = {
    "s": ("v", "sum"),
    "mn": ("v", "min"),
    "mx": ("v", "max"),
    "n": ("v", "count"),
}


def _oracle(df: pd.DataFrame, keys):
    g = df.groupby(keys, as_index=False).agg(
        s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size")
    )
    return g.sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hash_partition_aggregate_matches_pandas(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, 500, 5000),          # int keys, many groups
        "v": rng.integers(-1000, 1000, 5000),     # int values: exact sums
    })
    got = (
        hash_partition_aggregate(rd.from_pandas(df).repartition(7), ["k"], SPEC)
        .to_pandas().sort_values(["k"]).reset_index(drop=True)
    )
    want = _oracle(df, ["k"])
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_combine_partials_driver_matches_pandas(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 3000),
        "v": rng.integers(0, 100, 3000),
    })
    got = combine_partials_driver(
        rd.from_pandas(df).repartition(5), ["k"], SPEC
    ).sort_values("k").reset_index(drop=True)
    want = _oracle(df, ["k"])
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_distinct_rows_matches_pandas(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "a": rng.integers(0, 20, 2000),
        "b": rng.choice(["x", "y", "z"], 2000),
    })
    got = distinct_rows(rd.from_pandas(df).repartition(6), ["a", "b"]).to_pandas()
    want = df.drop_duplicates(["a", "b"])
    assert set(map(tuple, got.values)) == set(map(tuple, want.values))
    assert len(got) == len(want)
