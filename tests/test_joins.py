"""Join strategies vs pandas-merge oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ocr_agent_ray.pipelines.joins import (
    broadcast_join,
    broadcast_semi_filter,
    bucket_hash_join,
)


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 500),
        "lv": rng.standard_normal(500).round(4),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 60),
        "rv": [f"r{i}" for i in range(60)],
    })
    return left, right


def _norm(df):
    return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)


def test_broadcast_join(ray_session, tables):
    left, right = tables
    got = broadcast_join(rd.from_pandas(left), right, on="k").to_pandas()
    want = left.merge(right, on="k", how="inner")
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_bucket_hash_join_inner(ray_session, tables):
    left, right = tables
    got = bucket_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=8
    ).to_pandas()
    want = left.merge(right, on="k", how="inner")
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_bucket_hash_join_string_key(ray_session):
    left = pd.DataFrame({"k": [f"id{i%7}" for i in range(40)], "a": range(40)})
    right = pd.DataFrame({"k": [f"id{i}" for i in range(10)], "b": range(10)})
    got = bucket_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4
    ).to_pandas()
    want = left.merge(right, on="k")
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


@pytest.mark.parametrize("how", ["left", "right", "outer"])
def test_bucket_hash_join_other_hows(ray_session, tables, how):
    left, right = tables
    got = bucket_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        num_buckets=8, how=how,
    ).to_pandas()
    want = left.merge(right, on="k", how=how)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_semi_and_anti_filter(ray_session, tables):
    left, _ = tables
    keys = [1, 2, 3]
    semi = broadcast_semi_filter(rd.from_pandas(left), keys, "k").to_pandas()
    anti = broadcast_semi_filter(rd.from_pandas(left), keys, "k", keep=False).to_pandas()
    assert set(semi["k"]) <= set(keys)
    assert set(anti["k"]).isdisjoint(keys)
    assert len(semi) + len(anti) == len(left)
