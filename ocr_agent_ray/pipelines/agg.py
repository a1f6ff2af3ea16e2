"""Aggregation strategies.

Ray Data's built-in ``groupby().aggregate(...)`` is a sort-based shuffle
whose fixed cost dwarfs small aggregations and whose reduce is
near-serial in this version. The scale-appropriate shapes are explicit:

- ``combine_partials_driver``: map-side partials (one row per key per
  batch) then a single pandas combine of the tiny partial table on the
  driver. Right when |keys| is small (status counts, Q1 groups) — the
  partial table is bounded by keys × batches regardless of input size.
- ``hash_partition_aggregate``: map-side partials, then ONE
  groupby(bucket) shuffle into B buckets and a vectorized pandas
  aggregation per bucket. Right when |keys| is large (per-order revenue,
  per-user windows): every bucket processes ~|keys|/B keys with zero
  per-key Python.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pandas as pd

from ocr_agent_ray.pipelines.joins import stable_bucket_array

# agg_spec: {output_col: (input_col, how)} with how in sum|count|min|max
AggSpec = Mapping[str, tuple[str, str]]


def _partial_fn(keys: list[str], spec: AggSpec):
    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, how if how != "count" else "size")
               for out, (col, how) in spec.items()}
        )
        return g

    return _partial


def _combine(df: pd.DataFrame, keys: list[str], spec: AggSpec) -> pd.DataFrame:
    how2 = {out: ("sum" if how == "count" else how) for out, (_, how) in spec.items()}
    return df.groupby(keys, as_index=False, sort=False).agg(
        **{out: (out, how2[out]) for out in spec}
    )


def combine_partials_driver(ds, keys: list[str], spec: AggSpec) -> pd.DataFrame:
    """Two-phase aggregate with a driver-side final combine (small keys)."""
    partials = ds.map_batches(_partial_fn(keys, spec), batch_format="pandas")
    chunks = [b for b in partials.iter_batches(batch_format="pandas",
                                               batch_size=65536)]
    if not chunks:
        cols = keys + list(spec)
        return pd.DataFrame(columns=cols)
    return _combine(pd.concat(chunks, ignore_index=True), keys, spec)


def hash_partition_aggregate(ds, keys: list[str], spec: AggSpec,
                             num_buckets: int = 32):
    """Two-phase aggregate with a bucketed distributed combine (large keys)."""
    import pyarrow as pa

    partial = _partial_fn(keys, spec)

    def _partial_bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        g = partial(batch)
        tbl = pa.Table.from_pandas(g[keys[0]].to_frame(), preserve_index=False)
        g = g.copy()
        g["__bucket"] = stable_bucket_array(
            tbl.column(0).combine_chunks(), num_buckets
        ).to_numpy(zero_copy_only=False)
        return g

    def _combine_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _combine(g.drop(columns="__bucket"), keys, spec)

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    return bucket_map_groups(
        ds.map_batches(_partial_bucketed, batch_format="pandas",
                       batch_size=65536),
        _combine_bucket, bucket_col="__bucket", num_buckets=num_buckets)


def ranged_global_rank(keyed, sort_cols: list[str], *,
                       rank_col: str = "__rank",
                       materialize_input: bool = True):
    """Exact dense 1-based GLOBAL rank without a global sort.

    ``keyed`` must carry an int64 ``__rb`` range column that is
    ORDER-CONSISTENT with ``sort_cols``: every row in range r sorts
    before every row in range r+1 (e.g. a leading-byte range of a hash
    key, or value // width for a value sort). The scan is then:
    per-range counts -> driver exclusive prefix sum (one int per range,
    the only driver state) -> in-range vectorized sort + arange.

    Returns ``(total_rows, Dataset with rank_col appended)``. The scan
    needs two passes (counts, ranks); the input is hash-EXCHANGED once
    (``exchange_shards``) and both passes run as reduce waves over the
    same object-store shards — no input materialize, no second shuffle,
    no upstream re-execution. ``materialize_input`` is kept for signature
    compatibility and ignored (the shards ARE the materialization, but
    already partitioned)."""
    from ocr_agent_ray.pipelines.exchange import exchange_shards

    shards = exchange_shards(keyed, bucket_col="__rb", num_buckets=64,
                             mode="mod")

    def _counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("__rb", sort=False).size().reset_index(name="n")

    stats = shards.reduce(_counts).to_pandas()
    if stats.empty:
        stats = pd.DataFrame({"__rb": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
    stats = stats.sort_values("__rb").reset_index(drop=True)
    offsets = dict(zip(stats["__rb"],
                       stats["n"].cumsum().shift(1, fill_value=0)))
    total = int(stats["n"].sum())

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        off = int(offsets[int(g["__rb"].iloc[0])])
        g[rank_col] = off + np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return total, shards.reduce(_rank, group_col="__rb")


def ranged_partitioned_ranks(keyed, part_col: str, value_col: str,
                             tiebreak_col: str, *,
                             materialize_input: bool = True):
    """ROW_NUMBER / RANK / DENSE_RANK OVER (PARTITION BY part ORDER BY
    value, tiebreak) without per-partition gathering — the window-function
    family done range-parallel.

    Like ranged_global_rank, ``keyed`` carries an int64 ``__rb`` range
    column order-consistent with ``value_col``. A partition's rows are
    spread across MANY ranges (so a hot partition never funnels into one
    task); cross-range offsets per (range, partition) are the only driver
    state: row counts fold via mergeable partials, distinct-value counts
    via a per-batch drop_duplicates partial + per-range exact dedup (a
    value always lands in exactly one range, so per-range distinct counts
    sum cleanly). Ties never span ranges for the same reason.

    Returns a Dataset with row_num / rnk / dense_rnk appended (int64).
    The input is hash-exchanged ONCE (``exchange_shards``); the stats
    pass (row counts + exact distinct-value counts per (range,
    partition) — a range's rows all land in one bucket, so per-bucket
    nunique is globally exact) and the rank pass both run as reduce
    waves over the same shards. ``materialize_input`` is kept for
    signature compatibility and ignored."""
    from ocr_agent_ray.pipelines.exchange import exchange_shards

    shards = exchange_shards(keyed, bucket_col="__rb", num_buckets=64,
                             mode="mod")

    def _stats(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["__rb", part_col], sort=False)
        out = gg.size().reset_index(name="n")
        out["nd"] = gg[value_col].nunique().reset_index(drop=True)
        return out

    both = shards.reduce(_stats).to_pandas()
    if both.empty:
        both = pd.DataFrame(columns=["__rb", part_col, "n", "nd"])
    stats = both[["__rb", part_col, "n"]]
    nd_tbl = both[["__rb", part_col, "nd"]]

    row_off: dict = {}
    dense_off: dict = {}
    for pk, sub in stats.groupby(part_col):
        sub = sub.sort_values("__rb")
        for rb, off in zip(sub["__rb"],
                           sub["n"].cumsum().shift(1, fill_value=0)):
            row_off[(int(rb), pk)] = int(off)
    for pk, sub in nd_tbl.groupby(part_col):
        sub = sub.sort_values("__rb")
        for rb, off in zip(sub["__rb"],
                           sub["nd"].cumsum().shift(1, fill_value=0)):
            dense_off[(int(rb), pk)] = int(off)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["__rb"].iloc[0])
        parts = []
        for pk, sub in g.groupby(part_col, sort=False):
            sub = sub.sort_values([value_col, tiebreak_col],
                                  kind="mergesort").reset_index(drop=True)
            vals = sub[value_col].to_numpy()
            ro = row_off[(rb, pk)]
            first = np.searchsorted(vals, vals, side="left")
            newv = np.r_[True, vals[1:] != vals[:-1]] if len(vals) else (
                np.zeros(0, dtype=bool))
            parts.append(sub.assign(
                row_num=ro + np.arange(1, len(sub) + 1, dtype=np.int64),
                rnk=ro + first + 1,
                dense_rnk=dense_off[(rb, pk)] + np.cumsum(newv),
            ))
        return pd.concat(parts, ignore_index=True)

    return shards.reduce(_rank, group_col="__rb")


def distinct_rows(ds, cols: list[str], num_buckets: int = 32):
    """Distributed DISTINCT over ``cols``: bucket by the hash of the FULL
    row (identical rows land together, so per-bucket drop_duplicates is
    global dedup), vectorized per bucket. Hashing the whole row instead
    of the first column is the hot-key guard: a low-cardinality or skewed
    leading column (e.g. 5 event types) would otherwise flood one bucket
    with the hot key's entire row set."""

    def _bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[cols].drop_duplicates()
        # deterministic across processes: pandas hash_pandas_object uses a
        # fixed siphash key (unlike python hash())
        row_hash = pd.util.hash_pandas_object(b, index=False).to_numpy()
        b = b.copy()
        b["__bucket"] = (row_hash % np.uint64(num_buckets)).astype(np.int32)
        return b

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    return bucket_map_groups(
        ds.map_batches(_bucketed, batch_format="pandas", batch_size=65536),
        lambda g: g.drop(columns="__bucket").drop_duplicates(),
        bucket_col="__bucket", num_buckets=num_buckets)
