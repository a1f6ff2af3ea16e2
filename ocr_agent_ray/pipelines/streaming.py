"""Stream-shaped operators over the events log.

Ray Data has no event-time windowing; the reference's only streaming
surface is a 1 Hz poll loop with marker-file watermarks (SURVEY.md §2.9).
Here stream semantics follow the guide's pattern: treat events as an
ordered, partitioned log — partition by user, sort by ts within the
group, window with pandas inside ``map_groups``. Tumbling windows use the
pre-aggregate pattern (partials per batch, then a small groupby).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ocr_agent_ray.sources.readers import read_table


def _read_events(sf_dir: str, columns=("event_id", "ts", "user_id", "event_type", "value")):
    return read_table(sf_dir, "events", list(columns))


def tumbling_window_counts(sf_dir: str, *, hours: int = 1):
    """Events per (user, window): count + sum(value), window = ts truncated
    to the hour boundary. Partial-aggregated inside map_batches before the
    groupby shuffle."""

    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    def _window(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(window_start=batch["ts"].dt.floor(f"{hours}h"))

    agg = hash_partition_aggregate(
        _read_events(sf_dir).map_batches(_window, batch_format="pandas"),
        ["user_id", "window_start"],
        {"n_events": ("event_id", "count"), "sum_value": ("value", "sum")},
        num_buckets=32,
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        from ocr_agent_ray.functions.textstats import round_half_away

        batch = batch.copy()
        batch["n_events"] = batch["n_events"].astype("int64")
        batch["sum_value"] = round_half_away(batch["sum_value"], 6)
        return batch

    return agg.map_batches(_finish, batch_format="pandas")


def sessionize(sf_dir: str, *, gap_minutes: int = 30):
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. One groupby(user) shuffle;
    windowing is vectorized pandas over the ts-sorted group.

    Output: (user_id, session_start, session_end, n_events).
    Ordering assumption: all of a user's events fit one group (true for a
    keyed log; salt by day for pathological hot users).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new = (g["ts"].diff() > gap).fillna(True)
        sid = new.cumsum()
        out = g.groupby(sid).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out.reset_index(drop=True)

    return (
        _read_events(sf_dir, columns=("event_id", "ts", "user_id"))
        .groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
    )


def last_event_per_user(sf_dir: str):
    """Latest event per user (the reference's top-1-by-order lookups G6/G7,
    queue_store.py top-1 pops, generalized per key). Ties on ts broken by
    event_id descending."""

    def _last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=[False, False]).head(1)
        return g[["user_id", "event_id", "ts", "event_type"]]

    return (
        _read_events(sf_dir, columns=("event_id", "ts", "user_id", "event_type"))
        .groupby("user_id")
        .map_groups(_last, batch_format="pandas")
    )


def latest_order_asof(sf_dir: str):
    """As-of join: for each event, the user's latest order placed at or
    before the event time (backward as-of on the order date).

    Orders are first reduced to one row per (custkey, date) — max orderkey
    — so tie-breaking is deterministic on both the Ray and SQL sides.
    """
    import pyarrow as pa

    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate
    from ocr_agent_ray.pipelines.joins import asof_join
    from ocr_agent_ray.sources.readers import read_table

    events = _read_events(sf_dir, columns=("event_id", "ts", "user_id"))
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    orders = hash_partition_aggregate(
        orders, ["o_custkey", "o_orderdate"], {"o_orderkey": ("o_orderkey", "max")}
    )
    orders = orders.map_batches(
        lambda b: b.rename(columns={"o_custkey": "user_id"}), batch_format="pandas"
    )
    out = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("ts", pa.timestamp("us")),
                               ("user_id", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderkey", pa.int64())]),
    )
    # project in Arrow: a pandas round-trip here would re-upcast the
    # nullable int64 o_orderkey (unmatched rows) to float64
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )


def error_top1(sf_dir: str):
    """The reference's 'last error' query (main.rs:780-798): top-1 failed
    row by order key, here the latest 'error' event globally."""
    ds = _read_events(sf_dir)

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["event_type"] == "error"]

    return (
        ds.map_batches(_filter, batch_format="pandas")
        .sort(["ts", "event_id"], descending=[True, True])
        .limit(1)
    )
