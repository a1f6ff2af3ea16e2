"""Stream-shaped operators over the events log.

Ray Data has no event-time windowing; the reference's only streaming
surface is a 1 Hz poll loop with marker-file watermarks (SURVEY.md §2.9).
Here stream semantics follow the guide's pattern: treat events as an
ordered, partitioned log — partition by user, sort by ts within the
group, window with pandas inside ``map_groups``. Tumbling windows use the
pre-aggregate pattern (partials per batch, then a small groupby).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_agent_ray.pipelines.exchange import bucket_map_groups, key_map_groups
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
    num_buckets = 64

    def _key(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(
            __b=(batch["user_id"] % num_buckets).astype("int32"))

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket vectorization: ONE sort + diff/cumsum over every
        # user in the bucket (a per-user map_groups pays ~10ms of pandas
        # per-group overhead — 1000x the actual work at high user counts)
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new = g["user_id"].ne(g["user_id"].shift()) | (g["ts"].diff() > gap)
        sid = new.cumsum()
        out = g.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
        )
        return out.reset_index(drop=True)

    keyed = _read_events(sf_dir, columns=("event_id", "ts", "user_id")) \
        .map_batches(_key, batch_format="pandas", batch_size=65536)
    return bucket_map_groups(keyed, _sessions, num_buckets=num_buckets)


def concurrent_sessions_daily(sf_dir: str, *, gap_minutes: int = 30):
    """Peak concurrency per calendar day: the maximum number of user
    sessions simultaneously open (inclusive [start, end] intervals)
    during each day — the interval-overlap / capacity-planning shape
    (how many OCR workers would this corpus's arrival pattern need?).

    Distributed sweep-line: sessionize's intervals explode into
    per-day CLIPPED segments (a session contributes one segment to
    every day it touches, so each day's sweep is self-contained — no
    cross-partition carry), segments exchange on day, and each bucket
    runs ONE vectorized sweep: ±1 deltas sorted by (day, t, start-
    before-end), grouped cumsum, max per day. Touching-at-an-instant
    counts as concurrent (starts sort before ends at equal t) — the
    same tie the twin pins with its pri column. Segment explosion is
    pure numpy (repeat + offset arithmetic), no per-row loop.
    Columns: day, n_sessions (sessions touching the day),
    max_concurrent."""
    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    num_buckets = 32
    sessions = sessionize(sf_dir, gap_minutes=gap_minutes)

    def _segments(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "day": pd.Series(dtype="datetime64[us]"),
                "s": pd.Series(dtype="datetime64[us]"),
                "e": pd.Series(dtype="datetime64[us]"),
                "__b": pd.Series(dtype="int32")})
        s = b["session_start"].to_numpy()
        e = b["session_end"].to_numpy()
        d0 = b["session_start"].dt.floor("D").to_numpy()
        d1 = b["session_end"].dt.floor("D").to_numpy()
        nd = ((d1 - d0) // np.timedelta64(1, "D")).astype(np.int64) + 1
        idx = np.repeat(np.arange(len(b)), nd)
        off = np.arange(idx.size) - np.repeat(np.cumsum(nd) - nd, nd)
        day = d0[idx] + off.astype("timedelta64[D]")
        day_end = day + np.timedelta64(1, "D") - np.timedelta64(1, "us")
        out = pd.DataFrame({
            "day": day,
            "s": np.maximum(s[idx], day),
            "e": np.minimum(e[idx], day_end)})
        epoch = (day.astype("datetime64[D]").astype(np.int64)
                 % num_buckets)
        out["__b"] = epoch.astype(np.int32)
        return out

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        ev = pd.DataFrame({
            "day": np.concatenate([g["day"].to_numpy(),
                                   g["day"].to_numpy()]),
            "t": np.concatenate([g["s"].to_numpy(), g["e"].to_numpy()]),
            "pri": np.concatenate([np.zeros(n, np.int8),
                                   np.ones(n, np.int8)]),
            "delta": np.concatenate([np.ones(n, np.int64),
                                     -np.ones(n, np.int64)])})
        ev = ev.sort_values(["day", "t", "pri"], kind="mergesort")
        run = ev.groupby("day", sort=False)["delta"].cumsum()
        ev["run"] = run
        agg = ev.groupby("day", sort=False).agg(
            max_concurrent=("run", "max"))
        ns = g.groupby("day", sort=False).size()
        agg["n_sessions"] = ns
        agg = agg.reset_index()
        return agg[["day", "n_sessions", "max_concurrent"]].astype(
            {"n_sessions": "int64", "max_concurrent": "int64"})

    seg = sessions.map_batches(_segments, batch_format="pandas",
                               batch_size=65536)
    return bucket_map_groups(seg, _sweep, num_buckets=num_buckets)


def last_event_per_user(sf_dir: str):
    """Latest event per user (the reference's top-1-by-order lookups G6/G7,
    queue_store.py top-1 pops, generalized per key). Ties on ts broken by
    event_id descending."""

    def _last(g: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket: one sort, drop_duplicates(keep="last") == per-user
        # max-(ts, event_id) row; a per-batch pre-reduction shrinks the
        # shuffle to <= users-per-batch rows
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        keep = g.drop_duplicates("user_id", keep="last")
        return keep[["user_id", "event_id", "ts", "event_type"]]

    keyed = (
        _read_events(sf_dir, columns=("event_id", "ts", "user_id", "event_type"))
        .map_batches(lambda b: _last(b).assign(
            __b=lambda d: (d["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _last, num_buckets=64)


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


def hopping_window_counts(sf_dir: str, *, size_hours: int = 2, hop_hours: int = 1):
    """Hopping (sliding) windows: each event lands in size/hop overlapping
    windows — a vectorized 1→N expansion inside map_batches (numpy repeat
    over the hop offsets), then the same partial-aggregate + bucketed
    combine as tumbling. Output: (user_id, window_start, n_events)."""
    import numpy as np

    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    k = size_hours // hop_hours  # windows containing each event

    def _expand(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch["ts"].dt.floor(f"{hop_hours}h")
        n = len(batch)
        offs = np.arange(k, dtype=np.int64)
        starts = (base.to_numpy()[:, None]
                  - offs[None, :] * np.timedelta64(hop_hours, "h")).ravel()
        return pd.DataFrame({
            "user_id": np.repeat(batch["user_id"].to_numpy(), k),
            "window_start": starts,
            "event_id": np.repeat(batch["event_id"].to_numpy(), k),
        })

    agg = hash_partition_aggregate(
        _read_events(sf_dir, columns=("event_id", "ts", "user_id")).map_batches(
            _expand, batch_format="pandas"),
        ["user_id", "window_start"],
        {"n_events": ("event_id", "count")},
        num_buckets=32,
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_events"] = batch["n_events"].astype("int64")
        return batch

    return agg.map_batches(_finish, batch_format="pandas")


def lineitems_shipped_within_30d(sf_dir: str):
    """Equi + range join (a custom operator Ray Data lacks): line items
    shipped within 30 days of their order's date. Bucketed by the equi
    key (one union + one shuffle, bucket_hash_join shape); the range
    predicate is a vectorized Arrow in-bucket filter after the per-bucket
    equi merge — the general recipe for `a.key = b.key AND b.v BETWEEN
    f(a)` joins. Output: (l_orderkey, l_linenumber, l_shipdate,
    o_orderdate)."""
    import pyarrow as pa

    from ocr_agent_ray.pipelines.joins import bucket_hash_join
    from ocr_agent_ray.sources.readers import read_table

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_linenumber", "l_shipdate"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    joined = bucket_hash_join(
        li, orders, on="l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
    )

    def _range_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hi = pc.add(b["o_orderdate"],
                    pa.scalar(pd.Timedelta(days=30).to_pytimedelta()))
        return b.filter(pc.less_equal(b["l_shipdate"], hi)).select(
            ["l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"])

    return joined.map_batches(_range_filter, batch_format="pyarrow")


def event_deltas(sf_dir: str):
    """LAG window analog: per-user gap to the previous event in
    microseconds (NULL for each user's first event). Partition by user,
    mergesort by (ts, event_id) inside the group, vectorized int64 diff;
    the nullable gap column is emitted as float64 (NaN on first events)
    because that is how the driver materializes DuckDB's nullable BIGINT
    through pandas — Int64 231 and float64 231.0 hash differently."""

    def _delta(g: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket: one sort over every user in the bucket; the diff
        # at each user boundary is masked back to NULL
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        out = g[["user_id", "event_id", "ts"]].copy()
        delta = g["ts"].astype("int64").diff()  # float64 with NaN at row 0
        delta[g["user_id"].ne(g["user_id"].shift())] = float("nan")
        out["delta_us"] = delta.astype("float64")
        return out

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _delta, num_buckets=64)


def customers_without_urgent_orders(sf_dir: str):
    """Anti-join: customers who never placed a '1-URGENT' order. The
    urgent-custkey set is first reduced DISTRIBUTED-side to distinct
    values (bucketed distinct — the wire carries unique keys only), then
    broadcast as an anti membership filter; flip to a bucketed anti merge
    when even the distinct key set outgrows the object store."""
    import pyarrow.compute as pc

    from ocr_agent_ray.pipelines.agg import distinct_rows
    from ocr_agent_ray.pipelines.joins import broadcast_semi_filter
    from ocr_agent_ray.sources.readers import read_table

    urgent = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    custkeys = distinct_rows(urgent, ["o_custkey"]).to_pandas()["o_custkey"]

    customers = read_table(sf_dir, "customer",
                           ["c_custkey", "c_name", "c_acctbal"])
    return broadcast_semi_filter(customers, custkeys, "c_custkey", keep=False)


def view_purchase_funnel(sf_dir: str, *, within_minutes: int = 60):
    """Funnel / event-sequence analysis: per user, how many 'view' events
    convert to a 'purchase' within the window. Partition by user, sort by
    time in the group, then one vectorized searchsorted of view-times
    against purchase-times — the distributed form of the self-join
    `p.ts in (v.ts, v.ts + w]` without materializing the pair blowup."""
    import numpy as np

    win_us = within_minutes * 60 * 1_000_000

    def _funnel(g: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket: one sort; per user only two numpy searchsorteds
        # (a per-user map_groups built one DataFrame per user)
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        is_view = (g["event_type"] == "view").to_numpy()
        users, starts = np.unique(uid, return_index=True)
        bounds = np.append(starts, len(uid))
        out_u, out_v, out_c = [], [], []
        for i in range(len(users)):
            s, e = bounds[i], bounds[i + 1]
            views = us[s:e][is_view[s:e]]
            if not len(views):  # purchase-only users have no funnel entry
                continue
            buys = us[s:e][~is_view[s:e]]   # ts-sorted within user
            # a view converts iff any purchase lands in (view_ts, view_ts+w]
            lo = np.searchsorted(buys, views, side="right")
            hi = np.searchsorted(buys, views + win_us, side="right")
            out_u.append(int(users[i]))
            out_v.append(len(views))
            out_c.append(int((hi > lo).sum()))
        return pd.DataFrame({
            "user_id": pd.array(out_u, dtype="int64"),
            "n_views": pd.array(out_v, dtype="int64"),
            "n_conversions": pd.array(out_c, dtype="int64"),
        })

    ev = _read_events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    filtered = ev.map_batches(
        lambda b: b[b["event_type"].isin(["view", "purchase"])].assign(
            __b=lambda d: (d["user_id"] % 64).astype("int32")),
        batch_format="pandas", batch_size=65536)
    return bucket_map_groups(filtered, _funnel, num_buckets=64)


def daily_active_users(sf_dir: str):
    """Windowed COUNT(DISTINCT): distinct users per calendar day — the
    per-batch (day, user) dedup shrinks the wire, the bucketed global
    distinct dedups across batches, and the final per-day count is a
    partial combine."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver, distinct_rows

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].dt.floor("D"),
                             "user_id": batch["user_id"]})

    pairs = distinct_rows(
        _read_events(sf_dir, ("ts", "user_id")).map_batches(
            _day, batch_format="pandas"),
        ["day", "user_id"], num_buckets=8,
    )
    out = combine_partials_driver(pairs, ["day"], {"dau": ("user_id", "count")})
    out["dau"] = out["dau"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def event_transitions(sf_dir: str):
    """Per-user event-type transition counts (the Markov/sequence-mining
    matrix: how often does a 'view' lead to a 'purchase'?). Same bucketed
    whole-bucket shape as the window family: ONE sort per bucket, a shift
    compare pairs consecutive events within each user, pandas
    value_counts folds the bucket's transitions; tiny per-bucket partial
    tables combine on the driver (|event_type|² keys)."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        pairs = pd.DataFrame({
            "prev_type": g["event_type"].shift()[same],
            "next_type": g["event_type"][same],
        })
        if pairs.empty:
            return pd.DataFrame({"prev_type": pd.Series(dtype="object"),
                                 "next_type": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        counts = pairs.value_counts()
        out = counts.index.to_frame(index=False)
        out["n"] = counts.to_numpy()
        return out

    keyed = _read_events(
        sf_dir, ("event_id", "ts", "user_id", "event_type")
    ).map_batches(lambda b: b.assign(
        __b=(b["user_id"] % 64).astype("int32")),
        batch_format="pandas", batch_size=65536)
    partials = bucket_map_groups(keyed, _trans, num_buckets=64)
    out = combine_partials_driver(partials, ["prev_type", "next_type"],
                                  {"n": ("n", "sum")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def daily_counts_gapfilled(sf_dir: str):
    """Sparse → dense time series: event counts per calendar day with
    missing days filled as zero (the gap-fill/densify ETL op). Counts
    fold as mergeable partials; the dense day spine is generated on the
    driver from the tiny (min_day, max_day) aggregate — spine length is
    calendar span, never data size — and left-merged against the counts."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].dt.floor("D"),
                             "event_id": batch["event_id"]})

    counts = combine_partials_driver(
        _read_events(sf_dir, ("ts", "event_id")).map_batches(
            _day, batch_format="pandas", batch_size=65536),
        ["day"], {"n_events": ("event_id", "count")})
    if counts.empty:
        return pd.DataFrame({"day": pd.Series(dtype="datetime64[us]"),
                             "n_events": pd.Series(dtype="int64")})
    spine = pd.DataFrame({
        "day": pd.date_range(counts["day"].min(), counts["day"].max(),
                             freq="D")})
    out = spine.merge(counts, on="day", how="left")
    out["n_events"] = out["n_events"].fillna(0).astype("int64")
    out["day"] = out["day"].astype("datetime64[us]")
    return out.sort_values("day").reset_index(drop=True)


def trailing_week_active_users(sf_dir: str, *, window_days: int = 7):
    """Rolling COUNT(DISTINCT) — users active in the trailing 7 days, per
    day — as a SWEEP LINE instead of a ×7 row expansion: a user active on
    day d covers report days [d, d+6], so per user we merge overlapping
    coverage intervals (runs of active days with gaps < window) and emit
    just (+1 at start, -1 after end) deltas; the per-day WAU is the
    prefix sum of the folded deltas. Shape: distinct (day,user) pairs
    (bucketed) -> re-bucket by user (one user's days co-locate) ->
    vectorized run-split + delta emit per bucket -> per-day partial sums
    -> |days|-row driver prefix sum. The wire carries <= 2x|pairs| delta
    rows — the previous shape's window_days-fold expansion and second
    global distinct (7x the pair count) are gone. Report days clamp to
    the observed [min_day, max_day] span; zero-coverage days drop
    (matching the oracle's GROUP BY over covered days)."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver, distinct_rows
    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].dt.floor("D"),
                             "user_id": batch["user_id"]})

    pairs = distinct_rows(
        _read_events(sf_dir, ("ts", "user_id")).map_batches(
            _day, batch_format="pandas", batch_size=65536),
        ["day", "user_id"], num_buckets=8,
    ).materialize()

    # min/max day: tiny driver fold over the deduped pairs
    bounds = pairs.map_batches(
        lambda b: pd.DataFrame({"lo": [b["day"].min()],
                                "hi": [b["day"].max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = bounds["lo"].min(), bounds["hi"].max()

    def _deltas(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        day = (g["day"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        user = g["user_id"].to_numpy()
        # new merged interval at a user switch or a gap >= window
        new_run = np.r_[True, (user[1:] != user[:-1])
                        | (day[1:] - day[:-1] >= window_days)]
        starts = day[new_run]
        run_last = np.r_[new_run[1:], True]       # last day of each run
        ends = day[run_last] + (window_days - 1)  # inclusive coverage end
        return pd.DataFrame({
            "day_i": np.concatenate([starts, ends + 1]),
            "delta": np.concatenate([
                np.ones(len(starts), dtype=np.int64),
                np.full(len(ends), -1, dtype=np.int64)]),
        })

    keyed = pairs.map_batches(
        lambda b: b.assign(__b=(b["user_id"] % 64).astype("int32")),
        batch_format="pandas", batch_size=65536)
    deltas = combine_partials_driver(
        bucket_map_groups(
            keyed, lambda g: _deltas(g.drop(columns="__b")), num_buckets=64),
        ["day_i"], {"delta": ("delta", "sum")})

    deltas = deltas.sort_values("day_i").reset_index(drop=True)
    wau = deltas["delta"].cumsum().to_numpy()
    day_i = deltas["day_i"].to_numpy(dtype=np.int64)
    # coverage between delta positions is constant: step-fill the
    # [lo, hi] day spine from the delta table
    lo_i = int(pd.Timestamp(lo).to_datetime64()
               .astype("datetime64[D]").astype(np.int64))
    hi_i = int(pd.Timestamp(hi).to_datetime64()
               .astype("datetime64[D]").astype(np.int64))
    spine = np.arange(lo_i, hi_i + 1, dtype=np.int64)
    idx = np.searchsorted(day_i, spine, side="right") - 1
    vals = np.where(idx >= 0, wau[np.maximum(idx, 0)], 0)
    keep = vals > 0
    return pd.DataFrame({
        "report_day": spine[keep].astype("datetime64[D]")
                                 .astype("datetime64[us]"),
        "wau": vals[keep].astype("int64"),
    }).reset_index(drop=True)


def late_events(sf_dir: str, *, allowed_late_minutes: int = 5,
                range_size: int = 1024):
    """Event-time watermark + late-data tagging — a distributed PREFIX
    SCAN (running max over arrival order) without a global sort:

    1. range-partition by the dense arrival key (event_id // range_size);
    2. pass 1: per-range max(ts) — a tiny table — and an EXCLUSIVE prefix
       max over the range maxima on the driver (the scan's carry, one row
       per range);
    3. pass 2: per range, sort by event_id, vectorized cummax, combine
       with the carried offset.

    watermark(e) = max ts seen up to and including e in arrival order;
    an event is late iff its ts trails the watermark by more than
    ``allowed_late_minutes`` (it arrived after newer data). The same
    two-pass shape computes any associative scan (running sums, session
    carries) at any scale — the wire carries one carry value per range."""
    import numpy as np

    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("event_id", "ts"))

    def _bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(__rb=(b["event_id"] // range_size).astype("int64"))

    # two passes over the ranged rows (range maxima, then the scan):
    # materialize once instead of re-running the read per pass
    bucketed = ev.map_batches(_bucket, batch_format="pandas").materialize()

    stats = combine_partials_driver(bucketed, ["__rb"], {"mx": ("ts", "max")})
    stats = stats.sort_values("__rb").reset_index(drop=True)
    # exclusive prefix max: the carry entering each range
    carry_vals = stats["mx"].cummax().shift(1)
    carries = {int(rb): (None if pd.isna(c) else c.to_datetime64())
               for rb, c in zip(stats["__rb"], carry_vals)}

    late_us = np.timedelta64(allowed_late_minutes * 60 * 1_000_000, "us")

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort").reset_index(drop=True)
        wm = g["ts"].cummax().to_numpy()
        carry = carries.get(int(g["__rb"].iloc[0]))
        if carry is not None:
            wm = np.maximum(wm, np.datetime64(carry, "us"))
        return pd.DataFrame({
            "event_id": g["event_id"],
            "ts": g["ts"],
            "watermark": wm,
            "late": pd.array(g["ts"].to_numpy() < wm - late_us, dtype="bool"),
        })

    return key_map_groups(bucketed, _scan, key_col="__rb")


def rolling_avg_value(sf_dir: str, *, window: int = 7):
    """Trailing moving average per user (ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW): partition by user, mergesort by (ts, event_id),
    vectorized pandas rolling mean inside the group."""
    from ocr_agent_ray.functions.textstats import round_half_away

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket: one sort, C-speed groupby-rolling across all the
        # bucket's users (per-user map_groups pays pandas per-group setup)
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        avg = (g.groupby("user_id", sort=False)["value"]
               .rolling(window, min_periods=1).mean().to_numpy())
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "ts": g["ts"],
            "avg7_value": round_half_away(avg, 6),
        })

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id", "value"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _roll, num_buckets=64)


def association_rules(sf_dir: str):
    """Association-rule mining over event types: for each ordered pair
    (A, B), support = users doing both, confidence = P(B|A), and
    lift = P(AB) / (P(A)·P(B)) — the market-basket triple. Rides the
    co-occurrence fold plus a per-type distinct-user count (both tiny
    combines); total user count is one scalar fold."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver, distinct_rows

    pairs = distinct_rows(
        _read_events(sf_dir, ("user_id", "event_type")),
        ["user_id", "event_type"], num_buckets=8).materialize()
    per_type = combine_partials_driver(
        pairs, ["event_type"], {"n": ("user_id", "count")})
    type_users = dict(zip(per_type["event_type"],
                          per_type["n"].astype(float)))
    n_users = float(distinct_rows(pairs, ["user_id"], num_buckets=8)
                    .count())

    co = event_type_cooccurrence(sf_dir)
    rows = []
    for _, r in co.iterrows():
        for a, b in ((r["event_type_a"], r["event_type_b"]),
                     (r["event_type_b"], r["event_type_a"])):
            sup = float(r["n_users"])
            conf = sup / type_users[a]
            lift = (sup / n_users) / ((type_users[a] / n_users)
                                      * (type_users[b] / n_users))
            rows.append((a, b, int(sup),
                         float(round_half_away(conf, 6)),
                         float(round_half_away(lift, 6))))
    out = pd.DataFrame(rows, columns=["antecedent", "consequent",
                                      "support_users", "confidence",
                                      "lift"])
    return out.sort_values(["antecedent", "consequent"]).reset_index(
        drop=True)


def event_streaks(sf_dir: str):
    """Run-length (streak) distribution: lengths of consecutive
    same-type runs in each user's time-ordered event stream — the
    gaps-and-islands pattern as a whole-bucket kernel (one sort, one
    boundary cumsum, one C-speed size fold per bucket); the
    (event_type, streak_len) histogram is a tiny combine."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new = (g["user_id"].ne(g["user_id"].shift())
               | g["event_type"].ne(g["event_type"].shift()))
        sid = new.cumsum()
        runs = g.groupby(sid, sort=False).agg(
            event_type=("event_type", "first"),
            streak_len=("event_id", "size"))
        counts = (runs.groupby(["event_type", "streak_len"], sort=False)
                  .size().reset_index(name="n_streaks"))
        return counts

    parts = bucket_map_groups(
        _read_events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536),
        _streaks, num_buckets=64)
    out = combine_partials_driver(parts, ["event_type", "streak_len"],
                                  {"n_streaks": ("n_streaks", "sum")})
    out["streak_len"] = out["streak_len"].astype("int64")
    out["n_streaks"] = out["n_streaks"].astype("int64")
    return out.sort_values(["event_type", "streak_len"]).reset_index(
        drop=True)


def cohort_retention_matrix(sf_dir: str):
    """Full cohort-retention triangle: users grouped by first-seen week
    (the cohort), counted in every later week they were active —
    (cohort_week, week_offset, n_users). First-seen week is a bucketed
    min fold; activity weeks are bucketed distinct (user, week) pairs;
    the two join per user in the same bucket pass; the matrix itself is
    a tiny combine (weeks² keys)."""
    from ocr_agent_ray.pipelines.agg import (
        combine_partials_driver,
        distinct_rows,
        hash_partition_aggregate,
    )

    def _week(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"],
            "week": batch["ts"].dt.to_period("W").dt.start_time
            .astype("datetime64[us]"),
        })

    weeks = (_read_events(sf_dir, ("ts", "user_id"))
             .map_batches(_week, batch_format="pandas", batch_size=65536))
    pairs = distinct_rows(weeks, ["user_id", "week"],
                          num_buckets=8).materialize()
    first = hash_partition_aggregate(
        pairs, ["user_id"], {"cohort_week": ("week", "min")})

    from ocr_agent_ray.pipelines.joins import bucket_hash_join
    import pyarrow as pa_

    joined = bucket_hash_join(
        pairs, first, on="user_id",
        left_schema=pa_.schema([("user_id", pa_.int64()),
                                ("week", pa_.timestamp("us"))]),
        right_schema=pa_.schema([("user_id", pa_.int64()),
                                 ("cohort_week", pa_.timestamp("us"))]))

    def _offset(batch: pd.DataFrame) -> pd.DataFrame:
        off = ((batch["week"].astype("int64")
                - batch["cohort_week"].astype("int64"))
               // (7 * 86400 * 1_000_000)).astype("int64")
        return pd.DataFrame({"user_id": batch["user_id"],
                             "cohort_week": batch["cohort_week"],
                             "week_offset": off})

    out = combine_partials_driver(
        joined.map_batches(_offset, batch_format="pandas",
                           batch_size=65536),
        ["cohort_week", "week_offset"], {"n_users": ("user_id", "count")})
    out["n_users"] = out["n_users"].astype("int64")
    out["week_offset"] = out["week_offset"].astype("int64")
    out["cohort_week"] = out["cohort_week"].astype("datetime64[us]")
    return out.sort_values(["cohort_week", "week_offset"]).reset_index(
        drop=True)


def three_step_funnel(sf_dir: str):
    """Ordered 3-step funnel (view → click → purchase, strictly
    increasing timestamps): per-user greedy earliest-chain match —
    correct for existence because taking the EARLIEST view, then the
    first click after it, then the first purchase after that, finds a
    chain iff any exists. Whole-bucket kernel: per user three
    searchsorted probes over its ts segments. Returns one row:
    (n_step1, n_step2, n_step3) distinct-user counts."""

    def _chain(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        kind = g["event_type"].to_numpy()
        users, starts = np.unique(uid, return_index=True)
        bounds = np.append(starts, len(uid))
        s1 = s2 = s3 = 0
        for i in range(len(users)):
            s, e = bounds[i], bounds[i + 1]
            vts = us[s:e][kind[s:e] == "view"]
            if not len(vts):
                continue
            s1 += 1
            cts = us[s:e][kind[s:e] == "click"]
            j = np.searchsorted(cts, vts[0], side="right")
            if j >= len(cts):
                continue
            s2 += 1
            pts = us[s:e][kind[s:e] == "purchase"]
            k2 = np.searchsorted(pts, cts[j], side="right")
            if k2 < len(pts):
                s3 += 1
        return pd.DataFrame({"s1": [s1], "s2": [s2], "s3": [s3]})

    parts = bucket_map_groups(
        _read_events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536),
        _chain, num_buckets=64).to_pandas()
    return pd.DataFrame({
        "n_step1": [int(parts["s1"].sum())],
        "n_step2": [int(parts["s2"].sum())],
        "n_step3": [int(parts["s3"].sum())],
    })


def event_type_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every ordered pair of DISTINCT
    event types, how many users did both — the 'users who X also Y'
    table. Distinct (user, type) pairs fold bucketed; the in-bucket
    self-merge is bounded by |types|² per user; pair counts are a tiny
    driver combine (|types|² keys)."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver, distinct_rows

    pairs = distinct_rows(
        _read_events(sf_dir, ("user_id", "event_type")),
        ["user_id", "event_type"], num_buckets=8).materialize()

    def _cross(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch.merge(batch, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        return m[["user_id", "event_type_a", "event_type_b"]]

    # all of a user's (few) type rows must co-locate for the self-merge
    crossed = bucket_map_groups(
        pairs.map_batches(
            lambda b: b.assign(__b=(b["user_id"] % 16).astype("int32")),
            batch_format="pandas", batch_size=65536),
        lambda g: _cross(g.drop(columns="__b")), num_buckets=16)
    out = combine_partials_driver(
        crossed, ["event_type_a", "event_type_b"],
        {"n_users": ("user_id", "count")})
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["event_type_a", "event_type_b"]).reset_index(
        drop=True)


def cumulative_new_users(sf_dir: str):
    """Cumulative COUNT(DISTINCT users) by day — the growth curve.
    Window COUNT(DISTINCT) doesn't exist in SQL either; both sides use
    the same decomposition: first-seen day per user (a bucketed min
    fold), new-users per day (tiny combine), then a driver prefix sum
    over the calendar-bounded day table."""
    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": batch["user_id"],
                             "day": batch["ts"].dt.floor("D")})

    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    first = hash_partition_aggregate(
        _read_events(sf_dir, ("ts", "user_id")).map_batches(
            _day, batch_format="pandas", batch_size=65536),
        ["user_id"], {"first_day": ("day", "min")})
    # per-day new-user counts fold distributed; only the |days|-row
    # table reaches the driver (never the per-user table)
    per_day = combine_partials_driver(
        first, ["first_day"], {"new_users": ("user_id", "count")}
    ).rename(columns={"first_day": "day"})
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["cum_users"] = per_day["new_users"].cumsum().astype("int64")
    per_day["new_users"] = per_day["new_users"].astype("int64")
    per_day["day"] = per_day["day"].astype("datetime64[us]")
    return per_day


def incremental_daily_counts(sf_dir: str, *, split_id: int = 5000):
    """Materialized-view maintenance: per-day event counts kept
    incrementally — the 100-TB pattern where yesterday's aggregate is
    NOT recomputed when a new shard arrives. Here the 'stored view' is
    the aggregate of events below ``split_id`` and the 'new shard' is
    the rest; both fold as mergeable partials and the merge is a tiny
    same-key sum — equal by construction to the full recompute, which
    is exactly what the SQL oracle checks."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _day_filter(lo_excl: int | None, hi_incl: int | None):
        def _f(batch: pd.DataFrame) -> pd.DataFrame:
            m = pd.Series(True, index=batch.index)
            if lo_excl is not None:
                m &= batch["event_id"] >= lo_excl
            if hi_incl is not None:
                m &= batch["event_id"] < hi_incl
            b = batch[m]
            return pd.DataFrame({"day": b["ts"].dt.floor("D"),
                                 "event_id": b["event_id"]})
        return _f

    src = _read_events(sf_dir, ("ts", "event_id"))
    stored = combine_partials_driver(
        src.map_batches(_day_filter(None, split_id), batch_format="pandas",
                        batch_size=65536),
        ["day"], {"n_events": ("event_id", "count")})
    delta = combine_partials_driver(
        _read_events(sf_dir, ("ts", "event_id")).map_batches(
            _day_filter(split_id, None), batch_format="pandas",
            batch_size=65536),
        ["day"], {"n_events": ("event_id", "count")})
    merged = (pd.concat([stored, delta], ignore_index=True)
              .groupby("day", as_index=False)["n_events"].sum())
    merged["n_events"] = merged["n_events"].astype("int64")
    merged["day"] = merged["day"].astype("datetime64[us]")
    return merged.sort_values("day").reset_index(drop=True)


def trailing_hour_value_sum(sf_dir: str, *, hours: int = 1):
    """Time-RANGE window frame: per event, the sum of the user's values
    in the trailing ``hours`` (SUM OVER PARTITION BY user ORDER BY ts
    RANGE BETWEEN INTERVAL h PRECEDING AND CURRENT ROW — peers at the
    same ts are included, per RANGE semantics). Whole-bucket kernel:
    one sort, per user two vectorized searchsorteds over the user's ts
    segment + a cumsum difference."""
    from ocr_agent_ray.functions.textstats import round_half_away

    win_us = hours * 3600 * 1_000_000

    def _tsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        vals = g["value"].to_numpy(dtype=np.float64)
        uid = g["user_id"].to_numpy()
        users, starts = np.unique(uid, return_index=True)
        bounds = np.append(starts, len(uid))
        out = np.empty(len(g), dtype=np.float64)
        for i in range(len(users)):
            s, e = bounds[i], bounds[i + 1]
            seg_ts, seg_v = us[s:e], vals[s:e]
            cum = np.concatenate([[0.0], np.cumsum(seg_v)])
            # RANGE frame: start at ts - window (inclusive), end at the
            # LAST peer with the current ts (side='right')
            lo = np.searchsorted(seg_ts, seg_ts - win_us, side="left")
            hi = np.searchsorted(seg_ts, seg_ts, side="right")
            out[s:e] = cum[hi] - cum[lo]
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "trailing_sum": round_half_away(out, 6),
        })

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id", "value"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _tsum, num_buckets=64)


def event_window_ranks(sf_dir: str, *, range_width: float = 8.0):
    """ROW_NUMBER / RANK / DENSE_RANK OVER (PARTITION BY event_type
    ORDER BY value, event_id) — the per-partition window-rank family via
    agg.ranged_partitioned_ranks: rows range-partition on value (a hot
    event_type stays spread across all ranges), offsets per
    (range, event_type) fold on the driver, ranks are vectorized
    searchsorted/cumsum in-range."""
    from ocr_agent_ray.pipelines.agg import ranged_partitioned_ranks

    keyed = _read_events(sf_dir, ("event_id", "event_type", "value")).map_batches(
        lambda b: b.assign(__rb=(b["value"] // range_width).astype("int64")),
        batch_format="pandas", batch_size=65536)
    cols = ["event_id", "event_type", "value",
            "row_num", "rnk", "dense_rnk"]
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
        cols, ["int64", "object", "float64", "int64", "int64", "int64"])})

    ranked = ranged_partitioned_ranks(keyed, "event_type", "value", "event_id")
    return ranked.map_batches(
        lambda b: b[cols] if len(b) else empty, batch_format="pandas")


def value_percent_rank(sf_dir: str, *, range_width: float = 8.0):
    """PERCENT_RANK() OVER (ORDER BY value, event_id) — the global-window
    rank for score normalization, computed with the range-partition +
    driver-prefix-sum machinery (agg.ranged_global_rank): ranges come
    from value // range_width (order-consistent with the sort), counts
    fold on the driver, ranks are vectorized in-range. No global sort."""
    import numpy as np

    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import ranged_global_rank

    keyed = _read_events(sf_dir, ("event_id", "value")).map_batches(
        lambda b: b.assign(__rb=(b["value"] // range_width).astype("int64")),
        batch_format="pandas", batch_size=65536)

    total, ranked = ranged_global_rank(keyed, ["value", "event_id"])
    denom = max(total - 1, 1)

    def _pr(b: pd.DataFrame) -> pd.DataFrame:
        pr = (b["__rank"].to_numpy(dtype=np.float64) - 1.0) / denom
        return pd.DataFrame({
            "event_id": b["event_id"],
            "value": b["value"],
            "pct_rank": round_half_away(pr, 6),
        })

    return ranked.map_batches(_pr, batch_format="pandas")


def decayed_user_scores(sf_dir: str, *, half_rate: float = 0.1):
    """Recency-weighted per-user activity score:
    Σ value·exp(−rate·age_days) with age measured from the corpus
    max-timestamp — the feature-store 'decayed engagement' aggregate.
    The decay weight is a PURE PER-ROW transform, so the whole op is
    mergeable partials: one tiny driver fold for max(ts), one streaming
    pass computing weights, one bucketed hash-partition combine per
    user. Exactly the same float expression as the SQL oracle
    (microsecond-integer age / 86400e6, double exp), so rows agree
    bitwise and the per-user sum agrees after round-6."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    ev = _read_events(sf_dir, ("ts", "user_id", "value"))
    # driver fold for max(ts): per-batch max partials, tiny
    t_max = pd.concat(
        [b for b in ev.map_batches(
            lambda b: pd.DataFrame({"t": [b["ts"].max()]}),
            batch_format="pandas").iter_batches(
                batch_format="pandas", batch_size=None)],
        ignore_index=True)["t"].max()
    t_us = np.int64(pd.Timestamp(t_max).value // 1000)  # ns -> us

    def _weights(b: pd.DataFrame) -> pd.DataFrame:
        age_us = (np.int64(t_us)
                  - b["ts"].astype("int64").to_numpy())
        w = b["value"].to_numpy(dtype=np.float64) * np.exp(
            -half_rate * (age_us.astype(np.float64) / 86400000000.0))
        return pd.DataFrame({"user_id": b["user_id"], "w": w})

    out = hash_partition_aggregate(
        ev.map_batches(_weights, batch_format="pandas"),
        ["user_id"], {"decayed_score": ("w", "sum")}, num_buckets=32)

    def _round(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["decayed_score"] = round_half_away(b["decayed_score"], 6)
        return b[["user_id", "decayed_score"]]

    return out.map_batches(_round, batch_format="pandas")


def user_rfm(sf_dir: str):
    """Per-user RFM features (Recency / Frequency / Monetary) — the
    classic behavioral feature-engineering aggregate: per-batch per-user
    partials (max ts, event count, purchase-value sum) → bucketed
    hash-partition combine by user → recency computed against the
    broadcast global max timestamp as whole elapsed days
    (floor of the microsecond age, matching the oracle's integer
    division). Everything is mergeable partials; the per-user table is
    the only materialized state and it is O(users), never O(events)."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    ev = _read_events(sf_dir, ("ts", "user_id", "event_type", "value"))

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        pv = b["value"].to_numpy(dtype=np.float64) * (
            b["event_type"].to_numpy() == "purchase")
        g = pd.DataFrame({"user_id": b["user_id"], "ts": b["ts"], "pv": pv})
        return g.groupby("user_id", as_index=False).agg(
            last_ts=("ts", "max"), frequency=("ts", "size"),
            monetary=("pv", "sum"))

    per_user = hash_partition_aggregate(
        ev.map_batches(_partial, batch_format="pandas"),
        ["user_id"], {"last_ts": ("last_ts", "max"),
                      "frequency": ("frequency", "sum"),
                      "monetary": ("monetary", "sum")},
        num_buckets=32).materialize()

    t_max = pd.concat(
        [b for b in per_user.map_batches(
            lambda b: pd.DataFrame({"t": [b["last_ts"].max()]}),
            batch_format="pandas").iter_batches(
                batch_format="pandas", batch_size=None)],
        ignore_index=True)["t"].max()
    t_us = np.int64(pd.Timestamp(t_max).value // 1000)  # ns -> us

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        age_us = np.int64(t_us) - b["last_ts"].astype("int64").to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"],
            "recency_days": (age_us // 86_400_000_000).astype("int64"),
            "frequency": b["frequency"].astype("int64"),
            "monetary": round_half_away(b["monetary"].to_numpy(), 4),
        })

    return per_user.map_batches(_finish, batch_format="pandas")


def time_to_convert(sf_dir: str):
    """Per-user conversion latency: seconds from the user's FIRST 'view'
    to their FIRST 'purchase' at-or-after it (users with both only) —
    the attribution metric between the funnel ops and the window family.
    Min timestamps are mergeable partials: each batch emits per-user
    (first_view, first_purchase) minima, one bucketed combine folds
    them, and the latency math is a final vectorized map. No raw events
    on the wire past the first partial."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    ev = _read_events(sf_dir, ("ts", "user_id", "event_type"))

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("view", "purchase"))]
        g = (b.groupby(["user_id", "event_type"], sort=False)["ts"]
              .min().unstack())
        out = pd.DataFrame({
            "user_id": g.index.to_numpy(),
            "fv": g.get("view", pd.Series(pd.NaT, index=g.index)),
            "fp": g.get("purchase", pd.Series(pd.NaT, index=g.index)),
        }).reset_index(drop=True)
        return out

    folded = hash_partition_aggregate(
        ev.map_batches(_partial, batch_format="pandas"),
        ["user_id"], {"fv": ("fv", "min"), "fp": ("fp", "min")},
        num_buckets=32)

    def _latency(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["fv"].notna() & b["fp"].notna() & (b["fp"] >= b["fv"])]
        secs = ((b["fp"].astype("int64") - b["fv"].astype("int64"))
                .to_numpy(dtype=np.float64) / 1e6)
        return pd.DataFrame({
            "user_id": b["user_id"],
            "secs_to_convert": round_half_away(secs, 6),
        })

    return folded.map_batches(_latency, batch_format="pandas")


def customers_without_urgent_orders_anti(sf_dir: str):
    """Same semantics as customers_without_urgent_orders, via the
    LARGE-LARGE path: the urgent-custkey set stays a distributed Dataset
    (never driver-collected, never broadcast) and the exclusion is a
    bucketed anti join — the shape to use when the exclusion-key set
    outgrows the object store. Oracle-checked against the SAME SQL as
    the broadcast variant, so both plans must agree exactly."""
    import pyarrow.compute as pc

    from ocr_agent_ray.pipelines.agg import distinct_rows
    from ocr_agent_ray.pipelines.joins import bucket_anti_join
    from ocr_agent_ray.sources.readers import read_table

    urgent = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    urgent_keys = distinct_rows(urgent, ["o_custkey"]).map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas")

    customers = read_table(sf_dir, "customer",
                           ["c_custkey", "c_name", "c_acctbal"])
    import pyarrow as pa
    return bucket_anti_join(
        customers, urgent_keys, on="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_name", pa.string()),
                               ("c_acctbal", pa.float64())]))


def urgent_customers_semi(sf_dir: str):
    """Customers WITH at least one urgent order — the large-large SEMI
    plan (bucketed membership exchange, exclusion twin of
    customers_without_urgent_orders_anti), oracle-shared with the
    broadcast q_urgent_customers so both physical plans must agree."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_agent_ray.pipelines.agg import distinct_rows
    from ocr_agent_ray.pipelines.joins import bucket_semi_join
    from ocr_agent_ray.sources.readers import read_table

    urgent = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    urgent_keys = distinct_rows(urgent, ["o_custkey"]).map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas")

    customers = read_table(sf_dir, "customer",
                           ["c_custkey", "c_name", "c_acctbal"])
    return bucket_semi_join(
        customers, urgent_keys, on="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_name", pa.string()),
                               ("c_acctbal", pa.float64())]))


def views_before_purchase(sf_dir: str, *, window_minutes: int = 360,
                          num_buckets: int = 64):
    """Stream-stream interval join (the range-join shape Ray Data lacks):
    for every purchase event, the count of the same user's view events in
    the preceding ``window_minutes`` window [p.ts − W, p.ts), plus the
    microsecond gap to the most recent such view. Purchases with no view
    in the window drop out (inner-join semantics).

    Distributed as ONE hash exchange on user bucket; the per-bucket
    kernel is fully vectorized across users: both sides reduce to a
    composite int64 key (dense per-bucket user rank × (ts span + 2) +
    ts offset), so every purchase's window resolves in one pair of
    np.searchsorted calls — offsets never exceed the span, keys are
    strictly ordered within and across users, and the dense rank keeps
    the product far below 2^63 for any realistic per-bucket user count
    (guarded explicitly; the remedy is more buckets).

    Columns: event_id, user_id, n_views, last_gap_us.
    """
    W = np.int64(window_minutes) * np.int64(60_000_000)

    def _key(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["view", "purchase"])]
        return b.assign(__b=(b["user_id"] % num_buckets).astype("int32"))

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "n_views": pd.Series(dtype="int64"),
            "last_gap_us": pd.Series(dtype="int64")})
        if not len(g):
            return empty
        # normalize to µs regardless of the frame's datetime unit
        t = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        is_p = (g["event_type"] == "purchase").to_numpy()
        uu, dense = np.unique(u, return_inverse=True)
        tmin = t.min()
        stride = np.int64(t.max() - tmin) + np.int64(2)
        if int(len(uu)) * int(stride) >= 2 ** 63:
            raise OverflowError(
                "interval-join composite key overflow: raise num_buckets")
        enc = dense.astype(np.int64) * stride + (t - tmin)
        v_enc = np.sort(enc[~is_p])
        p_enc = enc[is_p]
        base = (p_enc // stride) * stride
        off = p_enc - base
        lo = np.searchsorted(v_enc, base + np.maximum(off - W, 0),
                             side="left")
        hi = np.searchsorted(v_enc, p_enc, side="left")
        n = hi - lo
        keep = n > 0
        if not keep.any():
            return empty
        gap = p_enc[keep] - v_enc[hi[keep] - 1]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_p][keep],
            "user_id": u[is_p][keep].astype("int64"),
            "n_views": n[keep].astype("int64"),
            "last_gap_us": gap.astype("int64"),
        })

    keyed = _read_events(
        sf_dir, columns=("event_id", "ts", "user_id", "event_type")) \
        .map_batches(_key, batch_format="pandas", batch_size=65536)
    return bucket_map_groups(keyed, _join, num_buckets=num_buckets)


def scd2_intervals(sf_dir: str):
    """SCD Type-2 history build from the event log: per user, collapse
    consecutive runs of the same event_type into validity intervals
    (valid_from = run start, valid_to = next run's start, NULL while
    current) — the warehouse dimension-history shape, derived here from
    a raw stream in one user-bucket exchange. The per-bucket kernel is
    one sort + two vectorized shift-compares; no per-row loop, no
    driver state. Ties on ts break by event_id on both sides.
    Columns: user_id, event_type, valid_from, valid_to."""

    def _runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        new_user = g["user_id"].ne(g["user_id"].shift())
        change = new_user | g["event_type"].ne(g["event_type"].shift())
        s = g[change].reset_index(drop=True)
        nxt_from = s["ts"].shift(-1)
        nxt_user = s["user_id"].shift(-1)
        valid_to = nxt_from.where(nxt_user == s["user_id"])
        return pd.DataFrame({
            "user_id": s["user_id"],
            "event_type": s["event_type"],
            "valid_from": s["ts"],
            "valid_to": valid_to,
        })

    keyed = _read_events(
        sf_dir, columns=("event_id", "ts", "user_id", "event_type")
    ).map_batches(
        lambda b: b.assign(__b=(b["user_id"] % 64).astype("int32")),
        batch_format="pandas", batch_size=65536)
    return bucket_map_groups(keyed, _runs, num_buckets=64)


def user_survival_curve(sf_dir: str, *, censor_days: int = 3):
    """Kaplan-Meier survival curve of user lifetimes — the churn
    analysis every consumer warehouse runs: lifetime = days between a
    user's first and last event; users still active within
    ``censor_days`` of the corpus max timestamp are right-censored
    (they count in the at-risk set but not as deaths). S(t) =
    exp(Σ_{t'≤t} ln(1 − d/n)) over death days t.

    Scale shape: per-user (first, last) fold as mergeable min/max
    partials through one bucketed combine; the curve itself lives on
    |distinct lifetime days| rows — a driver fold like every other
    dimension-sized result. The float expression (ln/exp cumulative)
    is written identically to the oracle. Columns: t_day, n_risk,
    deaths, survival."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, columns=("ts", "user_id"))
    per_user = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "user_id": b["user_id"],
            "first_ts": b["ts"], "last_ts": b["ts"]}),
            batch_format="pandas", batch_size=65536),
        ["user_id"],
        {"first_ts": ("first_ts", "min"), "last_ts": ("last_ts", "max")},
        num_buckets=16)

    # corpus max ts: tiny mergeable fold
    t_max = pd.concat(
        [b for b in ev.map_batches(
            lambda b: pd.DataFrame({"t": [b["ts"].max()]}),
            batch_format="pandas").iter_batches(
                batch_format="pandas", batch_size=None)],
        ignore_index=True)["t"].max()

    def _lifetimes(b: pd.DataFrame) -> pd.DataFrame:
        t_days = ((b["last_ts"].astype("datetime64[us]").astype("int64")
                   - b["first_ts"].astype("datetime64[us]")
                   .astype("int64")) // 86400000000).astype("int64")
        age_us = (np.int64(pd.Timestamp(t_max).value // 1000)
                  - b["last_ts"].astype("datetime64[us]")
                  .astype("int64").to_numpy())
        censored = age_us < censor_days * 86400000000
        return pd.DataFrame({"t_day": t_days,
                             "censored": censored.astype("int64"),
                             "n": np.int64(1)})

    counts = combine_partials_driver(
        per_user.map_batches(_lifetimes, batch_format="pandas"),
        ["t_day", "censored"], {"n": ("n", "sum")})
    counts = counts.sort_values("t_day").reset_index(drop=True)

    total = int(counts["n"].sum())
    days = np.sort(counts["t_day"].unique())
    d = (counts[counts["censored"] == 0].groupby("t_day")["n"].sum()
         .reindex(days, fill_value=0).to_numpy(dtype=np.float64))
    all_at_t = (counts.groupby("t_day")["n"].sum()
                .reindex(days, fill_value=0).to_numpy(dtype=np.float64))
    # at-risk just before t: total minus everyone who left earlier
    left_before = np.r_[0.0, np.cumsum(all_at_t)[:-1]]
    n_risk = total - left_before
    surv = np.exp(np.cumsum(np.log(1.0 - d / n_risk)))
    return pd.DataFrame({
        "t_day": days.astype("int64"),
        "n_risk": n_risk.astype("int64"),
        "deaths": d.astype("int64"),
        "survival": round_half_away(surv, 6),
    })


def top_event_paths(sf_dir: str, *, k: int = 20):
    """Top-k event-type TRIGRAM paths (per-user consecutive triples,
    ordered by (ts, event_id)) — the sequence-mining extension of the
    bigram transition matrix: 'what do users actually do in threes?'.
    One user-bucket exchange; the kernel is two shift-compares; triple
    counts fold as |types|³-bounded partials on the driver. Columns:
    e1, e2, e3, n (ties broken by path ascending)."""
    from ocr_agent_ray.functions.textstats import round_half_away  # noqa: F401
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    def _triples(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        same2 = g["user_id"].eq(g["user_id"].shift(2))
        t = pd.DataFrame({
            "e1": g["event_type"].shift(2),
            "e2": g["event_type"].shift(1),
            "e3": g["event_type"],
        })[same2.to_numpy()]
        out = (t.groupby(["e1", "e2", "e3"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    keyed = _read_events(
        sf_dir, columns=("event_id", "ts", "user_id", "event_type")
    ).map_batches(
        lambda b: b.assign(__b=(b["user_id"] % 64).astype("int32")),
        batch_format="pandas", batch_size=65536)
    folded = combine_partials_driver(
        bucket_map_groups(keyed, _triples, num_buckets=64),
        ["e1", "e2", "e3"], {"n": ("n", "sum")})
    folded["n"] = folded["n"].astype("int64")
    return (folded.sort_values(["n", "e1", "e2", "e3"],
                               ascending=[False, True, True, True])
            .head(k).reset_index(drop=True))


def rolling_median_value(sf_dir: str, *, window: int = 7):
    """Trailing moving MEDIAN per user — the order-statistic sibling of
    rolling_avg_value (robust to the value spikes the mean smears).
    Same one user-bucket exchange; the kernel is a C-speed
    groupby-rolling median. pandas' rolling median and SQL
    quantile_cont(0.5) use the same linear-interpolation rule, and
    round-6 absorbs their (a+b)/2 vs a+(b−a)·0.5 last-ulp difference.
    Columns: user_id, event_id, ts, med7_value."""
    from ocr_agent_ray.functions.textstats import round_half_away

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        med = (g.groupby("user_id", sort=False)["value"]
               .rolling(window, min_periods=1).median().to_numpy())
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "ts": g["ts"],
            "med7_value": round_half_away(med, 6),
        })

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id", "value"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _roll, num_buckets=64)


def markov_next_event(sf_dir: str):
    """Next-event prediction from a first-order Markov model: the global
    event-type transition matrix (event_transitions — |types|² driver
    rows) argmaxed per prev_type, applied to every user's LAST event
    (last_event_per_user — bucketed top-1). The composed shape checks
    second-order stage interaction the way curation_funnel does for the
    text stack: the SQL twin rebuilds BOTH stages and must agree on
    (user, last_type, prediction, confidence).

    confidence = n(prev→pred) / Σ_next n(prev→next), ROUND(·,6); argmax
    ties break next_type-ascending (pinned in the twin). Users whose
    last event type was never observed as a transition source are
    dropped on both sides (inner-join semantics: no evidence, no
    prediction). The model is a broadcast scalar map at any corpus
    size; only the per-user top-1 shuffles."""
    trans = event_transitions(sf_dir)
    if trans.empty:
        return pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "last_type": pd.Series(dtype="object"),
            "pred_next_type": pd.Series(dtype="object"),
            "confidence": pd.Series(dtype="float64")})
    from ocr_agent_ray.functions.textstats import round_half_away

    tot = trans.groupby("prev_type")["n"].transform("sum")
    trans["confidence"] = round_half_away(
        trans["n"].to_numpy(dtype=np.float64)
        / tot.to_numpy(dtype=np.float64), 6)
    best = (trans.sort_values(["prev_type", "n", "next_type"],
                              ascending=[True, False, True])
            .drop_duplicates("prev_type", keep="first"))
    pred = dict(zip(best["prev_type"], best["next_type"]))
    conf = dict(zip(best["prev_type"], best["confidence"]))

    def _apply(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(pred.keys())
        b = b[m]
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "last_type": b["event_type"],
            "pred_next_type": b["event_type"].map(pred),
            "confidence": b["event_type"].map(conf).astype("float64"),
        })

    return last_event_per_user(sf_dir).map_batches(
        _apply, batch_format="pandas", batch_size=65536)


def ewma_user_value(sf_dir: str, *, alpha: float = 0.1,
                    num_buckets: int = 64):
    """Per-user exponentially weighted moving average of ``value`` —
    the streaming smoother behind rate limiting / anomaly thresholds.
    Recurrence s_1 = x_1, s_t = α·x_t + (1−α)·s_{t−1}, evaluated with
    the prefix-sum closed form so the whole user history is one
    vectorized pass (no sequential Python loop):

        u_i = x_i · β^(−i)         (β = 1−α)
        s_t = β^t · (α·(Σ_{i≤t} u_i − u_1) + x_1/β)

    The SQL twin evaluates the IDENTICAL float expression (same
    literals, same op order), so ROUND(·,6) hash-matches. β^(−i) grows
    exponentially with per-user history length — at α = 0.1 the factor
    is ~3.4e4 at the corpus' deepest history (~100 events/user) and the
    closed form is numerically exact to ~1e-13 relative; histories
    thousands deep need a segmented restart (split the prefix sum every
    k rows), which changes no public shape. One hash exchange on
    user_id; whole-bucket C-speed groupby kernels."""
    from ocr_agent_ray.functions.textstats import round_half_away

    beta = 1.0 - alpha

    def _ewma(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        r = (g.groupby("user_id", sort=False).cumcount() + 1) \
            .to_numpy(dtype=np.float64)
        x = g["value"].to_numpy(dtype=np.float64)
        u = x * np.power(beta, -r)
        g["__u"] = u
        grp = g.groupby("user_id", sort=False)
        cum = grp["__u"].cumsum().to_numpy(dtype=np.float64)
        u1 = grp["__u"].transform("first").to_numpy(dtype=np.float64)
        x1 = grp["value"].transform("first").to_numpy(dtype=np.float64)
        ewma = np.power(beta, r) * (alpha * (cum - u1) + x1 / beta)
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "ts": g["ts"],
            "value": g["value"],
            "ewma": round_half_away(ewma, 6),
        })

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id", "value"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % num_buckets).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _ewma, num_buckets=num_buckets)


def event_throttle(sf_dir: str, *, gap_minutes: int = 10,
                   num_buckets: int = 64):
    """Streaming throttle / rate-limit dedup: per user, keep an event
    iff ≥ ``gap_minutes`` have passed since the last KEPT event — the
    genuinely SEQUENTIAL dedup semantics (each decision depends on the
    previous decision, not the previous row, so no window function
    expresses it; the SQL twin needs a recursive CTE). The classic
    guard against client retry storms and duplicate webhooks.

    One hash exchange on user_id; inside a bucket each user's chain is
    walked with one ``searchsorted`` jump PER KEPT EVENT — work is
    O(output), not O(input), so a retry storm of a million suppressed
    duplicates costs one binary search. Ties at equal ts break
    event_id-ascending, same as the twin. Output: (user_id, event_id,
    ts) of kept events."""
    gap_us = np.int64(gap_minutes) * 60_000_000

    def _throttle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        users = g["user_id"].to_numpy()
        starts = np.r_[0, np.flatnonzero(users[1:] != users[:-1]) + 1]
        ends = np.r_[starts[1:], len(users)]
        keep_idx = []
        for s, e in zip(starts, ends):
            i = s
            while i < e:
                keep_idx.append(i)
                i = s + np.searchsorted(ts[s:e], ts[i] + gap_us,
                                        side="left")
        idx = np.asarray(keep_idx, dtype=np.int64)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[idx],
            "event_id": g["event_id"].to_numpy()[idx],
            "ts": g["ts"].to_numpy()[idx]})

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % num_buckets).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _throttle, num_buckets=num_buckets)


def psi_value_drift(sf_dir: str, *, n_bins: int = 10):
    """Population Stability Index between the first and second half of
    the stream (split at the midpoint timestamp) over fixed-width
    ``value`` bins — the standard drift screen for "did the
    distribution my model sees move". Two tiny folds (global
    min/max ts+value, then per-(half, bin) counts — ≤ 2·n_bins keys, a
    bounded dimension) and a driver-side closing expression, identical
    float-for-float to the SQL twin: p = (c+0.5)/(n+5.0) Laplace
    smoothing, term = (p−q)·ln(p/q), ROUND(·,6). Output one row per
    bin: (bucket, n_first, n_second, psi_term)."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts", "value"))
    bounds = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "__k": np.int64(0),
            "tmin": [b["ts"].min()], "tmax": [b["ts"].max()],
            "vmin": [b["value"].min()], "vmax": [b["value"].max()]}),
            batch_format="pandas", batch_size=65536),
        ["__k"], {"tmin": ("tmin", "min"), "tmax": ("tmax", "max"),
                  "vmin": ("vmin", "min"), "vmax": ("vmax", "max")})
    if bounds.empty:
        return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                             "n_first": pd.Series(dtype="int64"),
                             "n_second": pd.Series(dtype="int64"),
                             "psi_term": pd.Series(dtype="float64")})
    tmin = np.int64(pd.Timestamp(bounds["tmin"].iloc[0]).value // 1000)
    tmax = np.int64(pd.Timestamp(bounds["tmax"].iloc[0]).value // 1000)
    vmin = float(bounds["vmin"].iloc[0])
    vmax = float(bounds["vmax"].iloc[0])
    mid = tmin + (tmax - tmin) // 2
    width = max((vmax - vmin) / float(n_bins), 1e-12)

    def _cells(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        v = b["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "bucket": np.minimum(np.floor((v - vmin) / width),
                                 n_bins - 1).astype(np.int64),
            "half": (us >= mid).astype(np.int64),
            "n": np.int64(1)})

    cells = combine_partials_driver(
        ev.map_batches(_cells, batch_format="pandas", batch_size=65536),
        ["bucket", "half"], {"n": ("n", "sum")})
    grid = pd.DataFrame({"bucket": np.arange(n_bins, dtype=np.int64)})
    c0 = cells[cells["half"] == 0][["bucket", "n"]].rename(
        columns={"n": "n_first"})
    c1 = cells[cells["half"] == 1][["bucket", "n"]].rename(
        columns={"n": "n_second"})
    out = grid.merge(c0, on="bucket", how="left") \
              .merge(c1, on="bucket", how="left").fillna(0)
    n_first = out["n_first"].to_numpy(dtype=np.float64)
    n_second = out["n_second"].to_numpy(dtype=np.float64)
    tot1, tot2 = n_first.sum(), n_second.sum()
    p = (n_first + 0.5) / (tot1 + 5.0)
    q = (n_second + 0.5) / (tot2 + 5.0)
    out["n_first"] = out["n_first"].astype("int64")
    out["n_second"] = out["n_second"].astype("int64")
    out["psi_term"] = round_half_away((p - q) * np.log(p / q), 6)
    return out


def nearest_event_join(sf_dir: str, *, num_buckets: int = 64):
    """Bidirectional temporal NEAREST-NEIGHBOR join: for every purchase
    event, the same user's closest non-purchase event by |ts diff| —
    the "what happened around the conversion" enrichment. Distinct from
    the as-of join (backward-only) and the interval join (bounded
    window): the nearest neighbor may sit on either side and is
    unbounded.

    One hash exchange on user bucket; the kernel is fully vectorized
    across users via the composite int64 key (dense user rank × span
    stride + ts offset, the ``views_before_purchase`` encoding): each
    purchase resolves with two ``searchsorted`` probes (candidate
    before / candidate after) plus one run-start probe so ties land on
    the lowest event_id at the winning timestamp. Tie between equal
    gaps breaks to the EARLIER event (then event_id asc) — the exact
    ORDER BY (gap, ts, event_id) rule of the SQL twin. Purchases whose
    user has no non-purchase events drop (inner semantics).

    Columns: user_id, purchase_event_id, nearest_event_id, gap_us.
    """

    def _key(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(__b=(b["user_id"] % num_buckets).astype("int32"))

    def _nearest(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "purchase_event_id": pd.Series(dtype="int64"),
            "nearest_event_id": pd.Series(dtype="int64"),
            "gap_us": pd.Series(dtype="int64")})
        if not len(g):
            return empty
        t = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        u = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy().astype("int64")
        is_p = (g["event_type"] == "purchase").to_numpy()
        uu, dense = np.unique(u, return_inverse=True)
        tmin = t.min()
        stride = np.int64(t.max() - tmin) + np.int64(2)
        if int(len(uu)) * int(stride) >= 2 ** 63:
            raise OverflowError(
                "nearest-join composite key overflow: raise num_buckets")
        enc = dense.astype(np.int64) * stride + (t - tmin)
        # others sorted by (enc, event_id): equal-ts runs are event_id asc
        o_order = np.lexsort((eid[~is_p], enc[~is_p]))
        o_enc = enc[~is_p][o_order]
        o_eid = eid[~is_p][o_order]
        p_enc = enc[is_p]
        if not len(p_enc) or not len(o_enc):
            return empty
        p_user = p_enc // stride
        i = np.searchsorted(o_enc, p_enc, side="left")
        # after candidate: first other with enc >= p (run start by constr.)
        va = i < len(o_enc)
        ia = np.minimum(i, len(o_enc) - 1)
        va &= (o_enc[ia] // stride) == p_user
        gap_a = np.where(va, o_enc[ia] - p_enc, np.int64(0))
        # before candidate: last other with enc < p; jump to its run start
        vb = i > 0
        ib = np.maximum(i - 1, 0)
        vb &= (o_enc[ib] // stride) == p_user
        gap_b = np.where(vb, p_enc - o_enc[ib], np.int64(0))
        jb = np.searchsorted(o_enc, o_enc[ib], side="left")
        keep = va | vb
        # after wins only on strictly smaller gap; ties go to the
        # earlier (before) candidate = ORDER BY gap, ts, event_id
        pick_a = va & (~vb | (gap_a < gap_b))
        idx = np.where(pick_a, ia, jb)
        gap = np.where(pick_a, gap_a, gap_b)
        return pd.DataFrame({
            "user_id": u[is_p][keep].astype("int64"),
            "purchase_event_id": eid[is_p][keep],
            "nearest_event_id": o_eid[idx[keep]],
            "gap_us": gap[keep].astype("int64")})

    keyed = _read_events(
        sf_dir, columns=("event_id", "ts", "user_id", "event_type")) \
        .map_batches(_key, batch_format="pandas", batch_size=65536)
    return bucket_map_groups(keyed, _nearest, num_buckets=num_buckets)


def _daily_counts_driver(sf_dir: str) -> pd.DataFrame:
    """Per-day event counts folded to the driver — the bounded series
    (one row per calendar day, a dimension not a fact) behind the
    time-series screens below. Mergeable count partials per batch, one
    small combine; the events table itself never materializes."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts",))
    days = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "day": b["ts"].dt.floor("D"), "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["day"], {"c": ("c", "sum")})
    if days.empty:
        return pd.DataFrame({"day": pd.Series(dtype="datetime64[us]"),
                             "c": pd.Series(dtype="int64")})
    days = days.sort_values("day").reset_index(drop=True)
    days["c"] = days["c"].astype("int64")
    return days


def daily_autocorr(sf_dir: str, *, max_lag: int = 7):
    """Autocorrelation function of the daily event-count series at lags
    1..``max_lag`` — the seasonality/persistence screen (a weekly cycle
    shows as a lag-7 spike). Pairs are formed on OBSERVED days exactly
    ``k`` calendar days apart (missing days form no pair — identical
    inner-join semantics in the twin), and the Pearson r per lag closes
    from integer sums so everything before the final division is exact:

        r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))

    Output: (lag, n_pairs, autocorr), one row per lag with ≥1 pair and
    a nonzero denominator."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    day_i = days["day"].to_numpy().astype("datetime64[D]").astype("int64")
    c = days["c"].to_numpy()
    pos = {int(d): j for j, d in enumerate(day_i)}
    out = []
    for k in range(1, max_lag + 1):
        j2 = np.array([pos.get(int(d) + k, -1) for d in day_i],
                      dtype=np.int64)
        m = j2 >= 0
        x = c[m].astype(np.int64)
        y = c[j2[m]].astype(np.int64)
        n = np.int64(len(x))
        if n == 0:
            continue
        num = n * np.sum(x * y) - np.sum(x) * np.sum(y)
        d1 = n * np.sum(x * x) - np.sum(x) * np.sum(x)
        d2 = n * np.sum(y * y) - np.sum(y) * np.sum(y)
        den = np.sqrt(np.float64(d1) * np.float64(d2))
        if den == 0.0:
            continue
        out.append((np.int64(k), n,
                    float(round_half_away(np.float64(num) / den, 6))))
    return pd.DataFrame(out, columns=["lag", "n_pairs", "autocorr"]) \
        .astype({"lag": "int64", "n_pairs": "int64"})


def theil_sen_trend(sf_dir: str):
    """Theil–Sen robust trend of the daily event-count series: the
    MEDIAN over all pairwise slopes (c_j − c_i)/(day_j − day_i), i<j —
    the estimator that shrugs off outlier days where OLS
    (``value_time_regression``) folds. Intercept = median(c_i −
    slope·day_i) with day measured in days since the first observed
    day, using the UNROUNDED slope (same nesting as the twin). The
    daily series is a bounded dimension (one row per calendar day), so
    the O(days²) pair sweep closes on the driver after one mergeable
    count fold. Output: one row (n_days, n_pairs, slope, intercept)."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    if days.empty:
        return pd.DataFrame({"n_days": pd.Series(dtype="int64"),
                             "n_pairs": pd.Series(dtype="int64"),
                             "slope": pd.Series(dtype="float64"),
                             "intercept": pd.Series(dtype="float64")})
    day_i = days["day"].to_numpy().astype("datetime64[D]").astype("int64")
    idx = (day_i - day_i[0]).astype(np.float64)
    c = days["c"].to_numpy().astype(np.float64)
    di = idx[None, :] - idx[:, None]
    iu = np.triu_indices(len(idx), k=1)
    slopes = (c[None, :] - c[:, None])[iu] / di[iu]
    slope = float(np.median(slopes))
    intercept = float(np.median(c - slope * idx))
    return pd.DataFrame({
        "n_days": [np.int64(len(idx))],
        "n_pairs": [np.int64(len(slopes))],
        "slope": [float(round_half_away(np.float64(slope), 6))],
        "intercept": [float(round_half_away(np.float64(intercept), 6))]})


def dow_seasonality(sf_dir: str):
    """Day-of-week seasonal profile of the event stream: for each
    weekday (0=Monday, ISO−1 — pinned explicitly because pandas
    ``dayofweek`` and DuckDB ``dayofweek`` disagree on the week
    start), the mean daily count over days of that weekday divided by
    the overall mean daily count. Index > 1 = busy weekday. Same
    bounded daily fold as the ACF; float expression is
    (sum/n)/(tot/n_tot), identical literal order in the twin.
    Output: (dow, n_days, n_events, seasonal_index)."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    if days.empty:
        return pd.DataFrame({"dow": pd.Series(dtype="int64"),
                             "n_days": pd.Series(dtype="int64"),
                             "n_events": pd.Series(dtype="int64"),
                             "seasonal_index": pd.Series(dtype="float64")})
    days["dow"] = days["day"].dt.dayofweek.astype("int64")
    tot_c = np.float64(days["c"].sum())
    tot_d = np.float64(len(days))
    g = days.groupby("dow", sort=True).agg(
        n_days=("c", "size"), n_events=("c", "sum")).reset_index()
    si = (g["n_events"].to_numpy(np.float64)
          / g["n_days"].to_numpy(np.float64)) / (tot_c / tot_d)
    g["n_days"] = g["n_days"].astype("int64")
    g["n_events"] = g["n_events"].astype("int64")
    g["seasonal_index"] = round_half_away(si, 6)
    return g


def cusum_changepoint(sf_dir: str):
    """Per-event-type mean-shift changepoint over the daily count
    series — the CUSUM estimator (Page 1954 / Pettitt's location form):
    with S_t = Σ_{i≤t} c_i − t·mean, the changepoint is the day
    maximizing |S_t| over t < n (the last index is excluded — S_n ≈ 0
    by construction and an "after" side must exist). A drift in the
    event rate shows as a V in S_t whose vertex is the shift day.

    Distributed shape: ONE mergeable (event_type, day) count fold —
    the series is a bounded dimension (#types × calendar days), so the
    per-type argmax closes on the driver; at 100 TB the fold output is
    the same bounded table. Float discipline pinned to the twin:
    S_t = CAST(cumsum AS DOUBLE) − CAST(t AS DOUBLE)·mean with
    mean = CAST(total AS DOUBLE)/n, means as exact-int sums / counts;
    ties on |S_t| break to the earliest day (numpy argmax = first max,
    twin orders by abs DESC, day ASC). Types with a single observed
    day are dropped (no split exists — the twin's t < n filter drops
    them identically). Columns: event_type, change_day, cusum_stat,
    mean_before, mean_after, n_days."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts", "event_type"))
    days = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["ts"].dt.floor("D"), "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["event_type", "day"], {"c": ("c", "sum")})
    cols = ["event_type", "change_day", "cusum_stat",
            "mean_before", "mean_after", "n_days"]
    if days.empty:
        return pd.DataFrame({
            "event_type": pd.Series(dtype="object"),
            "change_day": pd.Series(dtype="datetime64[us]"),
            "cusum_stat": pd.Series(dtype="float64"),
            "mean_before": pd.Series(dtype="float64"),
            "mean_after": pd.Series(dtype="float64"),
            "n_days": pd.Series(dtype="int64")})
    rows = []
    for et, g in days.groupby("event_type", sort=True):
        g = g.sort_values("day")
        cnt = g["c"].to_numpy(np.int64)
        n = len(cnt)
        if n < 2:
            continue
        mean = np.float64(cnt.sum()) / np.float64(n)
        t = np.arange(1, n, dtype=np.float64)  # t = 1..n-1 (< n)
        dev = np.cumsum(cnt)[:-1].astype(np.float64) - t * mean
        adev = np.abs(dev)
        i = int(np.argmax(adev))  # first max = earliest day on ties
        before = np.float64(cnt[:i + 1].sum()) / np.float64(i + 1)
        after = np.float64(cnt[i + 1:].sum()) / np.float64(n - i - 1)
        rows.append((et, g["day"].iloc[i],
                     float(round_half_away(adev[i], 6)),
                     float(round_half_away(before, 6)),
                     float(round_half_away(after, 6)),
                     np.int64(n)))
    out = pd.DataFrame(rows, columns=cols)
    return out.astype({"n_days": "int64"}).reset_index(drop=True)


def ab_test_zscore(sf_dir: str, *, convert_type: str = "purchase"):
    """Two-proportion z-test between deterministic experiment arms —
    the experimentation primitive over the event stream: users are
    assigned arm = user_id % 2 (a hash-stable split), a user CONVERTS
    iff they have ≥1 ``convert_type`` event, and the pooled two-
    proportion z statistic tests p_b − p_a:

        z = (p_b − p_a) / sqrt(pp·(1−pp)·(1/n_a + 1/n_b)),
        pp = (c_a + c_b) / (n_a + n_b)

    Distributed shape: per-user conversion folds as a bucketed
    MAX aggregate over (user_id) — users are unbounded, so the fold is
    hash-partitioned, and only the TWO arm rows reach the driver.
    Float expression order identical in the twin (counts stay exact
    ints until the final divisions). Columns: n_a, n_b, conv_a,
    conv_b, p_a, p_b, lift, z_score."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, ("user_id", "event_type"))
    per_user = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "conv": (b["event_type"] == convert_type).astype("int64")}),
            batch_format="pandas", batch_size=65536),
        ["user_id"], {"converted": ("conv", "max")})
    arms = combine_partials_driver(
        per_user.map_batches(lambda b: pd.DataFrame({
            "arm": b["user_id"].to_numpy(np.int64) % 2,
            "n": np.int64(1),
            "c": b["converted"].astype("int64")}),
            batch_format="pandas"),
        ["arm"], {"n": ("n", "sum"), "c": ("c", "sum")})
    arms = arms.sort_values("arm")
    n_a, n_b = (np.int64(x) for x in arms["n"].to_numpy())
    c_a, c_b = (np.int64(x) for x in arms["c"].to_numpy())
    p_a = np.float64(c_a) / np.float64(n_a)
    p_b = np.float64(c_b) / np.float64(n_b)
    pp = np.float64(c_a + c_b) / np.float64(n_a + n_b)
    se = np.sqrt(pp * (1.0 - pp)
                 * (1.0 / np.float64(n_a) + 1.0 / np.float64(n_b)))
    z = (p_b - p_a) / se if se > 0 else np.float64(0.0)
    return pd.DataFrame({
        "n_a": [n_a], "n_b": [n_b], "conv_a": [c_a], "conv_b": [c_b],
        "p_a": [float(round_half_away(p_a, 6))],
        "p_b": [float(round_half_away(p_b, 6))],
        "lift": [float(round_half_away(p_b - p_a, 6))],
        "z_score": [float(round_half_away(z, 6))]})


def seasonal_decompose_daily(sf_dir: str, *, period: int = 7):
    """Additive seasonal decomposition of the daily event-count series
    (classical decomposition, the STL-lite every monitoring stack
    runs): on the GAPFILLED day grid (missing days count 0, mirroring
    ``daily_counts_gapfilled``), trend_t = centered ``period``-day
    moving average (full windows only), seasonal = per-day-of-week
    mean of (x − trend), residual = x − trend − seasonal. Emits only
    days with a full centered window so no nullable floats cross the
    hash. Same bounded daily fold as the other screens — the series
    is a calendar-sized dimension; float expressions (win_sum/7.0,
    Σdet/cnt) are written in the twin's exact order. Columns: day,
    cnt, trend, seasonal, residual."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    cols = ["day", "cnt", "trend", "seasonal", "residual"]
    if len(days) < period:
        return pd.DataFrame({
            "day": pd.Series(dtype="datetime64[us]"),
            "cnt": pd.Series(dtype="int64"),
            "trend": pd.Series(dtype="float64"),
            "seasonal": pd.Series(dtype="float64"),
            "residual": pd.Series(dtype="float64")})
    # gapfill to the full calendar grid (missing days = 0)
    grid = pd.date_range(days["day"].min(), days["day"].max(),
                         freq="D")
    x = days.set_index("day")["c"].reindex(grid, fill_value=0) \
        .to_numpy(np.int64)
    n = len(x)
    half = period // 2
    csum = np.concatenate([[0], np.cumsum(x)])
    t_idx = np.arange(half, n - half)
    trend = (csum[t_idx + half + 1] - csum[t_idx - half]) \
        .astype(np.float64) / np.float64(period)
    det = x[t_idx].astype(np.float64) - trend
    dow = pd.DatetimeIndex(grid).dayofweek.to_numpy()[t_idx]
    seasonal_mean = {}
    for d in range(7):
        m = dow == d
        if m.any():
            seasonal_mean[d] = det[m].sum() / np.float64(m.sum())
    seasonal = np.array([seasonal_mean[d] for d in dow])
    resid = x[t_idx].astype(np.float64) - trend - seasonal
    return pd.DataFrame({
        "day": pd.Series(grid[t_idx]).astype("datetime64[us]"),
        "cnt": x[t_idx],
        "trend": round_half_away(trend, 6),
        "seasonal": round_half_away(seasonal, 6),
        "residual": round_half_away(resid, 6)})


def holt_linear_daily(sf_dir: str, *, alpha: float = 0.5,
                      beta: float = 0.3):
    """Holt linear (double) exponential smoothing of the daily
    event-count series — EWMA's trend-aware sibling (level + trend
    state): on the gapfilled day grid,

        s_1 = x_1,  b_1 = x_2 − x_1
        s_t = α·x_t + (1−α)·(s_{t−1} + b_{t−1})
        b_t = β·(s_t − s_{t−1}) + (1−β)·b_{t−1}

    The recurrence is genuinely sequential, but the series is the
    bounded calendar dimension, so the loop closes on the driver
    after the one mergeable daily fold (the EWMA entry documents the
    segmented-restart path for unbounded keys). The twin replays the
    identical recurrence as a recursive CTE with the same float
    literal order (the ``event_throttle`` precedent). Requires ≥2
    days. Columns: day, cnt, level, trend_rate."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    if len(days) < 2:
        return pd.DataFrame({
            "day": pd.Series(dtype="datetime64[us]"),
            "cnt": pd.Series(dtype="int64"),
            "level": pd.Series(dtype="float64"),
            "trend_rate": pd.Series(dtype="float64")})
    grid = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    x = days.set_index("day")["c"].reindex(grid, fill_value=0) \
        .to_numpy(np.int64)
    n = len(x)
    s = np.empty(n, np.float64)
    b = np.empty(n, np.float64)
    s[0] = np.float64(x[0])
    b[0] = np.float64(x[1] - x[0])
    a, bt = np.float64(alpha), np.float64(beta)
    for t in range(1, n):
        s[t] = a * np.float64(x[t]) + (1.0 - a) * (s[t - 1] + b[t - 1])
        b[t] = bt * (s[t] - s[t - 1]) + (1.0 - bt) * b[t - 1]
    return pd.DataFrame({
        "day": pd.Series(grid).astype("datetime64[us]"),
        "cnt": x,
        "level": round_half_away(s, 6),
        "trend_rate": round_half_away(b, 6)})


def kendall_tau_daily(sf_dir: str):
    """Kendall tau-b rank correlation between calendar time and the
    daily event count — the nonparametric monotone-trend test
    (Mann–Kendall): counts concordant vs discordant day pairs instead
    of fitting anything, so a single outlier day can't fake a trend
    the way it can in OLS. Days are distinct (no x-ties), so

        tau_b = (C − D) / sqrt(n0 · (n0 − T)),   n0 = n(n−1)/2,
        T = Σ over tied count-values t·(t−1)/2

    Everything up to the final division is exact int64 (pair counts,
    tie corrections), so the twin matches bit-for-bit before the
    6-decimal round. The daily series is a bounded dimension (one row
    per calendar day — ≤366/year), folded by the same mergeable count
    partials as the rest of the family; the O(n²) pair compare runs on
    that bounded series, never on events. Columns: n_days,
    n_concordant, n_discordant, tau_b."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days": pd.Series(dtype="int64"),
        "n_concordant": pd.Series(dtype="int64"),
        "n_discordant": pd.Series(dtype="int64"),
        "tau_b": pd.Series(dtype="float64")})
    n = len(days)
    if n < 2:
        return empty
    c = days["c"].to_numpy(np.int64)  # already day-sorted
    diff = c[None, :] - c[:, None]
    upper = np.triu(np.ones((n, n), dtype=bool), k=1)
    conc = np.int64((diff[upper] > 0).sum())
    disc = np.int64((diff[upper] < 0).sum())
    n0 = np.int64(n * (n - 1) // 2)
    _, tie_counts = np.unique(c, return_counts=True)
    t2 = np.int64((tie_counts * (tie_counts - 1) // 2).sum())
    den = np.sqrt(np.float64(n0) * np.float64(n0 - t2))
    if den == 0.0:
        return empty
    tau = np.float64(conc - disc) / den
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "n_concordant": [conc],
        "n_discordant": [disc],
        "tau_b": round_half_away(np.array([tau]), 6)})


def cross_correlation_daily(sf_dir: str, *, type_x: str = "view",
                            type_y: str = "purchase", max_lag: int = 3):
    """Lead-lag cross-correlation between two event types' daily count
    series — 'do views LEAD purchases, and by how many days?' (the
    two-series sibling of ``daily_autocorr``). For each lag k in
    [−max_lag, max_lag], Pearson over pairs (x_t, y_{t+k}) formed on
    OBSERVED days exactly k calendar days apart; a positive peak at
    k > 0 means x leads y by k days.

    Distributed shape: ONE mergeable (type, day) count fold — the
    bounded two-series dimension — then the 2·max_lag+1 Pearson
    closes on the driver from exact int64 moment sums, so both
    engines cast the SAME values to double and the close matches
    bitwise. Columns: lag, n_pairs, xcorr."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts", "event_type"))
    d = combine_partials_driver(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "day": b.loc[b["event_type"].isin([type_x, type_y]),
                             "ts"].dt.floor("D"),
                "event_type": b.loc[
                    b["event_type"].isin([type_x, type_y]),
                    "event_type"],
                "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["event_type", "day"], {"c": ("c", "sum")})
    empty = pd.DataFrame({
        "lag": pd.Series(dtype="int64"),
        "n_pairs": pd.Series(dtype="int64"),
        "xcorr": pd.Series(dtype="float64")})
    if d.empty:
        return empty
    xs = d[d["event_type"] == type_x]
    ys = d[d["event_type"] == type_y]
    x_map = {int(k): np.int64(v) for k, v in zip(
        xs["day"].to_numpy().astype("datetime64[D]").astype(np.int64),
        xs["c"].to_numpy(np.int64))}
    y_map = {int(k): np.int64(v) for k, v in zip(
        ys["day"].to_numpy().astype("datetime64[D]").astype(np.int64),
        ys["c"].to_numpy(np.int64))}
    rows = []
    for lag in range(-max_lag, max_lag + 1):
        pairs = [(cx, y_map[dx + lag]) for dx, cx in sorted(x_map.items())
                 if dx + lag in y_map]
        if len(pairs) < 2:
            continue
        x = np.array([p[0] for p in pairs], dtype=np.int64)
        y = np.array([p[1] for p in pairs], dtype=np.int64)
        n = np.float64(len(x))
        sx, sy = np.float64(x.sum()), np.float64(y.sum())
        sxx = np.float64((x * x).sum())
        syy = np.float64((y * y).sum())
        sxy = np.float64((x * y).sum())
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0.0 or vy <= 0.0:
            continue
        r = (n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy))
        rows.append((np.int64(lag), np.int64(len(x)), r))
    if not rows:
        return empty
    return pd.DataFrame({
        "lag": [r[0] for r in rows],
        "n_pairs": [r[1] for r in rows],
        "xcorr": round_half_away(
            np.array([r[2] for r in rows], dtype=np.float64), 6)})


def durbin_watson_daily(sf_dir: str):
    """Durbin–Watson serial-correlation diagnostic over the per-type
    daily-count OLS residuals — 'after removing the linear trend, do
    consecutive days still co-move?' (DW ≈ 2 = none, → 0 = positive,
    → 4 = negative autocorrelation). The regression-residual companion
    of ``daily_autocorr``: it tests the RESIDUALS of the same trend fit
    ``value_time_regression`` makes, which is the textbook use of DW.

    Exactness: residuals never materialize. With e_t = y_t − a − b·x_t
    and consecutive-row diffs dy, dx, both the numerator
    Σ(e_t − e_{t−1})² = Σdy² − 2bΣdydx + b²Σdx² and the denominator
    Σe² = Σy² − 2aΣy − 2bΣxy + na² + 2abΣx + b²Σx² close from exact
    int64 moment sums (x = epoch day, y = daily count), so both engines
    cast the SAME integers to double and evaluate one identical float
    expression — bitwise match, no float-sum-order hazard. Distributed
    shape: ONE mergeable (type, day) count fold (the bounded daily
    dimension); the per-type close is O(days) on the driver.
    Columns: event_type, n_days, dw."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts", "event_type"))
    d = combine_partials_driver(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "event_type": b["event_type"],
                "day": b["ts"].dt.floor("D"),
                "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["event_type", "day"], {"c": ("c", "sum")})
    empty = pd.DataFrame({
        "event_type": pd.Series(dtype="object"),
        "n_days": pd.Series(dtype="int64"),
        "dw": pd.Series(dtype="float64")})
    if d.empty:
        return empty
    rows = []
    for etype, g in d.groupby("event_type", sort=True):
        g = g.sort_values("day")
        x = g["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        y = g["c"].to_numpy(np.int64)
        n_days = len(x)
        if n_days < 3:
            continue
        # exact integer moments (epoch-day x keeps x*y ≲ 1e11 — safe)
        n = np.float64(n_days)
        sx = np.float64(x.sum())
        sy = np.float64(y.sum())
        sxx = np.float64((x * x).sum())
        sxy = np.float64((x * y).sum())
        syy = np.float64((y * y).sum())
        dx = np.diff(x)
        dy = np.diff(y)
        sdxx = np.float64((dx * dx).sum())
        sdyx = np.float64((dy * dx).sum())
        sdyy = np.float64((dy * dy).sum())
        vx = n * sxx - sx * sx
        if vx <= 0.0:
            continue
        b = (n * sxy - sx * sy) / vx
        a = (sy - b * sx) / n
        den = (syy - 2.0 * a * sy - 2.0 * b * sxy + n * a * a
               + 2.0 * a * b * sx + b * b * sxx)
        if den <= 0.0:
            continue
        num = sdyy - 2.0 * b * sdyx + b * b * sdxx
        rows.append((etype, np.int64(n_days), num / den))
    if not rows:
        return empty
    return pd.DataFrame({
        "event_type": [r[0] for r in rows],
        "n_days": [r[1] for r in rows],
        "dw": round_half_away(
            np.array([r[2] for r in rows], dtype=np.float64), 6)})


def pacf_daily(sf_dir: str):
    """Partial autocorrelation of the daily event-count series at lags
    1–3 via the Durbin–Levinson recursion — 'is the lag-2 correlation
    real, or just lag-1 echoing twice?' (the AR-order picker the ACF
    screen can't answer). Uses the standard biased autocovariance
    c_k = Σ(y_i − ȳ)(y_{i−k} − ȳ) over the POSITION-ordered observed
    series (|c_k| ≤ c_0, so DL denominators stay nonnegative):

        φ11 = ρ1;  φ22 = (ρ2 − ρ1²)/(1 − ρ1²);  φ21 = ρ1 − φ22·ρ1;
        φ33 = (ρ3 − φ21·ρ2 − φ22·ρ1)/(1 − φ21·ρ1 − φ22·ρ2)

    Exactness: c_k expands to Σy_i·y_{i−k} − ȳ(Σ'y_i + Σ'y_{i−k}) +
    n_k·ȳ² — integer lag-moment sums (the only float input is ȳ), so
    both engines evaluate one identical expression over the SAME
    integers. ONE mergeable day-count fold; close is O(1). Columns:
    lag, pacf."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({"lag": pd.Series(dtype="int64"),
                          "pacf": pd.Series(dtype="float64")})
    y = days["c"].to_numpy(np.int64)
    if len(y) < 4:
        return empty
    n = np.float64(len(y))
    sy = np.float64(y.sum())
    syy = np.float64((y * y).sum())
    mu = sy / n
    c0 = syy - 2.0 * mu * sy + n * mu * mu
    if not c0 > 0.0:
        return empty
    rho = {}
    for k in (1, 2, 3):
        a, b = y[k:], y[:-k]
        pk = np.float64((a * b).sum())
        sa = np.float64(a.sum())
        sb = np.float64(b.sum())
        nk = np.float64(len(a))
        ck = pk - mu * (sa + sb) + nk * mu * mu
        rho[k] = ck / c0
    r1, r2, r3 = rho[1], rho[2], rho[3]
    out = [(np.int64(1), r1)]
    if 1.0 - r1 * r1 > 0.0:
        phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        out.append((np.int64(2), phi22))
        phi21 = r1 - phi22 * r1
        den3 = 1.0 - phi21 * r1 - phi22 * r2
        if den3 > 0.0:
            out.append((np.int64(3),
                        (r3 - phi21 * r2 - phi22 * r1) / den3))
    return pd.DataFrame({
        "lag": [o[0] for o in out],
        "pacf": round_half_away(
            np.array([o[1] for o in out], dtype=np.float64), 6)})


def weekly_spectral_power(sf_dir: str, *, period: float = 7.0):
    """Spectral strength of the weekly cycle in the daily event-count
    series — the single-frequency DFT probe at 1/7 cycles per day
    (a Lomb–Scargle-style projection, so calendar GAPS are handled
    naturally: each observed day contributes at its true phase):

        a = Σ d_t·cos(2πt/7),  b = Σ d_t·sin(2πt/7),
        weekly_power = 2·(a² + b²) / (n · Σd²)        (1.0 = pure tone)

    with d_t the mean-centered counts and t the CALENDAR day offset
    from the first day. Complements ``daily_autocorr`` (lag domain)
    and ``dow_seasonality`` (bucket means) with the frequency-domain
    view — phase-coherent weekly structure scores high even when the
    per-weekday means look flat. The daily series is the same bounded
    dimension fold as the rest of the family; the projection closes
    on the driver. Columns: n_days, weekly_power."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days": pd.Series(dtype="int64"),
        "weekly_power": pd.Series(dtype="float64")})
    n = len(days)
    if n < 2:
        return empty
    day_i = days["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
    t = (day_i - day_i[0]).astype(np.float64)
    c = days["c"].to_numpy(np.int64)
    nf = np.float64(n)
    x = c.astype(np.float64) - np.float64(c.sum()) / nf
    w = 2.0 * np.pi * t / period
    a = np.float64((x * np.cos(w)).sum())
    b = np.float64((x * np.sin(w)).sum())
    ss = np.float64((x * x).sum())
    if ss <= 0.0:
        return empty
    power = 2.0 * (a * a + b * b) / (nf * ss)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "weekly_power": round_half_away(np.array([power]), 6)})


def user_event_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type mix — the behavioural
    diversity screen that pairs with ``user_burstiness`` (entropy ≈ 0:
    the user does exactly one thing, scraper/bot-shaped; high entropy:
    organic mixed sessions). Uses the Σc·ln c identity so the close
    needs only three mergeable numbers per user:

        H = ln(n) − (Σ_t c_t·ln c_t) / n

    Distributed shape: one bucketed (user, type) count fold (≤ |types|
    rows per user on the wire), then a second user-bucketed fold of
    (n, k, Σc·ln c); the single-type case cancels to exactly 0.0 in
    both engines (ln n − (n·ln n)/n). Columns: user_id, n_events,
    n_types, entropy."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import hash_partition_aggregate

    counts = hash_partition_aggregate(
        _read_events(sf_dir, ("user_id", "event_type")),
        ["user_id", "event_type"], {"cnt": ("event_type", "count")},
        num_buckets=32)

    def _terms(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cnt"].to_numpy(np.int64)
        cf = c.astype(np.float64)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "cnt": c, "clnc": cf * np.log(cf),
            "one": np.ones(len(b), np.int64)})

    per_user = hash_partition_aggregate(
        counts.map_batches(_terms, batch_format="pandas",
                           batch_size=65536),
        ["user_id"],
        {"n": ("cnt", "sum"), "k": ("one", "sum"), "s": ("clnc", "sum")},
        num_buckets=32)

    def _close(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        nf = n.astype(np.float64)
        h = np.log(nf) - b["s"].to_numpy(np.float64) / nf
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n_events": n,
            "n_types": b["k"].to_numpy(np.int64),
            "entropy": round_half_away(h, 6)})

    return per_user.map_batches(_close, batch_format="pandas")


def user_burstiness(sf_dir: str, *, min_events: int = 3):
    """Inter-arrival burstiness per user — coefficient of variation of
    the gaps between a user's consecutive events (cv ≈ 0: metronomic
    bot-like cadence; cv ≫ 1: bursty human sessions). The behavioural
    screen bot-filtering runs before events feed training data.

    Distributed shape: the same user-bucket exchange as
    ``event_deltas`` — one sort per bucket, exact int64 gap diffs
    masked at user boundaries, then a vectorized per-user moment fold
    (n, Σg, Σg²) INSIDE the bucket kernel so only three numbers per
    user cross to the output. Gaps are converted us → seconds by one
    exact /1e6 before squaring to keep Σg² in comfortable float64
    range. stddev via the same moment formula as the SQL twin (NOT
    Welford, so the expressions match); cv is scale-free so the
    1e-12 fold noise cancels. Columns: user_id, n_events, mean_gap_s,
    cv_gap."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    min_gaps = min_events - 1

    def _cv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        t = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        gap_us = np.concatenate([[0], t[1:] - t[:-1]])
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        # Σgap stays exact int64 (it telescopes to last-first), so the
        # 6-decimal round of the large mean can't flip on fold order;
        # only Σg² is a float fold, and cv is a ratio so that cancels
        g = gap_us.astype(np.float64) / 1000000.0
        df = pd.DataFrame({"user_id": uid[~first],
                           "g_us": gap_us[~first],
                           "g2": g[~first] * g[~first]})
        a = df.groupby("user_id", sort=True).agg(
            n=("g_us", "size"), s_us=("g_us", "sum"),
            ss=("g2", "sum")).reset_index()
        a = a[a["n"] >= min_gaps].reset_index(drop=True)
        n = a["n"].to_numpy(np.int64).astype(np.float64)
        s_us = a["s_us"].to_numpy(np.int64)
        ss = a["ss"].to_numpy(np.float64)
        s = s_us.astype(np.float64) / 1000000.0
        mean = s / n
        # constant gaps cancel to a tiny negative: clamp (twin GREATEST)
        sd = np.sqrt(np.maximum((ss - s * s / n) / (n - 1.0), 0.0))
        cv = np.where(s_us == 0, 0.0, sd / mean)
        return pd.DataFrame({
            "user_id": a["user_id"].to_numpy(np.int64),
            "n_events": a["n"].to_numpy(np.int64) + 1,
            "mean_gap_s": round_half_away(mean, 6),
            "cv_gap": round_half_away(cv, 6)})

    keyed = (
        _read_events(sf_dir, ("event_id", "ts", "user_id"))
        .map_batches(lambda b: b.assign(
            __b=(b["user_id"] % 64).astype("int32")),
            batch_format="pandas", batch_size=65536)
    )
    return bucket_map_groups(keyed, _cv, num_buckets=64)


def holt_winters_daily(sf_dir: str, *, alpha: float = 0.5,
                       beta: float = 0.3, gamma: float = 0.2,
                       period: int = 7):
    """Holt-Winters ADDITIVE (triple) exponential smoothing of the
    daily event-count series — the seasonal-aware closer of the
    smoothing family (level + trend + rotating per-weekday seasonal
    state):

        l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}

    init over the first two seasons: l_m = mean(x_1..m), b_m =
    (mean(x_{m+1..2m}) − mean(x_1..m))/m, s_i = x_i − l_m. The season
    sums stay exact ints so the init is deterministic; the recurrence
    replays in the twin as a recursive CTE carrying the seasonal
    buffer as a DOUBLE[7] list (same float literal order). Same
    bounded-calendar driver loop as ``holt_linear_daily``. Requires
    ≥ 2·period gapfilled days. Columns: day, cnt, level, trend_rate,
    seasonal."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "day": pd.Series(dtype="datetime64[us]"),
        "cnt": pd.Series(dtype="int64"),
        "level": pd.Series(dtype="float64"),
        "trend_rate": pd.Series(dtype="float64"),
        "seasonal": pd.Series(dtype="float64")})
    if len(days) < 2:
        return empty
    grid = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    x = days.set_index("day")["c"].reindex(grid, fill_value=0) \
        .to_numpy(np.int64)
    n, m = len(x), period
    if n < 2 * m:
        return empty
    sum1 = int(x[:m].sum())
    sum2 = int(x[m:2 * m].sum())
    fm = np.float64(m)
    lev = np.float64(sum1) / fm
    b = (np.float64(sum2) / fm - np.float64(sum1) / fm) / fm
    buf = [np.float64(x[i]) - lev for i in range(m)]
    a, bt, g = np.float64(alpha), np.float64(beta), np.float64(gamma)
    out_l = np.empty(n - m, np.float64)
    out_b = np.empty(n - m, np.float64)
    out_s = np.empty(n - m, np.float64)
    for t in range(m, n):
        xt = np.float64(x[t])
        s_old = buf[0]
        l_new = a * (xt - s_old) + (1.0 - a) * (lev + b)
        b_new = bt * (l_new - lev) + (1.0 - bt) * b
        s_new = g * (xt - l_new) + (1.0 - g) * s_old
        buf = buf[1:] + [s_new]
        out_l[t - m], out_b[t - m], out_s[t - m] = l_new, b_new, s_new
        lev, b = l_new, b_new
    return pd.DataFrame({
        "day": pd.Series(grid[m:]).astype("datetime64[us]"),
        "cnt": x[m:],
        "level": round_half_away(out_l, 6),
        "trend_rate": round_half_away(out_b, 6),
        "seasonal": round_half_away(out_s, 6)})


def grubbs_daily_outlier(sf_dir: str):
    """Grubbs' single-outlier test over the daily event-count series —
    the maximum studentized deviate G = max_t |c_t − mean| / sd
    ('is the most extreme day an outlier, not just the tail of the
    usual spread?'). Same bounded daily dimension as the other
    time-series screens: one mergeable per-day count fold, the
    statistic closes on the driver. Σc and Σc² are carried as exact
    PYTHON ints on the driver (daily counts at 100 TB push c² past
    int64 — the twin's HUGEINT SUM(c*c) is matched by arbitrary-
    precision int arithmetic here), so mean and the Bessel-corrected
    sd are single-division floats both engines compute identically.
    Ties on G break to the earliest day. Columns: n_days, outlier_day,
    cnt, g_stat, mean_daily, sd_daily."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days": pd.Series(dtype="int64"),
        "outlier_day": pd.Series(dtype="datetime64[us]"),
        "cnt": pd.Series(dtype="int64"),
        "g_stat": pd.Series(dtype="float64"),
        "mean_daily": pd.Series(dtype="float64"),
        "sd_daily": pd.Series(dtype="float64")})
    n = len(days)
    if n < 3:
        return empty
    c = days["c"].to_numpy(np.int64)
    s1 = int(sum(int(v) for v in c))
    s2 = int(sum(int(v) * int(v) for v in c))
    nf = np.float64(n)
    mean = np.float64(s1) / nf
    var = (np.float64(s2) - np.float64(s1) * np.float64(s1) / nf) \
        / (nf - 1.0)
    if var <= 0.0:
        return empty
    sd = np.sqrt(var)
    g = np.abs(c.astype(np.float64) - mean) / sd
    i = int(np.argmax(g))  # first max = earliest day (days sorted asc)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "outlier_day": [days["day"].iloc[i]],
        "cnt": [np.int64(c[i])],
        "g_stat": round_half_away(np.array([g[i]]), 6),
        "mean_daily": round_half_away(np.array([mean]), 6),
        "sd_daily": round_half_away(np.array([sd]), 6)})


def page_hinkley_daily(sf_dir: str):
    """Page–Hinkley drift detector over the daily event-count series —
    the sequential mean-increase monitor: with the running mean
    mean_t = cum_t / t (exact int cumulative / index), the PH sum is

        ph_t = ph_{t-1} + (c_t − mean_t),   ph_1 = 0
        excursion_t = ph_t − min_{s ≤ t} ph_s

    and a drift alarm fires when the excursion exceeds a threshold the
    caller picks downstream (the statistic, not the verdict, is the
    deliverable — the spike_days precedent). Genuinely sequential
    semantics (each step needs the previous PH value and running min),
    so like Holt the bounded daily series closes on the driver and the
    SQL twin replays the identical recurrence as a recursive CTE —
    cumulative sums stay exact ints, ONE double division per step, so
    both engines walk bit-identical floats. Columns: day, cnt, ph,
    excursion (one row per observed day)."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    n = len(days)
    if n == 0:
        return pd.DataFrame({
            "day": pd.Series(dtype="datetime64[us]"),
            "cnt": pd.Series(dtype="int64"),
            "ph": pd.Series(dtype="float64"),
            "excursion": pd.Series(dtype="float64")})
    c = days["c"].to_numpy(np.int64)
    ph = np.empty(n, np.float64)
    exc = np.empty(n, np.float64)
    cum = 0
    acc = np.float64(0.0)
    mn = np.float64(np.inf)
    for t in range(n):
        cum += int(c[t])
        acc = acc + (np.float64(c[t])
                     - np.float64(cum) / np.float64(t + 1))
        if acc < mn:
            mn = acc
        ph[t] = acc
        exc[t] = acc - mn
    return pd.DataFrame({
        "day": days["day"].astype("datetime64[us]"),
        "cnt": c,
        "ph": round_half_away(ph, 6),
        "excursion": round_half_away(exc, 6)})


def mcnemar_conversion(sf_dir: str, *, convert_type: str = "purchase"):
    """McNemar's test on PAIRED user conversion between the first and
    second half of the stream (midpoint-ts split, the ``psi_value_drift``
    convention) — the within-subjects sibling of ``ab_test_zscore``:
    each user is their own control, so only the DISCORDANT users drive
    the statistic:

        b = #(converted first half only),  c = #(second half only)
        χ² = (b − c)² / (b + c),   corrected = (|b − c| − 1)² / (b + c)

    Distributed shape: one tiny ts-bounds fold, then a bucketed
    per-user MAX fold of the two half flags (users unbounded →
    hash-partitioned), then a mergeable count combine — four ints
    reach the driver, every value exact until the final division.
    b + c = 0 pins both statistics to 0. Columns: n_users,
    b_first_only, c_second_only, mcnemar_stat, mcnemar_cc."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, ("ts", "user_id", "event_type"))
    bounds = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "__k": np.int64(0),
            "tmin": [b["ts"].min()], "tmax": [b["ts"].max()]}),
            batch_format="pandas", batch_size=65536),
        ["__k"], {"tmin": ("tmin", "min"), "tmax": ("tmax", "max")})
    empty = pd.DataFrame({
        "n_users": pd.Series(dtype="int64"),
        "b_first_only": pd.Series(dtype="int64"),
        "c_second_only": pd.Series(dtype="int64"),
        "mcnemar_stat": pd.Series(dtype="float64"),
        "mcnemar_cc": pd.Series(dtype="float64")})
    if bounds.empty:
        return empty
    tmin = np.int64(pd.Timestamp(bounds["tmin"].iloc[0]).value // 1000)
    tmax = np.int64(pd.Timestamp(bounds["tmax"].iloc[0]).value // 1000)
    mid = tmin + (tmax - tmin) // 2

    def _flags(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        conv = (b["event_type"] == convert_type).to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "c0": (conv & (us < mid)).astype("int64"),
            "c1": (conv & (us >= mid)).astype("int64")})

    per_user = hash_partition_aggregate(
        ev.map_batches(_flags, batch_format="pandas", batch_size=65536),
        ["user_id"], {"c0": ("c0", "max"), "c1": ("c1", "max")})
    counts = combine_partials_driver(
        per_user.map_batches(lambda b: pd.DataFrame({
            "__k": np.int64(0),
            "n": np.int64(1),
            "b": ((b["c0"] == 1) & (b["c1"] == 0)).astype("int64"),
            "c": ((b["c0"] == 0) & (b["c1"] == 1)).astype("int64")}),
            batch_format="pandas"),
        ["__k"], {"n": ("n", "sum"), "b": ("b", "sum"),
                  "c": ("c", "sum")})
    if counts.empty:
        return empty
    n = np.int64(counts["n"].iloc[0])
    b = np.int64(counts["b"].iloc[0])
    c = np.int64(counts["c"].iloc[0])
    if b + c == 0:
        stat, cc = 0.0, 0.0
    else:
        den = np.float64(b + c)
        stat = float(round_half_away(
            np.float64((b - c) * (b - c)) / den, 6))
        d = abs(int(b) - int(c)) - 1
        cc = float(round_half_away(np.float64(d * d) / den, 6))
    return pd.DataFrame({
        "n_users": [n], "b_first_only": [b], "c_second_only": [c],
        "mcnemar_stat": [stat], "mcnemar_cc": [cc]})


def hurst_exponent_daily(sf_dir: str, *, sizes: tuple = (5, 10, 15)):
    """Hurst exponent of the daily event-count series via classical
    rescaled-range (R/S) analysis — the long-memory screen (H ≈ 0.5:
    random walk; H > 0.5: persistent trends; H < 0.5: mean-reverting):
    for each window size m the GAPFILLED grid splits into ⌊n/m⌋ full
    segments; per segment the cumulative deviation from the segment
    mean Z_i = cum_i − i·mean (cum exact int, ONE double product per
    term) gives R = max Z − min Z over i = 1..m, S = the population
    sd from exact (Σx, Σx²); H is the raw-moment OLS slope of
    ln(mean R/S) on ln(m). Segments with S = 0 are skipped; the row
    appears only when ALL sizes keep ≥1 segment (pinned — the twin's
    count guard). Bounded daily dimension: one mergeable per-day count
    fold, everything else closes on the driver. Columns: n_days, rs_5,
    rs_10, rs_15, hurst."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days": pd.Series(dtype="int64"),
        "rs_5": pd.Series(dtype="float64"),
        "rs_10": pd.Series(dtype="float64"),
        "rs_15": pd.Series(dtype="float64"),
        "hurst": pd.Series(dtype="float64")})
    if days.empty:
        return empty
    grid = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    x = days.set_index("day")["c"].reindex(grid, fill_value=0) \
        .to_numpy(np.int64)
    n = len(x)
    rs_means = []
    for m in sizes:
        nseg = n // m
        if nseg < 1:
            return empty
        vals = []
        for s in range(nseg):
            seg = x[s * m:(s + 1) * m]
            s1 = int(seg.sum())
            s2 = int((seg.astype(object) * seg.astype(object)).sum())
            mean = np.float64(s1) / np.float64(m)
            var = np.float64(s2) / np.float64(m) - mean * mean
            if var <= 0.0:
                continue
            cum = np.cumsum(seg).astype(np.float64)
            dev = cum - np.arange(1, m + 1, dtype=np.float64) * mean
            r = np.float64(dev.max() - dev.min())
            vals.append(r / np.sqrt(var))
        if not vals:
            return empty
        rs_means.append(float(np.float64(sum(vals))
                              / np.float64(len(vals))))
    lx = np.log(np.array(sizes, np.float64))
    ly = np.log(np.array(rs_means, np.float64))
    if np.any(~np.isfinite(ly)):
        return empty
    nf = np.float64(len(sizes))
    slope = ((nf * (lx * ly).sum() - lx.sum() * ly.sum())
             / (nf * (lx * lx).sum() - lx.sum() * lx.sum()))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "rs_5": round_half_away(np.array([rs_means[0]]), 6),
        "rs_10": round_half_away(np.array([rs_means[1]]), 6),
        "rs_15": round_half_away(np.array([rs_means[2]]), 6),
        "hurst": round_half_away(np.array([slope]), 6)})


def granger_daily(sf_dir: str, *, cause_type: str = "view",
                  effect_type: str = "purchase"):
    """Lag-1 Granger-causality screen on the daily grid: do yesterday's
    ``cause_type`` counts help predict today's ``effect_type`` counts
    beyond what yesterday's effect counts already explain? The F-test
    between nested OLS models over t = 2..n:

        unrestricted:  y_t = b0 + b1·y_{t−1} + b2·x_{t−1}
        restricted:    y_t = c0 + c1·y_{t−1}
        F = (SSE_r − SSE_u) / (SSE_u / (n − 3))

    Distributed shape: ONE mergeable (event_type, day) count fold (the
    ``cusum_changepoint`` dimension); the gapfilled lag-aligned Gram
    sums are exact PYTHON ints on the driver (products of two daily
    counts overflow int64 at 100 TB — the twin's HUGEINT sums are
    matched by arbitrary precision here), coefficients close by
    Cramer's rule and the SSEs by the normal-equation identity
    SSE = Σy² − b·(X'y) — no second data pass, identical float nesting
    both engines. Columns: n_obs, b_ylag, b_xlag, sse_r, sse_u,
    f_stat."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts", "event_type"))
    days = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["ts"].dt.floor("D"), "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["event_type", "day"], {"c": ("c", "sum")})
    empty = pd.DataFrame({
        "n_obs": pd.Series(dtype="int64"),
        "b_ylag": pd.Series(dtype="float64"),
        "b_xlag": pd.Series(dtype="float64"),
        "sse_r": pd.Series(dtype="float64"),
        "sse_u": pd.Series(dtype="float64"),
        "f_stat": pd.Series(dtype="float64")})
    if days.empty:
        return empty
    grid = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    piv = (days.pivot_table(index="day", columns="event_type",
                            values="c", aggfunc="sum")
           .reindex(grid).fillna(0).astype(np.int64))
    yx = [int(v) for v in piv.get(
        effect_type, pd.Series(0, index=grid)).to_numpy()]
    xx = [int(v) for v in piv.get(
        cause_type, pd.Series(0, index=grid)).to_numpy()]
    n = len(grid)
    if n < 5:
        return empty
    y = yx[1:]
    yl = yx[:-1]
    xl = xx[:-1]
    m = n - 1
    s_yl = sum(yl); s_xl = sum(xl); s_y = sum(y)
    s_ylyl = sum(a * a for a in yl)
    s_ylxl = sum(a * b for a, b in zip(yl, xl))
    s_xlxl = sum(a * a for a in xl)
    s_yly = sum(a * b for a, b in zip(yl, y))
    s_xly = sum(a * b for a, b in zip(xl, y))
    s_yy = sum(a * a for a in y)
    mf = np.float64(m)
    f_yl, f_xl, f_y = (np.float64(s_yl), np.float64(s_xl),
                       np.float64(s_y))
    f_ylyl, f_ylxl, f_xlxl = (np.float64(s_ylyl), np.float64(s_ylxl),
                              np.float64(s_xlxl))
    f_yly, f_xly, f_yy = (np.float64(s_yly), np.float64(s_xly),
                          np.float64(s_yy))

    def det3(a, b, c, d, e, f, g, h, i):
        return (a * (e * i - f * h) - b * (d * i - f * g)
                + c * (d * h - e * g))

    det = det3(mf, f_yl, f_xl, f_yl, f_ylyl, f_ylxl,
               f_xl, f_ylxl, f_xlxl)
    det_r = mf * f_ylyl - f_yl * f_yl
    if det == 0.0 or det_r == 0.0:
        return empty
    b0 = det3(f_y, f_yl, f_xl, f_yly, f_ylyl, f_ylxl,
              f_xly, f_ylxl, f_xlxl) / det
    b1 = det3(mf, f_y, f_xl, f_yl, f_yly, f_ylxl,
              f_xl, f_xly, f_xlxl) / det
    b2 = det3(mf, f_yl, f_y, f_yl, f_ylyl, f_yly,
              f_xl, f_ylxl, f_xly) / det
    sse_u = f_yy - b0 * f_y - b1 * f_yly - b2 * f_xly
    c1 = (mf * f_yly - f_yl * f_y) / det_r
    c0 = (f_y - c1 * f_yl) / mf
    sse_r = f_yy - c0 * f_y - c1 * f_yly
    if sse_u <= 0.0:
        return empty
    f_stat = (sse_r - sse_u) / (sse_u / (mf - 3.0))
    return pd.DataFrame({
        "n_obs": [np.int64(m)],
        "b_ylag": round_half_away(np.array([b1]), 6),
        "b_xlag": round_half_away(np.array([b2]), 6),
        "sse_r": round_half_away(np.array([sse_r]), 6),
        "sse_u": round_half_away(np.array([sse_u]), 6),
        "f_stat": round_half_away(np.array([f_stat]), 6)})


def markov_entropy_rate(sf_dir: str):
    """Entropy rate of the empirical event-type Markov chain —
    H(next | current), the sequence-complexity number ('how predictable
    is the next user action?'; 0 = deterministic routine, ln k =
    uniformly random). From the same per-user transition counts as
    ``event_transitions`` (a bounded |types|² dimension):

        H(next|cur) = H(joint) − H(cur)
                    = (Σ_i r_i·ln r_i − Σ_ij n_ij·ln n_ij) / N

    with r_i the current-type marginals — the exact-count entropy
    nesting of ``user_event_entropy`` (H = ln N − Σ n ln n / N), so
    both engines evaluate identical floats. Columns: n_transitions,
    h_joint, h_current, entropy_rate."""
    from ocr_agent_ray.functions.textstats import round_half_away

    tr = event_transitions(sf_dir)
    empty = pd.DataFrame({
        "n_transitions": pd.Series(dtype="int64"),
        "h_joint": pd.Series(dtype="float64"),
        "h_current": pd.Series(dtype="float64"),
        "entropy_rate": pd.Series(dtype="float64")})
    if not len(tr):
        return empty
    n = tr["n"].to_numpy(np.int64)
    nt = np.int64(n.sum())
    ntf = np.float64(nt)
    s_joint = float((n.astype(np.float64)
                     * np.log(n.astype(np.float64))).sum())
    r = tr.groupby("prev_type", sort=True)["n"].sum() \
        .to_numpy(np.int64)
    s_cur = float((r.astype(np.float64)
                   * np.log(r.astype(np.float64))).sum())
    h_joint = np.log(ntf) - s_joint / ntf
    h_cur = np.log(ntf) - s_cur / ntf
    return pd.DataFrame({
        "n_transitions": [nt],
        "h_joint": round_half_away(np.array([h_joint]), 6),
        "h_current": round_half_away(np.array([h_cur]), 6),
        "entropy_rate": round_half_away(
            np.array([(s_cur - s_joint) / ntf]), 6)})


def absorbing_time_to_event(sf_dir: str, *, target: str = "purchase"):
    """Expected number of steps to reach the ``target`` event type from
    each other type, treating the empirical transition matrix as an
    absorbing Markov chain — the funnel question 'how many actions away
    is a purchase from here?' answered in closed form: with Q the
    transition submatrix over non-target states,

        t = (I − Q)⁻¹ · 1        (fundamental-matrix hitting times)

    Distributed shape: the bounded ``event_transitions`` fold; the
    k−1 × k−1 solve closes on the driver. States that cannot reach the
    target at all report reachable = 0 with expected_steps NULL;
    states that CAN reach it but also have a positive-probability
    escape into a trap (a dead end or a non-reaching state) have
    INFINITE expected time — reachable = 1, expected_steps NULL — and
    the fundamental matrix is inverted only over the trap-free subset,
    keeping the solve well-posed. Rows-only (matrix inversion;
    planted-chain pytest). Columns: event_type, reachable,
    expected_steps."""
    from ocr_agent_ray.functions.textstats import round_half_away

    tr = event_transitions(sf_dir)
    empty = pd.DataFrame({
        "event_type": pd.Series(dtype="object"),
        "reachable": pd.Series(dtype="int64"),
        "expected_steps": pd.Series(dtype="float64")})
    if not len(tr):
        return empty
    states = sorted(set(tr["prev_type"]) | set(tr["next_type"]))
    if target not in states:
        return empty
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    cnt = np.zeros((k, k), np.float64)
    for p, nx, c in tr.itertuples(index=False):
        cnt[idx[p], idx[nx]] = float(c)
    rowsum = cnt.sum(axis=1)
    # reachability to target over the support digraph (driver BFS on
    # the bounded k-state graph)
    adj = cnt > 0
    reach = {target}
    changed = True
    while changed:
        changed = False
        for s in states:
            if s in reach:
                continue
            i = idx[s]
            if any(adj[i, idx[t]] for t in reach):
                reach.add(s)
                changed = True
    others = [s for s in states if s != target]
    # a finite expected time additionally requires NO positive-
    # probability escape into a trap (a state that cannot reach the
    # target, or a dead end): BFS the can-reach-trap set
    bad = {s for s in states
           if s != target and (s not in reach or rowsum[idx[s]] == 0)}
    hits_bad = set(bad)
    changed = True
    while changed:
        changed = False
        for s in states:
            if s in hits_bad or s == target:
                continue
            i = idx[s]
            if any(adj[i, idx[t]] for t in hits_bad):
                hits_bad.add(s)
                changed = True
    solv = [s for s in others
            if s in reach and rowsum[idx[s]] > 0
            and s not in hits_bad]
    t_map = {}
    if solv:
        m = len(solv)
        q = np.zeros((m, m), np.float64)
        for a, sa in enumerate(solv):
            pa = cnt[idx[sa]] / rowsum[idx[sa]]
            for b, sb in enumerate(solv):
                q[a, b] = pa[idx[sb]]
        t = np.linalg.solve(np.eye(m) - q, np.ones(m))
        t_map = dict(zip(solv, t))
    out = []
    for s in others:
        if s in t_map:
            out.append((s, np.int64(1),
                        float(round_half_away(
                            np.float64(t_map[s]), 6))))
        else:
            # reachable but trap-exposed -> infinite expected time
            out.append((s, np.int64(1 if s in reach else 0), np.nan))
    return pd.DataFrame(out, columns=["event_type", "reachable",
                                      "expected_steps"]) \
        .astype({"reachable": "int64"})


def fisher_exact_conversion(sf_dir: str, *,
                            convert_type: str = "purchase"):
    """One-sided Fisher's exact test on the arm × conversion 2×2 table
    (arm = user_id % 2, the ``ab_test_zscore`` split) — the EXACT
    small-sample inference the normal-approximation z-test can't give
    when counts are tiny: P(X ≥ a) under the hypergeometric null,

        ln P(k) = lnC(r1, k) + lnC(n − r1, c1 − k) − lnC(n, c1)

    summed over the upper tail k = a..min(r1, c1) via lgamma (the
    one-SIDED tail needs no p-value threshold comparisons, so there is
    no borderline-inclusion float hazard). Distributed shape: the same
    bucketed per-user MAX fold as the z-test; four ints reach the
    driver and the bounded tail sum (≤ min(arm size, converters)
    terms) closes there — the twin replays it with generate_series +
    lgamma, identical float nesting. Columns: n_a, n_b, conv_a,
    conv_b, odds_ratio, p_one_sided."""
    import math

    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, ("user_id", "event_type"))
    per_user = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "conv": (b["event_type"] == convert_type).astype("int64")}),
            batch_format="pandas", batch_size=65536),
        ["user_id"], {"converted": ("conv", "max")})
    arms = combine_partials_driver(
        per_user.map_batches(lambda b: pd.DataFrame({
            "arm": b["user_id"].to_numpy(np.int64) % 2,
            "n": np.int64(1),
            "c": b["converted"].astype("int64")}),
            batch_format="pandas"),
        ["arm"], {"n": ("n", "sum"), "c": ("c", "sum")})
    empty = pd.DataFrame({
        "n_a": pd.Series(dtype="int64"),
        "n_b": pd.Series(dtype="int64"),
        "conv_a": pd.Series(dtype="int64"),
        "conv_b": pd.Series(dtype="int64"),
        "odds_ratio": pd.Series(dtype="float64"),
        "p_one_sided": pd.Series(dtype="float64")})
    if len(arms) < 2:
        return empty
    arms = arms.sort_values("arm")
    n_a, n_b = (int(x) for x in arms["n"].to_numpy())
    a, cb = (int(x) for x in arms["c"].to_numpy())
    b = n_a - a
    c = cb
    d = n_b - cb
    n = n_a + n_b
    r1, c1 = n_a, a + c
    lden = (math.lgamma(n + 1) - math.lgamma(c1 + 1)
            - math.lgamma(n - c1 + 1))
    p = np.float64(0.0)
    for k in range(a, min(r1, c1) + 1):
        if c1 - k > n - r1:
            continue
        lp = (math.lgamma(r1 + 1) - math.lgamma(k + 1)
              - math.lgamma(r1 - k + 1)
              + math.lgamma(n - r1 + 1) - math.lgamma(c1 - k + 1)
              - math.lgamma(n - r1 - c1 + k + 1) - lden)
        p = p + np.float64(math.exp(lp))
    # b*c == 0 -> undefined (NULL in the twin, NaN here — both
    # materialize as NaN through the driver's pandas read)
    orr = (np.nan if b * c == 0
           else np.float64(a * d) / np.float64(b * c))
    return pd.DataFrame({
        "n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
        "conv_a": [np.int64(a)], "conv_b": [np.int64(c)],
        "odds_ratio": round_half_away(np.array([orr]), 6),
        "p_one_sided": round_half_away(np.array([p]), 6)})


def bayes_ab_conversion(sf_dir: str, *,
                        convert_type: str = "purchase"):
    """Bayesian A/B analysis of the arm conversion rates — the
    posterior probability P(p_B > p_A) under independent uniform
    (Beta(1,1)) priors, in closed form (Evan Miller's identity, exact
    for integer counts):

        P(p_B > p_A) = Σ_{i=0}^{a_B−1} B(a_A+i, b_A+b_B)
                       / ((b_B+i) · B(1+i, b_B) · B(a_A, b_A))

    with a = conversions + 1, b = non-conversions + 1 and
    ln B(x, y) = lgamma(x) + lgamma(y) − lgamma(x+y). The decision
    number experimenters actually want ('probability B beats A'),
    complementing the frequentist z and Fisher tests. Same bucketed
    per-user MAX fold; the bounded Σ (≤ conversions_B + 1 terms)
    closes on the driver; the twin replays it with generate_series +
    lgamma. Columns: n_a, n_b, conv_a, conv_b, p_b_beats_a."""
    import math

    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, ("user_id", "event_type"))
    per_user = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "conv": (b["event_type"] == convert_type).astype("int64")}),
            batch_format="pandas", batch_size=65536),
        ["user_id"], {"converted": ("conv", "max")})
    arms = combine_partials_driver(
        per_user.map_batches(lambda b: pd.DataFrame({
            "arm": b["user_id"].to_numpy(np.int64) % 2,
            "n": np.int64(1),
            "c": b["converted"].astype("int64")}),
            batch_format="pandas"),
        ["arm"], {"n": ("n", "sum"), "c": ("c", "sum")})
    empty = pd.DataFrame({
        "n_a": pd.Series(dtype="int64"),
        "n_b": pd.Series(dtype="int64"),
        "conv_a": pd.Series(dtype="int64"),
        "conv_b": pd.Series(dtype="int64"),
        "p_b_beats_a": pd.Series(dtype="float64")})
    if len(arms) < 2:
        return empty
    arms = arms.sort_values("arm")
    n_a, n_b = (int(x) for x in arms["n"].to_numpy())
    ca, cb = (int(x) for x in arms["c"].to_numpy())
    aa, ba = ca + 1, n_a - ca + 1
    ab, bb = cb + 1, n_b - cb + 1

    def lbeta(x: float, y: float) -> float:
        return (math.lgamma(x) + math.lgamma(y)
                - math.lgamma(x + y))

    p = np.float64(0.0)
    for i in range(ab):
        p = p + np.float64(math.exp(
            lbeta(aa + i, ba + bb)
            - math.log(bb + i) - lbeta(1 + i, bb) - lbeta(aa, ba)))
    return pd.DataFrame({
        "n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
        "conv_a": [np.int64(ca)], "conv_b": [np.int64(cb)],
        "p_b_beats_a": round_half_away(np.array([p]), 6)})


def segmented_trend_daily(sf_dir: str):
    """Segmented (one-breakpoint) linear trend of the daily event-count
    series — piecewise regression: the break day b minimizing
    SSE(1..b) + SSE(b+1..n) over two independent OLS fits ('when did
    the growth rate change?' — the regression sibling of the CUSUM
    level-shift detector). Each candidate's segment statistics come
    from exact integer PREFIX sums (Σt, Σt², Σy, Σty, Σy² as python
    ints — int64 overflows on 100 TB daily counts; the twin's HUGEINT
    windows match), the segment SSE closes by the pinned nesting

        slope = (m·Sxy − Sx·Sy) / (m·Sxx − Sx²),
        SSE = Syy − icept·Sy − slope·Sxy

    and ties on total SSE break to the earliest day — identical floats
    both engines, so no rounding is needed before the argmin. Segments
    need ≥ 2 points (b ∈ 2..n−2). Columns: n_days, break_day,
    sse_total, slope_left, slope_right."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days": pd.Series(dtype="int64"),
        "break_day": pd.Series(dtype="datetime64[us]"),
        "sse_total": pd.Series(dtype="float64"),
        "slope_left": pd.Series(dtype="float64"),
        "slope_right": pd.Series(dtype="float64")})
    n = len(days)
    if n < 4:
        return empty
    y = [int(v) for v in days["c"].to_numpy()]
    t = list(range(1, n + 1))
    pt = [0]; ptt = [0]; py = [0]; pty = [0]; pyy = [0]
    for i in range(n):
        pt.append(pt[-1] + t[i])
        ptt.append(ptt[-1] + t[i] * t[i])
        py.append(py[-1] + y[i])
        pty.append(pty[-1] + t[i] * y[i])
        pyy.append(pyy[-1] + y[i] * y[i])

    def seg(i: int, j: int):
        """OLS stats over t index range [i..j] (1-based inclusive)."""
        m = np.float64(j - i + 1)
        sx = np.float64(pt[j] - pt[i - 1])
        sxx = np.float64(ptt[j] - ptt[i - 1])
        sy = np.float64(py[j] - py[i - 1])
        sxy = np.float64(pty[j] - pty[i - 1])
        syy = np.float64(pyy[j] - pyy[i - 1])
        det = m * sxx - sx * sx
        if det == 0.0:
            return None
        slope = (m * sxy - sx * sy) / det
        icept = (sy - slope * sx) / m
        sse = syy - icept * sy - slope * sxy
        return slope, sse

    best = None
    for b in range(2, n - 1):
        left = seg(1, b)
        right = seg(b + 1, n)
        if left is None or right is None:
            continue
        total = left[1] + right[1]
        if best is None or total < best[0]:
            best = (total, b, left[0], right[0])
    if best is None:
        return empty
    total, b, sl, sr = best
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "break_day": [days["day"].iloc[b - 1]],
        "sse_total": round_half_away(np.array([total]), 6),
        "slope_left": round_half_away(np.array([sl]), 6),
        "slope_right": round_half_away(np.array([sr]), 6)})


def power_analysis_conversion(sf_dir: str, *,
                              convert_type: str = "purchase"):
    """Two-proportion power analysis seeded by the OBSERVED arm rates —
    the experiment-design closer: how many users per arm would a
    FUTURE test need to detect the currently-observed lift at
    α = 0.05 (two-sided) with 80% power?

        n = (z_{α/2} + z_β)² · (p_a(1−p_a) + p_b(1−p_b)) / (p_b − p_a)²

    with the z constants pinned as literals (1.959964, 0.841621 — the
    standard normal quantiles; DuckDB has no inverse CDF, so both
    engines carry the same literals). Same bucketed per-user MAX fold
    as the z-test; the closed form evaluates on two driver rows.
    Degenerate zero lift reports NULL. Columns: n_a, n_b, p_a, p_b,
    n_required_per_arm."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)

    ev = _read_events(sf_dir, ("user_id", "event_type"))
    per_user = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "conv": (b["event_type"] == convert_type).astype("int64")}),
            batch_format="pandas", batch_size=65536),
        ["user_id"], {"converted": ("conv", "max")})
    arms = combine_partials_driver(
        per_user.map_batches(lambda b: pd.DataFrame({
            "arm": b["user_id"].to_numpy(np.int64) % 2,
            "n": np.int64(1),
            "c": b["converted"].astype("int64")}),
            batch_format="pandas"),
        ["arm"], {"n": ("n", "sum"), "c": ("c", "sum")})
    empty = pd.DataFrame({
        "n_a": pd.Series(dtype="int64"),
        "n_b": pd.Series(dtype="int64"),
        "p_a": pd.Series(dtype="float64"),
        "p_b": pd.Series(dtype="float64"),
        "n_required_per_arm": pd.Series(dtype="float64")})
    if len(arms) < 2:
        return empty
    arms = arms.sort_values("arm")
    n_a, n_b = (int(x) for x in arms["n"].to_numpy())
    ca, cb = (int(x) for x in arms["c"].to_numpy())
    p_a = np.float64(ca) / np.float64(n_a)
    p_b = np.float64(cb) / np.float64(n_b)
    diff = p_b - p_a
    if diff == 0.0:
        req = np.nan
    else:
        z = np.float64(1.959964) + np.float64(0.841621)
        req = (z * z * (p_a * (1.0 - p_a) + p_b * (1.0 - p_b))
               / (diff * diff))
    return pd.DataFrame({
        "n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
        "p_a": round_half_away(np.array([p_a]), 6),
        "p_b": round_half_away(np.array([p_b]), 6),
        "n_required_per_arm": round_half_away(np.array([req]), 6)})


def runs_test_daily(sf_dir: str):
    """Wald–Wolfowitz runs test on the daily count series' above/below-
    median sign sequence — the randomness screen ('do high and low days
    alternate like noise, or clump like regimes?'):

        z = (R − μ_R) / σ_R,  μ_R = 2·n₊·n₋/n + 1,
        σ_R² = (μ_R − 1)(μ_R − 2) / (n − 1)

    with R the observed number of sign runs; days exactly at the
    median drop (the standard convention). Bounded daily dimension —
    one mergeable count fold, the run walk closes on the driver; the
    twin replays it with a LAG-based run counter and the identical
    float nesting. Columns: n_days_used, n_runs, mu_runs, z_runs."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_days_used": pd.Series(dtype="int64"),
        "n_runs": pd.Series(dtype="int64"),
        "mu_runs": pd.Series(dtype="float64"),
        "z_runs": pd.Series(dtype="float64")})
    n_all = len(days)
    if n_all < 3:
        return empty
    c = days["c"].to_numpy(np.int64)
    # median of the daily counts, interpolated (quantile_cont)
    srt = np.sort(c)
    if n_all % 2 == 1:
        med = np.float64(srt[n_all // 2])
    else:
        lo = np.float64(srt[n_all // 2 - 1])
        hi = np.float64(srt[n_all // 2])
        med = lo + (hi - lo) * np.float64(0.5)
    sign = np.sign(c.astype(np.float64) - med)
    sign = sign[sign != 0.0]
    n = len(sign)
    n_pos = int((sign > 0).sum())
    n_neg = n - n_pos
    if n < 3 or n_pos == 0 or n_neg == 0:
        return empty
    runs = 1 + int((sign[1:] != sign[:-1]).sum())
    nf = np.float64(n)
    mu = 2.0 * np.float64(n_pos) * np.float64(n_neg) / nf + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (nf - 1.0)
    if var <= 0.0:
        return empty
    z = (np.float64(runs) - mu) / np.sqrt(var)
    return pd.DataFrame({
        "n_days_used": [np.int64(n)],
        "n_runs": [np.int64(runs)],
        "mu_runs": round_half_away(np.array([mu]), 6),
        "z_runs": round_half_away(np.array([z]), 6)})


def forecast_backtest_daily(sf_dir: str, *, alpha: float = 0.5,
                            beta: float = 0.3):
    """One-step-ahead forecasting backtest on the daily series — the
    evaluation closing the loop on the smoothing family: Holt's
    forecast ŷ_t = s_{t−1} + b_{t−1} scored against the actual x_t,
    next to the naive lag-1 baseline ŷ_t = x_{t−1} ('does the trend
    state actually help, or is yesterday's count just as good?').
    MAE for both, plus the skill ratio naive/holt (>1: Holt wins).
    Same bounded-series shape as Holt itself; the twin extends the
    recursive-CTE replay with the forecast-error aggregate (error
    terms exact once s/b are — identical recurrence literals).
    Forecasts score from t = 2 (the first step with state). Columns:
    n_forecasts, mae_holt, mae_naive, skill_ratio."""
    from ocr_agent_ray.functions.textstats import round_half_away

    days = _daily_counts_driver(sf_dir)
    empty = pd.DataFrame({
        "n_forecasts": pd.Series(dtype="int64"),
        "mae_holt": pd.Series(dtype="float64"),
        "mae_naive": pd.Series(dtype="float64"),
        "skill_ratio": pd.Series(dtype="float64")})
    if len(days) < 3:
        return empty
    grid = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    x = days.set_index("day")["c"].reindex(grid, fill_value=0) \
        .to_numpy(np.int64)
    n = len(x)
    a, bt = np.float64(alpha), np.float64(beta)
    s_prev = np.float64(x[0])
    b_prev = np.float64(x[1] - x[0])
    err_h = np.float64(0.0)
    err_n = np.float64(0.0)
    m = 0
    for t in range(1, n):
        xt = np.float64(x[t])
        if t >= 2:
            err_h = err_h + np.abs(xt - (s_prev + b_prev))
            err_n = err_n + np.abs(np.float64(x[t] - x[t - 1]))
            m += 1
        s_t = a * xt + (1.0 - a) * (s_prev + b_prev)
        b_t = bt * (s_t - s_prev) + (1.0 - bt) * b_prev
        s_prev, b_prev = s_t, b_t
    if m == 0:
        return empty
    mae_h = err_h / np.float64(m)
    mae_n = err_n / np.float64(m)
    skill = np.nan if mae_h == 0.0 else mae_n / mae_h
    return pd.DataFrame({
        "n_forecasts": [np.int64(m)],
        "mae_holt": round_half_away(np.array([mae_h]), 6),
        "mae_naive": round_half_away(np.array([mae_n]), 6),
        "skill_ratio": round_half_away(np.array([skill]), 6)})


def kleinberg_bursts(sf_dir: str, *, s: float = 2.0, gamma: float = 1.0,
                     min_events: int = 6):
    """Kleinberg two-state burst detection per user (Kleinberg KDD'02,
    the 2-state automaton) — 'which users have genuine bursty episodes,
    and how long?' beyond the scalar burstiness coefficient
    (``user_burstiness``): state 0 emits gaps at the user's base rate
    λ0 = n/T, state 1 at λ1 = s·λ0; per-gap cost −ln λ + λ·g, entering
    the burst state costs γ·ln n. The min-cost state sequence (Viterbi
    over 2 states — an O(n) sequential DP per user, the
    ``event_throttle`` per-user-walk precedent) yields the burst
    episodes. Bucketed whole-user groups; only per-user summaries
    leave the kernel. Rows-only (DP; planted metronome-vs-burst
    pytest). Columns: user_id, n_events, n_bursts, n_burst_events,
    max_burst_len."""
    import math

    from ocr_agent_ray.pipelines.exchange import key_map_groups

    def _user(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "n_bursts": pd.Series(dtype="int64"),
            "n_burst_events": pd.Series(dtype="int64"),
            "max_burst_len": pd.Series(dtype="int64")})
        g = g.sort_values(["ts", "event_id"])
        n_ev = len(g)
        if n_ev < min_events:
            return empty
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = (us[1:] - us[:-1]).astype(np.float64) / 1e6
        gaps = np.maximum(gaps, 1e-6)
        n = len(gaps)
        span = float(gaps.sum())
        if span <= 0.0:
            return empty
        lam0 = n / span
        lam1 = s * lam0
        trans = gamma * math.log(n)
        c0 = -math.log(lam0) + lam0 * gaps
        c1 = -math.log(lam1) + lam1 * gaps
        # Viterbi over 2 states; start in state 0
        INF = float("inf")
        cost = [0.0, INF]
        back: list[tuple[int, int]] = []
        for i in range(n):
            n0 = min(cost[0], cost[1])
            b0 = 0 if cost[0] <= cost[1] else 1
            n1 = min(cost[0] + trans, cost[1])
            b1 = 0 if cost[0] + trans < cost[1] else 1
            back.append((b0, b1))
            cost = [n0 + c0[i], n1 + c1[i]]
        st = 0 if cost[0] <= cost[1] else 1
        states = np.empty(n, np.int8)
        for i in range(n - 1, -1, -1):
            states[i] = st
            st = back[i][st]
        # burst episodes = maximal runs of state 1
        n_bursts = 0
        n_burst_gaps = 0
        max_len = 0
        run = 0
        for v in states:
            if v == 1:
                run += 1
            else:
                if run:
                    n_bursts += 1
                    n_burst_gaps += run
                    max_len = max(max_len, run)
                run = 0
        if run:
            n_bursts += 1
            n_burst_gaps += run
            max_len = max(max_len, run)
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_events": [np.int64(n_ev)],
            "n_bursts": [np.int64(n_bursts)],
            "n_burst_events": [np.int64(n_burst_gaps + n_bursts
                                        if n_bursts else 0)],
            "max_burst_len": [np.int64(max_len)]})

    ev = _read_events(sf_dir, ("event_id", "ts", "user_id"))
    return key_map_groups(
        ev.map_batches(lambda b: b.assign(
            user_id=b["user_id"].astype("int64")),
            batch_format="pandas", batch_size=65536),
        _user, key_col="user_id", num_buckets=64)


def gumbel_weekly_maxima(sf_dir: str):
    """Gumbel (EV-I) fit over WEEKLY block maxima of the daily count
    series — the block-maxima half of extreme-value theory (the Hill
    index handles the tail of raw values; Gumbel asks 'how big is next
    month's worst day?'). Method-of-moments fit, the standard closed
    form:

        β̂ = s·√6/π,   μ̂ = x̄ − γ·β̂       (γ = 0.577216)

    over the per-ISO-week maxima, plus the 4-week return level
    μ̂ + β̂·(−ln(−ln(1 − 1/4))). Bounded weekly dimension: one
    mergeable (week, max) fold, moments close on the driver with the
    Bessel-corrected sd from exact int sums — identical float nesting
    in the twin (γ and the return-level expression as shared
    literals). Columns: n_weeks, mean_max, gumbel_mu, gumbel_beta,
    return_level_4w."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import combine_partials_driver

    ev = _read_events(sf_dir, ("ts",))
    wk = combine_partials_driver(
        ev.map_batches(lambda b: pd.DataFrame({
            "week": b["ts"].dt.strftime("%G-%V"),
            "day": b["ts"].dt.floor("D"), "c": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["week", "day"], {"c": ("c", "sum")})
    empty = pd.DataFrame({
        "n_weeks": pd.Series(dtype="int64"),
        "mean_max": pd.Series(dtype="float64"),
        "gumbel_mu": pd.Series(dtype="float64"),
        "gumbel_beta": pd.Series(dtype="float64"),
        "return_level_4w": pd.Series(dtype="float64")})
    if wk.empty:
        return empty
    mx = wk.groupby("week", sort=True)["c"].max()
    n = len(mx)
    if n < 3:
        return empty
    x = [int(v) for v in mx.to_numpy()]
    s1 = sum(x)
    s2 = sum(v * v for v in x)
    nf = np.float64(n)
    mean = np.float64(s1) / nf
    var = (np.float64(s2) - np.float64(s1) * np.float64(s1) / nf) \
        / (nf - 1.0)
    if var <= 0.0:
        return empty
    sd = np.sqrt(var)
    beta = sd * np.sqrt(np.float64(6.0)) / np.float64(np.pi)
    mu = mean - np.float64(0.577216) * beta
    rl = mu + beta * (-np.log(-np.log(1.0 - 1.0 / 4.0)))
    return pd.DataFrame({
        "n_weeks": [np.int64(n)],
        "mean_max": round_half_away(np.array([mean]), 6),
        "gumbel_mu": round_half_away(np.array([mu]), 6),
        "gumbel_beta": round_half_away(np.array([beta]), 6),
        "return_level_4w": round_half_away(np.array([rl]), 6)})


def user_jaccard_daily(sf_dir: str, *, num_buckets: int = 64):
    """Day-over-day active-user Jaccard — audience continuity: of the
    users active on day d or d+1, what fraction was active on BOTH?
    (≈1: the same people every day; ≈0: full churn. The temporal
    sibling of the near-dup Jaccard.) Distributed shape: one bucketed
    distinct-(day, user) fold; per-user groups emit consecutive-
    calendar-day co-presence partials ((d, d+1) both in the user's day
    set → one count for d), per-day user counts fold mergeably, and
    the bounded day table closes the ratio on the driver. Only
    consecutive OBSERVED day pairs appear (the twin's inner join on
    d+1). Columns: day, n_users, n_users_next, n_common, jaccard."""
    from ocr_agent_ray.functions.textstats import round_half_away
    from ocr_agent_ray.pipelines.agg import (combine_partials_driver,
                                             hash_partition_aggregate)
    from ocr_agent_ray.pipelines.exchange import key_map_groups

    ev = _read_events(sf_dir, ("ts", "user_id"))
    du = hash_partition_aggregate(
        ev.map_batches(lambda b: pd.DataFrame({
            "day": b["ts"].dt.floor("D"),
            "user_id": b["user_id"].astype("int64"),
            "one": np.int64(1)}),
            batch_format="pandas", batch_size=65536),
        ["user_id", "day"], {"one": ("one", "max")}).materialize()
    counts = combine_partials_driver(
        du.map_batches(lambda b: pd.DataFrame({
            "day": b["day"], "n": np.int64(1)}),
            batch_format="pandas"),
        ["day"], {"n": ("n", "sum")})

    def _copresence(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["day"].to_numpy(dtype="datetime64[D]")
                    .astype(np.int64))
        consec = d[:-1][(d[1:] - d[:-1]) == 1]
        if not len(consec):
            return pd.DataFrame({"day": pd.Series(
                dtype="datetime64[us]"), "m": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "day": consec.astype("datetime64[D]")
            .astype("datetime64[us]"),
            "m": np.ones(len(consec), np.int64)})

    inter = combine_partials_driver(
        key_map_groups(du, _copresence, key_col="user_id",
                       num_buckets=num_buckets),
        ["day"], {"m": ("m", "sum")})
    empty = pd.DataFrame({
        "day": pd.Series(dtype="datetime64[us]"),
        "n_users": pd.Series(dtype="int64"),
        "n_users_next": pd.Series(dtype="int64"),
        "n_common": pd.Series(dtype="int64"),
        "jaccard": pd.Series(dtype="float64")})
    if counts.empty:
        return empty
    counts = counts.sort_values("day").reset_index(drop=True)
    imap = (inter.set_index("day")["m"] if len(inter)
            else pd.Series(dtype="int64"))
    day_i = counts["day"].to_numpy(dtype="datetime64[D]") \
        .astype(np.int64)
    rows = []
    for i in range(len(counts) - 1):
        if day_i[i + 1] - day_i[i] != 1:
            continue
        d = counts["day"].iloc[i]
        n1 = np.int64(counts["n"].iloc[i])
        n2 = np.int64(counts["n"].iloc[i + 1])
        m = np.int64(int(imap.get(d, 0)))
        rows.append((d, n1, n2, m,
                     float(round_half_away(
                         np.float64(m) / np.float64(n1 + n2 - m), 6))))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["day", "n_users",
                                       "n_users_next", "n_common",
                                       "jaccard"]) \
        .astype({"n_users": "int64", "n_users_next": "int64",
                 "n_common": "int64"})
