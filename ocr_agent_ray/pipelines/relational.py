"""Relational operator pipelines over the TPC-H-ish driver tables.

Each function is the Ray-Data-native expression of one operator family
from SURVEY.md §2 (grouped counts, filters, fan-out, sort+limit, joins,
aggregation) with an exact DuckDB oracle in __ray_entry__.oracle_sql().
Shuffle discipline: partial aggregation before every groupby, broadcast
joins for dimension tables, one bucket-hash shuffle for the fact join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ocr_agent_ray.functions.kernels import is_supported_path
from ocr_agent_ray.functions.textstats import round_half_away
from ocr_agent_ray.pipelines.joins import broadcast_join, bucket_hash_join


def status_counts(sf_dir: str):
    """Grouped status counts — the reference's fetch_status_counts
    (queue_store.py:191-196) over the events log: rows per event_type."""
    from ray.data.aggregate import Count

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def mean_value_by_type(sf_dir: str):
    """Running-mean ETA analog (main.rs:800-828): mean event value per type,
    computed as mergeable partials (sum, count) inside map_batches, then a
    tiny groupby — the scale-safe mean."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("event_type", as_index=False).agg(
            s=("value", "sum"), c=("value", "size")
        )

    from ray.data.aggregate import Sum

    partials = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(_partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "mean_value": round_half_away(batch["s"] / batch["c"], 6),
            }
        )

    return partials.map_batches(_finish, batch_format="pandas")


_EXTS = [".png", ".pdf", ".txt", ".JPG"]


def supported_path_filter(sf_dir: str):
    """The discovery predicate (input_discovery.py:112-121) as a vectorized
    filter: synthesize a path per doc (source/doc_id + extension cycling by
    doc_id % 4), keep only supported image/pdf paths."""

    def _paths(batch: pd.DataFrame) -> pd.DataFrame:
        ext = batch["doc_id"].map(lambda i: _EXTS[i % 4])
        path = batch["source"] + "/" + batch["doc_id"].astype(str) + ext
        out = pd.DataFrame({"doc_id": batch["doc_id"], "path": path})
        return out[path.map(is_supported_path)]

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
        .map_batches(_paths, batch_format="pandas")
    )


def page_fanout(sf_dir: str):
    """The PDF per-page fan-out (queue_store.py:91-123) over the documents
    table: each doc expands to (n_chars % 5) + 1 page rows with dense
    page_index — a vectorized 1→N flat map via numpy repeat."""

    def _fan(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        pages = (batch["n_chars"].to_numpy(zero_copy_only=False) % 5 + 1).astype(np.int64)
        idx = np.arange(pages.sum(), dtype=np.int64)
        starts = np.repeat(np.cumsum(pages) - pages, pages)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(doc, pages), pa.int64()),
                pa.array(idx - starts, pa.int64()),
                pa.array(np.repeat(pages, pages), pa.int64()),
            ],
            names=["doc_id", "page_index", "total_pages"],
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .map_batches(_fan, batch_format="pyarrow")
    )


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary with partial pre-aggregation: the
    per-batch combiner emits one row per key per batch; the groupby then
    shuffles ~keys×batches rows instead of the whole fact table."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        batch = batch.assign(
            disc_price=batch["l_extendedprice"] * (1 - batch["l_discount"])
        )
        return batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )

    from ray.data.aggregate import Sum

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(_partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["avg_qty"] = round_half_away(batch["sum_qty"] / batch["count_order"], 2)
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            batch[c] = round_half_away(batch[c], 2)
        batch["count_order"] = batch["count_order"].astype("int64")
        return batch[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                      "sum_disc_price", "avg_qty", "count_order"]]

    return agg.map_batches(_finish, batch_format="pandas")


def suppliers_per_region(sf_dir: str):
    """Dimension-chain broadcast join (no shuffle): supplier → nation →
    region, then grouped counts per region name."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "s_nationkey"})

    from ray.data.aggregate import Count

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    return (
        broadcast_join(sup, dim, on="s_nationkey")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )


def customer_balance_by_nation(sf_dir: str):
    """Broadcast join + partial mean: avg customer balance per nation name."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "c_nationkey"})
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"])

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False).agg(
            s=("c_acctbal", "sum"), c=("c_acctbal", "size")
        )

    from ray.data.aggregate import Sum

    partials = (
        broadcast_join(cust, nation, on="c_nationkey")
        .map_batches(_partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": batch["n_name"],
                "avg_acctbal": round_half_away(batch["s"] / batch["c"], 2),
                "n_customers": batch["c"].astype("int64"),
            }
        )

    return partials.map_batches(_finish, batch_format="pandas")


def top_orders_by_revenue(sf_dir: str, *, k: int = 10):
    """Fact-fact bucket hash join (lineitem ⋈ orders) → revenue per order →
    global top-k. The only all-to-all exchange is the bucketed union; the
    top-k is a sort+limit over the (small) aggregated result."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    # pre-aggregate revenue per orderkey BEFORE joining: the join's left
    # side shrinks from |lineitem| to |orders|
    def _rev(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            revenue=batch["l_extendedprice"] * (1 - batch["l_discount"])
        )
        return batch.groupby("l_orderkey", as_index=False)["revenue"].sum()

    from ray.data.aggregate import Sum

    rev = (
        li.map_batches(_rev, batch_format="pandas")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    rev = rev.map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}), batch_format="pandas"
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = bucket_hash_join(rev, orders, on="o_orderkey", num_buckets=16)

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["revenue"] = round_half_away(batch["revenue"], 2)
        return batch[["o_orderkey", "o_orderpriority", "revenue"]]

    return (
        joined.map_batches(_round, batch_format="pandas")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def distinct_segments(sf_dir: str):
    """DISTINCT via groupby-first (ds.unique is the same shuffle)."""
    return (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .groupby("c_mktsegment")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
