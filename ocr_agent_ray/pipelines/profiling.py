"""Table profiling (ANALYZE-style column stats) and data-quality
constraint checking (dbt-test-style rules) — the operational layer a
standalone engine needs around its pipelines: profile before you plan,
constrain before you publish.

Both return tiny driver DataFrames; everything upstream streams.
Per-column stats fold as map-side partials (one row per batch); exact
distinct counts reuse the bucketed distinct shuffle (agg.distinct_rows);
referential checks use a broadcast key set for dimension-sized parents
and the bucketed left-join path for fact-sized parents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_agent_ray.sources.readers import read_table

PROFILE_COLUMNS = ("o_custkey", "o_orderstatus", "o_orderpriority")


def profile_columns(sf_dir: str, *, table: str = "orders",
                    columns=PROFILE_COLUMNS) -> pd.DataFrame:
    """Per-column profile: row count, nulls, exact distinct count, min /
    max (as strings so mixed-type columns share one schema). One
    streaming pass per column for the foldable stats plus one bucketed
    distinct per column — at 100 TB you would fuse the per-column passes
    into one multi-column scan; per-column keeps each read pruned here."""
    from ocr_agent_ray.pipelines.agg import combine_partials_driver, distinct_rows

    rows = []
    for name in columns:
        ds = read_table(sf_dir, table, [name])

        def _prep(b: pd.DataFrame, _name=name) -> pd.DataFrame:
            return pd.DataFrame({
                "column": _name,
                "v": b[_name],
                "__null": b[_name].isna(),
            })

        stats = combine_partials_driver(
            ds.map_batches(_prep, batch_format="pandas"),
            ["column"],
            {"n_rows": ("v", "count"), "n_nulls": ("__null", "sum"),
             "min_v": ("v", "min"), "max_v": ("v", "max")},
        )
        n_distinct = distinct_rows(ds, [name]).count()
        rows.append({
            "column": name,
            "n_rows": int(stats["n_rows"].iloc[0]),
            "n_nulls": int(stats["n_nulls"].iloc[0]),
            "n_distinct": int(n_distinct),
            "min_v": str(stats["min_v"].iloc[0]),
            "max_v": str(stats["max_v"].iloc[0]),
        })
    out = pd.DataFrame(rows)
    for c in ("n_rows", "n_nulls", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out


def check_constraints(sf_dir: str) -> pd.DataFrame:
    """Data-quality rule sweep returning (rule, n_violations, passed):

    - ``orders_orderkey_unique``: primary-key uniqueness via
      count - bucketed-distinct count (no driver key set);
    - ``orders_custkey_fk``: referential check against a DIMENSION
      parent — parent keys broadcast as a membership set;
    - ``lineitem_orderkey_fk``: referential check against a FACT parent —
      distinct child keys left-bucket-join parent keys, the (tiny) missing
      set broadcasts back to count violating child ROWS;
    - ``events_value_nonneg``: scalar domain rule, pure map filter.
    """
    from ocr_agent_ray.pipelines.agg import distinct_rows
    from ocr_agent_ray.pipelines.joins import (
        broadcast_semi_filter,
        bucket_hash_join,
    )

    rows = []

    orders_keys = read_table(sf_dir, "orders", ["o_orderkey"])
    n_orders = orders_keys.count()
    n_distinct_orders = distinct_rows(orders_keys, ["o_orderkey"]).count()
    rows.append(("orders_orderkey_unique", n_orders - n_distinct_orders))

    cust_keys = {
        int(k)
        for b in read_table(sf_dir, "customer", ["c_custkey"]).iter_batches(
            batch_format="pandas", batch_size=65536)
        for k in b["c_custkey"]
    }
    bad_orders = broadcast_semi_filter(
        read_table(sf_dir, "orders", ["o_custkey"]),
        cust_keys, "o_custkey", keep=False).count()
    rows.append(("orders_custkey_fk", bad_orders))

    child = distinct_rows(
        read_table(sf_dir, "lineitem", ["l_orderkey"]), ["l_orderkey"])
    parent = distinct_rows(orders_keys, ["o_orderkey"]).map_batches(
        lambda b: pd.DataFrame({"l_orderkey": b["o_orderkey"],
                                "__present": True}),
        batch_format="pandas")
    probe = bucket_hash_join(
        child, parent, on="l_orderkey", how="left",
        left_schema=pa.schema([("l_orderkey", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("__present", pa.bool_())]),
    )
    missing = set()
    for b in probe.iter_batches(batch_format="pandas", batch_size=65536):
        missing.update(int(k) for k in b.loc[b["__present"].isna(),
                                             "l_orderkey"])
    if missing:
        n_bad = broadcast_semi_filter(
            read_table(sf_dir, "lineitem", ["l_orderkey"]),
            missing, "l_orderkey", keep=True).count()
    else:
        n_bad = 0
    rows.append(("lineitem_orderkey_fk", n_bad))

    neg = read_table(sf_dir, "events", ["value"]).map_batches(
        lambda b: b[b["value"] < 0], batch_format="pandas").count()
    rows.append(("events_value_nonneg", neg))

    out = pd.DataFrame(rows, columns=["rule", "n_violations"])
    out["n_violations"] = out["n_violations"].astype("int64")
    out["passed"] = out["n_violations"] == 0
    return out


def corpus_report(sf_dir: str) -> pd.DataFrame:
    """One-call corpus data card: per-source doc counts, length
    quantiles, mean quality score, exact-duplicate rate, and language
    mix — the summary a dataset release ships with. Composes the
    existing partial-fold operators (every stat streams; the report
    table is |sources| rows) and returns one wide DataFrame.

    Columns: source, n_docs, total_chars, median_chars, p90_chars,
    mean_quality, dup_rate, top_lang, top_lang_share."""
    import numpy as np

    from ocr_agent_ray.functions.textstats import (
        md5_fingerprint,
        quality_features,
        round_half_away,
    )
    from ocr_agent_ray.pipelines.agg import combine_partials_driver
    from ocr_agent_ray.sources.readers import read_table

    docs = read_table(sf_dir, "documents",
                      ["doc_id", "text", "lang", "source", "n_chars"])

    def _stats(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_features(batch["text"])["quality_score"]
        return pd.DataFrame({
            "source": batch["source"],
            "one": np.ones(len(batch), dtype=np.int64),
            "n_chars": batch["n_chars"],
            "quality": q.to_numpy(dtype=np.float64),
            "fingerprint": md5_fingerprint(batch["text"]),
            "lang": batch["lang"],
        })

    keyed = docs.map_batches(_stats, batch_format="pandas",
                             batch_size=65536).materialize()

    base = combine_partials_driver(
        keyed, ["source"],
        {"n_docs": ("one", "sum"), "total_chars": ("n_chars", "sum"),
         "q_sum": ("quality", "sum")})

    # exact-dup rate per source: bucketed GLOBAL distinct of
    # (source, fingerprint) — the distinct set never gathers on the
    # driver; only the per-source counts (|sources| rows) do
    from ocr_agent_ray.pipelines.agg import distinct_rows

    fp_pairs = distinct_rows(keyed, ["source", "fingerprint"],
                             num_buckets=16)
    n_distinct = combine_partials_driver(
        fp_pairs, ["source"], {"n_distinct": ("fingerprint", "count")})

    langs = combine_partials_driver(
        keyed, ["source", "lang"], {"n": ("lang", "count")})
    top_lang = (langs.sort_values(["source", "n", "lang"],
                                  ascending=[True, False, True])
                .drop_duplicates("source")
                .rename(columns={"lang": "top_lang", "n": "top_n"}))

    # exact per-source length quantiles (same shape as
    # chars_quantiles_by_source)
    def _q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "median_chars": [float(round_half_away(np.quantile(v, 0.5), 6))],
            "p90_chars": [float(round_half_away(np.quantile(v, 0.9), 6))],
        })

    from ocr_agent_ray.pipelines.exchange import grouped_map_groups

    quants = grouped_map_groups(keyed, _q, key_col="source",
                                num_buckets=8).to_pandas()

    out = (base.merge(n_distinct, on="source")
           .merge(quants, on="source")
           .merge(top_lang[["source", "top_lang", "top_n"]], on="source"))
    out["mean_quality"] = round_half_away(
        (out["q_sum"] / out["n_docs"]).to_numpy(), 6)
    out["dup_rate"] = round_half_away(
        (1.0 - out["n_distinct"] / out["n_docs"]).to_numpy(), 6)
    out["top_lang_share"] = round_half_away(
        (out["top_n"] / out["n_docs"]).to_numpy(), 6)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    cols = ["source", "n_docs", "total_chars", "median_chars", "p90_chars",
            "mean_quality", "dup_rate", "top_lang", "top_lang_share"]
    return out[cols].sort_values("source").reset_index(drop=True)
