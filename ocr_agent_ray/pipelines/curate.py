"""Composed corpus-curation funnel — the end-to-end training-data
pipeline built from the individually-oracled stages:

    documents → Gopher quality filter → corpus-global exact dedup
              → weighted source-mixture sampling

The deliverable is the per-stage, per-source funnel table
(stage, source, n_docs) — the report every curation run ships with —
and the whole composition has ONE exact DuckDB oracle
(``q_curation_funnel``), so stage interaction (not just each stage in
isolation) is value-checked.

Scale shape: the filter stages are pure streaming maps; exact dedup is
the one content-keyed shuffle (bucket by fingerprint, first-wins within
bucket — min doc_id globally because identical fingerprints co-locate).
Counting each stage here re-executes the lazy prefix (4 passes at most);
a production run would count on the write path instead (the checkpoint
store's partition metrics do exactly that for the flagship).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ocr_agent_ray.functions.textstats import gopher_features, md5_fingerprint
from ocr_agent_ray.sources.readers import read_table


def curation_funnel(sf_dir: str, *, num_buckets: int = 32) -> pd.DataFrame:
    from ocr_agent_ray.pipelines.agg import combine_partials_driver
    from ocr_agent_ray.pipelines.relational import mixture_keep_mask

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def _gopher_keep(b: pd.DataFrame) -> pd.DataFrame:
        keep = gopher_features(b["text"])["keep"]
        return b[keep.to_numpy(dtype=bool)]

    survivors = docs.map_batches(_gopher_keep, batch_format="pandas")

    def _fp(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": b["doc_id"], "source": b["source"],
            "fingerprint": md5_fingerprint(b["text"]),
        })
        fh = pd.util.hash_pandas_object(out["fingerprint"], index=False)
        out["__bucket"] = (fh.to_numpy() % np.uint64(num_buckets)
                           ).astype(np.int32)
        return out

    def _first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fingerprint", "doc_id"], kind="mergesort")
        return g[~g.duplicated("fingerprint")][["doc_id", "source"]]

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    deduped = bucket_map_groups(
        survivors.map_batches(_fp, batch_format="pandas", batch_size=65536),
        _first_wins, bucket_col="__bucket", num_buckets=num_buckets)

    def _mix(b: pd.DataFrame) -> pd.DataFrame:
        return b[mixture_keep_mask(b["doc_id"], b["source"])]

    mixed = deduped.map_batches(_mix, batch_format="pandas")

    parts = []
    for stage, ds in (("all", docs), ("gopher", survivors),
                      ("exact_dedup", deduped), ("mixture", mixed)):
        c = combine_partials_driver(ds, ["source"],
                                    {"n_docs": ("source", "count")})
        c.insert(0, "stage", stage)
        parts.append(c[["stage", "source", "n_docs"]])
    out = pd.concat(parts, ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def curation_funnel_extended(sf_dir: str, *, cap: int = 40,
                             num_buckets: int = 32) -> pd.DataFrame:
    """Extended funnel: documents → Gopher filter → exact dedup →
    per-source QUOTA CAP → train/val/test split. The cap thresholds are
    computed ON THE DEDUPED STREAM (not the raw table), so this checks a
    second-order stage interaction: dedup changes which doc_ids are the
    N smallest per source, and the composed oracle must agree on the
    post-interaction population. Split stages report as
    ``split_train/val/test`` rows of the same (stage, source, n_docs)
    funnel table. Scale shape matches curation_funnel; the cap adds one
    bounded partial-top-N fold (≤ cap × sources × batches rows to the
    driver) and a broadcast filter."""
    import hashlib

    from ocr_agent_ray.pipelines.agg import combine_partials_driver
    from ocr_agent_ray.pipelines.exchange import bucket_map_groups

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def _gopher_keep(b: pd.DataFrame) -> pd.DataFrame:
        keep = gopher_features(b["text"])["keep"]
        return b[keep.to_numpy(dtype=bool)]

    survivors = docs.map_batches(_gopher_keep, batch_format="pandas")

    def _fp(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": b["doc_id"], "source": b["source"],
            "fingerprint": md5_fingerprint(b["text"]),
        })
        fh = pd.util.hash_pandas_object(out["fingerprint"], index=False)
        out["__bucket"] = (fh.to_numpy() % np.uint64(num_buckets)
                           ).astype(np.int32)
        return out

    def _first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fingerprint", "doc_id"], kind="mergesort")
        return g[~g.duplicated("fingerprint")][["doc_id", "source"]]

    deduped = bucket_map_groups(
        survivors.map_batches(_fp, batch_format="pandas", batch_size=65536),
        _first_wins, bucket_col="__bucket", num_buckets=num_buckets)

    def _partial_topn(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values("doc_id", kind="mergesort")
                 .groupby("source", sort=False).head(cap))

    pooled = pd.concat(
        [b for b in deduped.map_batches(_partial_topn, batch_format="pandas",
                                        batch_size=65536)
            .iter_batches(batch_format="pandas", batch_size=None)],
        ignore_index=True)
    thr = dict(pooled.sort_values("doc_id", kind="mergesort")
                     .groupby("source", sort=False).head(cap)
                     .groupby("source")["doc_id"].max())

    def _cap_filter(b: pd.DataFrame) -> pd.DataFrame:
        lim = b["source"].map(thr).fillna(-1).to_numpy(dtype=np.int64)
        return b[b["doc_id"].to_numpy() <= lim]

    capped = deduped.map_batches(_cap_filter, batch_format="pandas")

    def _split(b: pd.DataFrame) -> pd.DataFrame:
        first2 = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:2], "big")
             for i in b["doc_id"]),
            dtype=np.int64, count=len(b))
        split = np.where(first2 < 6553, "split_test",
                         np.where(first2 < 13106, "split_val",
                                  "split_train"))
        return pd.DataFrame({"stage": split, "source": b["source"]})

    split_counts = combine_partials_driver(
        capped.map_batches(_split, batch_format="pandas"),
        ["stage", "source"], {"n_docs": ("source", "count")})

    parts = []
    for stage, ds in (("all", docs), ("gopher", survivors),
                      ("exact_dedup", deduped), ("quota_cap", capped)):
        c = combine_partials_driver(ds, ["source"],
                                    {"n_docs": ("source", "count")})
        c.insert(0, "stage", stage)
        parts.append(c[["stage", "source", "n_docs"]])
    parts.append(split_counts[["stage", "source", "n_docs"]])
    out = pd.concat(parts, ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out
