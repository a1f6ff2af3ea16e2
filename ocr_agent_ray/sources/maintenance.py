"""Table-maintenance operations: small-file compaction and
schema-evolution reads — the lakehouse housekeeping a long-running
100-TB pipeline needs (streaming ingests and per-task writes produce
thousands of small files; old shards lag the current schema).

Both are Dataset-native: compaction is read → (optional sort) →
repartition → write (the sort is an explicit opt-in all-to-all);
schema evolution aligns each source's blocks to the union schema with
typed nulls — no pandas round-trip, no driver materialization.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def compact_parquet(src_dir: str, out_dir: str, *, target_files: int = 4,
                    sort_by: str | None = None) -> dict:
    """Compact a directory of (many, small) parquet files into
    ``target_files`` larger ones, optionally globally sorted by a key
    (an all-to-all — only pass ``sort_by`` when range-clustered output
    is worth the shuffle). Returns before/after stats. Output goes to a
    fresh directory so a crashed compaction never corrupts the source
    (swap directories only after success — the caller owns the rename)."""
    files_before = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    ds = rd.read_parquet(src_dir)
    rows = ds.count()
    if sort_by is not None:
        ds = ds.sort(sort_by)
        # sort yields range-partitioned blocks; coalesce without
        # breaking the order
        ds = ds.repartition(target_files)
    else:
        ds = ds.repartition(target_files, shuffle=False)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    files_after = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {
        "rows": rows,
        "files_before": len(files_before),
        "files_after": len(files_after),
    }


def read_with_schema_evolution(dirs: list[str]):
    """Read several parquet directories whose schemas have drifted
    (columns added over time) as ONE Dataset with the UNION schema:
    every source's blocks are aligned per batch — missing columns are
    appended as typed nulls — then unioned. Column types must agree
    where names overlap (a genuine type conflict should fail loudly,
    not be coerced)."""
    import pyarrow.parquet as pq

    schemas = []
    for d in dirs:
        f = next(os.path.join(d, x) for x in sorted(os.listdir(d))
                 if x.endswith(".parquet"))
        schemas.append(pq.read_schema(f))

    types: dict[str, pa.DataType] = {}
    order: list[str] = []
    for s in schemas:
        for field in s:
            if field.name in types:
                if types[field.name] != field.type:
                    raise ValueError(
                        f"type conflict for column {field.name!r}: "
                        f"{types[field.name]} vs {field.type}")
            else:
                types[field.name] = field.type
                order.append(field.name)
    union_schema = pa.schema([pa.field(c, types[c]) for c in order])

    def _align(batch: pa.Table) -> pa.Table:
        cols = []
        for c in order:
            if c in batch.column_names:
                cols.append(batch[c].cast(types[c]))
            else:
                cols.append(pa.nulls(len(batch), types[c]))
        return pa.Table.from_arrays(cols, schema=union_schema)

    parts = [rd.read_parquet(d).map_batches(_align, batch_format="pyarrow")
             for d in dirs]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _spread_bits_16(v):
    """Interleave-ready bit spread: 16-bit value -> 32-bit with zeros
    between bits (binary magic numbers, vectorized numpy)."""
    import numpy as np

    x = v.astype(np.uint32)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def zorder_values(x, y, *, x_range, y_range):
    """Z-curve (Morton) value for two numeric columns, each min-max
    normalized to 16 bits over its observed range — vectorized numpy.
    Rows close on the curve are close in BOTH dimensions, which is what
    makes per-file min/max zone maps prune 2-D range queries."""
    import numpy as np

    def norm(v, lo, hi):
        span = (hi - lo) or 1
        q = ((np.asarray(v, dtype=np.float64) - lo) / span * 65535.0)
        return np.clip(q, 0, 65535).astype(np.uint32)

    xb = _spread_bits_16(norm(x, *x_range))
    yb = _spread_bits_16(norm(y, *y_range))
    return (xb.astype(np.uint64) << np.uint64(1)) | yb.astype(np.uint64)


def zorder_write(ds, out_dir: str, *, x_col: str, y_col: str,
                 num_files: int = 16) -> dict:
    """Z-order clustering: sort a Dataset along the Morton curve of two
    columns and write range-partitioned files, so per-file min/max zone
    maps prune range queries on EITHER column (a single-column sort only
    prunes its own column). The global sort is the point of the op —
    explicit, opt-in, like compact_parquet(sort_by=...).

    Column ranges come from one cheap pre-pass (ds.min/max on two
    columns); the z-value map is stateless after that broadcast."""
    import numpy as np
    import pandas as pd

    x_range = (ds.min(x_col), ds.max(x_col))
    y_range = (ds.min(y_col), ds.max(y_col))

    def _z(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__z"] = zorder_values(batch[x_col].to_numpy(),
                                     batch[y_col].to_numpy(),
                                     x_range=x_range, y_range=y_range)
        return batch

    os.makedirs(out_dir, exist_ok=True)
    (ds.map_batches(_z, batch_format="pandas", batch_size=65536)
       .sort("__z")
       .repartition(num_files)
       .map_batches(lambda b: b.drop(columns="__z"), batch_format="pandas")
       .write_parquet(out_dir))
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {"files": len(files), "x_range": x_range, "y_range": y_range}


def merge_upsert(base, updates, *, key: str, version: str,
                 num_buckets: int = 16):
    """Lakehouse MERGE INTO (latest-wins upsert): rows from ``updates``
    replace base rows with the same ``key``; new keys insert; among
    duplicate versions of one key the highest ``version`` wins, ties
    broken toward the update side. One co-bucketed exchange by key hash
    (both sides carry a side tag); each bucket resolves winners with a
    single stable sort + drop_duplicates — no driver state, no
    broadcast, both sides may be arbitrarily large."""
    import numpy as np
    import pandas as pd

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups
    from ocr_agent_ray.pipelines.joins import stable_bucket_array

    def _tag(side: int):
        def _fn(b: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa

            b = b.copy()
            b["__side"] = np.int8(side)
            tbl = pa.Table.from_pandas(b[[key]], preserve_index=False)
            b["__bucket"] = stable_bucket_array(
                tbl.column(0).combine_chunks(), num_buckets
            ).to_numpy(zero_copy_only=False)
            return b

        return _fn

    both = base.map_batches(_tag(0), batch_format="pandas").union(
        updates.map_batches(_tag(1), batch_format="pandas"))

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, version, "__side"],
                          ascending=[True, False, False],
                          kind="mergesort")
        return (g[~g.duplicated(key)]
                .drop(columns=["__side", "__bucket"])
                .reset_index(drop=True))

    return bucket_map_groups(both, _resolve, bucket_col="__bucket",
                             num_buckets=num_buckets)


def merge_cdc(base, updates, *, key: str, version: str, op: str = "op",
              num_buckets: int = 16):
    """CDC MERGE with tombstones: like merge_upsert, but ``updates``
    carries an ``op`` column ∈ {'upsert', 'delete'} — a winning delete
    removes the key from the output entirely (the Delta/Iceberg MERGE
    WHEN MATCHED THEN DELETE arm). Base rows are implicit upserts.
    Same one co-bucketed exchange; the per-bucket resolve adds only a
    final tombstone filter, so the scale shape is unchanged."""
    import numpy as np
    import pandas as pd

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups
    from ocr_agent_ray.pipelines.joins import stable_bucket_array

    def _tag(side: int, add_op: bool):
        def _fn(b: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa

            b = b.copy()
            if add_op:
                b[op] = "upsert"
            b["__side"] = np.int8(side)
            tbl = pa.Table.from_pandas(b[[key]], preserve_index=False)
            b["__bucket"] = stable_bucket_array(
                tbl.column(0).combine_chunks(), num_buckets
            ).to_numpy(zero_copy_only=False)
            return b

        return _fn

    both = base.map_batches(_tag(0, True), batch_format="pandas").union(
        updates.map_batches(_tag(1, False), batch_format="pandas"))

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, version, "__side"],
                          ascending=[True, False, False],
                          kind="mergesort")
        w = g[~g.duplicated(key)]
        return (w[w[op] != "delete"]
                .drop(columns=["__side", "__bucket", op])
                .reset_index(drop=True))

    return bucket_map_groups(both, _resolve, bucket_col="__bucket",
                             num_buckets=num_buckets)


def snapshot_diff(base, new, *, key: str, num_buckets: int = 16):
    """Lakehouse snapshot diff: classify every key across two dataset
    versions as added / removed / changed / unchanged — the audit
    companion to merge_upsert/merge_cdc (what DID that merge do?).
    Same one co-bucketed exchange as the merges: both sides tag and
    hash their non-key payload per row (64-bit, row-order free), keys
    co-locate by bucket, and the per-bucket kernel is one merge +
    vectorized compare. Only (key, payload-hash, side) rows cross the
    wire — never the payloads. Returns (key, change_type)."""
    import numpy as np
    import pandas as pd

    from ocr_agent_ray.pipelines.exchange import bucket_map_groups
    from ocr_agent_ray.pipelines.joins import stable_bucket_array

    def _tag(side: int):
        def _fn(b: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa

            from pandas.util import hash_pandas_object

            payload_cols = [c for c in b.columns if c != key]
            h = hash_pandas_object(b[payload_cols],
                                   index=False).to_numpy()
            out = pd.DataFrame({key: b[key], "__h": h,
                                "__side": np.int8(side)})
            tbl = pa.Table.from_pandas(out[[key]], preserve_index=False)
            out["__bucket"] = stable_bucket_array(
                tbl.column(0).combine_chunks(), num_buckets
            ).to_numpy(zero_copy_only=False)
            return out

        return _fn

    both = base.map_batches(_tag(0), batch_format="pandas").union(
        new.map_batches(_tag(1), batch_format="pandas"))

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["__side"] == 0][[key, "__h"]]
        n = g[g["__side"] == 1][[key, "__h"]]
        m = b.merge(n, on=key, how="outer", suffixes=("_b", "_n"),
                    indicator=True)
        change = np.select(
            [m["_merge"] == "left_only", m["_merge"] == "right_only",
             m["__h_b"] != m["__h_n"]],
            ["removed", "added", "changed"], default="unchanged")
        return pd.DataFrame({key: m[key],
                             "change_type": change})

    return bucket_map_groups(both, _classify, bucket_col="__bucket",
                             num_buckets=num_buckets)
