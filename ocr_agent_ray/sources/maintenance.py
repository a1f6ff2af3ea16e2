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
