"""Document → work-unit fan-out (the reference's enqueue step, distributed).

The reference expands each input into ordered task rows — one per image,
one per PDF page (/root/reference/src/ocr_agent/queue_store.py:66-123) —
with AUTOINCREMENT task_id as the global order key. Here the same 1→N
expansion is a vectorized ``map_batches`` over Arrow: explode each doc's
span list into work-unit rows carrying ``(doc_id, offset)`` as the order
key, annotate contiguous pdf_page runs with page_index/total_pages, and
assign a stable hash partition_id for checkpointing.

Fully vectorized (pyarrow list_flatten + numpy run-length logic); the only
per-item Python is one blake2b per row for partition hashing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_agent_ray.schema import WORK_UNITS_SCHEMA


def stable_doc_partition(doc_id: str, num_partitions: int) -> int:
    """Stable cross-process hash partition (python hash() is salted)."""
    h = hashlib.blake2b(doc_id.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") % num_partitions


def fan_out_documents(batch: pa.Table, *, num_partitions: int = 32) -> pa.Table:
    """Explode (doc_id, spans) rows into work-unit rows.

    Page-run annotation: a run is a maximal sequence of adjacent spans in
    one doc with kind='pdf_page' and equal media_ref (cf. per-page fan-out
    order, queue_store.py:103-122); page_index = 0-based position in the
    run, total_pages = run length; both null for non-pdf spans.
    """
    spans_col = batch["spans"].combine_chunks()
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = pc.list_flatten(spans_col)
    parent = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
    n = len(flat)

    kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
    ref = np.asarray(flat.field("media_ref").to_pylist(), dtype=object)

    page_index = np.full(n, -1, dtype=np.int64)
    total_pages = np.full(n, -1, dtype=np.int64)
    if n:
        is_pdf = kind == "pdf_page"
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            same = (
                (parent[1:] == parent[:-1])
                & is_pdf[1:]
                & is_pdf[:-1]
                & (ref[1:] == ref[:-1])
            )
            new_run[1:] = ~same
        run_id = np.cumsum(new_run) - 1
        idx = np.arange(n)
        run_start = idx[new_run][run_id]
        run_len = np.bincount(run_id)[run_id]
        page_index = np.where(is_pdf, idx - run_start, -1)
        total_pages = np.where(is_pdf, run_len, -1)

    doc_ids = batch["doc_id"].to_pylist()
    part_by_doc = np.asarray(
        [stable_doc_partition(d, num_partitions) for d in doc_ids], dtype=np.int32
    )
    parent_doc = pa.array([doc_ids[i] for i in parent], pa.string())

    is_pdf_mask = pa.array(page_index >= 0)
    return pa.Table.from_arrays(
        [
            parent_doc,
            flat.field("kind").cast(pa.string()),
            flat.field("text").cast(pa.string()),
            flat.field("media_ref").cast(pa.string()),
            flat.field("offset").cast(pa.int32()),
            pc.if_else(is_pdf_mask, pa.array(page_index, pa.int32()), pa.scalar(None, pa.int32())),
            pc.if_else(is_pdf_mask, pa.array(total_pages, pa.int32()), pa.scalar(None, pa.int32())),
            pa.array(part_by_doc[parent] if n else [], pa.int32()),
        ],
        schema=WORK_UNITS_SCHEMA,
    )


class FanOutStage:
    """map_batches callable wrapper so num_partitions is bound once."""

    def __init__(self, num_partitions: int = 32) -> None:
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fan_out_documents(batch, num_partitions=self.num_partitions)
