"""Input discovery / manifest build — the reference's enqueue stage as data.

The reference expands user paths deterministically into an ordered list of
supported files plus 4 diagnostic buckets
(/root/reference/src/ocr_agent/input_discovery.py:56-97) and enqueues
image/pdf task rows in that order (cli.py:161-196). Here discovery builds a
**manifest Dataset** instead of SQLite rows:

- classification is a vectorized predicate over the path column,
- determinism moves into the data (an explicit ``order`` column),
- diagnostics are rows with a ``bucket`` column, filterable downstream,
- directories expand in sorted-rglob order (input_discovery.py:100-109).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from ocr_agent_ray.functions.kernels import (
    is_supported_image_path,
    is_supported_path,
    is_supported_pdf_path,
)

BUCKET_SUPPORTED = "supported"
BUCKET_MISSING = "missing"
BUCKET_UNSUPPORTED = "unsupported_file"
BUCKET_EMPTY_DIR = "directory_with_no_supported_files"
BUCKET_UNKNOWN = "unknown"

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("path", pa.string()),
        pa.field("bucket", pa.string()),
        pa.field("kind", pa.string()),   # 'image' | 'pdf' | '' for non-supported
        pa.field("order", pa.int64()),   # enqueue order among supported rows, -1 otherwise
    ]
)


@dataclass
class DiscoveryReport:
    """Mirror of InputDiscoveryReport (input_discovery.py:27-33)."""

    supported: list[str] = field(default_factory=list)
    missing: list[str] = field(default_factory=list)
    unsupported: list[str] = field(default_factory=list)
    empty_dirs: list[str] = field(default_factory=list)
    unknown: list[str] = field(default_factory=list)


def discover_paths(input_paths: list[str]) -> DiscoveryReport:
    """Expand user paths in enqueue order with diagnostics.

    Semantics parity with discover_input_paths_in_enqueue_order
    (input_discovery.py:56-97): user order preserved; directories expand
    recursively in sorted order; files classified by extension whitelists.
    """
    report = DiscoveryReport()
    for p in input_paths:
        if not os.path.exists(p):
            report.missing.append(p)
            continue
        if os.path.isfile(p):
            if is_supported_path(p):
                report.supported.append(p)
            else:
                report.unsupported.append(p)
            continue
        if os.path.isdir(p):
            found = []
            for root, _dirs, files in os.walk(p):
                for name in files:
                    found.append(os.path.join(root, name))
            # the reference sorts Path objects (part-tuple order), not raw
            # strings: for siblings like 'foo-bar/x.png' vs 'foo/y.png'
            # string order and part order disagree ('-' < '/' in ASCII),
            # so sort by path components for exact enqueue-order parity
            found = sorted(
                (x for x in found if is_supported_path(x)),
                key=lambda x: x.split(os.sep),
            )
            if not found:
                report.empty_dirs.append(p)
            else:
                report.supported.extend(found)
            continue
        report.unknown.append(p)
    return report


def manifest_from_report(report: DiscoveryReport) -> pa.Table:
    """Flatten a DiscoveryReport into the manifest table."""
    rows = []
    for order, p in enumerate(report.supported):
        kind = "image" if is_supported_image_path(p) else "pdf"
        rows.append({"path": p, "bucket": BUCKET_SUPPORTED, "kind": kind, "order": order})
    for bucket, paths in [
        (BUCKET_MISSING, report.missing),
        (BUCKET_UNSUPPORTED, report.unsupported),
        (BUCKET_EMPTY_DIR, report.empty_dirs),
        (BUCKET_UNKNOWN, report.unknown),
    ]:
        rows.extend({"path": p, "bucket": bucket, "kind": "", "order": -1} for p in paths)
    return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)


def build_manifest_dataset(input_paths: list[str]):
    """Discovery as a Dataset (driver-side listing; at scale the 'source' is
    the Lance/parquet doc table itself and discovery degenerates to reading
    committed fragments — SURVEY.md S1)."""
    import ray.data as rd

    return rd.from_arrow(manifest_from_report(discover_paths(input_paths)))


def classify_paths_batch(batch: pd.DataFrame, path_col: str = "path") -> pd.DataFrame:
    """Vectorized classification of a path column (S3/S4 as a map stage)."""
    from ocr_agent_ray.functions.kernels import (
        SUPPORTED_IMAGE_EXTENSIONS,
        SUPPORTED_PDF_EXTENSIONS,
        suffix_lower_series,
    )

    suffix = suffix_lower_series(batch[path_col].fillna(""))
    batch = batch.copy()
    batch["kind"] = ""
    batch.loc[suffix.isin(SUPPORTED_IMAGE_EXTENSIONS), "kind"] = "image"
    batch.loc[suffix.isin(SUPPORTED_PDF_EXTENSIONS), "kind"] = "pdf"
    return batch
