"""Scalar-function parity (§2.8) + discovery/manifest semantics (S1-S4)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from ocr_agent_ray.functions import scalars as S
from ocr_agent_ray.sources.discovery import (
    BUCKET_EMPTY_DIR,
    BUCKET_MISSING,
    BUCKET_SUPPORTED,
    BUCKET_UNSUPPORTED,
    discover_paths,
    manifest_from_report,
)


def test_sanitize_filename_for_copy():
    assert S.sanitize_filename_for_copy("a\\b/c:d") == "a_b_c_d"
    assert S.sanitize_filename_for_copy("") == "input"
    assert S.sanitize_filename_for_copy("ok.png") == "ok.png"


def test_split_filename_and_extension():
    assert S.split_filename_and_extension("a.tar.gz") == ("a.tar", "gz")
    assert S.split_filename_and_extension(".bashrc") == (".bashrc", "")
    assert S.split_filename_and_extension("noext") == ("noext", "")


def test_sanitize_output_markdown_filename():
    assert S.sanitize_output_markdown_filename(" a b\tc\nd ") == "a_b_c_d"
    assert S.sanitize_output_markdown_filename("x/y:z") == "x_y_z"


def test_ensure_markdown_extension():
    assert S.ensure_markdown_extension("out") == "out.md"
    assert S.ensure_markdown_extension("out.md") == "out.md"
    assert S.ensure_markdown_extension("out.markdown") == "out.markdown"
    assert S.ensure_markdown_extension("out.txt") == "out.txt.md"


def test_infer_image_mime_type():
    assert S.infer_image_mime_type("/a/b.PNG") == "image/png"
    assert S.infer_image_mime_type("x.jpeg") == "image/jpeg"
    assert S.infer_image_mime_type("x.tif") == "image/tiff"
    assert S.infer_image_mime_type("x.unknown") == "application/octet-stream"


def test_normalize_windows_path():
    assert S.normalize_windows_path_lossy("\\\\?\\C:\\x") == "C:\\x"
    assert S.normalize_windows_path_lossy("/plain") == "/plain"


def test_format_seconds_human():
    assert S.format_seconds_human(0) == "0m 0s"
    assert S.format_seconds_human(125) == "2m 5s"


def test_dpi_scale():
    assert S.dots_per_inch_to_scale(200) == pytest.approx(200 / 72)


def test_discovery_buckets_and_order(tmp_path):
    d = tmp_path / "docs"
    sub = d / "sub"
    sub.mkdir(parents=True)
    (d / "b.png").write_bytes(b"x")
    (d / "a.pdf").write_bytes(b"x")
    (sub / "c.tiff").write_bytes(b"x")
    (d / "notes.txt").write_bytes(b"x")
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "readme.md").write_bytes(b"x")
    lone = tmp_path / "lone.jpg"
    lone.write_bytes(b"x")
    bad = tmp_path / "bad.docx"
    bad.write_bytes(b"x")

    report = discover_paths([
        str(lone),                      # user order preserved: file first
        str(d),                         # dir expands sorted
        str(tmp_path / "missing.png"),  # missing
        str(bad),                       # unsupported explicit file
        str(empty),                     # dir without supported files
    ])
    assert report.supported == [
        str(lone),
        str(d / "a.pdf"),
        str(d / "b.png"),
        str(sub / "c.tiff"),
    ]
    assert report.missing == [str(tmp_path / "missing.png")]
    assert report.unsupported == [str(bad)]
    assert report.empty_dirs == [str(empty)]

    table = manifest_from_report(report)
    rows = table.to_pylist()
    sup = [r for r in rows if r["bucket"] == BUCKET_SUPPORTED]
    assert [r["order"] for r in sup] == [0, 1, 2, 3]
    assert [r["kind"] for r in sup] == ["image", "pdf", "image", "image"]
    assert {r["bucket"] for r in rows} == {
        BUCKET_SUPPORTED, BUCKET_MISSING, BUCKET_UNSUPPORTED, BUCKET_EMPTY_DIR,
    }


def test_cli_enqueue_exit_codes(tmp_path):
    from ocr_agent_ray.cli import main

    (tmp_path / "a.png").write_bytes(b"x")
    manifest = str(tmp_path / "m.parquet")
    assert main(["enqueue", str(tmp_path / "a.png"), "--manifest", manifest]) == 0
    assert pq.read_table(manifest).num_rows == 1

    # nothing enqueued -> exit 2 (reference cli.py:32, 188-192)
    assert main([
        "enqueue", str(tmp_path / "nope.png"), "--manifest", manifest
    ]) == 2


def test_cli_corpus(tmp_path):
    from ocr_agent_ray.cli import main

    out = str(tmp_path / "corpus")
    assert main(["corpus", "--out", out, "--num-docs", "20"]) == 0
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files


def test_discovery_part_order_matches_pathlib(tmp_path):
    """Reference sorts Path objects (part tuples): 'foo/y.png' enqueues
    BEFORE 'foo-bar/x.png' even though the raw strings sort the other way."""
    import pathlib

    (tmp_path / "foo-bar").mkdir()
    (tmp_path / "foo").mkdir()
    (tmp_path / "foo-bar" / "x.png").write_bytes(b"p")
    (tmp_path / "foo" / "y.png").write_bytes(b"p")

    report = discover_paths([str(tmp_path)])
    expect = [str(p) for p in sorted(pathlib.Path(tmp_path).rglob("*.png"))]
    assert report.supported == expect
    assert report.supported[0].endswith(os.path.join("foo", "y.png"))


def test_csv_and_json_source_roundtrip(ray_session, tmp_path):
    """Source-format coverage beyond parquet: the same relational result
    must come back from CSV and JSONL copies of the events table."""
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    want = ev.groupby("event_type").size().sort_index()

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    rd.from_pandas(ev).repartition(3).write_csv(csv_dir)
    rd.from_pandas(ev).repartition(3).write_json(json_dir)

    for ds in (rd.read_csv(csv_dir), rd.read_json(json_dir)):
        got = (ds.map_batches(
            lambda b: b.groupby("event_type", as_index=False).size(),
            batch_format="pandas").to_pandas()
            .groupby("event_type")["size"].sum().sort_index())
        assert got.equals(want)


def test_hive_partitioned_write_and_pruned_read(ray_session, tmp_path):
    """Partitioned parquet layout (one directory per key) + filter
    pushdown on the read — the resumable-output shape at the Ray API
    level (the checkpoint store implements its own atomic variant)."""
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "by_source")
    rd.read_parquet(f"{sf}/documents.parquet",
                    columns=["doc_id", "source", "n_chars"]) \
        .write_parquet(out, partition_cols=["source"])
    # one directory per source value
    parts = sorted(d for d in os.listdir(out) if d.startswith("source="))
    want_sources = sorted(set(
        pq.read_table(f"{sf}/documents.parquet", columns=["source"])
        .column(0).to_pylist()))
    assert parts == [f"source={s}" for s in want_sources]
    # partition-pruned read sees only the one directory's rows
    one = rd.read_parquet(f"{out}/source={want_sources[0]}")
    full = pq.read_table(f"{sf}/documents.parquet", columns=["source"]).to_pandas()
    assert one.count() == int((full["source"] == want_sources[0]).sum())


def test_vectorized_path_kernels_match_scalars():
    """suffix_lower_series / mime_types are exact vectorized twins of the
    per-path scalar functions (incl. dotfiles, trailing dots, no-ext)."""
    import numpy as np
    import pandas as pd

    from ocr_agent_ray.functions.kernels import (
        _suffix_lower,
        suffix_lower_series,
    )
    from ocr_agent_ray.functions.scalars import (
        infer_image_mime_type,
        mime_types,
    )

    rng = np.random.default_rng(0)
    parts = ["a", "b.PNG", ".hidden", "x.y.JpG", "noext", "dir.d/file",
             "f.pdf", "f.", "", ".", "..", "a..png", "q.tiff", "z.webm"]
    paths = ["/".join(rng.choice(parts, size=rng.integers(1, 4)))
             for _ in range(500)]
    s = pd.Series(paths)
    assert list(suffix_lower_series(s)) == [_suffix_lower(p) for p in paths]
    assert list(mime_types(s)) == [infer_image_mime_type(p) for p in paths]
