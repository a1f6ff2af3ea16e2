"""Lance read path: availability-gated (no lance wheel in this container).

The detection + dispatch logic runs everywhere; the actual Lance scan test
skips unless the ``lance`` package is installed (it is on real deployments
per BASELINE.json's input_hint).
"""

from __future__ import annotations

import os

import pytest

from ocr_agent_ray.sources.readers import (
    is_lance_dataset,
    lance_available,
    read_lance_table,
)


def test_lance_detection(tmp_path):
    plain = tmp_path / "docs"
    plain.mkdir()
    assert not is_lance_dataset(str(plain))

    by_suffix = tmp_path / "docs.lance"
    by_suffix.mkdir()
    assert is_lance_dataset(str(by_suffix))

    by_layout = tmp_path / "table"
    (by_layout / "_versions").mkdir(parents=True)
    assert is_lance_dataset(str(by_layout))

    assert not is_lance_dataset(str(tmp_path / "missing"))


@pytest.mark.skipif(lance_available(), reason="lance installed: error path n/a")
def test_lance_unavailable_raises_informative(tmp_path):
    d = tmp_path / "docs.lance"
    d.mkdir()
    with pytest.raises(ImportError, match="lance"):
        read_lance_table(str(d))


@pytest.mark.skipif(not lance_available(), reason="lance package not installed")
def test_lance_roundtrip(ray_session, tmp_path):
    import lance
    import pyarrow as pa

    from ocr_agent_ray.sources.corpus import generate_documents, read_documents

    table = generate_documents(50, seed=3)
    uri = str(tmp_path / "docs.lance")
    lance.write_dataset(table, uri)

    ds = read_documents(uri)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = table.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["doc_id"]) == list(want["doc_id"])


@pytest.mark.skipif(not lance_available(), reason="lance package not installed")
def test_read_table_prefers_lance(ray_session, tmp_path):
    import lance
    import pyarrow as pa

    from ocr_agent_ray.sources.readers import read_table

    tbl = pa.table({"doc_id": [1, 2], "text": ["a", "b"]})
    lance.write_dataset(tbl, str(tmp_path / "documents.lance"))
    out = read_table(str(tmp_path), "documents", ["doc_id"]).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]
    assert list(out.columns) == ["doc_id"]


def test_read_table_dispatches_to_lance(ray_session, tmp_path, monkeypatch):
    """The flagship input path per BASELINE.json input_hint: read_table
    must route a ``documents.lance`` dataset dir through
    ``read_lance_table`` (and honor column projection), falling back to
    parquet otherwise. The lance wheel is not installable in this
    container (no network), so the routing is proven against a stub
    ``lance`` module + a stubbed ``ray.data.read_lance`` boundary; on a
    real deployment the identical call sites read Lance unchanged
    (`ray.data.read_lance(uri, columns=...)`)."""
    import sys
    import types

    import ray.data as rd

    from ocr_agent_ray.sources import readers
    from ocr_agent_ray.sources.corpus import generate_documents

    table = generate_documents(20, seed=9)
    lance_dir = tmp_path / "documents.lance"
    (lance_dir / "_versions").mkdir(parents=True)

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    calls = {}

    def fake_read_lance(path, *, columns=None, override_num_blocks=None):
        calls["path"] = path
        calls["columns"] = columns
        t = table.select(columns) if columns else table
        return rd.from_arrow(t)

    monkeypatch.setattr(rd, "read_lance", fake_read_lance)

    ds = readers.read_table(str(tmp_path), "documents",
                            columns=["doc_id"])
    assert calls["path"] == str(lance_dir)
    assert calls["columns"] == ["doc_id"]
    assert ds.schema().names == ["doc_id"]
    assert ds.count() == 20
