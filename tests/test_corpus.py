"""Corpus generator properties: determinism, schema, run contiguity."""

from __future__ import annotations

from ocr_agent_ray.schema import DOCUMENTS_SCHEMA
from ocr_agent_ray.sources.corpus import generate_documents


def test_schema_and_determinism():
    a = generate_documents(30, seed=42)
    b = generate_documents(30, seed=42)
    assert a.schema.equals(DOCUMENTS_SCHEMA)
    assert a.equals(b)
    c = generate_documents(30, seed=7)
    assert not a.equals(c)


def test_sharding_is_block_independent():
    whole = generate_documents(25, seed=42)
    parts = [
        generate_documents(10, seed=42, start=0),
        generate_documents(10, seed=42, start=10),
        generate_documents(5, seed=42, start=20),
    ]
    import pyarrow as pa

    assert pa.concat_tables(parts).equals(whole)


def test_offsets_dense_and_pdf_runs_contiguous():
    tbl = generate_documents(100, seed=42)
    for row in tbl.to_pylist():
        spans = row["spans"]
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        # pdf refs appear in exactly one contiguous run
        seen_refs: set[str] = set()
        prev_ref = None
        for s in spans:
            if s["kind"] == "pdf_page":
                if s["media_ref"] != prev_ref:
                    assert s["media_ref"] not in seen_refs
                    seen_refs.add(s["media_ref"])
                prev_ref = s["media_ref"]
            else:
                prev_ref = None
        # media spans have empty text; text spans have empty media_ref
        for s in spans:
            if s["kind"] in ("image", "pdf_page"):
                assert s["text"] == ""
            else:
                assert s["media_ref"] == ""
