"""CLI run+merge output is byte-identical to the sequential oracle's
merged markdown (the reference's single-file output surface,
markdown_merge.py:18-47)."""

from __future__ import annotations

import pyarrow.parquet as pq

import ray.data as rd

from ocr_agent_ray.oracle import oracle_merged_markdown
from ocr_agent_ray.pipelines.extract import run_extract_checkpointed
from ocr_agent_ray.sources.corpus import generate_documents
from ocr_agent_ray.stages.ocr import MockOcrEngine


def test_cli_merge_matches_oracle_bytes(ray_session, tmp_path):
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    table = generate_documents(60, seed=42)
    pq.write_table(table, str(corpus_dir / "docs.parquet"))

    out_dir = str(tmp_path / "out")
    run_extract_checkpointed(rd.from_arrow(table), out_dir)

    # cmd_merge body, minus the ray lifecycle the session fixture owns
    from ocr_agent_ray.state.checkpoint import CheckpointStore

    docs = CheckpointStore(out_dir).read_output().sort("doc_id").take_all()
    lines: list[str] = ["# OCR Output", ""]
    for d in docs:
        spans = d["spans"]
        for i in range(0, len(spans), 2):
            lines += [spans[i]["text"], "", spans[i + 1]["text"], "", "---", ""]
    merged = "\n".join(lines).rstrip() + "\n"

    golden = oracle_merged_markdown(table.to_pylist(), MockOcrEngine())
    assert merged == golden
