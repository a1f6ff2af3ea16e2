"""Span-sequence equality of the Ray pipeline vs the sequential oracle.

The north-rule invariant: per doc_id, output spans equal the oracle's
(kind, text, media_ref, order) sequence exactly — under any parallelism.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from ocr_agent_ray.config import PipelineSettings
from ocr_agent_ray.oracle import oracle_extract, oracle_merged_markdown
from ocr_agent_ray.pipelines.extract import build_extract_pipeline
from ocr_agent_ray.sources.corpus import generate_documents
from ocr_agent_ray.stages.ocr import MockOcrEngine


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def corpus():
    return generate_documents(200, seed=42)


@pytest.fixture(scope="module")
def golden(corpus):
    return oracle_extract(corpus.to_pylist(), MockOcrEngine())


def _run(corpus, **kw):
    out = build_extract_pipeline(rd.from_arrow(corpus), **kw).take_all()
    return {r["doc_id"]: r["spans"] for r in out}


def test_span_sequence_equality(ray_session, corpus, golden):
    got = _run(corpus)
    nonempty = {d: v for d, v in golden.items() if v}
    assert set(got) == set(nonempty)  # all-empty docs produce no row
    for did, g in nonempty.items():
        assert _span_tuples(got[did]) == _span_tuples(g), did


def test_determinism_across_parallelism(ray_session, corpus):
    a = _run(corpus, settings=PipelineSettings(ocr_concurrency=1, ocr_batch_size=64,
                                               fanout_batch_size=32, num_partitions=8))
    b = _run(corpus, settings=PipelineSettings(ocr_concurrency=4, ocr_batch_size=512,
                                               fanout_batch_size=512, num_partitions=64))
    assert set(a) == set(b)
    for did in a:
        assert _span_tuples(a[did]) == _span_tuples(b[did])


def test_headers_and_pairing(ray_session, corpus, golden):
    got = _run(corpus)
    for did, spans in got.items():
        tups = _span_tuples(spans)
        assert [t[3] for t in tups] == list(range(len(tups)))  # dense order
        assert len(tups) % 2 == 0
        for i in range(0, len(tups), 2):
            assert tups[i][0] == "header"
            assert tups[i][1].startswith("## ")
            assert tups[i + 1][0] in ("text", "html", "image", "pdf_page")
            assert tups[i + 1][1].strip() != ""  # empty sections dropped


@pytest.mark.parametrize("seed", [1, 7, 1234])
def test_span_equality_other_seeds(ray_session, seed):
    corpus = generate_documents(60, seed=seed)
    golden = oracle_extract(corpus.to_pylist(), MockOcrEngine())
    got = _run(corpus)
    nonempty = {d: v for d, v in golden.items() if v}
    assert set(got) == set(nonempty)
    for did, g in nonempty.items():
        assert _span_tuples(got[did]) == _span_tuples(g), (seed, did)


def test_merged_markdown_parity(ray_session, corpus):
    """Global single-file merge parity vs the oracle (small-fixture only)."""
    docs = corpus.to_pylist()[:40]
    golden_md = oracle_merged_markdown(docs, MockOcrEngine())
    got = _run(pa.Table.from_pylist(docs, schema=corpus.schema))

    lines = ["# OCR Output", ""]
    for did in sorted(got):
        spans = got[did]
        for i in range(0, len(spans), 2):
            lines += [spans[i]["text"], "", spans[i + 1]["text"], "", "---", ""]
    assert "\n".join(lines).rstrip() + "\n" == golden_md
