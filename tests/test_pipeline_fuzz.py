"""Property-based whole-pipeline fuzz: random doc structures, exact
span-sequence equality vs the sequential oracle.

All hypothesis examples are folded into ONE Ray execution per run (docs
are independent rows), keeping runtime bounded while fuzzing structure:
span kinds, empty/whitespace text, adversarial math/fence fragments,
pdf runs of varying length, duplicate media refs, empty docs.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

import ray.data as rd

from ocr_agent_ray.oracle import oracle_extract
from ocr_agent_ray.pipelines.extract import build_extract_pipeline
from ocr_agent_ray.schema import DOCUMENTS_SCHEMA
from ocr_agent_ray.sources.corpus import generate_documents
from ocr_agent_ray.stages.ocr import MockOcrEngine

_TEXT_FRAGMENTS = st.sampled_from([
    "", "   ", "\n\t", "plain words",
    "\\( a \\)", "\\[ b \\]", "\\(\\)", "\\[ \\( nested \\) \\]",
    "```\ncode \\( x \\)\n```", "~~~\n\\[ y \\]\n~~~",
    "```\nunclosed fence \\( z \\)",
    "<|ref|>t<|/ref|><|det|>[[1,2,3,4]]<|/det|> grounded",
    "multi\nline\ntext", "$dollar$ \\( mix \\)",
    "<html><body><nav><a href='/'>x</a></nav><p>actual html content body "
    "with plenty of words to keep</p></body></html>",
    "unicode: héllo wörld — \u4f60\u597d\u4e16\u754c \U0001f600 \\( \u03b1+\u03b2 \\)",
    "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\n```\n\u30b3\u30fc\u30c9 \\( x \\)\n```",
])


@st.composite
def _doc(draw, idx: int = 0):
    spans = []
    n = draw(st.integers(min_value=0, max_value=6))
    for _ in range(n):
        kind = draw(st.sampled_from(["text", "text", "html", "image", "pdf_run"]))
        if kind == "text":
            spans.append({"kind": "text", "text": draw(_TEXT_FRAGMENTS),
                          "media_ref": "", "offset": 0})
        elif kind == "html":
            spans.append({"kind": "html", "text": draw(_TEXT_FRAGMENTS),
                          "media_ref": "", "offset": 0})
        elif kind == "image":
            ref = f"media://fuzz/{draw(st.integers(0, 30))}.png"
            spans.append({"kind": "image", "text": "", "media_ref": ref,
                          "offset": 0})
        else:
            ref = f"media://fuzz/{draw(st.integers(0, 10))}.pdf"
            pages = draw(st.integers(1, 5))
            for _ in range(pages):
                spans.append({"kind": "pdf_page", "text": "",
                              "media_ref": ref, "offset": 0})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc(), min_size=1, max_size=12))
def test_fuzzed_docs_match_oracle(ray_session, span_lists):
    docs = [{"doc_id": f"fz-{i:04d}", "spans": spans}
            for i, spans in enumerate(span_lists)]
    table = pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)
    golden = oracle_extract(docs, MockOcrEngine())
    out = build_extract_pipeline(rd.from_arrow(table)).take_all()
    got = {r["doc_id"]: r["spans"] for r in out}
    nonempty = {d: v for d, v in golden.items() if v}
    assert set(got) == set(nonempty)
    for did, g in nonempty.items():
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[did]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g
        ]


def test_mixed_with_generated_corpus(ray_session):
    """Degenerate hand-built docs appended to a generated corpus still
    assemble correctly side by side."""
    gen = generate_documents(30, seed=99)
    extra = pa.Table.from_pylist(
        [
            {"doc_id": "zz-empty", "spans": []},
            {"doc_id": "zz-ws", "spans": [
                {"kind": "text", "text": " \n ", "media_ref": "", "offset": 0}]},
            {"doc_id": "zz-one", "spans": [
                {"kind": "text", "text": "only span", "media_ref": "", "offset": 0}]},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    table = pa.concat_tables([gen, extra])
    golden = oracle_extract(table.to_pylist(), MockOcrEngine())
    got = {r["doc_id"]: r["spans"]
           for r in build_extract_pipeline(rd.from_arrow(table)).take_all()}
    assert "zz-empty" not in got and "zz-ws" not in got
    assert [(s["kind"], s["text"]) for s in got["zz-one"]] == \
        [("header", "## "), ("text", "only span")]
    for did, g in golden.items():
        if g:
            assert len(got[did]) == len(g)
