"""Larger-scale oracle equality: all 5,000 sf0.1 docs, plus null-span edge."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ocr_agent_ray.oracle import oracle_extract
from ocr_agent_ray.pipelines.extract import build_extract_pipeline
from ocr_agent_ray.pipelines.interleave import (
    documents_to_interleaved,
    flagship_extract,
)
from ocr_agent_ray.schema import DOCUMENTS_SCHEMA
from ocr_agent_ray.stages.fanout import fan_out_documents
from ocr_agent_ray.stages.ocr import MockOcrEngine

SF = "/root/testdata/sf0.1"


def test_flagship_sf01_full_oracle_equality(ray_session):
    docs = documents_to_interleaved(SF).take_all()
    golden = oracle_extract(docs, MockOcrEngine())
    got = {r["doc_id"]: r["spans"] for r in flagship_extract(SF).take_all()}
    nonempty = {d: v for d, v in golden.items() if v}
    assert set(got) == set(nonempty)
    for did, g in nonempty.items():
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[did]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g
        ]


def test_null_span_list_fanout():
    table = pa.Table.from_pylist(
        [{"doc_id": "null-doc", "spans": None},
         {"doc_id": "ok-doc", "spans": [
             {"kind": "text", "text": "x", "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA,
    )
    units = fan_out_documents(table, num_partitions=4)
    assert units.num_rows == 1
    assert units["doc_id"].to_pylist() == ["ok-doc"]


def test_null_span_list_pipeline(ray_session):
    table = pa.Table.from_pylist(
        [{"doc_id": "null-doc", "spans": None},
         {"doc_id": "ok-doc", "spans": [
             {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA,
    )
    out = build_extract_pipeline(rd.from_arrow(table)).take_all()
    assert {r["doc_id"] for r in out} == {"ok-doc"}
