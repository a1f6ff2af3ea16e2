"""Multimodal stage plumbing: schemas, determinism, actor signatures."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from ocr_agent_ray.stages.fanout import FanOutStage
from ocr_agent_ray.stages.media import (
    DeterministicFakeCodec,
    RealCodec,
    build_media_pipeline,
    frame_sample_indices,
)
from ocr_agent_ray.sources.corpus import generate_documents


@pytest.fixture(scope="module")
def units(ray_session):
    docs = generate_documents(40, seed=42)
    return rd.from_arrow(docs).map_batches(
        FanOutStage(num_partitions=8), batch_format="pyarrow"
    ).materialize()


def test_media_pipeline_schema_and_rows(ray_session, units):
    out = build_media_pipeline(units, concurrency=2, batch_size=8)
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow", batch_size=1024)]
    )
    assert t.num_rows == units.count()
    assert t.schema.field("media_bytes").type == pa.binary()
    assert t.schema.field("embedding").type == pa.list_(pa.float32())
    media = t.filter(pa.compute.is_valid(t["media_bytes"]))
    nonmedia = t.filter(pa.compute.is_null(t["media_bytes"]))
    # text rows pass through with null media; media rows carry payloads
    assert set(nonmedia["kind"].to_pylist()) <= {"text", "html"}
    assert set(media["kind"].to_pylist()) <= {"image", "pdf_page"}
    for row in media.slice(0, 20).to_pylist():
        assert row["width"] == 768 and row["height"] == 768  # resized
        assert len(row["embedding"]) == 64


def test_media_determinism(ray_session, units):
    a = build_media_pipeline(units, concurrency=1, batch_size=4).take_all()
    b = build_media_pipeline(units, concurrency=3, batch_size=64).take_all()
    key = lambda r: (r["doc_id"], r["offset"])
    sa = sorted(a, key=key)
    sb = sorted(b, key=key)
    assert len(sa) == len(sb)
    for x, y in zip(sa, sb):
        assert x["media_bytes"] == y["media_bytes"]
        assert x["embedding"] == y["embedding"]


def test_rasterize_dpi_dimensions():
    codec = DeterministicFakeCodec()
    payload, w, h = codec.rasterize_pdf_page("media://x.pdf", 0, dpi=200)
    # 200 DPI US-Letter: 612*200/72 x 792*200/72 (pdf_render.py:78-81 scale)
    assert (w, h) == (1700, 2200)
    assert payload[-8:] == __import__("struct").pack("<ii", w, h)
    # pure function: identical inputs -> identical bytes
    assert codec.rasterize_pdf_page("media://x.pdf", 0, dpi=200)[0] == payload
    assert codec.rasterize_pdf_page("media://x.pdf", 1, dpi=200)[0] != payload


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        RealCodec()


def test_frame_sampling():
    assert frame_sample_indices(10, 3) == [0, 3, 6, 9]
    assert frame_sample_indices(0, 3) == []
    assert frame_sample_indices(5, 0) == []


def test_frame_sample_stage(ray_session):
    import pandas as pd

    import ray.data as rd

    from ocr_agent_ray.stages.media import FrameSampleStage

    vids = rd.from_pandas(pd.DataFrame({
        "media_ref": ["media://v/a.mp4", "media://v/b.mp4", "media://v/empty.mp4"],
        "total_frames": [90, 31, 0],
    }))
    out = vids.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every_n": 30},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    # 90 frames -> 0,30,60 ; 31 -> 0,30 ; 0 -> none
    got = out.groupby("media_ref")["frame_index"].apply(list).to_dict()
    assert got["media://v/a.mp4"] == [0, 30, 60]
    assert got["media://v/b.mp4"] == [0, 30]
    assert "media://v/empty.mp4" not in got
    # frames decoded deterministically, metadata typed
    assert (out["width"] == 1280).all() and (out["height"] == 720).all()
    a0 = out[(out["media_ref"] == "media://v/a.mp4") & (out["frame_index"] == 0)]
    b0 = out[(out["media_ref"] == "media://v/b.mp4") & (out["frame_index"] == 0)]
    assert a0["media_bytes"].iloc[0] != b0["media_bytes"].iloc[0]


def test_route_media_pipeline_mixed_modalities(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from ocr_agent_ray.stages.media import route_media_pipeline

    units = pa.table({
        "media_ref": [f"m{i}" for i in range(12)],
        "kind": (["image"] * 4 + ["pdf_page"] * 4 + ["video"] * 4),
        "page_index": pa.array([None] * 4 + [0, 1, 2, 3] + [None] * 4,
                               pa.int32()),
        "total_frames": pa.array([None] * 8 + [90, 60, 30, 0], pa.int32()),
    })
    out = route_media_pipeline(
        rd.from_arrow(units).materialize(), every_n=30,
        concurrency=2, batch_size=4,
    ).to_pandas()
    # 8 stills + sampled frames: 90->3, 60->2, 30->1, 0->0
    assert len(out) == 8 + 3 + 2 + 1
    assert set(out["kind"]) == {"image", "pdf_page", "video"}
    # stills carry null frame_index; video rows carry their frame
    assert out.loc[out["kind"] != "video", "frame_index"].isna().all()
    assert sorted(out.loc[out["media_ref"] == "m8", "frame_index"]) == [0, 30, 60]
    # every routed row came out decoded + embedded through the shared tail
    assert out["media_bytes"].notna().all()
    assert out["embedding"].notna().all()
    assert {len(v) for v in out["embedding"]} == {64}
