"""Multimodal stages: rasterize, decode, resize, feature-extract, frame-sample.

Media flows as opaque ``binary`` columns with typed metadata — the Ray-side
plumbing (schemas, batch sizing, actor signatures, output layout) is real
and tested; the codec calls themselves are STUBBED behind
``DeterministicFakeCodec`` because no image/audio libraries exist in this
container (a real deployment drops in PIL/pypdfium/ffmpeg without touching
the pipeline shape).

Reference analogs: PDF page rasterization at 200 DPI
(/root/reference/src/ocr_agent/pdf_render.py:28-62, scale=dpi/72 at
:78-81) and the base/inference image sizing knobs
(/root/reference/src/ocr_agent/config.py:57-68).

Memory note (100 TB discipline): decoded media rows are MB-scale, so these
stages use SMALL batch sizes and should run with a reduced
``target_max_block_size`` so a batch × pool width fits worker heaps; pass
``media_ref`` indirection instead of bytes when pages exceed ~10 MB.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ocr_agent_ray.functions.scalars import dots_per_inch_to_scale
from ocr_agent_ray.state.checkpoint import MetricsSpool

MEDIA_SCHEMA_FIELDS = [
    pa.field("media_ref", pa.string()),
    pa.field("media_bytes", pa.binary()),
    pa.field("mime_type", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
]


class DeterministicFakeCodec:
    """Stand-in codec: pure function of (media_ref, params) -> fake payload.

    Real decode is NotImplemented in this container; the fake keeps every
    byte deterministic so plumbing tests are exact. Payload layout:
    16-byte blake2b of the ref + packed (width, height).
    """

    def rasterize_pdf_page(self, media_ref: str, page_index: int,
                           dpi: int = 200) -> tuple[bytes, int, int]:
        scale = dots_per_inch_to_scale(dpi)
        w, h = int(612 * scale), int(792 * scale)  # US-Letter at dpi
        seed = hashlib.blake2b(
            f"{media_ref}:{page_index}:{dpi}".encode(), digest_size=16
        ).digest()
        return seed + struct.pack("<ii", w, h), w, h

    def decode_image(self, media_ref: str) -> tuple[bytes, int, int]:
        seed = hashlib.blake2b(media_ref.encode(), digest_size=16).digest()
        w = 640 + seed[0] * 4
        h = 480 + seed[1] * 4
        return seed + struct.pack("<ii", w, h), w, h

    def resize(self, payload: bytes, target: int) -> tuple[bytes, int, int]:
        seed = hashlib.blake2b(payload + struct.pack("<i", target),
                               digest_size=16).digest()
        return seed + struct.pack("<ii", target, target), target, target

    def embed(self, payload: bytes, dim: int = 64) -> np.ndarray:
        # deterministic pseudo-embedding from payload bytes
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big") % (2**63))
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def decode_frame(self, media_ref: str, frame_index: int) -> tuple[bytes, int, int]:
        seed = hashlib.blake2b(f"{media_ref}#frame{frame_index}".encode(),
                               digest_size=16).digest()
        w, h = 1280, 720
        return seed + struct.pack("<ii", w, h), w, h


class RealCodec:  # pragma: no cover - requires media libraries
    """Adapter point for PIL / pypdfium2 / ffmpeg in a real deployment."""

    def __init__(self) -> None:
        raise NotImplementedError(
            "No image/PDF/audio codecs in this container. Implement "
            "rasterize_pdf_page with pypdfium2 at scale=dpi/72 "
            "(pdf_render.py:28-62) and decode_image with PIL."
        )


class RasterizeStage:
    """Actor-pool map_batches: pdf_page work units -> page image bytes.

    The analog of render_pdf_page_to_image_file (pdf_render.py:28-62) with
    the file-system cache replaced by checkpoint-level skip. Codec is
    constructed once per actor. Non-pdf rows pass through with null bytes.
    """

    def __init__(self, codec_factory=DeterministicFakeCodec, dpi: int = 200,
                 metrics_dir: str | None = None) -> None:
        self.codec = codec_factory()
        self.dpi = dpi
        self.spool = MetricsSpool(metrics_dir) if metrics_dir else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.monotonic()
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        pages = batch["page_index"].to_pylist()
        payloads: list[bytes | None] = [None] * len(kinds)
        widths: list[int | None] = [None] * len(kinds)
        heights: list[int | None] = [None] * len(kinds)
        for i, (k, r, p) in enumerate(zip(kinds, refs, pages)):
            if k == "pdf_page":
                payloads[i], widths[i], heights[i] = self.codec.rasterize_pdf_page(
                    r, p or 0, self.dpi
                )
            elif k == "image":
                payloads[i], widths[i], heights[i] = self.codec.decode_image(r)
        out = (
            batch.append_column("media_bytes", pa.array(payloads, pa.binary()))
            .append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
        )
        if self.spool is not None and "partition_id" in batch.column_names:
            wall_ms = int((_time.monotonic() - t0) * 1000)
            self.spool.append(
                "rasterize",
                self.spool.rows_for("rasterize",
                                    batch["partition_id"].to_pylist(), wall_ms),
            )
        return out


class ResizeStage:
    """Resize decoded media to the model's inference size (config.py:57-68)."""

    def __init__(self, codec_factory=DeterministicFakeCodec,
                 target_pixels: int = 768) -> None:
        self.codec = codec_factory()
        self.target = target_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media_bytes"].to_pylist()
        out, ws, hs = [], [], []
        for p in payloads:
            if p is None:
                out.append(None); ws.append(None); hs.append(None)
            else:
                b, w, h = self.codec.resize(p, self.target)
                out.append(b); ws.append(w); hs.append(h)
        idx = batch.schema.get_field_index
        return (
            batch.set_column(idx("media_bytes"), "media_bytes", pa.array(out, pa.binary()))
            .set_column(idx("width"), "width", pa.array(ws, pa.int32()))
            .set_column(idx("height"), "height", pa.array(hs, pa.int32()))
        )


class MediaEmbedStage:
    """Feature-extract media bytes -> embedding column (list<float32>)."""

    def __init__(self, codec_factory=DeterministicFakeCodec, dim: int = 64) -> None:
        self.codec = codec_factory()
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media_bytes"].to_pylist()
        vecs = [
            None if p is None else self.codec.embed(p, self.dim).tolist()
            for p in payloads
        ]
        return batch.append_column(
            "embedding", pa.array(vecs, pa.list_(pa.float32()))
        )


def frame_sample_indices(total_frames: int, every_n: int) -> list[int]:
    """Frame sampling for video media: indices 0, n, 2n, ... (pure kernel;
    the decode itself is stubbed like images)."""
    if total_frames <= 0 or every_n <= 0:
        return []
    return list(range(0, total_frames, every_n))


class FrameSampleStage:
    """Actor-pool 1→N flat map: video rows → one row per sampled frame.

    Input rows: (media_ref: string, total_frames: int32). Output adds
    (frame_index: int32, media_bytes: binary, width, height) with every
    sampled frame decoded through the per-actor codec — the video analog
    of the pdf page fan-out (vectorized repeat on the Arrow side; only
    the codec call is per-frame, as it must be).
    """

    def __init__(self, codec_factory=DeterministicFakeCodec,
                 every_n: int = 30) -> None:
        self.codec = codec_factory()
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        totals = batch["total_frames"].to_pylist()
        out_ref, out_idx, out_bytes, ws, hs = [], [], [], [], []
        for ref, total in zip(refs, totals):
            for fi in frame_sample_indices(int(total or 0), self.every_n):
                payload, w, h = self.codec.decode_frame(ref, fi)
                out_ref.append(ref)
                out_idx.append(fi)
                out_bytes.append(payload)
                ws.append(w)
                hs.append(h)
        return pa.Table.from_arrays(
            [pa.array(out_ref, pa.string()),
             pa.array(out_idx, pa.int32()),
             pa.array(out_bytes, pa.binary()),
             pa.array(ws, pa.int32()),
             pa.array(hs, pa.int32())],
            names=["media_ref", "frame_index", "media_bytes", "width", "height"],
        )


def build_media_pipeline(units_ds, *, codec_factory=DeterministicFakeCodec,
                         dpi: int = 200, target_pixels: int = 768,
                         concurrency: int = 4, batch_size: int = 16):
    """units -> rasterize -> resize -> embed, all actor pools with small
    batches (MB-scale rows)."""
    raster = units_ds.map_batches(
        RasterizeStage,
        fn_constructor_kwargs={"codec_factory": codec_factory, "dpi": dpi},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    resized = raster.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"codec_factory": codec_factory,
                               "target_pixels": target_pixels},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    return resized.map_batches(
        MediaEmbedStage,
        fn_constructor_kwargs={"codec_factory": codec_factory},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )


ROUTED_MEDIA_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("frame_index", pa.int32()),   # null for still media
    pa.field("media_bytes", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
])


def route_media_pipeline(units_ds, *, codec_factory=DeterministicFakeCodec,
                         dpi: int = 200, target_pixels: int = 768,
                         every_n: int = 30, concurrency: int = 4,
                         batch_size: int = 16):
    """Modality ROUTER: one mixed-kind media stream (image / pdf_page /
    video rows) fans into per-modality actor-pool branches — stills
    through RasterizeStage, videos through the FrameSampleStage 1→N
    fan-out — then unions back into ONE typed stream
    (ROUTED_MEDIA_SCHEMA) for the shared resize → embed tail. The union
    is schema-aligned Arrow, so downstream stages see a single stream and
    the actor pools per modality size independently (a GPU video decoder
    pool can be 2 wide while the image pool is 16 wide).

    ``units_ds`` feeds two branch filters (two plan consumers): pass a
    cheap-to-recompute or materialized Dataset, exactly like the dedup
    verify sides."""
    import pyarrow.compute as pc

    still_kinds = pa.array(["image", "pdf_page"])

    def _stills(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["kind"], value_set=still_kinds))

    def _videos(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["kind"], "video"))

    def _align_still(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["media_ref"], b["kind"],
             pa.array([None] * len(b), pa.int32()),
             b["media_bytes"], b["width"], b["height"]],
            schema=ROUTED_MEDIA_SCHEMA)

    def _align_video(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["media_ref"], pa.array(["video"] * len(b), pa.string()),
             b["frame_index"], b["media_bytes"], b["width"], b["height"]],
            schema=ROUTED_MEDIA_SCHEMA)

    still_out = (
        units_ds.map_batches(_stills, batch_format="pyarrow")
        .map_batches(RasterizeStage,
                     fn_constructor_kwargs={"codec_factory": codec_factory,
                                            "dpi": dpi},
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=(1, concurrency))
        .map_batches(_align_still, batch_format="pyarrow")
    )
    video_out = (
        units_ds.map_batches(_videos, batch_format="pyarrow")
        .map_batches(FrameSampleStage,
                     fn_constructor_kwargs={"codec_factory": codec_factory,
                                            "every_n": every_n},
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=(1, max(1, concurrency // 2)))
        .map_batches(_align_video, batch_format="pyarrow")
    )

    merged = still_out.union(video_out)
    resized = merged.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"codec_factory": codec_factory,
                               "target_pixels": target_pixels},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    return resized.map_batches(
        MediaEmbedStage,
        fn_constructor_kwargs={"codec_factory": codec_factory},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
