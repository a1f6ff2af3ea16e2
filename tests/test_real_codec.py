"""RealCodec adapter behavior with fake pypdfium2 / PIL / av modules.

No media wheels in this container, so the guard semantics (parity with
reference pdf_render.py:16-81: FileNotFoundError on missing input,
ValueError on bad page index, scale=dpi/72, best-effort close of every
pdfium handle) are exercised against stub modules, the same way
test_deepseek_engine.py fakes torch/transformers.
"""

from __future__ import annotations

import io
import struct
import sys
import types

import numpy as np
import pytest

from ocr_agent_ray.stages.media import RealCodec


# -- fakes -------------------------------------------------------------------


class _FakeImage:
    def __init__(self, width, height, pixels=None):
        self.width = width
        self.height = height
        self.size = (width, height)
        self._pixels = (
            pixels
            if pixels is not None
            else np.arange(width * height, dtype=np.float32).reshape(height, width)
        )
        self.saves = []

    def convert(self, mode):
        return self

    def resize(self, wh):
        w, h = wh
        return _FakeImage(w, h, np.resize(self._pixels, (h, w)))

    def save(self, buf, format=None):
        assert format == "PNG"
        self.saves.append(format)
        buf.write(b"PNGFAKE" + struct.pack("<ii", self.width, self.height))

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._pixels)
        return a.astype(dtype) if dtype is not None else a

    # PIL.Image.open is used as a context manager
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _fake_pil(opened: _FakeImage):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def _open(src):
        return opened

    image_mod.open = _open
    pil.Image = image_mod
    return pil, image_mod


class _FakeRenderer:
    def __init__(self, scale, log):
        self.scale = scale
        self.log = log

    def to_pil(self):
        return _FakeImage(int(612 * self.scale), int(792 * self.scale))

    def close(self):
        self.log.append("renderer")


class _FakePage:
    def __init__(self, log):
        self.log = log
        self.render_scales = []

    def render(self, scale):
        self.render_scales.append(scale)
        return _FakeRenderer(scale, self.log)

    def close(self):
        self.log.append("page")


class _FakePdfDocument:
    last = None

    def __init__(self, path, n_pages=3):
        self.path = path
        self.n_pages = n_pages
        self.close_log = []
        self.pages = {}
        _FakePdfDocument.last = self

    def __len__(self):
        return self.n_pages

    def __getitem__(self, i):
        page = _FakePage(self.close_log)
        self.pages[i] = page
        return page

    def close(self):
        self.close_log.append("document")


def _fake_pdfium():
    mod = types.ModuleType("pypdfium2")
    mod.PdfDocument = _FakePdfDocument
    return mod


@pytest.fixture
def codec(monkeypatch, tmp_path):
    opened = _FakeImage(64, 48)
    pil, image_mod = _fake_pil(opened)
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    monkeypatch.setitem(sys.modules, "pypdfium2", _fake_pdfium())
    c = RealCodec()
    c._test_opened_image = opened
    c._test_tmp = tmp_path
    return c


def _touch(tmp_path, name="doc.pdf"):
    p = tmp_path / name
    p.write_bytes(b"%PDF-fake")
    return str(p)


# -- rasterize: parity with pdf_render.py:28-62 -------------------------------


def test_rasterize_scale_is_dpi_over_72_and_payload_is_png(codec):
    path = _touch(codec._test_tmp)
    payload, w, h = codec.rasterize_pdf_page(path, 1, dpi=200)
    doc = _FakePdfDocument.last
    assert doc.pages[1].render_scales == [200 / 72]
    assert payload.startswith(b"PNGFAKE")
    assert (w, h) == (int(612 * 200 / 72), int(792 * 200 / 72))
    # every pdfium handle closed, innermost first (pdf_render.py:59-62)
    assert doc.close_log == ["renderer", "page", "document"]


def test_rasterize_missing_file_raises(codec):
    with pytest.raises(FileNotFoundError):
        codec.rasterize_pdf_page(str(codec._test_tmp / "nope.pdf"), 0)


def test_rasterize_negative_page_raises(codec):
    path = _touch(codec._test_tmp)
    with pytest.raises(ValueError, match=">= 0"):
        codec.rasterize_pdf_page(path, -1)


def test_rasterize_out_of_range_page_raises_and_still_closes(codec):
    path = _touch(codec._test_tmp)
    with pytest.raises(ValueError, match="out of range"):
        codec.rasterize_pdf_page(path, 3)  # fake doc has 3 pages: 0..2
    assert _FakePdfDocument.last.close_log == ["document"]


def test_page_count(codec):
    path = _touch(codec._test_tmp)
    assert codec.page_count(path) == 3
    assert _FakePdfDocument.last.close_log == ["document"]
    with pytest.raises(FileNotFoundError):
        codec.page_count(str(codec._test_tmp / "nope.pdf"))


# -- image paths ---------------------------------------------------------------


def test_decode_image_and_resize_and_embed(codec):
    path = _touch(codec._test_tmp, "pic.img")
    payload, w, h = codec.decode_image(path)
    assert (w, h) == (64, 48)
    assert payload.startswith(b"PNGFAKE")

    resized, w2, h2 = codec.resize(payload, 32)
    assert (w2, h2) == (32, 32)
    assert struct.unpack("<ii", resized[7:15]) == (32, 32)

    v = codec.embed(payload, dim=16)
    assert v.shape == (16,) and v.dtype == np.float32
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_embed_constant_image_falls_back_to_unit_basis(codec, monkeypatch):
    flat = _FakeImage(8, 8, np.zeros((8, 8), dtype=np.float32))
    _, image_mod = _fake_pil(flat)
    monkeypatch.setattr(codec, "_Image", image_mod)
    v = codec.embed(b"whatever", dim=8)
    assert v[0] == 1.0 and float(np.linalg.norm(v)) == 1.0


def test_decode_image_missing_file_raises(codec):
    with pytest.raises(FileNotFoundError):
        codec.decode_image(str(codec._test_tmp / "nope.img"))


# -- video path -----------------------------------------------------------------


def test_decode_frame_without_av_is_import_guarded(codec, monkeypatch):
    monkeypatch.setitem(sys.modules, "av", None)  # force ImportError
    with pytest.raises(NotImplementedError, match="PyAV"):
        codec.decode_frame(_touch(codec._test_tmp, "clip.mp4"), 0)


def test_decode_frame_with_fake_av(codec, monkeypatch):
    class _FakeFrame:
        def __init__(self, i):
            self.i = i

        def to_image(self):
            return _FakeImage(320, 240)

    class _FakeContainer:
        def decode(self, video=0):
            return iter(_FakeFrame(i) for i in range(4))

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    av = types.ModuleType("av")
    av.open = lambda path: _FakeContainer()
    monkeypatch.setitem(sys.modules, "av", av)

    path = _touch(codec._test_tmp, "clip.mp4")
    payload, w, h = codec.decode_frame(path, 2)
    assert (w, h) == (320, 240) and payload.startswith(b"PNGFAKE")
    with pytest.raises(ValueError, match="out of range"):
        codec.decode_frame(path, 9)
    with pytest.raises(ValueError, match=">= 0"):
        codec.decode_frame(path, -1)
    with pytest.raises(FileNotFoundError):
        codec.decode_frame(str(codec._test_tmp / "nope.mp4"), 0)


# -- container guard ------------------------------------------------------------


def test_realcodec_import_guard_in_this_container():
    # no pypdfium2/PIL wheels here: the constructor must explain itself
    for mod in ("pypdfium2", "PIL"):
        if mod in sys.modules:  # pragma: no cover - container has neither
            pytest.skip(f"{mod} unexpectedly installed")
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        RealCodec()


def test_rasterize_stage_accepts_realcodec_factory(codec):
    """RealCodec satisfies the stage contract DeterministicFakeCodec does:
    RasterizeStage(codec_factory=...) only needs the constructed instance."""
    from ocr_agent_ray.stages.media import RasterizeStage

    stage = RasterizeStage.__new__(RasterizeStage)
    stage.codec = codec
    stage.dpi = 144
    stage.spool = None
    import pyarrow as pa

    path = _touch(codec._test_tmp)
    batch = pa.table({
        "kind": ["pdf_page", "other"],
        "media_ref": [path, path],
        "page_index": [0, None],
    })
    out = stage(batch)
    assert out["media_bytes"][0].as_py().startswith(b"PNGFAKE")
    assert out["media_bytes"][1].as_py() is None
    assert out["width"][0].as_py() == int(612 * 144 / 72)
