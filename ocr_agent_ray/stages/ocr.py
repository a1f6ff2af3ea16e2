"""OCR engine adapters + the actor-pool inference stage.

The reference's hot loop is one GPU inference per task inside a lazily
loaded singleton runner (/root/reference/src/ocr_agent/deepseek_ocr2_runner.py:72-177).
Here the same shape becomes a Ray Data actor pool: the engine is
constructed ONCE per actor in ``__init__`` and invoked per Arrow batch in
``__call__`` — N concurrent copies of the reference's load-once semantics.

Engines implement ``infer_batch(media_refs, page_indices) -> list[Any]``
(batch-of-images -> batch-of-raw-model-results); raw results are normalized
with :func:`ocr_agent_ray.functions.kernels.normalize_infer_result_to_markdown`,
mirroring deepseek_ocr2_runner.py:37-52.
"""

from __future__ import annotations

import hashlib
import random
from typing import Any, Protocol, Sequence

import pyarrow as pa

from ocr_agent_ray.functions.kernels import normalize_infer_result_to_markdown
from ocr_agent_ray.schema import MEDIA_KINDS
from ocr_agent_ray.stages.postprocess import FinalizeStage
from ocr_agent_ray.state.checkpoint import MetricsSpool


class OcrEngine(Protocol):
    def infer_batch(
        self, media_refs: Sequence[str], page_indices: Sequence[int | None]
    ) -> list[Any]: ...


# --- deterministic mock engine -------------------------------------------
# The sandbox has no GPU (the reference hard-fails without CUDA,
# deepseek_ocr2_runner.py:92-94). The mock is a pure function of
# (media_ref, page_index) so goldens are stable under any parallelism.

_MOCK_SENTENCES = [
    "The quarterly revenue grew by 12 percent.",
    "Figure 3 shows the measured distribution.",
    "All samples were normalized before analysis.",
    "Results are summarized in the table below.",
    "See appendix B for derivations.",
]

_MOCK_MATH = [
    "Inline math \\( {a} + {b} \\) appears here.",
    "Displayed equation:\n\\[\n  E_{a} = m c^{b}\n\\]\nend.",
    "Nested forms \\[ f({a}) = \\( {b} \\) \\] are rare.",
]

_MOCK_FENCES = [
    "```\ncode with \\( untouched \\) math\n```",
    "~~~\ntilde fence \\[ also untouched \\]\n~~~",
    "  ```python\nindented fence \\( still code \\)\n  ```",
    "````\nlong fence\n```\nstill code \\( here \\)\n````",
]

_MOCK_GROUNDING = [
    "<|ref|>title<|/ref|><|det|>[[{x}, {y}, {x2}, {y2}]]<|/det|> Document Title",
    "<|ref|>table<|/ref|><|det|>[[{x},{y},{x2},{y2}]]<|/det|>\n| a | b |\n| - | - |\n| 1 | 2 |",
]


def mock_markdown_for(media_ref: str, page_index: int | None) -> Any:
    """Deterministic raw model result for one media item.

    Returns the same *shape variety* the reference normalizer handles
    (str / dict / None / empty), keyed purely on content so any two
    executions agree.
    """
    seed = f"ocr:{media_ref}:{page_index if page_index is not None else -1}"
    rng = random.Random(seed)
    roll = rng.random()
    if roll < 0.04:
        return None  # normalized to "" -> section dropped (markdown_merge.py:36-38)
    if roll < 0.07:
        return "   \n  "  # whitespace-only -> also dropped

    parts: list[str] = []
    for _ in range(rng.randint(1, 4)):
        bucket = rng.random()
        if bucket < 0.40:
            parts.append(rng.choice(_MOCK_SENTENCES))
        elif bucket < 0.65:
            t = rng.choice(_MOCK_MATH)
            parts.append(t.format(a=rng.randint(1, 9), b=rng.randint(1, 9)))
        elif bucket < 0.82:
            parts.append(rng.choice(_MOCK_FENCES))
        else:
            t = rng.choice(_MOCK_GROUNDING)
            x, y = rng.randint(0, 500), rng.randint(0, 500)
            parts.append(t.format(x=x, y=y, x2=x + rng.randint(10, 300), y2=y + rng.randint(10, 300)))
    body = "\n\n".join(parts)

    shape = rng.random()
    if shape < 0.10:
        return {"markdown": body}
    if shape < 0.15:
        return {"text": body, "extra": 1}
    return body


class MockOcrEngine:
    """Pure-function engine; safe to construct in every actor.

    ``work_ms`` emulates per-page model latency with deterministic-output
    busy work (the real model runs ~1 s/page on GPU,
    deepseek_ocr2_runner.py:122-177; benchmarks use a few ms so the OCR
    stage is compute-bound the way the real pipeline is). Output is
    independent of work_ms.
    """

    def __init__(self, work_ms: float = 0.0) -> None:
        self.work_ms = work_ms

    def _burn(self) -> None:
        if self.work_ms <= 0:
            return
        import time

        deadline = time.perf_counter() + self.work_ms / 1000.0
        h = b"x"
        while time.perf_counter() < deadline:
            h = hashlib.blake2b(h, digest_size=32).digest()

    def infer_batch(
        self, media_refs: Sequence[str], page_indices: Sequence[int | None]
    ) -> list[Any]:
        out = []
        for r, p in zip(media_refs, page_indices):
            self._burn()
            out.append(mock_markdown_for(r, p))
        return out


def _read_png_text_chunk(data: bytes, key: bytes = b"ocr-text") -> str | None:
    """Extract a tEXt chunk payload from PNG bytes (fixture metadata)."""
    import struct

    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos = 8
    prefix = key + b"\x00"
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"tEXt" and payload.startswith(prefix):
            return payload[len(prefix):].decode("latin-1")
        if tag == b"IEND":
            break
        pos += 12 + length
    return None


class MetadataOcrEngine:
    """Deterministic text-from-image-metadata engine — the SURVEY.md §5
    mock: reads the ``ocr-text`` tEXt chunk of fixture PNGs (written by
    tools/generate_text_image.py) behind the same batch adapter interface
    as the real model. Stands in for the reference's GPU integration test
    (tests/test_synthetic_ocr.py:43-63) so the normalized-containment
    conformance check runs without CUDA. media_ref is a filesystem path.
    """

    def infer_batch(
        self, media_refs: Sequence[str], page_indices: Sequence[int | None]
    ) -> list[Any]:
        out: list[Any] = []
        for ref in media_refs:
            try:
                with open(ref, "rb") as f:
                    data = f.read()
            except OSError:
                out.append(None)
                continue
            out.append(_read_png_text_chunk(data))
        return out


class DeepSeekOcr2Engine:
    """GPU adapter skeleton (STUB — no CUDA/model in this container).

    Faithful to the reference's load-once runner
    (deepseek_ocr2_runner.py:78-120): tokenizer+model loaded in __init__,
    bf16/fp16 pick, flash-attention fallback, batched infer in infer_batch.
    The Ray-side plumbing (actor signature, batch flow) is real and tested
    via MockOcrEngine; only the model call is stubbed.
    """

    def __init__(self, settings: Any = None) -> None:
        raise NotImplementedError(
            "DeepSeek-OCR-2 requires CUDA + model weights (reference "
            "deepseek_ocr2_runner.py:92-94); unavailable in this environment. "
            "Use MockOcrEngine, or implement infer_batch with "
            "AutoModel.from_pretrained(...).eval().cuda() on a GPU node."
        )

    def infer_batch(self, media_refs, page_indices):  # pragma: no cover
        raise NotImplementedError


class OcrFinalizeStage:
    """OCR + finalize fused in one actor callable.

    Post-processing is cheap CPU relative to inference, so running it
    inside the OCR actor removes an entire operator (its task overhead and
    block hop) from the hot path; the separate FinalizeStage remains for
    pipelines that need the intermediate units.
    """

    def __init__(self, engine_factory=None, fail_fast: bool = False,
                 metrics_dir: str | None = None, math_style: str = "dollar") -> None:
        self.ocr = OcrStage(
            engine_factory=engine_factory or MockOcrEngine,
            fail_fast=fail_fast, metrics_dir=metrics_dir,
        )
        self.finalize = FinalizeStage(math_style=math_style, metrics_dir=metrics_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.finalize(self.ocr(batch))


def _stable_u64(text: str) -> int:
    return int.from_bytes(hashlib.blake2b(text.encode(), digest_size=8).digest(), "big")


class OcrStage:
    """Actor-pool ``map_batches`` callable: OCR media rows, pass text rows.

    Use as::

        ds.map_batches(OcrStage, fn_constructor_kwargs={"engine_factory": MockOcrEngine},
                       batch_format="pyarrow", batch_size=B, concurrency=N)

    Rows with kind in ('image', 'pdf_page') and empty text get engine
    output (normalized, deepseek_ocr2_runner.py:37-52); 'text' rows pass
    through untouched. Per-row engine failures are recorded in an
    ``error_message`` column and yield empty text — the reference's
    mark-failed-and-continue semantics (cli.py:239-244), never a retry.
    """

    def __init__(self, engine_factory=MockOcrEngine, fail_fast: bool = False,
                 metrics_dir: str | None = None,
                 max_error_fraction: float = 0.5,
                 min_rows_for_error_cap: int = 64) -> None:
        self.engine = engine_factory()  # once per actor
        self.fail_fast = fail_fast
        # systemic-failure guard (the max_errored_blocks-style cap of
        # SURVEY §4): per-row poison pills are tolerated, but once more
        # than max_error_fraction of this actor's attempted media rows have
        # failed (after a minimum sample), the engine is considered broken
        # and the run aborts instead of silently emitting an empty corpus
        self.max_error_fraction = max_error_fraction
        self.min_rows_for_error_cap = min_rows_for_error_cap
        self._attempted = 0
        self._failed = 0
        self.spool = MetricsSpool(metrics_dir) if metrics_dir else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.monotonic()
        kinds = batch["kind"].to_pylist()
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        pages = batch["page_index"].to_pylist()

        todo = [i for i, (k, t) in enumerate(zip(kinds, texts)) if k in MEDIA_KINDS and not t]
        errors: list[str | None] = [None] * len(kinds)
        if todo:
            try:
                results = self.engine.infer_batch(
                    [refs[i] for i in todo], [pages[i] for i in todo]
                )
                for i, raw in zip(todo, results):
                    texts[i] = normalize_infer_result_to_markdown(raw)
            except Exception:
                # batch-level engine fault: fall back to per-row isolation
                for i in todo:
                    try:
                        raw = self.engine.infer_batch([refs[i]], [pages[i]])[0]
                        texts[i] = normalize_infer_result_to_markdown(raw)
                    except Exception as exc:  # poison pill: record, continue
                        if self.fail_fast:
                            raise
                        texts[i] = ""
                        errors[i] = str(exc)
                        self._failed += 1
            self._attempted += len(todo)
            if (self._attempted >= self.min_rows_for_error_cap
                    and self._failed > self.max_error_fraction * self._attempted):
                sample = next((e for e in reversed(errors) if e), "")
                raise RuntimeError(
                    f"OCR engine failing systemically: {self._failed}/"
                    f"{self._attempted} media rows errored in degraded "
                    f"batches (cap {self.max_error_fraction:.0%}); "
                    f"sample: {sample!r}"
                )

        out = batch.set_column(
            batch.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
        )
        out = out.append_column("error_message", pa.array(errors, pa.string()))
        if self.spool is not None:
            wall_ms = int((_time.monotonic() - t0) * 1000)
            self.spool.append(
                "ocr",
                self.spool.rows_for("ocr", batch["partition_id"].to_pylist(), wall_ms),
            )
        return out
