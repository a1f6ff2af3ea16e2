"""Pure per-record kernels — exact behavioral reimplementations.

These functions reproduce, bit-for-bit, the observable behavior of the
reference's post-processing and rendering logic (cited per function).
They are shared by BOTH the Ray pipeline stages and the sequential oracle
(ocr_agent_ray/oracle.py is an independent sequential driver over the same
semantics), and are golden-tested in tests/test_kernels.py.

All functions here are pure (no I/O, no Ray); vectorized wrappers live in
the stage modules.
"""

from __future__ import annotations

import re
from typing import Any

# --- math-delimiter conversion -------------------------------------------
# Behavior of /root/reference/src/ocr_agent/markdown_merge.py:50-136:
#   * \( x \)  -> $x$      (content .strip()-ed), DOTALL, non-greedy
#   * \[ x \]  -> $$\nx\n$$ (content .strip("\n")-ed), DOTALL, non-greedy
#   * block substitution runs BEFORE inline (observable when a \[..\] body
#     contains \(..\): the inline sub then runs over the rewritten text)
#   * fenced code blocks are left untouched; a fence line matches
#     ^\s*(`{3,}|~{3,}); an open fence is closed by any fence line whose
#     marker starts with the same character (backtick closes backtick,
#     tilde closes tilde, length ignored). NOTE: the reference has an
#     "indented fences are plain text" guard (markdown_merge.py:97-103) that
#     is dead code — its fence regex only captures whitespace as indent, so
#     indent.strip() is always ""; behaviorally, indented fences DO toggle
#     fencing, and we reproduce that behavior, not the comment.

_INLINE_MATH_RE = re.compile(r"\\\((.+?)\\\)", flags=re.DOTALL)
_BLOCK_MATH_RE = re.compile(r"\\\[(.+?)\\\]", flags=re.DOTALL)
_FENCE_RE = re.compile(r"^(\s*)(`{3,}|~{3,})")

MATH_STYLE_DOLLAR = "dollar"
MATH_STYLE_LATEX = "latex"


def convert_math_delimiters_plain(markdown_text: str) -> str:
    """Rewrite LaTeX math delimiters to dollar style in non-code text.

    Parity: /root/reference/src/ocr_agent/markdown_merge.py:124-136.
    """

    def _block(m: re.Match[str]) -> str:
        return "$$\n" + m.group(1).strip("\n") + "\n$$"

    def _inline(m: re.Match[str]) -> str:
        return "$" + m.group(1).strip() + "$"

    return _INLINE_MATH_RE.sub(_inline, _BLOCK_MATH_RE.sub(_block, markdown_text))


def convert_math_delimiters_fence_aware(markdown_text: str) -> str:
    """Dollar-conversion that skips fenced code blocks.

    Parity: /root/reference/src/ocr_agent/markdown_merge.py:63-121.
    """
    out: list[str] = []
    plain_run: list[str] = []
    in_fence = False
    fence_char: str | None = None

    def _flush() -> None:
        if plain_run:
            out.append(convert_math_delimiters_plain("".join(plain_run)))
            plain_run.clear()

    for line in markdown_text.splitlines(keepends=True):
        m = _FENCE_RE.match(line)
        if m is None:
            (out if in_fence else plain_run).append(line)
            continue
        marker = m.group(2)
        if not in_fence:
            _flush()
            in_fence = True
            fence_char = marker[0]
            out.append(line)
        elif fence_char is not None and marker.startswith(fence_char):
            in_fence = False
            fence_char = None
            out.append(line)
        else:
            out.append(line)

    _flush()
    return "".join(out)


def post_process_markdown(markdown_text: str, math_style: str = MATH_STYLE_DOLLAR) -> str:
    """Apply the math conversion iff style == 'dollar'.

    Parity: /root/reference/src/ocr_agent/markdown_merge.py:55-60 (default
    style 'dollar' per config.py:26-29).
    """
    if math_style != MATH_STYLE_DOLLAR:
        return markdown_text
    return convert_math_delimiters_fence_aware(markdown_text)


# --- section headers ------------------------------------------------------

def render_header_text(kind: str, media_ref: str, page_index: int | None,
                       total_pages: int | None) -> str:
    """Section header for one work unit.

    Parity: /root/reference/src/ocr_agent/markdown_merge.py:139-152 —
    images get ``## <ref>``; pdf pages get ``## <ref> (page i/N)`` with
    1-based page number, falling back to the bare form when page metadata
    is missing.
    """
    if kind == "pdf_page" and page_index is not None and total_pages is not None:
        return f"## {media_ref} (page {page_index + 1}/{total_pages})"
    return f"## {media_ref}"


# --- grounding-token parsing ---------------------------------------------
# The model's grounded output embeds <|ref|>TYPE<|/ref|><|det|>[[x1,y1,x2,y2]]
# <|/det|> tokens; the reference's only parser is the GUI preview regex
# (/root/reference/gui/src/PreviewPanel.tsx:35-36). Promoted here to a core
# operator: extract typed rectangles from markdown text.

_DET_RE = re.compile(
    r"<\|ref\|>(.*?)<\|/ref\|><\|det\|>\[\[(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\]\]<\|/det\|>"
)


def parse_grounding_detections(text: str) -> list[tuple[str, int, int, int, int]]:
    """Extract ``(ref_type, x1, y1, x2, y2)`` detection tuples in order."""
    return [
        (m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4)), int(m.group(5)))
        for m in _DET_RE.finditer(text)
    ]


def strip_grounding_tokens(text: str) -> str:
    """Remove grounding ref/det token pairs, keeping the ref label text."""
    return _DET_RE.sub(lambda m: m.group(1), text)


# --- layout reading order -------------------------------------------------

def layout_reading_order(
    detections: list[tuple[str, int, int, int, int]], *, row_tolerance: int = 20
) -> list[int]:
    """Reading order for grounded layout rectangles: cluster boxes into
    rows by y1 (within ``row_tolerance`` px of the row's running top),
    then order left-to-right within a row, rows top-to-bottom — the
    layout-parse step the north rule pairs with the grounding extractor.
    Returns indices into ``detections`` in reading order.
    """
    if not detections:
        return []
    order = sorted(range(len(detections)),
                   key=lambda i: (detections[i][2], detections[i][1]))
    rows: list[list[int]] = []
    row_top: int | None = None
    for i in order:
        y1 = detections[i][2]
        if row_top is None or y1 - row_top > row_tolerance:
            rows.append([i])
            row_top = y1
        else:
            rows[-1].append(i)
    out: list[int] = []
    for row in rows:
        out.extend(sorted(row, key=lambda i: (detections[i][1], detections[i][2])))
    return out


# --- model-output normalization ------------------------------------------

def normalize_infer_result_to_markdown(infer_result: Any) -> str:
    """Normalize an arbitrary model return value to a markdown string.

    Parity: /root/reference/src/ocr_agent/deepseek_ocr2_runner.py:37-52 —
    None -> "", str -> itself, dict -> first string value among keys
    (markdown, text, result, output, response) else str(dict), other -> str().
    """
    if infer_result is None:
        return ""
    if isinstance(infer_result, str):
        return infer_result
    if isinstance(infer_result, dict):
        for key in ("markdown", "text", "result", "output", "response"):
            value = infer_result.get(key)
            if isinstance(value, str):
                return value
        return str(infer_result)
    return str(infer_result)


# --- conformance-test normalizer -----------------------------------------

_NON_WORD_RE = re.compile(r"[^a-z0-9_]")


def normalize_text_for_contains_check(text: str) -> str:
    """Lowercase and strip everything outside [a-z0-9_].

    Parity: /root/reference/tests/test_synthetic_ocr.py:34-36 (the
    reference's test-side normalizer; part of our conformance harness).
    """
    return _NON_WORD_RE.sub("", text.lower())


# --- supported-input predicates ------------------------------------------
# Parity: /root/reference/src/ocr_agent/input_discovery.py:14-24, 112-121.

SUPPORTED_IMAGE_EXTENSIONS = frozenset(
    {".png", ".jpg", ".jpeg", ".webp", ".bmp", ".tif", ".tiff"}
)
SUPPORTED_PDF_EXTENSIONS = frozenset({".pdf"})


def _suffix_lower(path: str) -> str:
    name = path.rsplit("/", 1)[-1]
    dot = name.rfind(".")
    # pathlib semantics: a leading dot (dotfile) is not an extension.
    if dot <= 0:
        return ""
    return name[dot:].lower()


def suffix_lower_series(paths) -> "pd.Series":
    """Vectorized _suffix_lower over a path Series: lower-cased extension
    WITH the dot, '' for dotfiles / extension-less names (rfind('.') <= 0
    in the basename, same rule as the scalar)."""
    import pandas as pd  # noqa: F811 (vectorized twin of _suffix_lower)

    base = paths.str.rsplit("/", n=1).str[-1]
    ext = ("." + base.str.rsplit(".", n=1).str[-1]).str.lower()
    return ext.where(base.str.rfind(".") > 0, "")


def is_supported_image_path(path: str) -> bool:
    return _suffix_lower(path) in SUPPORTED_IMAGE_EXTENSIONS


def is_supported_pdf_path(path: str) -> bool:
    return _suffix_lower(path) in SUPPORTED_PDF_EXTENSIONS


def is_supported_path(path: str) -> bool:
    return is_supported_image_path(path) or is_supported_pdf_path(path)
