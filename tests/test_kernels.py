"""Golden + conformance tests for the pure kernels.

Where possible we ALSO import the reference implementation directly from
/root/reference (read-only) and assert byte-identical behavior on a corpus
of adversarial strings — the strongest available parity check. The
reference code is never copied; it is executed as an oracle.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

from ocr_agent_ray.functions import kernels as K

REFERENCE_SRC = "/root/reference/src"
HAS_REFERENCE = os.path.isdir(REFERENCE_SRC)

if HAS_REFERENCE and REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


def _ref_convert():
    from ocr_agent.markdown_merge import _convert_latex_math_delimiters_to_dollar

    return _convert_latex_math_delimiters_to_dollar


ADVERSARIAL = [
    "",
    "no math here",
    "\\( a+b \\)",
    "\\(a\\)\\(b\\)",
    "\\[\nE=mc^2\n\\]",
    "\\[ x \\] then \\( y \\)",
    "nested \\[ f(\\( x \\)) \\] forms",
    "```\n\\( code \\)\n```",
    "```\n\\( unclosed fence",
    "~~~\n\\[ tilde \\]\n~~~",
    "```\nstill code\n~~~\n\\( inside backtick block \\)\n```",
    "   ```\nindented open\n\\( ? \\)\n```",
    "````\nlong\n```\ninner\n````",
    "text\n```py\ncode \\( x \\)\n```\nafter \\( y \\)",
    "\\( multi\nline \\)",
    "\\[ strip\n\nnewlines \\]",
    "\\(\\)",          # empty body: regex needs .+? so stays
    "\\( \\)",
    "a \\[ b \\( c \\) d \\] e",
    "``` \n\\(x\\)\n```",
    "~~~~~~\ntildes long\n\\(x\\)\n~~~",
    "\r\n\\( crlf \\)\r\n```\r\n\\( code \\)\r\n```",
    "\\[a\\]\\[b\\]",
    "$already$ \\( mixed \\) $$dollars$$",
]


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not available")
@pytest.mark.parametrize("text", ADVERSARIAL)
def test_math_conversion_matches_reference(text):
    assert K.convert_math_delimiters_fence_aware(text) == _ref_convert()(text)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not available")
@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["\\(", "\\)", "\\[", "\\]", "x", " ", "\n", "```", "~~~",
             "````", "  ```", "a\nb", "$", "\t", "code"]
        ),
        max_size=30,
    )
)
def test_math_conversion_matches_reference_fuzz(parts):
    text = "".join(parts)
    assert K.convert_math_delimiters_fence_aware(text) == _ref_convert()(text)


def test_math_conversion_goldens():
    f = K.convert_math_delimiters_fence_aware
    assert f("\\( a+b \\)") == "$a+b$"
    assert f("\\[\nE=mc^2\n\\]") == "$$\nE=mc^2\n$$"
    # block content strips only newlines, not spaces (markdown_merge.py:126-128)
    assert f("pre \\[ x \\] post") == "pre $$\n x \n$$ post"
    # fenced code untouched
    assert f("```\n\\( x \\)\n```") == "```\n\\( x \\)\n```"
    # tilde fence does not close a backtick fence
    s = "```\na\n~~~\n\\( x \\)\n```"
    assert f(s) == s
    # block runs before inline (inline sub applies inside rewritten block)
    assert f("\\[ \\( x \\) \\]") == "$$\n $x$ \n$$"
    # unclosed fence: remainder stays code
    assert f("```\n\\( x \\)") == "```\n\\( x \\)"


def test_post_process_latex_style_is_identity():
    assert K.post_process_markdown("\\( x \\)", math_style="latex") == "\\( x \\)"


def test_render_header_text():
    assert K.render_header_text("image", "/a/b.png", None, None) == "## /a/b.png"
    assert (
        K.render_header_text("pdf_page", "/a/b.pdf", 0, 3) == "## /a/b.pdf (page 1/3)"
    )
    # missing page metadata falls back to bare form (markdown_merge.py:146-147)
    assert K.render_header_text("pdf_page", "/a/b.pdf", None, 3) == "## /a/b.pdf"
    assert K.render_header_text("text", "", None, None) == "## "


def test_normalize_infer_result():
    n = K.normalize_infer_result_to_markdown
    assert n(None) == ""
    assert n("md") == "md"
    assert n({"markdown": "m", "text": "t"}) == "m"
    assert n({"text": "t"}) == "t"
    assert n({"response": "r"}) == "r"
    assert n({"other": 1}) == str({"other": 1})
    assert n({"markdown": 5, "text": "t"}) == "t"  # first *string* wins
    assert n(42) == "42"


def test_grounding_parser():
    text = (
        "<|ref|>title<|/ref|><|det|>[[1, 2,3,4]]<|/det|> Hi "
        "<|ref|>table<|/ref|><|det|>[[10,20, 30, 40]]<|/det|>"
    )
    assert K.parse_grounding_detections(text) == [
        ("title", 1, 2, 3, 4),
        ("table", 10, 20, 30, 40),
    ]
    assert K.parse_grounding_detections("no tokens") == []
    assert K.strip_grounding_tokens(text) == "title Hi table"


def test_decode_escaped_newlines():
    from ocr_agent_ray.config import decode_escaped_newlines

    assert decode_escaped_newlines("a\\nb") == "a\nb"
    assert decode_escaped_newlines("plain") == "plain"


def test_contains_check_normalizer():
    assert K.normalize_text_for_contains_check("Hello, WORLD_42!") == "helloworld_42"


def test_supported_path_predicates():
    assert K.is_supported_image_path("/x/a.PNG")
    assert K.is_supported_image_path("a.tiff")
    assert not K.is_supported_image_path("a.gif")
    assert K.is_supported_pdf_path("b.pdf")
    assert not K.is_supported_pdf_path("b.pdfx")
    assert not K.is_supported_path(".png")  # dotfile: no extension (pathlib)
    assert not K.is_supported_path("noext")
