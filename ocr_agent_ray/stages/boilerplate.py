"""Main-content extraction: HTML boilerplate strip + DOM heuristics.

Named explicitly by the north rule ("HTML boilerplate strip, PDF/layout
parse, DOM heuristics"). A dependency-free Boilerpipe/Readability-style
extractor over stdlib ``html.parser``:

- chrome elements dropped wholesale (script/style/nav/header/footer/aside,
  plus class/id hints like "sidebar", "ad", "comment"),
- remaining text grouped into blocks per block-level element,
- each block scored by text length, link density (chars inside <a> /
  total) and stopword-ish word shape; low scores are boilerplate,
- kept blocks joined in document order.

The heuristic follows the published text-density family (Kohlschütter
et al., WSDM'10 "Boilerplate Detection Using Shallow Text Features"):
long, low-link-density blocks are content; short, link-heavy blocks are
chrome. Pure function + vectorized stage; golden-tested on handcrafted
pages in tests/test_boilerplate.py (not SQL-expressible → rows-only).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
import pyarrow as pa

_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "nav", "header",
     "footer", "aside", "form", "button", "iframe"}
)
_BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "main", "li", "td", "pre",
     "blockquote", "h1", "h2", "h3", "h4", "h5", "h6", "br", "tr"}
)
_HINT_WORDS = ("sidebar", "advert", "banner", "promo", "comment", "cookie",
               "share", "social", "related", "menu", "breadcrumb")
_VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

MIN_BLOCK_CHARS = 20
MAX_LINK_DENSITY = 0.4


@dataclass
class _Block:
    texts: list[str] = field(default_factory=list)
    link_chars: int = 0

    def text(self) -> str:
        return " ".join(" ".join(self.texts).split())

    def link_density(self) -> float:
        t = self.text()
        return self.link_chars / len(t) if t else 1.0


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = [_Block()]
        self._drop_depth = 0
        # hinted-subtree stack: [tag, open_count] — the subtree closes when
        # the SAME tag that opened it balances out, so a hinted <span> (or
        # any element type) closes correctly instead of eating the rest of
        # the document
        self._hint_stack: list[list] = []
        self._link_depth = 0
        self._heading: list[bool] = []

    def _attrs_hint_boilerplate(self, attrs) -> bool:
        for k, v in attrs:
            if k in ("class", "id", "role") and v:
                low = v.lower()
                if any(h in low for h in _HINT_WORDS):
                    return True
        return False

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if self._hint_stack:
            # inside a hinted subtree: only track nesting of the tag that
            # opened it so the matching endtag closes the right element
            if tag == self._hint_stack[-1][0] and tag not in _VOID_TAGS:
                self._hint_stack[-1][1] += 1
            return
        if self._attrs_hint_boilerplate(attrs):
            if tag not in _VOID_TAGS:
                self._hint_stack.append([tag, 1])
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self.blocks.append(_Block())

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if self._hint_stack:
            if tag == self._hint_stack[-1][0]:
                self._hint_stack[-1][1] -= 1
                if self._hint_stack[-1][1] == 0:
                    self._hint_stack.pop()
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self.blocks.append(_Block())

    def handle_data(self, data):
        if self._drop_depth or self._hint_stack:
            return
        if not data.strip():
            return
        blk = self.blocks[-1]
        blk.texts.append(data)
        if self._link_depth:
            blk.link_chars += len(" ".join(data.split()))


def extract_main_text(html: str, *, min_block_chars: int = MIN_BLOCK_CHARS,
                      max_link_density: float = MAX_LINK_DENSITY) -> str:
    """Strip boilerplate, return the main text (blocks joined by \\n\\n)."""
    parser = _Extractor()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        # malformed HTML degrades to whatever was parsed, never raises
        pass
    kept: list[str] = []
    for blk in parser.blocks:
        t = blk.text()
        if len(t) < min_block_chars:
            continue
        if blk.link_density() > max_link_density:
            continue
        kept.append(t)
    return "\n\n".join(kept)


class BoilerplateStripStage:
    """map_batches callable: ``html`` column -> ``main_text`` column."""

    def __init__(self, html_col: str = "html", out_col: str = "main_text",
                 min_block_chars: int = MIN_BLOCK_CHARS,
                 max_link_density: float = MAX_LINK_DENSITY) -> None:
        self.html_col = html_col
        self.out_col = out_col
        self.min_block_chars = min_block_chars
        self.max_link_density = max_link_density

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [
            extract_main_text(h or "", min_block_chars=self.min_block_chars,
                              max_link_density=self.max_link_density)
            for h in batch[self.html_col].to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(texts, pa.string()))


def wrap_text_as_html(doc_id: int, text: str) -> str:
    """Deterministic HTML page around a text payload (nav chrome, link
    farms, ads) — the synthetic fixture for the round-trip property:
    extract_main_text(wrap_text_as_html(t)) recovers t's words."""
    words = (text or "").split()
    half = len(words) // 2 or 1
    para1, para2 = " ".join(words[:half]), " ".join(words[half:])
    return f"""<html><head><title>doc {doc_id}</title>
<style>body {{color: red}}</style><script>var x = {doc_id};</script></head>
<body>
<nav><a href="/">home</a> <a href="/a">a</a> <a href="/b">b</a></nav>
<div class="sidebar"><ul><li><a href="/x">x link</a></li><li><a href="/y">y link</a></li></ul></div>
<article>
<h1>Document {doc_id}</h1>
<p>{para1}</p>
<div class="advert">BUY NOW <a href="/buy">cheap deals</a> limited offer</div>
<p>{para2}</p>
</article>
<footer><a href="/tos">terms</a> | <a href="/priv">privacy</a> | copyright</footer>
</body></html>"""


def html_main_text(sf_dir: str):
    """queries() entry: wrap each document's text in chrome-laden HTML,
    strip boilerplate, return (doc_id, main_text). Rows-only (the DOM
    heuristic is not SQL-expressible); the round-trip property is asserted
    in pytest."""
    from ocr_agent_ray.sources.readers import read_table

    def _wrap_and_strip(batch: pd.DataFrame) -> pd.DataFrame:
        html = [wrap_text_as_html(i, t) for i, t in zip(batch["doc_id"], batch["text"])]
        tbl = pa.table({"doc_id": batch["doc_id"], "html": html})
        out = BoilerplateStripStage()(tbl)
        return out.select(["doc_id", "main_text"]).to_pandas()

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _wrap_and_strip, batch_format="pandas"
    )
