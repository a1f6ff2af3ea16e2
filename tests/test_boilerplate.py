"""Boilerplate strip + DOM heuristics + layout reading order."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ocr_agent_ray.functions.kernels import layout_reading_order
from ocr_agent_ray.stages.boilerplate import (
    BoilerplateStripStage,
    extract_main_text,
    html_main_text,
    wrap_text_as_html,
)

PAGE = """<html><head><script>alert(1)</script><style>p{}</style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<div id="sidebar-widget"><a href="/p1">promoted one</a> <a href="/p2">promoted two</a></div>
<article>
<h1>The Actual Headline Of The Story</h1>
<p>This is the first real paragraph of the article body with enough
length to be considered content by any reasonable density heuristic.</p>
<p>Second paragraph continues the story with further genuinely useful
prose that a reader came to this page to read.</p>
<div class="advert">BUY <a href="/deal">CHEAP DEALS NOW</a> CLICK</div>
</article>
<footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a></footer>
</body></html>"""


def test_extract_main_text_keeps_content_drops_chrome():
    out = extract_main_text(PAGE)
    assert "first real paragraph" in out
    assert "further genuinely useful" in out
    assert "The Actual Headline" in out
    assert "Home" not in out           # nav dropped
    assert "promoted one" not in out   # sidebar hint dropped
    assert "CHEAP DEALS" not in out    # advert hint dropped
    assert "Terms" not in out          # footer dropped
    assert "alert(1)" not in out       # script dropped


def test_hinted_subtree_closes_by_matching_tag():
    # a hinted inline element must close at ITS endtag, not a div heuristic
    body = ('<p><span class="advert">BUY NOW</span>'
            'after the ad the article keeps going with plenty of text</p>')
    out = extract_main_text(f"<html><body>{body}</body></html>")
    assert "after the ad the article keeps going" in out
    assert "BUY NOW" not in out


def test_hinted_subtree_nested_same_tag():
    # nested <div> inside a hinted <div>: the inner close must not end
    # the hinted subtree early
    body = ('<div class="advert"><div>inner ad copy</div>more ad</div>'
            '<p>real content after the advert block with enough length here</p>')
    out = extract_main_text(f"<html><body>{body}</body></html>")
    assert "real content after the advert block" in out
    assert "inner ad copy" not in out
    assert "more ad" not in out


def test_hinted_void_element_does_not_swallow_document():
    # a hinted void element (<img class="ad">) never gets an endtag; it
    # must not open a hinted subtree at all
    body = ('<p><img class="advert" src="x.png">the article text continues '
            'here with enough length to pass the block filter</p>')
    out = extract_main_text(f"<html><body>{body}</body></html>")
    assert "the article text continues" in out


def test_extract_handles_malformed_html():
    assert extract_main_text("<p>unclosed paragraph with sufficient length here") \
        .startswith("unclosed paragraph")
    assert extract_main_text("") == ""
    assert extract_main_text("<<<>>> &&& <p>") == ""


def test_link_density_filter():
    linky = "<p><a href='/a'>one link text</a> <a href='/b'>two link text</a> x</p>"
    assert extract_main_text(linky) == ""
    # same length, no links -> kept
    plain = "<p>one link text two link text x and some more words</p>"
    assert extract_main_text(plain) != ""


def test_stage_and_roundtrip_property(ray_session):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    tbl = pa.table({
        "doc_id": [1, 2],
        "html": [wrap_text_as_html(i + 1, t) for i, t in enumerate(texts)],
    })
    out = BoilerplateStripStage()(tbl)
    for text, main in zip(texts, out["main_text"].to_pylist()):
        for w in text.split():
            assert w in main
        assert "BUY NOW" not in main
        assert "home" not in main


def test_html_main_text_query(ray_session):
    out = html_main_text("/root/testdata/sf0.001").take(5)
    assert len(out) == 5
    for r in out:
        assert r["main_text"]
        assert "cheap deals" not in r["main_text"]


def test_layout_reading_order():
    dets = [
        ("t", 300, 10, 400, 30),   # row 1, right
        ("t", 10, 12, 120, 30),    # row 1, left
        ("t", 10, 200, 200, 240),  # row 2
        ("t", 10, 100, 500, 140),  # middle row
    ]
    assert layout_reading_order(dets) == [1, 0, 3, 2]
    assert layout_reading_order([]) == []
    # single column stays top-to-bottom
    col = [("t", 0, y, 10, y + 10) for y in (500, 100, 300)]
    assert layout_reading_order(col) == [1, 2, 0]


def test_layout_blocks_query(ray_session):
    from ocr_agent_ray.pipelines.interleave import layout_blocks

    out = layout_blocks("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    # read_pos is dense 0..n-1 within each (doc, span)
    for (_, _), g in out.groupby(["doc_id", "span_offset"]):
        assert sorted(g["read_pos"]) == list(range(len(g)))
    assert (out["x2"] >= out["x1"]).all()
