"""Property-based tests (hypothesis): the core must be total — no
input may crash the parser, codec, or extractor — and the codec must
be idempotent under its own canonicalization."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from swift_readability_spark.core.dom import parse_html
from swift_readability_spark.extract import extract_document
from swift_readability_spark.spans.codec import (
    element_to_spans,
    html_to_spans,
    spans_to_html,
)
from swift_readability_spark.spans.compare import compare_spans

SETTINGS = settings(
    max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# soup of text, tags, entities, brokenness
_tag = st.sampled_from(
    ["div", "p", "span", "a", "img", "table", "tr", "td", "li", "ul",
     "h1", "br", "script", "style", "noscript", "iframe", "picture"]
)
_attr = st.sampled_from(
    ['', ' class="x y"', ' id="z"', ' href="/a?b=1#c"', ' src="http://h/i.jpg"',
     ' style="display:none"', ' aria-hidden="true"', ' data-src="x.png"']
)
_chunk = st.one_of(
    st.text(alphabet=string.printable, max_size=40),
    st.text(max_size=20),  # arbitrary unicode
    st.builds(lambda t, a: f"<{t}{a}>", _tag, _attr),
    st.builds(lambda t: f"</{t}>", _tag),
    st.sampled_from(["<!-- c -->", "<!--", "&amp;", "&#x41;", "&bogus;", "<![CDATA[x]]>",
                     "<!DOCTYPE html>", "<", ">", "</", "<p", "='"]),
)
_html = st.lists(_chunk, max_size=30).map("".join)


@SETTINGS
@given(_html)
def test_parser_total(html):
    doc = parse_html(html, "http://fakehost/x")
    assert doc.body is not None
    # serialization round-trip must be stable (canonical form)
    once = doc.body.inner_html
    twice = parse_html("<body>" + once + "</body>").body.inner_html
    assert parse_html("<body>" + twice + "</body>").body.inner_html == twice


@SETTINGS
@given(_html)
def test_codec_roundtrip_idempotent(html):
    spans = html_to_spans(html, "http://fakehost/x")
    # offsets are dense and ordered
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    respans = html_to_spans(spans_to_html(spans), "http://fakehost/x")
    assert compare_spans(respans, spans) == []


@SETTINGS
@given(_html)
def test_extractor_total(html):
    spans = html_to_spans(html, "http://fakehost/x")
    result = extract_document("prop-doc", spans, "http://fakehost/x")
    assert result["doc_id"] == "prop-doc"
    # either a clean result or a recorded error, never an exception
    assert result["error"] is None or isinstance(result["error"], str)
    out = result["spans"]
    assert [s["offset"] for s in out] == list(range(len(out)))


@SETTINGS
@given(st.text(max_size=200))
def test_extractor_total_on_plain_text(text):
    spans = [{"kind": "text", "text": text, "media_ref": None, "offset": 0}]
    result = extract_document("t", spans, "http://fakehost/x")
    assert result["doc_id"] == "t"


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), max_size=12))
def test_text_cache_coherent_under_mutation(ops):
    """Random tree mutations must never leave a stale text/link cache:
    cached reads always equal a fresh uncached computation."""
    from swift_readability_spark.core.dom import Element, TextNode

    root = parse_html(
        "<body><div id='a'><p>alpha one</p><p>beta two</p></div>"
        "<div id='b'><span>gamma</span><a href='/x'>link text</a></div>"
        "<div id='c'>tail words</div></body>"
    ).body

    def fresh_text(el):
        parts = []
        stack = list(el.children)
        while stack:
            n = stack.pop(0)
            if n.IS_TEXT:
                parts.append(n.data)
            elif n.IS_ELEMENT:
                stack = list(n.children) + stack
        return "".join(parts)

    def all_elements():
        return [root] + [n for n in root.iter_subtree() if n.IS_ELEMENT]

    # warm every cache
    for el in all_elements():
        _ = el.text_content

    for target_i, action in ops:
        els = all_elements()
        el = els[target_i % len(els)]
        if action == 0 and el is not root:
            el.remove()
        elif action == 1:
            el.append_child(TextNode("x"))
        elif action == 2:
            child = Element("span")
            child.append_child(TextNode("y"))
            el.insert_before(child, el.first_child)
        else:
            _ = el.text_content  # interleave reads
        for check in all_elements():
            assert check.text_content == fresh_text(check)
