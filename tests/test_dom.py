"""Unit tests for the DOM parser/serializer and text helpers."""

from swift_readability_spark.core.dom import (
    Element,
    TextNode,
    js_trim,
    normalize_spaces,
    parse_html,
)
from swift_readability_spark.core.helpers import (
    get_inner_text,
    get_link_density,
    text_similarity,
    unescape_html_entities,
    word_count,
)


def test_implied_structure():
    doc = parse_html("<p>hello")
    assert doc.document_element.tag == "html"
    assert doc.body.first_element_child.tag == "p"
    assert doc.head is not None


def test_p_auto_close():
    doc = parse_html("<body><p>one<p>two<div>three</div></body>")
    tags = [e.tag for e in doc.body.element_children]
    assert tags == ["p", "p", "div"]


def test_implicit_tbody_and_cells():
    doc = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    table = doc.body.first_element_child
    tbody = table.first_element_child
    assert tbody.tag == "tbody"
    rows = tbody.element_children
    assert [r.tag for r in rows] == ["tr", "tr"]
    assert len(rows[0].element_children) == 2


def test_li_auto_close():
    doc = parse_html("<ul><li>a<li>b<li>c</ul>")
    ul = doc.body.first_element_child
    assert len(ul.element_children) == 3


def test_void_and_raw_text():
    doc = parse_html("<body><img src='x.png'><script>if (a<b) {}</script></body>")
    img = doc.body.get_elements_by_tag("img")[0]
    assert img.get_attr("src") == "x.png"
    script = doc.body.get_elements_by_tag("script")[0]
    assert "a<b" in script.text_content


def test_serializer_roundtrip_stable():
    html = '<div class="x"><p>a &amp; b</p><img src="i.png"></div>'
    once = parse_html(html).body.inner_html
    twice = parse_html("<body>" + once + "</body>").body.inner_html
    assert once == twice


def test_entities_decoded_and_reescaped():
    doc = parse_html("<p>&lt;tag&gt; &amp; &quot;q&quot;</p>")
    p = doc.get_elements_by_tag("p")[0]
    assert p.text_content == '<tag> & "q"'
    assert "&lt;tag&gt;" in p.outer_html


def test_js_whitespace_semantics():
    assert js_trim(" ﻿ x  ") == "x"
    assert normalize_spaces("a  \n\t b") == "a b"
    assert normalize_spaces("a b") == "a b"  # single spaces untouched


def test_inner_text_and_word_count():
    doc = parse_html("<div> hello   <b>world</b> </div>")
    div = doc.get_elements_by_tag("div")[0]
    assert get_inner_text(div) == "hello world"
    assert word_count("one two three") == 3


def test_text_similarity_matches_canonical_shape():
    assert text_similarity("the quick brown fox", "the quick brown fox") == 1.0
    assert text_similarity("", "x") == 0.0
    # ASCII tokenizer: the canonical /\W+/ treats accented chars as
    # separators, so "café" tokenizes to ["caf"] on both sides
    assert text_similarity("café", "café") == 1.0
    assert text_similarity("café", "cafe") == 0.0


def test_link_density():
    doc = parse_html(
        '<div><a href="/x">12345</a>67890</div>'
    )
    div = doc.get_elements_by_tag("div")[0]
    assert abs(get_link_density(div) - 0.5) < 1e-9
    doc2 = parse_html('<div><a href="#frag">12345</a>67890</div>')
    div2 = doc2.get_elements_by_tag("div")[0]
    assert abs(get_link_density(div2) - 0.15) < 1e-9  # hash links weigh 0.3


def test_unescape_entities_restricted():
    assert unescape_html_entities("a &amp; b") == "a & b"
    assert unescape_html_entities("&#65;&#x42;") == "AB"
    assert unescape_html_entities("&#xD800;") == "�"
    assert unescape_html_entities("&nbsp;") == "&nbsp;"  # not in the 5-entity map


def test_style_prop():
    el = Element("div", {"style": "display : NONE; color: red"})
    assert el.style_prop("display") == "NONE".lower() or el.style_prop("display") == "NONE"
