"""Tokenizer hardening tests: adversarial/truncated markup.

Regression coverage for the catastrophic-backtracking fix in
``core/tokenizer.py::_TAG_END`` (possessive, disjoint alternatives)
and the explicit drop-to-EOF recovery for unterminated quoted
attribute values.
"""

import time

from swift_readability_spark.core.dom import parse_html
from swift_readability_spark.core.serializer import serialize_html


def _text(html: str) -> str:
    return parse_html(html).text_content


class TestTruncatedTagLinearTime:
    def test_many_quoted_attrs_truncated_is_fast(self):
        # Pre-fix this hung >10s at ~28 attributes, doubling per attr.
        # 2000 attributes must scan in well under a second.
        blob = '<div ' + 'a="v" ' * 2000  # truncated: no '>'
        start = time.monotonic()
        doc = parse_html(blob)
        elapsed = time.monotonic() - start
        assert elapsed < 1.0, f"tokenize took {elapsed:.2f}s (backtracking?)"
        assert doc.text_content == ""

    def test_truncated_tag_preserves_preceding_text(self):
        doc = parse_html('<p>hello</p><div ' + 'x="1" ' * 500)
        assert doc.text_content == "hello"

    def test_long_plain_run_truncated_is_fast(self):
        # A long unquoted attribute blob with no closing '>' exercises
        # the plain-run branch under overall match failure.
        blob = "<div " + "word " * 5000
        start = time.monotonic()
        parse_html(blob)
        assert time.monotonic() - start < 1.0


class TestUnterminatedQuoteRecovery:
    def test_unterminated_value_drops_to_eof(self):
        # '="b' never closes: the tag AND everything after it are
        # dropped (HTML5/stdlib recovery; the previous regex wrongly
        # ended the tag at the next '>').
        doc = parse_html('<p>keep</p><div a="b>lost text')
        assert doc.text_content == "keep"

    def test_unterminated_single_quote_drops_to_eof(self):
        doc = parse_html("<p>keep</p><span a='b>lost")
        assert doc.text_content == "keep"

    def test_quote_closing_later_spans_gt(self):
        # A quoted value that DOES close may span '>' characters; the
        # tag ends at the first '>' outside the quotes.
        doc = parse_html('<div a="x>y">in</div>')
        div = doc.get_elements_by_tag("div")[0]
        assert div.get_attr("a") == "x>y"
        assert div.text_content == "in"

    def test_quote_in_name_position_is_ordinary(self):
        # junk attribute <div "=""> — quote not after '=' is an
        # ordinary char; tag still terminates at its '>'
        doc = parse_html('<div "="">x</div><p>y</p>')
        assert doc.text_content == "xy"

    def test_bare_equals_then_gt(self):
        doc = parse_html("<div a= >t</div>")
        assert doc.text_content == "t"

    def test_double_equals_then_quoted(self):
        doc = parse_html('<div a=="x">t</div>')
        assert doc.text_content == "t"

    def test_serialize_roundtrip_junk_attrs(self):
        html = '<div "="">x</div>'
        out = serialize_html(parse_html(html))
        # round-trip stability: re-parsing the serialized form yields
        # identical serialization (junk attr names dropped once)
        assert serialize_html(parse_html(out)) == out


class TestFastPaths:
    """The attribute-less and quote-free-blob fast paths must be
    byte-equivalent to the general _TAG_END machinery."""

    def test_attributeless_tags(self):
        doc = parse_html("<div><p>a</p><b>x</b></div>")
        assert serialize_html(doc.body, inner=True) == "<div><p>a</p><b>x</b></div>"

    def test_attributeless_rawtext_tags(self):
        doc = parse_html("<style>p { color: red }</style><p>t</p>")
        styles = doc.get_elements_by_tag("style")
        assert styles and styles[0].text_content == "p { color: red }"

    def test_quote_free_blob_bare_values(self):
        doc = parse_html('<div id=a class=b-c data-x=1>t</div>')
        d = doc.get_elements_by_tag("div")[0]
        assert d.get_attr("id") == "a"
        assert d.get_attr("class") == "b-c"
        assert d.get_attr("data-x") == "1"

    def test_quote_free_self_closing(self):
        # HTML5: an unquoted value consumes a trailing '/' (foo=bar/ is
        # value "bar/", not self-closing); a space before '/' makes it
        # a genuine self-closing marker
        doc = parse_html("<div><span foo=bar />t</div>")
        span = doc.get_elements_by_tag("span")[0]
        assert span.get_attr("foo") == "bar"
        assert not span.children  # self-closing: text lands outside
        assert doc.body.text_content == "t"
        doc2 = parse_html("<div><span foo=bar/>t</div>")
        assert doc2.get_elements_by_tag("span")[0].get_attr("foo") == "bar/"

    def test_gt_inside_quoted_value_still_honored(self):
        # quotes present -> slow path: '>' inside the value is NOT a tag end
        doc = parse_html('<div title="a>b">t</div>')
        assert doc.get_elements_by_tag("div")[0].get_attr("title") == "a>b"

    def test_quote_free_blob_with_gt_ends_at_first_gt(self):
        doc = parse_html("<div data-x=1>rest</div>")
        assert doc.body.text_content == "rest"
