"""Span codec tests: segmentation, reassembly, placeholder classes."""

from swift_readability_spark.spans.codec import (
    html_to_spans,
    media_placeholder,
    spans_to_html,
)
from swift_readability_spark.spans.compare import compare_spans

DOC = (
    '<html><head><title>T</title></head><body>'
    "<p>before</p>"
    '<img src="http://h/a.jpg">'
    "<p>middle</p>"
    '<iframe src="https://www.youtube.com/embed/xyz"></iframe>'
    "<p>after</p>"
    "</body></html>"
)


def test_segmentation_order_and_kinds():
    spans = html_to_spans(DOC)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "media", "text"]
    assert [s["offset"] for s in spans] == list(range(5))
    media = [s for s in spans if s["kind"] == "media"]
    assert media[0]["media_ref"] == "http://h/a.jpg"
    assert "youtube.com" in media[1]["media_ref"]
    for s in spans:
        if s["kind"] == "media":
            assert s["text"] is None
        else:
            assert s["media_ref"] is None


def test_reassembly_roundtrip():
    spans = html_to_spans(DOC)
    html = spans_to_html(spans)
    respans = html_to_spans(html)
    assert compare_spans(respans, spans) == []


def test_placeholder_classes():
    assert media_placeholder("http://h/a.jpg").startswith("<img")
    assert media_placeholder("https://www.youtube.com/embed/x").startswith("<iframe")
    assert media_placeholder("http://h/page.html").startswith("<iframe")
    assert media_placeholder("http://h/clip.mp4").startswith("<video")
    assert media_placeholder("blob:http://h/xyz").startswith("<video")
    assert media_placeholder("http://h/flash.swf").startswith("<embed")
    assert media_placeholder("data:image/png;base64,AAA").startswith("<img")
    assert media_placeholder("") == "<img>"


def test_hidden_media_skipped_on_ingest_only():
    doc = (
        '<body><p>x</p><img src="http://h/t.gif" style="display:none">'
        '<img src="http://h/v.jpg"></body>'
    )
    ingest = html_to_spans(doc)
    assert [s["media_ref"] for s in ingest if s["kind"] == "media"] == ["http://h/v.jpg"]
    raw = html_to_spans(doc, visibility_filter=False)
    assert len([s for s in raw if s["kind"] == "media"]) == 2


def test_noscript_media_stays_text():
    doc = '<body><noscript><img src="http://h/n.jpg"></noscript><p>x</p></body>'
    spans = html_to_spans(doc)
    assert all(s["kind"] == "text" for s in spans)
    assert "n.jpg" in spans[0]["text"]


def test_picture_inner_img_is_boundary():
    doc = (
        '<body><picture><source srcset="http://h/b.webp 1x">'
        '<img src="http://h/b.jpg"></picture></body>'
    )
    spans = html_to_spans(doc)
    media = [s for s in spans if s["kind"] == "media"]
    assert len(media) == 1 and media[0]["media_ref"] == "http://h/b.jpg"
    # the picture wrapper markup survives as text
    assert any("<picture" in (s["text"] or "") for s in spans)
