"""Document-level extraction entry point shared by the Arrow-batch UDF
and the fixture tests: span sequence in -> cleaned span sequence +
metadata out."""

from __future__ import annotations

import traceback

from .core.readability import ReadabilityOptions, parse
from .spans.codec import element_to_spans, spans_to_html

DEFAULT_BASE_URL = "http://fakehost/test/page.html"

EMPTY_RESULT_FIELDS = {
    "title": None,
    "byline": None,
    "dir": None,
    "lang": None,
    "excerpt": None,
    "site_name": None,
    "published_time": None,
    "text_length": 0,
    "readerable": False,
}


def extract_document(
    doc_id: str,
    spans: list[dict],
    base_url: str = DEFAULT_BASE_URL,
    options: ReadabilityOptions | None = None,
) -> dict:
    """Run the full readability pipeline over one document's spans."""
    out: dict = {"doc_id": doc_id, "spans": [], "error": None}
    out.update(EMPTY_RESULT_FIELDS)
    try:
        html = spans_to_html(spans)
        result = parse(html, base_url, options)
        if result is None:
            out["error"] = "no_article"
            return out
        out["spans"] = element_to_spans(result.article, inner=True, visibility_filter=False)
        out["title"] = result.title
        out["byline"] = result.byline
        out["dir"] = result.dir
        out["lang"] = result.lang
        out["excerpt"] = result.excerpt
        out["site_name"] = result.site_name
        out["published_time"] = result.published_time
        out["text_length"] = result.length
        out["readerable"] = result.readerable
        return out
    except Exception:  # noqa: BLE001 - per-doc isolation: errors become rows
        out["error"] = traceback.format_exc(limit=5)
        return out
