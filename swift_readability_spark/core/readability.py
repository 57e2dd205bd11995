"""Public facade: options, result model, and the parse pipeline.

Re-expresses ``/root/reference/Sources/SwiftReadability/Readability.swift``
(options model ``Models.swift:4-66``) as a plain-Python API usable both
standalone and from the Arrow-batch extraction UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import regexps as R
from .dom import Document, Element, js_trim, parse_html
from .grabber import DEFAULT_CHAR_THRESHOLD, DEFAULT_N_TOP_CANDIDATES, Grabber
from .metadata import get_article_metadata, get_jsonld
from .postprocess import post_process_content
from .preprocess import prep_document, remove_scripts, unwrap_noscript_images
from .readerable import is_probably_readerable


@dataclass
class ReadabilityOptions:
    """Mirrors the reference's ReadabilityOptions (Models.swift:4-46)."""

    debug: bool = False
    max_elems_to_parse: int = 0
    nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES
    char_threshold: int = DEFAULT_CHAR_THRESHOLD
    classes_to_preserve: tuple[str, ...] = ()
    keep_classes: bool = False
    disable_jsonld: bool = False
    allowed_video_regex: object = None
    link_density_modifier: float = 0.0


@dataclass
class ReadabilityResult:
    """Mirrors the reference's ReadabilityResult (Readability.swift:4-18)."""

    title: str | None
    byline: str | None
    dir: str | None
    lang: str | None
    content: str
    text_content: str
    length: int
    excerpt: str | None
    site_name: str | None
    published_time: str | None
    readerable: bool
    article: Element = field(repr=False, default=None)


class ParseAbortError(RuntimeError):
    """Raised when the document exceeds max_elems_to_parse."""


def parse(
    html: str,
    url: str = "about:blank",
    options: ReadabilityOptions | None = None,
) -> ReadabilityResult | None:
    """Full extraction pipeline over one HTML document.

    Order of operations follows the canonical parse():
    guard -> readerable (pre-mutation) -> noscript unwrap -> JSON-LD ->
    script removal -> prep -> metadata -> grab -> postprocess ->
    excerpt/lang fill -> serialize.
    """
    options = options or ReadabilityOptions()
    doc = parse_html(html, url)
    return parse_document(doc, options)


def parse_document(
    doc: Document, options: ReadabilityOptions | None = None
) -> ReadabilityResult | None:
    options = options or ReadabilityOptions()

    if options.max_elems_to_parse > 0:
        num_tags = sum(1 for n in doc.iter_subtree() if isinstance(n, Element))
        if num_tags > options.max_elems_to_parse:
            raise ParseAbortError(
                f"Aborting parsing document; {num_tags} elements found"
            )

    # readerable is computed on the unmutated DOM (the reference computes
    # it up-front for the same reason: Readability.swift:338-343)
    readerable = is_probably_readerable(doc)

    unwrap_noscript_images(doc)
    jsonld = {} if options.disable_jsonld else get_jsonld(doc)
    remove_scripts(doc)
    prep_document(doc)

    metadata = get_article_metadata(doc, jsonld)

    grabber = Grabber(
        doc,
        metadata,
        nb_top_candidates=options.nb_top_candidates,
        char_threshold=options.char_threshold,
        allowed_video_regex=options.allowed_video_regex or R.VIDEOS,
        link_density_modifier=options.link_density_modifier,
    )
    article_content = grabber.grab_article()
    if article_content is None:
        return None

    post_process_content(
        article_content,
        doc,
        keep_classes=options.keep_classes,
        classes_to_preserve=tuple(R.CLASSES_TO_PRESERVE)
        + tuple(options.classes_to_preserve),
    )

    excerpt = metadata.get("excerpt")
    if not excerpt:
        paragraphs = article_content.get_elements_by_tag("p")
        if paragraphs:
            excerpt = js_trim(paragraphs[0].text_content)

    text_content = article_content.text_content
    return ReadabilityResult(
        title=metadata.get("title"),
        byline=metadata.get("byline") or grabber.article_byline,
        dir=grabber.article_dir,
        lang=grabber.article_lang,
        content=article_content.inner_html,
        text_content=text_content,
        length=len(text_content),
        excerpt=excerpt,
        site_name=metadata.get("siteName"),
        published_time=metadata.get("publishedTime"),
        readerable=readerable,
        article=article_content,
    )
