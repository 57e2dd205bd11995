"""Article metadata extraction: JSON-LD, meta tags, title heuristics.

Re-expresses ``/root/reference/Sources/SwiftReadability/MetadataParser.swift``
(canonical ``tmp-readability/Readability.js`` ``_getJSONLD`` /
``_getArticleMetadata`` / ``_getArticleTitle``).
"""

from __future__ import annotations

import json
import re

from . import regexps as R
from .dom import Document, normalize_spaces
from .helpers import (
    get_inner_text,
    is_url,
    text_similarity,
    unescape_html_entities,
    word_count,
)

_PROPERTY_PATTERN = re.compile(
    r"\s*(article|dc|dcterm|og|twitter)\s*:\s*"
    r"(author|creator|description|published_time|title|site_name)\s*",
    re.I,
)
_NAME_PATTERN = re.compile(
    r"^\s*(?:(dc|dcterm|og|twitter|parsely|weibo:(article|webpage))\s*[-\.:]\s*)?"
    r"(author|creator|pub-date|description|title|site_name)\s*$",
    re.I,
)
_CDATA = re.compile(r"^\s*<!\[CDATA\[|\]\]>\s*$")
_SCHEMA_ORG = re.compile(r"^https?\:\/\/schema\.org\/?$")
_TITLE_SEPARATORS = r"\|\-–—\\\/>»"
_SEP_SPACED = re.compile(rf"\s[{_TITLE_SEPARATORS}]\s")
_HIERARCHICAL_SEP = re.compile(r"\s[\\\/>»]\s")
_LEADING_SEP = re.compile(rf"^[^{_TITLE_SEPARATORS}]*[{_TITLE_SEPARATORS}]", re.I)


def get_article_title(doc: Document) -> str:
    from .dom import js_trim

    cur_title = orig_title = ""
    for title_el in doc.get_elements_by_tag("title"):
        # doc.title is the raw textContent, trimmed but not normalized
        cur_title = orig_title = js_trim(title_el.text_content)
        break

    title_had_hierarchical_separators = False

    if _SEP_SPACED.search(cur_title):
        title_had_hierarchical_separators = bool(_HIERARCHICAL_SEP.search(cur_title))
        all_seps = list(_SEP_SPACED.finditer(orig_title))
        cur_title = orig_title[: all_seps[-1].start()]
        if word_count(cur_title) < 3:
            cur_title = _LEADING_SEP.sub("", orig_title, count=1)
    elif ": " in cur_title:
        trimmed = cur_title.strip()
        match = any(
            h.text_content.strip() == trimmed
            for h in doc.get_elements_by_tag("h1", "h2")
        )
        if not match:
            idx = orig_title.rfind(":")
            cur_title = orig_title[idx + 1 :]
            if word_count(cur_title) < 3:
                cur_title = orig_title[orig_title.find(":") + 1 :]
            elif word_count(orig_title[: orig_title.find(":")]) > 5:
                cur_title = orig_title
    elif len(cur_title) > 150 or len(cur_title) < 15:
        h_ones = doc.get_elements_by_tag("h1")
        if len(h_ones) == 1:
            cur_title = get_inner_text(h_ones[0])

    cur_title = normalize_spaces(cur_title)
    cur_count = word_count(cur_title)
    if cur_count <= 4 and (
        not title_had_hierarchical_separators
        or cur_count != word_count(_SEP_SPACED.sub("", orig_title)) - 1
    ):
        cur_title = orig_title

    return cur_title


def get_jsonld(doc: Document, scripts: list | None = None) -> dict:
    """Extract schema.org Article metadata from ld+json scripts.

    ``scripts`` lets the caller share one document walk between this
    and the subsequent script removal (no mutation happens between)."""
    metadata: dict | None = None
    if scripts is None:
        scripts = doc.get_elements_by_tag("script")
    for script in scripts:
        if script.tag != "script":
            continue
        if metadata is not None:
            break
        if script.get_attr("type") != "application/ld+json":
            continue
        try:
            content = _CDATA.sub("", script.text_content)
            parsed = json.loads(content)
            if isinstance(parsed, list):
                parsed = next(
                    (
                        it
                        for it in parsed
                        if isinstance(it, dict)
                        and isinstance(it.get("@type"), str)
                        and R.JSONLD_ARTICLE_TYPES.search(it["@type"])
                    ),
                    None,
                )
                if parsed is None:
                    continue
            if not isinstance(parsed, dict):
                continue
            context = parsed.get("@context")
            matches = (
                isinstance(context, str) and _SCHEMA_ORG.search(context)
            ) or (
                isinstance(context, dict)
                and isinstance(context.get("@vocab"), str)
                and _SCHEMA_ORG.search(context["@vocab"])
            )
            if not matches:
                continue
            if "@type" not in parsed and isinstance(parsed.get("@graph"), list):
                parsed = next(
                    (
                        it
                        for it in parsed["@graph"]
                        if isinstance(it, dict)
                        and isinstance(it.get("@type"), str)
                        and R.JSONLD_ARTICLE_TYPES.search(it.get("@type") or "")
                    ),
                    None,
                )
            if (
                not parsed
                or not isinstance(parsed.get("@type"), str)
                or not R.JSONLD_ARTICLE_TYPES.search(parsed["@type"])
            ):
                continue

            metadata = {}
            name = parsed.get("name")
            headline = parsed.get("headline")
            if isinstance(name, str) and isinstance(headline, str) and name != headline:
                title = get_article_title(doc)
                name_matches = text_similarity(name, title) > 0.75
                headline_matches = text_similarity(headline, title) > 0.75
                if headline_matches and not name_matches:
                    metadata["title"] = headline
                else:
                    metadata["title"] = name
            elif isinstance(name, str):
                metadata["title"] = name.strip()
            elif isinstance(headline, str):
                metadata["title"] = headline.strip()

            author = parsed.get("author")
            if isinstance(author, dict) and isinstance(author.get("name"), str):
                metadata["byline"] = author["name"].strip()
            elif (
                isinstance(author, list)
                and author
                and isinstance(author[0], dict)
                and isinstance(author[0].get("name"), str)
            ):
                metadata["byline"] = ", ".join(
                    a["name"].strip()
                    for a in author
                    if isinstance(a, dict) and isinstance(a.get("name"), str)
                )

            description = parsed.get("description")
            if isinstance(description, str):
                metadata["excerpt"] = description.strip()
            publisher = parsed.get("publisher")
            if isinstance(publisher, dict) and isinstance(publisher.get("name"), str):
                metadata["siteName"] = publisher["name"].strip()
            date_published = parsed.get("datePublished")
            if isinstance(date_published, str):
                metadata["datePublished"] = date_published.strip()
        except (json.JSONDecodeError, TypeError, AttributeError):
            continue
    return metadata or {}


def get_article_metadata(doc: Document, jsonld: dict) -> dict:
    """Coalesce metadata across jsonld > dc > dcterm > og > weibo > plain >
    twitter > parsely precedence chains."""
    values: dict[str, str] = {}
    for element in doc.get_elements_by_tag("meta"):
        element_name = element.get_attr("name")
        element_property = element.get_attr("property")
        content = element.get_attr("content")
        if not content:
            continue
        matches = None
        if element_property:
            matches = _PROPERTY_PATTERN.search(element_property)
            if matches:
                name = re.sub(r"\s", "", matches.group(0).lower())
                values[name] = content.strip()
        if not matches and element_name and _NAME_PATTERN.search(element_name):
            name = element_name
            name = re.sub(r"\s", "", name.lower()).replace(".", ":")
            values[name] = content.strip()

    def first(*keys: str) -> str | None:
        for k in keys:
            v = values.get(k)
            if v is not None:
                return v
        return None

    metadata: dict = {}
    metadata["title"] = jsonld.get("title") or first(
        "dc:title",
        "dcterm:title",
        "og:title",
        "weibo:article:title",
        "weibo:webpage:title",
        "title",
        "twitter:title",
        "parsely-title",
    )
    if not metadata["title"]:
        metadata["title"] = get_article_title(doc)

    article_author = values.get("article:author")
    if not (isinstance(article_author, str) and not is_url(article_author)):
        article_author = None
    metadata["byline"] = jsonld.get("byline") or first(
        "dc:creator", "dcterm:creator", "author", "parsely-author"
    ) or article_author

    metadata["excerpt"] = jsonld.get("excerpt") or first(
        "dc:description",
        "dcterm:description",
        "og:description",
        "weibo:article:description",
        "weibo:webpage:description",
        "description",
        "twitter:description",
    )
    metadata["siteName"] = jsonld.get("siteName") or values.get("og:site_name")
    metadata["publishedTime"] = (
        jsonld.get("datePublished")
        or first("article:published_time", "parsely-pub-date")
        or None
    )

    for key in ("title", "byline", "excerpt", "siteName", "publishedTime"):
        metadata[key] = unescape_html_entities(metadata.get(key))
    return metadata
