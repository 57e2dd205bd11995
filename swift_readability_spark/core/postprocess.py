"""Post-extraction content fixes: URL absolutization, nested-element
simplification, class cleaning.

Re-expresses ``/root/reference/Sources/SwiftReadability/Postprocessor.swift``
(canonical ``_postProcessContent`` / ``_fixRelativeUris`` /
``_simplifyNestedElements`` / ``_cleanClasses``).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlsplit, urlunsplit

from . import regexps as R

_EMBEDDED_WS = re.compile(r"[\t\n\r]")
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
_DRIVE_PIPE = re.compile(r"^(file:///)([A-Za-z])\|")
_WS_SPLIT = re.compile(r"\s+")
from .dom import Document, Element, TextNode
from .helpers import (
    get_next_node,
    has_single_tag_inside_element,
    is_element_without_content,
    remove_and_get_next,
)

_C0_TRIM = "".join(chr(i) for i in range(0x21)) + "\x7f"
_SPECIAL_SCHEMES = ("http", "https", "ws", "wss", "ftp", "file")


def _remove_dot_segments(path: str) -> str:
    segs = path.split("/")
    out: list[str] = []
    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if seg == ".":
            if last:
                out.append("")
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            if last:
                out.append("")
            continue
        out.append(seg)
    return "/".join(out)


def _whatwg_join(base: str, rel: str, rel_has_scheme: bool) -> str:
    """RFC 3986 merge that, unlike urljoin, preserves empty path
    segments ('//' inside a path survives, as in browsers)."""
    if rel_has_scheme:
        return rel
    b = urlsplit(base)
    if rel.startswith("//"):
        return f"{b.scheme}:{rel}"
    frag = ""
    if "#" in rel:
        rel, frag = rel.split("#", 1)
        frag = "#" + frag
    query = ""
    if "?" in rel:
        rel, query = rel.split("?", 1)
        query = "?" + query
    if not rel:
        path = b.path
        if not query:
            query = ("?" + b.query) if b.query else ""
    elif rel.startswith("/"):
        path = _remove_dot_segments(rel)
    else:
        base_dir = b.path[: b.path.rfind("/") + 1] if "/" in b.path else "/"
        path = _remove_dot_segments(base_dir + rel)
    netloc = ("//" + b.netloc) if b.netloc else ""
    return f"{b.scheme}:{netloc}{path}{query}{frag}"


def to_absolute_uri(uri: str, base_uri: str, document_uri: str) -> str:
    """WHATWG-flavoured resolution of ``uri`` against ``base_uri``.

    Keeps ``#fragment`` links intact when the base equals the document
    URI, mirrors ``new URL(uri, base).href`` for the common cases:
    scheme/host lowercasing, backslash normalization, default path.
    """
    if base_uri == document_uri and uri.startswith("#"):
        return uri
    try:
        cleaned = uri.strip(_C0_TRIM)
        # WHATWG strips embedded tabs/newlines
        cleaned = _EMBEDDED_WS.sub("", cleaned)
        scheme_match = _SCHEME_RE.match(cleaned)
        if scheme_match and scheme_match.group(1).lower() not in _SPECIAL_SCHEMES:
            # non-special absolute URL (data:, mailto:, javascript:, about:)
            return cleaned
        # special schemes treat backslash as slash
        cleaned = cleaned.replace("\\", "/")
        resolved = _whatwg_join(base_uri, cleaned, bool(scheme_match))
        # WHATWG file-URL quirk: a Windows drive letter written as C| is
        # normalized to C:
        resolved = _DRIVE_PIPE.sub(r"\1\2:", resolved)
        parts = urlsplit(resolved)
        scheme = parts.scheme.lower()
        netloc = parts.netloc
        host = parts.hostname or ""
        if host:
            rebuilt = host.lower()
            if parts.port is not None:
                default = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}.get(scheme)
                if parts.port != default:
                    rebuilt += f":{parts.port}"
            userinfo = ""
            if parts.username:
                userinfo = parts.username
                if parts.password:
                    userinfo += ":" + parts.password
                rebuilt = userinfo + "@" + rebuilt
            netloc = rebuilt
        path = parts.path
        if scheme in _SPECIAL_SCHEMES and not path:
            path = "/"
        # percent-encode characters a browser would encode in the path/query
        path = quote(path, safe="/%!$&'()*+,;=:@~.-_|" + "0123456789" + "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
        query = quote(parts.query, safe="/%!$&'()*+,;=:@~.-_?" + "0123456789" + "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
        out = urlunsplit((scheme, netloc, path, query, parts.fragment))
        # urlunsplit drops a bare '?' / '#'; WHATWG href keeps them
        if not parts.fragment and resolved.endswith("#"):
            out += "#"
        elif not parts.query and not parts.fragment and resolved.endswith("?"):
            out += "?"
        return out
    except ValueError:
        return uri


def fix_relative_uris(article_content: Element, doc: Document) -> None:
    base_uri = doc.base_uri
    document_uri = doc.document_uri
    # per-document memo: link-heavy pages repeat the same hrefs
    # (nav/citation targets) hundreds of times, and resolution is
    # urllib-based string surgery
    memo: dict[str, str] = {}

    def absolutize(uri: str) -> str:
        hit = memo.get(uri)
        if hit is None:
            hit = to_absolute_uri(uri, base_uri, document_uri)
            memo[uri] = hit
        return hit

    for link in list(article_content.get_elements_by_tag("a")):
        href = link.get_attr("href")
        if not href:
            continue
        if href.startswith("javascript:"):
            # scripts are gone: unwrap the link
            if len(link.children) == 1 and isinstance(link.children[0], TextNode):
                text = TextNode(link.text_content)
                if link.parent is not None:
                    link.parent.replace_child(text, link)
            else:
                container = Element("span")
                for child in list(link.children):
                    container.append_child(child)
                if link.parent is not None:
                    link.parent.replace_child(container, link)
        else:
            link.set_attr("href", absolutize(href))

    for media in article_content.get_elements_by_tag(
        "img", "picture", "figure", "video", "audio", "source"
    ):
        src = media.get_attr("src")
        poster = media.get_attr("poster")
        srcset = media.get_attr("srcset")
        if src:
            media.set_attr("src", absolutize(src))
        if poster:
            media.set_attr("poster", absolutize(poster))
        if srcset:
            new_srcset = R.SRCSET_URL.sub(
                lambda m: absolutize(m.group(1)) + (m.group(2) or "") + m.group(3),
                srcset,
            )
            media.set_attr("srcset", new_srcset)


def simplify_nested_elements(article_content: Element) -> None:
    node: Element | None = article_content
    while node is not None:
        if (
            node.parent is not None
            and node.tag in ("div", "section")
            and not node.id.startswith("readability")
        ):
            if is_element_without_content(node):
                node = remove_and_get_next(node)
                continue
            if has_single_tag_inside_element(
                node, "div"
            ) or has_single_tag_inside_element(node, "section"):
                child = node.element_children[0]
                for name, value in node.attrs.items():
                    child.set_attr(name, value)
                node.parent.replace_child(child, node)
                node = child
                continue
        node = get_next_node(node)


def clean_classes(node: Element, classes_to_preserve: tuple[str, ...]) -> None:
    class_name = " ".join(
        cls
        for cls in _WS_SPLIT.split(node.get_attr("class") or "")
        if cls in classes_to_preserve
    )
    if class_name:
        node.set_attr("class", class_name)
    else:
        node.remove_attr("class")
    for child in node.element_children:
        clean_classes(child, classes_to_preserve)


def post_process_content(
    article_content: Element,
    doc: Document,
    *,
    keep_classes: bool = False,
    classes_to_preserve: tuple[str, ...] = R.CLASSES_TO_PRESERVE,
) -> None:
    fix_relative_uris(article_content, doc)
    simplify_nested_elements(article_content)
    if not keep_classes:
        clean_classes(article_content, classes_to_preserve)
