"""Whitespace-insensitive comparison of span sequences / DOM trees.

Mirrors the reference harness's equality relation
(``Tests/SwiftReadabilityTests/ReadabilityTests.swift:164-283``: both
sides are formatted, then compared by lock-step in-order DOM traversal
ignoring empty text nodes, with whitespace-collapsed text) — here the
"format both sides" step is replaced by parsing both reassembled span
sequences with our own parser, which is serializer-agnostic.
"""

from __future__ import annotations

import re

from ..core.dom import Comment, Element, Node, TextNode, js_trim
from .codec import spans_to_html

_ANY_WS = re.compile(r"\s+")


def _collapse(s: str) -> str:
    """The suite's whitespace collapse: \\s+ -> ' ', trimmed."""
    return _ANY_WS.sub(" ", s).strip()


def _significant_nodes(root: Element) -> list[Node]:
    out: list[Node] = []
    for node in root.iter_subtree():
        if isinstance(node, Comment):
            continue
        if isinstance(node, TextNode):
            if js_trim(node.data) == "":
                continue
            out.append(node)
        else:
            out.append(node)
    return out


def compare_spans(
    actual: list[dict], expected: list[dict], max_mismatches: int = 10
) -> list[str]:
    """Return a list of mismatch descriptions (empty = equal).

    Equality on (kind, text, media_ref, order): the media skeleton
    (kinds + refs in order) must match exactly; the text is compared as
    whitespace-insensitive DOM equality of the reassembled sequences.
    """
    mismatches: list[str] = []

    a_skel = [(s["kind"], s.get("media_ref") or "") for s in actual if s["kind"] == "media"]
    e_skel = [(s["kind"], s.get("media_ref") or "") for s in expected if s["kind"] == "media"]
    if a_skel != e_skel:
        mismatches.append(f"media skeleton differs: actual={a_skel} expected={e_skel}")

    a_kinds = [s["kind"] for s in sorted(actual, key=lambda s: s["offset"])]
    e_kinds = [s["kind"] for s in sorted(expected, key=lambda s: s["offset"])]
    if a_kinds != e_kinds:
        mismatches.append(f"span kind order differs: actual={a_kinds} expected={e_kinds}")

    from ..core.dom import parse_fragment

    a_dom = parse_fragment(spans_to_html(actual))
    e_dom = parse_fragment(spans_to_html(expected))
    mismatches.extend(compare_dom(a_dom, e_dom, max_mismatches - len(mismatches)))
    return mismatches[:max_mismatches]


def compare_dom(actual: Element, expected: Element, max_mismatches: int = 10) -> list[str]:
    mismatches: list[str] = []
    a_nodes = _significant_nodes(actual)
    e_nodes = _significant_nodes(expected)
    for i in range(max(len(a_nodes), len(e_nodes))):
        if len(mismatches) >= max_mismatches:
            break
        a = a_nodes[i] if i < len(a_nodes) else None
        e = e_nodes[i] if i < len(e_nodes) else None
        if a is None or e is None:
            mismatches.append(
                f"node count differs: actual={len(a_nodes)} expected={len(e_nodes)}; "
                f"first extra: {a or e!r}"
            )
            break
        if isinstance(a, TextNode) != isinstance(e, TextNode):
            mismatches.append(f"node {i}: type differs: {a!r} vs {e!r}")
            break
        if isinstance(a, TextNode):
            ta, te = _collapse(a.data), _collapse(e.data)
            if ta != te:
                mismatches.append(f"node {i}: text differs: {ta[:120]!r} vs {te[:120]!r}")
            continue
        assert isinstance(a, Element) and isinstance(e, Element)
        if a.tag != e.tag:
            mismatches.append(f"node {i}: tag differs: <{a.tag}> vs <{e.tag}>")
            break
        a_attrs = {k: _collapse(v) for k, v in a.attrs.items()}
        e_attrs = {k: _collapse(v) for k, v in e.attrs.items()}
        if a_attrs != e_attrs:
            diff_keys = {
                k
                for k in set(a_attrs) | set(e_attrs)
                if a_attrs.get(k) != e_attrs.get(k)
            }
            mismatches.append(
                f"node {i} <{a.tag}>: attrs differ on {sorted(diff_keys)}: "
                f"{ {k: a_attrs.get(k) for k in diff_keys} } vs "
                f"{ {k: e_attrs.get(k) for k in diff_keys} }"
            )
    return mismatches
