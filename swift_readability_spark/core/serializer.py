"""Content serializers: HTML (default) and XML/XHTML parity mode.

Re-expresses the reference's serializer surface
(``Readability.swift:451-552``): the default HTML serializer
(innerHTML semantics), an XML serializer with XHTML syntax — void
elements self-closed, boolean attributes promoted to ``name="name"``
(e.g. ``itemscope="itemscope"``) — and the user-pluggable custom
serializer hook (``Models.swift:17``, ``Readability.swift:177-194``).
"""

from __future__ import annotations

from html import escape

from .dom import (
    Comment,
    Element,
    Node,
    RAW_TEXT_TAGS,
    TextNode,
    VOID_ELEMENTS,
    is_valid_attr_name,
)


def serialize_html(el: Element, inner: bool = True) -> str:
    return el.inner_html if inner else el.outer_html


def _xml_serialize(node: Node, buf: list[str]) -> None:
    if isinstance(node, TextNode):
        parent = node.parent
        if parent is not None and parent.tag in RAW_TEXT_TAGS:
            buf.append(node.data)
        else:
            buf.append(escape(node.data, quote=False))
        return
    if isinstance(node, Comment):
        buf.append(f"<!--{node.data}-->")
        return
    el = node
    assert isinstance(el, Element)
    if el.tag.startswith("#"):
        for c in el.children:
            _xml_serialize(c, buf)
        return
    buf.append("<")
    buf.append(el.tag)
    for name, value in el.attrs.items():
        if not is_valid_attr_name(name):
            continue
        # XML has no valueless attributes: promote booleans to
        # name="name" (itemscope="itemscope" parity case)
        if value == "":
            value = name
        buf.append(f' {name}="{escape(value, quote=True)}"')
    if el.tag in VOID_ELEMENTS and not el.children:
        buf.append(" />")
        return
    buf.append(">")
    for c in el.children:
        _xml_serialize(c, buf)
    buf.append(f"</{el.tag}>")


def serialize_xml(el: Element, inner: bool = True) -> str:
    buf: list[str] = []
    if inner:
        for c in el.children:
            _xml_serialize(c, buf)
    else:
        _xml_serialize(el, buf)
    return "".join(buf)
