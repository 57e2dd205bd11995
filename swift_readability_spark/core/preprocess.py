"""Pre-extraction document preparation.

Re-expresses the reference's preprocessing stage
(``/root/reference/Sources/SwiftReadability/Preprocessor.swift:13-289``;
canonical ``tmp-readability/Readability.js`` ``_unwrapNoscriptImages`` /
``_removeScripts`` / ``_prepDocument`` / ``_replaceBrs``).
"""

from __future__ import annotations

from . import regexps as R
from .dom import Document, Element, parse_fragment
from .helpers import (
    is_phrasing_content,
    is_whitespace,
    next_significant_node,
    set_node_tag,
)


def _is_single_image(node: Element) -> bool:
    cur: Element | None = node
    while cur is not None:
        if cur.tag == "img":
            return True
        kids = cur.element_children
        if len(kids) != 1 or cur.text_content.strip() != "":
            return False
        cur = kids[0]
    return False


def unwrap_noscript_images(doc: Document, imgs_and_noscripts: list | None = None) -> None:
    """Drop attribute-less placeholder imgs; replace single-image nodes
    preceding a single-image <noscript> with the noscript's img (keeping
    old attrs as data-old-*).

    ``imgs_and_noscripts`` may be a pre-collected element list (extra
    tags are ignored): one walk for both tags is safe because noscripts
    are never removed by the img pass, and _is_single_image reads the
    current tree state either way."""
    if imgs_and_noscripts is None:
        imgs_and_noscripts = doc.get_elements_by_tag("img", "noscript")
    for img in imgs_and_noscripts:
        if img.tag != "img":
            continue
        keep = False
        for name, value in img.attrs.items():
            if name in ("src", "srcset", "data-src", "data-srcset"):
                keep = True
                break
            if R.IMG_EXT.search(value):
                keep = True
                break
        if not keep:
            img.remove()

    for noscript in imgs_and_noscripts:
        if noscript.tag != "noscript":
            continue
        if not _is_single_image(noscript):
            continue
        # noscript content reaches us as raw text (HTML parsers treat
        # noscript as text when scripting is on) or as parsed elements;
        # normalize by re-parsing the serialized inner HTML.
        tmp = parse_fragment(noscript.inner_html)
        prev = noscript.previous_element_sibling
        if prev is not None and _is_single_image(prev):
            prev_img = prev if prev.tag == "img" else None
            if prev_img is None:
                imgs = prev.get_elements_by_tag("img")
                if not imgs:
                    continue
                prev_img = imgs[0]
            new_imgs = tmp.get_elements_by_tag("img")
            if not new_imgs:
                continue
            new_img = new_imgs[0]
            for name, value in list(prev_img.attrs.items()):
                if value == "":
                    continue
                if name in ("src", "srcset") or R.IMG_EXT.search(value):
                    if new_img.get_attr(name) == value:
                        continue
                    attr_name = name
                    if new_img.has_attr(attr_name):
                        attr_name = "data-old-" + attr_name
                    new_img.set_attr(attr_name, value)
            first = tmp.first_element_child
            if first is not None and noscript.parent is not None and prev.parent is not None:
                prev.parent.replace_child(first, prev)


def remove_scripts(doc: Document, scripts: list | None = None) -> None:
    if scripts is None:
        scripts = doc.get_elements_by_tag("script", "noscript")
    for el in scripts:
        el.remove()


def replace_brs(elem: Element, doc: Document, brs: list | None = None) -> None:
    """Runs of >=2 <br> become a <p> capturing following phrasing content."""
    if brs is None:
        brs = list(elem.get_elements_by_tag("br"))
    for br in brs:
        if br.parent is None:
            continue
        nxt = br.next_sibling
        replaced = False
        nxt = next_significant_node(nxt)
        while nxt is not None and isinstance(nxt, Element) and nxt.tag == "br":
            replaced = True
            sibling = nxt.next_sibling
            nxt.remove()
            nxt = next_significant_node(sibling)
        if not replaced:
            continue
        p = doc.create_element("p")
        br.parent.replace_child(p, br)
        nxt = p.next_sibling
        while nxt is not None:
            if isinstance(nxt, Element) and nxt.tag == "br":
                next_elem = next_significant_node(nxt.next_sibling)
                if isinstance(next_elem, Element) and next_elem.tag == "br":
                    break
            if not is_phrasing_content(nxt):
                break
            sibling = nxt.next_sibling
            p.append_child(nxt)
            nxt = sibling
        while p.last_child is not None and is_whitespace(p.last_child):
            p.last_child.remove()
        if p.parent is not None and p.parent.tag == "p":
            set_node_tag(p.parent, "div")


def prep_document(doc: Document) -> None:
    """Remove style tags, normalize <br> runs, retag <font> as <span>.

    One walk collects styles, fonts AND brs together: style elements
    hold raw text (never br/font descendants), every br element lives
    under body (the tree builder's ensure-body rule), and replace_brs
    only removes <br>/whitespace nodes and re-parents phrasing content
    (guards re-check live state), so the three pre-collected lists are
    each the complete live set when their pass runs (same order of
    operations as the canonical code)."""
    styles: list[Element] = []
    fonts: list[Element] = []
    brs: list = []
    stack = doc.children[::-1]
    pop = stack.pop
    extend = stack.extend
    while stack:
        n = pop()
        if n.IS_ELEMENT:
            tag = n.tag
            if tag == "br":
                brs.append(n)
            elif tag == "style":
                styles.append(n)
            elif tag == "font":
                fonts.append(n)
            if n.children:
                extend(n.children[::-1])
    for el in styles:
        el.remove()
    body = doc.body
    if body is not None:
        replace_brs(body, doc, brs)
    for el in fonts:
        set_node_tag(el, "span")
