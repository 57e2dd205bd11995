"""The isProbablyReaderable pre-filter.

Re-expresses ``/root/reference/Sources/SwiftReadability/Readability.swift:197-308``
(canonical ``tmp-readability/Readability-readerable.js``): a cheap score
over visible <p>/<pre>/<article> nodes (plus parents of <div><br>) that
predicts whether full extraction will succeed.  In the Spark pipeline
this is a vectorized pre-filter column — hopeless documents can skip
the expensive grab stage entirely.
"""

from __future__ import annotations

import math

from . import regexps as R
from .dom import Document, Element, js_trim
from .helpers import has_ancestor_tag

DEFAULT_MIN_CONTENT_LENGTH = 140
DEFAULT_MIN_SCORE = 20.0


def _is_node_visible(node: Element) -> bool:
    if node.style_prop("display") == "none":
        return False
    if node.has_attr("hidden"):
        return False
    if (
        node.has_attr("aria-hidden")
        and node.get_attr("aria-hidden") == "true"
        and "fallback-image" not in node.class_name
    ):
        return False
    return True


def is_probably_readerable(
    doc: Document,
    *,
    min_content_length: int = DEFAULT_MIN_CONTENT_LENGTH,
    min_score: float = DEFAULT_MIN_SCORE,
    visibility_checker=None,
) -> bool:
    checker = visibility_checker or _is_node_visible
    nodes = doc.get_elements_by_tag("p", "pre", "article")
    # include parents of <div> > <br>
    br_parents = []
    seen = set(id(n) for n in nodes)
    for br in doc.get_elements_by_tag("br"):
        parent = br.parent
        if parent is not None and isinstance(parent, Element) and parent.tag == "div":
            if id(parent) not in seen:
                seen.add(id(parent))
                br_parents.append(parent)
    nodes = nodes + br_parents

    score = 0.0
    for node in nodes:
        if not checker(node):
            continue
        match_string = node.class_name + " " + node.id
        if R.UNLIKELY_CANDIDATES.search(match_string) and not R.OK_MAYBE_ITS_A_CANDIDATE.search(
            match_string
        ):
            continue
        # skip p nodes inside li ("li p" selector)
        if node.tag == "p" and has_ancestor_tag(node, "li", -1):
            continue
        text_content_length = len(js_trim(node.text_content))
        if text_content_length < min_content_length:
            continue
        score += math.sqrt(text_content_length - min_content_length)
        if score > min_score:
            return True
    return False
