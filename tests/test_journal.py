"""Direct unit tests for the DOM mutation journal (dom.journal_*) —
the retry-rollback mechanism behind grab_article.  The 130-fixture
gate covers it end-to-end; these pin the primitive-level contract so a
new mutation path that forgets to journal fails HERE with a readable
diff, not as a fixture-parity mystery.
"""

from swift_readability_spark.core import dom as D
from swift_readability_spark.core.dom import parse_html
from swift_readability_spark.core.helpers import set_node_tag


def _snapshot(doc):
    return doc.outer_html


def _roundtrip(html, mutate):
    """Parse, journal, mutate, replay; return (pristine, restored)."""
    doc = parse_html(html, "http://fakehost/x")
    before = _snapshot(doc)
    journal = D.journal_start()
    try:
        mutate(doc)
    finally:
        D.journal_stop()
    D.journal_replay(journal, doc)
    return before, _snapshot(doc)


BASE = (
    '<html><head><title>T</title></head><body>'
    '<div id="a" class="x"><p>one</p><p>two</p></div>'
    '<div id="b" style="color:red" width="5">text<br><span>s</span></div>'
    "</body></html>"
)


def test_removal_restored_at_exact_position():
    def mutate(doc):
        ps = doc.get_elements_by_tag("p")
        ps[0].remove()
        doc.get_elements_by_tag("span")[0].remove()

    before, after = _roundtrip(BASE, mutate)
    assert before == after


def test_moves_and_inserts_restored():
    def mutate(doc):
        a = doc.get_elements_by_tag("div")[0]
        b = doc.get_elements_by_tag("div")[1]
        # move a's first p into b, insert a fresh element, replace a child
        p = a.element_children[0]
        b.append_child(p)
        fresh = doc.create_element("em")
        a.insert_before(fresh, a.first_child)
        b.replace_child(doc.create_element("u"), b.element_children[-1])

    before, after = _roundtrip(BASE, mutate)
    assert before == after


def test_attr_and_tag_mutations_restored_with_dict_order():
    def mutate(doc):
        b = doc.get_elements_by_tag("div")[1]
        b.remove_attr("style")  # delete first key -> order matters
        b.set_attr("width", "99")  # overwrite
        b.set_attr("new", "v")  # add
        b.id = "changed"
        set_node_tag(b, "section")

    before, after = _roundtrip(BASE, mutate)
    assert before == after


def test_readability_and_data_table_reset():
    doc = parse_html(BASE, "http://fakehost/x")
    a = doc.get_elements_by_tag("div")[0]
    journal = D.journal_start()
    try:
        journal.append((5, a))
        a.readability = 42.0
        journal.append((6, a))
        a._data_table = True
    finally:
        D.journal_stop()
    D.journal_replay(journal, doc)
    assert a.readability is None
    assert a._data_table is None


def test_out_of_body_removals_persist():
    """Canonical restores only body.innerHTML: a node removed from
    <head> must STAY removed after replay."""

    def mutate(doc):
        doc.get_elements_by_tag("title")[0].remove()
        doc.get_elements_by_tag("p")[0].remove()  # body-scope: restored

    before, after = _roundtrip(BASE, mutate)
    assert before != after
    assert "<title>" not in after
    assert after.count("<p>") == before.count("<p>")


def test_inactive_journal_records_nothing():
    doc = parse_html(BASE, "http://fakehost/x")
    assert D._journal is None
    doc.get_elements_by_tag("p")[0].remove()  # no journal -> no error
    journal = D.journal_start()
    D.journal_stop()
    assert journal == []


def test_caches_invalidated_after_replay():
    doc = parse_html(BASE, "http://fakehost/x")
    body = doc.body
    _ = body.text_content  # warm caches
    journal = D.journal_start()
    try:
        doc.get_elements_by_tag("p")[0].remove()
    finally:
        D.journal_stop()
    D.journal_replay(journal, doc)
    assert "one" in body.text_content  # restored text visible, not stale


# -- property test: random journaled mutation sequences replay exactly ------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _mutation_script(draw):
    """A list of (op, int-args) applied against whatever the live tree
    offers at execution time."""
    n = draw(st.integers(min_value=1, max_value=25))
    ops = []
    for _ in range(n):
        ops.append(
            (
                draw(st.sampled_from(
                    ["remove", "move", "retag", "set_attr", "del_attr",
                     "insert_fresh", "score", "mark_table"]
                )),
                draw(st.integers(min_value=0, max_value=10**6)),
                draw(st.integers(min_value=0, max_value=10**6)),
            )
        )
    return ops


_BASE = (
    '<html><head><title>T</title><meta name="a" content="b"></head><body>'
    '<div id="a" class="x y"><p>one <b>deep</b></p><p>two</p><ul><li>i1</li>'
    '<li>i2</li></ul></div><table><tr><td>c</td></tr></table>'
    '<div style="color:red" width="5">text<br><span data-k="v">s</span></div>'
    "</body></html>"
)


@given(_mutation_script())
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_random_mutation_sequences_replay_exactly(script):
    from swift_readability_spark.core import dom as D
    from swift_readability_spark.core.dom import Element, parse_html
    from swift_readability_spark.core.helpers import set_node_tag

    doc = parse_html(_BASE, "http://fakehost/x")
    body = doc.body
    before = doc.outer_html

    def elements():
        return [n for n in body.iter_subtree() if n.IS_ELEMENT]

    journal = D.journal_start()
    try:
        for op, i, j in script:
            els = elements()
            if not els:
                break
            el = els[i % len(els)]
            if op == "remove":
                el.remove()
            elif op == "move":
                tgt = els[j % len(els)]
                if tgt is not el and not _is_ancestor(el, tgt):
                    tgt.append_child(el)
            elif op == "retag":
                set_node_tag(el, ["p", "div", "span", "section"][j % 4])
            elif op == "set_attr":
                el.set_attr(["class", "id", "style", "zz"][j % 4], f"v{j}")
            elif op == "del_attr":
                if el.attrs:
                    el.remove_attr(list(el.attrs)[j % len(el.attrs)])
            elif op == "insert_fresh":
                el.append_child(Element("em"))
            elif op == "score":
                if el.tag != "body":
                    journal.append((5, el))
                    el.readability = float(j)
            elif op == "mark_table":
                journal.append((6, el))
                el._data_table = bool(j % 2)
    finally:
        D.journal_stop()
    D.journal_replay(journal, doc)
    assert doc.outer_html == before
    for n in body.iter_subtree():
        if n.IS_ELEMENT:
            assert n.readability is None
            assert n._data_table is None


def _is_ancestor(a, b) -> bool:
    cur = b.parent
    while cur is not None:
        if cur is a:
            return True
        cur = cur.parent
    return False


def test_grab_article_exception_restores_document():
    """If _grab_once raises mid-attempt, grab_article must replay the
    active journal before propagating — a caller that catches the
    exception and reuses the Document must see a pristine tree (ADVICE
    r03: previously the finally only stopped the journal, leaving the
    doc half-mutated)."""
    from swift_readability_spark.core.grabber import Grabber

    html = (
        "<html><head><title>T</title></head><body>"
        + '<div class="ad"><p>junk</p></div>'
        + "<div><p>" + "real content with words, commas, and length. " * 20
        + "</p></div></body></html>"
    )
    doc = parse_html(html, "http://fakehost/x")
    before = doc.outer_html
    g = Grabber(doc, {"title": "T"})
    real_grab_once = g._grab_once

    def exploding_grab_once():
        real_grab_once()  # mutates the tree (unlikely-candidate strip etc.)
        raise RuntimeError("mid-attempt failure")

    g._grab_once = exploding_grab_once
    try:
        g.grab_article()
    except RuntimeError as e:
        assert "mid-attempt" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected the planted exception to propagate")
    assert doc.outer_html == before
    assert D._journal is None
