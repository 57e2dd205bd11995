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
