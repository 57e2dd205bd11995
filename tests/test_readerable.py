"""Readerable-threshold tests mirroring the reference's
ReaderableTests.swift:10-96 (synthetic threshold grids)."""

from swift_readability_spark.core.dom import parse_html
from swift_readability_spark.core.readerable import is_probably_readerable


def _doc(repeats: int):
    return parse_html(f"<html><body><p>{'hello there ' * repeats}</p></body></html>")


def test_default_thresholds():
    assert not is_probably_readerable(_doc(1))
    assert not is_probably_readerable(_doc(11))
    assert not is_probably_readerable(_doc(12))
    assert is_probably_readerable(_doc(50))


def test_lowered_thresholds():
    doc = _doc(12)
    assert is_probably_readerable(doc, min_content_length=120, min_score=0)
    assert not is_probably_readerable(doc, min_content_length=200, min_score=0)


def test_visibility_checker_injected():
    doc = _doc(50)
    assert not is_probably_readerable(doc, visibility_checker=lambda n: False)


def test_div_br_counts():
    html = "<html><body><div>%s<br>%s</div></body></html>" % (
        "sentence one here. " * 15,
        "sentence two here. " * 15,
    )
    assert is_probably_readerable(parse_html(html), min_score=1)


def test_unlikely_class_skipped():
    html = f"<html><body><p class='comment sidebar'>{'hello there ' * 50}</p></body></html>"
    assert not is_probably_readerable(parse_html(html))
