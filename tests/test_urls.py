"""URL absolutization parity tests (Postprocessor.swift:96-257 cases)."""

from swift_readability_spark.core.postprocess import to_absolute_uri

BASE = "http://fakehost/test/page.html"


def test_relative_path():
    assert to_absolute_uri("foo/bar.html", BASE, BASE) == "http://fakehost/test/foo/bar.html"


def test_parent_path():
    assert to_absolute_uri("../up.html", BASE, BASE) == "http://fakehost/up.html"


def test_root_relative():
    assert to_absolute_uri("/root.html", BASE, BASE) == "http://fakehost/root.html"


def test_scheme_relative():
    assert to_absolute_uri("//other.host/x", BASE, BASE) == "http://other.host/x"


def test_hash_only_preserved_when_base_is_document():
    assert to_absolute_uri("#sec", BASE, BASE) == "#sec"
    assert (
        to_absolute_uri("#sec", "http://fakehost/base/", BASE)
        == "http://fakehost/base/#sec"
    )


def test_absolute_passthrough_and_host_lowercase():
    assert (
        to_absolute_uri("HTTP://EXAMPLE.com/Path", BASE, BASE)
        == "http://example.com/Path"
    )


def test_data_url_untouched():
    data = "data:image/png;base64,AAAA"
    assert to_absolute_uri(data, BASE, BASE) == data


def test_space_percent_encoded():
    assert (
        to_absolute_uri("a b.html", BASE, BASE) == "http://fakehost/test/a%20b.html"
    )


def test_windows_drive_pipe():
    assert to_absolute_uri("file:///C|/x/y.gif", BASE, BASE).startswith("file:///C:/")


def test_trailing_question_and_hash_kept():
    assert to_absolute_uri("x.html?", BASE, BASE).endswith("x.html?")
    assert to_absolute_uri("x.html#", BASE, BASE).endswith("x.html#")


def test_double_slash_in_path_preserved():
    out = to_absolute_uri("\u200bhttps://h/x", BASE, BASE)
    assert "https://h/x" in out
