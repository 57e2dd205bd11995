"""Robustness: malformed input becomes error rows, never job failures;
mega-docs stay within batch bounds."""

import pyspark.sql.functions as F

from swift_readability_spark.extract import extract_document
from swift_readability_spark.pipeline.job import DOCUMENTS_SCHEMA, plan_extraction


def test_malformed_documents_become_error_rows(spark):
    rows = [
        ("ok-doc", [{"kind": "text", "text": "<html><body><p>" + "words " * 200 + "</p></body></html>", "media_ref": None, "offset": 0}]),
        ("empty-spans", []),
        ("null-spans", None),
        ("bad-offset", [{"kind": "media", "text": None, "media_ref": "x.jpg", "offset": 5}]),
        ("not-html", [{"kind": "text", "text": "\x00\x01<<<>>>&&&", "media_ref": None, "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = plan_extraction(df, "http://fakehost/x.html", "t", n_partitions=4).collect()
    assert len(out) == len(rows)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["ok-doc"]["error"] is None
    assert by_id["ok-doc"]["text_length"] > 0
    # degenerate inputs either produce an empty-but-valid result or a
    # recorded error -- never an exception
    for doc_id in ("empty-spans", "null-spans", "bad-offset", "not-html"):
        assert doc_id in by_id


def test_pure_python_never_raises():
    for spans in ([], None, [{"kind": "text", "text": None, "media_ref": None, "offset": 0}]):
        result = extract_document("x", spans or [], "http://fakehost/x.html")
        assert result["doc_id"] == "x"


def test_extraction_deterministic_across_runs(spark, corpus_dir):
    docs = spark.read.parquet(corpus_dir + "/documents.parquet").limit(30)
    a = plan_extraction(docs, "http://fakehost/test/page.html", "r1", 4)
    b = plan_extraction(docs, "http://fakehost/test/page.html", "r1", 4)
    ra = {(r["doc_id"], str(r["spans"]), r["title"]) for r in a.collect()}
    rb = {(r["doc_id"], str(r["spans"]), r["title"]) for r in b.collect()}
    assert ra == rb
