"""Bucketed-table shuffle elision, for real (VERDICT r01 item 3).

``write_bucketed_corpus`` persists the corpus with
``bucketBy(N, doc_id)``; Catalyst then reports
``HashPartitioning(doc_id, N)`` from the scan, so doc_id-keyed
aggregations/joins over the bucketed table need NO Exchange — the
sandbox-runnable realization of the Iceberg ``bucket(N, doc_id)``
layout the production DDL declares (pipeline/io.py).
"""

import pytest

import pyspark.sql.functions as F

from swift_readability_spark.pipeline.io import write_bucketed_corpus

TABLE = "srs_test_corpus_bucketed"
N_BUCKETS = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, corpus_dir):
    docs = spark.read.parquet(corpus_dir + "/documents.parquet")
    write_bucketed_corpus(docs, TABLE, N_BUCKETS)
    yield spark.table(TABLE)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_docid_aggregation_has_no_exchange(spark, corpus_dir, bucketed):
    agg = bucketed.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)
    # the identical aggregation over the plain parquet corpus shuffles
    plain = (
        spark.read.parquet(corpus_dir + "/documents.parquet")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    assert "Exchange" in _plan(plain)


def test_docid_self_join_has_no_exchange(bucketed):
    a = bucketed.select("doc_id")
    b = bucketed.select("doc_id", F.size("spans").alias("n_spans"))
    joined = a.join(b.hint("merge"), "doc_id")
    assert "Exchange" not in _plan(joined)


def test_extraction_over_bucketed_table_elides_shuffle(spark, bucketed):
    """The full extraction plan over the bucketed corpus in
    assume_pre_partitioned mode: zero Exchange, results identical to
    the shuffled route."""
    from swift_readability_spark.pipeline.job import plan_extraction

    pre = plan_extraction(
        bucketed, "http://fakehost/test/page.html", "r", N_BUCKETS,
        assume_pre_partitioned=True,
    )
    assert "Exchange" not in _plan(pre)
    shuffled = plan_extraction(
        bucketed, "http://fakehost/test/page.html", "r", N_BUCKETS
    )
    got = {(r["doc_id"], r["title"], r["text_length"]) for r in pre.collect()}
    want = {(r["doc_id"], r["title"], r["text_length"]) for r in shuffled.collect()}
    assert got == want


def test_bucketed_scan_reports_bucket_layout(bucketed):
    plan = _plan(bucketed.groupBy("doc_id").count())
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan
