"""Smoke tests for the driver contract (__spark_entry__.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_registry_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 25
    assert set(o) <= set(q)
    # the vast majority of operators must be value-oracle-checked
    assert len(o) >= len(q) - 2


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) == 5
    assert {"doc_id", "title", "text_length", "readerable"} <= set(df.columns)


def test_extraction_query_matches_oracle(spark):
    """One in-suite oracle check so pytest alone catches drift (the
    driver re-checks all of them at sf0.01)."""
    import duckdb

    q = entrymod.queries()["extract_metadata"]
    sdf = q(spark, SF_DIR)
    srows = {
        (r["doc_id"], r["title"], r["byline"], r["text_length"], r["readerable"])
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    drows = {
        (r[0], r[1], r[2], r[5], r[6])
        for r in con.execute(entrymod.oracle_sql()["extract_metadata"]).fetchall()
    }
    assert srows == drows
