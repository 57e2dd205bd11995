"""Skew robustness for the curation operators: a mega-document and a
corpus-wide boilerplate chunk (the 100-TB failure shapes: one huge row,
one degenerate hot key)."""

import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

BOILER = "all rights reserved contact the site admin for removal requests"
assert len(BOILER.split()) == 10  # exactly one chunk


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewdocs"))
    rows = []
    for i in range(2000):
        body = f"unique words for document number {i} spread over several tokens"
        # 500 docs carry the identical boilerplate chunk (hot key)
        text = body + " " + BOILER if i % 4 == 0 else body
        rows.append((i, "en", text))
    # one mega-doc: 50k words -> 5k chunks, all unique
    mega = " ".join(f"megaword{j}" for j in range(50_000))
    rows.append((100_000, "en", mega))
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(
        out + "/documents.parquet"
    )
    return out


def test_paragraph_dedup_drops_hot_chunk_everywhere(spark, skew_dir):
    from swift_readability_spark.operators.curation import paragraph_dedup

    out = {r.doc_id: r for r in paragraph_dedup(spark, skew_dir).collect()}
    assert len(out) == 2001
    for doc_id, r in out.items():
        assert r.n_kept + r.n_removed == r.n_chunks
        assert BOILER not in r.dedup_text
    # the hot chunk was removed from every carrier, nothing else from them
    carriers = [out[i] for i in range(0, 2000, 4)]
    assert all(r.n_removed >= 1 for r in carriers)
    # mega-doc survives intact (all chunks unique)
    mega = out[100_000]
    assert mega.n_chunks == 5000 and mega.n_removed == 0
    assert mega.dedup_text.startswith("megaword0 ")


def test_pack_sequences_handles_oversize_doc(spark, skew_dir):
    from swift_readability_spark.operators.curation import (
        PACK_BUDGET,
        pack_sequences,
    )

    rows = pack_sequences(spark, skew_dir).collect()
    assert len(rows) == 2001
    mega = next(r for r in rows if r.doc_id == 100_000)
    assert mega.n_tokens == 50_000 > PACK_BUDGET  # oversize: one home seq
    # greedy-cumsum invariant holds bucket-by-bucket despite the skew
    by_bucket = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        cum = by_bucket.get(r.bucket, 0)
        assert r.seq_id == cum // PACK_BUDGET
        by_bucket[r.bucket] = cum + r.n_tokens


def test_shingle_family_linear_on_mega_docs(spark, skew_dir):
    """The dedup shingle/gram family must stay linear on mega-docs:
    before the lookahead-regex rewrite, Catalyst's pushdown inlined the
    tokenization into per-element lambdas and these queries ran for
    MINUTES on a corpus like this (O(n^2) per doc).  A generous wall
    ceiling still fails fast if that class of regression returns."""
    import time

    from swift_readability_spark.operators import registry

    reg = {name: b for name, (b, _o) in registry().items()}
    for name in ("minhash_signatures", "decontaminate_against_eval",
                 "repetition_stats"):
        t0 = time.perf_counter()
        df = reg[name](spark, skew_dir)
        df.write.format("noop").mode("overwrite").save()  # no column pruning
        assert time.perf_counter() - t0 < 120, f"{name} superlinear on mega-docs"
