"""Corpus-level operators expressed as native DataFrame plans.

Each module exposes ``QUERIES: dict[str, (builder, oracle_sql|None)]``
where ``builder(spark, sf_dir) -> DataFrame`` and the oracle is the
equivalent DuckDB SQL over the same parquet tables.  Builders are
Spark-first: built-in functions only (whole-stage codegen), explicit
broadcasts for small dimensions, window top-k, no Python UDFs except
the clearly-marked Arrow-batch stages.
"""

from . import curation, dedup, extraction, multimodal, relational, similarity, text

ALL_MODULES = (relational, text, dedup, similarity, curation, multimodal, extraction)


def registry():
    out = {}
    for mod in ALL_MODULES:
        for name, pair in mod.QUERIES.items():
            assert name not in out, f"duplicate query {name}"
            out[name] = pair
    return out
