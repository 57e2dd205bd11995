"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query: full readability extraction
(the Arrow-batch vectorized core) over an interleaved spans corpus
constructed deterministically from the sf0.001 ``documents`` table.

``queries()`` exposes every implemented operator from SURVEY.md §2 and
the training-data-pipeline operators (dedup / similarity search / text
analysis / multimodal plumbing); ``oracle_sql()`` gives the DuckDB
equivalent for each — including the extraction itself, whose expected
output is closed-form for the constructed corpus.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction metadata view over sf0.001; rows > 0 with a
    stable schema (doc_id, title, byline, lang, excerpt, text_length,
    readerable, failed)."""
    from swift_readability_spark.operators.extraction import extract_metadata

    return extract_metadata(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from swift_readability_spark.operators import registry

    return {name: builder for name, (builder, _oracle) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from swift_readability_spark.operators import registry

    return {
        name: oracle
        for name, (_builder, oracle) in registry().items()
        if oracle is not None
    }
