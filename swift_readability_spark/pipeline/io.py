"""Table I/O abstraction: Iceberg when a catalog is configured,
parquet otherwise.

The north rule targets Iceberg tables (atomic appends make the
output+lineage commit transactional, and ``bucket(N, doc_id)`` hidden
partitioning lets the extraction shuffle be elided via storage-
partitioned scans).  This sandbox has no Iceberg runtime jars, so the
same call sites run on parquet paths; the semantics relied upon —
append-only output, lineage-as-commit-point — hold in both modes
(see ``job.run_extraction``'s commit-protocol note for the parquet
caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """``catalog.db.table`` -> Iceberg/catalog table; anything else ->
    parquet path."""
    if "/" not in location and "." in location:
        return spark.read.table(location)
    return spark.read.parquet(location)


def append_table(df: DataFrame, location: str) -> None:
    if "/" not in location and "." in location:
        df.writeTo(location).append()
    else:
        df.write.mode("append").parquet(location)


def write_bucketed_corpus(
    df: DataFrame, table: str, n_buckets: int = 1024
) -> None:
    """Persist a corpus as a bucketed table (plain Spark datasource
    bucketing — no Iceberg jars needed): ``bucketBy(N, doc_id)`` writes
    each bucket as its own file set and records the layout in the
    catalog, so every later scan reports
    ``HashPartitioning(doc_id, N)`` and Catalyst elides the Exchange
    for any doc_id-keyed aggregation or join over it.  This is the
    parquet-mode realization of the Iceberg ``bucket(N, doc_id)``
    layout in ``iceberg_ddl`` — same plan effect, demonstrable in this
    sandbox (tests/test_bucketed.py asserts zero Exchange)."""
    (
        df.repartition(n_buckets, "doc_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(table)
    )


def iceberg_ddl(table: str, n_buckets: int = 1024) -> str:
    """The production table layout: hidden bucket partitioning on
    doc_id co-locates the extraction input with the stable partition
    keys, so the per-run shuffle disappears at steady state."""
    return f"""
CREATE TABLE {table} (
  doc_id STRING,
  spans  ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>
)
USING iceberg
PARTITIONED BY (bucket({n_buckets}, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""


_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".orc": "orc",
}


def read_documents(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """Read a documents table from any of the common lake formats.

    ``fmt`` (parquet/json/csv/orc) wins when given — the common lake
    layout is a *directory* of .json/.csv part files whose path carries
    no extension, so extension sniffing alone would misread it as
    parquet; sniffing is only the fallback for unset ``fmt``.  CSV
    reads with a header; JSON is line-delimited.  Passing an explicit
    ``schema`` string avoids the inference scan — at 100 TB schema
    inference is a full extra pass, so production callers should
    always pass it."""
    import os

    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _FORMAT_BY_EXT.get(ext, "parquet")
    elif fmt not in set(_FORMAT_BY_EXT.values()):
        raise ValueError(
            f"unsupported input format {fmt!r}; expected one of "
            f"{sorted(set(_FORMAT_BY_EXT.values()))}"
        )
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "inferSchema", "false" if schema else "true"
        )
    return reader.format(fmt).load(path)
