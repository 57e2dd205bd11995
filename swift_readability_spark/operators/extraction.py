"""The flagship operator: full readability extraction over an
interleaved spans corpus — with a *value-checked* oracle.

The driver's testdata has no spans table, so we construct one
deterministically from ``documents``: each row becomes an HTML page
(title/author/description metadata + the text split into paragraphs),
segmented into interleaved text/media spans (every third document gets
a media span).  Because the construction is closed-form, the expected
extraction output (title, byline, excerpt, lang, text length,
readerable score) is computable in pure SQL — so even the Arrow-batch
extraction stage gets a DuckDB value oracle, not just a row count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipeline.job import plan_extraction
from .common import read

_HTML_HEAD = (
    "'<html lang=\"' || lang || '\"><head><title>Doc ' || doc_id || '</title>"
    "<meta name=\"author\" content=\"Author ' || doc_id || '\">"
    "<meta property=\"og:description\" content=\"Synthetic document ' || doc_id || '\">"
    "</head><body><div class=\"content\"><p>' || "
    "replace(text, '. ', '.</p><p>') || '</p>'"
)
_HTML_TAIL = "'</div></body></html>'"
_MEDIA_REF = "'http://fakehost/media/img-' || doc_id || '.jpg'"


def interleaved_documents(spark, sf_dir, partitions: int | None = None):
    """documents -> (doc_id, spans) in the BASELINE input_hint shape.

    ``partitions`` pre-spreads the base table so the HTML construction
    runs in parallel even when the source is a single parquet file
    (otherwise the map stage feeding the extraction shuffle is serial).
    """
    d = read(spark, sf_dir, "documents")
    if partitions:
        d = d.repartition(partitions)
    return d.selectExpr(
        "CAST(doc_id AS STRING) AS doc_id",
        f"""
        CASE WHEN doc_id % 3 = 0 THEN array(
            named_struct('kind', 'text', 'text', {_HTML_HEAD},
                         'media_ref', CAST(NULL AS STRING), 'offset', 0),
            named_struct('kind', 'media', 'text', CAST(NULL AS STRING),
                         'media_ref', {_MEDIA_REF}, 'offset', 1),
            named_struct('kind', 'text', 'text', {_HTML_TAIL},
                         'media_ref', CAST(NULL AS STRING), 'offset', 2))
        ELSE array(
            named_struct('kind', 'text', 'text', {_HTML_HEAD} || {_HTML_TAIL},
                         'media_ref', CAST(NULL AS STRING), 'offset', 0))
        END AS spans
        """,
    )


def _extracted(spark, sf_dir):
    # partition count from actual cluster parallelism, not
    # spark.sql.shuffle.partitions: a default-200 session would spread
    # this small demo corpus over 800 physical tasks of pure overhead
    n = max(int(spark.sparkContext.defaultParallelism), 2)
    docs = interleaved_documents(spark, sf_dir, partitions=n)
    return plan_extraction(
        docs, "http://fakehost/test/page.html", run_id="entry", n_partitions=n
    )


def extract_metadata(spark, sf_dir):
    """Readability extraction (metadata view) — value-oracle-checked."""
    return _extracted(spark, sf_dir).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "title",
        "byline",
        "lang",
        "excerpt",
        F.col("text_length").cast("bigint").alias("text_length"),
        "readerable",
        F.col("error").isNotNull().alias("failed"),
    )


EXTRACT_METADATA_SQL = """
WITH base AS (
  SELECT doc_id, lang, n_chars, text,
         string_split(text, '. ') AS parts,
         (length(text) - length(replace(text, '. ', ''))) / 2 AS n_splits
  FROM documents
),
scored AS (
  SELECT doc_id, lang, n_chars, n_splits,
         [CASE WHEN i < len(parts) THEN length(parts[i]) + 1
               ELSE length(parts[i]) END
          FOR i IN range(1, len(parts) + 1)] AS para_lens
  FROM base
)
SELECT doc_id,
       'Doc ' || doc_id AS title,
       'Author ' || doc_id AS byline,
       lang,
       'Synthetic document ' || doc_id AS excerpt,
       CAST(n_chars - n_splits AS BIGINT) AS text_length,
       list_reduce(list_transform(para_lens,
                                  l -> CASE WHEN l >= 140 THEN sqrt(l - 140)
                                            ELSE 0.0 END),
                   (a, b) -> a + b) > 20 AS readerable,
       false AS failed
FROM scored
"""


def extract_spans_stats(spark, sf_dir):
    """Span-skeleton view of the extraction output.  Value-oracled:
    the constructed corpus keeps exactly one media span iff
    doc_id %% 3 = 0 (the media sits inside the retained content div),
    giving spans [text, media, text], else a single text span.  The
    span *content* is gated by the fixture pytest suite."""
    out = _extracted(spark, sf_dir)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size("spans").cast("bigint").alias("n_spans"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))")
        .cast("bigint")
        .alias("n_media_spans"),
        F.expr("element_at(spans, 1).kind").alias("first_kind"),
    )


EXTRACT_SPANS_STATS_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS BIGINT) AS n_spans,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_media_spans,
       'text' AS first_kind
FROM documents
"""


QUERIES = {
    "extract_metadata": (extract_metadata, EXTRACT_METADATA_SQL),
    "extract_spans_stats": (extract_spans_stats, EXTRACT_SPANS_STATS_SQL),
}


CURATE_MIN_CHARS = 200


def extract_and_curate(spark, sf_dir):
    """The end-to-end training-data pipeline in one plan: extraction
    (Arrow-batch readability core) -> quality gates on the EXTRACTED
    content (parse success, minimum length) -> exact
    dedup on the extracted text (hash-groupBy, min-doc_id canonical)
    -> curated survivors.  Everything after the extraction stage is
    native DataFrame code; the only shuffle beyond extraction's is the
    dedup hash aggregation.  Value-oracled end to end because the
    constructed corpus makes the extracted text closed-form
    (replace(text, '. ', '.')).

    The readerable flag is deliberately NOT a gate here: the synthetic
    corpus's paragraphs are short, so it passes only ~1% and would
    make the demo degenerate — on real pages add
    ``& F.col("readerable")``."""
    out = _extracted(spark, sf_dir)
    # plain text of the extracted article: concatenate text spans,
    # strip markup (span text is serialized HTML of the cleaned
    # content; the synthetic corpus has no entity-escaped chars)
    content_text = (
        "regexp_replace(concat_ws('', transform(filter(spans,"
        " s -> s.kind = 'text'), s -> s.text)), '<[^>]*>', '')"
    )
    curated = (
        out.filter(
            (F.col("error").isNull())
            & (F.col("text_length") >= CURATE_MIN_CHARS)
        )
        .withColumn("content_hash", F.md5(F.expr(content_text)))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "title",
            "lang",
            F.col("text_length").cast("bigint").alias("text_length"),
            "content_hash",
        )
    )
    canonical = curated.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id")
    )
    return curated.join(canonical, ["content_hash", "doc_id"], "left_semi").select(
        "doc_id", "title", "lang", "text_length", "content_hash"
    )


EXTRACT_AND_CURATE_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, n_chars, text,
         string_split(text, '. ') AS parts,
         (length(text) - length(replace(text, '. ', ''))) / 2 AS n_splits
  FROM documents
),
scored AS (
  SELECT doc_id, lang, n_chars, n_splits, text,
         [CASE WHEN i < len(parts) THEN length(parts[i]) + 1
               ELSE length(parts[i]) END
          FOR i IN range(1, len(parts) + 1)] AS para_lens
  FROM base
),
ex AS (
  SELECT doc_id,
         'Doc ' || doc_id AS title,
         lang,
         CAST(n_chars - n_splits AS BIGINT) AS text_length,
         md5(replace(text, '. ', '.')) AS content_hash,
         list_reduce(list_transform(para_lens,
                                    l -> CASE WHEN l >= 140 THEN sqrt(l - 140)
                                              ELSE 0.0 END),
                     (a, b) -> a + b) > 20 AS readerable
  FROM scored
),
gated AS (
  SELECT * FROM ex WHERE text_length >= {CURATE_MIN_CHARS}
)
SELECT g.doc_id, g.title, g.lang, g.text_length, g.content_hash
FROM gated g
JOIN (
  SELECT content_hash, min(doc_id) AS doc_id FROM gated GROUP BY content_hash
) c ON g.content_hash = c.content_hash AND g.doc_id = c.doc_id
"""

QUERIES["extract_and_curate"] = (extract_and_curate, EXTRACT_AND_CURATE_SQL)
