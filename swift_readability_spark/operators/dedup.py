"""Deduplication operators over ``documents``: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Hashes are *portable*: ``bigint(first 8 hex chars of md5)`` — identical
in Spark (``conv(substr(md5(x),1,8),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``) so every stage is
oracle-checkable.  At 100 TB the same plans hold: shingle explode is a
map-side transform, MinHash is a hash aggregation on doc_id, and the
LSH band join replaces the quadratic pair scan with an equi-join on
(band, bucket) — the only shuffle keys are band buckets, which are
uniformly distributed by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import read

N_PERMS = 8
BAND_SIZE = 2
N_BANDS = N_PERMS // BAND_SIZE

# -- portable word/shingle prep (identical semantics in both engines) --
_SPARK_WORDS = (
    "filter(split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ')), ' +'),"
    " x -> x <> '')"
)
_DUCK_WORDS = (
    "list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')),"
    " ' +'), x -> x <> '')"
)
_SPARK_SHINGLES = (
    f"CASE WHEN size(words) >= 3 THEN"
    f" transform(sequence(1, size(words) - 2),"
    f" i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),"
    f" element_at(words, i + 2)))"
    f" ELSE array(concat_ws(' ', words)) END"
)
_DUCK_SHINGLES = (
    "CASE WHEN len(words) >= 3 THEN"
    " [words[i] || ' ' || words[i+1] || ' ' || words[i+2]"
    "  FOR i IN range(1, len(words) - 1)]"
    " ELSE [array_to_string(words, ' ')] END"
)


def _spark_hash(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def _duck_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized content; the canonical
    representative is the minimum doc_id (map-side partial agg; the
    only shuffle key is the content hash — no skew for real corpora)."""
    d = read(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        d.withColumn("content_hash", F.md5(norm))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
       count(*) AS cluster_size,
       min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
"""


# universal-hash permutation constants: perm_k(h) = (A_k*h + B_k) mod P
# over the 32-bit base hash — one md5 per shingle instead of N_PERMS,
# identical arithmetic in both engines (fits in int64: A < 2^20,
# h < 2^32 -> A*h + B < 2^53)
_MINHASH_P = 4294967311  # prime > 2^32
_MINHASH_A = (998377, 811823, 651439, 527581, 423037, 342049, 276197, 223409)
_MINHASH_B = (12721, 29363, 47563, 65537, 83701, 104729, 122887, 141079)


def minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 universal-hash permutations of a single
    portable 32-bit shingle hash) over 3-word shingles."""
    d = read(spark, sf_dir, "documents")
    out = (
        d.selectExpr("doc_id", f"{_SPARK_WORDS} AS words")
        .selectExpr("doc_id", f"{_SPARK_SHINGLES} AS shingles")
        .selectExpr(
            "doc_id",
            "transform(shingles, s -> " + _spark_hash("s") + ") AS hashes",
        )
    )
    mins = [
        F.expr(
            f"array_min(transform(hashes, h ->"
            f" ({_MINHASH_A[k]}L * h + {_MINHASH_B[k]}L) % {_MINHASH_P}L))"
        ).alias(f"mh{k}")
        for k in range(N_PERMS)
    ]
    return out.select("doc_id", *mins)


def _minhash_sql() -> str:
    mins = ",\n       ".join(
        f"list_min(list_transform(hashes, h ->"
        f" ({_MINHASH_A[k]} * h + {_MINHASH_B[k]}) % {_MINHASH_P})) AS mh{k}"
        for k in range(N_PERMS)
    )
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
s AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM w),
h AS (SELECT doc_id, list_transform(shingles, s -> {_duck_hash('s')}) AS hashes FROM s)
SELECT doc_id,
       {mins}
FROM h
"""


def lsh_candidate_pairs(spark, sf_dir):
    """LSH banding: docs sharing any (band, bucket) become candidate
    pairs — the scale path that avoids the O(n^2) similarity join.

    Single-pass shape: groupBy (band, bucket) + in-bucket pair
    expansion, instead of a self-join (which would recompute the
    MinHash pipeline once per join side).  At web scale a bucket-size
    cap bounds the quadratic in-bucket expansion; bucket keys are
    uniform by construction so the shuffle has no skew.
    """
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(N_BANDS):
        cols = [f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("bucket"),
            )
        )
    exploded = sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    buckets = (
        exploded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)), y ->"
                " struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def _lsh_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws('_', mh{b * BAND_SIZE}, mh{b * BAND_SIZE + 1})) AS bucket FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band, bucket)
WHERE a.doc_id < b.doc_id
"""


def ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard for pairs sharing >= 1 shingle (verify
    stage after LSH candidate generation)."""
    d = read(spark, sf_dir, "documents")
    sh = (
        d.selectExpr("doc_id", f"{_SPARK_WORDS} AS words")
        .selectExpr("doc_id", f"explode(array_distinct({_SPARK_SHINGLES})) AS shingle")
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


def _jaccard_sql() -> str:
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
s AS (SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS shingle FROM w),
counts AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM s a JOIN s b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common / (ca.n + cb.n - common), 4) AS jaccard
FROM common
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE round(common / (ca.n + cb.n - common), 4) >= 0.2
"""


N_SIMHASH_BITS = 16


def simhash(spark, sf_dir):
    """SimHash: per-word portable hash, signed bit-count vote per bit,
    packed into a 16-bit fingerprint."""
    d = read(spark, sf_dir, "documents")
    words = d.selectExpr("doc_id", f"explode({_SPARK_WORDS}) AS word").selectExpr(
        "doc_id", _spark_hash("word") + " AS h"
    )
    votes = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("h"), b).bitwiseAND(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(N_SIMHASH_BITS)
        ]
    )
    packed = None
    for b in range(N_SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("doc_id", packed.cast("bigint").alias("simhash"))


def _simhash_sql() -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(N_SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(N_SIMHASH_BITS)
    )
    return f"""
WITH w AS (SELECT doc_id, unnest({_DUCK_WORDS}) AS word FROM documents),
h AS (SELECT doc_id, {_duck_hash('word')} AS h FROM w),
votes AS (SELECT doc_id,
         {votes}
         FROM h GROUP BY doc_id)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes
"""


def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup, label-blocked (IVF-style blocking
    replaces the cross join: pairs are only formed inside a coarse
    bucket, which is how this survives 10^9 vectors)."""
    e = read(spark, sf_dir, "embeddings")
    dot = (
        "aggregate(zip_with(a.embedding, b.embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate(transform({side}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v))"
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, "label")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot)
                / (F.expr(norm.format(side="a")) * F.expr(norm.format(side="b"))),
                4,
            ),
        )
        .filter(F.col("cosine") >= 0.5)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )


NEARDUP_SQL = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_reduce(list_transform(range(1, len(a.emb) + 1),
                                        i -> a.emb[i] * b.emb[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(a.emb, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(b.emb, x -> x * x), (x, y) -> x + y))), 4)
         AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_reduce(list_transform(range(1, len(a.emb) + 1),
                                       i -> a.emb[i] * b.emb[i]), (x, y) -> x + y)
            / (sqrt(list_reduce(list_transform(a.emb, x -> x * x), (x, y) -> x + y))
               * sqrt(list_reduce(list_transform(b.emb, x -> x * x), (x, y) -> x + y))), 4) >= 0.5
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "minhash_signatures": (minhash_signatures, _minhash_sql()),
    "lsh_candidate_pairs": (lsh_candidate_pairs, _lsh_sql()),
    "ngram_jaccard_pairs": (ngram_jaccard_pairs, _jaccard_sql()),
    "simhash": (simhash, _simhash_sql()),
    "embedding_neardup_pairs": (embedding_neardup_pairs, NEARDUP_SQL),
}


def mllib_minhash_pairs(spark, sf_dir):
    """Spark-ML variant of the LSH candidate stage: HashingTF shingle
    vectors -> MinHashLSH.approxSimilarityJoin.  Demonstrates the
    built-in distributed LSH (used at 10^9+ docs scale); rows-only
    check — the hash family differs from the portable-md5 pipeline, so
    there is no DuckDB-expressible oracle.  Deterministic via fixed
    seed."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = read(spark, sf_dir, "documents")
    shingled = d.selectExpr("doc_id", f"{_SPARK_WORDS} AS words").selectExpr(
        "doc_id", f"{_SPARK_SHINGLES} AS shingles"
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled).filter(
        "aggregate(shingles, 0, (a, x) -> a + CASE WHEN x <> '' THEN 1 ELSE 0 END) > 0"
    )
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.8, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .distinct()
    )


QUERIES["mllib_minhash_pairs"] = (mllib_minhash_pairs, None)
