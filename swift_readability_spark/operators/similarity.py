"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the correctness baseline; the IVF variant
(coarse centroids as a partition prune) is the scale path: at 10^9+
vectors the centroid assignment is a broadcast join (centroid table is
tiny) and only the probed cell is scanned — the same plan shape Spark
would execute cluster-wide with the cell as partition key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import read

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v))"
)

QUERY_VEC_ID = 0
TOP_K = 10


def _query_cosine_batches(q_rows):
    """mapInArrow factory: per corpus vector, the exact cosine against
    each collected (q_id, qvec) — dimension-major numpy accumulation ==
    the sequential ``aggregate(zip_with(...))`` fold bit-for-bit (the
    interpreted HOF chain this replaces).  Emits one output row per
    (input row, query); ragged/null rows fall back to scalar folds."""

    def batches(it):
        import math

        import numpy as np
        import pyarrow as pa

        qs = []
        for qid, v in q_rows:
            qv = np.asarray(v, dtype=np.float64)
            acc = 0.0
            for x in qv:
                acc = acc + x * x
            qs.append((qid, qv, math.sqrt(acc)))
        dim = len(qs[0][1]) if qs else 0
        for batch in it:
            col = batch.column("embedding")
            n = len(col)
            if n == 0:
                continue
            vec_ids = batch.column("vec_id")
            labels = batch.column("label")
            lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
            if col.null_count == 0 and (lens == dim).all():
                X = (
                    col.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, dim)
                )
                acc = np.zeros(n)
                for i in range(dim):
                    acc = acc + X[:, i] * X[:, i]
                enorm = np.sqrt(acc)
                for qid, qv, qn in qs:
                    dot = np.zeros(n)
                    for i in range(dim):
                        dot = dot + X[:, i] * qv[i]
                    cos = dot / (enorm * qn)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([qid] * n, type=pa.int64()),
                            vec_ids,
                            labels,
                            pa.array(cos, type=pa.float64()),
                        ],
                        ["q_id", "vec_id", "label", "cosine_raw"],
                    )
            else:
                rows = col.to_pylist()
                for qid, qv, qn in qs:
                    out = []
                    for row in rows:
                        if row is None:
                            out.append(None)
                            continue
                        acc = 0.0
                        d = 0.0
                        for x, y in zip(row, qv):
                            xf = float(x)
                            acc = acc + xf * xf
                            d = d + xf * y
                        out.append(d / (math.sqrt(acc) * qn))
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([qid] * n, type=pa.int64()),
                            vec_ids,
                            labels,
                            pa.array(out, type=pa.float64()),
                        ],
                        ["q_id", "vec_id", "label", "cosine_raw"],
                    )

    return batches


def _query_vecs(e, pred) -> list:
    """Collected (vec_id, doubles) query rows (broadcast-class — the
    same rows every prior plan collected inside ``F.broadcast(q)``)."""
    return [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(pred).select("vec_id", "embedding").collect()
    ]


def _scored_against_queries(spark, e, q_rows, corpus_pred):
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    return (
        e.filter(corpus_pred)
        .select("vec_id", "label", "embedding")
        .mapInArrow(
            _query_cosine_batches(q_rows),
            "q_id bigint, vec_id bigint, label int, cosine_raw double",
        )
    )


def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-10 neighbours of vec_id=0 (single scan +
    TakeOrdered — no shuffle of the corpus).  r07: the per-row cosine
    is the Arrow kernel's exact fold instead of an interpreted HOF
    chain; ordering/limit/rounding stay in the JVM plan."""
    e = read(spark, sf_dir, "embeddings")
    q_rows = _query_vecs(e, F.col("vec_id") == QUERY_VEC_ID)
    scored = _scored_against_queries(
        spark, e, q_rows, F.col("vec_id") != QUERY_VEC_ID
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("cosine_raw") * 10000 + 0.5) / 10000).alias("cosine"),
        )
    )


_D_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)
_D_NORM = "sqrt(list_reduce(list_transform({v}, x -> x * x), (x, y) -> x + y))"

ANN_BRUTE_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT emb AS qvec FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       floor({_D_DOT.format(a='emb', b='qvec')}
             / ({_D_NORM.format(v='emb')} * {_D_NORM.format(v='qvec')})
             * 10000 + 0.5) / 10000 AS cosine
FROM e, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY {_D_DOT.format(a='emb', b='qvec')}
         / ({_D_NORM.format(v='emb')} * {_D_NORM.format(v='qvec')}) DESC,
         vec_id ASC
LIMIT {TOP_K}
"""


# -- scale-derived IVF geometry (VERDICT r05 item 4) ------------------------
# k = recommended_ivf_cells(n) ~ sqrt(n): per-probe scan cost (n/k
# rows) and centroid-probe cost (k rows) balance at sqrt(n) — the
# standard IVF sizing.  Floored so an average cell keeps >=
# MIN_CELL_ROWS vectors (below that a centroid is noise and P probes
# cover most of the corpus anyway), capped so the broadcast centroid
# table stays broadcast-sized (65536 cells x 64 dims x 8 B ~ 34 MB).
# At 10^9 vectors: min(31623, 2e7, 65536) = 31623 cells — a ~16 MB
# broadcast, probe fraction P/k ~ 1e-4 of the corpus.  Growth +
# recall are pinned by tests/test_similarity.py.
MIN_CELL_ROWS = 50
MAX_IVF_CELLS = 65536


def recommended_ivf_cells(
    n_vectors: int,
    min_cell_rows: int = MIN_CELL_ROWS,
    max_cells: int = MAX_IVF_CELLS,
) -> int:
    """~sqrt(n) IVF cell count, budget-guarded (the similarity-search
    sibling of dedup.recommended_band_bits).  floor(IEEE sqrt) matches
    the oracle's SQL floor(sqrt(n)) exactly for any feasible corpus
    size (both are the correctly-rounded double sqrt)."""
    import math

    if n_vectors <= 1:
        return 1
    return max(
        1,
        min(
            int(math.floor(math.sqrt(float(n_vectors)))),
            n_vectors // min_cell_rows,
            max_cells,
        ),
    )


# the oracle derives the SAME k from the data (the registry SQL is
# static across scale factors, so k cannot be inlined as a literal)
_K_DUCK = (
    f"greatest(1, least(CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT),"
    f" count(*) // {MIN_CELL_ROWS}, {MAX_IVF_CELLS}))"
)

# portable 60-bit hash ranks the seed choice (dedup.py helpers)
from .dedup import _duck_hash60, _spark_hash60  # noqa: E402

_SEED_H_SPARK = _spark_hash60("CAST(vec_id AS STRING)")
_SEED_H_DUCK = _duck_hash60("CAST(vec_id AS VARCHAR)")

_CENT_COS = (
    "(aggregate(zip_with(embedding, c.centroid, (x, y) -> CAST(x AS DOUBLE) * y),"
    " 0D, (a, v) -> a + v)"
    " / ({enorm} * sqrt(aggregate(transform(c.centroid, x -> x * x),"
    " 0D, (a, v) -> a + v))))"
).format(enorm=_NORM.format(v="embedding"))

# argmax cell by (cosine, lower cell id) — struct ordering gives the
# deterministic tie-break both engines agree on
_ASSIGN_EXPR = (
    f"(array_max(transform(cents, c -> struct({_CENT_COS} AS cc,"
    f" -c.cell AS negcell))).negcell) * -1"
)


def _seed_centroid_rows(e, k: int) -> list:
    """The k hash-ranked seed vectors as driver-side (cell, centroid)
    rows.  The collect is broadcast-class by construction: the OLD plan
    already collected this exact table to the driver inside
    ``F.broadcast(cents_arr)`` — k ~ sqrt(n) rows x dim doubles (~16 MB
    at 10^9 vectors), bounded by MAX_IVF_CELLS."""
    from pyspark.sql import Window

    seeds = (
        e.selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid",
            f"{_SEED_H_SPARK} AS _h",
        )
        .orderBy("_h", "vec_id")
        .limit(k)
    )
    # row_number over the k-row seed table only (single tiny partition)
    w = Window.orderBy("_h", "vec_id")
    seeds = (
        seeds.withColumn("cell", (F.row_number().over(w) - 1).cast("int"))
        .select("cell", "centroid")
    )
    return sorted(
        ((r["cell"], list(r["centroid"])) for r in seeds.collect()),
        key=lambda cv: cv[0],
    )


def _collect_centroid_rows(cents_df) -> list:
    """(cell, centroid) rows of a ``_cell_centroids`` output, collected
    driver-side and cell-sorted.  Same broadcast-class size argument as
    ``_seed_centroid_rows`` — this is the table every prior plan shipped
    through ``F.broadcast``; collecting it instead lets the argmax
    assignment run as a numpy kernel rather than an interpreted
    higher-order-function chain."""
    return sorted(
        ((r["cell"], list(r["centroid"])) for r in cents_df.collect()),
        key=lambda cv: cv[0],
    )


def _fold_dot(x, y) -> float:
    """Sequential left-fold dot product — bit-identical to Spark's
    ``aggregate(zip_with(...), 0D, (acc, v) -> acc + v)`` (and DuckDB's
    ``list_reduce``): Python floats are IEEE doubles with correctly
    rounded ops, added in the same order."""
    acc = 0.0
    for a, b in zip(x, y):
        acc = acc + float(a) * float(b)
    return acc


def _fold_norm(x) -> float:
    import math

    acc = 0.0
    for a in x:
        acc = acc + float(a) * float(a)
    return math.sqrt(acc)


def _assign_kernel(e, cent_rows: list):
    """argmax-cosine cell assignment as ONE mapInArrow stage
    (optimization guide §4.2): the JVM form ran
    ``array_max(transform(cents, ...))`` — higher-order functions are
    CodegenFallback, so every (vector, cell) pair paid an interpreted
    64-element fold (measured 47 s for 20k vectors x 141 cells at
    local[32]; this kernel: < 1 s).

    Bit-exactness contract (the oracle SQL is unchanged): the cosine is
    accumulated dimension-by-dimension over the whole batch —
    ``acc = acc + x_i * c_i`` per dimension — which reproduces the
    sequential left-fold of ``aggregate(zip_with(...))`` exactly (each
    elementwise numpy op is a correctly rounded IEEE double op, applied
    in the same order).  The argmax update iterates cells in ascending
    order requiring a STRICT improvement, which reproduces the
    ``max(struct(cc, -cell))`` tie-break (lowest cell wins equal
    cosines) and Spark's NaN-greatest double ordering (the isnan
    clause).  Null embeddings yield null cells, matching
    ``transform(NULL) -> NULL`` propagation."""
    spark = e.sparkSession
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    bc = spark.sparkContext.broadcast(cent_rows)
    dtypes = dict(e.dtypes)
    schema = (
        f"vec_id {dtypes['vec_id']}, label {dtypes['label']},"
        f" embedding {dtypes['embedding']}, cell int"
    )

    def batches(it):
        import numpy as np
        import pyarrow as pa

        cents = bc.value
        cell_ids = [c for c, _ in cents]
        cmat = np.array([v for _, v in cents], dtype=np.float64)
        cnorm = np.array([_fold_norm(v) for _, v in cents])
        dim = cmat.shape[1] if len(cents) else 0
        for batch in it:
            col = batch.column("embedding")
            n = len(col)
            if n == 0:
                continue
            lens = (
                np.diff(col.offsets.to_numpy(zero_copy_only=False))
                if n
                else np.array([], dtype=np.int64)
            )
            if col.null_count == 0 and len(lens) and (lens == dim).all():
                flat = col.flatten().to_numpy(zero_copy_only=False)
                X = flat.astype(np.float64).reshape(n, dim)
                acc = np.zeros(n)
                for i in range(dim):
                    acc = acc + X[:, i] * X[:, i]
                enorm = np.sqrt(acc)
                # dot of every row with every cell, dimension-major so
                # each scalar add chain matches the sequential fold
                dots = np.zeros((n, len(cents)))
                for i in range(dim):
                    dots = dots + X[:, i : i + 1] * cmat[None, :, i]
                best_cc = dots[:, 0] / (enorm * cnorm[0])
                best_cell = np.full(n, cell_ids[0], dtype=np.int64)
                for j in range(1, len(cents)):
                    cc = dots[:, j] / (enorm * cnorm[j])
                    better = (cc > best_cc) | (
                        np.isnan(cc) & ~np.isnan(best_cc)
                    )
                    best_cell = np.where(better, cell_ids[j], best_cell)
                    best_cc = np.where(better, cc, best_cc)
                cell_arr = pa.array(best_cell, type=pa.int32())
            else:
                # ragged / null fallback: exact scalar folds per row
                out = []
                for row in col.to_pylist():
                    if row is None:
                        out.append(None)
                        continue
                    en = _fold_norm(row)
                    bc_cc, bc_cell = None, None
                    for (cid, cv), cn in zip(cents, cnorm):
                        d = _fold_dot(row, cv)
                        cc = d / (en * cn)
                        if bc_cell is None or cc > bc_cc or (
                            cc != cc and bc_cc == bc_cc
                        ):
                            bc_cc, bc_cell = cc, cid
                    out.append(bc_cell)
                cell_arr = pa.array(out, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id"),
                    batch.column("label"),
                    batch.column("embedding"),
                    cell_arr,
                ],
                ["vec_id", "label", "embedding", "cell"],
            )

    return e.select("vec_id", "label", "embedding").mapInArrow(batches, schema)


def _seed_assignment(e, k: int):
    """Initial IVF assignment: the k hash-ranked vectors (deterministic,
    engine-portable, geometry-aware — seeds are actual corpus points,
    the standard k-means init) become cells 0..k-1; every vector joins
    its argmax-cosine seed.  The seed pick is a k-row TakeOrdered; the
    assignment is the Arrow kernel — no shuffle of the corpus."""
    return _assign_kernel(e, _seed_centroid_rows(e, k))


def _cell_centroids(assigned):
    """(cell, centroid, n_members) — exact decimal per-dimension sums,
    mean via an identical double division + floor-round to 4 dp so
    Spark and DuckDB produce bit-identical centroids (avg(decimal)
    returns decimal in Spark but DOUBLE in DuckDB — not portable)."""
    return (
        assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
        .withColumn("v", F.col("v").cast("decimal(20,10)"))
        .groupBy("cell", "pos")
        .agg(
            F.expr(
                "floor(CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE)"
                " * 10000 + 0.5) / 10000"
            ).alias("mean_v"),
            F.count("*").alias("_cnt"),
        )
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, mean_v))), s -> s.mean_v)"
            ).alias("centroid"),
            # every pos of a cell counts the same members
            F.max("_cnt").cast("bigint").alias("n_members"),
        )
    )


# shared oracle CTE fragments: seed pick + argmax assignment
_SEEDS_DUCK = f"""
kk AS (SELECT {_K_DUCK} AS k FROM e),
ranked AS (
  SELECT vec_id, emb,
         row_number() OVER (ORDER BY {_SEED_H_DUCK}, vec_id) AS rn
  FROM e
),
seeds AS (
  SELECT CAST(rn - 1 AS INTEGER) AS cell, emb AS centroid
  FROM ranked, kk WHERE rn <= kk.k
)"""

_ASSIGN_DUCK = """
SELECT a.vec_id, v.label, v.emb, a.cell
FROM (
  SELECT v.vec_id, c.cell,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_reduce(list_transform(range(1, len(v.emb) + 1),
                                               i -> v.emb[i] * c.centroid[i]),
                                (x, y) -> x + y)
                    / (sqrt(list_reduce(list_transform(v.emb, x -> x * x), (x, y) -> x + y))
                       * sqrt(list_reduce(list_transform(c.centroid, x -> x * x), (x, y) -> x + y)))
                    DESC, c.cell ASC
         ) AS rn
  FROM e v, {cents} c
) a
JOIN e v USING (vec_id)
WHERE a.rn = 1
"""

_CENTS_DUCK = """
SELECT cell, list(mean_v ORDER BY pos) AS centroid, max(cnt) AS n_members
FROM (
  SELECT cell, pos,
         floor(CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE)
               / CAST(count(v) AS DOUBLE) * 10000 + 0.5) / 10000 AS mean_v,
         count(v) AS cnt
  FROM (SELECT cell, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v FROM {src})
  GROUP BY cell, pos
)
GROUP BY cell
"""


def ivf_centroids(spark, sf_dir):
    """Coarse quantizer over SCALE-DERIVED cells: k =
    recommended_ivf_cells(n) hash-ranked seed vectors, one argmax
    assignment pass, exact-decimal per-cell means.  The driver-side
    count that sizes k is parquet-metadata-only at scale (and the one
    permissible collect class — a scalar, not rows)."""
    e = read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    k = recommended_ivf_cells(e.count())
    cents = _cell_centroids(_seed_assignment(e, k))
    return cents.selectExpr(
        "CAST(cell AS BIGINT) AS cell",
        "n_members",
        "floor(aggregate(centroid, 0D, (a, v) -> a + v) * 10000 + 0.5)"
        " / 10000 AS centroid_sum",
    )


IVF_CENTROIDS_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
{_SEEDS_DUCK},
a0 AS ({_ASSIGN_DUCK.format(cents='seeds')}),
m AS ({_CENTS_DUCK.format(src='a0')})
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(n_members AS BIGINT) AS n_members,
       floor(list_reduce(centroid, (a, b) -> a + b) * 10000 + 0.5)
         / 10000 AS centroid_sum
FROM m
"""


# cells probed per query: single-probe IVF misses neighbours that sit
# just across a cell boundary; probing the top-P centroids is the
# standard recall fix (FAISS nprobe) and costs P/num_cells of the
# corpus scan instead of 1/num_cells — still a partition prune, never
# a full scan.  On the (weakly clustered) test embeddings recall@10
# vs brute force measures 0.1 at P=1 and 0.4-0.5 at P=3
# (tests/test_similarity.py pins the floor).
N_PROBES = 3


def _probe_cells(cent_rows: list, qvec: list, n_probes: int) -> list:
    """Top-``n_probes`` cells by query cosine, computed driver-side over
    the (broadcast-class) collected centroid rows.  Replicates the JVM
    probe ordering exactly: the same sequential folds (``_fold_dot`` /
    ``_fold_norm`` == ``aggregate(zip_with(...))``), DESC by cosine with
    NaN greatest (Spark double ordering), ties broken by ASC cell."""
    import math

    qnorm = _fold_norm(qvec)
    scored = []
    for cell, cv in cent_rows:
        cc = _fold_dot(cv, qvec) / (_fold_norm(cv) * qnorm)
        scored.append((cell, cc))
    scored.sort(
        key=lambda t: (
            0 if math.isnan(t[1]) else 1,
            0.0 if math.isnan(t[1]) else -t[1],
            t[0],
        )
    )
    return [cell for cell, _ in scored[:n_probes]]


def _query_vec(e) -> list:
    """The query embedding as driver-side doubles (single-row collect —
    the same row every prior plan collected inside ``F.broadcast(q)``)."""
    row = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def ann_ivf_topk(spark, sf_dir):
    """IVF-style search, multi-probe: rank the scale-derived coarse
    centroids (seed-assigned cells) by query cosine, scan the
    top-``N_PROBES`` cells, exact top-10 within the probed union.
    The probe ORDERING is row membership, so centroids come from the
    exact-decimal path (partition-order-proof).

    r07 shape: the assignment is the Arrow kernel; the centroid table
    (k ~ sqrt(n) rows, broadcast-class) is collected once and the probe
    pick runs driver-side, so the final scan filters on literal cell
    ids — the old plan re-executed the interpreted assignment subtree
    once per consumer (measured 151 s at 20k vectors; now ~5 s)."""
    e = read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    k = recommended_ivf_cells(e.count())
    assigned = _seed_assignment(e, k)
    cent_rows = _collect_centroid_rows(_cell_centroids(assigned))
    best = _probe_cells(cent_rows, _query_vec(e), N_PROBES)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    cos = F.expr(_DOT.format(a="embedding", b="qvec")) / (
        F.expr(_NORM.format(v="embedding")) * F.expr(_NORM.format(v="qvec"))
    )
    return (
        assigned.filter(F.col("cell").isin(best))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("cosine_raw") * 10000 + 0.5) / 10000).alias("cosine"),
        )
    )


ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
{_SEEDS_DUCK},
a0 AS ({_ASSIGN_DUCK.format(cents='seeds')}),
cent AS ({_CENTS_DUCK.format(src='a0')}),
q AS (SELECT emb AS qvec FROM e WHERE vec_id = {QUERY_VEC_ID}),
best AS (
  SELECT cell
  FROM cent, q
  ORDER BY {_D_DOT.format(a='centroid', b='qvec')}
           / ({_D_NORM.format(v='centroid')} * {_D_NORM.format(v='qvec')}) DESC,
           cell ASC
  LIMIT {N_PROBES}
)
SELECT a0.vec_id AS vec_id, a0.label AS label,
       floor({_D_DOT.format(a='a0.emb', b='qvec')}
             / ({_D_NORM.format(v='a0.emb')} * {_D_NORM.format(v='qvec')})
             * 10000 + 0.5) / 10000 AS cosine
FROM a0 JOIN best USING (cell), q
WHERE a0.vec_id != {QUERY_VEC_ID}
ORDER BY {_D_DOT.format(a='a0.emb', b='qvec')}
         / ({_D_NORM.format(v='a0.emb')} * {_D_NORM.format(v='qvec')}) DESC,
         vec_id ASC
LIMIT {TOP_K}
"""


QUERIES = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTE_SQL),
    "ivf_centroids": (ivf_centroids, IVF_CENTROIDS_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_SQL),
}


# -- refined IVF: k-means iterations on top of the seed assignment ----------
# Raw seed-vector cells are weak; k-means refinement passes re-shape
# the cells around the actual vector geometry and lift recall@10 at
# P=N_PROBES_REFINED (floor-pinned in tests/test_similarity.py).
# Each pass is shuffle-light at scale: the centroid table (k rows)
# collapses to ONE broadcast array row, and the argmax assignment is a
# single whole-stage-codegen projection per vector — no per-iteration
# shuffle of the corpus; only the k-row centroid recompute aggregates
# (posexplode + decimal mean, exact and engine-portable).  k =
# recommended_ivf_cells(n) ~ sqrt(n), same plan at 10^9 vectors.
KMEANS_ITERS = 2
# Probe budget vs recall, measured on the test embeddings (weakly
# clustered — the query's true neighbours span six labels, so recall
# roughly tracks the scanned fraction P*(n/k)/n): at the floor-test
# scale (n=500, k=10) P=4 measures 0.6-0.7, P=6 measures 0.9 —
# 0.8-floor-pinned in tests/test_similarity.py.  On a genuinely
# clustered corpus (the 100-TB case) neighbours concentrate in a few
# cells and P stays fixed while k grows ~sqrt(n), giving the sublinear
# scan IVF exists for; on weak clusters P is the recall dial and must
# be tuned to the target.
N_PROBES_REFINED = 6


def ann_ivf_refined_topk(spark, sf_dir):
    """IVF with k-means-refined cells: hash-ranked seed-vector init
    (scale-derived k), two refinement passes (broadcast-array argmax
    assignment), multi-probe top-``N_PROBES_REFINED`` search, exact
    rerank."""
    e = read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    k = recommended_ivf_cells(e.count())
    assigned = _seed_assignment(e, k)
    for _ in range(KMEANS_ITERS):
        # r07: each refinement pass collects the k-row centroid table
        # (broadcast-class — the old plan collected the same table
        # inside F.broadcast) and re-assigns via the Arrow kernel.
        # This also CUTS THE LINEAGE per pass: the old lazy chain
        # re-executed every earlier interpreted assignment once per
        # consumer (the whole query measured 250 s at 20k vectors;
        # now ~8 s).
        cent_rows = _collect_centroid_rows(_cell_centroids(assigned))
        assigned = _assign_kernel(e, cent_rows)
    cent_rows = _collect_centroid_rows(_cell_centroids(assigned))
    best = _probe_cells(cent_rows, _query_vec(e), N_PROBES_REFINED)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    cos = F.expr(_DOT.format(a="embedding", b="qvec")) / (
        F.expr(_NORM.format(v="embedding")) * F.expr(_NORM.format(v="qvec"))
    )
    return (
        assigned.filter(F.col("cell").isin(best))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("cosine_raw") * 10000 + 0.5) / 10000).alias("cosine"),
        )
    )


def _refined_sql() -> str:
    """DuckDB oracle: same arithmetic, expressed with unnest +
    row_number (the oracle needn't be the scale shape — values must
    match, plans needn't).  Chain mirrors the Spark loop exactly:
    seed-assign a0, KMEANS_ITERS x (cents -> reassign), final cents,
    probe, scan."""
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
{_SEEDS_DUCK},
a0 AS ({_ASSIGN_DUCK.format(cents='seeds')}),
c0 AS ({_CENTS_DUCK.format(src='a0')}),
a1 AS ({_ASSIGN_DUCK.format(cents='c0')}),
c1 AS ({_CENTS_DUCK.format(src='a1')}),
a2 AS ({_ASSIGN_DUCK.format(cents='c1')}),
c2 AS ({_CENTS_DUCK.format(src='a2')}),
q AS (SELECT emb AS qvec FROM e WHERE vec_id = {QUERY_VEC_ID}),
best AS (
  SELECT cell FROM c2, q
  ORDER BY {_D_DOT.format(a='centroid', b='qvec')}
           / ({_D_NORM.format(v='centroid')} * {_D_NORM.format(v='qvec')}) DESC,
           cell ASC
  LIMIT {N_PROBES_REFINED}
)
SELECT a2.vec_id AS vec_id, a2.label AS label,
       floor({_D_DOT.format(a='a2.emb', b='qvec')}
             / ({_D_NORM.format(v='a2.emb')} * {_D_NORM.format(v='qvec')})
             * 10000 + 0.5) / 10000 AS cosine
FROM a2 JOIN best USING (cell), q
WHERE a2.vec_id != {QUERY_VEC_ID}
ORDER BY {_D_DOT.format(a='a2.emb', b='qvec')}
         / ({_D_NORM.format(v='a2.emb')} * {_D_NORM.format(v='qvec')}) DESC,
         vec_id ASC
LIMIT {TOP_K}
"""


QUERIES["ann_ivf_refined_topk"] = (ann_ivf_refined_topk, _refined_sql())


# -- random-hyperplane LSH (vector SimHash) --------------------------------
# 8 fixed hyperplanes over the 64-dim embedding space, generated once
# with a fixed seed and embedded as literals so the signature is
# bit-identical in Spark and DuckDB.  sig(v) = sum_b [dot(v, h_b) > 0] << b.
N_HYPERPLANES = 8
HAMMING_PROBE = 2  # probe buckets within this signature distance
HYPERPLANES = [[0.7365, -0.0621, 0.8884, 0.7145, -0.4263, 0.4858, 0.4365, 0.6067, -0.7055, 0.6536, -0.0296, -0.3441, 0.5848, -0.2013, -0.8753, -0.7416, -0.6441, 0.8135, 0.6785, 0.2722, 0.9089, 0.1707, -0.1778, -0.711, -0.444, 0.0692, 0.5585, 0.3409, -0.3735, 0.2463, -0.8672, -0.9268, 0.1903, -0.2007, 0.055, -0.1612, 0.1238, -0.2765, -0.9416, -0.5214, 0.0973, 0.1842, 0.3106, -0.828, 0.8538, -0.8227, -0.7249, 0.5953, -0.6949, -0.8764, -0.5709, 0.7055, -0.5384, 0.5204, 0.0343, -0.583, 0.1071, -0.9207, -0.0625, 0.9392, -0.4703, -0.5205, 0.252, -0.7111], [0.37, -0.4085, 0.5064, -0.7508, 0.8085, -0.0018, 0.4597, 0.1812, 0.4294, -0.2736, 0.3493, -0.3196, 0.6504, -0.8396, 0.7577, 0.0501, 0.6398, -0.7731, -0.8745, 0.2875, -0.4029, -0.6932, -0.3498, -0.4242, -0.8997, 0.466, -0.3191, 0.0691, 0.7541, 0.0123, 0.1235, 0.411, 0.7389, -0.4506, -0.7239, 0.2681, 0.0013, 0.9776, -0.8192, 0.6357, -0.3445, 0.7708, -0.5011, 0.0955, 0.7976, -0.5414, -0.2525, 0.7619, -0.2599, 0.9876, 0.3759, -0.4238, -0.3402, -0.0339, 0.5613, -0.6161, 0.8994, -0.1885, -0.861, -0.004, 0.4353, 0.3694, -0.8534, -0.0851], [0.6719, 0.7965, -0.2031, 0.8464, -0.7394, -0.2076, 0.9846, 0.2607, 0.542, -0.995, 0.658, -0.8968, 0.8481, -0.6502, 0.6697, -0.2585, -0.8899, 0.6619, 0.2018, -0.0824, 0.0433, -0.2809, 0.6006, 0.775, -0.0943, 0.3393, 0.1361, 0.3523, -0.9271, -0.7312, 0.3688, -0.1568, 0.3641, 0.5675, -0.3906, -0.3015, -0.2842, 0.3995, -0.2414, -0.3102, -0.2097, 0.0655, 0.497, 0.2147, -0.175, 0.3788, 0.6697, -0.6703, 0.7886, 0.9276, 0.1487, -0.7653, -0.4774, -0.4945, -0.0627, -0.0091, -0.0041, 0.1604, 0.1823, -0.6817, 0.305, 0.5042, -0.0069, -0.3492], [0.697, -0.9418, -0.576, 0.3682, 0.5728, -0.5462, -0.5745, 0.582, -0.1203, -0.4063, -0.9655, 0.3896, 0.6062, 0.7049, 0.4794, -0.2379, 0.5861, -0.3678, -0.8527, -0.652, 0.0925, -0.5546, 0.6803, 0.977, -0.7073, -0.1907, -0.0708, 0.7486, -0.6386, 0.8216, -0.7689, 0.1142, -0.1878, -0.9024, -0.4171, 0.2993, -0.6177, 0.6912, -0.5319, 0.5924, 0.1677, 0.6355, 0.3613, 0.4044, 0.4099, -0.4232, -0.4756, 0.8719, -0.0222, -0.6914, -0.0318, 0.4632, 0.772, 0.6523, 0.7372, 0.6516, 0.7974, -0.8675, 0.2565, -0.1686, -0.2396, -0.0161, -0.2559, 0.1377], [-0.974, 0.2182, -0.0209, -0.6375, -0.5112, 0.0069, -0.9267, -0.1019, -0.0736, -0.7268, -0.2528, -0.76, 0.3039, -0.5349, -0.4627, -0.4427, 0.2219, -0.116, -0.8944, 0.4516, -0.3465, 0.2906, 0.329, -0.6915, -0.0172, 0.9029, 0.8184, 0.4404, 0.2455, -0.5276, -0.9178, 0.3848, 0.9783, -0.775, 0.1399, 0.3226, -0.3738, 0.4983, 0.0188, 0.208, 0.26, 0.9287, 0.6766, 0.0629, -0.1998, -0.8456, -0.2984, 0.577, 0.4299, 0.3745, -0.3692, -0.002, -0.0293, -0.1985, -0.5297, 0.9594, 0.2235, -0.0862, 0.8388, -0.196, -0.4695, 0.7747, -0.3652, 0.6988], [0.2446, 0.9413, -0.2064, 0.3599, -0.4598, 0.08, 0.5828, -0.1664, -0.3897, 0.3244, -0.6105, 0.9716, -0.3483, 0.8225, 0.0818, 0.3011, 0.1746, 0.1867, -0.26, -0.9899, -0.8177, -0.6879, -0.8636, 0.545, -0.9741, 0.3292, 0.8157, -0.5144, -0.1987, -0.4821, -0.2037, -0.7652, 0.8371, 0.6711, -0.1347, 0.1108, -0.5012, -0.7804, 0.0935, -0.9444, -0.1023, 0.7337, 0.6051, 0.0036, 0.779, -0.0915, 0.0721, 0.988, -0.9279, -0.584, 0.5301, 0.5775, 0.6951, 0.2444, -0.6424, 0.7478, 0.3448, 0.6034, -0.175, 0.3195, 0.9871, -0.3366, 0.9211, 0.8195], [-0.278, 0.9312, -0.9536, -0.2126, -0.5415, -0.6414, 0.7903, 0.9639, 0.7282, -0.4499, -0.5408, 0.3188, -0.4658, 0.5905, -0.2472, -0.0326, -0.9026, 0.0272, -0.1213, 0.1966, -0.1424, -0.0158, -0.399, 0.1609, 0.3252, 0.1889, -0.9552, -0.5681, -0.8408, -0.4487, -0.4349, -0.2992, 0.4116, -0.046, -0.4883, 0.2429, 0.6173, 0.0157, -0.9893, -0.6861, -0.9937, 0.4912, -0.1476, -0.5102, -0.53, -0.2439, 0.3936, 0.7734, -0.2488, 0.6695, -0.3378, -0.5831, 0.6307, -0.9824, -0.8527, -0.8468, 0.3412, -0.0403, 0.402, 0.2783, 0.0899, -0.5714, 0.1891, 0.2763], [-0.6543, 0.8768, -0.4537, 0.6972, -0.1931, -0.8497, -0.5177, -0.1337, -0.2091, 0.6419, -0.7791, 0.9246, 0.5311, -0.1557, 0.3771, 0.0376, -0.1355, 0.6844, 0.4597, 0.1847, 0.9611, -0.507, -0.9323, -0.8449, -0.7752, 0.6214, -0.1342, -0.7058, 0.618, -0.7843, 0.2919, 0.9582, 0.6608, 0.4295, -0.2733, 0.9533, -0.5248, 0.9738, 0.2913, -0.3801, -0.1069, 0.9989, -0.0419, -0.9249, 0.5633, -0.1474, 0.7933, 0.7198, -0.3207, -0.5596, 0.8392, -0.4862, 0.177, -0.9821, 0.7241, -0.7661, -0.9912, 0.7001, -0.8158, -0.6114, -0.0736, 0.1385, 0.3147, 0.1735]]


# wide (32-plane) signature for corpus-scale near-dup blocking
# (dedup.embedding_neardup_pairs_wide): the extra 24 hyperplanes are
# generated once at import by a fixed-constant LCG (Knuth MMIX), so
# they are deterministic, dependency-free, and identical literals are
# embedded in both engines' SQL — same portability contract as the
# hand-pasted 8 above.
N_HYPERPLANES_WIDE = 32


def _lcg_hyperplanes(n: int, dim: int, seed: int) -> list[list[float]]:
    rows, x = [], seed
    for _ in range(n):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(round((x >> 11) / float(1 << 53) * 2 - 1, 4))
        rows.append(row)
    return rows


WIDE_HYPERPLANES = HYPERPLANES + _lcg_hyperplanes(
    N_HYPERPLANES_WIDE - N_HYPERPLANES, 64, seed=0x5EED1E55
)


def _sig_expr_spark(vec: str, planes=None) -> str:
    terms = []
    for b, h in enumerate(planes if planes is not None else HYPERPLANES):
        arr = "array(" + ", ".join(f"{x}D" for x in h) + ")"
        dot = (
            f"aggregate(zip_with({vec}, {arr},"
            f" (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _sig_expr_duck(vec: str, planes=None) -> str:
    terms = []
    for b, h in enumerate(planes if planes is not None else HYPERPLANES):
        arr = "[" + ", ".join(str(x) for x in h) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, len({vec}) + 1),"
            f" i -> {vec}[i] * ({arr})[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _hyperplane_sig_df(spark, sf_dir, planes):
    """(vec_id, label, embedding, sig) via the Arrow signature kernel
    (dedup._hyperplane_sig_batches with embedding pass-through) over a
    spread scan — bit-identical signatures to ``_sig_expr_spark``."""
    from ..pipeline.session import ensure_package_on_workers
    from .common import spread
    from .dedup import _hyperplane_sig_batches

    ensure_package_on_workers(spark)
    e = spread(
        spark,
        read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding"),
    )
    return e.mapInArrow(
        _hyperplane_sig_batches(planes, keep_embedding=True),
        "vec_id bigint, label int, embedding array<float>, sig bigint",
    )


def ann_hyperplane_topk(spark, sf_dir):
    """Label-free ANN blocking: random-hyperplane LSH (vector SimHash).
    The corpus is bucketed by an 8-bit signature; the query scans only
    buckets within Hamming distance HAMMING_PROBE of its own signature
    (9 of 256 cells) and exact-reranks by cosine.  This is the blocking
    that works when no IVF centroids / labels exist; at 10^9 vectors
    widen the signature (e.g. 16-24 bits) so each bucket stays small.
    Exactness note: candidates are pruned, never approximated — every
    returned cosine is the true value.  r07: the signature is the Arrow
    kernel (bit-exact fold parity), not the interpreted HOF chain."""
    sig = _hyperplane_sig_df(spark, sf_dir, HYPERPLANES)
    q = sig.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"), F.col("sig").alias("qsig")
    )
    cos = F.expr(_DOT.format(a="embedding", b="qvec")) / (
        F.expr(_NORM.format(v="embedding")) * F.expr(_NORM.format(v="qvec"))
    )
    return (
        sig.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .filter(F.expr(f"bit_count(sig ^ qsig) <= {HAMMING_PROBE}"))
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("cosine_raw") * 10000 + 0.5) / 10000).alias("cosine"),
        )
    )


ANN_HYPERPLANE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
         {_sig_expr_duck('CAST(embedding AS DOUBLE[])')} AS sig
  FROM embeddings
),
q AS (SELECT emb AS qvec, sig AS qsig FROM e WHERE vec_id = {{Q}}),
cand AS (
  SELECT vec_id, label, emb FROM e, q
  WHERE vec_id != {{Q}}
    AND bit_count(CAST(xor(e.sig, q.qsig) AS BIT)) <= {{P}}
)
SELECT vec_id, label,
       floor({_D_DOT.format(a='emb', b='qvec')}
             / ({_D_NORM.format(v='emb')} * {_D_NORM.format(v='qvec')})
             * 10000 + 0.5) / 10000 AS cosine
FROM cand, q
ORDER BY {_D_DOT.format(a='emb', b='qvec')}
         / ({_D_NORM.format(v='emb')} * {_D_NORM.format(v='qvec')}) DESC,
         vec_id ASC
LIMIT {{K}}
""".replace("{Q}", str(QUERY_VEC_ID)).replace("{P}", str(HAMMING_PROBE)).replace("{K}", str(TOP_K))

QUERIES["ann_hyperplane_topk"] = (ann_hyperplane_topk, ANN_HYPERPLANE_SQL)


# wide-signature ANN: the query-path twin of the corpus-scale dedup
# blocking (dedup.embedding_neardup_pairs_wide).  4 bands of 8 bits
# over the 32-bit signature: a candidate shares ANY band with the
# query, so recall tolerates up to 3 flipped signature bits
# (pigeonhole) vs the 8-bit probe's radius-2 — while scanning ~4/256
# of a diverse corpus vs 9/256.  At 10^9+ vectors widen the bands
# (2x16-bit halves — 1/32768 of the corpus, 1-flip tolerance), same
# expression shape.
ANN_WIDE_BAND_BITS = 8
N_ANN_WIDE_BANDS = 4
_ANN_WIDE_MASK = (1 << ANN_WIDE_BAND_BITS) - 1


def _wide_band_match(sig: str, qsig: str) -> str:
    return " OR ".join(
        f"((({sig} >> {b * ANN_WIDE_BAND_BITS}) & {_ANN_WIDE_MASK})"
        f" = (({qsig} >> {b * ANN_WIDE_BAND_BITS}) & {_ANN_WIDE_MASK}))"
        for b in range(N_ANN_WIDE_BANDS)
    )


def ann_hyperplane_wide_topk(spark, sf_dir):
    """ANN with the 32-bit (32-hyperplane) signature, banded 4x8 bits:
    candidates share >= 1 band with the query — evaluated as a
    map-side filter against the broadcast query signature (no join, no
    shuffle, one corpus scan + TakeOrdered).  Candidates are pruned,
    never approximated: every returned cosine is exact.  r07: kernel
    signature (see ann_hyperplane_topk)."""
    sig = _hyperplane_sig_df(spark, sf_dir, WIDE_HYPERPLANES)
    q = sig.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"), F.col("sig").alias("qsig")
    )
    cos = F.expr(_DOT.format(a="embedding", b="qvec")) / (
        F.expr(_NORM.format(v="embedding")) * F.expr(_NORM.format(v="qvec"))
    )
    # rank by the RAW cosine (identical IEEE folds in both engines);
    # floor-based rounding is output-only (round() is engine-divergent
    # on doubles — text.py::_r)
    return (
        sig.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .filter(F.expr(_wide_band_match("sig", "qsig")))
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.floor(F.col("cosine_raw") * 10000 + 0.5) / 10000).alias("cosine"),
        )
    )


def _ann_hyperplane_wide_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
         {_sig_expr_duck('CAST(embedding AS DOUBLE[])', WIDE_HYPERPLANES)} AS sig
  FROM embeddings
),
q AS (SELECT emb AS qvec, sig AS qsig FROM e WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT vec_id, label, emb FROM e, q
  WHERE vec_id != {QUERY_VEC_ID}
    AND ({_wide_band_match('e.sig', 'q.qsig')})
),
scored AS (
  SELECT vec_id, label,
         {_D_DOT.format(a='emb', b='qvec')}
           / ({_D_NORM.format(v='emb')} * {_D_NORM.format(v='qvec')}) AS cosine_raw
  FROM cand, q
)
SELECT vec_id, label,
       floor(cosine_raw * 10000 + 0.5) / 10000 AS cosine
FROM scored
ORDER BY cosine_raw DESC, vec_id ASC
LIMIT {TOP_K}
"""


QUERIES["ann_hyperplane_wide_topk"] = (
    ann_hyperplane_wide_topk,
    _ann_hyperplane_wide_sql(),
)
