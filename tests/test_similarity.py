"""ANN recall contract: multi-probe IVF vs the exact baseline.

Single-probe IVF measured recall@10 = 0.1 on the test embeddings
(weakly clustered vectors — the query's true neighbours span six
labels); N_PROBES=3 lifts it to 0.4-0.5 while still scanning only
3/10 cells.  The floor asserted here is the multi-probe contract;
brute force is the ground truth, not an oracle approximation.
"""

from swift_readability_spark.operators.similarity import (
    N_PROBES,
    TOP_K,
    ann_bruteforce_topk,
    ann_ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_multi_probe_recall_floor(spark):
    brute = {r["vec_id"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    ivf = {r["vec_id"] for r in ann_ivf_topk(spark, SF_DIR).collect()}
    assert len(brute) == TOP_K
    assert len(ivf) == TOP_K
    recall = len(brute & ivf) / TOP_K
    # seed-vector cells measure 0.7 at this scale (label-mean cells
    # measured 0.4-0.5); a regression to single-probe behavior (0.1)
    # fails this immediately
    assert recall >= 0.4, f"recall@{TOP_K} = {recall} with {N_PROBES} probes"


def test_refined_ivf_recall_floor(spark):
    """VERDICT r05 item 4 done-criterion: k-means-refined scale-derived
    cells + P=N_PROBES_REFINED probes must hold recall@10 >= 0.8
    (measured 0.9 at this scale: n=500, k=10, iters=2, P=6)."""
    from swift_readability_spark.operators.similarity import ann_ivf_refined_topk

    brute = {r["vec_id"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    refined = {r["vec_id"] for r in ann_ivf_refined_topk(spark, SF_DIR).collect()}
    assert len(refined) == TOP_K
    recall = len(brute & refined) / TOP_K
    assert recall >= 0.8, f"refined recall@{TOP_K} = {recall}"


def test_recommended_ivf_cells_growth(spark, tmp_path):
    """VERDICT r05 item 4: the IVF geometry is DERIVED from corpus
    size — cells grow ~sqrt(n) (min-cell floor at small n), and the
    coarse quantizer actually materializes more (non-empty) cells on a
    10x corpus."""
    import random

    from swift_readability_spark.operators.similarity import (
        MAX_IVF_CELLS,
        ivf_centroids,
        recommended_ivf_cells,
    )

    # the sizing rule itself
    assert recommended_ivf_cells(500) == 10       # n/50 floor binds
    assert recommended_ivf_cells(5000) == 70      # sqrt(5000) = 70.7
    assert recommended_ivf_cells(10**9) == 31622  # sqrt binds
    assert recommended_ivf_cells(10**12) == MAX_IVF_CELLS  # broadcast cap
    assert recommended_ivf_cells(0) == 1

    # materialized growth on a 10x synthetic corpus
    def corpus(n, path):
        rng = random.Random(77)
        rows = [
            (i, i % 10, [round(rng.uniform(-1, 1), 4) for _ in range(8)])
            for i in range(n)
        ]
        spark.createDataFrame(
            rows, "vec_id bigint, label bigint, embedding array<double>"
        ).write.parquet(f"{path}/embeddings.parquet")
        return str(path)

    small = corpus(500, tmp_path / "small")
    big = corpus(5000, tmp_path / "big")
    n_small = ivf_centroids(spark, small).count()
    n_big = ivf_centroids(spark, big).count()
    assert n_small <= 10
    # k-means argmax can leave a few seed cells empty; growth must
    # still be clear (>= 4x on a 10x corpus, 7x derived)
    assert n_big >= 4 * n_small, f"cells did not grow: {n_small} -> {n_big}"


def test_refined_ivf_exact_within_probed_cells(spark):
    """Refined IVF also prunes, never approximates distances."""
    from swift_readability_spark.operators.similarity import ann_ivf_refined_topk

    brute = {r["vec_id"]: r["cosine"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    for r in ann_ivf_refined_topk(spark, SF_DIR).collect():
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]


def test_ivf_results_are_exact_within_probed_cells(spark):
    """Every returned neighbour's cosine matches the brute-force value
    (IVF prunes candidates, never approximates the distance)."""
    brute = {r["vec_id"]: r["cosine"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    for r in ann_ivf_topk(spark, SF_DIR).collect():
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]


def test_hyperplane_lsh_recall_floor(spark):
    """Random-hyperplane LSH (label-free blocking): probing buckets
    within Hamming distance 2 (37/256 cells ~ 14% of the corpus) holds
    recall@10 >= 0.3 even on these near-random test vectors; single-
    probe measured 0.0-0.2, radius-2 0.4-0.5."""
    from swift_readability_spark.operators.similarity import ann_hyperplane_topk

    brute = {r["vec_id"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    lsh = {r["vec_id"] for r in ann_hyperplane_topk(spark, SF_DIR).collect()}
    assert len(lsh) == TOP_K
    assert len(brute & lsh) / TOP_K >= 0.3


def test_hyperplane_wide_results_exact_and_nonempty(spark):
    """The 4x8-band wide-signature probe returns candidates (non-
    vacuous at test scale) and, being prune-only, every returned
    cosine matches the brute-force exact value."""
    from swift_readability_spark.operators.similarity import (
        ann_hyperplane_wide_topk,
    )

    brute = {
        r["vec_id"]: r["cosine"]
        for r in ann_bruteforce_topk(spark, SF_DIR).collect()
    }
    rows = ann_hyperplane_wide_topk(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]


def test_containment_catches_subset_duplication(spark, tmp_path):
    """A short doc fully embedded in a long page scores low Jaccard
    but high containment — the asymmetric operator must flag it."""
    import random

    from swift_readability_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(99)
    vocab = [f"w{i:03d}" for i in range(400)]
    short = [rng.choice(vocab) for _ in range(30)]
    long_doc = short + [rng.choice(vocab) for _ in range(170)]
    rows = [("short-doc", " ".join(short)), ("long-doc", " ".join(long_doc))]
    for i in range(10):
        rows.append(
            (f"noise-{i:02d}", " ".join(rng.choice(vocab) for _ in range(80)))
        )
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    cont = {
        (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(spark, d).collect()
    }
    key = ("long-doc", "short-doc")
    assert key in cont
    ca, cb = cont[key]
    assert max(ca, cb) > 0.9  # the short doc is ~fully contained
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, d).collect()
    }
    # symmetric Jaccard under-scores the same pair
    assert jac.get(key, 0.0) < 0.5
