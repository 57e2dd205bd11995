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
    # 4-5x the single-probe 0.1; a regression to single-probe behavior
    # fails this immediately
    assert recall >= 0.4, f"recall@{TOP_K} = {recall} with {N_PROBES} probes"


def test_refined_ivf_recall_floor(spark):
    """VERDICT r02 item 8: two k-means refinement passes on the
    label-seeded cells + P=4 probes must reach recall@10 >= 0.7
    (measured 0.8 on the test embeddings; label-mean cells plateau at
    0.4-0.5)."""
    from swift_readability_spark.operators.similarity import ann_ivf_refined_topk

    brute = {r["vec_id"] for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    refined = {r["vec_id"] for r in ann_ivf_refined_topk(spark, SF_DIR).collect()}
    assert len(refined) == TOP_K
    recall = len(brute & refined) / TOP_K
    assert recall >= 0.7, f"refined recall@{TOP_K} = {recall}"


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
