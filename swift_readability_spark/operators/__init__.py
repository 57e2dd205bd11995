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

# The driver's correctness check samples the FIRST 50 registry entries.
# Window re-derived for r07 (optimization round): (a) the corpus_report
# red row + bisect twin stay first (standing item until driver-green);
# (b) every query whose SPARK-SIDE implementation was rewritten this
# round (Arrow kernels, vectorized prefilter, survivor-only verifies,
# driver-side signature folds, join reorders — oracle SQL byte-
# identical, but these are exactly the rows where a driver-corpus-only
# divergence could newly appear); (c) flagship continuity.  Evicted to
# make room: rows that are r06-driver-green AND untouched this round
# (readerable_score, split_leakage_audit, customer_value_correlation,
# source_cap x2, events_dedup_replayed, class_weight, sessionize,
# stratified_sample, the r04-era relational rotation rows) — all still
# pinned by the full validate_oracles.py sweeps.
DRIVER_WINDOW_FIRST = (
    # (a) the red row + its bisect twin
    "corpus_report",
    "corpus_report_cols",
    # (b) rewritten in r07 — text/curation kernels
    "quality_score",
    "curation_pipeline",
    "token_set_similarity",
    "repetition_stats",
    "top_terms",
    "tfidf_top_terms",
    "token_counts",
    "lang_id",
    "doc_fingerprint",
    "pii_scan",
    "comma_score",
    "normalized_text_length",
    # (b) rewritten in r07 — dedup/similarity kernels + prefilter
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "lsh_bucket_stats",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "simhash_band_stats",
    "simhash_wide",
    "simhash_wide_neardup_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_wide",
    "mllib_minhash_pairs",
    "containment_pairs",
    "containment_stats",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_cluster_stats",
    "decontaminate_against_eval",
    "paragraph_dedup",
    "chunk_dedup_stats",
    "ivf_centroids",
    "ann_ivf_topk",
    "ann_ivf_refined_topk",
    "ann_bruteforce_topk",
    "knn_join",
    # (b) rewritten in r07 — relational/event paths
    "q3_shipping_priority",
    "top3_orders_per_customer",
    "event_props_extract",
    "arrays_setops_demo",
    # (c) flagship continuity
    "extract_metadata",
    "extract_spans_stats",
    "extract_and_curate",
    "build_training_set",
    "q1_pricing_summary",
)


def registry():
    out = {}
    for mod in ALL_MODULES:
        for name, pair in mod.QUERIES.items():
            assert name not in out, f"duplicate query {name}"
            out[name] = pair
    ordered = {}
    for name in DRIVER_WINDOW_FIRST:
        ordered[name] = out.pop(name)
    ordered.update(out)
    return ordered
