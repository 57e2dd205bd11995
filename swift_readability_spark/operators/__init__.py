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
# Window re-derived for r06 (VERDICT r05 item 2): (a) the twice-red
# corpus_report — now integer-only — and its NEW bisecting twin
# immediately after it, so a third red localizes tokenization/md5 vs
# derivation; (b) every query round 6 CHANGED (integer-scaled outputs,
# the \s fix, the corr zero-guard, the scale-derived IVF geometry, the
# CC release paths); (c) the queries whose LAST driver evidence is
# oldest (r03-era, then r04-era rows — driver-green then, code
# unchanged since, but evidence rotates fresh per the VERDICT rule);
# (d) flagship continuity.  Everything past the cap was driver-green
# in r05 and stays pinned by scripts/validate_oracles.py full sweeps.
DRIVER_WINDOW_FIRST = (
    # (a) the red row, doubles removed, + its bisect twin
    "corpus_report",
    "corpus_report_cols",
    # (b) changed in r06
    "readerable_score",
    "quality_score",
    "curation_pipeline",
    "split_leakage_audit",
    "customer_value_correlation",
    "dedup_clusters",
    "dedup_cluster_stats",
    "ivf_centroids",
    "ann_ivf_topk",
    "ann_ivf_refined_topk",
    "token_set_similarity",
    "source_cap",
    "source_cap_stats",
    # (c) oldest driver evidence: r03-era rows
    "events_dedup_replayed",
    "comma_score",
    "class_weight",
    "normalized_text_length",
    "token_counts",
    "lang_id",
    "doc_fingerprint",
    "pii_scan",
    "top_terms",
    "repetition_stats",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "lsh_bucket_stats",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "mllib_minhash_pairs",
    "simhash_band_stats",
    "dedup_incremental",
    # (c) r04-era rows
    "customers_without_orders",
    "order_priority_histogram",
    "order_aging",
    "event_props_extract",
    "user_event_type_map",
    "q18_large_volume_customers",
    "asof_last_purchase",
    # (d) flagship continuity
    "extract_metadata",
    "extract_spans_stats",
    "extract_and_curate",
    "build_training_set",
    "q1_pricing_summary",
    "sessionize_events",
    "stratified_sample",
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
