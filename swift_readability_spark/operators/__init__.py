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
# Entries here are the ones with no driver-green CORRECTNESS row yet
# (r03 sampled the first 50 of the old ordering, leaving these 20 with
# local-only evidence) — they go first so CORRECTNESS_r04 covers them;
# the long-driver-green relational/text/dedup queries move past the cap
# and stay pinned by scripts/validate_oracles.py full sweeps.
DRIVER_WINDOW_FIRST = (
    "extract_metadata",
    "extract_spans_stats",
    "extract_and_curate",
    "build_training_set",
    "paragraph_dedup",
    "chunk_dedup_stats",
    "stratified_sample",
    "tfidf_top_terms",
    "pack_sequences",
    "mixture_sample",
    "corpus_report",
    "knn_join",
    "dedup_clusters",
    "dataset_split",
    "decontaminate_against_eval",
    "simhash_wide",
    "simhash_wide_neardup_pairs",
    "simhash_wide_band_stats",
    "embedding_neardup_pairs_wide",
    "containment_pairs",
    "ann_hyperplane_wide_topk",
    "ann_bruteforce_topk",
    "ivf_centroids",
    "ann_ivf_topk",
    "ann_ivf_refined_topk",
    "ann_hyperplane_topk",
    "payload_features",
    "media_decode_stub",
    "media_frame_sample",
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
