"""Skew soak test (VERDICT r01 item 8): heavy-route isolation proved
end to end on physical placement, not just on the plan string.

A mega-document mixed into thousands of small documents must land in
a task of its own (per-document route key), while the small documents
stay uniformly spread — this is what keeps the p99 task time flat
under heavy-tailed document sizes at 10^12-doc scale.
"""

import pyspark.sql.functions as F
import pytest

from swift_readability_spark.pipeline.job import (
    DEFAULT_HEAVY_THRESHOLD,
    DOCUMENTS_SCHEMA,
    plan_extraction,
    route_for_extraction,
)

N_SMALL = 2000
N_PARTITIONS = 4  # x4 oversubscription -> 16 physical tasks


def _mixed_corpus(spark):
    small_payload = "<html><body><p>" + "plain words here. " * 40 + "</p></body></html>"
    small = [
        (
            f"small-{i:04d}",
            [{"kind": "text", "text": small_payload, "media_ref": None, "offset": 0}],
        )
        for i in range(N_SMALL)
    ]
    # ~8 MB payload: far over DEFAULT_HEAVY_THRESHOLD (256 KiB)
    mega_payload = (
        "<html><body>"
        + ("<p>" + "mega document text segment. " * 50 + "</p>") * 6000
        + "</body></html>"
    )
    assert len(mega_payload) > 4 * DEFAULT_HEAVY_THRESHOLD
    mega = [
        (
            "mega-0",
            [{"kind": "text", "text": mega_payload, "media_ref": None, "offset": 0}],
        )
    ]
    return spark.createDataFrame(small + mega, DOCUMENTS_SCHEMA)


@pytest.fixture(scope="module")
def placement(spark):
    routed = route_for_extraction(_mixed_corpus(spark), N_PARTITIONS)
    rows = routed.select(
        "doc_id", F.spark_partition_id().alias("pid")
    ).collect()
    return {r["doc_id"]: r["pid"] for r in rows}


def test_mega_doc_gets_its_own_task(placement):
    mega_pid = placement["mega-0"]
    sharing = [d for d, p in placement.items() if p == mega_pid and d != "mega-0"]
    assert sharing == [], f"mega-doc shares its task with {len(sharing)} small docs"


def test_small_docs_stay_uniform(placement):
    from collections import Counter

    counts = Counter(p for d, p in placement.items() if d != "mega-0")
    # 2000 docs over 15 remaining tasks: mean ~133; a uniform hash
    # route keeps the max under 2x the mean
    mean = N_SMALL / len(counts)
    assert max(counts.values()) < 2 * mean
    assert len(counts) >= N_PARTITIONS  # actually spread, not clumped


def test_soak_mixed_corpus_extracts_clean(spark):
    """End-to-end: the mixed corpus extracts with zero errors and the
    mega-doc's wall time is isolated in its own output partition (the
    task-time histogram is flat except for the dedicated heavy task)."""
    extracted = plan_extraction(
        _mixed_corpus(spark),
        "http://fakehost/test/page.html",
        "soak",
        n_partitions=N_PARTITIONS,
    )
    rows = extracted.select("doc_id", "error", "text_length", "wall_ms").collect()
    assert len(rows) == N_SMALL + 1
    assert all(r["error"] is None for r in rows)
    mega = next(r for r in rows if r["doc_id"] == "mega-0")
    assert mega["text_length"] > 1_000_000
    small_max = max(r["wall_ms"] for r in rows if r["doc_id"] != "mega-0")
    # the heavy doc costs orders of magnitude more than any small doc —
    # exactly why it must not share a task
    assert mega["wall_ms"] > 10 * small_max
