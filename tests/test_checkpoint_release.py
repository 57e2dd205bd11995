"""Session-scoped label-table lifecycle for dedup_clusters (VERDICT
r05 item 5 + ADVICE r05): back-to-back batch runs must not accumulate
persistent label tables, the early-convergence (cache-only) final
labels must get a release handle, and a CCNotConverged raise must not
leak the working checkpoints."""

import pytest

SF = "/root/testdata/sf0.001"


def _persistent_ids(spark):
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    lst = m.toList()
    return {lst.apply(i)._1() for i in range(m.size())}


def test_back_to_back_dedup_clusters_no_persistent_growth(spark):
    """Two consecutive dedup_clusters runs in one session: the second
    run's drain releases the first run's final label table, so the
    persistent-RDD map is no bigger after run 2 than after run 1."""
    from swift_readability_spark.operators.dedup import (
        dedup_clusters,
        drain_cc_releases,
    )

    drain_cc_releases()  # isolate from earlier tests in the session
    baseline = len(_persistent_ids(spark))

    r1 = dedup_clusters(spark, SF).collect()
    after_run1 = len(_persistent_ids(spark))

    r2 = dedup_clusters(spark, SF).collect()
    after_run2 = len(_persistent_ids(spark))

    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert after_run2 <= after_run1, (
        f"persistent-RDD map grew across runs: {after_run1} -> {after_run2}"
    )

    # an explicit drain returns the session to its baseline
    drain_cc_releases()
    assert len(_persistent_ids(spark)) <= baseline


def test_release_covers_cache_only_convergence(spark):
    """ADVICE r05: a graph that converges BEFORE the first checkpoint
    round (< 5 rounds) leaves the final labels only .cache()'d — the
    release callable must unpersist that cache, not silently no-op."""
    from swift_readability_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "doc_a string, doc_b string"
    )
    release = []
    df = connected_components(edges, checkpoint_release=release)
    rows = {r["doc_id"]: r["cluster_id"] for r in df.collect()}
    assert rows == {"a": "a", "b": "a", "c": "c", "d": "c"}
    assert len(release) == 1
    before = _persistent_ids(spark)
    release[0]()
    after = _persistent_ids(spark)
    assert after < before, (
        f"cache-only release freed nothing: {sorted(before)} -> {sorted(after)}"
    )
    release[0]()  # idempotent


def test_not_converged_releases_working_state(spark):
    """ADVICE r05: CCNotConverged must free the working checkpoints /
    caches before raising — no release handle exists on that path."""
    from swift_readability_spark.operators.dedup import (
        CCNotConverged,
        connected_components,
    )

    n = 200
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    before = len(_persistent_ids(spark))
    # 6 rounds: past the round-5 checkpoint, but doubling reach (~2^6)
    # is still far short of the 199-hop chain
    with pytest.raises(CCNotConverged):
        connected_components(edges, max_rounds=6).collect()
    after = len(_persistent_ids(spark))
    assert after <= before, (
        f"CCNotConverged leaked persistent RDDs: {before} -> {after}"
    )
