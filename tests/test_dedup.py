"""Planted-duplicate tests for the dedup chain (VERDICT r01 item 1/5).

A deterministic corpus with known near-duplicate pairs and one
degenerate boilerplate cluster larger than ``MAX_LSH_BUCKET`` proves:

- the bucket cap drops the boilerplate blow-up (and the drop is
  audited by ``lsh_bucket_stats``, never silent),
- every planted near-dup is still found by the capped LSH and
  verified by the candidates-only Jaccard stage,
- the SimHash Hamming-band consumer finds the exact-duplicate cluster.
"""

import random

import pytest

from swift_readability_spark.operators.dedup import (
    MAX_LSH_BUCKET,
    SIMHASH_MAX_HAMMING,
    lsh_bucket_stats,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)

N_BOILER = MAX_LSH_BUCKET + 6  # one degenerate bucket above the cap


def _corpus():
    """(doc_id, text) rows: 20 distinct docs, 5 planted near-dup pairs,
    N_BOILER identical boilerplate docs."""
    rng = random.Random(42)
    vocab = [f"w{i:03d}" for i in range(400)]
    rows = []
    for i in range(20):
        rows.append((f"base-{i:02d}", " ".join(rng.choice(vocab) for _ in range(60))))
    planted = []
    for p in range(5):
        words = [rng.choice(vocab) for _ in range(60)]
        a, b = f"pair{p}-a", f"pair{p}-b"
        dup = list(words)
        # 1-word change: shingle Jaccard ~0.9 -> recall is deterministic
        # and overwhelmingly inside the 4x2 band scheme
        dup[30] = "changed"
        rows.append((a, " ".join(words)))
        rows.append((b, " ".join(dup)))
        planted.append((a, b))
    boiler = "subscribe to our newsletter terms privacy cookie policy " * 8
    for i in range(N_BOILER):
        rows.append((f"boiler-{i:03d}", boiler))
    return rows, planted


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rows, planted = _corpus()
    d = str(tmp_path_factory.mktemp("planted"))
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(
        1
    ).write.parquet(f"{d}/documents.parquet")
    return d, planted


def test_cap_drops_degenerate_bucket_but_keeps_planted(spark, planted_dir):
    d, planted = planted_dir
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(spark, d).collect()}
    for a, b in planted:
        assert (a, b) in pairs, f"planted near-dup {(a, b)} lost by capped LSH"
    # the >cap boilerplate bucket must not explode into pairs
    assert not any(x.startswith("boiler-") for x, _ in pairs)
    assert not any(y.startswith("boiler-") for _, y in pairs)


def test_drop_is_audited_not_silent(spark, planted_dir):
    d, _ = planted_dir
    stats = lsh_bucket_stats(spark, d).collect()
    dropped_buckets = sum(r["dropped_buckets"] for r in stats)
    dropped_pairs = sum(r["dropped_pairs"] for r in stats)
    # identical boilerplate -> identical signature -> one over-cap
    # bucket in EVERY band
    n_bands = len(stats)
    assert dropped_buckets == n_bands
    assert dropped_pairs == n_bands * (N_BOILER * (N_BOILER - 1) // 2)
    assert all(r["max_bucket"] == N_BOILER for r in stats)


def test_verify_stage_scores_planted_pairs(spark, planted_dir):
    d, planted = planted_dir
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, d).collect()
    }
    for a, b in planted:
        assert (a, b) in verified
        assert verified[(a, b)] >= 0.8  # 1-word change in 60 words
    # verify stage only scores LSH candidates: no boilerplate pairs
    assert not any(a.startswith("boiler-") for a, _ in verified)


def test_10k_member_bucket_completes_without_pair_blowup(spark, tmp_path):
    """VERDICT r02 item 3 'done' criterion: a planted 10k-member LSH
    bucket (10k identical docs -> identical signature -> one bucket per
    band) completes and contributes zero pairs.  The window-count cap
    drops the bucket before collect_set ever materializes its member
    list (plan order pinned in test_plans.py); without the pre-filter
    this would build 4 x 10k-member arrays and expand ~2x10^8 pairs."""
    n = 10_000
    boiler = "subscribe to our newsletter terms privacy cookie policy " * 8
    rows = [(f"big-{i:05d}", boiler) for i in range(n)]
    rows += [(f"pair-a", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
             (f"pair-b", "alpha beta gamma delta epsilon zeta eta theta iota lambda")]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(spark, d).collect()}
    assert not any(a.startswith("big-") for a, _ in pairs)
    assert not any(b.startswith("big-") for _, b in pairs)
    stats = lsh_bucket_stats(spark, d).collect()
    assert all(r["max_bucket"] == n for r in stats)
    assert sum(r["dropped_pairs"] for r in stats) == len(stats) * n * (n - 1) // 2


def test_simhash_guard_fails_loudly_not_oom(spark, planted_dir, monkeypatch):
    """The cap-less Hamming-band path must fail LOUDLY (assert_true
    with a remedy message) when a bucket exceeds SIMHASH_GUARD_MAX,
    never OOM silently.  Lower the guard below the planted boilerplate
    cluster and expect the job to raise with the message."""
    import swift_readability_spark.operators.dedup as dd

    d, _ = planted_dir
    monkeypatch.setattr(dd, "SIMHASH_GUARD_MAX", 10)
    with pytest.raises(Exception, match="exact dedup|pigeonhole"):
        dd.simhash_neardup_pairs(spark, d).collect()


def test_embedding_neardup_has_teeth(spark):
    """VERDICT r02 item 5: the oracle must compare real pairs — the
    planted near-duplicates guarantee >0 rows, every planted pair
    scores ~1.0 cosine, and blocking is label-free (signature join)."""
    from swift_readability_spark.operators.dedup import (
        N_PLANTED_NEARDUP,
        embedding_neardup_pairs,
    )

    rows = embedding_neardup_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    planted = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows
               if r["vec_b"] >= 1_000_000}
    assert len(planted) >= N_PLANTED_NEARDUP // 2  # sig flips may drop a few
    assert all(c > 0.99 for c in planted.values())


def test_simhash_bands_find_exact_cluster(spark, planted_dir):
    d, planted = planted_dir
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(spark, d).collect()
    }
    # identical boilerplate docs: hamming 0, all pairs found
    boiler_pairs = {(a, b) for (a, b) in pairs if a.startswith("boiler-")}
    assert len(boiler_pairs) == N_BOILER * (N_BOILER - 1) // 2
    assert all(pairs[p] == 0 for p in boiler_pairs)
    assert all(h <= SIMHASH_MAX_HAMMING for h in pairs.values())
    # banding is EXACT within the radius (pigeonhole): the banded join
    # finds precisely the pairs a brute-force hamming scan finds
    fp = {r["doc_id"]: r["simhash"] for r in simhash(spark, d).collect()}
    ids = sorted(fp)
    brute = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= SIMHASH_MAX_HAMMING
    }
    assert pairs == brute


def test_dedup_clusters_transitive(spark, tmp_path):
    """A~B and B~C must collapse into ONE cluster with min-id
    canonical, even without a direct A~C pair edge."""
    import random

    from swift_readability_spark.operators.dedup import dedup_clusters

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(300)]
    base = [rng.choice(vocab) for _ in range(80)]
    b = list(base); b[10] = "xb"; b[20] = "xb2"
    c = list(b);    c[40] = "xc"; c[50] = "xc2"   # chain: a~b~c
    rows = [("a-doc", " ".join(base)), ("b-doc", " ".join(b)), ("c-doc", " ".join(c))]
    for i in range(10):
        rows.append((f"noise-{i:02d}", " ".join(rng.choice(vocab) for _ in range(80))))
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, d).collect()}
    assert got.get("a-doc") == got.get("b-doc") == got.get("c-doc") == "a-doc"
    assert not any(k.startswith("noise-") for k in got)


def test_connected_components_chain_raises_when_capped(spark):
    """The round cap is still LOUD: with max_rounds too small for the
    component, CCNotConverged is raised — NEVER a silent split of one
    duplicate chain into several clusters (VERDICT r03 item 2)."""
    from swift_readability_spark.operators.dedup import (
        CCNotConverged,
        connected_components,
    )

    n = 30  # 2 combined rounds reach back ~6 hops < the 29-hop chain
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    with pytest.raises(CCNotConverged, match="pointer doubling"):
        connected_components(edges, max_rounds=2).collect()


def test_connected_components_chain_converges_in_log_rounds(spark):
    """Pointer doubling makes a PATH graph converge in O(log n)
    combined rounds (VERDICT r04 item 4): the 30-node chain finishes
    within 2*ceil(log2(n)) + 2 = 12 rounds — plain min-propagation
    would need its 29-hop diameter."""
    from swift_readability_spark.operators.dedup import connected_components

    n = 30
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_rounds=12).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {"n000"}


def test_connected_components_200_chain_within_default_rounds(spark):
    """The O(log n) claim at a size where O(diameter) visibly fails:
    a 200-node path (diameter 199) converges within the DEFAULT 20
    rounds (2*ceil(log2(200)) + 2 = 18), exercising the
    localCheckpoint-every-5-rounds path and the final-checkpoint
    release callback (ADVICE r04)."""
    from swift_readability_spark.operators.dedup import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    release = []
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, checkpoint_release=release).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {"n000"}
    # the release callback frees the final checkpoint's RDDs: the run
    # checkpoints at rounds 5/10/15, so a final checkpoint exists and
    # sits in the persistent-RDD map until released
    assert len(release) == 1
    sc = spark.sparkContext

    def _persistent_ids():
        m = sc._jsc.sc().getPersistentRDDs()
        lst = m.toList()
        return {lst.apply(i)._1() for i in range(m.size())}

    before = _persistent_ids()
    release[0]()
    after = _persistent_ids()
    assert after < before, (
        f"release() freed nothing: {sorted(before)} -> {sorted(after)}"
    )
    # calling release twice is harmless
    release[0]()


def test_wide_bands_candidate_volume_scales_linearly(spark, tmp_path):
    """VERDICT r03 item 3 'done' criterion: with band width following
    recommended_band_bits (~log2 n), candidate-pair volume on a 10x
    corpus grows ~linearly (~10-15x), while a FIXED band width grows
    ~quadratically (~100x) on the same data."""
    import random

    from pyspark.sql import functions as F

    from swift_readability_spark.operators.dedup import (
        N_SIMHASH_WIDE_BANDS,
        _wide_band_value_spark,
        recommended_band_bits,
        simhash_wide,
    )

    def corpus(n, tmp):
        rng = random.Random(1234)
        vocab = [f"tok{i:04d}" for i in range(5000)]
        rows = [
            (f"d{i:05d}", " ".join(rng.choice(vocab) for _ in range(60)))
            for i in range(n)
        ]
        spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
            f"{tmp}/documents.parquet"
        )
        return tmp

    def pair_volume(sf_dir, band_bits):
        wide = simhash_wide(spark, sf_dir)
        bands = [
            F.struct(
                F.lit(b).alias("band"),
                F.expr(_wide_band_value_spark(b, band_bits)).alias("value"),
            )
            for b in range(N_SIMHASH_WIDE_BANDS)
        ]
        banded = wide.select(F.explode(F.array(*bands)).alias("bb")).select(
            "bb.band", "bb.value"
        )
        sizes = banded.groupBy("band", "value").count()
        row = sizes.agg(
            F.sum(F.expr("count * (count - 1) / 2")).alias("pairs")
        ).collect()[0]
        return float(row["pairs"] or 0.0)

    n_small = 300
    d_small = corpus(n_small, str(tmp_path / "small"))
    d_big = corpus(n_small * 10, str(tmp_path / "big"))

    bits_small = recommended_band_bits(n_small)   # 9
    bits_big = recommended_band_bits(n_small * 10)  # 12
    assert bits_small < bits_big

    v_scaled_small = pair_volume(d_small, bits_small)
    v_scaled_big = pair_volume(d_big, bits_big)
    v_fixed_small = pair_volume(d_small, 8)
    v_fixed_big = pair_volume(d_big, 8)

    assert v_scaled_small > 0 and v_fixed_small > 0
    scaled_ratio = v_scaled_big / v_scaled_small
    fixed_ratio = v_fixed_big / v_fixed_small
    # 10x corpus: log2-scaled width stays near-linear; fixed width is
    # quadratic (n^2/2^bits with bits constant)
    assert scaled_ratio < 30, scaled_ratio
    assert fixed_ratio > 50, fixed_ratio
    assert scaled_ratio < fixed_ratio / 3


def test_simhash_wide_bands_exact_within_radius(spark, planted_dir):
    """The 16-bit banding over the 64-bit fingerprint is pigeonhole-
    exact for Hamming distance <= 3: the banded join finds precisely
    the pairs a brute-force 64-bit Hamming scan finds."""
    from swift_readability_spark.operators.dedup import (
        SIMHASH_WIDE_MAX_HAMMING,
        simhash_wide,
        simhash_wide_neardup_pairs,
    )

    d, _ = planted_dir
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_wide_neardup_pairs(spark, d).collect()
    }
    boiler_pairs = {(a, b) for (a, b) in pairs if a.startswith("boiler-")}
    assert len(boiler_pairs) == N_BOILER * (N_BOILER - 1) // 2
    assert all(pairs[p] == 0 for p in boiler_pairs)
    fp = {
        r["doc_id"]: (r["fp_lo"], r["fp_hi"])
        for r in simhash_wide(spark, d).collect()
    }
    ids = sorted(fp)

    def ham(a, b):
        return bin(fp[a][0] ^ fp[b][0]).count("1") + bin(
            fp[a][1] ^ fp[b][1]
        ).count("1")

    brute = {
        (a, b): ham(a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= SIMHASH_WIDE_MAX_HAMMING
    }
    assert pairs == brute


def test_simhash_wide_guard_fails_loudly(spark, planted_dir, monkeypatch):
    """The wide operator carries the same pair-budget assert_true guard
    as the 8-bit one."""
    import swift_readability_spark.operators.dedup as dd

    d, _ = planted_dir
    monkeypatch.setattr(dd, "SIMHASH_GUARD_MAX", 10)
    with pytest.raises(Exception, match="pair budget|exact dedup"):
        dd.simhash_wide_neardup_pairs(spark, d).collect()


def test_embedding_neardup_wide_has_teeth(spark):
    """The 32-plane banded blocking still finds the planted >0.99
    near-duplicates (single-bit signature flips are covered by the
    2-band pigeonhole)."""
    from swift_readability_spark.operators.dedup import (
        N_PLANTED_NEARDUP,
        embedding_neardup_pairs_wide,
    )

    rows = embedding_neardup_pairs_wide(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    planted = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows
               if r["vec_b"] >= 1_000_000}
    assert len(planted) >= N_PLANTED_NEARDUP // 2
    assert all(c > 0.99 for c in planted.values())


def test_containment_prefix_filter_is_exact_vs_bruteforce(spark, tmp_path):
    """Prefix filtering is an EXACT candidate stage (modulo the df
    cap, which no shingle here reaches): the operator's output equals
    a brute-force Python all-pairs containment scan over the same
    shingle sets."""
    import random
    import re

    from swift_readability_spark.operators.dedup import (
        CONTAINMENT_MIN,
        containment_pairs,
    )

    rng = random.Random(314)
    vocab = [f"w{i:03d}" for i in range(150)]
    rows = []
    for i in range(40):
        n = rng.randrange(8, 60)
        rows.append((f"d{i:02d}", " ".join(rng.choice(vocab) for _ in range(n))))
    # planted: full containment and partial overlap
    base = rows[0][1].split()
    rows.append(("sub-doc", " ".join(base[: max(6, len(base) // 3)])))
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )

    def shingles(text):
        words = [w for w in re.sub(r"[^a-zA-Z0-9 ]", " ", text.lower()).split() if w]
        if len(words) < 3:
            return {" ".join(words)}
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    sets = {doc: shingles(t) for doc, t in rows}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            # the operator's EXACT integer threshold (2*common >= n is
            # containment >= CONTAINMENT_MIN), not a rounded ratio
            if 2 * common >= na or 2 * common >= nb:
                expected[(a, b)] = (
                    int(common / na * 10000 + 0.5) / 10000,
                    int(common / nb * 10000 + 0.5) / 10000,
                )

    got = {
        (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(spark, d).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k][0] - expected[k][0]) < 1e-3
        assert abs(got[k][1] - expected[k][1]) < 1e-3


def test_simhash_wide_low_word_equals_simhash(spark):
    """fp_lo of the 64-bit fingerprint is BY CONSTRUCTION the 32-bit
    simhash (votes over the same first-8-hex-chars md5 hash), so the
    narrow operator is a strict prefix of the wide one — pin it."""
    from swift_readability_spark.operators.dedup import simhash, simhash_wide

    sf = "/root/testdata/sf0.001"
    narrow = {r["doc_id"]: r["simhash"] for r in simhash(spark, sf).collect()}
    wide = {r["doc_id"]: r["fp_lo"] for r in simhash_wide(spark, sf).collect()}
    assert narrow == wide
