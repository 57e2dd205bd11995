"""Focused unit tests for the r07 session-3 kernel internals.

``_pair_hash_prefilter``'s vectorized sweep (composite-key sort,
32-bit truncation, per-task memo) and ``_bucket_hamming_batches``'s
row-chunked LUT popcount both replaced per-pair Python loops; these
tests pin their semantics directly against brute-force references —
conservative keep (never drops a pair the exact rule keeps), duplicate
tolerance, chunk-boundary correctness, and the missing-id guard.
"""

import numpy as np
import pyarrow as pa
import pytest

from swift_readability_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    _bucket_hamming_batches,
    _pair_hash_prefilter,
)


def _pack_map(sets):
    """(ids, offsets, flat) in the _shingle_hash_map layout from a
    {doc_id: iterable-of-uint64} dict."""
    packed = sorted((i, np.sort(np.array(list(v), dtype=np.uint64))) for i, v in sets.items())
    ids = np.array([i for i, _ in packed])
    lens = np.array([len(a) for _, a in packed], dtype=np.int64)
    offs = np.zeros(len(packed) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = (
        np.concatenate([a for _, a in packed])
        if packed
        else np.empty(0, dtype=np.uint64)
    )
    return ids, offs, flat


def _exact_survivors(sets, pairs, keep_scalar):
    out = []
    for a, b in pairs:
        ha, hb = set(sets[a]), set(sets[b])
        c = len(ha & hb)
        if keep_scalar(c, len(ha), len(hb)):
            out.append((a, b))
    return sorted(set(out))


@pytest.mark.parametrize("id_kind", ["int", "str"])
def test_prefilter_matches_bruteforce_with_duplicates(spark, id_kind):
    """Random hash sets, candidate stream WITH duplicates: the kernel's
    survivors equal the brute-force exact-rule set (the 32-bit
    truncation can only ADD survivors; on 48-bit-spread values at this
    size no truncation collision occurs, so equality holds), and
    duplicate candidate rows all receive the same verdict."""
    rng = np.random.default_rng(7)
    mk = (lambda i: i) if id_kind == "int" else (lambda i: f"doc-{i:03d}")
    sets = {}
    base = rng.integers(1, 1 << 48, size=40, dtype=np.uint64)
    for i in range(30):
        # overlapping sets: share a sliding window of the base pool
        take = base[(i % 10): (i % 10) + 12]
        extra = rng.integers(1, 1 << 48, size=5, dtype=np.uint64)
        sets[mk(i)] = np.unique(np.concatenate([take, extra]))
    pairs = []
    for i in range(30):
        for j in range(i + 1, 30):
            if rng.random() < 0.5:
                pairs.append((mk(i), mk(j)))
    # duplicate every third pair 5x (the pre-distinct candidate shape)
    dup_stream = []
    for k, p in enumerate(pairs):
        dup_stream.extend([p] * (5 if k % 3 == 0 else 1))
    id_t = "bigint" if id_kind == "int" else "string"
    df = spark.createDataFrame(dup_stream, f"doc_a {id_t}, doc_b {id_t}")
    got = _pair_hash_prefilter(
        spark,
        df,
        _pack_map(sets),
        lambda c, na, nb: 2 * c + 6 >= np.minimum(na, nb),
    ).distinct()
    got_pairs = sorted((r["doc_a"], r["doc_b"]) for r in got.collect())
    want = _exact_survivors(
        sets, pairs, lambda c, na, nb: 2 * c + 6 >= min(na, nb)
    )
    assert got_pairs == want
    assert len(want) > 0  # the test corpus must actually exercise keeps
    assert len(want) < len(set(pairs))  # ... and drops


def test_prefilter_conservative_under_truncation(spark):
    """Two values that collide in their high 32 bits but differ in the
    low bits: the truncated count INFLATES c, so the pair is KEPT (a
    false positive for the exact verify downstream) — never dropped."""
    a_vals = [np.uint64((5 << 32) | 1), np.uint64((9 << 32) | 2)]
    b_vals = [np.uint64((5 << 32) | 3), np.uint64((11 << 32) | 4)]
    # exact c = 0; truncated c = 1 (the 5<<32 prefix collides)
    sets = {0: a_vals, 1: b_vals}
    df = spark.createDataFrame([(0, 1)], "doc_a bigint, doc_b bigint")
    got = _pair_hash_prefilter(
        spark,
        df,
        _pack_map(sets),
        # rule chosen so c=0 drops and c=1 keeps at na=nb=2
        lambda c, na, nb: 2 * c >= np.minimum(na, nb),
    ).collect()
    assert len(got) == 1  # kept BECAUSE truncation is inflation-only


def test_prefilter_missing_doc_raises(spark):
    sets = {0: [np.uint64(1)], 1: [np.uint64(2)]}
    df = spark.createDataFrame([(0, 99)], "doc_a bigint, doc_b bigint")
    out = _pair_hash_prefilter(
        spark, df, _pack_map(sets), lambda c, na, nb: c >= 0
    )
    with pytest.raises(Exception, match="missing from hash map"):
        out.collect()


def _brute_hamming_pairs(members):
    """Reference: all pairs with popcount(xor) <= SIMHASH_MAX_HAMMING,
    doc_a < doc_b in member (sorted) order."""
    out = []
    live = [(m["doc_id"], m["simhash"]) for m in members if m["simhash"] is not None]
    for i in range(len(live)):
        for j in range(i + 1, len(live)):
            h = bin(live[i][1] ^ live[j][1]).count("1")
            if h <= SIMHASH_MAX_HAMMING:
                out.append((live[i][0], live[j][0], h))
    return out


def test_bucket_hamming_chunking_matches_bruteforce():
    """A bucket big enough to engage the row-chunk loop (n^2 > the 4M
    slot budget) produces exactly the brute-force pair set — chunk
    boundaries lose no pairs and duplicate none."""
    rng = np.random.default_rng(3)
    n = 2200  # n^2 = 4.84M slots -> 2+ chunks
    # cluster fingerprints so qualifying pairs exist across the bucket
    centers = rng.integers(0, 1 << 32, size=12, dtype=np.uint64)
    fps = []
    for i in range(n):
        c = int(centers[i % 12])
        if i % 3:
            c ^= 1 << int(rng.integers(0, 32))  # hamming 1 from center
        fps.append(c)
    members = [
        {"doc_id": i, "simhash": fp} for i, fp in enumerate(fps)
    ]
    members[100]["simhash"] = None  # null-fingerprint member skipped
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(
                [members],
                type=pa.list_(
                    pa.struct(
                        [("doc_id", pa.int64()), ("simhash", pa.int64())]
                    )
                ),
            )
        ],
        ["members"],
    )
    got = []
    for ob in _bucket_hamming_batches([batch]):
        got.extend(
            zip(
                ob.column("doc_a").to_pylist(),
                ob.column("doc_b").to_pylist(),
                ob.column("hamming").to_pylist(),
            )
        )
    want = _brute_hamming_pairs(members)
    assert sorted(got) == sorted(want)
    assert len(want) > 1000  # the cluster design must yield real mass
