"""Deduplication operators over ``documents``: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Hashes are *portable*: ``bigint(first 8 hex chars of md5)`` — identical
in Spark (``conv(substr(md5(x),1,8),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``) so every stage is
oracle-checkable.  At 100 TB the same plans hold: shingle explode is a
map-side transform, MinHash is a hash aggregation on doc_id, and the
LSH band join replaces the quadratic pair scan with an equi-join on
(band, bucket) — the only shuffle keys are band buckets, which are
uniformly distributed by construction.
"""

from __future__ import annotations

import numpy as _np
from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import read, spread

N_PERMS = 8
BAND_SIZE = 2
N_BANDS = N_PERMS // BAND_SIZE

# -- portable word/shingle prep (identical semantics in both engines) --
# r07: regexp_extract_all('[^ ]+') replaces filter(split(...), x<>'')
# — identical arrays (maximal non-space runs after the ASCII strip),
# but the filter() HOF ran interpreted per ELEMENT (CodegenFallback)
# while regexp_extract_all is one codegen call per row.
_SPARK_WORDS = (
    "regexp_extract_all(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ')),"
    " '[^ ]+', 0)"
)
_DUCK_WORDS = (
    "list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')),"
    " ' +'), x -> x <> '')"
)

# Spark-side shingles/grams are COLLAPSE-PROOF: a lookahead regex over
# the normalized text (words joined by single spaces), not a lambda
# over a words array.  Catalyst's predicate/generate pushdown and
# CollapseProject freely inline a computed `words` column into lambda
# bodies, where every element evaluation re-runs the tokenization —
# O(n^2) per document (the mega-doc skew soak hung mllib_minhash_pairs
# and decontaminate for minutes; dedup_clusters inlined 260 copies).
# The regex form has no lambda, so inlining just duplicates a linear
# scan.  `norm` == concat_ws(' ', words) by construction.
_SPARK_NORM = (
    "trim(regexp_replace(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ')),"
    " ' +', ' '))"
)


def _ngram_lookahead_re(n: int) -> str:
    """At each word start with >= n words remaining, capture the n-word
    gram in group 1 (zero-width lookahead -> overlapping windows)."""
    return "(?=(" + "[^ ]+ " * (n - 1) + "[^ ]+))[^ ]+"


# n>=3 words -> overlapping 3-grams; 1-2 words -> the whole text as one
# shingle; empty -> one empty shingle (same contract as the old
# words-array form, pinned by the oracles).
_SPARK_SHINGLES = (
    f"CASE WHEN norm RLIKE '^[^ ]+ [^ ]+ ' THEN"
    f" regexp_extract_all(norm, '{_ngram_lookahead_re(3)}', 1)"
    f" ELSE array(norm) END"
)
_DUCK_SHINGLES = (
    "CASE WHEN len(words) >= 3 THEN"
    " [words[i] || ' ' || words[i+1] || ' ' || words[i+2]"
    "  FOR i IN range(1, len(words) - 1)]"
    " ELSE [array_to_string(words, ' ')] END"
)


def _spark_hash(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def _duck_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# 60-bit variant (15 hex chars, fits int64) for SHUFFLE KEYS standing in
# for long strings (chunks, n-grams): at corpus scale the shuffle row
# carries an 8-byte int instead of a 60+-char string, and 60 bits keeps
# birthday collisions negligible (~2^-18 at 10^6 distinct keys, where
# the 32-bit hash above would already collide).
def _spark_hash60(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _duck_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized content; the canonical
    representative is the minimum doc_id (map-side partial agg; the
    only shuffle key is the content hash — no skew for real corpora)."""
    # r07: spread the single-split scan so the normalize+md5 projection
    # runs at cluster parallelism, not on one core (guide §2.5)
    d = spread(spark, read(spark, sf_dir, "documents").select("doc_id", "text"))
    norm = F.lower(F.trim(F.regexp_replace("text", "[ \t\n\x0b\f\r]+", " ")))
    return (
        d.withColumn("content_hash", F.md5(norm))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS content_hash,
       count(*) AS cluster_size,
       min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
"""


# universal-hash permutation constants: perm_k(h) = (A_k*h + B_k) mod P
# over the 32-bit base hash — one md5 per shingle instead of N_PERMS,
# identical arithmetic in both engines (fits in int64: A < 2^20,
# h < 2^32 -> A*h + B < 2^53)
_MINHASH_P = 4294967311  # prime > 2^32
_MINHASH_A = (998377, 811823, 651439, 527581, 423037, 342049, 276197, 223409)
_MINHASH_B = (12721, 29363, 47563, 65537, 83701, 104729, 122887, 141079)


# --- Arrow-native tokenize+hash kernels (guide §4.2) -----------------
#
# The word/shingle -> md5 -> integer pipelines are per-document
# independent (no cross-row state), so the whole computation runs
# inside one mapInArrow stage: C-backed `re` tokenization, hashlib md5
# (first 4 digest bytes big-endian == the portable "first 8 hex chars"
# hash), and numpy batch-level vote/min reductions.  The JVM
# expression forms (kept verbatim in the oracle SQL) pay an
# interpreted-HOF md5+conv per element — measured 8.3 s (simhash) /
# 5.8 s (minhash) at sf1.0/local[32] vs ~1 s here; even the
# explode+codegen-HashAggregate rewrite only reached 5.1 / 4.5 s
# because JVM md5-hex + conv + per-row aggregation dominate.
#
# Tokenization parity is EXACT by construction: the ASCII strip regex
# '[^a-zA-Z0-9 ]' runs FIRST, so lower()/split() only ever see ASCII
# (Java/Python/DuckDB case-fold and whitespace semantics coincide on
# ASCII; the corpus-wide \s-class landmines do not apply because every
# non-[a-zA-Z0-9 ] byte is already a space).  Null text yields null
# outputs (matching transform(NULL) -> NULL in both engines); zero
# words yield simhash 0 / the md5('') shingle, matching the array
# forms.  Memory per batch is bounded: Arrow ships <=512 docs/batch
# (session.py), and the per-bit reductions use one cumsum buffer over
# the batch's words, never an n_words x 32 matrix (a 10M-word mega-doc
# costs one 80 MB int64 buffer, not 1.3 GB).

_ASCII_STRIP = "[^a-zA-Z0-9 ]"


def _spread_docs(spark, sf_dir):
    """(doc_id, text) pre-spread to cluster parallelism for the Arrow
    kernels (common.spread: the bench corpus is ONE parquet file ->
    one scan split -> a single Python worker would run the whole
    stage; measured 3.0 s single-task vs ~0.8 s spread at
    sf1.0/local[32]).  Also returns the doc_id type: bigint in the
    driver corpus but string in planted test corpora — the kernels
    pass it through untouched, so the output schema mirrors whatever
    the scan carries."""
    d = spread(spark, read(spark, sf_dir, "documents").select("doc_id", "text"))
    return d, dict(d.dtypes)["doc_id"]


def _tokenize_batch(texts):
    """words-per-doc lists mirroring ``_SPARK_WORDS`` (None for null
    text), plus int64 word counts and doc boundary offsets."""
    import re

    import numpy as np

    strip = re.compile(_ASCII_STRIP)
    words_per_doc = [
        None if t is None else strip.sub(" ", t).lower().split() for t in texts
    ]
    counts = np.fromiter(
        (0 if ws is None else len(ws) for ws in words_per_doc),
        dtype=np.int64,
        count=len(words_per_doc),
    )
    bounds = np.zeros(len(words_per_doc) + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    return words_per_doc, counts, bounds


def _md5_u64(strings_iter):
    """uint64 array of the portable 32-bit hash (first 8 md5 hex chars
    == first 4 digest bytes, big-endian) for a flat string iterable."""
    from hashlib import md5

    import numpy as np

    buf = b"".join(md5(s.encode()).digest()[:4] for s in strings_iter)
    return np.frombuffer(buf, dtype=">u4").astype(np.uint64)


def _vote32(h, counts, bounds):
    """Packed 32-bit majority vote per doc segment: bit b of doc i is
    set iff 2 * |{hashes in segment i with bit b set}| > counts[i].
    One int64 cumsum buffer over the batch's hashes per bit — bounded
    memory even when one doc holds millions of words."""
    import numpy as np

    fp = np.zeros(len(counts), dtype=np.int64)
    cs = np.empty(len(h) + 1, dtype=np.int64)
    cs[0] = 0
    for b in range(32):
        np.cumsum((h >> np.uint64(b)) & np.uint64(1), out=cs[1:])
        ones = cs[bounds[1:]] - cs[bounds[:-1]]
        fp |= (2 * ones > counts).astype(np.int64) << b
    return fp


def _null_safe_i64(values, texts):
    import pyarrow as pa

    if any(t is None for t in texts):
        return pa.array(
            [None if t is None else int(v) for t, v in zip(texts, values)],
            type=pa.int64(),
        )
    return pa.array(values, type=pa.int64())


def _simhash_batches(it):
    import pyarrow as pa

    for batch in it:
        texts = batch.column("text").to_pylist()
        words_per_doc, counts, bounds = _tokenize_batch(texts)
        h = _md5_u64(w for ws in words_per_doc if ws for w in ws)
        fp = _vote32(h, counts, bounds)
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), _null_safe_i64(fp, texts)],
            ["doc_id", "simhash"],
        )


def _simhash_wide_batches(it):
    from hashlib import md5

    import numpy as np
    import pyarrow as pa

    for batch in it:
        texts = batch.column("text").to_pylist()
        words_per_doc, counts, bounds = _tokenize_batch(texts)
        buf = b"".join(
            md5(w.encode()).digest()[:8]
            for ws in words_per_doc
            if ws
            for w in ws
        )
        both = np.frombuffer(buf, dtype=">u4").astype(np.uint64).reshape(-1, 2)
        fp_lo = _vote32(np.ascontiguousarray(both[:, 0]), counts, bounds)
        fp_hi = _vote32(np.ascontiguousarray(both[:, 1]), counts, bounds)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                _null_safe_i64(fp_lo, texts),
                _null_safe_i64(fp_hi, texts),
            ],
            ["doc_id", "fp_lo", "fp_hi"],
        )


def _shingles_for(words):
    """3-word shingles mirroring ``_SPARK_SHINGLES`` (never empty)."""
    if len(words) >= 3:
        return [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    return [" ".join(words)]


def _shingle_hash_batches(it):
    """Per doc: the sorted distinct 64-bit md5 prefixes of its shingles,
    packed as one binary blob (compact collect for the candidate
    prefilter's broadcast table)."""
    from hashlib import md5

    import numpy as np
    import pyarrow as pa

    for batch in it:
        texts = batch.column("text").to_pylist()
        words_per_doc, _c, _b = _tokenize_batch(texts)
        blobs = []
        for ws in words_per_doc:
            if ws is None:
                blobs.append(None)
                continue
            sh = set(_shingles_for(ws))
            arr = np.frombuffer(
                b"".join(md5(s.encode()).digest()[:8] for s in sh), dtype=">u8"
            ).astype(np.uint64)
            arr.sort()
            blobs.append(arr.tobytes())
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pa.array(blobs, type=pa.binary())],
            ["doc_id", "hs"],
        )


def _bucket_hamming_batches(it):
    """Per Hamming-band bucket: expand member pairs and keep those with
    XOR-popcount <= SIMHASH_MAX_HAMMING, vectorized over the bucket's
    pair matrix.  Members arrive sorted (sort_array upstream), so
    emitted pairs keep doc_a < doc_b exactly like the lambda form;
    null-fingerprint members are skipped (the lambda form paired them
    and then dropped the null hamming).

    r07 session 3 (measured: the synthetic corpus concentrates 200k
    banded rows into <1k buckets — 189M pair slots, max bucket 3404):
    fingerprints are 32-bit, so the XOR runs in uint32 and popcount is
    two 16-bit-LUT gathers + add (the 8-bit-LUT uint64 view paid 4x
    the memory traffic); the pair matrix is row-CHUNKED to a bounded
    slot budget (a degenerate bucket cannot allocate an n^2 buffer);
    survivors are emitted by boolean indexing, not a per-pair Python
    loop (~3.3M qualifying pairs here)."""
    import numpy as np
    import pyarrow as pa

    _lut8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    a16 = np.arange(65536, dtype=np.uint32)
    _lut16 = (_lut8[a16 & 255] + _lut8[a16 >> 8]).astype(np.uint8)
    CHUNK_SLOTS = 4_000_000

    for batch in it:
        id_type = batch.schema.field("members").type.value_type.field(
            "doc_id"
        ).type
        out_a, out_b, out_h = [], [], []
        for members in batch.column("members").to_pylist():
            live = [m for m in members if m["simhash"] is not None]
            n = len(live)
            if n < 2:
                continue
            ids_np = np.array([m["doc_id"] for m in live])
            fps = np.array([m["simhash"] for m in live], dtype=np.uint32)
            rows_per_chunk = max(CHUNK_SLOTS // n, 1)
            for lo in range(0, n - 1, rows_per_chunk):
                hi = min(lo + rows_per_chunk, n - 1)
                x = fps[lo:hi, None] ^ fps[None, :]
                hm = _lut16[x & np.uint32(0xFFFF)] + _lut16[
                    x >> np.uint32(16)
                ]
                # upper triangle only: column index > global row index
                mask = hm <= SIMHASH_MAX_HAMMING
                cols = np.arange(n)[None, :]
                rows = np.arange(lo, hi)[:, None]
                mask &= cols > rows
                ri, ci = np.nonzero(mask)
                if len(ri):
                    out_a.extend(ids_np[ri + lo].tolist())
                    out_b.extend(ids_np[ci].tolist())
                    out_h.extend(hm[ri, ci].tolist())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_a, type=id_type),
                pa.array(out_b, type=id_type),
                pa.array(out_h, type=pa.int32()),
            ],
            ["doc_a", "doc_b", "hamming"],
        )


def _shingle_h60_batches(it):
    """Exploded (doc_id, n, sh_h) rows — the C-regex twin of
    ``explode(array_distinct(_SPARK_SHINGLES))`` + ``_spark_hash60``:
    per doc, one row per DISTINCT shingle carrying the distinct count
    and the shingle's 60-bit md5 int (first 15 hex chars == first 8
    digest bytes >> 4).  Null text explodes to nothing, matching
    ``explode(NULL)``."""
    from hashlib import md5

    import pyarrow as pa

    for batch in it:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        id_type = batch.schema.field("doc_id").type
        out_ids, out_n, out_h = [], [], []
        words_per_doc, _c, _b = _tokenize_batch(texts)
        for did, ws in zip(doc_ids, words_per_doc):
            if ws is None:
                continue
            sh = list(dict.fromkeys(_shingles_for(ws)))
            n = len(sh)
            for s in sh:
                out_ids.append(did)
                out_n.append(n)
                out_h.append(
                    int.from_bytes(md5(s.encode()).digest()[:8], "big") >> 4
                )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_ids, type=id_type),
                pa.array(out_n, type=pa.int32()),
                pa.array(out_h, type=pa.int64()),
            ],
            ["doc_id", "n", "sh_h"],
        )


def _pair_hash_prefilter(spark, pairs, hs_map, keep):
    """Arrow prefilter over candidate (doc_a, doc_b) rows: intersect the
    two docs' sorted 64-bit shingle-hash sets from a broadcast side
    table and keep rows passing ``keep(c, na, nb)`` — a conservative
    (collision-slack) form of the exact string-set condition, so the
    tiny survivor set can be string-verified without ever shuffling
    per-pair arrays (guide §8: decisions ride keys).

    ``keep`` must be numpy-elementwise and MONOTONE NONDECREASING in
    ``c`` (both rules are linear in c): pairs for which ``keep(0, na,
    nb)`` already holds skip the intersect entirely, and the rest are
    counted in ONE vectorized sort/bincount sweep per batch — no
    per-pair Python loop (the intersect1d-per-pair form paid ~2 us of
    numpy fixed cost per candidate: ~10.7M candidates at 10x-sf0.1
    made the prefilter the whale of containment_pairs).  The sweep
    sorts a SINGLE int64 composite key (pair_index << 32 | high 32
    bits of the hash): truncating to 32 bits stays conservative —
    collisions (in-doc or cross-doc) can only INFLATE the count, and
    an inflated c can only KEEP more pairs for the exact string verify
    downstream, never drop one that qualifies — while halving the sort
    bandwidth of the ~130-element-per-pair intersect mass.

    The verdict stays MEMOIZED per pair within each task: candidate
    streams arrive pre-``distinct`` (so the dedup shuffle only carries
    survivors), and near-identical mega-docs can emit the same pair
    once per shared prefix shingle — tens of thousands of duplicates
    each (the skew soak caught exactly this class: 10 co-identical
    50k-shingle docs spun one task for 20+ minutes before the memo)."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    bc = spark.sparkContext.broadcast(hs_map)
    dtypes = dict(pairs.dtypes)
    schema = f"doc_a {dtypes['doc_a']}, doc_b {dtypes['doc_b']}"

    def batches(it):
        import numpy as np
        import pyarrow as pa

        ids_arr, offs, flat = bc.value
        sizes = offs[1:] - offs[:-1]
        m_ids = len(ids_arr)
        int_ids = ids_arr.dtype.kind in "iu"
        # high 32 bits, per-doc sortedness preserved (monotone map)
        flat32 = flat >> np.uint64(32)
        pair_memo: dict = {}

        def col_to_np(col):
            if int_ids:
                return col.to_numpy(zero_copy_only=False)
            return np.asarray(col.to_pylist(), dtype=ids_arr.dtype)

        def idx_of(vals):
            if m_ids == 0:
                raise KeyError("candidate doc_id missing from hash map")
            ix = np.searchsorted(ids_arr, vals)
            bad = (ix >= m_ids) | (ids_arr[np.minimum(ix, m_ids - 1)] != vals)
            if bad.any():
                raise KeyError("candidate doc_id missing from hash map")
            return ix

        def gather_keys(idx):
            """(pair_index << 32 | h32) composite keys for the docs at
            ``idx`` — one sorted-once int64 stream per side."""
            lens = sizes[idx]
            total = int(lens.sum())
            rep = np.repeat(
                np.arange(len(idx), dtype=np.uint64) << np.uint64(32), lens
            )
            if total == 0:
                return rep
            base = np.repeat(offs[idx] - (np.cumsum(lens) - lens), lens)
            pos = np.arange(total, dtype=np.int64) + base
            return rep | flat32[pos]

        for batch in it:
            if batch.num_rows == 0:
                yield batch
                continue
            ia = idx_of(col_to_np(batch.column("doc_a")))
            ib = idx_of(col_to_np(batch.column("doc_b")))
            pk = ia * m_ids + ib
            uniq, inv = np.unique(pk, return_inverse=True)
            verdicts = np.empty(len(uniq), dtype=bool)
            unknown = []
            for j, key in enumerate(uniq.tolist()):
                v = pair_memo.get(key)
                if v is None:
                    unknown.append(j)
                else:
                    verdicts[j] = v
            if unknown:
                up = np.asarray(unknown, dtype=np.int64)
                ua, ub = uniq[up] // m_ids, uniq[up] % m_ids
                na, nb = sizes[ua], sizes[ub]
                cvec = np.zeros(len(up), dtype=np.int64)
                need = ~keep(cvec, na, nb)  # monotone: keep(0,..) => keep
                if need.any():
                    ka, kb = ua[need], ub[need]
                    # chunk by gathered-element budget: a batch full of
                    # distinct mega-doc pairs must not materialize an
                    # unbounded (pairs x shingles) buffer
                    mass = np.cumsum(sizes[ka] + sizes[kb])
                    counts = np.empty(len(ka), dtype=np.int64)
                    lo = 0
                    while lo < len(ka):
                        hi = int(
                            np.searchsorted(
                                mass, mass[lo] + 8_000_000, side="left"
                            )
                        )
                        hi = max(hi, lo + 1)
                        keys = np.concatenate(
                            [
                                gather_keys(ka[lo:hi]),
                                gather_keys(kb[lo:hi]),
                            ]
                        )
                        keys.sort()
                        dup = keys[1:] == keys[:-1]
                        counts[lo:hi] = np.bincount(
                            (keys[1:][dup] >> np.uint64(32)).astype(
                                np.int64
                            ),
                            minlength=hi - lo,
                        )
                        lo = hi
                    cvec[need] = counts
                kv = keep(cvec, na, nb)
                verdicts[up] = kv
                for key, v in zip(uniq[up].tolist(), kv.tolist()):
                    pair_memo[key] = v
            yield batch.filter(pa.array(verdicts[inv]))

    return pairs.mapInArrow(batches, schema)


def _shingle_hash_map(spark, d):
    """(sorted doc_id vector, offsets, flat value vector) — every doc's
    sorted distinct 64-bit shingle-hash set, collected once and packed
    COLUMNAR for the broadcast: numpy buffers pickle as raw bytes, so
    the per-worker unpickle is C-speed instead of rebuilding a
    corpus-sized dict, and lookups are searchsorted.  ~8 B x
    shingles/doc x docs — broadcast-class to ~1e7 docs; band the
    candidate join past that."""
    import numpy as np

    id_t = dict(d.dtypes)["doc_id"]
    tbl = d.mapInArrow(
        _shingle_hash_batches, f"doc_id {id_t}, hs binary"
    ).toArrow()
    packed = sorted(
        (i, b)
        for i, b in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("hs").to_pylist()
        )
        if b is not None
    )
    ids_arr = np.array([i for i, _ in packed])
    lens = np.fromiter(
        (len(b) // 8 for _, b in packed), dtype=np.int64, count=len(packed)
    )
    offs = np.zeros(len(packed) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.frombuffer(b"".join(b for _, b in packed), dtype=np.uint64)
    return ids_arr, offs, flat


def _shingle_batches(it):
    """Distinct 3-word shingle STRING arrays per doc — the C-regex twin
    of ``array_distinct(_SPARK_SHINGLES)`` (mllib_minhash_pairs needs
    the strings themselves for HashingTF + the exact verify, not their
    hashes).  dict.fromkeys preserves first occurrence exactly like
    array_distinct; null text yields a null array."""
    import pyarrow as pa

    for batch in it:
        texts = batch.column("text").to_pylist()
        words_per_doc, _c, _b = _tokenize_batch(texts)
        out = [
            None if ws is None else list(dict.fromkeys(_shingles_for(ws)))
            for ws in words_per_doc
        ]
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pa.array(out, type=pa.list_(pa.string()))],
            ["doc_id", "shingles"],
        )


def _minhash_batches(it):
    import numpy as np
    import pyarrow as pa

    a = np.array(_MINHASH_A, dtype=np.uint64)
    b = np.array(_MINHASH_B, dtype=np.uint64)
    p = np.uint64(_MINHASH_P)
    for batch in it:
        texts = batch.column("text").to_pylist()
        words_per_doc, _counts, _bounds = _tokenize_batch(texts)
        shingles_per_doc = [
            None if ws is None else _shingles_for(ws) for ws in words_per_doc
        ]
        n_sh = np.fromiter(
            (0 if s is None else len(s) for s in shingles_per_doc),
            dtype=np.int64,
            count=len(texts),
        )
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(n_sh, out=starts[1:])
        h = _md5_u64(s for sh in shingles_per_doc if sh for s in sh)
        live = n_sh > 0  # only null-text docs have no shingles
        cols = []
        for k in range(N_PERMS):
            perm = (a[k] * h + b[k]) % p
            mins = np.zeros(len(texts), dtype=np.int64)
            if len(h):
                red = np.minimum.reduceat(perm, starts[:-1][live])
                mins[live] = red.astype(np.int64)
            if live.all():
                cols.append(pa.array(mins, type=pa.int64()))
            else:
                cols.append(
                    pa.array(
                        [int(v) if ok else None for v, ok in zip(mins, live)],
                        type=pa.int64(),
                    )
                )
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id")] + cols,
            ["doc_id"] + [f"mh{k}" for k in range(N_PERMS)],
        )


def minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 universal-hash permutations of a single
    portable 32-bit shingle hash) over 3-word shingles.

    Round-7 shape (guide §4.2): one zero-shuffle mapInArrow stage —
    C-regex tokenization, hashlib md5, numpy ``minimum.reduceat`` per
    permutation.  Values are bit-identical to the oracle's array form
    (integer arithmetic over the same md5 prefix); 5.8 s -> ~1 s at
    sf1.0/local[32].  Only (doc_id, text) crosses the Python boundary
    (guide §4.1: project before the opaque stage)."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    schema = f"doc_id {id_t}, " + ", ".join(f"mh{k} bigint" for k in range(N_PERMS))
    return d.mapInArrow(_minhash_batches, schema)


def _minhash_sql() -> str:
    mins = ",\n       ".join(
        f"list_min(list_transform(hashes, h ->"
        f" ({_MINHASH_A[k]} * h + {_MINHASH_B[k]}) % {_MINHASH_P})) AS mh{k}"
        for k in range(N_PERMS)
    )
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
s AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM w),
h AS (SELECT doc_id, list_transform(shingles, s -> {_duck_hash('s')}) AS hashes FROM s)
SELECT doc_id,
       {mins}
FROM h
"""


# in-bucket pair expansion is O(|bucket|^2): one degenerate bucket
# (boilerplate/empty pages all hashing together) is a quadratic bomb at
# 10^12 docs.  Buckets above the cap are DROPPED from pair generation —
# members of a degenerate bucket are near-identical boilerplate better
# handled by exact dedup — and the drop is never silent:
# ``lsh_bucket_stats`` is the audit query reporting kept/dropped bucket
# and pair counts, itself DuckDB-oracled.
MAX_LSH_BUCKET = 64


def _banded(spark, sf_dir):
    """(doc_id, band, bucket) rows — shared by pairs + stats."""
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(N_BANDS):
        cols = [f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("bucket"),
            )
        )
    return sig.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )


_LSH_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band,"
    f" md5(concat_ws('_', mh{b * BAND_SIZE}, mh{b * BAND_SIZE + 1})) AS bucket FROM sig"
    for b in range(N_BANDS)
)


def lsh_candidate_pairs(spark, sf_dir):
    """LSH banding: docs sharing any (band, bucket) become candidate
    pairs — the scale path that avoids the O(n^2) similarity join.

    Single-pass shape: one shuffle on (band, bucket) + in-bucket pair
    expansion, instead of a self-join (which would recompute the
    MinHash pipeline once per join side).  Bucket keys are uniform by
    construction so the shuffle has no skew; the ``MAX_LSH_BUCKET`` cap
    bounds the quadratic in-bucket expansion (audited, not silent —
    see ``lsh_bucket_stats``).

    The cap is applied BEFORE any member list is materialized: a
    window ``count`` over (band, bucket) sizes each bucket first (the
    window's external sorter spills, it never holds a bucket in an agg
    buffer), over-cap rows are filtered out, and only then does
    ``collect_set`` run — so a degenerate 10^8-member boilerplate
    bucket costs a spill-safe sort, not an executor OOM.  The window
    and the groupBy share the (band, bucket) hash partitioning, so
    this is still exactly one Exchange (pinned in tests/test_plans.py).
    """
    banded = _banded(spark, sf_dir)
    sized = banded.withColumn(
        "n", F.count("*").over(Window.partitionBy("band", "bucket"))
    )
    buckets = (
        sized.filter((F.col("n") > 1) & (F.col("n") <= MAX_LSH_BUCKET))
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)), y ->"
                " struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def _lsh_sql() -> str:
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS ({_LSH_BANDS_SQL}),
ok AS (
  SELECT band, bucket FROM bands GROUP BY band, bucket
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND {MAX_LSH_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band, bucket) JOIN ok USING (band, bucket)
WHERE a.doc_id < b.doc_id
"""


def lsh_bucket_stats(spark, sf_dir):
    """Audit for the ``MAX_LSH_BUCKET`` cap ("no silent caps"): per
    band, how many buckets/pairs were kept vs dropped.  At 10^12 docs
    this is the dashboard row an operator watches — a growing
    ``dropped_pairs`` means boilerplate is flooding a bucket and exact
    dedup should run first."""
    banded = _banded(spark, sf_dir)
    sizes = banded.groupBy("band", "bucket").agg(
        F.countDistinct("doc_id").alias("n")
    )
    pair_count = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    kept = (F.col("n") > 1) & (F.col("n") <= MAX_LSH_BUCKET)
    return (
        sizes.groupBy("band")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_buckets"),
            F.sum(F.when(F.col("n") > MAX_LSH_BUCKET, 1).otherwise(0))
            .cast("long")
            .alias("dropped_buckets"),
            F.sum(F.when(kept, pair_count).otherwise(0)).cast("long").alias("kept_pairs"),
            F.sum(F.when(F.col("n") > MAX_LSH_BUCKET, pair_count).otherwise(0))
            .cast("long")
            .alias("dropped_pairs"),
            F.max("n").cast("long").alias("max_bucket"),
        )
        .orderBy("band")
    )


def _lsh_stats_sql() -> str:
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS ({_LSH_BANDS_SQL}),
sizes AS (
  SELECT band, bucket, count(DISTINCT doc_id) AS n
  FROM bands GROUP BY band, bucket
)
SELECT band,
       CAST(sum(CASE WHEN n BETWEEN 2 AND {MAX_LSH_BUCKET} THEN 1 ELSE 0 END) AS BIGINT) AS kept_buckets,
       CAST(sum(CASE WHEN n > {MAX_LSH_BUCKET} THEN 1 ELSE 0 END) AS BIGINT) AS dropped_buckets,
       CAST(sum(CASE WHEN n BETWEEN 2 AND {MAX_LSH_BUCKET} THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) AS kept_pairs,
       CAST(sum(CASE WHEN n > {MAX_LSH_BUCKET} THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) AS dropped_pairs,
       CAST(max(n) AS BIGINT) AS max_bucket
FROM sizes
GROUP BY band
ORDER BY band
"""


def ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard — the VERIFY stage: computed only for LSH
    candidate pairs, never for the whole corpus.

    The pre-round-2 shape self-joined the full shingle table, which is
    a skew bomb at scale (stopword shingles like "of the and" are hot
    keys shared by millions of documents).  Now the candidate pairs
    from ``lsh_candidate_pairs`` (already bucket-capped) are joined —
    on the uniformly-distributed ``doc_id`` — to a per-doc distinct
    shingle-set table, and Jaccard is a per-pair array_intersect:
    work is O(|candidates| * |shingles per doc|), no shingle-keyed
    shuffle exists anywhere.  r07: the shingle-set table comes from the
    same C-regex Arrow kernel as mllib/containment (the JVM regex +
    array_distinct subtree ran once per join side)."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    sets = d.mapInArrow(
        _shingle_batches, f"doc_id {id_t}, shingles array<string>"
    )
    cand = lsh_candidate_pairs(spark, sf_dir)
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")),
            "doc_b",
        )
        .withColumn("common", F.size(F.array_intersect("sa", "sb")))
        # jaccard >= 0.2  <=>  6*common >= na+nb (exact integers, no
        # engine-divergent rounding in row membership); floor-based
        # rounding is output-only (text.py::_r)
        .filter(
            6 * F.col("common") >= F.size("sa") + F.size("sb")
        )
        .withColumn(
            "jaccard",
            F.floor(
                F.col("common")
                / (F.size("sa") + F.size("sb") - F.col("common"))
                * 10000
                + 0.5
            )
            / 10000,
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def _jaccard_sql() -> str:
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS ({_LSH_BANDS_SQL}),
ok AS (
  SELECT band, bucket FROM bands GROUP BY band, bucket
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND {MAX_LSH_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, bucket) JOIN ok USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
sets AS (SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS shingles FROM w),
j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS common,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM cand
  JOIN sets sa ON sa.doc_id = doc_a
  JOIN sets sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b,
       floor(common / (na + nb - common) * 10000 + 0.5) / 10000 AS jaccard
FROM j
WHERE 6 * common >= na + nb
"""


N_SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
N_SIMHASH_BANDS = N_SIMHASH_BITS // SIMHASH_BAND_BITS  # 4 bands
SIMHASH_MAX_HAMMING = N_SIMHASH_BANDS - 1  # pigeonhole-exact radius

# loud-failure bound for a single Hamming band bucket, derived from the
# in-bucket PAIR expansion the bucket would cost (n*(n-1)/2), not raw
# member count (VERDICT r03: a 100k-member bucket is far under any sane
# member cap yet already expands 5x10^9 pairs).  A bucket over the
# budget means the corpus needs exact dedup first (or wider bands) —
# the job fails with that message instead of OOMing an executor.
SIMHASH_BUCKET_PAIR_BUDGET = 10_000_000


def _members_for_pair_budget(budget: int) -> int:
    """Largest bucket size whose pair expansion n*(n-1)/2 fits budget."""
    import math

    return int((1 + math.sqrt(1 + 8 * budget)) / 2)


SIMHASH_GUARD_MAX = _members_for_pair_budget(SIMHASH_BUCKET_PAIR_BUDGET)  # ~4472


def simhash(spark, sf_dir):
    """SimHash: per-word portable hash, signed bit-count vote per bit,
    packed into a 32-bit fingerprint.

    Round-7 shape (guide §4.2): one zero-shuffle mapInArrow stage —
    C-regex tokenization, hashlib md5, 32 numpy cumsum-segment vote
    reductions over the batch's word hashes.  Values are identical to
    the oracle's array form: vote_b set <=> 2 * ones_b > total, with
    duplicate-preserving counts either way, and the hash is the same
    md5 prefix read as a big-endian 32-bit int.  The previous
    array-native ``aggregate()`` HOF measured 8.3 s at sf1.0/local[32]
    (higher-order functions are CodegenFallback: interpreted md5+conv
    plus a fresh 33-element array per word); an explode+codegen
    HashAggregate rewrite reached 5.1 s; this form ~1 s.  Only
    (doc_id, text) crosses the Python boundary."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    return d.mapInArrow(_simhash_batches, f"doc_id {id_t}, simhash bigint")


def _simhash_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > len(hs)"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(N_SIMHASH_BITS)
    )
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
h AS (SELECT doc_id, list_transform(words, w -> {_duck_hash('w')}) AS hs FROM w)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM h
"""


def simhash_neardup_pairs(spark, sf_dir):
    """SimHash consumer: near-dup pairs at Hamming distance <=
    ``SIMHASH_MAX_HAMMING``, found by Hamming-band LSH.

    The 32-bit fingerprint is split into 4 disjoint 8-bit bands and
    docs are equi-joined on (band, band value) — by pigeonhole, any
    pair within Hamming distance 3 agrees exactly on at least one of
    the 4 bands, so the banding is EXACT (recall 1.0) for that radius;
    the per-candidate ``bit_count(a ^ b)`` filter removes the false
    positives.  Same single-shuffle shape as ``lsh_candidate_pairs``;
    at 10^12 docs you widen to a 64-bit fingerprint with 16-bit bands
    so each band has 65k buckets.

    NO bucket cap is allowed here — dropping a bucket would break the
    pigeonhole recall-1.0 guarantee — so instead of silently OOMing on
    a degenerate bucket, a window ``count`` sizes every bucket BEFORE
    any member list is collected and ``assert_true`` fails the job
    LOUDLY at ``SIMHASH_GUARD_MAX`` with the remedy in the message
    (run exact dedup first / widen the bands).  The guard sits in a
    ``filter`` so Catalyst cannot prune it away."""
    sig = simhash(spark, sf_dir)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
            .bitwiseAND((1 << SIMHASH_BAND_BITS) - 1)
            .alias("value"),
        )
        for b in range(N_SIMHASH_BANDS)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.value")
    sized = banded.withColumn(
        "n", F.count("*").over(Window.partitionBy("band", "value"))
    )
    guarded = sized.filter(
        F.assert_true(
            F.col("n") <= SIMHASH_GUARD_MAX,
            F.concat(
                F.lit("simhash Hamming band (band="),
                F.col("band").cast("string"),
                F.lit(", value="),
                F.col("value").cast("string"),
                F.lit(f") holds > {SIMHASH_GUARD_MAX} docs (pair budget"
                      f" {SIMHASH_BUCKET_PAIR_BUDGET} pairs/bucket); a cap"
                      " would break the pigeonhole recall guarantee — run"
                      " exact dedup upstream or widen the fingerprint/bands"
                      " (simhash_wide_neardup_pairs; see simhash_band_stats)"),
            ),
        ).isNull()
    )
    buckets = (
        guarded.filter(F.col("n") > 1)
        .groupBy("band", "value")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("doc_id", "simhash"))
            ).alias("members")
        )
    )
    # r07 (guide §4.2): per-bucket pair expansion + Hamming filter in
    # ONE Arrow kernel.  The lambda form materialized every in-bucket
    # pair as an interpreted struct (~19M at 50k docs — avg bucket is
    # n/2^band_bits) and ran DISTINCT on all of them before the
    # hamming <= 3 filter; the kernel XOR/popcounts the bucket matrix
    # in numpy and emits only qualifying pairs, so the dedup shuffle
    # carries the output-sized survivor set.  36 -> ~3 s at 50k docs.
    id_t = dict(sig.dtypes)["doc_id"]
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    pairs = buckets.select("members").mapInArrow(
        _bucket_hamming_batches, f"doc_a {id_t}, doc_b {id_t}, hamming int"
    )
    return pairs.distinct()


def _simhash_neardup_sql() -> str:
    # the banding is exact for hamming <= 3, so the oracle is the
    # direct all-pairs definition (fine at sf0.01; the Spark side is
    # the scale path)
    return f"""
WITH s AS ({_simhash_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) <= {SIMHASH_MAX_HAMMING}
"""


# near-dup planting: the driver's synthetic embeddings have no pair
# above the 0.5 cosine threshold, so round 2's green oracle verified
# nothing (0 rows both engines).  Both engines now append PLANTED
# near-duplicates — the first N_PLANTED_NEARDUP vectors, copied with a
# +0.05 perturbation on dimension 0, round-tripped through FLOAT so
# the bits are identical in Spark and DuckDB — which guarantees the
# oracle compares real >0.5-cosine pairs.
N_PLANTED_NEARDUP = 8
_PLANT_ID_OFFSET = 1_000_000
_PLANT_PERTURB = "0.05"
NEARDUP_MIN_COSINE = 0.5


def _with_planted(e):
    """embeddings ∪ planted near-duplicates (Spark side)."""
    planted = e.filter(F.col("vec_id") < N_PLANTED_NEARDUP).select(
        (F.col("vec_id") + F.lit(_PLANT_ID_OFFSET)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(CASE WHEN i = 0"
            f" THEN CAST(x AS DOUBLE) + {_PLANT_PERTURB}D"
            " ELSE CAST(x AS DOUBLE) END AS FLOAT))"
        ).alias("embedding"),
        F.col("label"),
    )
    return e.select("vec_id", "embedding", "label").unionByName(planted)


def _hyperplane_sig_batches(planes, keep_embedding: bool = False):
    """mapInArrow factory: per-vector hyperplane signature with the
    EXACT sequential-fold dot of ``_sig_expr_spark`` (dimension-major
    accumulation; strict > 0 per plane; null embedding -> null sig).
    ``keep_embedding`` passes the vector through for consumers that
    rerank candidates (the hyperplane ANN queries)."""

    def batches(it):
        import numpy as np
        import pyarrow as pa

        pm = np.array(planes, dtype=np.float64)
        n_planes, dim = pm.shape
        for batch in it:
            col = batch.column("embedding")
            n = len(col)
            if n == 0:
                continue
            lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
            if col.null_count == 0 and (lens == dim).all():
                X = (
                    col.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, dim)
                )
                sig = np.zeros(n, dtype=np.int64)
                for b in range(n_planes):
                    acc = np.zeros(n)
                    for i in range(dim):
                        acc = acc + X[:, i] * pm[b, i]
                    sig |= (acc > 0).astype(np.int64) << b
                sig_arr = pa.array(sig, type=pa.int64())
            else:
                vals = []
                for row in col.to_pylist():
                    if row is None:
                        vals.append(None)
                        continue
                    s = 0
                    for b in range(n_planes):
                        acc = 0.0
                        for x, h in zip(row, pm[b]):
                            acc = acc + float(x) * h
                        if acc > 0:
                            s |= 1 << b
                    vals.append(s)
                sig_arr = pa.array(vals, type=pa.int64())
            if keep_embedding:
                yield pa.RecordBatch.from_arrays(
                    [batch.column("vec_id"), batch.column("label"), col, sig_arr],
                    ["vec_id", "label", "embedding", "sig"],
                )
            else:
                yield pa.RecordBatch.from_arrays(
                    [batch.column("vec_id"), sig_arr], ["vec_id", "sig"]
                )

    return batches


def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup, LABEL-FREE: blocking is the 8-bit
    random-hyperplane signature (the same fixed hyperplanes as
    ``ann_hyperplane_topk``) — real corpora carry no labels, and two
    near-identical vectors land in the same signature bucket, so the
    quadratic pair expansion happens only inside a bucket (1/256 of
    the corpus on average; widen the signature at 10^9+ vectors).

    r07 shape (guide §4.2/§8): both the signature and the per-pair
    cosine verify ran as interpreted higher-order-function folds — the
    in-bucket pair mass is n^2/256 (1.5M pairs at 20k vectors), so the
    verify paid ~1.5M interpreted 64-dim folds (32 s).  Session 3: the
    embeddings are collected ONCE (the verify already needed the full
    float table on the driver); signatures come from the same kernel
    code run driver-side over the collected batches (bit-identical),
    so the self-join runs over the tiny parallelized (vec_id, sig)
    table instead of re-running the sig kernel once per join side, and
    the verify kernel gathers from the packed broadcast matrix —
    32 -> ~2 s, bit-identical membership and values."""
    from .similarity import HYPERPLANES

    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = _with_planted(read(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    tbl = _collect_embeddings(e)
    sig = spark.createDataFrame(
        _driver_sig_rows(tbl, HYPERPLANES), "vec_id bigint, sig bigint"
    )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(b, "sig")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
    )
    return _cosine_pair_verify(spark, _packed_embeddings(tbl), pairs)


def _collect_embeddings(e):
    """ONE job: the (planted) embedding table collected as an Arrow
    table — shared by the driver-side signature fold and the verify
    broadcast, so the near-dup operators scan the embeddings exactly
    once (broadcast-class: dim x 4 B per vector; the embeddings table
    is the SMALL side of this design at any corpus scale where
    all-pairs banding is viable)."""
    return e.toArrow().combine_chunks()


def _packed_embeddings(tbl):
    """(sorted vec_id vector, float64 matrix) from the collected
    table; null embeddings are excluded (their sig is null, so they
    can never appear in a candidate pair)."""
    import numpy as np

    packed = sorted(
        (i, v)
        for i, v in zip(
            tbl.column("vec_id").to_pylist(),
            tbl.column("embedding").to_pylist(),
        )
        if v is not None
    )
    ids_arr = np.array([i for i, _ in packed], dtype=np.int64)
    mat = np.array([v for _, v in packed], dtype=np.float64)
    return ids_arr, mat


def _driver_sig_rows(tbl, planes):
    """(vec_id, sig) rows computed by running the SAME
    ``_hyperplane_sig_batches`` kernel code over the collected Arrow
    batches on the driver — bit-identical signatures by construction.
    Rationale (r07 session 3): the sig kernel subtree re-ran once per
    self-join side (exchange reuse never fires across mapInArrow
    subtrees), and the verify stage already collects this exact table,
    so one driver fold over ~20k vectors replaces two distributed
    kernel passes.  Null-sig rows are dropped — a null key joins
    nothing in an equi-join, so the candidate set is unchanged."""
    out = []
    for ob in _hyperplane_sig_batches(planes)(tbl.to_batches()):
        out.extend(
            (i, s)
            for i, s in zip(
                ob.column("vec_id").to_pylist(), ob.column("sig").to_pylist()
            )
            if s is not None
        )
    return out


def _cosine_pair_verify(spark, packed, pairs):
    """Exact near-dup verify for candidate (vec_a, vec_b) rows: look
    both vectors up in the broadcast float table ``packed`` (from
    ``_packed_embeddings``) and reproduce the JVM fold arithmetic
    bit-for-bit: dimension-major accumulation == the sequential
    ``aggregate(zip_with(...))`` fold, ``>= NEARDUP_MIN_COSINE`` on
    the raw double, floor-rounded output only.

    r07 session 3: the broadcast is a (sorted id vector, float64
    matrix) pair — numpy buffers unpickle at C-speed (the per-worker
    dict rebuild of 20k arrays cost ~0.5 s x workers), and each batch
    gathers its rows with two fancy-index ops instead of a Python
    dict-lookup-and-stack loop per pair.  The accumulation lines are
    UNCHANGED (same expressions, same order -> identical IEEE
    results)."""
    bc = spark.sparkContext.broadcast(packed)

    def verify(it):
        import numpy as np
        import pyarrow as pa

        ids_s, M = bc.value
        n_ids = len(ids_s)

        def idx(col):
            v = col.to_numpy(zero_copy_only=False)
            if n_ids == 0:
                raise KeyError("pair vec_id missing from embedding table")
            ix = np.searchsorted(ids_s, v)
            bad = (ix >= n_ids) | (ids_s[np.minimum(ix, n_ids - 1)] != v)
            if bad.any():
                raise KeyError("pair vec_id missing from embedding table")
            return ix

        for batch in it:
            if batch.num_rows == 0:
                continue
            A = M[idx(batch.column("vec_a"))]
            B = M[idx(batch.column("vec_b"))]
            n, dim = A.shape
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(dim):
                dot = dot + A[:, i] * B[:, i]
                na = na + A[:, i] * A[:, i]
                nb = nb + B[:, i] * B[:, i]
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            keep = cos >= NEARDUP_MIN_COSINE
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_a").filter(pa.array(keep)),
                    batch.column("vec_b").filter(pa.array(keep)),
                    pa.array(
                        np.floor(cos[keep] * 10000 + 0.5) / 10000,
                        type=pa.float64(),
                    ),
                ],
                ["vec_a", "vec_b", "cosine"],
            )

    return pairs.mapInArrow(
        verify, "vec_a bigint, vec_b bigint, cosine double"
    )


def _neardup_sql() -> str:
    from .similarity import _sig_expr_duck

    return f"""
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
planted AS (
  SELECT vec_id + {_PLANT_ID_OFFSET} AS vec_id, label,
         CAST(CAST(list_transform(range(1, len(emb) + 1),
                i -> CASE WHEN i = 1 THEN emb[i] + {_PLANT_PERTURB} ELSE emb[i] END)
              AS FLOAT[]) AS DOUBLE[]) AS emb
  FROM base WHERE vec_id < {N_PLANTED_NEARDUP}
),
e AS (
  SELECT vec_id, emb, {_sig_expr_duck('emb')} AS sig
  FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor(list_reduce(list_transform(range(1, len(a.emb) + 1),
                                        i -> a.emb[i] * b.emb[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(a.emb, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(b.emb, x -> x * x), (x, y) -> x + y)))
             * 10000 + 0.5) / 10000
         AS cosine
FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE list_reduce(list_transform(range(1, len(a.emb) + 1),
                                 i -> a.emb[i] * b.emb[i]), (x, y) -> x + y)
      / (sqrt(list_reduce(list_transform(a.emb, x -> x * x), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform(b.emb, x -> x * x), (x, y) -> x + y)))
      >= {NEARDUP_MIN_COSINE}
"""


NEARDUP_SQL = _neardup_sql()


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "minhash_signatures": (minhash_signatures, _minhash_sql()),
    "lsh_candidate_pairs": (lsh_candidate_pairs, _lsh_sql()),
    "lsh_bucket_stats": (lsh_bucket_stats, _lsh_stats_sql()),
    "ngram_jaccard_pairs": (ngram_jaccard_pairs, _jaccard_sql()),
    "simhash": (simhash, _simhash_sql()),
    "simhash_neardup_pairs": (simhash_neardup_pairs, _simhash_neardup_sql()),
    "embedding_neardup_pairs": (embedding_neardup_pairs, NEARDUP_SQL),
}


MLLIB_VERIFY_JACCARD = 0.5


def mllib_minhash_pairs(spark, sf_dir):
    """Spark-ML LSH candidate stage + exact verify: HashingTF shingle
    vectors -> MinHashLSH.approxSimilarityJoin (the built-in
    distributed LSH, the 10^9+-docs scale path), then each candidate
    pair is verified with the EXACT portable shingle-set Jaccard and
    kept at >= 0.5.

    The verify stage is what makes a value oracle possible: the ML hash
    family isn't DuckDB-expressible, but the verified OUTPUT is — the
    corpus has no >=0.5 pair the LSH misses (24 pairs at ~1.0, one at
    0.9, next cluster at ~0.1; a miss at j>=0.5 has probability
    (1-j)^numHashTables <= 0.5^8 per pair, and the fixed seed makes the
    run deterministic), so the result equals the closed-form all-pairs
    SQL.

    r07 shape (guide §8 / §2.3): the hash family stays Spark-ML
    (HashingTF features, MinHashLSH fit/transform, same tables+seed —
    the candidate RECALL guarantee is unchanged), but everything around
    it sheds payload:

    - the candidate join runs natively over the exploded
      (table, hashValue) keys, so the shuffle carries 24-byte rows
      instead of the shingle arrays + 2^18-dim sparse vectors
      approxSimilarityJoin ships (and the self-join's two sides
      canonicalize to ONE reused exchange);
    - the single-table-collision candidate mass is real (3.6M raw pairs
      at 50k docs — common-vocabulary corpora collide constantly), so
      the old vec_dist <= 0.7 pre-filter is replaced by an equally
      conservative one that needs no per-pair array shuffle at all: a
      mapInArrow kernel intersects each pair's sorted 64-bit
      shingle-hash sets from a BROADCAST side table (~8 B per shingle
      per doc, built by one corpus pass).  The keep condition
      ``3*c + 6 >= na + nb`` is Jaccard >= 0.5 with a 2-collision
      slack: 64-bit collisions occur with p ~ 1e-13 per pair, and a
      pair would need THREE collisions among its own shingles to be
      wrongly dropped — far below the 0.5^8 LSH miss probability the
      operator already accepts.  (The old 0.3-vector filter was itself
      not collision-free: hashed-bucket Jaccard can fall below string
      Jaccard when common shingles collide.)
    - only the handful of surviving pairs re-attach their shingle
      STRINGS (two broadcast joins against the corpus scan) for the
      exact verify that defines the output — payload moves once,
      decisions ride keys.

    Shingle strings/hashes come from the same C-regex tokenization
    kernel as minhash_signatures (bit-identical to the array form,
    oracle-pinned).  Broadcast budget: the hash side table is
    8 B x shingles/doc x docs — fine to ~1e7 docs per executor GB; past
    that, band the candidate join (lsh_candidate_pairs' cap machinery)
    before prefiltering.  89 -> ~12 s at 50k docs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    shingled = d.mapInArrow(
        _shingle_batches, f"doc_id {id_t}, shingles array<string>"
    ).filter(
        "size(shingles) > 0 AND (size(shingles) > 1"
        " OR element_at(shingles, 1) <> '')"
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    exploded = (
        model.transform(feats)
        .select("doc_id", F.posexplode("hashes").alias("entry", "hv"))
        .select("doc_id", "entry", vector_to_array("hv")[0].alias("h"))
    )
    # NOTE (r07 session 3, measured): do NOT replace this self-join
    # with a collected local signature table — the planner-inserted
    # ENSURE_REQUIREMENTS exchanges of a self-join DO get reused (the
    # exploded subtree computes once), and local tables additionally
    # rob the downstream prefilter of its (entry, h) partitioning
    # (11.3 s vs 5.2 s end to end).  Only user repartition() exchanges
    # fail to reuse across mapInArrow subtrees.
    a, b = exploded.alias("a"), exploded.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.entry") == F.col("b.entry"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    # Jaccard >= 0.5 with 2-collision slack (see docstring); prefilter
    # runs BEFORE the distinct, so the dedup shuffle only carries
    # survivors
    pairs = _pair_hash_prefilter(
        spark,
        raw_pairs,
        _shingle_hash_map(spark, d),
        lambda c, na, nb: 3 * c + 6 >= na + nb,
    ).distinct()
    # survivor-only verify (the containment_pairs pattern): the
    # prefiltered pair set is output-sized, so collect it (bounded by a
    # limit probe) and tokenize only surviving docs; past the bound,
    # fall back to the full-corpus broadcast-join verify
    probe = pairs.limit(CONTAINMENT_VERIFY_COLLECT_MAX + 1).collect()
    if len(probe) <= CONTAINMENT_VERIFY_COLLECT_MAX:
        pairs_use = spark.createDataFrame(
            [(r["doc_a"], r["doc_b"]) for r in probe],
            f"doc_a {id_t}, doc_b {id_t}",
        )
        ids = sorted({r["doc_a"] for r in probe} | {r["doc_b"] for r in probe})
        ids_df = spark.createDataFrame([(i,) for i in ids], f"doc_id {id_t}")
        src = d.join(F.broadcast(ids_df), "doc_id")
        verify_side = src.mapInArrow(
            _shingle_batches, f"doc_id {id_t}, shingles array<string>"
        ).filter(
            "size(shingles) > 0 AND (size(shingles) > 1"
            " OR element_at(shingles, 1) <> '')"
        )
    else:
        pairs_use, verify_side = pairs, shingled
    sa = verify_side.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")
    )
    sb = verify_side.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")
    )
    with_a = sa.join(F.broadcast(pairs_use), "doc_a")
    with_b = sb.join(F.broadcast(pairs_use), "doc_b").select("doc_a", "doc_b", "sb")
    return (
        with_a.join(F.broadcast(with_b), ["doc_a", "doc_b"])
        .withColumn("common", F.size(F.array_intersect("sa", "sb")))
        # jaccard >= 0.5  <=>  3*common >= na+nb (exact integers);
        # output rounding is the portable floor form
        .filter(3 * F.col("common") >= F.size("sa") + F.size("sb"))
        .withColumn(
            "jaccard",
            F.floor(
                F.col("common")
                / (F.size("sa") + F.size("sb") - F.col("common"))
                * 10000
                + 0.5
            )
            / 10000,
        )
        .select("doc_a", "doc_b", "jaccard")
    )


_MLLIB_SQL = f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
sets AS (
  SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS shingles FROM w
),
nonempty AS (
  SELECT doc_id, shingles FROM sets
  WHERE len(list_filter(shingles, x -> x <> '')) > 0
),
j AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.shingles, b.shingles)) AS common,
         len(a.shingles) AS na, len(b.shingles) AS nb
  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       floor(common / (na + nb - common) * 10000 + 0.5) / 10000 AS jaccard
FROM j
WHERE 3 * common >= na + nb
"""

QUERIES["mllib_minhash_pairs"] = (mllib_minhash_pairs, _MLLIB_SQL)


def simhash_band_stats(spark, sf_dir):
    """Audit for the Hamming-band join ("no silent blowups"): per band,
    bucket count, candidate-pair mass, and the largest bucket.  Unlike
    the MinHash LSH path there is NO cap here — capping would break the
    pigeonhole recall-1.0 guarantee — so this query is the dashboard
    that tells an operator when the band width must grow (at 10^12
    docs: 64-bit fingerprints, 16-bit bands) or exact dedup must run
    first (a giant bucket of identical boilerplate)."""
    sig = simhash(spark, sf_dir)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
            .bitwiseAND((1 << SIMHASH_BAND_BITS) - 1)
            .alias("value"),
        )
        for b in range(N_SIMHASH_BANDS)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.value")
    sizes = banded.groupBy("band", "value").agg(
        F.countDistinct("doc_id").alias("n")
    )
    pair_mass = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        sizes.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(F.when(F.col("n") > 1, pair_mass).otherwise(0))
            .cast("long")
            .alias("candidate_pairs"),
            F.max("n").cast("long").alias("max_bucket"),
        )
        .orderBy("band")
    )


def _simhash_band_stats_sql() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band,"
        f" (simhash >> {b * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1} AS value FROM s"
        for b in range(N_SIMHASH_BANDS)
    )
    return f"""
WITH s AS ({_simhash_sql()}),
bands AS ({bands}),
sizes AS (
  SELECT band, value, count(DISTINCT doc_id) AS n FROM bands GROUP BY band, value
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN n > 1 THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) AS candidate_pairs,
       CAST(max(n) AS BIGINT) AS max_bucket
FROM sizes
GROUP BY band
ORDER BY band
"""


QUERIES["simhash_band_stats"] = (simhash_band_stats, _simhash_band_stats_sql())


# -- log2(n)-scaled fingerprint widths (VERDICT r03 item 3) -----------------
# A FIXED bucket space is quadratic in corpus size no matter how wide:
# candidate volume ~ n_bands * n^2 / 2^band_bits.  The scale rule is
# band_bits ~ log2(n_docs): then 2^band_bits ~ n and candidate volume
# stays ~ n_bands * n (linear), pinned by
# tests/test_dedup.py::test_wide_bands_candidate_volume_scales_linearly.
# The 32-bit/8-bit operators above stay as the oracle-checked
# small-scale config; the 64-bit fingerprint + 16-bit bands below are
# the corpus-scale path (2^16 buckets/band covers n ~ 10^5 per the
# rule; beyond that, exact dedup upstream collapses the mass the
# fingerprint can't spread).
SIMHASH_WIDE_BITS = 64
SIMHASH_WIDE_BAND_BITS = 16
N_SIMHASH_WIDE_BANDS = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BAND_BITS  # 4
# pigeonhole radius is bands-1 regardless of band width
SIMHASH_WIDE_MAX_HAMMING = N_SIMHASH_WIDE_BANDS - 1


def recommended_band_bits(n_docs: int) -> int:
    """Band width keeping expected in-bucket pair volume ~linear:
    ceil(log2(n)) clamped to [8, 16] (4 bands over a 32..64-bit
    fingerprint).  Pure sizing helper — callers pick the operator
    (8-bit = ``simhash_neardup_pairs``, 16-bit = the wide variant)."""
    import math

    return max(8, min(16, math.ceil(math.log2(max(n_docs, 2)))))


def simhash_wide(spark, sf_dir):
    """64-bit SimHash as two packed 32-bit words (fp_lo = votes over
    md5 hex chars 1-8 — bit-identical to ``simhash`` —, fp_hi = votes
    over hex chars 9-16 of the SAME md5).  Two non-negative bigints
    sidestep the int64 sign bit in both engines; Hamming distance is
    bit_count(lo^lo') + bit_count(hi^hi').

    Round-7: same Arrow kernel as ``simhash`` (guide §4.2) — one md5
    per word yields both words' hash halves (digest bytes 0-3 / 4-7 ==
    hex chars 1-8 / 9-16), numpy vote reduction per half."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    return d.mapInArrow(
        _simhash_wide_batches, f"doc_id {id_t}, fp_lo bigint, fp_hi bigint"
    )


def _simhash_wide_sql() -> str:
    def terms(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN 2 * len(list_filter({col}, h -> (h >> {b}) & 1 = 1))"
            f" > len({col}) THEN {1 << b} ELSE 0 END)"
            for b in range(32)
        )

    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
m AS (SELECT doc_id, list_transform(words, w -> md5(w)) AS ms FROM w),
h AS (SELECT doc_id,
             list_transform(ms, m -> CAST(('0x' || substr(m, 1, 8)) AS BIGINT)) AS hlo,
             list_transform(ms, m -> CAST(('0x' || substr(m, 9, 8)) AS BIGINT)) AS hhi
      FROM m)
SELECT doc_id,
       CAST({terms('hlo')} AS BIGINT) AS fp_lo,
       CAST({terms('hhi')} AS BIGINT) AS fp_hi
FROM h
"""


def _wide_band_value(b: int, band_bits: int, shl, shr) -> str:
    """Band ``b``'s value (bits [b*band_bits, (b+1)*band_bits) of the
    64-bit fingerprint) from the (fp_lo, fp_hi) packed words — at most
    TWO fingerprint-column references (shift+mask, straddle-aware), so
    even a worst-case Catalyst inline of the vote aggregate duplicates
    a linear pass a bounded number of times, never per-bit.  ``shl`` /
    ``shr`` are callables rendering the engine's shift syntax."""
    start, end = b * band_bits, (b + 1) * band_bits
    mask = (1 << band_bits) - 1
    if end <= 32:
        return f"({shr('fp_lo', start)} & {mask})"
    if start >= 32:
        return f"({shr('fp_hi', start - 32)} & {mask})"
    n_lo = 32 - start  # straddling band: low bits from fp_lo, rest fp_hi
    return (
        f"(({shr('fp_lo', start)} & {(1 << n_lo) - 1})"
        f" + {shl(f'(fp_hi & {(1 << (band_bits - n_lo)) - 1})', n_lo)})"
    )


def _wide_band_value_spark(b: int, band_bits: int) -> str:
    return _wide_band_value(
        b,
        band_bits,
        lambda e, k: f"shiftleft({e}, {k})",
        lambda e, k: f"shiftright({e}, {k})",
    )


def _wide_band_value_duck(b: int, band_bits: int) -> str:
    return _wide_band_value(
        b,
        band_bits,
        lambda e, k: f"({e} << {k})",
        lambda e, k: f"({e} >> {k})",
    )


def simhash_wide_neardup_pairs(spark, sf_dir, band_bits: int = SIMHASH_WIDE_BAND_BITS):
    """The corpus-scale Hamming-band join: 64-bit fingerprint, 4 bands
    of ``band_bits`` (default 16) bits — 2^16 buckets per band instead
    of 2^8, so candidate volume on a diverse corpus is n^2/65536 per
    band and the log2(n) sizing rule (``recommended_band_bits``) keeps
    it ~linear up to n ~ 10^5 per width step.  Pigeonhole recall is
    still EXACT for Hamming distance <= 3 (any such pair agrees on one
    of the 4 disjoint bands).  Same single-shuffle + window-count +
    pair-budget ``assert_true`` guard shape as the 8-bit operator."""
    wide = simhash_wide(spark, sf_dir)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(_wide_band_value_spark(b, band_bits)).alias("value"),
        )
        for b in range(N_SIMHASH_WIDE_BANDS)
    ]
    banded = wide.select(
        "doc_id", "fp_lo", "fp_hi", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "fp_lo", "fp_hi", "bb.band", "bb.value")
    sized = banded.withColumn(
        "n", F.count("*").over(Window.partitionBy("band", "value"))
    )
    guarded = sized.filter(
        F.assert_true(
            F.col("n") <= SIMHASH_GUARD_MAX,
            F.concat(
                F.lit("simhash wide Hamming band (band="),
                F.col("band").cast("string"),
                F.lit(", value="),
                F.col("value").cast("string"),
                F.lit(f") holds > {SIMHASH_GUARD_MAX} docs (pair budget"
                      f" {SIMHASH_BUCKET_PAIR_BUDGET} pairs/bucket) — run"
                      " exact dedup upstream; the fingerprint cannot spread"
                      " identical content"),
            ),
        ).isNull()
    )
    buckets = (
        guarded.filter(F.col("n") > 1)
        .groupBy("band", "value")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("doc_id", "fp_lo", "fp_hi"))
            ).alias("members")
        )
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(members, (x, i) ->"
                " transform(slice(members, i + 2, size(members)), y ->"
                " struct(x.doc_id AS doc_a, y.doc_id AS doc_b,"
                " x.fp_lo AS lo_a, x.fp_hi AS hi_a,"
                " y.fp_lo AS lo_b, y.fp_hi AS hi_b))))"
            )
        ).alias("p")
    ).select("p.*").distinct()
    return (
        pairs.withColumn(
            "hamming",
            F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_WIDE_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_wide_neardup_sql() -> str:
    # banding is pigeonhole-exact for hamming <= 3, so the oracle is
    # the direct all-pairs definition over the 64-bit fingerprint
    ham = (
        "bit_count(CAST(xor(a.fp_lo, b.fp_lo) AS BIT))"
        " + bit_count(CAST(xor(a.fp_hi, b.fp_hi) AS BIT))"
    )
    return f"""
WITH s AS ({_simhash_wide_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {ham} <= {SIMHASH_WIDE_MAX_HAMMING}
"""


QUERIES["simhash_wide"] = (simhash_wide, _simhash_wide_sql())
QUERIES["simhash_wide_neardup_pairs"] = (
    simhash_wide_neardup_pairs,
    _simhash_wide_neardup_sql(),
)


def simhash_wide_band_stats(spark, sf_dir):
    """The wide-path twin of ``simhash_band_stats`` ("no silent
    blowups"): per 16-bit band, bucket count, candidate-pair mass and
    the largest bucket — the dashboard that shows the log2(n) width
    rule holding (compare ``candidate_pairs`` against the 8-bit audit
    on the same corpus) and tells an operator when exact dedup must
    run first."""
    wide = simhash_wide(spark, sf_dir)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(
                _wide_band_value_spark(b, SIMHASH_WIDE_BAND_BITS)
            ).alias("value"),
        )
        for b in range(N_SIMHASH_WIDE_BANDS)
    ]
    banded = wide.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.value")
    # (band, value, doc_id) is unique by construction (one fingerprint
    # row per doc), so plain count == distinct count without the
    # two-phase distinct aggregation
    sizes = banded.groupBy("band", "value").agg(F.count("*").alias("n"))
    pair_mass = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        sizes.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(F.when(F.col("n") > 1, pair_mass).otherwise(0))
            .cast("long")
            .alias("candidate_pairs"),
            F.max("n").cast("long").alias("max_bucket"),
        )
        .orderBy("band")
    )


def _simhash_wide_band_stats_sql() -> str:
    # same straddle-aware band extraction as the Spark side — a
    # hardcoded 2-bands-per-word layout would silently break for any
    # band width where 32 % band_bits != 0
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band,"
        f" {_wide_band_value_duck(b, SIMHASH_WIDE_BAND_BITS)} AS value FROM s"
        for b in range(N_SIMHASH_WIDE_BANDS)
    )
    return f"""
WITH s AS ({_simhash_wide_sql()}),
bands AS ({bands}),
sizes AS (
  SELECT band, value, count(DISTINCT doc_id) AS n FROM bands GROUP BY band, value
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN n > 1 THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) AS candidate_pairs,
       CAST(max(n) AS BIGINT) AS max_bucket
FROM sizes
GROUP BY band
ORDER BY band
"""


QUERIES["simhash_wide_band_stats"] = (
    simhash_wide_band_stats,
    _simhash_wide_band_stats_sql(),
)


# hyperplane-signature width follows the same log2(n) rule as the
# Hamming bands: the 8-bit signature in embedding_neardup_pairs is the
# oracle-checked small-scale config; this 32-bit signature banded into
# 2 x 16-bit halves is the corpus-scale path (65536 buckets per band,
# so in-bucket pair volume is n^2/65536 per band instead of n^2/256),
# and the banding doubles as multi-probe: two vectors whose signatures
# differ in <= 1 bit still share a band (pigeonhole over 2 bands).
EMB_WIDE_SIG_BITS = 32
EMB_WIDE_BAND_BITS = 16
N_EMB_WIDE_BANDS = EMB_WIDE_SIG_BITS // EMB_WIDE_BAND_BITS  # 2


def embedding_neardup_pairs_wide(spark, sf_dir):
    """Corpus-scale embedding near-dup: 32-hyperplane signature (the
    8 fixed planes of ``ann_hyperplane_topk`` + 24 LCG-generated, all
    literal-embedded in both engines), banded into two 16-bit halves;
    candidates are pairs sharing either half (covers any single
    signature-bit flip), exact cosine >= ``NEARDUP_MIN_COSINE`` keeps
    real near-dups.  Same single-shuffle (band, value) join shape as
    the Hamming-band operators.

    r07: same Arrow shape as the narrow variant — signature kernel,
    id-only band join, exact-fold cosine verify kernel against the
    broadcast float table (the interpreted 32-plane HOF signature alone
    was most of the old 8.5 s)."""
    from .similarity import WIDE_HYPERPLANES

    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = _with_planted(read(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    tbl = _collect_embeddings(e)
    sig = spark.createDataFrame(
        _driver_sig_rows(tbl, WIDE_HYPERPLANES), "vec_id bigint, sig bigint"
    )
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(
                f"(shiftright(sig, {b * EMB_WIDE_BAND_BITS})"
                f" & {(1 << EMB_WIDE_BAND_BITS) - 1})"
            ).alias("value"),
        )
        for b in range(N_EMB_WIDE_BANDS)
    ]
    banded = sig.select(
        "vec_id", F.explode(F.array(*bands)).alias("bb")
    ).select("vec_id", "bb.band", "bb.value")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "value"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return _cosine_pair_verify(spark, _packed_embeddings(tbl), cand)


def _neardup_wide_sql() -> str:
    from .similarity import WIDE_HYPERPLANES, _sig_expr_duck

    mask = (1 << EMB_WIDE_BAND_BITS) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, emb, {b} AS band,"
        f" (sig >> {b * EMB_WIDE_BAND_BITS}) & {mask} AS value FROM e"
        for b in range(N_EMB_WIDE_BANDS)
    )
    cos_raw = (
        "(list_reduce(list_transform(range(1, len(ea.emb) + 1),"
        " i -> ea.emb[i] * eb.emb[i]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(ea.emb, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(eb.emb, x -> x * x), (x, y) -> x + y))))"
    )
    cos = f"floor({cos_raw} * 10000 + 0.5) / 10000"
    return f"""
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
planted AS (
  SELECT vec_id + {_PLANT_ID_OFFSET} AS vec_id, label,
         CAST(CAST(list_transform(range(1, len(emb) + 1),
                i -> CASE WHEN i = 1 THEN emb[i] + {_PLANT_PERTURB} ELSE emb[i] END)
              AS FLOAT[]) AS DOUBLE[]) AS emb
  FROM base WHERE vec_id < {N_PLANTED_NEARDUP}
),
e AS (
  SELECT vec_id, emb, {_sig_expr_duck('emb', WIDE_HYPERPLANES)} AS sig
  FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
),
b AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, bb.vec_id AS vec_b
  FROM b a JOIN b bb ON a.band = bb.band AND a.value = bb.value
                    AND a.vec_id < bb.vec_id
)
SELECT vec_a, vec_b, {cos} AS cosine
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE {cos_raw} >= {NEARDUP_MIN_COSINE}
"""


QUERIES["embedding_neardup_pairs_wide"] = (
    embedding_neardup_pairs_wide,
    _neardup_wide_sql(),
)


# -- asymmetric containment (doc-in-doc duplication) ------------------------
# Jaccard misses the quote/aggregator case: a short article wholly
# embedded in a long page has |A∩B|/|A∪B| ~ |A|/|B| (small) but
# containment C(A in B) = |A∩B|/|A| ~ 1.  MinHash LSH CANNOT feed
# this operator: band-collision probability is ~jaccard^band_size, so
# a 0.15-Jaccard/0.95-containment pair is found with ~9% probability
# (a planted short-in-long test proved the miss).  The scalable exact
# candidate stage is PREFIX FILTERING (Chaudhuri et al.): order all
# shingles by a GLOBAL rarity order (document frequency, then hash);
# if |A∩B| >= ceil(0.5 * min(|A|,|B|)) then A's smaller-side prefix —
# its floor(n/2)+1 rarest shingles — must intersect B's full set, so
# joining prefixes against full sets on the shingle hash finds every
# such pair.  Rarity ordering is also the skew defense: hot
# boilerplate shingles sort LAST and (df-capped) never enter a
# prefix, so the candidate join only ever keys on rare shingles.
CONTAINMENT_MIN = 0.5
# prefix-side df cap: shingles appearing in more documents than this
# never enter a prefix.  Recall caveat (documented, audited by the df
# table itself): a pair whose entire shared half is super-hot
# boilerplate is exact-dedup's / paragraph_dedup's job, not
# containment's — the same division of labor as MAX_LSH_BUCKET.
CONTAINMENT_MAX_DF = 1000
# survivor-pair collect bound for the verify stage (same class as
# CC_SMALL_GRAPH_MAX_EDGES: the prefiltered pair set is output-sized
# and orders of magnitude smaller than the corpus; a limit probe keeps
# the oversize case off the driver and falls back to the full-corpus
# broadcast-join verify)
CONTAINMENT_VERIFY_COLLECT_MAX = 2_000_000


def _containment_candidates(spark, d, id_t):
    """The distinct, prefilter-surviving candidate pair set of the
    containment join (the phase before the exact string verify) — its
    own function so the candidate plan shape (sh_h join keys, df cap
    before the join) stays pin-able after the verify phase collects
    this set eagerly."""
    ex = d.mapInArrow(
        _shingle_h60_batches, f"doc_id {id_t}, n int, sh_h bigint"
    )
    df_tbl = ex.groupBy("sh_h").agg(F.count("*").alias("df"))
    ranked = ex.join(df_tbl, "sh_h")
    w = Window.partitionBy("doc_id").orderBy("df", "sh_h")
    prefix = (
        ranked.withColumn("idx", F.row_number().over(w))
        .filter(F.col("idx") <= F.expr("CAST(n DIV 2 AS INT) + 1"))
        .filter(F.col("df") <= CONTAINMENT_MAX_DF)
        .select(F.col("doc_id").alias("doc_p"), "sh_h")
    )
    cand_raw = (
        prefix.join(ex.select(F.col("doc_id").alias("doc_f"), "sh_h"), "sh_h")
        .filter(F.col("doc_p") != F.col("doc_f"))
        .select(
            F.least("doc_p", "doc_f").alias("doc_a"),
            F.greatest("doc_p", "doc_f").alias("doc_b"),
        )
    )
    return _pair_hash_prefilter(
        spark,
        cand_raw,
        _shingle_hash_map(spark, d),
        lambda c, na, nb: 2 * c + 6 >= _np.minimum(na, nb),
    ).distinct()


def containment_pairs(spark, sf_dir):
    """(doc_a, doc_b, containment_a, containment_b) for every pair
    with max-directional shingle containment >= ``CONTAINMENT_MIN``
    (subject to the ``CONTAINMENT_MAX_DF`` prefix cap) — catches
    subset-duplication that symmetric Jaccard under-scores.

    Plan (r07 Arrow shape): the exploded (doc_id, n, sh_h) table comes
    from ONE mapInArrow kernel (C-regex shingles + C md5 — the JVM
    explode + interpreted md5/conv chain measured 17 s per subtree at
    50k docs; the kernel still runs once per consumer — measured, a
    pinned repartition only adds shuffles because exchange reuse never
    fires across mapInArrow subtrees, while AQE broadcasts the df
    table so the probe side needs no shuffle at all), then df groupBy
    (map-side partial, 60-bit hash keys), the per-doc row_number
    window in the global (df, hash) order, the prefix-vs-full
    equi-join on the shingle hash (prefix side rare-only by
    construction).  RAW candidate pairs (5.7M distinct at 50k docs) go
    through the broadcast 64-bit shingle-hash prefilter BEFORE the
    dedup shuffle — 2*c + 6 >= min(na, nb) is the exact condition with
    a 2-collision slack — and the survivor set (output-sized; bounded
    by a limit probe like the dedup_clusters edge collect) is
    collected so the exact array_intersect verify tokenizes ONLY
    survivor docs instead of the whole corpus twice; past
    ``CONTAINMENT_VERIFY_COLLECT_MAX`` pairs the verify falls back to
    the full-corpus broadcast-join form."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    cand = _containment_candidates(spark, d, id_t)
    probe = cand.limit(CONTAINMENT_VERIFY_COLLECT_MAX + 1).collect()
    if len(probe) <= CONTAINMENT_VERIFY_COLLECT_MAX:
        # survivor path: verify-side kernels tokenize only the docs that
        # appear in a surviving pair (the survivor set is the same
        # broadcast-class table F.broadcast(cand) already shipped)
        cand_use = spark.createDataFrame(
            [(r["doc_a"], r["doc_b"]) for r in probe],
            f"doc_a {id_t}, doc_b {id_t}",
        )
        ids = sorted({r["doc_a"] for r in probe} | {r["doc_b"] for r in probe})
        ids_df = spark.createDataFrame([(i,) for i in ids], f"doc_id {id_t}")
        src = d.join(F.broadcast(ids_df), "doc_id")
    else:
        cand_use, src = cand, d
    sets = src.mapInArrow(
        _shingle_batches, f"doc_id {id_t}, shingles array<string>"
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    with_a = sa.join(F.broadcast(cand_use), "doc_a")
    with_b = sb.join(F.broadcast(cand_use), "doc_b").select("doc_a", "doc_b", "sb")
    return (
        with_a.join(F.broadcast(with_b), ["doc_a", "doc_b"])
        .withColumn("common", F.size(F.array_intersect("sa", "sb")))
        # threshold on the EXACT rational (2*common >= n — integer
        # compare, engine-identical, and precisely the prefix-filter
        # guarantee common >= ceil(n/2)); rounding is output-only and
        # floor-based (engine-portable, see text.py::_r — round() is
        # decimal-string HALF_UP in Spark vs binary in DuckDB)
        .filter(
            (2 * F.col("common") >= F.size("sa"))
            | (2 * F.col("common") >= F.size("sb"))
        )
        .withColumn(
            "containment_a",
            F.floor(F.col("common") / F.size("sa") * 10000 + 0.5) / 10000,
        )
        .withColumn(
            "containment_b",
            F.floor(F.col("common") / F.size("sb") * 10000 + 0.5) / 10000,
        )
        .select("doc_a", "doc_b", "containment_a", "containment_b")
    )


def _containment_sql() -> str:
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
sets AS (SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS shingles FROM w),
ex AS (
  SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle
  FROM sets
),
exh AS (SELECT doc_id, n, {_duck_hash60('shingle')} AS sh_h FROM ex),
dft AS (SELECT sh_h, count(*) AS df FROM exh GROUP BY sh_h),
ranked AS (
  SELECT exh.doc_id, exh.n, exh.sh_h, dft.df,
         row_number() OVER (PARTITION BY exh.doc_id ORDER BY dft.df, exh.sh_h) AS idx
  FROM exh JOIN dft USING (sh_h)
),
prefix AS (
  SELECT doc_id AS doc_p, sh_h FROM ranked
  WHERE idx <= n // 2 + 1 AND df <= {CONTAINMENT_MAX_DF}
),
cand AS (
  SELECT DISTINCT least(doc_p, f.doc_id) AS doc_a,
                  greatest(doc_p, f.doc_id) AS doc_b
  FROM prefix JOIN exh f USING (sh_h)
  WHERE doc_p != f.doc_id
),
j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS common,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM cand
  JOIN sets sa ON sa.doc_id = doc_a
  JOIN sets sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b,
       floor(common / na * 10000 + 0.5) / 10000 AS containment_a,
       floor(common / nb * 10000 + 0.5) / 10000 AS containment_b
FROM j
WHERE 2 * common >= na OR 2 * common >= nb
"""


QUERIES["containment_pairs"] = (containment_pairs, _containment_sql())


def containment_stats(spark, sf_dir):
    """The audit for ``containment_pairs``'s df cap ("no silent caps",
    VERDICT r04 item 6; ``lsh_bucket_stats`` is the template): how many
    shingles the ``CONTAINMENT_MAX_DF`` prefix cap excludes, how much
    occurrence mass they carry, and how many documents actually lost
    prefix entries to the cap — the operator's recall caveat, sized
    instead of assumed.  Pure integer aggregates over the same
    explode + df-groupBy + rank window the pair query runs (from the
    same r07 Arrow kernel); one row."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    d, id_t = _spread_docs(spark, sf_dir)
    ex = d.mapInArrow(
        _shingle_h60_batches, f"doc_id {id_t}, n int, sh_h bigint"
    )
    df_tbl = ex.groupBy("sh_h").agg(F.count("*").alias("df"))
    sh_stats = df_tbl.agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("df") > CONTAINMENT_MAX_DF, 1).otherwise(0))
        .cast("bigint")
        .alias("n_capped_shingles"),
        F.max("df").cast("bigint").alias("max_df"),
        F.sum("df").cast("bigint").alias("n_occurrences"),
        F.sum(
            F.when(F.col("df") > CONTAINMENT_MAX_DF, F.col("df")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_capped_occurrences"),
    )
    w = Window.partitionBy("doc_id").orderBy("df", "sh_h")
    doc_stats = (
        ex.join(df_tbl, "sh_h")
        .withColumn("idx", F.row_number().over(w))
        .filter(F.col("idx") <= F.expr("CAST(n DIV 2 AS INT) + 1"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("df") > CONTAINMENT_MAX_DF, 1).otherwise(0)
            ).alias("capped")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("capped").cast("bigint").alias("n_docs_prefix_capped"),
        )
    )
    return sh_stats.crossJoin(doc_stats)


def _containment_stats_sql() -> str:
    return f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
sets AS (SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS shingles FROM w),
ex AS (
  SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle
  FROM sets
),
exh AS (SELECT doc_id, n, {_duck_hash60('shingle')} AS sh_h FROM ex),
dft AS (SELECT sh_h, count(*) AS df FROM exh GROUP BY sh_h),
sh AS (
  SELECT CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN df > {CONTAINMENT_MAX_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_capped_shingles,
         CAST(max(df) AS BIGINT) AS max_df,
         CAST(sum(df) AS BIGINT) AS n_occurrences,
         CAST(sum(CASE WHEN df > {CONTAINMENT_MAX_DF} THEN df ELSE 0 END) AS BIGINT)
           AS n_capped_occurrences
  FROM dft
),
ranked AS (
  SELECT exh.doc_id, exh.n, dft.df,
         row_number() OVER (PARTITION BY exh.doc_id ORDER BY dft.df, exh.sh_h) AS idx
  FROM exh JOIN dft USING (sh_h)
),
per_doc AS (
  SELECT doc_id,
         max(CASE WHEN df > {CONTAINMENT_MAX_DF} THEN 1 ELSE 0 END) AS capped
  FROM ranked
  WHERE idx <= n // 2 + 1
  GROUP BY doc_id
),
docs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(capped) AS BIGINT) AS n_docs_prefix_capped
  FROM per_doc
)
SELECT * FROM sh, docs
"""


QUERIES["containment_stats"] = (containment_stats, _containment_stats_sql())


# -- incremental dedup: a new crawl batch vs the committed corpus ----------
# The production shape at 100 TB: the committed corpus is petabytes,
# the daily increment is small.  The increment NEVER joins the raw
# committed text — only its content-hash set (bucketed/partitioned on
# the hash in production, a broadcast-able skeleton at any increment
# size); within the increment, the canonical representative is the
# minimum doc_id, computed by one hash groupBy.  Split rule for the
# demo: doc_id < INCREMENT_SPLIT is "committed", the rest is the new
# batch — deterministic, so the whole operator has a closed-form SQL
# oracle.
INCREMENT_SPLIT = 250


def dedup_incremental(spark, sf_dir):
    """New-batch dedup against the committed corpus: per new document,
    whether its normalized content already exists in the committed set
    (left-semi on content hash -> flag) and its canonical doc within
    the batch.  r07: spread the single-split scan so the normalize+md5
    projection parallelizes (guide §2.5, the dedup_exact fix)."""
    d = spread(spark, read(spark, sf_dir, "documents").select("doc_id", "text"))
    norm = F.md5(F.lower(F.trim(F.regexp_replace("text", "[ \t\n\x0b\f\r]+", " "))))
    hashed = d.select("doc_id", norm.alias("content_hash"))
    committed = (
        hashed.filter(F.col("doc_id") < INCREMENT_SPLIT)
        .select("content_hash")
        .distinct()
    )
    batch = hashed.filter(F.col("doc_id") >= INCREMENT_SPLIT)
    flagged = batch.join(
        F.broadcast(committed.withColumn("_seen", F.lit(True))),
        "content_hash",
        "left",
    ).withColumn("already_committed", F.coalesce(F.col("_seen"), F.lit(False)))
    canon = batch.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_in_batch")
    )
    return (
        flagged.join(canon, "content_hash")
        .select(
            "doc_id",
            "already_committed",
            "canonical_in_batch",
            (F.col("doc_id") == F.col("canonical_in_batch")).alias("is_batch_canonical"),
        )
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH hashed AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS content_hash
  FROM documents
),
committed AS (
  SELECT DISTINCT content_hash FROM hashed WHERE doc_id < {INCREMENT_SPLIT}
),
batch AS (SELECT * FROM hashed WHERE doc_id >= {INCREMENT_SPLIT}),
canon AS (
  SELECT content_hash, min(doc_id) AS canonical_in_batch FROM batch GROUP BY content_hash
)
SELECT b.doc_id AS doc_id,
       (c.content_hash IS NOT NULL) AS already_committed,
       canon.canonical_in_batch AS canonical_in_batch,
       b.doc_id = canon.canonical_in_batch AS is_batch_canonical
FROM batch b
LEFT JOIN committed c USING (content_hash)
JOIN canon USING (content_hash)
"""

QUERIES["dedup_incremental"] = (dedup_incremental, DEDUP_INCREMENTAL_SQL)


# -- benchmark decontamination ---------------------------------------------
# The training-data-pipeline operator every eval-aware corpus needs:
# flag corpus documents that share any N-gram with a benchmark/eval
# set, so eval text never leaks into training data.  Scale shape: the
# eval set is tiny (benchmarks are KBs-MBs) -> its distinct gram-hash
# set is BROADCAST; the corpus side is a map-side gram explode +
# broadcast semi-join + doc-level any() — no corpus-keyed shuffle
# beyond one groupBy on doc_id, no skew (grams are deduped per doc
# before the join).  Demo split: doc_id < EVAL_SET_SIZE is the "eval
# set" — deterministic, so the operator has a closed-form SQL oracle.
EVAL_SET_SIZE = 20
DECON_NGRAM = 8


def _gram_expr_spark(n: int) -> str:
    # lookahead regex over the norm column (collapse-proof, see
    # _SPARK_SHINGLES); <n words naturally yields no matches
    return f"regexp_extract_all(norm, '{_ngram_lookahead_re(n)}', 1)"


def _gram_expr_duck(n: int) -> str:
    parts = " || ' ' || ".join(f"words[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(words) >= {n} THEN"
        f" [{parts} FOR i IN range(1, len(words) - {n - 2})]"
        f" ELSE [] END"
    )


def _gram_h60_batches(n: int):
    """mapInArrow factory: exploded DISTINCT n-gram 60-bit md5 ints per
    doc — the C twin of ``explode(array_distinct(transform(
    _gram_expr_spark(n), g -> _spark_hash60(g))))``.  Distinctness is
    on the HASH (exactly like the array form); < n words or null text
    explodes to nothing."""

    def batches(it):
        from hashlib import md5

        import pyarrow as pa

        for batch in it:
            texts = batch.column("text").to_pylist()
            doc_ids = batch.column("doc_id").to_pylist()
            id_type = batch.schema.field("doc_id").type
            out_ids, out_h = [], []
            words_per_doc, _c, _b = _tokenize_batch(texts)
            for did, ws in zip(doc_ids, words_per_doc):
                if ws is None or len(ws) < n:
                    continue
                seen = set()
                for i in range(len(ws) - n + 1):
                    h = (
                        int.from_bytes(
                            md5(" ".join(ws[i : i + n]).encode()).digest()[:8],
                            "big",
                        )
                        >> 4
                    )
                    if h not in seen:
                        seen.add(h)
                        out_ids.append(did)
                        out_h.append(h)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=id_type), pa.array(out_h, type=pa.int64())],
                ["doc_id", "gram"],
            )

    return batches


def decontaminate_against_eval(spark, sf_dir):
    """Per non-eval document: does it share any {DECON_NGRAM}-gram with
    the eval set, and how many distinct grams overlap.  Grams are
    60-bit md5 ints from the start — the broadcast eval set and the
    explode+groupBy shuffle carry 8-byte keys, never gram strings.

    r07: gram extraction + hashing run in one Arrow kernel per side
    (the JVM ``transform(grams, g -> md5/conv)`` paid an interpreted
    hash per gram — 19.5 -> ~3 s at 50k docs); the eval-side doc_id
    filter sits below its kernel so it pushes to the parquet scan."""
    from ..pipeline.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    base = read(spark, sf_dir, "documents").select("doc_id", "text")
    id_t = dict(base.dtypes)["doc_id"]
    gk = _gram_h60_batches(DECON_NGRAM)
    schema = f"doc_id {id_t}, gram bigint"
    eval_grams = (
        base.filter(F.col("doc_id") < EVAL_SET_SIZE)
        .mapInArrow(gk, schema)
        .select("gram")
        .distinct()
    )
    corpus_grams = spread(
        spark, base.filter(F.col("doc_id") >= EVAL_SET_SIZE)
    ).mapInArrow(gk, schema)
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap_grams"))
    )
    return (
        base.filter(F.col("doc_id") >= EVAL_SET_SIZE)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("overlap_grams"), F.lit(0)).alias("overlap_grams"),
            (F.coalesce(F.col("overlap_grams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH w AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
grams AS (SELECT doc_id,
                 list_distinct(list_transform({_gram_expr_duck(DECON_NGRAM)},
                                              g -> {_duck_hash60('g')})) AS grams
          FROM w),
eval_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM grams WHERE doc_id < {EVAL_SET_SIZE}
),
corpus AS (SELECT * FROM grams WHERE doc_id >= {EVAL_SET_SIZE}),
hits AS (
  SELECT doc_id, count(*) AS overlap_grams
  FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) c
  WHERE gram IN (SELECT gram FROM eval_grams)
  GROUP BY doc_id
)
SELECT corpus.doc_id AS doc_id,
       coalesce(hits.overlap_grams, 0) AS overlap_grams,
       coalesce(hits.overlap_grams, 0) > 0 AS contaminated
FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
"""

QUERIES["decontaminate_against_eval"] = (
    decontaminate_against_eval,
    DECONTAMINATE_SQL,
)


# -- duplicate clusters: connected components over verified pairs ----------
# Pairs are only half the dedup story: A~B and B~C must collapse into
# ONE cluster {A,B,C} with one canonical doc.  Connected components via
# iterative minimum-label propagation + pointer doubling — the
# large-graph algorithm (hash-joins per round, no single-machine
# union-find): each round every vertex adopts the min label among
# itself and its neighbors (one hop), then jumps to its label's label
# (pointer doubling — the "small-star" move of Kiveris et al.'s
# alternating algorithm).  The hop moves the min one edge per round;
# the jump compresses label chains exponentially, so a PATH graph of n
# vertices (the worst case: a chained-near-dup crawl A~B~C~...)
# converges in O(log n) combined rounds instead of O(n) — 20 rounds
# covers components of diameter far beyond any real corpus.
# Convergence is checked by an aggregate-only fixpoint probe (count of
# changed labels — never a collect of data).
MAX_CC_ROUNDS = 20
# labels.localCheckpoint every this many rounds: min-label propagation
# lineage grows one join+groupBy per round, and past ~10 rounds the
# re-planned DAG dominates round time on a real cluster; checkpointing
# materializes the labels and truncates the chain.
CC_CHECKPOINT_EVERY = 5


class CCNotConverged(RuntimeError):
    """Raised when min-label propagation hits the round cap with labels
    still changing — returning the partial labels would silently split
    one long duplicate chain into several clusters ("no silent caps")."""


def connected_components(edges, max_rounds=MAX_CC_ROUNDS, checkpoint_release=None):
    """Connected components over a (doc_a, doc_b) edge DataFrame ->
    (doc_id, cluster_id = min reachable doc_id), by min-label
    propagation with pointer doubling.

    Each round: (1) every vertex takes the min label over itself and
    its neighbors (one hop), (2) every vertex jumps to its label's
    label (pointer doubling).  The doubling step compresses label
    chains exponentially, so even a PATH graph (chained near-dups,
    the O(diameter) killer for plain propagation) converges in
    O(log n) combined rounds — a correct fixpoint is still a fixpoint
    of step (1) alone, so labels are constant across every edge when
    the change count hits zero.  If ``max_rounds`` is hit with labels
    still changing the result is WRONG (one component split into
    several), so this raises :class:`CCNotConverged` instead of
    returning it ("no silent caps").

    ``checkpoint_release``: optional list — a zero-arg callable
    releasing the FINAL ``localCheckpoint`` backing the returned
    DataFrame is appended to it.  The final checkpoint is the
    recompute root of the result, so it cannot be freed here; if the
    caller never invokes the callable, a long-lived session
    accumulates one materialized label table per call until JVM GC
    (harmless for a batch job, real for a service — ADVICE r04).
    """
    bidir = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        bidir.select(F.col("doc_a").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
    )
    # small graph per cluster: cache the edge list once; each round is
    # one join + one groupBy
    bidir = bidir.cache()
    sc = edges.sparkSession.sparkContext

    def _persistent_ids():
        m = sc._jsc.sc().getPersistentRDDs()
        lst = m.toList()
        return {lst.apply(i)._1() for i in range(m.size())}

    def _unpersist_ids(ids):
        # localCheckpoint'ed RDDs never register with the CacheManager
        # (Dataset.unpersist is a no-op on them, is_cached stays
        # False), so superseded checkpoints must be released via the
        # SparkContext's persistent-RDD map — otherwise storage grows
        # by one label-table copy per checkpoint until JVM GC.
        # LIFETIME RULE: a checkpoint is a lineage-truncated recompute
        # root for every cached round that follows it, so it is only
        # released AFTER the next checkpoint materializes (see the
        # loop) — dropping it earlier would make a later cache-block
        # eviction unrecoverable.  Id attribution assumes this loop is
        # the only code persisting RDDs on the session while it runs
        # (true for a batch dedup job; a concurrently-persisting
        # session could be mis-attributed by the snapshot diff).
        m = sc._jsc.sc().getPersistentRDDs()
        lst = m.toList()
        for i in range(m.size()):
            pair = lst.apply(i)
            if pair._1() in ids:
                pair._2().unpersist(False)

    labels_ckpt_ids: set = set()
    changed = 0
    try:
        for rnd in range(1, max_rounds + 1):
            neighbor_min = (
                bidir.join(labels, bidir.doc_b == labels.doc_id)
                .groupBy(bidir.doc_a)
                .agg(F.min("label").alias("nmin"))
                .withColumnRenamed("doc_a", "doc_id")
            )
            new_labels = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
            )
            # pointer doubling: label <- label-of-label.  Labels always
            # name a vertex of the same component (init label = doc_id,
            # the hop takes mins of labels, the jump maps through
            # labels), so the left join hits whenever the label vertex
            # exists — coalesce only guards the theoretical miss.  The
            # self-joined min-prop subtree shares its Exchange via
            # ReusedExchange, so the round stays one shuffle heavier,
            # not recomputed twice.
            ptr = new_labels.select(
                F.col("doc_id").alias("_ptr"), F.col("label").alias("_plabel")
            )
            new_labels = (
                new_labels.join(ptr, new_labels.label == ptr._ptr, "left")
                .select(
                    "doc_id",
                    F.coalesce("_plabel", "label").alias("label"),
                )
            )
            new_ckpt_ids: set = set()
            if rnd % CC_CHECKPOINT_EVERY == 0:
                # truncate the join-per-round lineage (eager = also
                # materialized, so dropping the old cache below is safe)
                before = _persistent_ids()
                new_labels = new_labels.localCheckpoint(eager=True)
                new_ckpt_ids = _persistent_ids() - before
            else:
                new_labels = new_labels.cache()
            changed = (
                labels.withColumnRenamed("label", "old")
                .join(new_labels, "doc_id")
                .filter(F.col("old") != F.col("label"))
                .count()
            )
            # the changed-count just materialized new_labels, so the
            # previous round's copy is dead weight from here on — without
            # this, executor storage grows O(rounds x labels) and evicts
            # hot blocks on a large corpus
            if labels.is_cached:
                labels.unpersist()
            if new_ckpt_ids:
                # a NEW lineage-truncated root now exists and the last
                # pre-checkpoint cache was just dropped, so no live
                # plan can recompute through the OLD checkpoint — only
                # now is it safe to release (see _unpersist_ids rule)
                if labels_ckpt_ids:
                    _unpersist_ids(labels_ckpt_ids)
                labels_ckpt_ids = new_ckpt_ids
            labels = new_labels
            if changed == 0:
                break
    finally:
        bidir.unpersist()
    if changed != 0:
        # nothing useful will be returned — free the working state
        # before raising (ADVICE r05: the last checkpoint otherwise
        # leaks until JVM GC with no release handle)
        if labels.is_cached:
            labels.unpersist()
        if labels_ckpt_ids:
            _unpersist_ids(labels_ckpt_ids)
        raise CCNotConverged(
            f"connected_components still had {changed} changing labels after"
            f" {max_rounds} rounds — with pointer doubling that means a"
            f" component needing more than ~2^{max_rounds} propagation"
            " steps (or a pathological label cycle); raise max_rounds"
            " (each round is two joins + one groupBy) or run exact dedup"
            " upstream to collapse the chain"
        )
    if checkpoint_release is not None:
        # the final labels may be (a) only cached (converged before the
        # first checkpoint round — ADVICE r05's uncovered case), (b) a
        # localCheckpoint, or (c) a cache whose recompute root is the
        # last checkpoint: release the cache first, then the checkpoint
        _final_labels = labels
        _final_ids = set(labels_ckpt_ids)

        def _release():
            if _final_labels.is_cached:
                _final_labels.unpersist()
            if _final_ids:
                _unpersist_ids(_final_ids)

        checkpoint_release.append(_release)
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


# Session-scoped release registry for the batch path (VERDICT r05
# item 5): the final label table of a connected_components call cannot
# be freed before the caller consumes the result, so each
# dedup_clusters call parks its release callable here and DRAINS the
# previous call's — storage holds at most ONE label table at a time
# across back-to-back runs in a session (pinned by
# tests/test_checkpoint_release.py).  Safe under the batch model where
# a result is consumed before the next builder runs; a caller that
# interleaves two live cluster DataFrames should pass its own
# ``checkpoint_release`` list instead.
_CC_PENDING_RELEASES: list = []


def drain_cc_releases():
    """Release label tables parked by previous dedup_clusters calls."""
    while _CC_PENDING_RELEASES:
        _CC_PENDING_RELEASES.pop()()


# Edge-count gate for the driver-side union-find fast path: the edge
# list is the VERIFIED near-dup pair set — the output of an oracled
# query, orders of magnitude smaller than the corpus — so up to this
# many edges it is broadcast-class and a single-pass union-find beats
# ~10 distributed label-propagation rounds of per-round job overhead
# (measured 15 s of rounds for a few-hundred-edge graph at local[32]).
# Past the gate the distributed pointer-doubling path runs unchanged —
# the same two-regime design as GraphX/GraphFrames CC.
CC_SMALL_GRAPH_MAX_EDGES = 2_000_000


def _union_find_clusters(edge_rows):
    """min-reachable-id labels for a small edge list (exact twin of the
    distributed fixpoint: cluster_id = min doc_id in the component)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    cluster_min: dict = {}
    for v in parent:
        r = find(v)
        m = cluster_min.get(r)
        if m is None or v < m:
            cluster_min[r] = v
    return [(v, cluster_min[find(v)]) for v in parent]


def dedup_clusters(spark, sf_dir):
    """(doc_id, cluster_id) for every doc in a verified near-dup pair;
    cluster_id = min doc_id reachable through the pair graph.  Raises
    :class:`CCNotConverged` rather than ever returning split clusters
    from an un-converged propagation.

    r07: graphs up to ``CC_SMALL_GRAPH_MAX_EDGES`` verified pairs run
    a driver-side union-find over the collected edge list (bounded by
    a limit probe, so the oversize case never materializes on the
    driver) — identical labels by construction, none of the per-round
    scheduling overhead.  Bigger graphs take the distributed
    pointer-doubling path, whose final label table (cache or
    localCheckpoint) is parked on the session release registry and
    freed when the NEXT dedup_clusters call starts (or via
    :func:`drain_cc_releases`)."""
    edges = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    probe = edges.limit(CC_SMALL_GRAPH_MAX_EDGES + 1).collect()
    if len(probe) <= CC_SMALL_GRAPH_MAX_EDGES:
        labels = _union_find_clusters([(r["doc_a"], r["doc_b"]) for r in probe])
        schema = edges.select(
            F.col("doc_a").alias("doc_id"), F.col("doc_a").alias("cluster_id")
        ).schema
        return spark.createDataFrame(labels, schema)
    drain_cc_releases()
    return connected_components(edges, checkpoint_release=_CC_PENDING_RELEASES)


def _clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_jaccard_sql()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
"""


QUERIES["dedup_clusters"] = (dedup_clusters, _clusters_sql())


def dedup_cluster_stats(spark, sf_dir):
    """The audit for ``dedup_clusters`` (house audited-caps pattern —
    every multi-stage op ships its audit): cluster count, clustered
    docs, the largest cluster, and how many clusters are CHAINS
    (size >= 3 — components that exist only because of transitive
    near-dup edges, the class pointer doubling exists for).  Exact
    integers; one groupBy over the label table + single-row rollup."""
    c = dedup_clusters(spark, sf_dir)
    per = c.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return per.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs_clustered"),
        F.max("sz").cast("bigint").alias("max_cluster_size"),
        F.sum(F.when(F.col("sz") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_transitive_clusters"),
    )


def _cluster_stats_sql() -> str:
    return f"""
WITH labels AS ({_clusters_sql()}),
per AS (SELECT cluster_id, count(*) AS sz FROM labels GROUP BY cluster_id)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs_clustered,
       CAST(max(sz) AS BIGINT) AS max_cluster_size,
       CAST(sum(CASE WHEN sz >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_transitive_clusters
FROM per
"""


QUERIES["dedup_cluster_stats"] = (dedup_cluster_stats, _cluster_stats_sql())


# -- deterministic dataset split --------------------------------------------
# Train/val/test assignment must be a PURE FUNCTION of the document id
# (stable under re-runs, resumes, and corpus growth — never a random()
# that reshuffles docs between splits on every run).  The portable
# 32-bit hash keys the split so both engines agree bit-for-bit; at
# 100 TB this is a map-side projection, zero shuffle.
SPLIT_BUCKETS = 100
VAL_PCT = 5
TEST_PCT = 5


def dataset_split(spark, sf_dir):
    """(doc_id, bucket, split) — hash-stable train/val/test labels."""
    d = read(spark, sf_dir, "documents")
    bucket = f"pmod({_spark_hash('CAST(doc_id AS STRING)')}, {SPLIT_BUCKETS})"
    return d.selectExpr(
        "doc_id",
        f"{bucket} AS bucket",
        f"CASE WHEN {bucket} < {VAL_PCT} THEN 'val'"
        f" WHEN {bucket} < {VAL_PCT + TEST_PCT} THEN 'test'"
        f" ELSE 'train' END AS split",
    )


DATASET_SPLIT_SQL = f"""
SELECT doc_id,
       {_duck_hash('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS} AS bucket,
       CASE WHEN {_duck_hash('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS} < {VAL_PCT} THEN 'val'
            WHEN {_duck_hash('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS} < {VAL_PCT + TEST_PCT} THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""

QUERIES["dataset_split"] = (dataset_split, DATASET_SPLIT_SQL)


# -- split-leakage audit -----------------------------------------------------
# The eval-integrity check every training pipeline must run AFTER
# splitting: does any content hash span two splits?  Splits key on
# doc_id, so a re-crawled duplicate (same content, new id) can land
# its copies in train AND val — exactly the leak that inflates eval.
# The driver corpus has no exact duplicates, so redelivery is
# SIMULATED deterministically (the non-vacuous-oracle rule, same as
# events_dedup_replayed's planted redeliveries): every doc_id % 25 ==
# 0 is re-crawled under doc_id + RECRAWL_OFFSET.
RECRAWL_MOD = 25
RECRAWL_OFFSET = 1_000_000


def split_leakage_audit(spark, sf_dir):
    """Single-row audit: content hashes and documents whose hash spans
    more than one train/val/test split.  Exact integers only.

    Scale shape: one content-hash groupBy (map-side partial agg; the
    countDistinct over the 3-value split column is a tiny state per
    key) + a single-row rollup — the same plan at any corpus size.
    The remediation path for real leaks is exact dedup BEFORE
    splitting (dedup_exact / build_training_set do exactly that)."""
    d = read(spark, sf_dir, "documents")
    recrawl = d.filter(F.col("doc_id") % RECRAWL_MOD == 0).select(
        (F.col("doc_id") + RECRAWL_OFFSET).alias("doc_id"), "text"
    )
    u = d.select("doc_id", "text").unionByName(recrawl)
    bucket = f"pmod({_spark_hash('CAST(doc_id AS STRING)')}, {SPLIT_BUCKETS})"
    split = (
        f"CASE WHEN {bucket} < {VAL_PCT} THEN 'val'"
        f" WHEN {bucket} < {VAL_PCT + TEST_PCT} THEN 'test'"
        f" ELSE 'train' END"
    )
    # Explicit whitespace class, NOT \s: Java's \s includes \x0B
    # (vertical tab) while DuckDB's RE2 \s does not, and this query's
    # entire output hinges on the content hash — a \x0B-bearing doc
    # would flip the leak counts between engines (ADVICE r05).
    norm = F.lower(F.trim(F.regexp_replace("text", "[ \t\n\x0b\f\r]+", " ")))
    hashed = u.select(
        F.md5(norm).alias("content_hash"), F.expr(split).alias("split")
    )
    per_hash = hashed.groupBy("content_hash").agg(
        F.count("*").alias("n_docs_h"),
        F.countDistinct("split").alias("n_splits"),
    )
    return per_hash.agg(
        F.sum("n_docs_h").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_content_hashes"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_leaked_hashes"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs_h")).otherwise(0))
        .cast("bigint")
        .alias("n_leaked_docs"),
    )


SPLIT_LEAKAGE_SQL = f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {RECRAWL_OFFSET}, text FROM documents
  WHERE doc_id % {RECRAWL_MOD} = 0
),
h AS (
  SELECT md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS content_hash,
         CASE WHEN {_duck_hash('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS} < {VAL_PCT} THEN 'val'
              WHEN {_duck_hash('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS} < {VAL_PCT + TEST_PCT} THEN 'test'
              ELSE 'train' END AS split
  FROM u
),
p AS (
  SELECT content_hash, count(*) AS n_docs_h, count(DISTINCT split) AS n_splits
  FROM h GROUP BY content_hash
)
SELECT CAST(sum(n_docs_h) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_content_hashes,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_hashes,
       CAST(sum(CASE WHEN n_splits > 1 THEN n_docs_h ELSE 0 END) AS BIGINT) AS n_leaked_docs
FROM p
"""

QUERIES["split_leakage_audit"] = (split_leakage_audit, SPLIT_LEAKAGE_SQL)
