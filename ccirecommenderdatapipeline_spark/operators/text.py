"""Text-analysis + dedup primitives over the ``documents`` table — the
training-data-pipeline surface (north star; no counterpart in the reference,
which is numeric-only).

Everything is built from JVM-side Catalyst expressions (split / transform /
filter / aggregate higher-order functions) — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with document bytes.

Cross-engine determinism: hashes are md5 hex strings (identical in Spark and
DuckDB); MinHash derives its k components from one md5 per shingle via an
exact int64 modular hash family, so no engine-specific 64-bit hash (murmur
vs duckdb-hash) ever enters the result. Bit extraction for SimHash uses
modulo/compare arithmetic on the hex-digit value, portable to any SQL
engine.

Scale notes (100 TB): every per-doc op is map-side only. The pair-generating
joins (shingle inverted index, LSH band buckets) shuffle on the
shingle/bucket key — both are classic skew points; the shingle join prunes
frequent shingles (document-frequency cap) exactly so a stop-shingle cannot
produce a quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# MinHash: k = 12 components (4 bands x 3 rows) from ONE md5 per shingle:
# h = int(md5(s)[:12 hex]) mod p, component_j = (a_j*h + b_j) mod p. The
# modular family replaces 12 salted md5s per shingle occurrence — measured
# 25s -> ~6s on 10k docs at sf0.1. p = 2^31-1 keeps a_j*h < 2^62 (no
# overflow, exact in any engine's int64).
MINHASH_K = 12
LSH_BAND_ROWS = 3
MINHASH_P = 2147483647
MINHASH_AB = [((j + 1) * 104729 % MINHASH_P, (j + 1) * 7919 % MINHASH_P) for j in range(MINHASH_K)]
STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "de", "et"],
}


def tokens(text: Column) -> Column:
    """Lowercased alpha tokens; '' artifacts removed."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), "[^a-z]+", " "), " "),
        lambda t: t != "",
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (empty array when fewer than n tokens).

    Built from n whole-array slices folded with zip_with — NOT per-index
    element_at lambdas: a lambda body referencing the tokens expression gets
    that expression re-evaluated per element (tokenization re-run per gram —
    measured 6x the runtime of this form on 10k docs)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, length)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, j + 1, length), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return out


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """k-component integer MinHash (see module constants): the whole
    signature is ONE fold — per shingle compute its k component hashes from
    a single md5, then elementwise-min into the accumulator. Building it as
    one expression (not k separate array_min projections) stops projection
    collapse from re-inlining the md5 k times. Empty shingle sets yield the
    p sentinel per component."""

    def comps(s: Column) -> Column:
        h = F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long") % MINHASH_P
        return F.array(*[(F.lit(a) * h + F.lit(b)) % MINHASH_P for a, b in MINHASH_AB[:k]])

    init = F.array(*[F.lit(MINHASH_P).cast("long")] * k)
    return F.aggregate(
        F.transform(shingles, comps),
        init,
        lambda acc, c: F.zip_with(acc, c, lambda x, y: F.least(x, y)),
    )


def lsh_bands(sig: Column, rows: int = LSH_BAND_ROWS, k: int = MINHASH_K) -> Column:
    """Array of (band_idx, band_key) structs; band key = exact modular
    combination of its rows (collisions only ADD candidate pairs — the
    match-fraction estimate downstream is unaffected)."""
    bands = []
    for b in range(k // rows):
        key = F.element_at(sig, b * rows + 1)
        for r in range(1, rows):
            key = (key * 31 + F.element_at(sig, b * rows + r + 1)) % MINHASH_P
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), key.alias("band_key"))
        )
    return F.array(*bands)


def bucket_pairs(members: Column) -> Column:
    """All i<j pairs from a bucket's member array as struct(a, b) — the
    grouped-bucket alternative to a self-join: the upstream pipeline is
    computed ONCE, and bucket size (bounded by hashing uniformity / DF
    capping) caps the per-group pair blow-up. Members are sorted by their
    first struct field, so a < b ordering is deterministic."""
    m = F.array_sort(members)
    return F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + 2, F.size(m)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def signature_match_frac(s1: Column, s2: Column, k: int = MINHASH_K) -> Column:
    """Fraction of equal MinHash components — the Jaccard estimate."""
    eq = F.filter(
        F.sequence(F.lit(1), F.lit(k)),
        lambda i: F.element_at(s1, i) == F.element_at(s2, i),
    )
    return F.size(eq) / F.lit(float(k))


def _hex_digit(h: Column, c: int) -> Column:
    """Value 0..15 of the c-th (1-based) hex char of md5 string ``h``."""
    return F.conv(F.substring(h, c, 1), 16, 10).cast("int")


def _bit_pred(d: Column, b: int) -> Column:
    """Bit ``b`` (0..3) of digit value ``d`` — modulo/compare, no shifts."""
    if b == 3:
        return d >= 8
    if b == 2:
        return d % 8 >= 4
    if b == 1:
        return d % 4 >= 2
    return d % 2 == 1


def simhash16(toks: Column) -> Column:
    """16-bit SimHash fingerprint as a '1'/'0' string (MSB first): per bit,
    majority vote over the token hashes' bits (frequency-weighted — tokens
    enter once per occurrence); ties -> 0.

    Form note: 16 filter() passes re-evaluate the token-hash transform per
    bit, but a single zip_with fold accumulating a 17-slot count vector was
    MEASURED 2x slower (per-element array allocation in the interpreted HOF
    path costs more than the repeated md5) — this is the faster shape."""
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 4))
    n = F.size(toks)
    bits = []
    for k in range(16):
        c, b = k // 4 + 1, 3 - (k % 4)
        ones = F.size(F.filter(hashes, lambda h: _bit_pred(_hex_digit(h, c), b)))
        bits.append(F.when(ones * 2 > n, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash16_int(toks: Column) -> Column:
    """Integer form of :func:`simhash16` (same majority votes, MSB-first
    bit weights): the numeric fingerprint feeds banded Hamming-distance
    dedup, where verification needs integral bit arithmetic
    (bit_count(xor)) rather than string comparison."""
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 4))
    n = F.size(toks)
    total = F.lit(0)
    for k in range(16):
        c, b = k // 4 + 1, 3 - (k % 4)
        ones = F.size(F.filter(hashes, lambda h: _bit_pred(_hex_digit(h, c), b)))
        total = total + F.when(ones * 2 > n, F.lit(1 << (15 - k))).otherwise(F.lit(0))
    return total.cast("int")


def bottomk_fingerprint(text: Column, gram: int = 8, k: int = 4) -> Column:
    """Bottom-k sketch of the rolling character-k-gram hash set: the k
    lexicographically smallest md5s of all ``gram``-length substrings,
    '|'-joined — a winnowing-style document fingerprint."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (gram - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: F.md5(F.substring(text, i, gram)))
    return F.array_join(F.slice(F.array_sort(hashes), 1, k), "|")


def with_recrawl(docs: DataFrame, id_offset: int = 100_000) -> DataFrame:
    """Deterministic duplicate injection: union a 're-crawl' batch carrying
    the same text under shifted doc_ids — the fixture for exact/near dedup
    (testdata documents are all-distinct by construction)."""
    recrawl = docs.select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        "text",
        "lang",
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    return docs.unionByName(recrawl)
