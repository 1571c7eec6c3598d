"""Text-analysis + dedup primitives over the ``documents`` table — the
training-data-pipeline surface (north star; no counterpart in the reference,
which is numeric-only).

Everything is built from JVM-side Catalyst expressions (split / transform /
filter / aggregate higher-order functions) — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with document bytes.

Cross-engine determinism: hashes are md5 hex strings (identical in Spark and
DuckDB); MinHash uses *lexicographic minima of salted md5 strings* instead of
integer hashes, so no engine-specific 64-bit hash (murmur vs duckdb-hash)
ever enters the result. Bit extraction for SimHash uses modulo/compare
arithmetic on the hex-digit value, portable to any SQL engine.

Scale notes (100 TB): every per-doc op is map-side only. The pair-generating
joins (shingle inverted index, LSH band buckets) shuffle on the
shingle/bucket key — both are classic skew points; the shingle join prunes
frequent shingles (document-frequency cap) exactly so a stop-shingle cannot
produce a quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Salts for the MinHash component hash functions (k = 12, 4 bands x 3 rows).
MINHASH_K = 12
LSH_BAND_ROWS = 3
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
    """Space-joined word n-grams (empty array when fewer than n tokens)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """k-component MinHash: component j = min over shingles of
    md5('s<j>:' || shingle), compared lexicographically. Null-free: empty
    shingle sets yield the constant 'z' sentinel per component."""
    # NB: the per-salt lambda must be built by a factory taking ONE parameter —
    # a `lambda s, j=j:` closure has arity 2 and the HOF binder would treat it
    # as the (element, index) form, binding j to the index column.
    def salted(j: int):
        prefix = f"s{j}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    comp = [
        F.coalesce(F.array_min(F.transform(shingles, salted(j))), F.lit("z"))
        for j in range(k)
    ]
    return F.array(*comp)


def lsh_bands(sig: Column, rows: int = LSH_BAND_ROWS, k: int = MINHASH_K) -> Column:
    """Array of (band_idx, band_key) structs: band key = md5 of its rows."""
    bands = []
    for b in range(k // rows):
        parts = [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    return F.array(*bands)


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
    enter once per occurrence); ties -> 0."""
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 4))
    n = F.size(hashes)
    bits = []
    for k in range(16):
        c, b = k // 4 + 1, 3 - (k % 4)
        ones = F.size(F.filter(hashes, lambda h: _bit_pred(_hex_digit(h, c), b)))
        bits.append(F.when(ones * 2 > n, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
