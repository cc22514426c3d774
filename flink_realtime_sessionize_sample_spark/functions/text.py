"""Portable text / hash / vector expression primitives.

Every primitive here exists in TWO dialects — a Spark SQL expression builder
(``*_spark``) and a DuckDB SQL builder (``*_duck``) — that compute **bit-for-bit
identical results**. This is the foundation of the oracle-checked LLM-data
operators (dedup, similarity, text analysis): the driver's correctness gate
hash-compares Spark output against DuckDB output, so engine-specific hash
functions (``xxhash64``, DuckDB ``hash()``) are off the table. Instead all
hashing routes through ``md5`` (identical lowercase-hex output in both
engines) narrowed to 48 bits so downstream integer arithmetic stays exact in
64-bit signed range.

Scale notes (the 100 TB design point):

* All builders are **pure per-row column expressions** — no UDFs, no
  shuffles. They run inside WholeStageCodegen on the JVM; a corpus-wide pass
  is embarrassingly parallel over parquet splits.
* MinHash / SimHash signatures are computed per-row from the shingle array
  (``array_min(transform(...))``), NOT via explode+groupBy — computing a
  K-hash signature costs zero exchanges; only the LSH band join shuffles,
  and it shuffles fixed-width (doc_id, band) rows, never the text.

The reference has no text analytics at all (SURVEY.md §2.9) — this layer is
rebuild scope driven by the training-data-pipeline north star.
"""

from __future__ import annotations

# --- portable 48-bit hash -------------------------------------------------
# Spark: conv(hex, 16, 10) returns a decimal string; cast → BIGINT.
# DuckDB: '0x…'::BIGINT parses hex directly. Both consume the first 12 hex
# chars (48 bits) of md5, so values are equal and positive in both engines.


def h48_spark(e: str) -> str:
    return f"cast(conv(substring(md5({e}), 1, 12), 16, 10) as bigint)"


def h48_duck(e: str) -> str:
    return f"cast(concat('0x', substr(md5({e}), 1, 12)) as bigint)"


# --- tokenization ---------------------------------------------------------
# Single-space split of the lower-cased, trimmed text. Deliberately the
# simplest portable rule: Spark split() is regex-based, DuckDB string_split
# is literal, and ' ' means the same thing to both.


def tokens_spark(e: str) -> str:
    return f"split(lower(trim({e})), ' ')"


def tokens_duck(e: str) -> str:
    return f"string_split(lower(trim({e})), ' ')"


# --- k-token shingles (distinct) ------------------------------------------
# 1-based indexing in both dialects (element_at ≙ list[i]). Spark's
# sequence(1, n) turns DESCENDING when n < 1, so the short-text case needs an
# explicit guard; DuckDB's range(1, n) is exclusive-end and naturally empty.


def shingles_spark(toks: str, k: int = 3) -> str:
    parts = ", ".join(f"element_at({toks}, i + {j})" for j in range(k))
    return (
        f"(case when size({toks}) < {k} then array() else "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', {parts}))) end)"
    )


def shingles_duck(toks: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {k - 2}, 1)), "
        f"i -> {parts}))"
    )


# --- MinHash signature ----------------------------------------------------
# K independent hash functions from ONE md5 pass: hash each shingle once to
# 48 bits, then derive hash_k(s) = (A_k * h + B_k) mod P (Carter–Wegman
# universal family, P = largest prime < 2^48). One md5 per shingle instead
# of K — ~K× cheaper, and the integer transform stays in exact signed-64
# range (A_k < 2^14, h < 2^48 → product < 2^62, safe under ANSI mode).
# Callers precompute the base-hash array (``transform(sh, s -> h48(s))``)
# and feed its column name here; NULL when the doc has no shingles.

MINHASH_P = 281474976710597  # largest prime < 2^48
MINHASH_A = (
    12289, 13331, 14341, 15361, 9343, 10007, 11261, 12743,
    8191, 9973, 11087, 12911, 7919, 8933, 10973, 13751,
)
MINHASH_B = (
    48611945103, 261425771893, 122949829103, 233982406427,
    75643356979, 189237542917, 141421356237, 271828182845,
    57721566490, 161803398874, 97931477849, 214748364721,
    31415926535, 123456789011, 201376354873, 88866421393,
)


def minhash_spark(hash_arr: str, k: int) -> str:
    a, b = MINHASH_A[k], MINHASH_B[k]
    return f"array_min(transform({hash_arr}, h -> ({a}L * h + {b}L) % {MINHASH_P}L))"


def minhash_duck(hash_arr: str, k: int) -> str:
    a, b = MINHASH_A[k], MINHASH_B[k]
    return (
        f"list_min(list_transform({hash_arr}, "
        f"h -> ({a}::BIGINT * h + {b}::BIGINT) % {MINHASH_P}::BIGINT))"
    )


# --- SimHash (48-bit) -----------------------------------------------------
# Classic Charikar simhash over the token multiset: for each bit j, sum ±1
# over token hashes' bit j; bit j of the signature is 1 iff the sum is
# positive. `hs` is a precomputed BIGINT array column of token hashes.


def simhash_spark(hs: str, bits: int = 48) -> str:
    return (
        f"aggregate(transform(sequence(0, {bits - 1}), j -> "
        f"case when aggregate({hs}, 0L, (acc, h) -> acc + (shiftright(h, j) & 1) * 2 - 1) > 0 "
        f"then shiftleft(1L, j) else 0L end), 0L, (a, b) -> a + b)"
    )


def simhash_duck(hs: str, bits: int = 48) -> str:
    return (
        f"cast(list_sum(list_transform(range(0, {bits}), j -> "
        f"case when list_sum(list_transform({hs}, h -> ((h >> j) & 1) * 2 - 1)) > 0 "
        f"then (1::BIGINT << j) else 0::BIGINT end)) as bigint)"
    )


# --- vector math (array<float> embeddings) --------------------------------
# Cast to DOUBLE before any arithmetic: float accumulation differs across
# engines, double accumulation of 64 float-exact inputs in the same order is
# bitwise-stable. Spark zip_with/aggregate and DuckDB list_transform/list_sum
# both fold sequentially.


def dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>), "
        f"(x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
    )


def norm_spark(a: str) -> str:
    return f"sqrt({dot_spark(a, a)})"


def cosine_spark(a: str, b: str) -> str:
    return f"({dot_spark(a, b)} / ({norm_spark(a)} * {norm_spark(b)}))"


def dot_duck(a: str, b: str) -> str:
    return f"list_sum(list_transform({a}, (x, i) -> x::DOUBLE * {b}[i]::DOUBLE))::DOUBLE"


def norm_duck(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))::DOUBLE)"


def cosine_duck(a: str, b: str) -> str:
    return f"({dot_duck(a, b)} / ({norm_duck(a)} * {norm_duck(b)}))"


# --- sign-bucket LSH for vectors ------------------------------------------
# Random-hyperplane LSH specialized to axis-aligned planes (the first
# `nbits` coordinate axes): bucket = sign bits of dims 1..nbits. Fully
# portable (no RNG), and a genuine locality hash for normalized embeddings.


def sign_bucket_spark(a: str, nbits: int = 4) -> str:
    # try_element_at: vectors shorter than nbits yield NULL -> sign bit 0
    # (ANSI-mode element_at would throw on out-of-bounds); DuckDB's list
    # index is already NULL-tolerant, so both dialects agree.
    terms = " + ".join(
        f"(case when try_element_at({a}, {i + 1}) >= 0 then {1 << i} else 0 end)"
        for i in range(nbits)
    )
    return f"({terms})"


def sign_bucket_duck(a: str, nbits: int = 4) -> str:
    terms = " + ".join(
        f"(case when {a}[{i + 1}] >= 0 then {1 << i} else 0 end)" for i in range(nbits)
    )
    return f"({terms})"


# --- language marker sets (shared constants) ------------------------------
# Tiny closed-class marker vocabularies for the n-gram/stopword language-ID
# heuristic. Shared by both dialects so the scoring rule is identical.

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "y", "es", "una", "que"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "that", "this",
)


def _inlist(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def marker_score_spark(toks: str, lang: str) -> str:
    return f"size(filter({toks}, t -> t in ({_inlist(LANG_MARKERS[lang])})))"


def marker_score_duck(toks: str, lang: str) -> str:
    return f"len(list_filter({toks}, t -> t in ({_inlist(LANG_MARKERS[lang])})))"


def stopword_count_spark(toks: str) -> str:
    return f"size(filter({toks}, t -> t in ({_inlist(STOPWORDS)})))"


def stopword_count_duck(toks: str) -> str:
    return f"len(list_filter({toks}, t -> t in ({_inlist(STOPWORDS)})))"
