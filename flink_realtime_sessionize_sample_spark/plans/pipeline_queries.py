"""Training-data pipeline operators: deterministic sampling, document
chunking, PII redaction, repetition filtering.

Beyond-parity scope (the reference has none of this — SURVEY.md §2.9); these
are the corpus-preparation steps a 100 TB LLM-data pipeline runs between raw
scrape and tokenizer, expressed as single-pass DataFrame plans so they
inherit Catalyst pushdown + AQE scaling. Determinism is load-bearing: every
op here must produce byte-identical output on re-run (sampling via portable
md5, not rand()) so incremental pipeline runs and the DuckDB oracle both
reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.plans.registry import query
from flink_realtime_sessionize_sample_spark.sources.registry import load_table

_TOKS_D = T.tokens_duck("text")
_TOKS_S = T.tokens_spark("text")

# --- deterministic stratified sampling ------------------------------------

# Per-language keep-rates (percent). A real pipeline downsamples the
# over-represented language; rates are config, the mechanism is the point.
_LANG_RATES = {"en": 35, "de": 80, "fr": 80, "es": 80, "zh": 95}

_RATE_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _LANG_RATES.items()
) + " ELSE 0 END"


@query(
    "sample_stratified_docs",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {T.h48_duck("cast(doc_id AS VARCHAR)")} % 100 < {_RATE_CASE_SQL}
""",
)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with a DETERMINISTIC hash gate instead of
    ``sampleBy``/``rand()``: keep doc iff ``md5_48(doc_id) % 100 < rate[lang]``.
    Same narrow scan-and-filter shape as a rand() sample (no shuffle, fully
    pushdown-friendly), but re-runs and retried tasks produce the identical
    sample — a requirement for reproducible training corpora and for
    speculative-execution safety at 1000-executor scale, where a rand()
    filter re-evaluated on task retry silently changes the output."""
    docs = load_table(spark, sf_dir, "documents")
    gate = F.expr(f"{T.h48_spark('cast(doc_id AS STRING)')} % 100") < F.expr(_RATE_CASE_SQL)
    return docs.filter(gate).select("doc_id", "lang")


# --- fixed-size token chunking --------------------------------------------

_CHUNK = 32


@query(
    "doc_chunk_tokens",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS_D} AS t FROM documents),
nz AS (SELECT doc_id, t FROM tok WHERE len(t) > 0),
c AS (SELECT doc_id, t,
             unnest(range(0, cast(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS chunk_idx
      FROM nz)
SELECT doc_id, chunk_idx,
       len(list_slice(t, chunk_idx*{_CHUNK} + 1, (chunk_idx+1)*{_CHUNK}))::BIGINT AS n_chunk_tokens,
       md5(array_to_string(list_slice(t, chunk_idx*{_CHUNK} + 1, (chunk_idx+1)*{_CHUNK}), ' ')) AS chunk_md5
FROM c
""",
)
def doc_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size token windows (context-length
    packing prep). One generator expression — ``explode(sequence(...))`` +
    ``slice`` — so the chunking is a narrow per-row flatMap with NO shuffle
    and no Python; row blowup is bounded by ceil(n_tokens/chunk). The md5 of
    the joined chunk certifies exact token-boundary agreement with the
    oracle, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("t", F.expr(_TOKS_S))
        .filter(F.size("t") > 0)
        .withColumn(
            "chunk_idx",
            F.explode(F.expr(f"sequence(0, cast(ceil(size(t) / {_CHUNK}.0) AS INT) - 1)")),
        )
        .withColumn("chunk", F.expr(f"slice(t, chunk_idx*{_CHUNK} + 1, {_CHUNK})"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("chunk").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
    )


# --- PII redaction --------------------------------------------------------

# Patterns deliberately in the Java-regex ∩ RE2 common subset (no lookaround,
# no backrefs) so Spark and DuckDB compile them identically.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_NUM_RE = r"\d{6,}"

# The synthetic corpus has no organic PII, so both engines append the same
# deterministic contact lines to a subset of docs before redacting — making
# the assertion non-vacuous.
_AUG_SQL = (
    "concat(text, CASE WHEN doc_id % 7 = 0 "
    "THEN concat(' contact user', cast(doc_id AS VARCHAR), '@example.com') "
    "WHEN doc_id % 11 = 0 THEN concat(' ref ', cast(doc_id * 9999991 AS VARCHAR)) "
    "ELSE '' END)"
)


@query(
    "pii_redact",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS s FROM documents)
SELECT doc_id,
       len(regexp_extract_all(s, '{_EMAIL_RE}'))::BIGINT AS n_email,
       len(regexp_extract_all(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_NUM_RE}'))::BIGINT AS n_num,
       md5(regexp_replace(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_NUM_RE}', '<NUM>', 'g')) AS red_md5
FROM aug
""",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: global regex redaction of emails then long digit runs,
    with per-doc match counts. Pure codegen (`regexp_replace`/`regexp_count`
    are JVM-side) — no UDF, no shuffle, scales as a map over the corpus.
    Email redaction runs FIRST so address digits aren't double-counted by
    the number pass; md5 of the redacted text proves byte-identical output
    across engines."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(_AUG_SQL.replace("AS VARCHAR", "AS STRING")).alias("s"),
    )
    no_email = F.regexp_replace(F.col("s"), _EMAIL_RE, "<EMAIL>")
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("s"), F.lit(_EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(no_email, F.lit(_NUM_RE)).cast("long").alias("n_num"),
        F.md5(F.regexp_replace(no_email, _NUM_RE, "<NUM>")).alias("red_md5"),
    )


# --- repetition ratio (quality filter) ------------------------------------


@query(
    "doc_top_token_ratio",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS_D} AS t FROM documents),
ex AS (SELECT doc_id, unnest(t) AS tk FROM tok WHERE len(t) > 0),
cnt AS (SELECT doc_id, tk, count(*) AS c FROM ex GROUP BY doc_id, tk)
SELECT doc_id,
       sum(c)::BIGINT AS n_tokens,
       max(c)::BIGINT AS top_tok_n,
       round(max(c)::DOUBLE / sum(c), 6) AS top_ratio
FROM cnt GROUP BY doc_id
""",
)
def doc_top_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal: share of the document taken by its
    single most frequent token (boilerplate/spam detector). Two-level hash
    aggregate over the exploded tokens — both levels get map-side partial
    aggregation, and the (doc_id, token) key is high-cardinality but
    NON-skewed by construction, so the shuffle spreads evenly; at corpus
    scale this is the canonical explode→agg pattern, never a window."""
    docs = load_table(spark, sf_dir, "documents")
    per_tok = (
        docs.withColumn("t", F.expr(_TOKS_S))
        .filter(F.size("t") > 0)
        .select("doc_id", F.explode("t").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_tok_n"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_ratio"),
    )
