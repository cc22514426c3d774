"""Round-8 capability queries, staged during round 7 (driver window full).

The round-7 driver window closed at 50/50, so these operators CANNOT take
external correctness rows this round — registering them into the live
registry would create unverifiable backlog, which the standing
no-new-backlog rule (tests/test_registry_window.py) forbids. They are
therefore built, oracle-paired and locally verified NOW, but registered in
a *staging* dict that the driver never sees. Promotion at round-8 open is
mechanical: swap ``staged`` for ``registry.query`` (the signatures are
identical), import this module from ``plans/__init__``, and append the
names to ``_DRIVER_WINDOW``.

Every query here follows the established cross-engine exactness
discipline: integer (or quantized-integer) arithmetic for every
corpus-sized sum, doubles only as single deterministic expressions over
identical exact operands, rounded at 6dp, with the normal-tail p-value
polynomial (``_AS_ERFC_POLY``) evaluated on the ROUNDED statistic so both
engines see identical inputs.

The reference (visualskyrim/flink-realtime-sessionize-sample) has no
statistics/ML surface at all — this whole module is beyond-parity scope
from the training-data-pipeline north star (SURVEY.md §2.9), extending the
two-sample drift family (KS / PSI / chi-square) with rank-based and
kernel-based tests, and the selection family with coverage-style
(k-center) and curriculum-style ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.operators.global_order import (
    with_global_rank,
)
from flink_realtime_sessionize_sample_spark.plans.registry import QueryFn
from flink_realtime_sessionize_sample_spark.sources.registry import load_table

STAGED_QUERIES: dict[str, QueryFn] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str | None = None):
    """Exactly ``registry.query`` but targeting the staging dicts."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_QUERIES:
            raise ValueError(f"duplicate staged query name {name!r}")
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn

    return deco


_TOKS_S = T.tokens_spark("text")
_TOKS_D = T.tokens_duck("text")

# The BPE-ish subword rule shared with doc_token_count_bpe
# (plans/llm_queries.py): maximal [a-z0-9]+ runs or single non-space
# symbols over the lower-cased text.
_BPE_PAT = "[a-z0-9]+|[^a-z0-9 ]"


# --- tokenizer fertility ---------------------------------------------------


@staged(
    "tokenizer_fertility_by_lang",
    oracle=f"""
WITH m AS (
  SELECT lang,
         CAST(length({_TOKS_D}) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS BIGINT)
           AS n_bpe,
         n_chars
  FROM documents
),
a AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         sum(n_words)::BIGINT AS n_words,
         sum(n_bpe)::BIGINT AS n_bpe_tokens,
         sum(n_chars)::BIGINT AS n_chars
  FROM m GROUP BY lang
)
SELECT lang, n_docs, n_words, n_bpe_tokens,
       CASE WHEN n_words = 0 THEN NULL
            ELSE round(CAST(n_bpe_tokens AS DOUBLE)
                       / CAST(n_words AS DOUBLE), 6) + 0.0 END AS fertility,
       CASE WHEN n_bpe_tokens = 0 THEN NULL
            ELSE round(CAST(n_chars AS DOUBLE)
                       / CAST(n_bpe_tokens AS DOUBLE), 6) + 0.0 END
         AS chars_per_token
FROM a
""",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) per
    language — the standard multilingual-tokenizer health readout: a
    vocabulary that over-segments a language (high fertility) inflates
    its effective sequence length and training cost. Uses the repo's
    BPE-ish subword rule (shared with ``doc_token_count_bpe``) against
    the whitespace word count, plus bytes-per-token as the second
    standard axis.

    Scale shape: ONE corpus scan, one map-side-combined hash aggregate on
    the ~handful-of-languages key; every sum is an exact int64 (token
    counts), the two ratios are single 6dp-rounded double expressions of
    those integers. No shuffle beyond the |langs|-row aggregate."""
    m = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(f"cast(size({_TOKS_S}) as bigint)").alias("n_words"),
        F.expr(
            f"cast(size(regexp_extract_all(lower(text), '{_BPE_PAT}', 0)) as bigint)"
        ).alias("n_bpe"),
        "n_chars",
    )
    a = m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    fert = F.when(F.col("n_words") == 0, F.lit(None)).otherwise(
        F.round(F.col("n_bpe_tokens").cast("double") / F.col("n_words").cast("double"), 6)
        + F.lit(0.0)
    )
    cpt = F.when(F.col("n_bpe_tokens") == 0, F.lit(None)).otherwise(
        F.round(F.col("n_chars").cast("double") / F.col("n_bpe_tokens").cast("double"), 6)
        + F.lit(0.0)
    )
    return a.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        fert.alias("fertility"),
        cpt.alias("chars_per_token"),
    )


# --- Mann-Whitney U (tie-corrected) ---------------------------------------

# z over the exact integer columns (u2num, n1, n2, aa, n) — the SAME text
# evaluates in Spark and DuckDB so the 6dp-rounded statistic is
# cross-engine identical. u2num = 2*U1 - n1*n2 (doubled, mean-centered U),
# aa = (n+1)*n*(n-1) - sum(t^3 - t) (the tie-corrected variance core):
# z = (2U - n1*n2) / (2*sigma), 4*sigma^2 = n1*n2*aa / (3*n*(n-1)).
_MW_Z = (
    "round(cast(u2num as double) / sqrt("
    "cast(n1 as double) * cast(n2 as double) * cast(aa as double)"
    " / (3.0 * cast(n as double) * cast(n - 1 as double))), 6) + 0.0"
)
_MW_Z_GUARDED = (
    f"case when n1 = 0 or n2 = 0 or aa <= 0 then 0.0 else {_MW_Z} end"
)


def _as_erfc_poly() -> str:
    from flink_realtime_sessionize_sample_spark.plans.analytics_queries import (
        _AS_ERFC_POLY,
    )

    return _AS_ERFC_POLY


def _mw_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH d AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
         CAST(length({_TOKS_D}) AS BIGINT) AS y
  FROM documents
),
gv AS (
  SELECT y, count(*)::BIGINT AS cnt, sum(g)::BIGINT AS cnt1
  FROM d GROUP BY y
),
mr AS (
  SELECT y, cnt, cnt1,
         CAST(2 * (sum(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS BIGINT) AS a
  FROM gv
),
s AS (
  SELECT sum(cnt)::BIGINT AS n, sum(cnt1)::BIGINT AS n1,
         CAST(sum(cnt1 * a) AS BIGINT) AS r21,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS st
  FROM mr
),
x AS (
  SELECT n, n1, n - n1 AS n2,
         CAST(r21 - n1 * (n1 + 1) - n1 * (n - n1) AS BIGINT) AS u2num,
         CAST((n + 1) * n * (n - 1) - st AS BIGINT) AS aa, st
  FROM s
),
zz AS (SELECT *, {_MW_Z_GUARDED} AS z_stat FROM x),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
            1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT n1 AS n_en, n2 AS n_other, u2num AS u2c_stat, st AS tie_term, z_stat,
       round({poly}, 6) + 0.0 AS p_value,
       (round({poly}, 6) + 0.0) <= 0.05 AS significant_at_95
FROM xt
"""


@staged("mann_whitney_en_tokens", oracle=_mw_oracle())
def mann_whitney_en_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test with EXACT tie correction:
    do English documents draw from the same token-count distribution as
    the rest of the corpus? The nonparametric two-sample location test a
    pipeline runs when the metric is skewed or ordinal (where Welch's t
    is miscalibrated) — completing the rank-statistics family next to
    ``roc_auc_token_count`` (AUC IS U/(n1*n2)) and
    ``spearman_chars_tokens``.

    Exactness: the whole statistic reduces to per-distinct-value counts.
    Doubled midranks (2*cum_before + cnt + 1) keep the rank sum integral;
    u2c_stat = 2*U1 - n1*n2 is an exact int64; the tie term sum(t^3 - t)
    and variance core (n+1)*n*(n-1) - st are exact int64; z is ONE shared
    6dp-rounded expression of those integers and p evaluates the shared
    Abramowitz-Stegun erfc polynomial on the rounded z. Degenerate inputs
    (one empty group, or all values tied) guard to z = 0.

    Scale shape: the corpus collapses to its |distinct token counts|
    frame (bounded by max document length) in one map-side-combined
    groupBy; the cumulative count rides the deterministic-banded
    ``with_global_rank`` pass (no range exchange, no single-partition
    sort); the five moments are one scalar aggregate. int64 ceiling: the
    doubled rank-sum r21 <= 2n^2 and st <= n^3 cap exact arithmetic at
    ~2e6 docs — LOUD on overflow (ANSI Spark throws, DuckDB checks
    BIGINT); past that, carry r21/st in decimal(38,0) over the same
    bounded distinct-value frame."""
    poly = _as_erfc_poly()
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("long").alias("g"),
        F.expr(f"cast(size({_TOKS_S}) as bigint)").alias("y"),
    )
    gv = d.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("g").cast("long").alias("cnt1"),
    )
    mr = with_global_rank(gv, ["y"], rank_col="_rk", sum_col="cnt", cum_col="_cum")
    mr = mr.select(
        "cnt",
        "cnt1",
        (2 * (F.col("_cum") - F.col("cnt")) + F.col("cnt") + 1)
        .cast("long")
        .alias("a"),
    )
    s = mr.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum(F.col("cnt1") * F.col("a")).cast("long").alias("r21"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("st"),
    )
    x = s.select(
        "n",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        (
            F.col("r21")
            - F.col("n1") * (F.col("n1") + 1)
            - F.col("n1") * (F.col("n") - F.col("n1"))
        )
        .cast("long")
        .alias("u2num"),
        ((F.col("n") + 1) * F.col("n") * (F.col("n") - 1) - F.col("st"))
        .cast("long")
        .alias("aa"),
        "st",
    )
    zz = x.withColumn("z_stat", F.expr(_MW_Z_GUARDED))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    pv = F.round(F.expr(poly), 6) + F.lit(0.0)
    return xt.select(
        F.col("n1").alias("n_en"),
        F.col("n2").alias("n_other"),
        F.col("u2num").alias("u2c_stat"),
        F.col("st").alias("tie_term"),
        "z_stat",
        pv.alias("p_value"),
        (pv <= 0.05).alias("significant_at_95"),
    )


# --- Welch's t-test (A/A over the hash split) ------------------------------

# Shared expression text over the exact integer columns
# (n0, n1, s0, s1, vn0, vn1) where vn_i = n_i*q_i - s_i^2 (the integer
# variance numerator): qq_i = vn_i / (n_i^2 * (n_i - 1)) = s_i^2/n_i's
# standard error contribution; t and the Welch-Satterthwaite df are single
# deterministic double expressions of those integers.
_WT_QQ1 = (
    "(cast(vn1 as double) / (cast(n1 as double) * cast(n1 as double)"
    " * cast(n1 - 1 as double)))"
)
_WT_QQ0 = (
    "(cast(vn0 as double) / (cast(n0 as double) * cast(n0 as double)"
    " * cast(n0 - 1 as double)))"
)
_WT_T = (
    "round((cast(s1 as double) / cast(n1 as double)"
    " - cast(s0 as double) / cast(n0 as double))"
    f" / sqrt({_WT_QQ1} + {_WT_QQ0}), 6) + 0.0"
)
_WT_T_GUARDED = (
    "case when n0 < 2 or n1 < 2 or vn0 + vn1 = 0 then 0.0"
    f" else {_WT_T} end"
)
_WT_DF = (
    f"round(({_WT_QQ1} + {_WT_QQ0}) * ({_WT_QQ1} + {_WT_QQ0})"
    f" / ({_WT_QQ1} * {_WT_QQ1} / cast(n1 - 1 as double)"
    f" + {_WT_QQ0} * {_WT_QQ0} / cast(n0 - 1 as double)), 6) + 0.0"
)
_WT_DF_GUARDED = (
    "case when n0 < 2 or n1 < 2 or vn0 + vn1 = 0 then 0.0"
    f" else {_WT_DF} end"
)


def _welch_oracle() -> str:
    poly = _as_erfc_poly()
    arm = T.h48_duck("doc_id::VARCHAR")
    return f"""
WITH d AS (
  SELECT {arm} % 2 AS arm, n_chars AS y FROM documents
),
s AS (
  SELECT count(*)::BIGINT AS n, sum(arm)::BIGINT AS n1,
         sum(y)::BIGINT AS sall, CAST(sum(arm * y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS qall,
         CAST(sum(arm * y * y) AS BIGINT) AS q1
  FROM d
),
x AS (
  SELECT n - n1 AS n0, n1, sall - s1 AS s0, s1,
         CAST((n - n1) * (qall - q1) - (sall - s1) * (sall - s1) AS BIGINT)
           AS vn0,
         CAST(n1 * q1 - s1 * s1 AS BIGINT) AS vn1
  FROM s
),
zz AS (
  SELECT n0, n1, s0, s1, vn0, vn1,
         round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) + 0.0
           AS mean_diff,
         {_WT_T_GUARDED} AS t_stat,
         {_WT_DF_GUARDED} AS welch_df
  FROM x
),
xt AS (
  SELECT *, abs(t_stat) / sqrt(2.0) AS _x,
            1 / (1 + 0.3275911 * (abs(t_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT n0, n1, s0, s1, vn0, vn1, mean_diff, t_stat, welch_df,
       round({poly}, 6) + 0.0 AS p_normal
FROM xt
"""


@staged("welch_t_chars_ab", oracle=_welch_oracle())
def welch_t_chars_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of document length across the
    portable-hash A/B split — run as the A/A sanity check every
    experimentation stack ships: a hash splitter that correlates with a
    covariate (here n_chars) invalidates every experiment run on it, and
    Welch's t (not Student's) is the correct default since nothing
    guarantees equal variances. Completes the mean-comparison corner of
    the two-sample family next to rank-based ``mann_whitney_en_tokens``
    and the proportion tests (``ab_test_two_proportions``).

    Exactness: the six sufficient statistics (n, rank sums, square sums
    per arm) come from ONE conditional scalar aggregate of exact int64s;
    the integer variance numerators vn_i = n_i*q_i - s_i^2 stay exact;
    t, the Welch-Satterthwaite df, and the mean gap are single shared
    6dp-rounded double expressions of those integers (identical text both
    engines); p is the shared erfc polynomial on the rounded t — a normal
    approximation, accurate here because the A/A df is in the hundreds
    (documented, not hidden: the column is named p_normal). Degenerate
    arms (n_i < 2 or zero variance) guard to t = df = 0.

    Scale shape: one corpus scan, one map-side-combined scalar aggregate
    — no shuffle beyond the 1-row reduce. int64 ceiling: q = sum(y^2) ~
    n * 4e6 caps at ~2e12 docs; the arm hash is the shared portable
    48-bit md5 (functions/text.py), so retries and both engines agree
    row-for-row."""
    poly = _as_erfc_poly()
    arm = F.expr(f"pmod({T.h48_spark('cast(doc_id as string)')}, 2)")
    d = load_table(spark, sf_dir, "documents").select(
        arm.alias("arm"), F.col("n_chars").alias("y")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("arm").cast("long").alias("n1"),
        F.sum("y").cast("long").alias("sall"),
        F.sum(F.col("arm") * F.col("y")).cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("qall"),
        F.sum(F.col("arm") * F.col("y") * F.col("y")).cast("long").alias("q1"),
    )
    x = s.select(
        (F.col("n") - F.col("n1")).alias("n0"),
        "n1",
        (F.col("sall") - F.col("s1")).alias("s0"),
        "s1",
        (
            (F.col("n") - F.col("n1")) * (F.col("qall") - F.col("q1"))
            - (F.col("sall") - F.col("s1")) * (F.col("sall") - F.col("s1"))
        )
        .cast("long")
        .alias("vn0"),
        (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1"))
        .cast("long")
        .alias("vn1"),
    )
    zz = x.select(
        "n0",
        "n1",
        "s0",
        "s1",
        "vn0",
        "vn1",
        (
            F.round(
                F.col("s1").cast("double") / F.col("n1").cast("double")
                - F.col("s0").cast("double") / F.col("n0").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_diff"),
        F.expr(_WT_T_GUARDED).alias("t_stat"),
        F.expr(_WT_DF_GUARDED).alias("welch_df"),
    )
    xt = zz.withColumn("_x", F.abs(F.col("t_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("t_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        "n0",
        "n1",
        "s0",
        "s1",
        "vn0",
        "vn1",
        "mean_diff",
        "t_stat",
        "welch_df",
        (F.round(F.expr(poly), 6) + F.lit(0.0)).alias("p_normal"),
    )


# --- deterministic permutation test ---------------------------------------

_PERM_K = 64


def _perm_oracle() -> str:
    arm = T.h48_duck("doc_id::VARCHAR")
    parm = T.h48_duck("doc_id::VARCHAR || '#' || k::VARCHAR")
    return f"""
WITH d AS (SELECT doc_id, n_chars AS y FROM documents),
obs AS (
  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
         CAST(sum({arm} % 2) AS BIGINT) AS n1,
         CAST(sum(({arm} % 2) * y) AS BIGINT) AS s1
  FROM d
),
ob AS (
  SELECT n, s, n1,
         CAST(n * s1 - n1 * s AS BIGINT) AS num_obs,
         CAST(n1 * (n - n1) AS BIGINT) AS den_obs
  FROM obs
),
pg AS (
  SELECT r.k,
         CAST(sum({parm} % 2) AS BIGINT) AS n1k,
         CAST(sum(({parm} % 2) * y) AS BIGINT) AS s1k
  FROM d, range(1, {_PERM_K + 1}) r(k)
  GROUP BY r.k
),
px AS (
  SELECT p.k,
         CAST(o.n * p.s1k - p.n1k * o.s AS BIGINT) AS numk,
         CAST(p.n1k * (o.n - p.n1k) AS BIGINT) AS denk,
         o.num_obs, o.den_obs
  FROM pg p CROSS JOIN ob o
),
cnt AS (
  SELECT count(*)::BIGINT AS k_perms,
         CAST(sum(CASE WHEN abs(numk) * den_obs >= abs(num_obs) * denk
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM px
)
SELECT o.n, o.n1, o.num_obs, o.den_obs, c.k_perms, c.n_extreme,
       round(CAST(1 + c.n_extreme AS DOUBLE)
             / CAST(c.k_perms + 1 AS DOUBLE), 6) + 0.0 AS p_value
FROM ob o CROSS JOIN cnt c
"""


@staged("permutation_test_chars", oracle=_perm_oracle())
def permutation_test_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic two-sample permutation test — the assumption-free
    twin of ``welch_t_chars_ab`` on the same split and metric: is the
    observed A/B mean gap in document length larger than what re-labeled
    splits produce? Each of the 64 permutations re-assigns every document by
    the portable 48-bit md5 of (doc_id, k) — a pure row function, so
    every task retry, AQE re-plan, and both engines draw the IDENTICAL
    "random" relabelings (no rand(), per the determinism rule the r6
    range-partitioner bug taught).

    Exactness: mean gaps are compared as exact cross-multiplied integer
    rationals — |num_k| * den_obs >= |num_obs| * den_k with num = n*S1 -
    n1*S and den = n1*(n-n1) — so the extreme-count and the (1+x)/(K+1)
    p-value are exact; no float enters until the final 6dp division. The
    degenerate all-one-side relabeling (den_k = 0 forces num_k = 0)
    correctly counts as extreme through the same inequality. int64
    ceiling: |num|*den ~ n^3 * metric^2 caps exact products at ~1e4 docs
    of ~2e3 chars — LOUD on overflow (ANSI/BIGINT checks); past that,
    promote the two products to decimal(38,0) (exact to ~1e12 docs).

    Scale shape: one corpus scan fans out x64 via explode but
    PARTIAL-AGGREGATES map-side to 64 groups, so the exchange carries 64
    rows per input partition, not 64x the corpus; the observed row is a 1-row broadcast."""
    h_obs = f"pmod({T.h48_spark('cast(doc_id as string)')}, 2)"
    h_perm = (
        "pmod("
        + T.h48_spark("concat(cast(doc_id as string), '#', cast(k as string))")
        + ", 2)"
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("y")
    )
    obs = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.expr(h_obs)).cast("long").alias("n1"),
        F.sum(F.expr(h_obs) * F.col("y")).cast("long").alias("s1"),
    )
    ob = obs.select(
        "n",
        "s",
        "n1",
        (F.col("n") * F.col("s1") - F.col("n1") * F.col("s"))
        .cast("long")
        .alias("num_obs"),
        (F.col("n1") * (F.col("n") - F.col("n1"))).cast("long").alias("den_obs"),
    )
    pg = (
        d.select("doc_id", "y", F.explode(F.expr(f"sequence(1, {_PERM_K})")).alias("k"))
        .groupBy("k")
        .agg(
            F.sum(F.expr(h_perm)).cast("long").alias("n1k"),
            F.sum(F.expr(h_perm) * F.col("y")).cast("long").alias("s1k"),
        )
    )
    px = pg.crossJoin(F.broadcast(ob)).select(
        (F.col("n") * F.col("s1k") - F.col("n1k") * F.col("s"))
        .cast("long")
        .alias("numk"),
        (F.col("n1k") * (F.col("n") - F.col("n1k"))).cast("long").alias("denk"),
        "num_obs",
        "den_obs",
    )
    cnt = px.agg(
        F.count(F.lit(1)).cast("long").alias("k_perms"),
        F.sum(
            F.when(
                F.abs(F.col("numk")) * F.col("den_obs")
                >= F.abs(F.col("num_obs")) * F.col("denk"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_extreme"),
    )
    return ob.crossJoin(F.broadcast(cnt)).select(
        "n",
        "n1",
        "num_obs",
        "den_obs",
        "k_perms",
        "n_extreme",
        (
            F.round(
                (1 + F.col("n_extreme")).cast("double")
                / (F.col("k_perms") + 1).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )
