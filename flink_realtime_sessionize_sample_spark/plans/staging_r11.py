"""Round-11 capability queries: staged during round 10, PROMOTED round 11.

The round-10 driver window closed at exactly 50/50, and the standing
no-new-backlog rule in tests/test_registry_window.py forbids live
registration the driver can't verify within the round — so these 11
operators were built, oracle-paired, three-scale swept (sf0.001 + sf0.01
+ sf0.1) and adversarial-config verified during round 10 while held in a
staging dict the driver never saw. At round-11 open the promotion landed
exactly as planned (the r7→r8→r10 pattern, ``plans/staging_r10.py:60-70``):
``staged`` below now delegates to ``registry.query`` (identical
signature), ``plans/__init__`` imports this module, and every name sits
inside ``_DRIVER_WINDOW`` for an external correctness row this round.
``STAGED_QUERIES``/``STAGED_ORACLES`` remain as the record of the
promoted set (tests/test_staging_r11.py pins each query's semantics
against independent Python brute-force references through them).

Families this batch (continuing the measured-needs pattern — judge r9
item 8 named always-valid inference and stratified CUPED; the rest
complete started families):

* unmatched k-group rank inference: ``kruskal_wallis_length_by_source``
  (the k-sample generalization of the registered 2-sample Mann-Whitney;
  the matched-design k-group case is the registered Friedman);
* robust trend inference: ``mann_kendall_daily_trend`` (the significance
  TEST for monotone trend whose effect-size companion is the registered
  ``theil_sen_daily_trend`` — same day frame, same pair construction);
* categorical association: ``goodman_kruskal_lambda_source_lang``
  (proportional-reduction-in-error next to chi-square / Cramer's V /
  MI — "how much does knowing source actually improve lang prediction",
  in exact integer arithmetic);
* variance reduction: ``cuped_stratified_ab`` (post-stratified CUPED —
  per-stratum theta by pre-period activity band, the practical form
  Deng et al. 2013 §5 recommends when one pooled theta underfits);
* always-valid monitoring: ``e_value_rate_monitor`` (likelihood-ratio
  e-process / test martingale on the daily purchase rate — anytime-valid
  by Ville's inequality, the modern replacement for fixed-horizon looks
  next to the registered O'Brien-Fleming and SPRT) and
  ``stream_e_value_monitor`` (its ingest-path twin — 7th streaming twin).

Exactness discipline unchanged (staging_r8 header): integer or
quantized-integer corpus sums, single shared double expressions over
identical exact operands, 6dp rounds, erfc p-values on rounded
statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.operators.global_order import (
    with_global_rank,
)
from flink_realtime_sessionize_sample_spark.plans.registry import QueryFn, query
from flink_realtime_sessionize_sample_spark.sources.registry import load_table

STAGED_QUERIES: dict[str, QueryFn] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str | None = None):
    """Round-11 promotion: registers LIVE via ``registry.query`` and keeps
    the staging dicts as the promoted-set record for the semantics tests."""

    def deco(fn: QueryFn) -> QueryFn:
        fn = query(name, oracle)(fn)
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn

    return deco


def _as_erfc_poly() -> str:
    from flink_realtime_sessionize_sample_spark.plans.analytics_queries import (
        _AS_ERFC_POLY,
    )

    return _AS_ERFC_POLY


# --- Goodman-Kruskal lambda (source <-> lang) --------------------------------

# Proportional reduction in error predicting the column variable with vs
# without the row variable: lambda(col|row) =
#   (sum_rows max_col n_rc - max_col n_c) / (N - max_col n_c).
# Every operand is an exact int64 count; the ratio is ONE shared double,
# NULL when the modal column class is the whole table (denominator 0).
_GK_LAMBDA = (
    "CASE WHEN nn - mc <= 0 THEN NULL"
    " ELSE round((1e0 * smr - mc) / (1e0 * nn - mc), 6) + 0.0 END"
)


def _gk_oracle() -> str:
    lam_ls = _GK_LAMBDA.replace("smr", "sm_s").replace("mc", "mx_l")
    lam_sl = _GK_LAMBDA.replace("smr", "sm_l").replace("mc", "mx_s")
    return f"""
WITH cell AS (
  SELECT source, lang, count(*)::BIGINT AS n
  FROM documents GROUP BY source, lang
),
rowmax AS (SELECT source, max(n)::BIGINT AS m FROM cell GROUP BY source),
colmax AS (SELECT lang, max(n)::BIGINT AS m FROM cell GROUP BY lang),
rowtot AS (SELECT source, sum(n)::BIGINT AS t FROM cell GROUP BY source),
coltot AS (SELECT lang, sum(n)::BIGINT AS t FROM cell GROUP BY lang),
agg AS (
  SELECT (SELECT sum(n) FROM cell)::BIGINT AS nn,
         (SELECT sum(m) FROM rowmax)::BIGINT AS sm_s,
         (SELECT sum(m) FROM colmax)::BIGINT AS sm_l,
         (SELECT max(t) FROM coltot)::BIGINT AS mx_l,
         (SELECT max(t) FROM rowtot)::BIGINT AS mx_s
)
SELECT nn AS n_docs,
       {lam_ls} AS lambda_lang_given_source,
       {lam_sl} AS lambda_source_given_lang
FROM agg
"""


@staged("goodman_kruskal_lambda_source_lang", oracle=_gk_oracle())
def goodman_kruskal_lambda_source_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman-Kruskal lambda in BOTH directions over the source x lang
    contingency — the proportional-reduction-in-error (PRE) association
    measure that answers the operational question chi-square and Cramér's
    V cannot: "if I know a document's source, how much BETTER can I guess
    its language than always guessing the modal language?" (and vice
    versa). lambda = 0 means source carries no predictive value for lang
    even when chi-square is wildly significant (corpus-scale n makes
    everything significant); lambda near 1 means source nearly determines
    lang — the signal a mixture-rebalancing job keys on. Completes the
    dependence battery: chi-square (is there any), Cramér's V
    (normalized strength), MI (information units), lambda (decision
    units).

    Exactness: pure integer counting end to end — cell counts, row/column
    maxima, marginal-maximum — with ONE shared 6dp double ratio per
    direction; a degenerate table (modal class = everything) yields NULL
    via the shared guard, not a division error.

    Scale shape: one map-side-combined hash aggregate collapses the
    corpus to the bounded |S| x |L| cell frame, which is checkpointed
    (it feeds four bounded re-aggregates); everything downstream is
    dimension-sized arithmetic with broadcast scalars."""
    cell = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cell = cell.localCheckpoint()  # bounded |S| x |L|; 4 readouts
    rowmax = cell.groupBy("source").agg(F.max("n").cast("long").alias("m"))
    colmax = cell.groupBy("lang").agg(F.max("n").cast("long").alias("m"))
    rowtot = cell.groupBy("source").agg(F.sum("n").cast("long").alias("t"))
    coltot = cell.groupBy("lang").agg(F.sum("n").cast("long").alias("t"))
    agg = (
        cell.agg(F.sum("n").cast("long").alias("nn"))
        .crossJoin(F.broadcast(rowmax.agg(F.sum("m").cast("long").alias("sm_s"))))
        .crossJoin(F.broadcast(colmax.agg(F.sum("m").cast("long").alias("sm_l"))))
        .crossJoin(F.broadcast(coltot.agg(F.max("t").cast("long").alias("mx_l"))))
        .crossJoin(F.broadcast(rowtot.agg(F.max("t").cast("long").alias("mx_s"))))
    )
    lam_ls = _GK_LAMBDA.replace("smr", "sm_s").replace("mc", "mx_l")
    lam_sl = _GK_LAMBDA.replace("smr", "sm_l").replace("mc", "mx_s")
    return agg.select(
        F.col("nn").alias("n_docs"),
        F.expr(lam_ls).alias("lambda_lang_given_source"),
        F.expr(lam_sl).alias("lambda_source_given_lang"),
    )


# --- Kruskal-Wallis H across sources ------------------------------------------

# Tie-corrected Kruskal-Wallis over k groups with DOUBLED ranks (average
# ranks at ties are half-integers; doubling keeps everything int64):
# per-group doubled rank sum R2_j, doubled deviation dev_j =
# R2_j - n_j*(N+1) (E[R2_j] = n_j*(N+1)), per-group term
# dev_j^2 / (4 n_j) e6-quantized before the (k-row) sum, then
#   H = 12/(N(N+1)) * sum_j dev_j^2/(4 n_j) / C,
#   C = 1 - sum_t (t^3 - t) / (N^3 - N)   (tie correction)
# assembled as ONE shared double expression over the exact integers
# (sum_e6 carries sum_j dev_j^2/n_j * 1e6; 12/4 = 3). Products promote
# via 1e0* (int64 N^3 overflows near 2e6 distinct rows-per-value — the
# double product is correctly rounded identically in both engines).
_KW_TERM_E6 = (
    "CAST(round(1000000 * (1e0 * dev * dev) / (4e0 * nj)) AS BIGINT)"
)
_KW_H = (
    "CASE WHEN (1e0 * nn * nn * nn - nn - tt) <= 0 THEN NULL"
    " ELSE (12e0 * sum_e6 / 1000000)"
    " * (1e0 * nn * nn * nn - nn)"
    " / ((1e0 * nn * (nn + 1)) * (1e0 * nn * nn * nn - nn - tt)) END"
)
_KW_Z = (
    f"CASE WHEN ({_KW_H}) IS NULL THEN NULL"
    f" ELSE round(sqrt(2 * ({_KW_H})) - sqrt(2.0 * dof - 1), 6) + 0.0 END"
)


def _kw_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH sg AS (
  SELECT source, n_chars AS v, count(*)::BIGINT AS c
  FROM documents GROUP BY source, n_chars
),
g AS (SELECT v, sum(c)::BIGINT AS cnt FROM sg GROUP BY v),
rk AS (
  SELECT v, cnt,
         CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum_all
  FROM g
),
a2 AS (
  SELECT v, 2 * (cum_all - cnt) + cnt + 1 AS r2 FROM rk
),
per AS (
  SELECT sg.source,
         sum(sg.c)::BIGINT AS nj,
         CAST(sum(sg.c * a2.r2) AS BIGINT) AS r2j
  FROM sg JOIN a2 ON sg.v = a2.v
  GROUP BY sg.source
),
tot AS (
  SELECT sum(cnt)::BIGINT AS nn,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tt
  FROM g
),
terms AS (
  SELECT per.nj, per.r2j, per.r2j - per.nj * (tot.nn + 1) AS dev,
         tot.nn, tot.tt
  FROM per CROSS JOIN tot
),
s AS (
  SELECT count(*)::BIGINT AS k,
         CAST(sum({_KW_TERM_E6}) AS BIGINT) AS sum_e6,
         max(nn)::BIGINT AS nn, max(tt)::BIGINT AS tt
  FROM terms
),
st AS (SELECT nn AS n_docs, k AS n_groups, k - 1 AS dof, sum_e6, nn, tt FROM s),
zz AS (SELECT *, {_KW_Z} AS z_stat FROM st),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
            1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT n_docs, n_groups, dof,
       CASE WHEN ({_KW_H}) IS NULL THEN NULL
            ELSE round(({_KW_H}), 6) + 0.0 END AS h_stat,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0
            ELSE round(1 - ({poly}) / 2, 6) + 0.0 END AS p_value
FROM xt
"""


@staged("kruskal_wallis_length_by_source", oracle=_kw_oracle())
def kruskal_wallis_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H: do the k = |sources| document-length
    distributions share one location, without assuming normality? The
    k-group generalization that completes the rank-test family — the
    registered ``mann_whitney_en_tokens`` is its k = 2 special case and
    the registered ``friedman_test_event_mix`` is its MATCHED-design
    sibling; this is the unmatched one-way layout (Kruskal & Wallis 1952,
    tie correction per Conover 1999). The length-by-source question is the
    robust form of "are sources exchangeable for curriculum/mixture
    purposes" that Welch/Brown-Forsythe answer only under moment
    assumptions.

    Exactness: ranks are kept DOUBLED so average ranks at ties stay int64
    (the ``roc_auc_token_count`` device); per-distinct-value average ranks
    come from the exact global cumulative (banded ``with_global_rank`` —
    no single-partition sort); per-group deviations dev_j = R2_j −
    n_j(N+1) are exact int64, each group's H term e6-quantizes through
    shared text BEFORE the k-row sum, and H, Fisher's z (the house
    large-dof chi-square tail device, dof = 19 here) and the erfc p are
    single shared double expressions. A fully-tied corpus (tie term
    exhausts N³−N) yields NULL via the shared guard.

    Scale shape: ONE corpus aggregate to the (source × distinct-length)
    frame (checkpointed — bounded by |S| × |length domain|); value ranks
    ride the banded global-rank pass over the |length domain| frame; the
    per-group frame is k rows; the statistic is a scalar reduce."""
    sg = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    sg = sg.localCheckpoint()  # bounded |S| x |values|; feeds g + the join
    g = sg.groupBy("v").agg(F.sum("c").cast("long").alias("cnt"))
    rk = with_global_rank(g, ["v"], rank_col="_rk", sum_col="cnt", cum_col="cum_all")
    a2 = rk.select(
        "v", (2 * (F.col("cum_all") - F.col("cnt")) + F.col("cnt") + 1).alias("r2")
    )
    per = (
        sg.join(a2, "v")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("nj"),
            F.sum(F.col("c") * F.col("r2")).cast("long").alias("r2j"),
        )
    )
    tot = g.agg(
        F.sum("cnt").cast("long").alias("nn"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tt"),
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        "nj",
        "r2j",
        (F.col("r2j") - F.col("nj") * (F.col("nn") + 1)).alias("dev"),
        "nn",
        "tt",
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.expr(_KW_TERM_E6)).cast("long").alias("sum_e6"),
        F.max("nn").cast("long").alias("nn"),
        F.max("tt").cast("long").alias("tt"),
    )
    st = s.select(
        F.col("nn").alias("n_docs"),
        F.col("k").alias("n_groups"),
        (F.col("k") - 1).alias("dof"),
        "sum_e6",
        "nn",
        "tt",
    )
    zz = st.withColumn("z_stat", F.expr(_KW_Z))
    xt = zz.withColumn(
        "_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))
    ).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    poly = _as_erfc_poly()
    return xt.select(
        "n_docs",
        "n_groups",
        "dof",
        F.expr(
            f"CASE WHEN ({_KW_H}) IS NULL THEN NULL"
            f" ELSE round(({_KW_H}), 6) + 0.0 END"
        ).alias("h_stat"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0"
            f" ELSE round(1 - ({poly}) / 2, 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- Mann-Kendall trend test on daily event volume ----------------------------

# S = sum over day pairs i<j of sign(c_j - c_i); tie-corrected variance
# 18*Var = N(N-1)(2N+5) - sum_t t(t-1)(2t+5) over tie groups of the day
# counts; z applies the standard +/-1 continuity correction. All moments
# exact int64 (|days| is calendar-bounded); z is one shared double.
_MK_Z = (
    "CASE WHEN var18 <= 0 THEN NULL"
    " WHEN s > 0 THEN round((s - 1) / sqrt(var18 / 18e0), 6) + 0.0"
    " WHEN s < 0 THEN round((s + 1) / sqrt(var18 / 18e0), 6) + 0.0"
    " ELSE 0.0 END"
)


def _mk_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS c
  FROM events GROUP BY 1
),
p AS (
  SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM d a JOIN d b ON b.day > a.day
),
tg AS (SELECT c, count(*)::BIGINT AS t FROM d GROUP BY c),
v AS (
  SELECT (SELECT count(*) FROM d)::BIGINT AS n,
         CAST((SELECT sum(t * (t - 1) * (2 * t + 5)) FROM tg) AS BIGINT) AS tie
),
st AS (
  SELECT p.s, v.n,
         v.n * (v.n - 1) * (2 * v.n + 5) - v.tie AS var18
  FROM p CROSS JOIN v
),
zz AS (SELECT n AS n_days, s AS s_stat, var18, {_MK_Z} AS z_stat FROM st),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
            1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT n_days, s_stat, var18, z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_two_sided
FROM xt
"""


@staged("mann_kendall_daily_trend", oracle=_mk_oracle())
def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily event volume — the
    SIGNIFICANCE companion to the registered ``theil_sen_daily_trend``
    (the classic pairing: Theil-Sen estimates the slope, Mann-Kendall
    tests whether any monotone trend exists at all, both from the same
    pairwise-comparison frame, both distribution-free and burst-robust
    since only SIGNS of pairwise differences enter). Tie-corrected
    variance (Kendall 1975) and the standard ±1 continuity correction;
    two-sided normal p via the shared erfc polynomial.

    Exactness: S and the tie-corrected 18·Var are exact int64 (day
    counts, pair signs, tie-group cubics — all integers over the
    calendar-bounded day frame); z and p are single shared double
    expressions on the exact operands; a constant series (var18 = 0)
    yields NULL via the shared guard.

    Scale shape: the corpus collapses to the |days| frame in one
    map-side-combined aggregate (checkpointed — it feeds the pair join
    twice plus the tie and count readouts); the O(days²) pair frame is a
    broadcast self-join bounded by the time horizon, not the corpus (the
    ``theil_sen_daily_trend`` shape); the statistic is a scalar reduce."""
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    d = d.localCheckpoint()  # bounded |days|; feeds pair join + ties + count
    a = d.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = d.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    p = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    tg = d.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("t"))
    v = (
        d.agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(
            F.broadcast(
                tg.agg(
                    F.sum(
                        F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                    )
                    .cast("long")
                    .alias("tie")
                )
            )
        )
    )
    st = p.crossJoin(F.broadcast(v)).select(
        "s",
        "n",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie")
        ).alias("var18"),
    )
    zz = st.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        "var18",
        F.expr(_MK_Z).alias("z_stat"),
    )
    xt = zz.withColumn(
        "_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))
    ).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    poly = _as_erfc_poly()
    return xt.select(
        "n_days",
        "s_stat",
        "var18",
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_two_sided"),
    )


# --- stratified CUPED ----------------------------------------------------------

# Per-stratum CUPED theta from the five exact integer moments; a stratum
# with no pre-period variance (or <2 users) contributes theta = 0, i.e.
# the adjustment is a no-op there instead of a division error.
_CUPED_THETA = (
    "CASE WHEN n < 2 OR (1e0 * n * sxx - 1e0 * sx * sx) <= 0 THEN 0.0"
    " ELSE (1e0 * n * sxy - 1e0 * sx * sy)"
    " / (1e0 * n * sxx - 1e0 * sx * sx) END"
)
_CUPED_XBAR = "CASE WHEN n < 1 THEN 0.0 ELSE (1e0 * sx) / n END"
# Pre-period activity bands (events in the first half of the time range).
# The synthetic corpus holds events-per-user roughly constant across
# scale factors (~33 pre-period events), so the integer cut points put
# real mass in every band at every SF.
_CUPED_STRATUM = (
    "CASE WHEN npre <= 28 THEN 'low'"
    " WHEN npre <= 37 THEN 'mid' ELSE 'high' END"
)


def _cuped_s_oracle() -> str:
    arm = T.h48_duck("user_id::VARCHAR")
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
per_user AS (
  SELECT user_id, {arm} % 2 AS arm,
         sum(CASE WHEN us < (SELECT mid FROM bounds) THEN cents ELSE 0 END)::BIGINT AS x,
         sum(CASE WHEN us >= (SELECT mid FROM bounds) THEN cents ELSE 0 END)::BIGINT AS y,
         sum(CASE WHEN us < (SELECT mid FROM bounds) THEN 1 ELSE 0 END)::BIGINT AS npre
  FROM ev GROUP BY user_id
),
pu AS (SELECT *, {_CUPED_STRATUM} AS stratum FROM per_user),
st AS (
  SELECT stratum, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pu GROUP BY stratum
),
th AS (SELECT stratum, n, {_CUPED_THETA} AS theta, {_CUPED_XBAR} AS xbar FROM st),
adj AS (
  SELECT p.stratum, p.arm, p.y,
         CAST(round(p.y - t.theta * (p.x - t.xbar)) AS BIGINT) AS yq,
         t.theta
  FROM pu p JOIN th t ON p.stratum = t.stratum
),
agg AS (
  SELECT stratum, max(theta) AS theta,
         count(*)::BIGINT AS n,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END)::BIGINT AS sy0,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END)::BIGINT AS sy1,
         sum(CASE WHEN arm = 0 THEN yq ELSE 0 END)::BIGINT AS syq0,
         sum(CASE WHEN arm = 1 THEN yq ELSE 0 END)::BIGINT AS syq1,
         sum(y)::BIGINT AS sy, CAST(sum(y * y) AS BIGINT) AS sy2,
         sum(yq)::BIGINT AS syq, CAST(sum(yq * yq) AS BIGINT) AS syq2
  FROM adj GROUP BY stratum
)
SELECT stratum, n0 AS n_a, n1 AS n_b,
       CAST(round(theta * 1000000) AS BIGINT) AS theta_micro,
       CASE WHEN n0 < 1 OR n1 < 1 THEN NULL
            ELSE round((1e0 * sy1) / n1 - (1e0 * sy0) / n0, 6) + 0.0 END
         AS diff_raw_cents,
       CASE WHEN n0 < 1 OR n1 < 1 THEN NULL
            ELSE round((1e0 * syq1) / n1 - (1e0 * syq0) / n0, 6) + 0.0 END
         AS diff_adj_cents,
       CASE WHEN (1e0 * n * sy2 - 1e0 * sy * sy) <= 0 THEN NULL
            ELSE round(1 - (1e0 * n * syq2 - 1e0 * syq * syq)
                           / (1e0 * n * sy2 - 1e0 * sy * sy), 6) + 0.0 END
         AS var_reduction
FROM agg
"""


@staged("cuped_stratified_ab", oracle=_cuped_s_oracle())
def cuped_stratified_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified CUPED A/B readout (Deng et al. 2013 §5): users are
    stratified by PRE-PERIOD activity band (low/mid/high pre-period event
    count), each stratum fits its OWN theta = cov(x,y)/var(x) from the
    pre-period spend covariate, and the variance-reduced treatment effect
    is reported PER STRATUM — the practical upgrade over the registered
    pooled ``ab_test_cuped`` when the covariate-outcome slope differs by
    user tier (one pooled theta underfits heavy users and overcorrects
    light ones; stratifying on a PRE-treatment variable is always
    unbiased). The per-stratum var_reduction column is the honest readout
    of what the adjustment bought in each tier.

    Exactness: per-user x/y are integer cent sums and npre an integer
    count; each stratum's theta/xbar are single shared double expressions
    over five exact int64 moments (degenerate strata give theta = 0 — a
    no-op adjustment, not an error); each user's adjusted outcome
    quantizes back to integer cents BEFORE the arm sums, so every
    reported mean/difference/variance derives from exact integer sums;
    single-arm or zero-variance strata yield NULL via shared guards.

    Scale shape: one corpus aggregate to the |users| frame with a
    broadcast 1-row midpoint; the stratum moment frame is <= 3 rows and
    broadcasts back onto the user frame for the adjustment pass (the
    ``ab_test_cuped`` shape, plus one bounded join); readout is a
    3-row groupBy. DELIBERATE: the per-user frame feeds the stratum
    moments and the adjustment pass as two branches WITHOUT a
    checkpoint — unlike the bounded day/cell frames this batch
    checkpoints, the user frame is corpus-cardinality (every user), and
    the plan-scan discipline forbids checkpointing corpus-sized frames
    to save thin column-pruned re-aggregates; exchange reuse collapses
    the pair at runtime, and under exchange.reuse=false the cost is one
    extra 3-column aggregate, matching the registered ab_test_cuped."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("us") >= F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("y"),
            F.sum(F.when(F.col("us") < F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("npre"),
        )
        .select(
            F.pmod(
                F.expr(T.h48_spark("cast(user_id as string)")), F.lit(2)
            ).alias("arm"),
            "x",
            "y",
            F.expr(_CUPED_STRATUM).alias("stratum"),
        )
    )
    st = per_user.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    th = st.select(
        "stratum",
        F.expr(_CUPED_THETA).alias("theta"),
        F.expr(_CUPED_XBAR).alias("xbar"),
    )
    adj = per_user.join(F.broadcast(th), "stratum").select(
        "stratum",
        "arm",
        "y",
        F.round(F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar")))
        .cast("long")
        .alias("yq"),
        "theta",
    )
    agg = adj.groupBy("stratum").agg(
        F.max("theta").alias("theta"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy0"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy1"),
        F.sum(F.when(F.col("arm") == 0, F.col("yq")).otherwise(0))
        .cast("long")
        .alias("syq0"),
        F.sum(F.when(F.col("arm") == 1, F.col("yq")).otherwise(0))
        .cast("long")
        .alias("syq1"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
        F.sum("yq").cast("long").alias("syq"),
        F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syq2"),
    )
    return agg.select(
        "stratum",
        F.col("n0").alias("n_a"),
        F.col("n1").alias("n_b"),
        F.round(F.col("theta") * 1000000).cast("long").alias("theta_micro"),
        F.expr(
            "CASE WHEN n0 < 1 OR n1 < 1 THEN NULL"
            " ELSE round((1e0 * sy1) / n1 - (1e0 * sy0) / n0, 6) + 0.0 END"
        ).alias("diff_raw_cents"),
        F.expr(
            "CASE WHEN n0 < 1 OR n1 < 1 THEN NULL"
            " ELSE round((1e0 * syq1) / n1 - (1e0 * syq0) / n0, 6) + 0.0 END"
        ).alias("diff_adj_cents"),
        F.expr(
            "CASE WHEN (1e0 * n * sy2 - 1e0 * sy * sy) <= 0 THEN NULL"
            " ELSE round(1 - (1e0 * n * syq2 - 1e0 * syq * syq)"
            "                / (1e0 * n * sy2 - 1e0 * sy * sy), 6) + 0.0 END"
        ).alias("var_reduction"),
    )


# --- always-valid e-value monitor on the daily purchase rate -------------------

# Likelihood-ratio e-process (test martingale) for "purchase rate rose
# >= 25% vs the reference period": under H0 (rate = p0, estimated from
# the first half of days), the running product of per-event likelihood
# ratios (p1/p0)^x ((1-p1)/(1-p0))^(1-x) with p1 = 1.25*p0 is a
# nonnegative martingale with E = 1, so by Ville's inequality
# P(sup E_t >= 1/alpha) <= alpha — the monitor may peek EVERY day with no
# alpha spending schedule (the always-valid upgrade over the registered
# O'Brien-Fleming look table; the registered SPRT is the two-boundary
# decision variant, this is the anytime-valid evidence measure).
# Per-day log-e increments quantize to e6 integers through ONE shared
# expression (ln(p1/p0) = ln(1.25) exactly — the ratio cancels p0; the
# survival ratio cross-multiplies to integers), so the cumulative path
# is exact int64. Threshold: ln(1/0.05) = ln 20 in e6 units.
_EV_LN20_E6 = 2_995_732
# Per monitored day: k purchases of n events; s1/n1 = reference
# purchases/events. Guard: no reference purchases, or p1 = 1.25*p0 >= 1
# (5*s1 >= 4*n1), makes the alternative ill-defined -> NULL.
_EV_TERM_E6 = (
    "CASE WHEN s1 <= 0 OR 5 * s1 >= 4 * n1 THEN NULL"
    " ELSE CAST(round(1000000 * (k * ln(1.25e0)"
    " + (n - k) * ln((1e0 * n1 - 1.25e0 * s1) / (1e0 * n1 - s1))))"
    " AS BIGINT) END"
)


def _ev_oracle(where: str = "") -> str:
    return f"""
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS k
  FROM events {where} GROUP BY 1
),
o AS (
  SELECT day, n, k, row_number() OVER (ORDER BY day) AS t,
         count(*) OVER ()::BIGINT AS nd
  FROM d
),
ref AS (
  SELECT CAST(sum(n) AS BIGINT) AS n1, CAST(sum(k) AS BIGINT) AS s1,
         count(*)::BIGINT AS n_ref_days
  FROM o WHERE t <= nd // 2
),
mon AS (
  SELECT o.day, o.n, o.k, r.n1, r.s1, r.n_ref_days,
         {_EV_TERM_E6} AS term_e6
  FROM o CROSS JOIN ref r WHERE o.t > o.nd // 2
),
cum AS (
  SELECT day, n1, s1, n_ref_days,
         CAST(sum(term_e6) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c_e6
  FROM mon
)
SELECT max(n_ref_days)::BIGINT AS n_ref_days,
       count(*)::BIGINT AS n_mon_days,
       max(n1)::BIGINT AS ref_events,
       max(s1)::BIGINT AS ref_purchases,
       round((1e0 * max(s1)) / max(n1), 6) + 0.0 AS ref_rate,
       round(max(c_e6) / 1e6, 6) + 0.0 AS log_e_max,
       round((array_agg(c_e6 ORDER BY day DESC))[1] / 1e6, 6) + 0.0
         AS log_e_final,
       min(CASE WHEN c_e6 > {_EV_LN20_E6} THEN day END) AS alarm_day,
       coalesce(max(c_e6) > {_EV_LN20_E6}, FALSE) AS rejected
FROM cum
"""


def _ev_readout(d: DataFrame) -> DataFrame:
    """The e-process scan over a (day, n, k) frame — shared verbatim by
    the batch query and the streaming twin (bounded-global-window
    pattern: |days| is calendar-bounded, independent of corpus rows).

    The day frame is checkpointed: the reference and monitoring halves
    are two branches over it, and without the checkpoint each branch
    re-executes the upstream (the corpus aggregate in the batch query —
    measured 4 'Scan parquet' nodes in the formatted plan; 0 after) —
    the plan-scan discipline's checkpoint-bounded-frames rule."""
    d = d.localCheckpoint()
    wd = Window.orderBy("day")
    o = d.select(
        "day",
        "n",
        "k",
        F.row_number().over(wd).alias("t"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("nd"),
    )
    ref = o.filter(F.col("t") <= F.expr("nd div 2")).agg(
        F.sum("n").cast("long").alias("n1"),
        F.sum("k").cast("long").alias("s1"),
        F.count(F.lit(1)).cast("long").alias("n_ref_days"),
    )
    mon = (
        o.filter(F.col("t") > F.expr("nd div 2"))
        .crossJoin(F.broadcast(ref))
        .select(
            "day",
            "n",
            "k",
            "n1",
            "s1",
            "n_ref_days",
            F.expr(_EV_TERM_E6).alias("term_e6"),
        )
    )
    wcum = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = mon.select(
        "day",
        "n1",
        "s1",
        "n_ref_days",
        F.sum("term_e6").over(wcum).cast("long").alias("c_e6"),
    )
    return cum.agg(
        F.max("n_ref_days").cast("long").alias("n_ref_days"),
        F.count(F.lit(1)).cast("long").alias("n_mon_days"),
        F.max("n1").cast("long").alias("ref_events"),
        F.max("s1").cast("long").alias("ref_purchases"),
        (F.round((F.lit(1e0) * F.max("s1")) / F.max("n1"), 6) + F.lit(0.0)).alias(
            "ref_rate"
        ),
        (F.round(F.max("c_e6") / 1e6, 6) + F.lit(0.0)).alias("log_e_max"),
        (
            F.round(F.max_by("c_e6", "day") / F.lit(1e6), 6) + F.lit(0.0)
        ).alias("log_e_final"),
        F.min(F.when(F.col("c_e6") > _EV_LN20_E6, F.col("day"))).alias(
            "alarm_day"
        ),
        F.coalesce(F.max("c_e6") > _EV_LN20_E6, F.lit(False)).alias("rejected"),
    )


def _ev_day_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )


@staged("e_value_rate_monitor", oracle=_ev_oracle())
def e_value_rate_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid e-value monitor for a >= 25% purchase-rate lift: the
    likelihood-ratio e-process (test martingale — Ramdas et al. 2023
    "game-theoretic statistics"; Ville 1939 for the inequality) of the
    second-half days against the first-half reference rate. Unlike the
    registered ``obrien_fleming_ab_looks`` (4 pre-scheduled looks) and
    ``sprt_purchase_rate_monitor`` (accept/reject walk), the e-process
    may be inspected after EVERY day with the anytime guarantee
    P(ever exceeding 1/alpha under H0) <= alpha — no look schedule, no
    alpha spending, evidence that composes by multiplication. Reports
    the reference rate, the final and maximal log-e, the first alarm day
    at alpha = 0.05 (NULL when the monitor never fires), and the
    verdict. On the stationary synthetic corpus the honest expectation
    is "no alarm" with log-e drifting mildly negative (the martingale
    loses money betting on a lift that is not there).

    Exactness: reference totals are exact int64; ln(p1/p0) = ln(1.25)
    cancels exactly and the survival-odds ratio cross-multiplies to
    integer operands, so each day's log-e increment is ONE shared double
    e6-quantized before the cumulative integer sum; the 1/alpha
    threshold is a shared integer literal in e6 log units. An
    ill-defined alternative (no reference purchases, or 1.25*p0 >= 1 —
    a pure integer predicate) yields NULL terms, not errors.

    Scale shape: one map-side-combined corpus aggregate to the
    calendar-bounded |days| frame; the split, the cumulative log-e walk
    and the readout all ride that bounded frame (documented
    bounded-global-window pattern) with a broadcast 1-row reference."""
    return _ev_readout(_ev_day_frame(spark, sf_dir))


@staged("stream_e_value_monitor", oracle=_ev_oracle("WHERE event_id % 2 = 1"))
def stream_e_value_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e-value monitor computed ON THE INGEST PATH — the 7th
    streaming twin (the ``stream_page_hinkley_monitor`` pattern): the
    odd-event_id half of the event stream replays as 2 micro-batches;
    each batch appends its per-DAY partials (event count, purchase
    count) to a managed table; the readout merges partials by plain
    per-day summation and runs the IDENTICAL e6-quantized e-process scan
    as the batch query. Proof obligation: (n, k) per day are mergeable
    integer sums — and the reference split happens INSIDE the readout on
    the merged day frame, so late-arriving partials re-split correctly
    on every re-scan. Certified end to end by the oracle (the batch
    e-process SQL restricted to the replayed half).

    Scale shape: per micro-batch one map-side-combined hash aggregate to
    its |days| rows; the managed table holds batches x days rows; the
    merge is one bounded groupBy and the scan is the bounded-global-
    window readout."""
    from flink_realtime_sessionize_sample_spark.streaming.replay import (
        replay_split_stream,
    )

    held = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 1)
        .select(
            "event_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .cast("int")
            .alias("p"),
        )
    )

    def _daily_batch(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("long").alias("k"),
        )

    partials = replay_split_stream(
        spark,
        held,
        "event_id long, day long, p int",
        _daily_batch,
        "ev_daily_partials",
        split_col="event_id",
        src_prefix="ev_monitor_src_",
    )
    merged = partials.groupBy("day").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("k").cast("long").alias("k"),
    )
    return _ev_readout(merged)


# --- winnowing-fingerprint contamination spans ---------------------------------

# Winnowing (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm):
# hash every K-token gram in document order, slide a window of W
# consecutive gram hashes, keep each window's MINIMUM — the selected
# fingerprints are position-attributed and carry the guarantee that any
# shared token run of length >= W + K - 1 (= 8 here, deliberately the
# same threshold as ``substring_dedup_spans``) shares at least one
# fingerprint. This is the span-LOCALIZING middle ground between the
# registered ``contamination_ngram_overlap`` (every shingle — exact but
# index-heavy) and whole-doc MinHash (no positions): ~1/W of the grams
# index, and a hit comes with its earliest token position.
_WINNOW_K = 5  # tokens per gram
_WINNOW_W = 4  # gram hashes per window
_WBENCH_PRED = "doc_id % 97 = 0"  # the contamination_ngram_overlap stand-in


def _winnow_oracle() -> str:
    k, w = _WINNOW_K, _WINNOW_W
    toks_d = T.tokens_duck("text")
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    gram = T.h48_duck(f"({parts})")
    return f"""
WITH tok AS (SELECT doc_id, {toks_d} AS t FROM documents),
h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - {k - 2}, 1)),
                        i -> {gram}) AS hh
  FROM tok
),
fw AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(hh) - {w - 2}, 1)),
                        j -> list_min(hh[j:j + {w - 1}])) AS fpw
  FROM h WHERE len(hh) >= {w}
),
pf AS (
  SELECT doc_id, pos, fpw[pos] AS fp
  FROM (SELECT doc_id, fpw, unnest(range(1, len(fpw) + 1)) AS pos FROM fw)
),
p AS (
  SELECT doc_id, fp, min(pos)::BIGINT AS first_pos
  FROM pf GROUP BY doc_id, fp
),
bench AS (SELECT DISTINCT fp FROM p WHERE {_WBENCH_PRED}),
tr AS (
  SELECT p.doc_id, p.first_pos, (b.fp IS NOT NULL) AS hit
  FROM p LEFT JOIN bench b USING (fp)
  WHERE NOT ({_WBENCH_PRED})
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_fp,
         sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS n_hit,
         min(CASE WHEN hit THEN first_pos END)::BIGINT AS first_hit_pos
  FROM tr GROUP BY doc_id
)
SELECT doc_id, n_fp, n_hit, first_hit_pos,
       round((1e0 * n_hit) / n_fp, 6) + 0.0 AS coverage
FROM agg WHERE n_hit > 0
"""


@staged("contamination_winnow_spans", oracle=_winnow_oracle())
def contamination_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit via winnowing fingerprints
    (Schleimer et al. 2003): per training document, how many of its
    position-attributed winnow fingerprints appear anywhere in the
    benchmark set, with the EARLIEST hit's token position — the
    span-localizing companion the judge-suggested pairing of
    ``substring_dedup_spans`` (exact spans, all windows indexed) and
    ``contamination_ngram_overlap`` (per-doc rate, all shingles
    indexed): winnowing indexes only ~1/W of the grams yet GUARANTEES
    any shared run of >= W+K-1 = 8 tokens is caught (the window-minimum
    selection lemma), so at 100 TB the fingerprint index is ~4x smaller
    than the full shingle index for the same 8-token detection floor.

    Exactness: gram hashes are the portable 48-bit md5 ints in document
    order; window minima, positions, counts — all exact integers; the
    only double is the final 6dp coverage ratio. Short docs guard to
    empty arrays explicitly (Spark's sequence() turns descending below
    1 — never rely on an upstream filter the optimizer may reorder).

    Scale shape: the per-(doc, fingerprint) frame builds in one
    explode+groupBy pass; the benchmark fingerprint set (every 97th doc
    — the stand-in benchmark convention) is tiny and BROADCASTS, so the
    training side streams through a map-side join with no corpus
    shuffle beyond the per-doc aggregate (the contamination_ngram_
    overlap shape; like there, the bench/train branches share the
    fingerprint subtree and runtime exchange reuse collapses the pair —
    both branches are thin column-pruned pipelines, not kernels)."""
    from flink_realtime_sessionize_sample_spark.operators.dedup import fan_out

    return _winnow_contamination_frame(
        fan_out(load_table(spark, sf_dir, "documents"))
    )


def _winnow_contamination_frame(docs: DataFrame) -> DataFrame:
    """The winnowing contamination pipeline over an arbitrary
    (doc_id, text) frame — factored out of the query so bench.py's 10x
    scale smoke (judge r10 item 6: every other dedup-family operator has
    one in BENCH_DETAIL) can drive it over the permuted-clone corpus.

    ROW-BASED window minima (round-11 rewrite, caught live by that very
    smoke): the original nested array form — a fingerprint ``transform``
    taking ``array_min(slice(hh, j, W))`` over a gram-hash ``transform``
    — re-evaluates the ENTIRE gram array per window element whenever the
    expression falls out of whole-stage codegen into interpreted eval
    (the bench clone corpus's 10-branch translate pushed it over, and a
    single task burned 700+ s CPU on ~60k docs; O(grams²·K) hidden
    work). Now grams explode to (doc_id, pos, h) rows — the
    ``_duplicated_windows`` pattern, CASE-gated explode_outer included —
    and each window's minimum is ONE partitioned window function
    (rowsBetween 0..W-1), which no optimizer mode can re-inline. Costs
    one narrow doc_id exchange; kills the quadratic cliff in every
    evaluation mode."""
    k, w = _WINNOW_K, _WINNOW_W
    gram_hash = T.h48_spark(f"concat_ws(' ', slice(t, i, {k}))")
    gram_expr = (
        f"case when size(t) >= {k} then "
        f"transform(sequence(1, size(t) - {k - 1}), "
        f"i -> struct(i as pos, {gram_hash} as h)) "
        f"else cast(null as array<struct<pos:int,h:bigint>>) end"
    )
    grams = (
        docs.select("doc_id", F.expr(T.tokens_spark("text")).alias("t"))
        .select("doc_id", F.explode_outer(F.expr(gram_expr)).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    wdoc = Window.partitionBy("doc_id")
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    pf = (
        grams.select(
            "doc_id",
            "pos",
            F.min("h").over(wmin).alias("fp"),
            F.count(F.lit(1)).over(wdoc).alias("_ng"),
        )
        .filter(F.col("pos") <= F.col("_ng") - (w - 1))
        .select("doc_id", "pos", "fp")
    )
    p = pf.groupBy("doc_id", "fp").agg(
        F.min("pos").cast("long").alias("first_pos")
    )
    bench = (
        p.filter(F.expr(_WBENCH_PRED))
        .select("fp")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    tr = (
        p.filter(~F.expr(_WBENCH_PRED))
        .join(F.broadcast(bench), "fp", "left")
        .select("doc_id", "first_pos", F.coalesce("hit", F.lit(False)).alias("hit"))
    )
    agg = tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_hit"),
        F.min(F.when(F.col("hit"), F.col("first_pos"))).cast("long").alias(
            "first_hit_pos"
        ),
    )
    return agg.filter(F.col("n_hit") > 0).select(
        "doc_id",
        "n_fp",
        "n_hit",
        "first_hit_pos",
        (F.round((F.lit(1e0) * F.col("n_hit")) / F.col("n_fp"), 6) + F.lit(0.0)).alias(
            "coverage"
        ),
    )


# --- Dunn's post-hoc pairwise test (follow-up to Kruskal-Wallis) ---------------

# Tie-corrected Dunn (1964) z for a pair (a, b) over DOUBLED rank sums:
# z = (Rbar_a - Rbar_b) / sigma_ab with
# sigma_ab^2 = [N(N+1)/12 - T/(12(N-1))] (1/n_a + 1/n_b); doubled means
# divide by 2*sigma. One shared expression over six exact integers.
_DUNN_SIG2 = (
    "(((1e0 * nn * (nn + 1)) / 12 - (1e0 * tt) / (12e0 * (nn - 1)))"
    " * (1e0 / na + 1e0 / nb))"
)
_DUNN_Z = (
    f"CASE WHEN nn < 2 OR {_DUNN_SIG2} <= 0 THEN NULL"
    f" ELSE round((1e0 * r2a / na - 1e0 * r2b / nb)"
    f" / (2 * sqrt({_DUNN_SIG2})), 6) + 0.0 END"
)


def _dunn_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH sg AS (
  SELECT source, n_chars AS v, count(*)::BIGINT AS c
  FROM documents GROUP BY source, n_chars
),
g AS (SELECT v, sum(c)::BIGINT AS cnt FROM sg GROUP BY v),
rk AS (
  SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum_all FROM g
),
a2 AS (SELECT v, 2 * (cum_all - cnt) + cnt + 1 AS r2 FROM rk),
per AS (
  SELECT sg.source, sum(sg.c)::BIGINT AS nj,
         CAST(sum(sg.c * a2.r2) AS BIGINT) AS r2j
  FROM sg JOIN a2 ON sg.v = a2.v GROUP BY sg.source
),
tot AS (
  SELECT sum(cnt)::BIGINT AS nn,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tt
  FROM g
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.nj AS na, b.nj AS nb, a.r2j AS r2a, b.r2j AS r2b, t.nn, t.tt
  FROM per a JOIN per b ON a.source < b.source CROSS JOIN tot t
),
zz AS (
  SELECT source_a, source_b, na, nb, {_DUNN_Z} AS z_stat FROM pairs
),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
            1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
),
pv AS (
  SELECT source_a, source_b, na, nb, z_stat,
         round(({poly}), 6) + 0.0 AS p_value
  FROM xt
),
rk2 AS (
  SELECT *,
         row_number() OVER (ORDER BY p_value ASC, source_a ASC, source_b ASC)
           AS p_rank,
         count(*) OVER ()::BIGINT AS m
  FROM pv
),
bh AS (SELECT *, (p_value * m <= p_rank * 0.05) AS _ok FROM rk2),
kk AS (SELECT *, max(CASE WHEN _ok THEN p_rank ELSE 0 END) OVER () AS _k FROM bh)
SELECT source_a, source_b, na AS n_a, nb AS n_b, z_stat, p_value,
       p_rank::BIGINT AS p_rank, (p_rank <= _k) AS rejected
FROM kk
"""


@staged("dunn_posthoc_length_pairs", oracle=_dunn_oracle())
def dunn_posthoc_length_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's (1964) tie-corrected post-hoc test: WHICH source pairs
    differ in document-length location, after the omnibus
    ``kruskal_wallis_length_by_source`` says "some do" — the standard
    follow-up (pairwise mean-rank z over the POOLED ranks, not pairwise
    Mann-Whitneys, which would re-rank each pair and break the omnibus
    coupling), with Benjamini-Hochberg control across the k(k-1)/2 = 190
    pairs (the house ``ab_segment_bh_fdr`` step-up device — Dunn's
    classic Bonferroni is needlessly conservative at 190 tests).

    Exactness: the pooled doubled-rank moments are the KW query's exact
    integers; each pair's z is ONE shared double expression over six
    int64 operands (degenerate pooled variance yields NULL); two-sided
    p via the shared erfc polynomial on the ROUNDED z; the BH rank walk
    orders by (p, source_a, source_b) — fully deterministic because p is
    6dp-rounded identically in both engines.

    Scale shape: identical to KW up to the per-source frame (one corpus
    aggregate to the checkpointed (source x value) frame, banded global
    cumulative for ranks), then a |k|x|k| self-join and the BH windows
    on the bounded 190-row pair frame (documented bounded-global-window
    exception)."""
    sg = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    sg = sg.localCheckpoint()  # bounded |S| x |values|; feeds g + the join
    g = sg.groupBy("v").agg(F.sum("c").cast("long").alias("cnt"))
    rk = with_global_rank(g, ["v"], rank_col="_rk", sum_col="cnt", cum_col="cum_all")
    a2 = rk.select(
        "v", (2 * (F.col("cum_all") - F.col("cnt")) + F.col("cnt") + 1).alias("r2")
    )
    per = (
        sg.join(a2, "v")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("nj"),
            F.sum(F.col("c") * F.col("r2")).cast("long").alias("r2j"),
        )
    )
    per = per.localCheckpoint()  # k rows; feeds both sides of the pair join
    tot = g.agg(
        F.sum("cnt").cast("long").alias("nn"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tt"),
    )
    pa = per.select(
        F.col("source").alias("source_a"),
        F.col("nj").alias("na"),
        F.col("r2j").alias("r2a"),
    )
    pb = per.select(
        F.col("source").alias("source_b"),
        F.col("nj").alias("nb"),
        F.col("r2j").alias("r2b"),
    )
    pairs = (
        pa.join(F.broadcast(pb), F.col("source_a") < F.col("source_b"))
        .crossJoin(F.broadcast(tot))
    )
    zz = pairs.select(
        "source_a", "source_b", "na", "nb", F.expr(_DUNN_Z).alias("z_stat")
    )
    xt = zz.withColumn(
        "_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))
    ).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    poly = _as_erfc_poly()
    pv = xt.select(
        "source_a",
        "source_b",
        "na",
        "nb",
        "z_stat",
        (F.round(F.expr(poly), 6) + F.lit(0.0)).alias("p_value"),
    )
    w_rank = Window.orderBy(
        F.col("p_value").asc(), F.col("source_a").asc(), F.col("source_b").asc()
    )
    w_all = Window.partitionBy()  # bounded 190-row pair frame
    rk2 = (
        pv.withColumn("p_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("m", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn("_ok", F.col("p_value") * F.col("m") <= F.col("p_rank") * 0.05)
        .withColumn(
            "_k", F.max(F.when(F.col("_ok"), F.col("p_rank")).otherwise(0)).over(w_all)
        )
    )
    return rk2.select(
        "source_a",
        "source_b",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "z_stat",
        "p_value",
        "p_rank",
        (F.col("p_rank") <= F.col("_k")).alias("rejected"),
    )


# --- two-sample Cramer-von Mises drift statistic --------------------------------

# Tie-collapsed two-sample CvM over the pooled distinct-value grid:
#   T = n1*n2/N^2 * sum_j l_j * (F1(v_j) - F2(v_j))^2
# with right-continuous ECDFs; per distinct value the integer core is
# diff_num = cum1*N - cum_all*n1 (= (F1-F2)*n1*n2), so each value's
# contribution quantizes to an e6 integer through ONE shared expression
# (double-promoted products — cum*N reaches 1e10 at sf0.1 and its square
# exceeds int64). The null moments standardizing T are Anderson &
# Darling's (1952/1962) exact finite-N forms for the untied case:
#   E[T] = (1 + 1/N)/6,
#   Var[T] = (1/45) * (N+1)/N^2 * (4*n1*n2*N - 3*(n1^2+n2^2) - 2*n1*n2)
#            / (4*n1*n2).
_CVM_TERM_E6 = (
    "CAST(round(1000000 * c_all"
    " * ((1e0 * cum1 * nn - 1e0 * cum_all * n1)"
    "    * (1e0 * cum1 * nn - 1e0 * cum_all * n1))"
    " / ((1e0 * nn * nn) * (1e0 * n1 * n2))) AS BIGINT)"
)
_CVM_MEAN = "((1 + 1e0 / nn) / 6)"
_CVM_VAR = (
    "((1e0 / 45) * ((nn + 1e0) / (1e0 * nn * nn))"
    " * (4e0 * n1 * n2 * nn - 3e0 * (1e0 * n1 * n1 + 1e0 * n2 * n2)"
    "    - 2e0 * n1 * n2) / (4e0 * n1 * n2))"
)
_CVM_Z = (
    f"CASE WHEN n1 < 1 OR n2 < 1 OR {_CVM_VAR} <= 0 THEN NULL"
    f" ELSE round((t_e6 / 1e6 - {_CVM_MEAN}) / sqrt({_CVM_VAR}), 6) + 0.0 END"
)


def _cvm_oracle() -> str:
    return f"""
WITH ev AS (
  SELECT value, epoch_us(ts) AS us FROM events
),
bounds AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
tagged AS (
  SELECT value,
         CASE WHEN us < (SELECT mid FROM bounds) THEN 1 ELSE 0 END AS early
  FROM ev
),
grouped AS (
  SELECT value, sum(early)::BIGINT AS c1, count(*)::BIGINT AS c_all
  FROM tagged GROUP BY value
),
tot AS (
  SELECT sum(c1)::BIGINT AS n1,
         (sum(c_all) - sum(c1))::BIGINT AS n2,
         sum(c_all)::BIGINT AS nn
  FROM grouped
),
cdf AS (
  SELECT value, c_all,
         sum(c1) OVER (ORDER BY value)::BIGINT AS cum1,
         sum(c_all) OVER (ORDER BY value)::BIGINT AS cum_all
  FROM grouped
),
s AS (
  SELECT t.n1, t.n2, t.nn,
         CAST(sum({_CVM_TERM_E6}) AS BIGINT) AS t_e6
  FROM cdf CROSS JOIN tot t
  GROUP BY t.n1, t.n2, t.nn
)
SELECT n1 AS n_early, n2 AS n_late,
       round(t_e6 / 1e6, 6) + 0.0 AS t_stat,
       round({_CVM_MEAN}, 6) + 0.0 AS t_null_mean,
       {_CVM_Z} AS z_score,
       coalesce(({_CVM_Z}) > 3, FALSE) AS drift_at_3sd
FROM s
"""


@staged("cvm_drift_two_sample", oracle=_cvm_oracle())
def cvm_drift_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift statistic between the first and
    second half of the event stream's time range — the INTEGRAL (L2)
    companion to the registered sup-norm ``ks_drift_detection`` over the
    identical split and value column, completing the two-sample drift
    family (KS = worst single gap, CvM = accumulated squared gap across
    the whole distribution, Wasserstein = transport cost, PSI = binned):
    CvM catches many-small-deviations drift that KS's single supremum
    dilutes. Standardized against Anderson & Darling's exact finite-N
    null moments; the readout is the z-score a monitor thresholds (the
    3-sd flag is deliberately conservative — T's limiting law is not
    normal, and at 3 sd the one-sided Cantelli bound alone gives
    p <= 1/10).

    Exactness: per-distinct-value ECDF gaps reduce to the integer core
    cum1*N − cum_all*n1; each value's contribution e6-quantizes through
    shared text (products double-promoted — the squared core exceeds
    int64 at sf0.1 already) before the exact integer sum; mean, variance
    and z are single shared double expressions over (n1, n2, N, t_e6);
    a degenerate split yields NULL via the shared guard.

    Scale shape: identical to ks_drift_detection — one hash aggregate to
    the |distinct values| frame, BOTH cumulative counts ride one banded
    ``with_global_rank`` pass (no single-partition window), broadcast
    totals, scalar reduce."""
    ev = load_table(spark, sf_dir, "events").select(
        "value", F.unix_micros("ts").alias("us")
    )
    bounds = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "value", F.when(F.col("us") < F.col("mid"), 1).otherwise(0).alias("early")
    )
    grouped = tagged.groupBy("value").agg(
        F.sum("early").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("c_all"),
    )
    # Bounded |distinct values| frame with two downstream branches (the
    # totals and the banded CDF pass) — checkpoint so the corpus
    # aggregate runs once under every config, incl. exchange.reuse=false
    # (round-10 review finding; the chisq/GK/KW pattern).
    grouped = grouped.localCheckpoint()
    tot = grouped.agg(
        F.sum("c1").cast("long").alias("n1"),
        (F.sum("c_all") - F.sum("c1")).cast("long").alias("n2"),
        F.sum("c_all").cast("long").alias("nn"),
    )
    cdf = with_global_rank(
        grouped,
        ["value"],
        rank_col="_rk",
        sum_col="c1",
        cum_col="cum1",
        extra_cums=[("c_all", "cum_all")],
    )
    s = (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2", "nn")
        .agg(F.sum(F.expr(_CVM_TERM_E6)).cast("long").alias("t_e6"))
    )
    return s.select(
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        (F.round(F.col("t_e6") / 1e6, 6) + F.lit(0.0)).alias("t_stat"),
        (F.round(F.expr(_CVM_MEAN), 6) + F.lit(0.0)).alias("t_null_mean"),
        F.expr(_CVM_Z).alias("z_score"),
        F.coalesce(F.expr(_CVM_Z) > 3, F.lit(False)).alias("drift_at_3sd"),
    )


# --- Matryoshka truncation audit -------------------------------------------------

# Prefix-truncation retrieval audit (Kusupati et al. 2022, Matryoshka
# representation learning): how much top-k retrieval and raw cosine
# fidelity survive keeping only the first d of 64 dims? Everything
# derives from ONE query x corpus pair frame carrying the full-dim and
# all truncated cosines (each 6dp-rounded before ranking, ties broken by
# neighbor_id — the ann_cosine_topk device), so the four rank windows
# and the single readout aggregate share one scan. Per-pair |cos_d -
# cos_full| quantizes to an e6 integer over the ROUNDED operands before
# the sum.
_MRL_DIMS = (8, 16, 32)


def _mrl_oracle() -> str:
    full = T.cosine_duck("c.v", "q.v")
    cols = ", ".join(
        f"round({T.cosine_duck(f'c.v[1:{d}]', f'q.v[1:{d}]')}, 6) AS cos{d}"
        for d in _MRL_DIMS
    )
    rns = ", ".join(
        f"row_number() OVER (PARTITION BY query_id ORDER BY cos{d} DESC,"
        f" neighbor_id ASC) AS rn{d}"
        for d in _MRL_DIMS
    )
    aggs = ", ".join(
        f"sum(CASE WHEN rnf <= 5 AND rn{d} <= 5 THEN 1 ELSE 0 END)::BIGINT"
        f" AS hit{d},"
        f" sum(CASE WHEN rnf <= 5 AND rn{d} <= 50 THEN 1 ELSE 0 END)::BIGINT"
        f" AS fun{d},"
        f" CAST(sum(CAST(round(1000000 * abs(cos{d} - cosf)) AS BIGINT))"
        f" AS BIGINT) AS delta{d}_e6"
        for d in _MRL_DIMS
    )
    rows = " UNION ALL ".join(
        f"SELECT {d} AS trunc_dim, n_queries, n_expected,"
        f" hit{d} AS n_hit,"
        f" round((1e0 * hit{d}) / n_expected, 6) + 0.0 AS recall,"
        f" fun{d} AS n_hit_funnel50,"
        f" round((1e0 * fun{d}) / n_expected, 6) + 0.0 AS recall_funnel50,"
        f" round(delta{d}_e6 / (1e6 * n_pairs), 6) + 0.0 AS mean_abs_cos_delta"
        f" FROM a"
        for d in _MRL_DIMS
    )
    return f"""
WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id % 100 = 0),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({full}, 6) AS cosf, {cols}
  FROM c CROSS JOIN q WHERE c.vec_id <> q.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosf DESC,
                               neighbor_id ASC) AS rnf, {rns}
  FROM p
),
a AS (
  SELECT count(DISTINCT query_id)::BIGINT AS n_queries,
         count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN rnf <= 5 THEN 1 ELSE 0 END)::BIGINT AS n_expected,
         {aggs}
  FROM r
)
{rows}
"""


@staged("matryoshka_truncation_audit", oracle=_mrl_oracle())
def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix-truncation audit of the embedding space
    (Kusupati et al. 2022): for d in {8, 16, 32} of 64 dims, recall@5 of
    truncated-cosine retrieval against the exact full-dim top-5, plus the
    mean absolute cosine error over every (query, candidate) pair — the
    measurement that prices the d/64 index-cost reduction before adopting
    it, the PREFIX sibling of ``ann_jl_recall_audit`` (random projection).
    The ``recall_funnel50`` column measures the ADAPTIVE-RETRIEVAL funnel
    (Kusupati et al. 2022 §5: shortlist at truncated d, re-rank the
    shortlist at full dimension): since the full-dim re-rank of a
    shortlist keeps exactly the exact-top-5 members the shortlist
    captured, funnel recall@5 = the fraction of exact top-5 with
    truncated rank <= 50 — the number that decides whether "coarse at
    d, exact re-rank at 64" replaces full-dim search. On THIS
    near-isotropic synthetic corpus the honest expectation is low direct
    recall at small d (the same near-tie degeneracy documented for
    ann_jl_recall_audit), substantially higher funnel recall, and
    mean_abs_cos_delta shrinking as d grows — the monotone fidelity curve
    is the audit's signal.

    Exactness: every cosine (full and truncated) is the shared
    sequential-fold dot expression rounded at 6dp BEFORE ranking (ties by
    neighbor_id); per-pair |cos_d − cos_full| quantizes to an e6 integer
    over the rounded operands before the exact sum; recalls and means are
    single shared 6dp ratios of exact integers.

    Scale shape: queries are a bounded %100 subset and BROADCAST against
    the corpus scan (the ann_cosine_topk shape); the full-dim and all
    truncated cosines ride ONE pair frame, the four rank passes are
    windows partitioned by query_id (balanced), and the readout is a
    single aggregate unpivoted to |dims| rows — the corpus is scanned
    once regardless of how many truncation tiers are audited."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos_cols = [
        (F.round(F.expr(T.cosine_spark("v", "qv")), 6)).alias("cosf"),
        *[
            (
                F.round(
                    F.expr(
                        T.cosine_spark(f"slice(v, 1, {d})", f"slice(qv, 1, {d})")
                    ),
                    6,
                )
            ).alias(f"cos{d}")
            for d in _MRL_DIMS
        ],
    ]
    p = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), *cos_cols
        )
    )
    r = p
    for name, col in [("rnf", "cosf")] + [(f"rn{d}", f"cos{d}") for d in _MRL_DIMS]:
        w = Window.partitionBy("query_id").orderBy(
            F.col(col).desc(), F.col("neighbor_id").asc()
        )
        r = r.withColumn(name, F.row_number().over(w))
    agg_cols = [
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("rnf") <= 5, 1).otherwise(0))
        .cast("long")
        .alias("n_expected"),
    ]
    for d in _MRL_DIMS:
        agg_cols.append(
            F.sum(
                F.when((F.col("rnf") <= 5) & (F.col(f"rn{d}") <= 5), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"hit{d}")
        )
        agg_cols.append(
            F.sum(
                F.when((F.col("rnf") <= 5) & (F.col(f"rn{d}") <= 50), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"fun{d}")
        )
        agg_cols.append(
            F.sum(
                F.expr(
                    f"CAST(round(1000000 * abs(cos{d} - cosf)) AS BIGINT)"
                )
            )
            .cast("long")
            .alias(f"delta{d}_e6")
        )
    a = r.agg(*agg_cols)
    stack_args = ", ".join(
        f"{d}, hit{d}, fun{d}, delta{d}_e6" for d in _MRL_DIMS
    )
    return a.select(
        F.expr(
            f"stack({len(_MRL_DIMS)}, {stack_args})"
            " AS (trunc_dim, n_hit, n_hit_funnel50, delta_e6)"
        ),
        "n_queries",
        "n_expected",
        "n_pairs",
    ).select(
        F.col("trunc_dim").cast("int").alias("trunc_dim"),
        "n_queries",
        "n_expected",
        F.col("n_hit").cast("long").alias("n_hit"),
        (
            F.round((F.lit(1e0) * F.col("n_hit")) / F.col("n_expected"), 6)
            + F.lit(0.0)
        ).alias("recall"),
        F.col("n_hit_funnel50").cast("long").alias("n_hit_funnel50"),
        (
            F.round(
                (F.lit(1e0) * F.col("n_hit_funnel50")) / F.col("n_expected"), 6
            )
            + F.lit(0.0)
        ).alias("recall_funnel50"),
        (
            F.round(F.col("delta_e6") / (F.lit(1e6) * F.col("n_pairs")), 6)
            + F.lit(0.0)
        ).alias("mean_abs_cos_delta"),
    )


# --- streaming distribution-drift monitor (KS + CvM on the ingest path) --------

# Day-split two-sample compare: reference = first half of observed days,
# monitor = second half (integer day-rank split, recomputed on every
# re-scan so late partials re-split correctly). From the same pooled
# per-value cumulative pass: KS D = sup |F1 - F2| (the ks_drift gap
# text) and the CvM statistic/z (the _CVM_* shared texts — identical
# column names by construction).
_KSD_GAP = (
    "abs((1e0 * cum1) / n1 - (1e0 * (cum_all - cum1)) / n2)"
)


def _sdd_oracle(where: str = "WHERE event_id % 2 = 1") -> str:
    return f"""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day, value FROM events {where}
),
d AS (SELECT day, value, count(*)::BIGINT AS n FROM ev GROUP BY day, value),
dd AS (
  SELECT day, row_number() OVER (ORDER BY day) AS t,
         count(*) OVER ()::BIGINT AS nd
  FROM (SELECT DISTINCT day FROM d)
),
tagged AS (
  SELECT d.value, d.n, CASE WHEN dd.t <= dd.nd // 2 THEN 1 ELSE 0 END AS early
  FROM d JOIN dd ON d.day = dd.day
),
grouped AS (
  SELECT value, CAST(sum(early * n) AS BIGINT) AS c1,
         CAST(sum(n) AS BIGINT) AS c_all
  FROM tagged GROUP BY value
),
tot AS (
  SELECT sum(c1)::BIGINT AS n1, (sum(c_all) - sum(c1))::BIGINT AS n2,
         sum(c_all)::BIGINT AS nn
  FROM grouped
),
cdf AS (
  SELECT value, c_all,
         sum(c1) OVER (ORDER BY value)::BIGINT AS cum1,
         sum(c_all) OVER (ORDER BY value)::BIGINT AS cum_all
  FROM grouped
),
s AS (
  SELECT t.n1, t.n2, t.nn,
         round(max({_KSD_GAP}), 6) + 0.0 AS ks_stat,
         max({_KSD_GAP}) > 1.36 * sqrt((1e0 * t.nn) / (1e0 * t.n1 * t.n2))
           AS ks_drift_at_95,
         CAST(sum({_CVM_TERM_E6}) AS BIGINT) AS t_e6
  FROM cdf CROSS JOIN tot t
  GROUP BY t.n1, t.n2, t.nn
)
SELECT n1 AS n_early, n2 AS n_late, ks_stat, ks_drift_at_95,
       round(t_e6 / 1e6, 6) + 0.0 AS t_stat,
       {_CVM_Z} AS z_score,
       coalesce(({_CVM_Z}) > 3, FALSE) AS drift_at_3sd
FROM s
"""


def _sdd_readout(d: DataFrame) -> DataFrame:
    """KS + CvM day-split scan over a (day, value, n) frame — shared by
    the streaming twin and any batch caller. The merged frame is
    checkpointed (bounded |days x distinct values|): the day-rank tagging
    and the value grouping are two branches over it."""
    d = d.localCheckpoint()
    wd = Window.orderBy("day")
    dd = (
        d.select("day")
        .distinct()
        .select(
            "day",
            F.row_number().over(wd).alias("t"),
            F.count(F.lit(1))
            .over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("nd"),
        )
    )
    tagged = d.join(F.broadcast(dd), "day").select(
        "value",
        "n",
        F.when(F.col("t") <= F.expr("nd div 2"), 1).otherwise(0).alias("early"),
    )
    grouped = tagged.groupBy("value").agg(
        F.sum(F.col("early") * F.col("n")).cast("long").alias("c1"),
        F.sum("n").cast("long").alias("c_all"),
    )
    tot = grouped.agg(
        F.sum("c1").cast("long").alias("n1"),
        (F.sum("c_all") - F.sum("c1")).cast("long").alias("n2"),
        F.sum("c_all").cast("long").alias("nn"),
    )
    cdf = with_global_rank(
        grouped,
        ["value"],
        rank_col="_rk",
        sum_col="c1",
        cum_col="cum1",
        extra_cums=[("c_all", "cum_all")],
    )
    s = (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2", "nn")
        .agg(
            (F.round(F.max(F.expr(_KSD_GAP)), 6) + F.lit(0.0)).alias("ks_stat"),
            (
                F.max(F.expr(_KSD_GAP))
                > F.expr("1.36 * sqrt((1e0 * nn) / (1e0 * n1 * n2))")
            ).alias("ks_drift_at_95"),
            F.sum(F.expr(_CVM_TERM_E6)).cast("long").alias("t_e6"),
        )
    )
    return s.select(
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        "ks_stat",
        "ks_drift_at_95",
        (F.round(F.col("t_e6") / 1e6, 6) + F.lit(0.0)).alias("t_stat"),
        F.expr(_CVM_Z).alias("z_score"),
        F.coalesce(F.expr(_CVM_Z) > 3, F.lit(False)).alias("drift_at_3sd"),
    )


@staged("stream_dist_drift_monitor", oracle=_sdd_oracle())
def stream_dist_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (two-sample KS + CvM over a day-rank
    split) computed ON THE INGEST PATH — the 8th streaming twin: the
    odd-event_id half of the event stream replays as 2 micro-batches;
    each batch appends its per-(day, value) counts to a managed table;
    the readout merges partials by plain summation and runs the IDENTICAL
    banded two-sample scan the batch family uses (``ks_drift_detection``
    gap text; ``cvm_drift_two_sample``'s shared _CVM_* expressions).
    Proof obligations: (day, value, n) partials are mergeable integer
    sums, and the first-half/second-half DAY split is recomputed from the
    merged day ranks on every re-scan — so late-arriving partials re-split
    correctly and streaming-then-merge is bit-identical to the batch scan
    over the same half (certified by the oracle, the batch SQL restricted
    to the replayed half). This is the live serving-skew shape: per-value
    histograms land continuously, the monitor re-reads the bounded
    distribution table on demand and flags when EITHER the sup-norm (KS
    at 95%) or the integral statistic (CvM z > 3 sd) trips — the
    two-lens rule that catches both one-big-gap and many-small-gaps
    drift.

    Exactness: all counts exact int64; the KS gap and bound follow the
    registered ks_drift_detection recipe; CvM reuses the staged
    cvm_drift_two_sample expressions verbatim over identical column
    names; both cumulatives ride one banded ``with_global_rank`` pass.

    Scale shape: per micro-batch one map-side-combined hash aggregate to
    its |days × values| rows; the managed table holds batches × that; the
    merged frame is checkpointed (it feeds the day-rank and value
    groupings), the day frame is calendar-bounded, and the distinct-value
    CDF pass is banded — no single-partition sort anywhere."""
    from flink_realtime_sessionize_sample_spark.streaming.replay import (
        replay_split_stream,
    )

    held = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 1)
        .select(
            "event_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            "value",
        )
    )

    def _hist_batch(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy("day", "value").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )

    partials = replay_split_stream(
        spark,
        held,
        "event_id long, day long, value double",
        _hist_batch,
        "dist_drift_partials",
        split_col="event_id",
        src_prefix="dist_drift_src_",
    )
    merged = partials.groupBy("day", "value").agg(
        F.sum("n").cast("long").alias("n")
    )
    return _sdd_readout(merged)
