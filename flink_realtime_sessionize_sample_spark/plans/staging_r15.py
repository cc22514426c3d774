"""Round-15 capability queries — STAGED during round 14, promoted when the
round-15 window opens (the r7→r8→r10→r11→r12→r13→r14 staging pattern: the
round-14 driver window is full, and the standing no-new-backlog rule in
tests/test_registry_window.py forbids live registration the driver can't
verify within the round).

``STAGED_QUERIES``/``STAGED_ORACLES`` hold the pairs; nothing here touches
``plans.QUERIES`` until the promotion round flips ``staged`` to delegate
to ``registry.query`` (exactly how ``plans/staging_r14.py`` did it at the
round-14 open). Each query is verified by tools/staged_verify.py
(STAGED_MODULE=staging_r15) at sf0.001 + sf0.01 + sf0.1 (plus the five
adversarial configs) before promotion, and pinned by independent Python
references in tests/test_staging_r15.py.

The batch (the three round-13 verdict "next round #2" picks, plus the
family completions the existing frames make cheap and real users hit):

* ``tarone_bd_homogeneity`` — Tarone's (1985) corrected Breslow-Day
  homogeneity statistic over the SAME stratum frame as the promoted
  ``breslow_day_or_homogeneity``: the BD query documents "Tarone's
  correction omitted"; this query closes that documented gap (the
  correction subtracts (sum(a - att))^2 / sum(Var) so the statistic is
  exactly chi-square(K-1) when psi is the MH estimate rather than the
  conditional MLE) — the OR-homogeneity family's last member;
* ``seasonal_ljung_box_residuals`` — the Ljung-Box portmanteau applied
  to the RESIDUALS of the registered ``orders_trend_decomposition``
  weekly centered-MA fit (the verdict's "tie the new portmanteau to the
  decomposition"): the decomposition shows trend + residual, this query
  answers "is the residual white noise, i.e. did the MA5 trend capture
  the structure" — with the residual kept EXACT as the integer
  5*n_orders - sum_5(n_orders);
* ``stream_cox_score_monitor`` — the 14th streaming twin (the verdict's
  survival-readout pick): the Cox score test recomputed as USERS arrive
  — per micro-batch the batch's complete user histories sessionize and
  reduce to the bounded per-death-time integer partials (removed, rx,
  rx2, d, dx), which merge by plain summation and feed the IDENTICAL
  ``_cox_terms``/``_cox_readout`` algebra as the promoted batch query;
* ``dagostino_k2_normality`` — D'Agostino-Pearson K^2 omnibus normality
  (the transformed-moments twin of the promoted ``jarque_bera_event_
  values``, better calibrated at moderate n): Z(sqrt b1) via Johnson SU
  (D'Agostino 1970), Z(b2) via Anscombe-Glynn (1983), K^2 = Z1^2 + Z2^2
  with the EXACT chi-square(2) tail p = exp(-K^2/2);
* ``kpss_level_stationarity`` — the KPSS (1992) level-stationarity
  statistic of the daily-revenue series with the Bartlett long-run
  variance at the Newey-West automatic lag, read against the published
  critical values (0.347/0.463/0.739 at 10/5/1% — tabulated-critical
  spec, documented: the KPSS null distribution has no closed-form CDF);
* ``pacf_daily_events`` — partial autocorrelations of the daily event
  count series at lags 1..3 via the closed Durbin-Levinson forms over
  the SAME exact autocovariance frame as the promoted
  ``ljung_box_daily_autocorr`` (ACF says "correlated at lag k", PACF
  says "after regressing out shorter lags" — the AR-order pick);
* ``variance_ratio_random_walk`` — the Lo-MacKinlay (1988) variance
  ratio test (q = 5, homoskedastic z) of the daily log-revenue series:
  "does revenue follow a random walk at the weekly horizon";
* ``poisson_rate_ratio_ab`` — the two-arm event-RATE score test with
  per-user exposure (conditional binomial score z) + Wald CI on the
  log rate ratio — the count-metric member the experimentation family
  was missing (two_proportions tests per-event conversion, this tests
  events-per-user intensity);
* ``stream_poisson_rate_monitor`` — the 15th streaming twin: the rate
  readout over per-batch (users, events) integer partials split by
  USER so distinct-user counts merge by plain summation;
* ``cuzick_trend_by_tod`` — Cuzick's (1985) Wilcoxon-type trend test of
  event value across the four ORDERED time-of-day bands (the rank-based
  dose-response readout; Jonckheere/Page cover grouped medians and
  repeated measures, Cuzick is the linear-rank form epidemiology
  dashboards use), tie-exact via the doubled-midrank device;
* ``partial_corr_chars_tokens`` — first-order partial correlation of
  chars vs tokens CONTROLLING for distinct-token count, with the Fisher-z
  test at se = 1/sqrt(n - 4) — the confounder-adjusted member of the
  correlation family (fisher_z compares arms, this removes a covariate);
* ``bartels_rank_randomness`` — the Bartels (1982) rank von Neumann
  ratio test of the daily-revenue series (the rank-robust randomness
  check next to runs_test's sign-only form; RVN < 2 = positive serial
  correlation, > 2 = oscillation), tie-exact via doubled midranks;
* ``durbin_watson_residuals`` — the Durbin-Watson (1950) lag-1
  serial-correlation statistic of the seasonal-decomposition MA5
  residuals (the direction-and-magnitude companion to the staged
  portmanteau), read as von Neumann's ratio with Hart's exact null
  moments for the two-sided z — the value-domain twin of the staged
  Bartels rank form, exact-integer end to end;
* ``dickey_fuller_unit_root`` — the Dickey-Fuller (1979) constant-only
  tau test of the daily log-revenue series, the null-reversed twin of
  the staged KPSS (KPSS null = stationary, DF null = unit root — the
  textbook pre-differencing pair) against the published
  -2.57/-2.86/-3.43 critical values (tabulated-critical spec).

Exactness discipline unchanged (staging_r8 header, the dialect-trap
register): integer or quantized-integer corpus sums through the shared
DECIMAL(38,0) symmetric-overflow guard where a sum or per-row product
can leave int64, single shared double expressions over identical exact
operands, e-notation double literals inside expression text (never bare
decimals — Spark parses them as DECIMAL), 6dp rounds with ``+ 0.0``,
floor(x+0.5)/ceil(x-0.5) half-away-from-zero rounding in the Python
references, no raw TIMESTAMP outputs, floor-consistent bucketing via
the staging_r12 ``_fdiv``/``pmod`` pair, ANSI divide-by-zero guards on
every denominator a degenerate corpus can zero, single-site needle
asserts before every oracle-text splice (ADVICE r13 #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.plans.registry import QueryFn
from flink_realtime_sessionize_sample_spark.plans.staging_r12 import (
    _dec_sum_bigint,
    _fdiv_duck,
    _fdiv_spark,
    _pmod_duck,
)
from flink_realtime_sessionize_sample_spark.plans.staging_r14 import (
    _BD_ATT,
    _BD_TERM_E9,
    _JB_KURT,
    _JB_M1,
    _JB_M2,
    _JB_M3,
    _JB_M4,
    _JB_SKEW,
    _LB_RK,
    _LB_TERM_E12,
    _cox_oracle,
    _cox_readout,
    _cox_terms,
)
from flink_realtime_sessionize_sample_spark.sources.registry import load_table

STAGED_QUERIES: dict[str, QueryFn] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str | None = None):
    """Round-15 staging: holds the pair OUT of the live registry until
    the promotion round (see module docstring)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_QUERIES:
            raise ValueError(f"duplicate staged name {name!r}")
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


# --- Tarone-corrected Breslow-Day homogeneity ----------------------------------------

# Tarone (1985): the Breslow-Day statistic computed at the MH common-OR
# estimate psi (rather than the conditional MLE) is stochastically
# LARGER than chi-square(K-1); the correction
#   X^2_T = X^2_BD - (sum_k (a_k - att_k))^2 / sum_k Var_k
# restores the asymptotic null exactly. Fitted cells att and per-term
# X^2 contributions reuse the promoted breslow_day texts verbatim
# (_BD_ATT / _BD_TERM_E9), so the two queries can never disagree about
# the uncorrected statistic; the new pieces are the e9-quantized
# deviation a - att and variance Var = 1 / (1/att + 1/(n1-att) +
# 1/(m1-att) + 1/(nt-n1-m1+att)), each quantized SEPARATELY before the
# K-row sums (the quantize-each-piece rule). Quantization can push the
# mathematically >= 0 corrected statistic a hair negative on degenerate
# corpora, so it clamps at 0 (both engines AND the Python reference).
_TBD_DEV_E9 = (
    "CASE WHEN att IS NULL OR att <= glo OR att >= ghi THEN NULL"
    " ELSE CAST(round(1000000000 * (1e0 * a - att)) AS BIGINT) END"
)
_TBD_V_E9 = (
    "CASE WHEN att IS NULL OR att <= glo OR att >= ghi THEN NULL"
    " ELSE CAST(round(1000000000 / (1e0 / att + 1e0 / (n1 - att)"
    " + 1e0 / (m1 - att) + 1e0 / (nt - n1 - m1 + att))) AS BIGINT) END"
)
_TBD_X2T = (
    "CASE WHEN x2 IS NULL OR vs_e9 IS NULL OR vs_e9 <= 0 THEN NULL"
    " ELSE greatest(0e0, x2 - ((ds_e9 / 1e9) * (ds_e9 / 1e9))"
    " / (vs_e9 / 1e9)) END"
)
_TBD_Z = (
    "CASE WHEN x2t IS NULL OR dof < 1 THEN NULL"
    " ELSE round(sqrt(2 * x2t) - sqrt(2.0 * dof - 1), 6) + 0.0 END"
)


def _tbd_oracle() -> str:
    arm = T.h48_duck("user_id::VARCHAR")
    poly = _as_erfc_poly()
    return f"""
WITH e AS (
  SELECT event_type AS stratum, {arm} % 2 AS g,
         CASE WHEN value > 60 THEN 1 ELSE 0 END AS y
  FROM events
),
s AS (
  SELECT stratum,
         CAST(sum(g * y) AS BIGINT) AS a,
         CAST(sum(g * (1 - y)) AS BIGINT) AS b,
         CAST(sum((1 - g) * y) AS BIGINT) AS c,
         CAST(sum((1 - g) * (1 - y)) AS BIGINT) AS d
  FROM e GROUP BY stratum
),
m AS (
  SELECT stratum, a, b, c, d,
         a + b AS n1, c + d AS n0, a + c AS m1, b + d AS m0,
         a + b + c + d AS nt
  FROM s WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
),
pt AS (
  SELECT CAST(sum(CAST(round(1000000000 * (1e0 * a * d) / nt) AS BIGINT))
           AS BIGINT) AS ad_e9,
         CAST(sum(CAST(round(1000000000 * (1e0 * b * c) / nt) AS BIGINT))
           AS BIGINT) AS bc_e9
  FROM m
),
ps AS (
  SELECT CASE WHEN bc_e9 = 0 THEN NULL ELSE (1e0 * ad_e9) / bc_e9 END AS psi
  FROM pt
),
qd AS (
  SELECT m.*, ps.psi,
         greatest(0e0, 1e0 * (n1 + m1 - nt)) AS glo,
         least(1e0 * n1, 1e0 * m1) AS ghi,
         (psi - 1e0) AS aa,
         (-(psi * (n1 + m1) + 1e0 * (nt - n1 - m1))) AS bb,
         (psi * n1 * m1) AS cc
  FROM m CROSS JOIN ps
),
rt AS (
  SELECT *, sqrt(greatest(0e0, bb * bb - 4e0 * aa * cc)) AS sq FROM qd
),
at AS (
  SELECT *,
         CASE WHEN psi IS NULL THEN NULL ELSE
           (CASE WHEN abs(psi - 1e0) < 1e-12 THEN 0e0
                 ELSE (-bb + sq) / (2e0 * aa) END) END AS rt1,
         CASE WHEN psi IS NULL THEN NULL ELSE
           (CASE WHEN abs(psi - 1e0) < 1e-12 THEN 0e0
                 ELSE (-bb - sq) / (2e0 * aa) END) END AS rt2
  FROM rt
),
ft AS (
  SELECT *, CASE WHEN psi IS NULL THEN NULL ELSE {_BD_ATT} END AS att FROM at
),
tm AS (
  SELECT *, {_BD_TERM_E9} AS term_e9, {_TBD_DEV_E9} AS dev_e9,
         {_TBD_V_E9} AS v_e9
  FROM ft
),
agg AS (
  SELECT count(*)::BIGINT AS n_strata,
         max(CASE WHEN term_e9 IS NULL THEN 1 ELSE 0 END) AS any_null,
         CAST(sum(term_e9) AS BIGINT) AS x2_e9,
         CAST(sum(dev_e9) AS BIGINT) AS ds_e9,
         CAST(sum(v_e9) AS BIGINT) AS vs_e9,
         max(psi) AS psi
  FROM tm
),
st AS (
  SELECT n_strata, n_strata - 1 AS dof, psi, ds_e9, vs_e9,
         CASE WHEN any_null = 1 OR n_strata < 2 THEN NULL
              ELSE x2_e9 / 1e9 END AS x2
  FROM agg
),
ct AS (SELECT *, {_TBD_X2T} AS x2t FROM st),
zz AS (SELECT *, {_TBD_Z} AS z_stat FROM ct),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT n_strata, dof,
       CASE WHEN psi IS NULL THEN NULL ELSE round(psi, 6) + 0.0 END AS or_mh,
       CASE WHEN x2 IS NULL THEN NULL ELSE round(x2, 6) + 0.0 END AS x2_bd,
       CASE WHEN x2t IS NULL THEN NULL ELSE round(x2t, 6) + 0.0 END
         AS x2_tarone,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0
            ELSE round(1 - ({poly}) / 2, 6) + 0.0 END AS p_value
FROM xt
"""


@staged("tarone_bd_homogeneity", oracle=_tbd_oracle())
def tarone_bd_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tarone-corrected Breslow-Day homogeneity of the odds ratio across
    the event-type strata — the correction the promoted
    ``breslow_day_or_homogeneity`` documents as omitted: BD evaluated at
    the MH common-OR psi overshoots chi-square(K-1) slightly, and
    Tarone's (1985) subtraction of (sum(a - att))^2 / sum(Var) makes
    the asymptotic null exact. Reports BOTH statistics (the uncorrected
    X^2 pins this query to the promoted one; the corrected X^2_T drives
    z and p), so a dashboard can see the size of the correction.

    Exactness: the stratum frame, psi, fitted cells att, and per-term
    X^2 contributions are the promoted query's shared texts verbatim
    (_BD_ATT / _BD_TERM_E9); the new deviation and variance terms
    e9-quantize SEPARATELY before their K-row sums (quantize-each-piece
    rule); quantization can push the mathematically non-negative
    corrected statistic a hair below zero, so it clamps at 0e0 in both
    engines and the Python reference; boundary-fitted strata NULL the
    readout loud through the same any-NULL tripwire as the promoted
    query; sum(Var) <= 0 NULLs loud (ANSI divide-by-zero guard).

    Scale shape: ONE map-side-combined aggregate over the event scan to
    the bounded stratum frame; everything downstream is K-row algebra.

    Reference parity note: beyond-parity scope (SURVEY §2.9) — the
    538-line Flink reference has no statistics surface."""
    arm = F.expr(f"pmod({T.h48_spark('cast(user_id as string)')}, 2)")
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("stratum"),
        arm.alias("g"),
        F.when(F.col("value") > 60, 1).otherwise(0).alias("y"),
    )
    s = e.groupBy("stratum").agg(
        F.sum(F.col("g") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("g") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("g")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("g")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    m = s.select(
        "*",
        (F.col("a") + F.col("b")).alias("n1"),
        (F.col("c") + F.col("d")).alias("n0"),
        (F.col("a") + F.col("c")).alias("m1"),
        (F.col("b") + F.col("d")).alias("m0"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("nt"),
    ).filter(
        (F.col("n1") > 0) & (F.col("n0") > 0) & (F.col("m1") > 0) & (F.col("m0") > 0)
    )
    m = m.localCheckpoint()  # bounded stratum frame; 2 consumers
    pt = m.agg(
        F.sum(
            F.expr("CAST(round(1000000000 * (1e0 * a * d) / nt) AS BIGINT)")
        )
        .cast("long")
        .alias("ad_e9"),
        F.sum(
            F.expr("CAST(round(1000000000 * (1e0 * b * c) / nt) AS BIGINT)")
        )
        .cast("long")
        .alias("bc_e9"),
    )
    ps = pt.select(
        F.expr(
            "CASE WHEN bc_e9 = 0 THEN NULL ELSE (1e0 * ad_e9) / bc_e9 END"
        ).alias("psi")
    )
    qd = m.crossJoin(F.broadcast(ps)).select(
        "*",
        F.expr("greatest(0e0, 1e0 * (n1 + m1 - nt))").alias("glo"),
        F.expr("least(1e0 * n1, 1e0 * m1)").alias("ghi"),
        F.expr("(psi - 1e0)").alias("aa"),
        F.expr("(-(psi * (n1 + m1) + 1e0 * (nt - n1 - m1)))").alias("bb"),
        F.expr("(psi * n1 * m1)").alias("cc"),
    )
    rt = qd.withColumn(
        "sq", F.expr("sqrt(greatest(0e0, bb * bb - 4e0 * aa * cc))")
    )
    at = rt.select(
        "*",
        F.expr(
            "CASE WHEN psi IS NULL THEN NULL ELSE"
            " (CASE WHEN abs(psi - 1e0) < 1e-12 THEN 0e0"
            " ELSE (-bb + sq) / (2e0 * aa) END) END"
        ).alias("rt1"),
        F.expr(
            "CASE WHEN psi IS NULL THEN NULL ELSE"
            " (CASE WHEN abs(psi - 1e0) < 1e-12 THEN 0e0"
            " ELSE (-bb - sq) / (2e0 * aa) END) END"
        ).alias("rt2"),
    )
    ft = at.withColumn(
        "att",
        F.expr(f"CASE WHEN psi IS NULL THEN NULL ELSE {_BD_ATT} END"),
    )
    tm = ft.select(
        "*",
        F.expr(_BD_TERM_E9).alias("term_e9"),
        F.expr(_TBD_DEV_E9).alias("dev_e9"),
        F.expr(_TBD_V_E9).alias("v_e9"),
    )
    agg = tm.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.max(
            F.when(F.col("term_e9").isNull(), 1).otherwise(0)
        ).alias("any_null"),
        F.sum("term_e9").cast("long").alias("x2_e9"),
        F.sum("dev_e9").cast("long").alias("ds_e9"),
        F.sum("v_e9").cast("long").alias("vs_e9"),
        F.max("psi").alias("psi"),
    )
    st = agg.select(
        "n_strata",
        (F.col("n_strata") - 1).alias("dof"),
        "psi",
        "ds_e9",
        "vs_e9",
        F.expr(
            "CASE WHEN any_null = 1 OR n_strata < 2 THEN NULL"
            " ELSE x2_e9 / 1e9 END"
        ).alias("x2"),
    )
    ct = st.withColumn("x2t", F.expr(_TBD_X2T))
    poly = _as_erfc_poly()
    zz = ct.withColumn("z_stat", F.expr(_TBD_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        "n_strata",
        "dof",
        F.expr(
            "CASE WHEN psi IS NULL THEN NULL ELSE round(psi, 6) + 0.0 END"
        ).alias("or_mh"),
        F.expr(
            "CASE WHEN x2 IS NULL THEN NULL ELSE round(x2, 6) + 0.0 END"
        ).alias("x2_bd"),
        F.expr(
            "CASE WHEN x2t IS NULL THEN NULL ELSE round(x2t, 6) + 0.0 END"
        ).alias("x2_tarone"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0"
            f" ELSE round(1 - ({poly}) / 2, 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- Ljung-Box on seasonal-decomposition residuals ------------------------------------

# The promoted ljung_box machinery applied to the residual of the
# registered orders_trend_decomposition weekly centered-MA5 fit. The
# residual is kept EXACT: where the 5-week window is full,
#   rw = 5 * n_orders - sum_5(n_orders)  (an exact integer = 5x the
# decomposition's double residual), and Ljung-Box is scale-invariant in
# the series, so the readout is identical to testing the decomposition's
# own residual. Residual rows re-index contiguously (row_number over
# week order) and lags run over that index — m = 4 lags (a month of
# weekly structure; the daily query's m = 7 convention scaled to the
# weekly horizon, documented).
_SLB_Q = (
    "CASE WHEN nn <= 4 OR anynull = 1 THEN NULL"
    " ELSE (1e0 * nn * (nn + 2)) * (t_e12 / 1e12) END"
)
_SLB_Z = (
    "CASE WHEN q IS NULL THEN NULL"
    " ELSE round(sqrt(2 * q) - sqrt(2.0 * 4 - 1), 6) + 0.0 END"
)


def _slb_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH wk AS (
  SELECT date_trunc('week', o_orderdate) AS w, count(*)::BIGINT AS c
  FROM orders GROUP BY 1
),
ma AS (
  SELECT w, c,
         CAST(sum(c) OVER (ORDER BY w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
           AS BIGINT) AS s5,
         count(*) OVER (ORDER BY w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
           AS win_n
  FROM wk
),
res AS (
  SELECT row_number() OVER (ORDER BY w) AS i,
         CAST(5 * c - s5 AS BIGINT) AS rw
  FROM ma WHERE win_n = 5
),
tot AS (SELECT count(*)::BIGINT AS nn, sum(rw)::BIGINT AS ss FROM res),
den_t AS (
  SELECT CAST(sum(CAST((nn * rw - ss) AS DECIMAL(38,0)) * (nn * rw - ss))
           AS DOUBLE) AS den
  FROM res CROSS JOIN tot
),
lags AS (SELECT k FROM (VALUES (1),(2),(3),(4)) v(k)),
pairs AS (
  SELECT l.k,
         CAST(sum(CAST((t.nn * a.rw - t.ss) AS DECIMAL(38,0))
                  * (t.nn * b.rw - t.ss)) AS DOUBLE) AS numk
  FROM res a CROSS JOIN lags l JOIN res b ON b.i = a.i + l.k
  CROSS JOIN tot t
  GROUP BY l.k
),
lagf AS (
  SELECT l.k, coalesce(p.numk, 0e0) AS numk
  FROM lags l LEFT JOIN pairs p ON p.k = l.k
),
terms AS (
  SELECT k, numk, tot.nn, den_t.den, {_LB_TERM_E12} AS t_e12,
         {_LB_RK} AS rk
  FROM lagf CROSS JOIN tot CROSS JOIN den_t
),
agg AS (
  SELECT max(nn)::BIGINT AS nn,
         max(CASE WHEN t_e12 IS NULL THEN 1 ELSE 0 END) AS anynull,
         CAST(sum(t_e12) AS BIGINT) AS t_e12,
         max(CASE WHEN k = 1 THEN rk END) AS r1
  FROM terms
),
qq AS (SELECT *, {_SLB_Q} AS q FROM agg),
zz AS (SELECT *, {_SLB_Z} AS z_stat FROM qq),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_resid_weeks,
       CASE WHEN q IS NULL OR r1 IS NULL THEN NULL
            ELSE round(r1, 6) + 0.0 END AS r_lag1,
       CASE WHEN q IS NULL THEN NULL ELSE round(q, 6) + 0.0 END AS q_stat,
       4 AS dof,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0
            ELSE round(1 - ({poly}) / 2, 6) + 0.0 END AS p_value
FROM xt
"""


@staged("seasonal_ljung_box_residuals", oracle=_slb_oracle())
def seasonal_ljung_box_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau on the RESIDUALS of the registered
    ``orders_trend_decomposition`` weekly centered-MA5 fit — the
    round-13 verdict's "tie the portmanteau to the decomposition" pick:
    the decomposition reports trend and residual, this query answers
    whether the residual is white noise (i.e. whether the MA5 trend
    captured the serial structure) — the diagnostic that tells a
    forecaster when the decomposition is ENOUGH.

    Exactness: the residual is the exact integer 5*c - sum_5(c) where
    the window is full (5x the registered query's double residual;
    Ljung-Box is scale-invariant, so the readout is the same test);
    residual rows re-index contiguously and the m = 4 weekly lags run
    on that index; the autocovariance/e12-quantize/any-NULL machinery
    is the promoted daily query's shared texts (_LB_TERM_E12/_LB_RK)
    verbatim; p via the sqrt(2Q) chi-square device, one-sided upper
    tail (family convention).

    Scale shape: one fact scan -> bounded week frame (checkpointed);
    centered-window and lag joins run over that bounded frame; the lag
    table is a broadcast 4-row VALUES."""
    poly = _as_erfc_poly()
    wk = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", "o_orderdate").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    win = Window.orderBy("w").rowsBetween(-2, 2)
    ma = wk.select(
        "w",
        "c",
        F.sum("c").over(win).cast("long").alias("s5"),
        F.count(F.lit(1)).over(win).alias("win_n"),
    )
    res = (
        ma.filter(F.col("win_n") == 5)
        .select(
            F.row_number().over(Window.orderBy("w")).cast("long").alias("i"),
            (F.lit(5) * F.col("c") - F.col("s5")).cast("long").alias("rw"),
        )
    )
    res = res.localCheckpoint()  # bounded residual-week frame; den + 4 lag joins
    tot = res.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("rw").cast("long").alias("ss"),
    )
    den_t = res.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            "CAST(sum(CAST((nn * rw - ss) AS DECIMAL(38,0)) * (nn * rw - ss))"
            " AS DOUBLE)"
        ).alias("den")
    )
    lags = spark.range(1, 5).select(F.col("id").cast("long").alias("k"))
    a = res.select(F.col("i").alias("ia"), F.col("rw").alias("ra"))
    b = res.select(F.col("i").alias("ib"), F.col("rw").alias("rb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("ib") == F.col("ia") + F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.expr(
                "CAST(sum(CAST((nn * ra - ss) AS DECIMAL(38,0))"
                " * (nn * rb - ss)) AS DOUBLE)"
            ).alias("numk")
        )
    )
    lagf = lags.join(pairs, "k", "left").select(
        "k", F.coalesce(F.col("numk"), F.lit(0.0)).alias("numk")
    )
    terms = lagf.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(den_t)).select(
        "*",
        F.expr(_LB_TERM_E12).alias("t_e12"),
        F.expr(_LB_RK).alias("rk"),
    )
    agg = terms.agg(
        F.max("nn").cast("long").alias("nn"),
        F.max(F.when(F.col("t_e12").isNull(), 1).otherwise(0)).alias("anynull"),
        F.sum("t_e12").cast("long").alias("t_e12"),
        F.max(F.when(F.col("k") == 1, F.col("rk"))).alias("r1"),
    )
    qq = agg.withColumn("q", F.expr(_SLB_Q))
    zz = qq.withColumn("z_stat", F.expr(_SLB_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_resid_weeks"),
        F.expr(
            "CASE WHEN q IS NULL OR r1 IS NULL THEN NULL"
            " ELSE round(r1, 6) + 0.0 END"
        ).alias("r_lag1"),
        F.expr(
            "CASE WHEN q IS NULL THEN NULL ELSE round(q, 6) + 0.0 END"
        ).alias("q_stat"),
        F.lit(4).cast("int").alias("dof"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" WHEN z_stat >= 0 THEN round(({poly}) / 2, 6) + 0.0"
            f" ELSE round(1 - ({poly}) / 2, 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- streaming Cox score monitor ------------------------------------------------------


def _stream_cox_oracle() -> str:
    # The promoted batch Cox SQL restricted to the replayed odd-USER
    # half — a single-site source rewrite of the SHARED oracle text
    # (the sessionize CTE references the events table exactly once), so
    # the twin and the batch query can never drift apart. ADVICE r13 #2:
    # assert the needle is unique BEFORE splicing.
    base = _cox_oracle()
    assert base.count("FROM events\n") == 1, "cox oracle events-ref no longer single-site"
    restricted = base.replace(
        "FROM events\n", "FROM events WHERE user_id % 2 = 1\n"
    )
    assert "WHERE user_id % 2 = 1" in restricted
    return restricted


@staged("stream_cox_score_monitor", oracle=_stream_cox_oracle())
def stream_cox_score_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 14th streaming twin (the round-13 verdict's survival pick):
    the Cox score test recomputed as USERS arrive — the stream splits
    by user_id, so every micro-batch carries COMPLETE user histories
    and sessionizes exactly (the reference's per-key state never spans
    the split); per batch, sessions reduce to the bounded per-death-time
    integer partials (removed, rx, rx2, d, dx), which merge by plain
    summation on t (exact integer counts — nothing to quantize) and
    feed the IDENTICAL ``_cox_terms``/``_cox_readout`` algebra as the
    promoted batch query. The live shape: "is session survival still
    independent of start hour" refreshed per cohort ingest.

    Censoring contract: the batch query censors against the corpus-end
    timestamp; the replay's "now" is the held half's max event time,
    computed once from the static held frame and broadcast into every
    micro-batch (a live monitor censors against ITS batch-end clock the
    same way — documented).

    Replay contract: the odd-user half as a deterministic 2-micro-batch
    file stream split on user_id (the stream-Storey twin's split);
    oracle = the promoted batch Cox SQL with its single events
    reference restricted to the same half (single-site splice,
    asserted).

    Scale shape: per batch one sessionize pass over the batch's users
    -> one aggregate onto the bounded (<= 43201-row) t-grid; the
    managed table holds batches x |t| rows; the readout is the batch
    query's bounded suffix-window algebra."""
    from flink_realtime_sessionize_sample_spark.operators.sessionize import (
        sessionize,
    )
    from flink_realtime_sessionize_sample_spark.streaming.replay import (
        replay_split_stream,
    )

    held = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 2 == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("us"),
        )
    )
    gmx = held.agg(
        F.max(F.expr("us div 1000000")).cast("long").alias("mx")
    ).localCheckpoint()  # 1-row batch-end clock, reused by both micro-batches

    def _surv_batch(batch_df: DataFrame) -> DataFrame:
        ev = batch_df.select(
            "event_id", "user_id", F.timestamp_micros("us").alias("ts")
        )
        sz = sessionize(ev, key="user_id", ts="ts", tiebreakers=("event_id",)).select(
            "session_id",
            F.col("duration").cast("long").alias("duration"),
            F.expr("unix_micros(ts) div 1000000").alias("sec"),
        )
        sess_end = sz.groupBy("session_id").agg(
            F.max("duration").cast("long").alias("dur"),
            F.max("sec").cast("long").alias("last_sec"),
            F.min("sec").cast("long").alias("st"),
        )
        obs = sess_end.crossJoin(F.broadcast(gmx)).select(
            F.col("dur").alias("t"),
            ((F.col("mx") - F.col("last_sec")) <= 1800).alias("censored"),
            F.expr(f"pmod({_fdiv_spark('st', 3600)}, 24)").alias("hr"),
        )
        return obs.groupBy("t").agg(
            F.count(F.lit(1)).cast("long").alias("removed"),
            F.sum("hr").cast("long").alias("rx"),
            F.sum(F.col("hr") * F.col("hr")).cast("long").alias("rx2"),
            F.sum(F.when(F.col("censored"), 0).otherwise(1))
            .cast("long")
            .alias("d"),
            F.sum(F.when(F.col("censored"), 0).otherwise(F.col("hr")))
            .cast("long")
            .alias("dx"),
        )

    partials = replay_split_stream(
        spark,
        held,
        "event_id long, user_id long, us long",
        _surv_batch,
        "cox_score_partials",
        split_col="user_id",
        src_prefix="cox_mon_src_",
    )
    bytime = partials.groupBy("t").agg(
        F.sum("removed").cast("long").alias("removed"),
        F.sum("rx").cast("long").alias("rx"),
        F.sum("rx2").cast("long").alias("rx2"),
        F.sum("d").cast("long").alias("d"),
        F.sum("dx").cast("long").alias("dx"),
    )
    bytime = bytime.localCheckpoint()  # bounded t-grid; 2 consumers
    return _cox_readout(_cox_terms(bytime), "o_hours", "e_hours")


# --- D'Agostino-Pearson K^2 omnibus normality ----------------------------------------

# D'Agostino (1970) / Anscombe & Glynn (1983) / D'Agostino, Belanger &
# D'Agostino (1990): transform the sample skewness and kurtosis to
# near-exact standard normals, then K^2 = Z1^2 + Z2^2 ~ chi-square(2)
# with the EXACT tail p = exp(-K^2/2) (the JB convention — no
# polynomial approximation in the p). All moment inputs are the
# promoted JB query's exact DECIMAL/HUGEINT power sums; every n-term
# below promotes through 1e0* so nothing multiplies in int64 (nn^4
# would overflow and ANSI Spark raises). The transformations need
# n >= 20 (Anscombe-Glynn's own floor) — smaller corpora NULL loud.
_DK_Y = (
    "CASE WHEN skew IS NULL OR nn < 20 THEN NULL"
    " ELSE skew * sqrt(((1e0 * nn + 1) * (1e0 * nn + 3))"
    " / (6e0 * (1e0 * nn - 2))) END"
)
_DK_BETA2 = (
    "(3e0 * (1e0 * nn * nn + 27e0 * nn - 70e0) * (1e0 * nn + 1)"
    " * (1e0 * nn + 3))"
    " / ((1e0 * nn - 2) * (1e0 * nn + 5) * (1e0 * nn + 7) * (1e0 * nn + 9))"
)
_DK_Z1 = (
    "CASE WHEN y IS NULL THEN NULL"
    " ELSE (1e0 / sqrt(ln(sqrt(-1e0 + sqrt(2e0 * (b2t - 1e0))))))"
    " * ln(y / sqrt(2e0 / (-1e0 + sqrt(2e0 * (b2t - 1e0)) - 1e0))"
    "      + sqrt((y / sqrt(2e0 / (-1e0 + sqrt(2e0 * (b2t - 1e0)) - 1e0)))"
    "             * (y / sqrt(2e0 / (-1e0 + sqrt(2e0 * (b2t - 1e0)) - 1e0)))"
    "             + 1e0)) END"
)
_DK_X = (
    "CASE WHEN kurt IS NULL OR nn < 20 THEN NULL"
    " ELSE ((kurt + 3e0) - (3e0 * (1e0 * nn - 1)) / (1e0 * nn + 1))"
    " / sqrt((24e0 * nn * (1e0 * nn - 2) * (1e0 * nn - 3))"
    "        / ((1e0 * nn + 1) * (1e0 * nn + 1) * (1e0 * nn + 3)"
    "           * (1e0 * nn + 5))) END"
)
_DK_SB1 = (
    "((6e0 * (1e0 * nn * nn - 5e0 * nn + 2e0))"
    " / ((1e0 * nn + 3) * (1e0 * nn + 5)))"
    " * sqrt((6e0 * (1e0 * nn + 3) * (1e0 * nn + 5))"
    "        / (1e0 * nn * (1e0 * nn - 2) * (1e0 * nn - 3)))"
)
_DK_A = (
    "(6e0 + (8e0 / sb1) * (2e0 / sb1 + sqrt(1e0 + 4e0 / (sb1 * sb1))))"
)
_DK_U = (
    "CASE WHEN x IS NULL OR (1e0 + x * sqrt(2e0 / (av - 4e0))) = 0e0"
    " THEN NULL"
    " ELSE (1e0 - 2e0 / av) / (1e0 + x * sqrt(2e0 / (av - 4e0))) END"
)
_DK_Z2 = (
    "CASE WHEN u IS NULL THEN NULL"
    " ELSE ((1e0 - 2e0 / (9e0 * av))"
    " - sign(u) * power(abs(u), 1e0 / 3e0)) / sqrt(2e0 / (9e0 * av)) END"
)
_DK_K2 = (
    "CASE WHEN z1 IS NULL OR z2 IS NULL THEN NULL"
    " ELSE z1 * z1 + z2 * z2 END"
)


def _dk_oracle() -> str:
    return f"""
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
e2 AS (SELECT c, c * c AS c2 FROM e),
s AS (
  SELECT count(*)::BIGINT AS nn,
         sum(c)::BIGINT AS s1,
         CAST(sum(c2::HUGEINT) AS DOUBLE) AS d2,
         CAST(sum(c2::HUGEINT * c) AS DOUBLE) AS d3,
         CAST(sum(c2::HUGEINT * c2) AS DOUBLE) AS d4
  FROM e2
),
l1 AS (SELECT *, {_JB_M1} AS m1 FROM s),
l2 AS (SELECT *, {_JB_M2} AS m2, {_JB_M3} AS m3, {_JB_M4} AS m4 FROM l1),
l3 AS (SELECT *, {_JB_SKEW} AS skew, {_JB_KURT} AS kurt FROM l2),
l4 AS (SELECT *, {_DK_Y} AS y, {_DK_BETA2} AS b2t, {_DK_X} AS x,
       {_DK_SB1} AS sb1 FROM l3),
l5 AS (SELECT *, {_DK_Z1} AS z1, {_DK_A} AS av FROM l4),
l6 AS (SELECT *, {_DK_U} AS u FROM l5),
l7 AS (SELECT *, {_DK_Z2} AS z2 FROM l6),
l8 AS (SELECT *, {_DK_K2} AS k2 FROM l7)
SELECT nn AS n_events,
       CASE WHEN skew IS NULL THEN NULL ELSE round(skew, 6) + 0.0 END
         AS skewness,
       CASE WHEN kurt IS NULL THEN NULL ELSE round(kurt, 6) + 0.0 END
         AS kurtosis_excess,
       CASE WHEN z1 IS NULL THEN NULL ELSE round(z1, 6) + 0.0 END AS z_skew,
       CASE WHEN z2 IS NULL THEN NULL ELSE round(z2, 6) + 0.0 END AS z_kurt,
       CASE WHEN k2 IS NULL THEN NULL ELSE round(k2, 6) + 0.0 END AS k2_stat,
       CASE WHEN k2 IS NULL THEN NULL ELSE round(exp(-k2 / 2e0), 6) + 0.0 END
         AS p_value
FROM l8
"""


@staged("dagostino_k2_normality", oracle=_dk_oracle())
def dagostino_k2_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino-Pearson K^2 omnibus normality test of the event-value
    distribution — the transformed-moments twin of the promoted
    ``jarque_bera_event_values``: JB compares raw skewness/kurtosis to
    their asymptotic normals (slow to converge in the kurtosis arm),
    while K^2 pushes each through its finite-n normalizing transform
    (Johnson SU for skewness, Anscombe-Glynn cube-root for kurtosis),
    which is why production normality checks report K^2 at moderate n.
    p = exp(-K^2/2) is again the exact chi-square(2) upper tail.

    Exactness: the moment frame is the JB query's shared texts verbatim
    (exact DECIMAL(38,0)/HUGEINT power sums -> DOUBLE once); the
    transformation chain is layered shared texts over those identical
    doubles, with every n-polynomial promoted through 1e0* (nn^4 would
    overflow int64 and ANSI Spark raises where DuckDB widens — the
    asymmetry trap); the signed cube root is sign(u)*power(abs(u),1/3)
    in both engines (power of a negative base is NaN); n < 20
    (Anscombe-Glynn's floor), zero variance, or a zero Z2 denominator
    NULL the readout loud.

    Scale shape: ONE corpus scan -> one map-side-combined scalar
    aggregate (the JB five sums); everything downstream is 1-row
    algebra."""
    e2 = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    ).select("c", (F.col("c") * F.col("c")).alias("c2"))
    s = e2.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("c").cast("long").alias("s1"),
        F.expr("CAST(sum(CAST(c2 AS DECIMAL(38,0))) AS DOUBLE)").alias("d2"),
        F.expr("CAST(sum(CAST(c2 AS DECIMAL(38,0)) * c) AS DOUBLE)").alias("d3"),
        F.expr("CAST(sum(CAST(c2 AS DECIMAL(38,0)) * c2) AS DOUBLE)").alias("d4"),
    )
    l1 = s.withColumn("m1", F.expr(_JB_M1))
    l2 = l1.select(
        "*",
        F.expr(_JB_M2).alias("m2"),
        F.expr(_JB_M3).alias("m3"),
        F.expr(_JB_M4).alias("m4"),
    )
    l3 = l2.select(
        "*", F.expr(_JB_SKEW).alias("skew"), F.expr(_JB_KURT).alias("kurt")
    )
    l4 = l3.select(
        "*",
        F.expr(_DK_Y).alias("y"),
        F.expr(_DK_BETA2).alias("b2t"),
        F.expr(_DK_X).alias("x"),
        F.expr(_DK_SB1).alias("sb1"),
    )
    l5 = l4.select("*", F.expr(_DK_Z1).alias("z1"), F.expr(_DK_A).alias("av"))
    l6 = l5.withColumn("u", F.expr(_DK_U))
    l7 = l6.withColumn("z2", F.expr(_DK_Z2))
    l8 = l7.withColumn("k2", F.expr(_DK_K2))
    return l8.select(
        F.col("nn").alias("n_events"),
        F.expr(
            "CASE WHEN skew IS NULL THEN NULL ELSE round(skew, 6) + 0.0 END"
        ).alias("skewness"),
        F.expr(
            "CASE WHEN kurt IS NULL THEN NULL ELSE round(kurt, 6) + 0.0 END"
        ).alias("kurtosis_excess"),
        F.expr(
            "CASE WHEN z1 IS NULL THEN NULL ELSE round(z1, 6) + 0.0 END"
        ).alias("z_skew"),
        F.expr(
            "CASE WHEN z2 IS NULL THEN NULL ELSE round(z2, 6) + 0.0 END"
        ).alias("z_kurt"),
        F.expr(
            "CASE WHEN k2 IS NULL THEN NULL ELSE round(k2, 6) + 0.0 END"
        ).alias("k2_stat"),
        F.expr(
            "CASE WHEN k2 IS NULL THEN NULL"
            " ELSE round(exp(-k2 / 2e0), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- KPSS level stationarity ----------------------------------------------------------

# Kwiatkowski, Phillips, Schmidt & Shin (1992): with e_i the demeaned
# series and S_t its partial sums, eta = n^-2 sum_t S_t^2 / s^2(l),
# where s^2(l) is the Bartlett-kernel long-run variance at the
# Newey-West automatic lag l = floor(4 (n/100)^(1/4)). Multiply-through
# exactness: e'_i = n*y_i - s (exact int, the LB trick), so
#   sum S_t^2 / den  and  gamma_k / den  (den = sum e'^2)
# are engine-identical doubles; each normalized term e8-quantizes
# before its sum, and the closed form eta = (P/den)(l+1) / (n W/den)
# with W = (l+1) gamma_0 + 2 sum (l+1-k) gamma_k needs no further
# division. The KPSS null has no closed-form CDF: the readout compares
# eta to the PUBLISHED critical values 0.347 / 0.463 / 0.739 at
# 10/5/1% (tabulated-critical spec, documented — no p_value column by
# design). Day gaps index as consecutive observations (the trading-day
# convention, documented).
_KPSS_L = "CAST(floor(4e0 * sqrt(sqrt(nn / 1e2))) AS BIGINT)"
_KPSS_RATIO_E8 = (
    "CASE WHEN den <= 0e0 THEN NULL"
    " ELSE CAST(round(100000000 * ((1e0 * sc * sc) / den)) AS BIGINT) END"
)
_KPSS_ETA = (
    "CASE WHEN p8 IS NULL OR anynull = 1 OR wq8 IS NULL OR wq8 <= 0"
    " OR nn < 2 THEN NULL"
    " ELSE ((p8 / 1e8) * (l + 1)) / (1e0 * nn * (wq8 / 1e8)) END"
)


def _kpss_oracle() -> str:
    return f"""
WITH d AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
ix AS (SELECT row_number() OVER (ORDER BY day) AS i, y FROM d),
tot AS (
  SELECT count(*)::BIGINT AS nn, sum(y)::BIGINT AS ss,
         {_KPSS_L.replace("nn", "count(*)")} AS l
  FROM ix
),
e AS (
  SELECT i, CAST(tot.nn * y - tot.ss AS BIGINT) AS ee, tot.nn, tot.ss, tot.l
  FROM ix CROSS JOIN tot
),
den_t AS (
  SELECT CAST(sum(CAST(ee AS DECIMAL(38,0)) * ee) AS DOUBLE) AS den FROM e
),
cum AS (
  SELECT i, CAST(sum(ee) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS BIGINT) AS sc
  FROM e
),
pp AS (
  SELECT CAST(sum({_KPSS_RATIO_E8}) AS BIGINT) AS p8,
         max(CASE WHEN {_KPSS_RATIO_E8} IS NULL THEN 1 ELSE 0 END) AS anynull
  FROM cum CROSS JOIN den_t
),
lags AS (SELECT k FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),
                        (11),(12)) v(k)),
gk AS (
  SELECT l.k,
         CAST(sum(CAST(a.ee AS DECIMAL(38,0)) * b.ee) AS DOUBLE) AS gnum
  FROM e a CROSS JOIN lags l JOIN e b ON b.i = a.i + l.k
  GROUP BY l.k
),
gq AS (
  SELECT lags.k,
         CASE WHEN den_t.den <= 0e0 THEN NULL
              ELSE CAST(round(100000000 * (coalesce(gk.gnum, 0e0)
                   / den_t.den)) AS BIGINT) END AS grq
  FROM lags LEFT JOIN gk ON gk.k = lags.k CROSS JOIN den_t
),
wsum AS (
  SELECT CAST(sum(CASE WHEN gq.k <= tot.l THEN (tot.l + 1 - gq.k) * grq
                       ELSE 0 END) AS BIGINT) AS w2q,
         max(CASE WHEN gq.k <= tot.l AND grq IS NULL THEN 1 ELSE 0 END)
           AS gnull
  FROM gq CROSS JOIN tot
),
wq AS (
  SELECT CASE WHEN gnull = 1 THEN NULL
              ELSE (tot.l + 1) * 100000000 + 2 * w2q END AS wq8
  FROM wsum CROSS JOIN tot
),
et AS (
  SELECT tot.nn, tot.l, {_KPSS_ETA} AS eta
  FROM pp CROSS JOIN wq CROSS JOIN tot
)
SELECT nn AS n_days, l AS lag_l,
       CASE WHEN eta IS NULL THEN NULL ELSE round(eta, 6) + 0.0 END
         AS kpss_eta,
       CASE WHEN eta IS NULL THEN NULL ELSE eta < 347e-3 END
         AS stationary_10pct,
       CASE WHEN eta IS NULL THEN NULL ELSE eta < 463e-3 END
         AS stationary_5pct,
       CASE WHEN eta IS NULL THEN NULL ELSE eta < 739e-3 END
         AS stationary_1pct
FROM et
"""


@staged("kpss_level_stationarity", oracle=_kpss_oracle())
def kpss_level_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the daily-revenue series — the
    null-reversed member of the time-series diagnostics family: the
    portmanteau/runs/trend tests take "no structure" as the null, KPSS
    takes STATIONARITY as the null and rejects when the series wanders
    (the unit-root screen every forecasting pipeline runs before
    differencing). Bartlett long-run variance at the Newey-West
    automatic lag; eta is read against the PUBLISHED critical values
    (0.347/0.463/0.739 at 10/5/1%) because the KPSS null distribution
    has no closed-form CDF — the tabulated-critical spec, documented
    (no p_value column by design).

    Exactness: daily revenue cents are exact integers on the datediff
    day key (the runs_test frame); the demeaned series multiplies
    through by n (e' = n*y - s, the LB trick; n*y stays in int64 on the
    documented envelope); partial sums of e' are exact integer window
    sums; every normalized term (S~^2/den, gamma_k/den) e8-quantizes
    before its sum so the bounded-frame sums are exact; the closed form
    eta = (P/den)(l+1)/(n W/den) divides once. Zero-variance corpora
    and W <= 0 (negative long-run variance estimate on a degenerate
    series) NULL loud. Day gaps index as consecutive observations (the
    trading-day convention, documented).

    Scale shape: one fact scan -> bounded day frame (checkpointed);
    cumulative and lag passes run over that bounded frame; the lag
    table is a broadcast 12-row range; one scalar readout."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("y"))
    ix = d.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "y",
    )
    ix = ix.localCheckpoint()  # bounded day frame; tot + den + cum + lag joins
    tot = ix.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("ss"),
    ).select("*", F.expr(_KPSS_L).alias("l"))
    e = ix.crossJoin(F.broadcast(tot)).select(
        "i",
        F.expr("CAST(nn * y - ss AS BIGINT)").alias("ee"),
        "nn",
        "ss",
        "l",
    )
    e = e.localCheckpoint()  # bounded demeaned frame; den + cum + 12 lag joins
    den_t = e.agg(
        F.expr("CAST(sum(CAST(ee AS DECIMAL(38,0)) * ee) AS DOUBLE)").alias("den")
    )
    wcum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    cum = e.select("i", F.sum("ee").over(wcum).cast("long").alias("sc"))
    pp = cum.crossJoin(F.broadcast(den_t)).agg(
        F.sum(F.expr(_KPSS_RATIO_E8)).cast("long").alias("p8"),
        F.max(
            F.when(F.expr(_KPSS_RATIO_E8).isNull(), 1).otherwise(0)
        ).alias("anynull"),
    )
    lags = spark.range(1, 13).select(F.col("id").cast("long").alias("k"))
    a = e.select(F.col("i").alias("ia"), F.col("ee").alias("ea"))
    b = e.select(F.col("i").alias("ib"), F.col("ee").alias("eb"))
    gk = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("ib") == F.col("ia") + F.col("k"))
        .groupBy("k")
        .agg(
            F.expr(
                "CAST(sum(CAST(ea AS DECIMAL(38,0)) * eb) AS DOUBLE)"
            ).alias("gnum")
        )
    )
    gq = (
        lags.join(gk, "k", "left")
        .crossJoin(F.broadcast(den_t))
        .select(
            "k",
            F.expr(
                "CASE WHEN den <= 0e0 THEN NULL"
                " ELSE CAST(round(100000000 * (coalesce(gnum, 0e0) / den))"
                " AS BIGINT) END"
            ).alias("grq"),
        )
    )
    wsum = gq.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr("CASE WHEN k <= l THEN (l + 1 - k) * grq ELSE 0 END")
        )
        .cast("long")
        .alias("w2q"),
        F.max(
            F.expr("CASE WHEN k <= l AND grq IS NULL THEN 1 ELSE 0 END")
        ).alias("gnull"),
    )
    wq = wsum.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CASE WHEN gnull = 1 THEN NULL"
            " ELSE (l + 1) * 100000000 + 2 * w2q END"
        ).alias("wq8")
    )
    et = (
        pp.crossJoin(F.broadcast(wq))
        .crossJoin(F.broadcast(tot))
        .select("nn", "l", F.expr(_KPSS_ETA).alias("eta"))
    )
    return et.select(
        F.col("nn").alias("n_days"),
        F.col("l").alias("lag_l"),
        F.expr(
            "CASE WHEN eta IS NULL THEN NULL ELSE round(eta, 6) + 0.0 END"
        ).alias("kpss_eta"),
        F.expr(
            "CASE WHEN eta IS NULL THEN NULL ELSE eta < 347e-3 END"
        ).alias("stationary_10pct"),
        F.expr(
            "CASE WHEN eta IS NULL THEN NULL ELSE eta < 463e-3 END"
        ).alias("stationary_5pct"),
        F.expr(
            "CASE WHEN eta IS NULL THEN NULL ELSE eta < 739e-3 END"
        ).alias("stationary_1pct"),
    )


# --- PACF of the daily event counts ---------------------------------------------------

# Durbin-Levinson closed forms at lags 1..3 over the promoted
# ljung_box autocovariance frame (same exact integer trick, same
# calendar-day lag pairing):
#   phi_11 = r1
#   phi_22 = (r2 - r1^2) / (1 - r1^2)      phi_21 = r1 (1 - phi_22)
#   phi_33 = (r3 - phi_21 r2 - phi_22 r1) / (1 - phi_21 r1 - phi_22 r2)
# r_k are engine-identical doubles (ratios of exact-DECIMAL-sourced
# doubles), so the layered rational algebra is engine-identical too;
# degenerate denominators NULL loud (ANSI divide guard).
_PACF_P22 = (
    "CASE WHEN r1 IS NULL OR r2 IS NULL"
    " OR (1e0 - r1 * r1) = 0e0 THEN NULL"
    " ELSE (r2 - r1 * r1) / (1e0 - r1 * r1) END"
)
_PACF_P21 = "CASE WHEN p22 IS NULL THEN NULL ELSE r1 * (1e0 - p22) END"
_PACF_P33 = (
    "CASE WHEN p21 IS NULL OR r3 IS NULL"
    " OR (1e0 - p21 * r1 - p22 * r2) = 0e0 THEN NULL"
    " ELSE (r3 - p21 * r2 - p22 * r1)"
    " / (1e0 - p21 * r1 - p22 * r2) END"
)


def _pacf_oracle() -> str:
    day = _fdiv_duck("epoch_us(ts)", 86400000000)
    return f"""
WITH d AS (
  SELECT {day} AS d, count(*)::BIGINT AS c FROM events GROUP BY 1
),
tot AS (SELECT count(*)::BIGINT AS nn, sum(c)::BIGINT AS ss FROM d),
den_t AS (
  SELECT CAST(sum(CAST((nn * c - ss) AS DECIMAL(38,0)) * (nn * c - ss))
           AS DOUBLE) AS den
  FROM d CROSS JOIN tot
),
lags AS (SELECT k FROM (VALUES (1),(2),(3)) v(k)),
pairs AS (
  SELECT l.k,
         CAST(sum(CAST((t.nn * a.c - t.ss) AS DECIMAL(38,0))
                  * (t.nn * b.c - t.ss)) AS DOUBLE) AS numk
  FROM d a CROSS JOIN lags l JOIN d b ON b.d = a.d + l.k
  CROSS JOIN tot t
  GROUP BY l.k
),
lagf AS (
  SELECT l.k, coalesce(p.numk, 0e0) AS numk
  FROM lags l LEFT JOIN pairs p ON p.k = l.k
),
rk AS (
  SELECT k, {_LB_RK} AS rk
  FROM lagf CROSS JOIN tot CROSS JOIN den_t
),
rv AS (
  SELECT tot.nn,
         max(CASE WHEN k = 1 THEN rk.rk END) AS r1,
         max(CASE WHEN k = 2 THEN rk.rk END) AS r2,
         max(CASE WHEN k = 3 THEN rk.rk END) AS r3
  FROM rk CROSS JOIN tot GROUP BY tot.nn
),
p2 AS (SELECT *, {_PACF_P22} AS p22 FROM rv),
p2b AS (SELECT *, {_PACF_P21} AS p21 FROM p2),
p3 AS (SELECT *, {_PACF_P33} AS p33 FROM p2b)
SELECT nn AS n_days,
       CASE WHEN r1 IS NULL THEN NULL ELSE round(r1, 6) + 0.0 END AS r_1,
       CASE WHEN r2 IS NULL THEN NULL ELSE round(r2, 6) + 0.0 END AS r_2,
       CASE WHEN r3 IS NULL THEN NULL ELSE round(r3, 6) + 0.0 END AS r_3,
       CASE WHEN r1 IS NULL THEN NULL ELSE round(r1, 6) + 0.0 END AS pacf_1,
       CASE WHEN p22 IS NULL THEN NULL ELSE round(p22, 6) + 0.0 END AS pacf_2,
       CASE WHEN p33 IS NULL THEN NULL ELSE round(p33, 6) + 0.0 END AS pacf_3,
       CASE WHEN nn < 1 THEN NULL
            ELSE round(1.959964e0 / sqrt(1e0 * nn), 6) + 0.0 END AS ci_band
FROM p3
"""


@staged("pacf_daily_events", oracle=_pacf_oracle())
def pacf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations of the daily event-count series at lags
    1..3 (Durbin-Levinson closed forms) — the AR-order companion of the
    promoted ``ljung_box_daily_autocorr``: the ACF says "days k apart
    correlate", the PACF says "after regressing out the shorter lags"
    — with the +-1.96/sqrt(n) band a dashboard draws next to it. Lags
    1..3 are the closed-form range (each further Durbin-Levinson level
    doubles the expression tree; order > 3 daily AR fits are a modeling
    job, not a diagnostic — documented spec).

    Exactness: the autocovariance frame is the promoted LB query's
    shared machinery verbatim (exact integer multiply-through,
    DECIMAL(38,0) per-row products, calendar-day lag pairing, _LB_RK);
    r_1..r_3 are engine-identical doubles, and the PACF algebra is
    layered shared rational texts over them with ANSI divide guards
    (constant series or a singular Toeplitz level NULL loud).

    Scale shape: one corpus scan -> the bounded day frame
    (checkpointed); 3-row broadcast lag join; 1-row algebra."""
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr(_fdiv_spark("unix_micros(ts)", 86400000000)).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    d = d.localCheckpoint()  # bounded day frame; den + 3 lag joins
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("c").cast("long").alias("ss"),
    )
    den_t = d.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            "CAST(sum(CAST((nn * c - ss) AS DECIMAL(38,0)) * (nn * c - ss))"
            " AS DOUBLE)"
        ).alias("den")
    )
    lags = spark.range(1, 4).select(F.col("id").cast("long").alias("k"))
    a = d.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = d.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.expr(
                "CAST(sum(CAST((nn * ca - ss) AS DECIMAL(38,0))"
                " * (nn * cb - ss)) AS DOUBLE)"
            ).alias("numk")
        )
    )
    lagf = lags.join(pairs, "k", "left").select(
        "k", F.coalesce(F.col("numk"), F.lit(0.0)).alias("numk")
    )
    rk = lagf.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(den_t)).select(
        "k", F.expr(_LB_RK).alias("rk")
    )
    rv = rk.crossJoin(F.broadcast(tot)).groupBy("nn").agg(
        F.max(F.when(F.col("k") == 1, F.col("rk"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("rk"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("rk"))).alias("r3"),
    )
    p2 = rv.withColumn("p22", F.expr(_PACF_P22))
    p2b = p2.withColumn("p21", F.expr(_PACF_P21))
    p3 = p2b.withColumn("p33", F.expr(_PACF_P33))
    return p3.select(
        F.col("nn").alias("n_days"),
        F.expr(
            "CASE WHEN r1 IS NULL THEN NULL ELSE round(r1, 6) + 0.0 END"
        ).alias("r_1"),
        F.expr(
            "CASE WHEN r2 IS NULL THEN NULL ELSE round(r2, 6) + 0.0 END"
        ).alias("r_2"),
        F.expr(
            "CASE WHEN r3 IS NULL THEN NULL ELSE round(r3, 6) + 0.0 END"
        ).alias("r_3"),
        F.expr(
            "CASE WHEN r1 IS NULL THEN NULL ELSE round(r1, 6) + 0.0 END"
        ).alias("pacf_1"),
        F.expr(
            "CASE WHEN p22 IS NULL THEN NULL ELSE round(p22, 6) + 0.0 END"
        ).alias("pacf_2"),
        F.expr(
            "CASE WHEN p33 IS NULL THEN NULL ELSE round(p33, 6) + 0.0 END"
        ).alias("pacf_3"),
        F.expr(
            "CASE WHEN nn < 1 THEN NULL"
            " ELSE round(1.959964e0 / sqrt(1e0 * nn), 6) + 0.0 END"
        ).alias("ci_band"),
    )


# --- Lo-MacKinlay variance ratio ------------------------------------------------------

# Lo & MacKinlay (1988): for x_t the log daily revenue,
#   mu = (x_n - x_1) / (n - 1)
#   sa^2 = (1/(n-1)) sum (x_t - x_{t-1} - mu)^2
#   sb^2 = (1/m) sum (x_t - x_{t-q} - q mu)^2,
#          m = q (n - q + 1)(1 - q/n)
#   VR = sb^2 / sa^2,  z = (VR - 1) / sqrt(2(2q-1)(q-1) / (3 q n))
# at q = 5 (the weekly horizon). ln(exact integer cents) is the
# established cross-engine-identical primitive; each squared-difference
# term e12-quantizes before its sum (double sums are aggregation-order
# sensitive); the endpoint-anchored mu uses max_by/arg_max on the
# unique day index. For q = 5 the z denominator is sqrt(24/(5n)) =
# sqrt(4.8/n).
_VR_T1_E12 = (
    "CAST(round(1000000000000 * ((xb - xa - mu) * (xb - xa - mu)))"
    " AS BIGINT)"
)
_VR_TQ_E12 = (
    "CAST(round(1000000000000 * ((xb - xa - 5e0 * mu)"
    " * (xb - xa - 5e0 * mu))) AS BIGINT)"
)
_VR_STAT = (
    "CASE WHEN nn <= 6 OR anyn = 1 OR s1q IS NULL OR s5q IS NULL THEN NULL"
    " WHEN (s1q / 1e12) / (nn - 1) <= 0e0 THEN NULL"
    " ELSE ((s5q / 1e12) / (5e0 * (nn - 4) * (1e0 - 5e0 / nn)))"
    " / ((s1q / 1e12) / (nn - 1)) END"
)
_VR_Z = (
    "CASE WHEN vr IS NULL THEN NULL"
    " ELSE round((vr - 1e0) / sqrt(4.8e0 / nn), 6) + 0.0 END"
)


def _vr_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH d AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
ix AS (
  SELECT row_number() OVER (ORDER BY day) AS i,
         CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END AS x
  FROM d
),
tot AS (
  SELECT count(*)::BIGINT AS nn,
         max(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS anyn,
         arg_max(x, i) AS xl, arg_min(x, i) AS xf
  FROM ix
),
mu_t AS (
  SELECT CASE WHEN nn < 2 THEN NULL ELSE (xl - xf) / (nn - 1) END AS mu
  FROM tot
),
p1 AS (
  SELECT CAST(sum({_VR_T1_E12}) AS BIGINT) AS s1q
  FROM (SELECT a.x AS xa, b.x AS xb FROM ix a JOIN ix b ON b.i = a.i + 1) j
  CROSS JOIN mu_t
),
p5 AS (
  SELECT CAST(sum({_VR_TQ_E12}) AS BIGINT) AS s5q
  FROM (SELECT a.x AS xa, b.x AS xb FROM ix a JOIN ix b ON b.i = a.i + 5) j
  CROSS JOIN mu_t
),
vt AS (
  SELECT tot.nn, {_VR_STAT} AS vr
  FROM tot CROSS JOIN p1 CROSS JOIN p5
),
zz AS (SELECT nn, vr, {_VR_Z} AS z_stat FROM vt),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_days, 5 AS q,
       CASE WHEN vr IS NULL THEN NULL ELSE round(vr, 6) + 0.0 END AS vr_stat,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("variance_ratio_random_walk", oracle=_vr_oracle())
def variance_ratio_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (q = 5, homoskedastic z) of the
    daily log-revenue series: under a random walk the variance of
    5-day log changes is exactly 5x the 1-day variance, so VR != 1
    diagnoses mean-reversion (VR < 1) or momentum (VR > 1) at the
    weekly horizon — the random-walk screen next to KPSS's
    stationarity null and Ljung-Box's white-noise null.

    Exactness: daily revenue cents are exact integers on the datediff
    day key; x = ln(cents) is the established cross-engine-identical
    primitive over identical exact operands; the drift mu anchors on
    the endpoint values via arg_min/arg_max on the UNIQUE day index
    (max_by in Spark); every squared-difference term e12-quantizes
    before its sum; the overlapping-q denominator m = q(n-q+1)(1-q/n)
    and the z scale sqrt(4.8/n) are shared texts. Day gaps index as
    consecutive trading days (documented, the finance convention);
    n <= q+1, zero 1-day variance, or a non-positive daily revenue
    NULL the readout loud.

    Scale shape: one fact scan -> bounded day frame (checkpointed);
    the 1-day and 5-day difference frames are self-joins of that
    bounded frame; two scalar reduces."""
    poly = _as_erfc_poly()
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("y"))
    ix = d.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.expr("CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END").alias("x"),
    )
    ix = ix.localCheckpoint()  # bounded day frame; tot + 2 difference joins
    tot = ix.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.max(F.when(F.col("x").isNull(), 1).otherwise(0)).alias("anyn"),
        F.expr("max_by(x, i)").alias("xl"),
        F.expr("min_by(x, i)").alias("xf"),
    )
    mu_t = tot.select(
        F.expr(
            "CASE WHEN nn < 2 THEN NULL ELSE (xl - xf) / (nn - 1) END"
        ).alias("mu")
    )
    a = ix.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = ix.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    p1 = (
        a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1)
        .crossJoin(F.broadcast(mu_t))
        .agg(F.sum(F.expr(_VR_T1_E12)).cast("long").alias("s1q"))
    )
    p5 = (
        a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 5)
        .crossJoin(F.broadcast(mu_t))
        .agg(F.sum(F.expr(_VR_TQ_E12)).cast("long").alias("s5q"))
    )
    vt = (
        tot.crossJoin(F.broadcast(p1))
        .crossJoin(F.broadcast(p5))
        .select("nn", F.expr(_VR_STAT).alias("vr"))
    )
    zz = vt.withColumn("z_stat", F.expr(_VR_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_days"),
        F.lit(5).cast("int").alias("q"),
        F.expr(
            "CASE WHEN vr IS NULL THEN NULL ELSE round(vr, 6) + 0.0 END"
        ).alias("vr_stat"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- two-arm Poisson rate-ratio test --------------------------------------------------

# Events-per-user intensity between the user-hash arms: under a common
# per-user rate, the arm-1 event count e1 given N = e0 + e1 is
# Binomial(N, pi) with pi = nu1 / (nu0 + nu1) (user counts as
# exposure), so the score z is (e1 - N pi) / sqrt(N pi (1 - pi)) — the
# count-metric rate test next to the per-event two-proportion battery.
# The rate ratio gets the standard Wald interval on the log scale,
# exp(ln RR +- 1.959964 sqrt(1/e0 + 1/e1)).
_PR_Z = (
    "CASE WHEN (e0 + e1) < 1 OR nu0 < 1 OR nu1 < 1 THEN NULL"
    " ELSE round(((1e0 * e1) - (1e0 * (e0 + e1) * nu1) / (nu0 + nu1))"
    " / sqrt((1e0 * (e0 + e1) * nu1 * nu0)"
    "        / ((1e0 * (nu0 + nu1)) * (nu0 + nu1))), 6) + 0.0 END"
)
_PR_RR = (
    "CASE WHEN e0 < 1 OR e1 < 1 OR nu0 < 1 OR nu1 < 1 THEN NULL"
    " ELSE ((1e0 * e1) / nu1) / ((1e0 * e0) / nu0) END"
)
_PR_LO = (
    "CASE WHEN rr IS NULL THEN NULL"
    " ELSE exp(ln(rr) - 1.959964e0 * sqrt(1e0 / e0 + 1e0 / e1)) END"
)
_PR_HI = (
    "CASE WHEN rr IS NULL THEN NULL"
    " ELSE exp(ln(rr) + 1.959964e0 * sqrt(1e0 / e0 + 1e0 / e1)) END"
)
_PR_TAIL = """,
rt AS (SELECT *, {rr} AS rr FROM s),
ci AS (SELECT *, {lo} AS rr_lo_raw, {hi} AS rr_hi_raw FROM rt),
zz AS (SELECT *, {z} AS z_stat FROM ci),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nu0 AS n_users_0, nu1 AS n_users_1, e0 AS events_0, e1 AS events_1,
       CASE WHEN nu0 < 1 THEN NULL
            ELSE round((1e0 * e0) / nu0, 6) + 0.0 END AS rate_0,
       CASE WHEN nu1 < 1 THEN NULL
            ELSE round((1e0 * e1) / nu1, 6) + 0.0 END AS rate_1,
       CASE WHEN rr IS NULL THEN NULL ELSE round(rr, 6) + 0.0 END
         AS rate_ratio,
       CASE WHEN rr_lo_raw IS NULL THEN NULL
            ELSE round(rr_lo_raw, 6) + 0.0 END AS rr_lo,
       CASE WHEN rr_hi_raw IS NULL THEN NULL
            ELSE round(rr_hi_raw, 6) + 0.0 END AS rr_hi,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


def _pr_tail() -> str:
    return _PR_TAIL.format(
        rr=_PR_RR, lo=_PR_LO, hi=_PR_HI, z=_PR_Z, poly=_as_erfc_poly()
    )


def _pr_readout(s: DataFrame) -> DataFrame:
    """Rate-test algebra over a 1-row (nu0, nu1, e0, e1) frame — shared
    by the batch query and the streaming twin (the ADVICE r10 #4
    readout-over-static-frame rule)."""
    poly = _as_erfc_poly()
    rt = s.withColumn("rr", F.expr(_PR_RR))
    ci = rt.select(
        "*", F.expr(_PR_LO).alias("rr_lo_raw"), F.expr(_PR_HI).alias("rr_hi_raw")
    )
    zz = ci.withColumn("z_stat", F.expr(_PR_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nu0").alias("n_users_0"),
        F.col("nu1").alias("n_users_1"),
        F.col("e0").alias("events_0"),
        F.col("e1").alias("events_1"),
        F.expr(
            "CASE WHEN nu0 < 1 THEN NULL"
            " ELSE round((1e0 * e0) / nu0, 6) + 0.0 END"
        ).alias("rate_0"),
        F.expr(
            "CASE WHEN nu1 < 1 THEN NULL"
            " ELSE round((1e0 * e1) / nu1, 6) + 0.0 END"
        ).alias("rate_1"),
        F.expr(
            "CASE WHEN rr IS NULL THEN NULL ELSE round(rr, 6) + 0.0 END"
        ).alias("rate_ratio"),
        F.expr(
            "CASE WHEN rr_lo_raw IS NULL THEN NULL"
            " ELSE round(rr_lo_raw, 6) + 0.0 END"
        ).alias("rr_lo"),
        F.expr(
            "CASE WHEN rr_hi_raw IS NULL THEN NULL"
            " ELSE round(rr_hi_raw, 6) + 0.0 END"
        ).alias("rr_hi"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


def _pr_oracle() -> str:
    arm = T.h48_duck("user_id::VARCHAR")
    return (
        f"""
WITH e AS (SELECT user_id, {arm} % 2 AS arm FROM events
),
s AS (
  SELECT CAST(sum(1 - arm) AS BIGINT) AS e0,
         CAST(sum(arm) AS BIGINT) AS e1,
         count(DISTINCT CASE WHEN arm = 0 THEN user_id END)::BIGINT AS nu0,
         count(DISTINCT CASE WHEN arm = 1 THEN user_id END)::BIGINT AS nu1
  FROM e
)"""
        + _pr_tail()
    )


@staged("poisson_rate_ratio_ab", oracle=_pr_oracle())
def poisson_rate_ratio_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm event-RATE score test with per-user exposure — the
    count-metric member the experimentation family was missing: the
    two-proportion battery tests per-event conversion, this tests
    events-per-USER intensity (sessions per user, purchases per user —
    the denominator a rate dashboard actually uses). Conditional on the
    total count, the arm-1 count is Binomial(N, nu1/(nu0+nu1)) under a
    common rate, giving the exact-variance score z; the rate ratio
    carries the standard log-scale Wald interval.

    Exactness: four exact integers from ONE conditional aggregate
    (events and distinct users per arm); every downstream expression is
    a shared text over them; ln/exp are the established cross-engine
    primitives; zero counts NULL the ratio/CI loud (the score z only
    needs N >= 1 and both exposures positive).

    Scale shape: ONE corpus scan -> one map-side-combined aggregate
    (two conditional counts + two conditional distinct counts);
    everything downstream is 1-row algebra."""
    arm = F.expr(f"pmod({T.h48_spark('cast(user_id as string)')}, 2)")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", arm.alias("arm")
    )
    s = e.agg(
        F.sum(1 - F.col("arm")).cast("long").alias("e0"),
        F.sum("arm").cast("long").alias("e1"),
        F.countDistinct(
            F.when(F.col("arm") == 0, F.col("user_id"))
        ).cast("long").alias("nu0"),
        F.countDistinct(
            F.when(F.col("arm") == 1, F.col("user_id"))
        ).cast("long").alias("nu1"),
    )
    return _pr_readout(s)


# --- streaming Poisson rate monitor ---------------------------------------------------


def _stream_pr_oracle() -> str:
    # The batch rate SQL restricted to the replayed odd-USER half — a
    # single-site source rewrite of the SHARED text (asserted unique
    # needle, ADVICE r13 #2).
    base = _pr_oracle()
    assert base.count("FROM events\n") == 1, "rate oracle events-ref no longer single-site"
    restricted = base.replace(
        "FROM events\n", "FROM events WHERE user_id % 2 = 1\n"
    )
    assert "WHERE user_id % 2 = 1" in restricted
    return restricted


@staged("stream_poisson_rate_monitor", oracle=_stream_pr_oracle())
def stream_poisson_rate_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 15th streaming twin: the rate readout recomputed as USERS
    arrive — the stream splits by user_id, so each micro-batch's
    distinct-user counts are over DISJOINT user sets and all four
    partials (events and users per arm) merge by plain summation
    (exact integers, nothing to quantize); the merged counts feed the
    IDENTICAL ``_pr_readout`` algebra as the batch query. The live
    shape: "is the treatment arm's per-user event intensity still
    elevated" refreshed per cohort ingest.

    Replay contract: the odd-user half as a deterministic 2-micro-batch
    file stream split on user_id (the stream-Storey/Cox twins' split);
    oracle = the batch rate SQL with its single events reference
    restricted to the same half (single-site splice, asserted).

    Scale shape: per batch ONE map-side-combined aggregate to four
    integers; the managed table holds batches x 1 rows; the readout is
    1-row algebra."""
    from flink_realtime_sessionize_sample_spark.streaming.replay import (
        replay_split_stream,
    )

    arm = F.expr(f"pmod({T.h48_spark('cast(user_id as string)')}, 2)")
    held = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 2 == 1)
        .select("event_id", "user_id")
    )

    def _rate_batch(batch_df: DataFrame) -> DataFrame:
        e = batch_df.select("user_id", arm.alias("arm"))
        return e.agg(
            F.sum(1 - F.col("arm")).cast("long").alias("e0"),
            F.sum("arm").cast("long").alias("e1"),
            F.countDistinct(
                F.when(F.col("arm") == 0, F.col("user_id"))
            ).cast("long").alias("nu0"),
            F.countDistinct(
                F.when(F.col("arm") == 1, F.col("user_id"))
            ).cast("long").alias("nu1"),
        )

    partials = replay_split_stream(
        spark,
        held,
        "event_id long, user_id long",
        _rate_batch,
        "rate_monitor_partials",
        split_col="user_id",
        src_prefix="rate_mon_src_",
    )
    s = partials.agg(
        F.sum("e0").cast("long").alias("e0"),
        F.sum("e1").cast("long").alias("e1"),
        F.sum("nu0").cast("long").alias("nu0"),
        F.sum("nu1").cast("long").alias("nu1"),
    )
    return _pr_readout(s)


# --- Cuzick trend across time-of-day bands --------------------------------------------

# Cuzick (1985): for ordered group scores l (here the four 6-hour
# time-of-day bands, 0..3) and pooled mid-ranks R of the event values,
# T = sum l_i R_i with conditional moments under permutation
#   E[T] = (N+1)/2 sum l_i
#   Var[T] = [sum (l - lbar)^2][sum (R - Rbar)^2] / (N - 1)
# (the standard linear-rank-statistic form — tie-EXACT because the
# realized mid-rank multiset enters Var directly). Doubled-rank device
# (r2 = 2 midrank) keeps everything integer: 2T = sum wl r2 per value,
# E[2T] = (N+1) L1, sum(2R - (N+1))^2 = SR2 - N(N+1)^2 with
# sum 2R = N(N+1) exact.
_CZ_Z = (
    "CASE WHEN t2 IS NULL OR nn < 2 THEN NULL"
    " WHEN ((1e0 * nn * sl2 - 1e0 * l1 * l1) / nn)"
    "      * ((sr2d - 1e0 * nn * (nn + 1) * (nn + 1)) / (nn - 1)) <= 0e0"
    " THEN NULL"
    " ELSE round((1e0 * t2 - 1e0 * (nn + 1) * l1)"
    " / sqrt(((1e0 * nn * sl2 - 1e0 * l1 * l1) / nn)"
    "        * ((sr2d - 1e0 * nn * (nn + 1) * (nn + 1)) / (nn - 1))), 6)"
    " + 0.0 END"
)


def _cz_oracle() -> str:
    poly = _as_erfc_poly()
    band = f"{_fdiv_duck(_pmod_duck(_fdiv_duck(_fdiv_duck('epoch_us(ts)', 1000000), 3600), 24), 6)}"
    return f"""
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST({band} AS BIGINT) AS l
  FROM events
),
g AS (
  SELECT cents AS v, count(*)::BIGINT AS c,
         CAST(sum(l) AS BIGINT) AS wl,
         CAST(sum(l * l) AS BIGINT) AS wl2
  FROM e GROUP BY cents
),
rk AS (
  SELECT v, c, wl, wl2,
         CAST(2 * (CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c) + c + 1
           AS BIGINT) AS r2
  FROM g
),
s AS (
  SELECT sum(c)::BIGINT AS nn,
         sum(wl)::BIGINT AS l1,
         sum(wl2)::BIGINT AS sl2,
         {_dec_sum_bigint("CAST(wl AS DECIMAL(38,0)) * r2")} AS t2,
         CAST(sum((CAST(c AS DECIMAL(38,0)) * r2) * r2) AS DOUBLE) AS sr2d
  FROM rk
),
zz AS (SELECT *, {_CZ_Z} AS z_stat FROM s),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_events, t2 AS t_x2,
       CASE WHEN nn < 1 THEN NULL
            ELSE round(1e0 * (nn + 1) * l1, 6) + 0.0 END AS e_x2,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("cuzick_trend_by_tod", oracle=_cz_oracle())
def cuzick_trend_by_tod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuzick's Wilcoxon-type trend test of event value across the four
    ORDERED 6-hour time-of-day bands — the linear-rank dose-response
    member of the trend family: Jonckheere-Terpstra counts pairwise
    wins, Page needs repeated-measure blocks, Cuzick is the
    rank-regression form (Stata's nptrend) an epidemiology or
    engagement dashboard runs on "does the metric rise through the
    day". Tie-exact: the conditional variance uses the realized
    mid-rank multiset, not the no-ties formula.

    Exactness: cents and band scores are exact integers; pooled
    mid-ranks come from the grouped-value device (the Ansari-Bradley
    r2 = 2*midrank integer); the statistic 2T = sum wl*r2 sums through
    the DECIMAL(38,0) guard (per-value wl*r2 ~ N^2 leaves int64 at
    corpus scale — loud symmetric NULL); SR2's per-row product promotes
    to DECIMAL and converts to DOUBLE once; E and Var are one shared
    text over the exact integer moments with every n-polynomial
    1e0-promoted; zero rank variance (constant values) NULLs loud.

    Scale shape: ONE corpus scan -> grouped-value frame (bounded by the
    value domain, cents); one ordered prefix window over that bounded
    frame; one scalar reduce."""
    poly = _as_erfc_poly()
    band = F.expr(
        _fdiv_spark(
            _pmod_duck(_fdiv_spark(_fdiv_spark("unix_micros(ts)", 1000000), 3600), 24),
            6,
        )
    )
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        band.cast("long").alias("l"),
    )
    g = e.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("l").cast("long").alias("wl"),
        F.sum(F.col("l") * F.col("l")).cast("long").alias("wl2"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rk = g.select(
        "v",
        "c",
        "wl",
        "wl2",
        (2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1)
        .cast("long")
        .alias("r2"),
    )
    s = rk.agg(
        F.sum("c").cast("long").alias("nn"),
        F.sum("wl").cast("long").alias("l1"),
        F.sum("wl2").cast("long").alias("sl2"),
        F.expr(_dec_sum_bigint("CAST(wl AS DECIMAL(38,0)) * r2")).alias("t2"),
        F.expr(
            "CAST(sum((CAST(c AS DECIMAL(38,0)) * r2) * r2) AS DOUBLE)"
        ).alias("sr2d"),
    )
    zz = s.withColumn("z_stat", F.expr(_CZ_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_events"),
        F.col("t2").alias("t_x2"),
        F.expr(
            "CASE WHEN nn < 1 THEN NULL"
            " ELSE round(1e0 * (nn + 1) * l1, 6) + 0.0 END"
        ).alias("e_x2"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- first-order partial correlation --------------------------------------------------

# r_xy.w = (r_xy - r_xw r_yw) / sqrt((1 - r_xw^2)(1 - r_yw^2)), with
# the Fisher-z test z = atanh(r_xy.w) sqrt(n - 4) (one controlled
# covariate burns one more df than the plain correlation's n - 3).
# Pairwise correlations from exact integer moment sums through the
# DECIMAL(38,0) guard; atanh as the explicit half-log (the fisher_z
# convention).
_PC_R = (
    "CASE WHEN nn < 4 OR s{u}{u} IS NULL OR s{u}{v} IS NULL"
    " OR s{v}{v} IS NULL THEN NULL"
    " WHEN (1e0 * nn * s{u}{u} - 1e0 * s{u} * s{u}) <= 0e0"
    " OR (1e0 * nn * s{v}{v} - 1e0 * s{v} * s{v}) <= 0e0 THEN NULL"
    " ELSE (1e0 * nn * s{u}{v} - 1e0 * s{u} * s{v})"
    " / sqrt((1e0 * nn * s{u}{u} - 1e0 * s{u} * s{u})"
    "        * (1e0 * nn * s{v}{v} - 1e0 * s{v} * s{v})) END"
)
_PC_PR = (
    "CASE WHEN rxy IS NULL OR rxw IS NULL OR ryw IS NULL THEN NULL"
    " WHEN (1e0 - rxw * rxw) * (1e0 - ryw * ryw) <= 0e0 THEN NULL"
    " ELSE (rxy - rxw * ryw)"
    " / sqrt((1e0 - rxw * rxw) * (1e0 - ryw * ryw)) END"
)
_PC_Z = (
    "CASE WHEN pr IS NULL OR abs(pr) >= 1e0 OR nn < 5 THEN NULL"
    " ELSE round(5e-1 * ln((1e0 + pr) / (1e0 - pr))"
    " * sqrt(1e0 * nn - 4), 6) + 0.0 END"
)


def _pc_oracle() -> str:
    toks = T.tokens_duck("text")
    poly = _as_erfc_poly()
    mom = {
        f"s{u}{v}": _dec_sum_bigint(f"CAST({u} AS DECIMAL(38,0)) * {v}")
        for (u, v) in (
            ("x", "x"), ("x", "y"), ("y", "y"), ("x", "w"), ("y", "w"),
            ("w", "w"),
        )
    }
    return f"""
WITH d AS (
  SELECT n_chars AS x,
         CAST(length({toks}) AS BIGINT) AS y,
         CAST(length(list_distinct({toks})) AS BIGINT) AS w
  FROM documents
),
s AS (
  SELECT count(*)::BIGINT AS nn,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(w)::BIGINT AS sw,
         {mom["sxx"]} AS sxx, {mom["sxy"]} AS sxy, {mom["syy"]} AS syy,
         {mom["sxw"]} AS sxw, {mom["syw"]} AS syw, {mom["sww"]} AS sww
  FROM d
),
rr AS (
  SELECT *, {_PC_R.format(u="x", v="y")} AS rxy,
         {_PC_R.format(u="x", v="w")} AS rxw,
         {_PC_R.format(u="y", v="w")} AS ryw
  FROM s
),
pr_t AS (SELECT *, {_PC_PR} AS pr FROM rr),
zz AS (SELECT *, {_PC_Z} AS z_stat FROM pr_t),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_docs,
       CASE WHEN rxy IS NULL THEN NULL ELSE round(rxy, 6) + 0.0 END AS r_xy,
       CASE WHEN rxw IS NULL THEN NULL ELSE round(rxw, 6) + 0.0 END AS r_xw,
       CASE WHEN ryw IS NULL THEN NULL ELSE round(ryw, 6) + 0.0 END AS r_yw,
       CASE WHEN pr IS NULL THEN NULL ELSE round(pr, 6) + 0.0 END
         AS partial_r,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("partial_corr_chars_tokens", oracle=_pc_oracle())
def partial_corr_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of chars vs tokens CONTROLLING
    for DISTINCT-token count (vocabulary breadth) — the confounder-adjusted
    member of the correlation family: spearman/kendall measure the raw
    association, ``fisher_z_corr_diff_ab`` compares it across arms,
    this asks how much survives once document granularity (sentences)
    is partialled out — the "is the correlation just length" screen a
    feature-engineering pass runs. Fisher-z inference at se =
    1/sqrt(n - 4) (one controlled covariate burns one more df).

    Exactness: three exact integer columns from ONE scan (chars, token
    count, distinct-token count via the shared tokenizer); all nine
    second-order sums through the DECIMAL(38,0) guard (loud symmetric
    NULL past int64); the three pairwise correlations, the partial, and
    atanh are layered shared texts over those identical operands;
    degenerate variance, |partial r| >= 1, or n < 5 NULL loud.

    Scale shape: ONE corpus scan -> one map-side-combined 10-sum scalar
    aggregate; everything downstream is 1-row algebra."""
    toks = T.tokens_spark("text")
    poly = _as_erfc_poly()
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("y"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias("w"),
    )
    mom = {
        f"s{u}{v}": _dec_sum_bigint(f"CAST({u} AS DECIMAL(38,0)) * {v}")
        for (u, v) in (
            ("x", "x"), ("x", "y"), ("y", "y"), ("x", "w"), ("y", "w"),
            ("w", "w"),
        )
    }
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("w").cast("long").alias("sw"),
        *[F.expr(t).alias(k) for k, t in mom.items()],
    )
    rr = s.select(
        "*",
        F.expr(_PC_R.format(u="x", v="y")).alias("rxy"),
        F.expr(_PC_R.format(u="x", v="w")).alias("rxw"),
        F.expr(_PC_R.format(u="y", v="w")).alias("ryw"),
    )
    pr_t = rr.withColumn("pr", F.expr(_PC_PR))
    zz = pr_t.withColumn("z_stat", F.expr(_PC_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_docs"),
        F.expr(
            "CASE WHEN rxy IS NULL THEN NULL ELSE round(rxy, 6) + 0.0 END"
        ).alias("r_xy"),
        F.expr(
            "CASE WHEN rxw IS NULL THEN NULL ELSE round(rxw, 6) + 0.0 END"
        ).alias("r_xw"),
        F.expr(
            "CASE WHEN ryw IS NULL THEN NULL ELSE round(ryw, 6) + 0.0 END"
        ).alias("r_yw"),
        F.expr(
            "CASE WHEN pr IS NULL THEN NULL ELSE round(pr, 6) + 0.0 END"
        ).alias("partial_r"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- Bartels rank von Neumann randomness ----------------------------------------------

# Bartels (1982): RVN = sum (R_t - R_{t+1})^2 / sum (R_t - Rbar)^2 over
# the rank sequence of the daily-revenue series; E[RVN] = 2,
# Var[RVN] = 4 (n-2)(5n^2 - 2n - 9) / (5 n (n+1)(n-1)^2), z normal.
# Doubled-midrank device keeps both sums exact integers: the common
# factor 4 cancels in the ratio, and sum 2R = n(n+1) exactly makes the
# denominator SR2 - n(n+1)^2.
_BR_RVN = (
    "CASE WHEN nn < 4 OR den2 IS NULL OR den2 <= 0 THEN NULL"
    " ELSE (1e0 * num2) / den2 END"
)
_BR_Z = (
    "CASE WHEN rvn IS NULL THEN NULL"
    " ELSE round((rvn - 2e0)"
    " / sqrt((4e0 * (nn - 2) * (5e0 * nn * nn - 2e0 * nn - 9e0))"
    "        / (5e0 * nn * (nn + 1e0) * (nn - 1e0) * (nn - 1e0))), 6)"
    " + 0.0 END"
)


def _br_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH d AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
g AS (SELECT y AS v, count(*)::BIGINT AS c FROM d GROUP BY y),
rk AS (
  SELECT v, CAST(2 * (CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c) + c + 1
           AS BIGINT) AS r2
  FROM g
),
dr AS (
  SELECT row_number() OVER (ORDER BY d.day) AS i, rk.r2
  FROM d JOIN rk ON rk.v = d.y
),
tot AS (
  SELECT count(*)::BIGINT AS nn,
         CAST(sum(CAST(r2 AS DECIMAL(38,0)) * r2) AS DOUBLE) AS sr2d
  FROM dr
),
nm AS (
  SELECT CAST(sum(CAST((a.r2 - b.r2) AS DECIMAL(38,0)) * (a.r2 - b.r2))
           AS DOUBLE) AS num2
  FROM dr a JOIN dr b ON b.i = a.i + 1
),
st AS (
  SELECT tot.nn, nm.num2,
         sr2d - 1e0 * nn * (nn + 1) * (nn + 1) AS den2
  FROM tot CROSS JOIN nm
),
rv AS (SELECT *, {_BR_RVN} AS rvn FROM st),
zz AS (SELECT *, {_BR_Z} AS z_stat FROM rv),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_days,
       CASE WHEN rvn IS NULL THEN NULL ELSE round(rvn, 6) + 0.0 END
         AS rvn_stat,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("bartels_rank_randomness", oracle=_br_oracle())
def bartels_rank_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels rank von Neumann ratio test of the daily-revenue series
    — the rank-robust randomness check next to the registered
    ``runs_test_daily_revenue``: the runs test throws away everything
    but signs, the rank von Neumann ratio keeps ordinal magnitude
    (Bartels 1982 shows ~30% higher ARE against AR(1) alternatives).
    RVN < 2 flags positive serial correlation (trending), > 2 flags
    oscillation; z is two-sided.

    Exactness: daily revenue cents are exact integers on the datediff
    day key; mid-ranks come from the grouped-value device (r2 = 2 *
    midrank integer, tie-exact); both quadratic sums keep the doubled
    factor (it cancels in the ratio) and promote per-row products to
    DECIMAL before the exact-wide sum -> DOUBLE once; sum 2R = n(n+1)
    exactly gives the denominator as SR2 - n(n+1)^2; the variance is
    one shared 1e0-promoted text; constant series (zero rank variance)
    or n < 4 NULL loud.

    Scale shape: one fact scan -> bounded day frame; the rank join and
    successive-difference join run over that bounded frame; one scalar
    reduce."""
    poly = _as_erfc_poly()
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("y"))
    d = d.localCheckpoint()  # bounded day frame; rank join + diff join
    g = d.groupBy(F.col("y").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rk = g.select(
        "v",
        (2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1)
        .cast("long")
        .alias("r2"),
    )
    dr = d.join(F.broadcast(rk), d.y == rk.v).select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "r2",
    )
    dr = dr.localCheckpoint()  # bounded ranked-day frame; tot + diff join
    tot = dr.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.expr(
            "CAST(sum(CAST(r2 AS DECIMAL(38,0)) * r2) AS DOUBLE)"
        ).alias("sr2d"),
    )
    a = dr.select(F.col("i").alias("ia"), F.col("r2").alias("ra"))
    b = dr.select(F.col("i").alias("ib"), F.col("r2").alias("rb"))
    nm = a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).agg(
        F.expr(
            "CAST(sum(CAST((ra - rb) AS DECIMAL(38,0)) * (ra - rb))"
            " AS DOUBLE)"
        ).alias("num2")
    )
    st = tot.crossJoin(F.broadcast(nm)).select(
        "nn",
        "num2",
        F.expr("sr2d - 1e0 * nn * (nn + 1) * (nn + 1)").alias("den2"),
    )
    rv = st.withColumn("rvn", F.expr(_BR_RVN))
    zz = rv.withColumn("z_stat", F.expr(_BR_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_days"),
        F.expr(
            "CASE WHEN rvn IS NULL THEN NULL ELSE round(rvn, 6) + 0.0 END"
        ).alias("rvn_stat"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- Durbin-Watson / von Neumann serial-correlation test ------------------------------

# Durbin & Watson (1950): DW = sum_t (e_t - e_{t-1})^2 / sum_t e_t^2
# over the (mean-zero) residual series; the classic first-order
# serial-correlation diagnostic a forecaster reads NEXT to the
# portmanteau (Ljung-Box asks "any structure at lags 1..m", DW asks
# "how much at lag 1, and in which direction": DW < 2 = positive serial
# correlation, > 2 = oscillation). Applied to the seasonal_ljung_box
# residual frame, the residuals are exact integers and both quadratic
# sums are exact; the mean-zero device is the same n*rw - S
# multiplication (DW is scale-invariant, the n^2 cancels, and the
# centered form makes sum(e) = 0 EXACTLY, the OLS-residual property the
# statistic assumes). The null readout is von Neumann's (1941) ratio
# eta = DW * n/(n-1) with Hart's (1942) exact null moments
# E[eta] = 2n/(n-1), Var[eta] = 4 n^2 (n-2) / ((n+1)(n-1)^3), z normal
# two-sided — the value-domain twin of the staged Bartels RANK form.
_DW_STAT = (
    "CASE WHEN nn < 4 OR den IS NULL OR den <= 0e0 OR num IS NULL THEN NULL"
    " ELSE num / den END"
)
_DW_ETA = "CASE WHEN dw IS NULL THEN NULL ELSE (dw * nn) / (nn - 1e0) END"
_DW_Z = (
    "CASE WHEN eta IS NULL THEN NULL"
    " ELSE round((eta - (2e0 * nn) / (nn - 1))"
    " / sqrt((4e0 * nn * nn * (nn - 2))"
    "        / ((nn + 1e0) * (nn - 1) * (nn - 1) * (nn - 1))), 6)"
    " + 0.0 END"
)


def _dw_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH wk AS (
  SELECT date_trunc('week', o_orderdate) AS w, count(*)::BIGINT AS c
  FROM orders GROUP BY 1
),
ma AS (
  SELECT w, c,
         CAST(sum(c) OVER (ORDER BY w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
           AS BIGINT) AS s5,
         count(*) OVER (ORDER BY w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
           AS win_n
  FROM wk
),
res AS (
  SELECT row_number() OVER (ORDER BY w) AS i,
         CAST(5 * c - s5 AS BIGINT) AS rw
  FROM ma WHERE win_n = 5
),
tot AS (SELECT count(*)::BIGINT AS nn, sum(rw)::BIGINT AS ss FROM res),
e AS (
  SELECT i, CAST(tot.nn * rw - tot.ss AS BIGINT) AS ee, tot.nn
  FROM res CROSS JOIN tot
),
den_t AS (
  SELECT CAST(sum(CAST(ee AS DECIMAL(38,0)) * ee) AS DOUBLE) AS den FROM e
),
nm AS (
  SELECT CAST(sum(CAST((b.ee - a.ee) AS DECIMAL(38,0)) * (b.ee - a.ee))
           AS DOUBLE) AS num
  FROM e a JOIN e b ON b.i = a.i + 1
),
st AS (SELECT tot.nn, nm.num, den_t.den FROM tot CROSS JOIN nm CROSS JOIN den_t),
dw_t AS (SELECT *, {_DW_STAT} AS dw FROM st),
et AS (SELECT *, {_DW_ETA} AS eta FROM dw_t),
zz AS (SELECT *, {_DW_Z} AS z_stat FROM et),
xt AS (
  SELECT *, abs(z_stat) / sqrt(2.0) AS _x,
         1 / (1 + 0.3275911 * (abs(z_stat) / sqrt(2.0))) AS _t
  FROM zz
)
SELECT nn AS n_resid_weeks,
       CASE WHEN dw IS NULL THEN NULL ELSE round(dw, 6) + 0.0 END AS dw_stat,
       CASE WHEN eta IS NULL THEN NULL ELSE round(eta, 6) + 0.0 END AS vn_eta,
       z_stat,
       CASE WHEN z_stat IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("durbin_watson_residuals", oracle=_dw_oracle())
def durbin_watson_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order serial-correlation statistic of the
    ``orders_trend_decomposition`` weekly MA5 residuals — the
    direction-and-magnitude lag-1 readout next to the staged
    ``seasonal_ljung_box_residuals`` omnibus (LB says "structure at
    lags 1..4 exists", DW says "lag-1, positive or negative, this
    much"), with von Neumann's ratio eta = DW n/(n-1) and Hart's exact
    null moments giving the two-sided normal z the family convention
    expects. DW < 2 flags positive serial correlation (the MA5 trend
    underfits), > 2 flags oscillation (it overfits).

    Exactness: the residual is the exact integer 5*c - s5 on the full
    centered window (the seasonal-LB frame verbatim); centering
    multiplies through by n (ee = n*rw - S, exact int64 on the
    documented envelope, sum(ee) = 0 EXACTLY — the mean-zero property
    DW assumes of OLS residuals); both quadratic sums promote the
    per-row product to DECIMAL(38,0) and convert to DOUBLE once; DW,
    eta, z are shared texts over those two doubles and nn. n < 4 or a
    zero residual sum-of-squares (exact-linear trend) NULLs loud.

    Scale shape: one fact scan -> bounded week frame -> bounded
    residual frame (checkpointed); the successive-difference join runs
    over that bounded frame; one scalar readout."""
    poly = _as_erfc_poly()
    wk = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", "o_orderdate").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    win = Window.orderBy("w").rowsBetween(-2, 2)
    ma = wk.select(
        "w",
        "c",
        F.sum("c").over(win).cast("long").alias("s5"),
        F.count(F.lit(1)).over(win).alias("win_n"),
    )
    res = (
        ma.filter(F.col("win_n") == 5)
        .select(
            F.row_number().over(Window.orderBy("w")).cast("long").alias("i"),
            (F.lit(5) * F.col("c") - F.col("s5")).cast("long").alias("rw"),
        )
    )
    res = res.localCheckpoint()  # bounded residual-week frame; tot + e
    tot = res.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("rw").cast("long").alias("ss"),
    )
    e = res.crossJoin(F.broadcast(tot)).select(
        "i",
        F.expr("CAST(nn * rw - ss AS BIGINT)").alias("ee"),
        "nn",
    )
    e = e.localCheckpoint()  # bounded centered frame; den + diff join
    den_t = e.agg(
        F.expr("CAST(sum(CAST(ee AS DECIMAL(38,0)) * ee) AS DOUBLE)").alias("den")
    )
    a = e.select(F.col("i").alias("ia"), F.col("ee").alias("ea"))
    b = e.select(F.col("i").alias("ib"), F.col("ee").alias("eb"))
    nm = a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).agg(
        F.expr(
            "CAST(sum(CAST((eb - ea) AS DECIMAL(38,0)) * (eb - ea))"
            " AS DOUBLE)"
        ).alias("num")
    )
    st = (
        tot.crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(den_t))
        .select("nn", "num", "den")
    )
    dw_t = st.withColumn("dw", F.expr(_DW_STAT))
    et = dw_t.withColumn("eta", F.expr(_DW_ETA))
    zz = et.withColumn("z_stat", F.expr(_DW_Z))
    xt = zz.withColumn("_x", F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))).withColumn(
        "_t", 1 / (1 + 0.3275911 * (F.abs(F.col("z_stat")) / F.sqrt(F.lit(2.0))))
    )
    return xt.select(
        F.col("nn").alias("n_resid_weeks"),
        F.expr(
            "CASE WHEN dw IS NULL THEN NULL ELSE round(dw, 6) + 0.0 END"
        ).alias("dw_stat"),
        F.expr(
            "CASE WHEN eta IS NULL THEN NULL ELSE round(eta, 6) + 0.0 END"
        ).alias("vn_eta"),
        "z_stat",
        F.expr(
            f"CASE WHEN z_stat IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )


# --- Dickey-Fuller unit-root test -----------------------------------------------------

# Dickey & Fuller (1979), constant-only case ("tau_mu"): regress the
# 1-day log change d_t = x_t - x_{t-1} on the lagged level x_{t-1}
# (intercept via centering); tau = rho_hat / se(rho_hat). Under the
# unit-root null tau follows the (nonstandard) Dickey-Fuller
# distribution — read against the published large-n critical values
# -2.57 / -2.86 / -3.43 at 10/5/1% (Fuller 1976; MacKinnon 1991), the
# tabulated-critical spec the staged KPSS query set the precedent for
# (the two are the null-reversed pair: KPSS null = stationary, DF null
# = unit root; a forecaster runs both before differencing).
# Each of the five OLS sums quantizes its per-row term at e12 and sums
# in DECIMAL(38,0) -> one DOUBLE conversion; the centered moments,
# rho, and tau are shared texts over those exact-sourced doubles.
_DF_L_E12 = "CAST(round(1000000000000 * xa) AS BIGINT)"
_DF_D_E12 = "CAST(round(1000000000000 * (xb - xa)) AS BIGINT)"
_DF_LD_E12 = "CAST(round(1000000000000 * (xa * (xb - xa))) AS BIGINT)"
_DF_LL_E12 = "CAST(round(1000000000000 * (xa * xa)) AS BIGINT)"
_DF_DD_E12 = "CAST(round(1000000000000 * ((xb - xa) * (xb - xa))) AS BIGINT)"
_DF_SLL = "(llqd / 1e12 - (lqd / 1e12) * (lqd / 1e12) / mm)"
_DF_SLD = "(ldqd / 1e12 - (lqd / 1e12) * (dqd / 1e12) / mm)"
_DF_SDD = "(ddqd / 1e12 - (dqd / 1e12) * (dqd / 1e12) / mm)"
_DF_RHO = (
    f"CASE WHEN anyn = 1 OR mm < 3e0"
    f" OR {_DF_SLL} <= 1e-9 * (llqd / 1e12) THEN NULL"
    f" ELSE {_DF_SLD} / {_DF_SLL} END"
)
_DF_TAU = (
    "CASE WHEN rho IS NULL OR sdd <= 0e0"
    " OR (sdd - rho * sld) <= 1e-9 * sdd THEN NULL"
    " ELSE round(rho / sqrt(((sdd - rho * sld) / (mm - 2)) / sll), 6)"
    " + 0.0 END"
)


def _df_oracle() -> str:
    return f"""
WITH d AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
ix AS (
  SELECT row_number() OVER (ORDER BY day) AS i,
         CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END AS x
  FROM d
),
tot AS (
  SELECT count(*)::BIGINT AS nn,
         max(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS anyn
  FROM ix
),
j AS (SELECT a.x AS xa, b.x AS xb FROM ix a JOIN ix b ON b.i = a.i + 1),
sm AS (
  SELECT CAST(sum(CAST({_DF_L_E12} AS DECIMAL(38,0))) AS DOUBLE) AS lqd,
         CAST(sum(CAST({_DF_D_E12} AS DECIMAL(38,0))) AS DOUBLE) AS dqd,
         CAST(sum(CAST({_DF_LD_E12} AS DECIMAL(38,0))) AS DOUBLE) AS ldqd,
         CAST(sum(CAST({_DF_LL_E12} AS DECIMAL(38,0))) AS DOUBLE) AS llqd,
         CAST(sum(CAST({_DF_DD_E12} AS DECIMAL(38,0))) AS DOUBLE) AS ddqd
  FROM j
),
st AS (
  SELECT tot.nn, tot.anyn, 1e0 * (tot.nn - 1) AS mm,
         sm.lqd, sm.dqd, sm.ldqd, sm.llqd, sm.ddqd
  FROM tot CROSS JOIN sm
),
ct AS (
  SELECT nn, anyn, mm, {_DF_SLL} AS sll, {_DF_SLD} AS sld, {_DF_SDD} AS sdd,
         {_DF_RHO} AS rho
  FROM st
),
tt AS (SELECT *, {_DF_TAU} AS tau FROM ct)
SELECT nn AS n_days, CAST(nn - 1 AS BIGINT) AS m_obs,
       CASE WHEN rho IS NULL THEN NULL ELSE round(rho, 6) + 0.0 END
         AS rho_hat,
       tau AS tau_stat,
       CASE WHEN tau IS NULL THEN NULL ELSE tau < -257e-2 END
         AS unit_root_rejected_10pct,
       CASE WHEN tau IS NULL THEN NULL ELSE tau < -286e-2 END
         AS unit_root_rejected_5pct,
       CASE WHEN tau IS NULL THEN NULL ELSE tau < -343e-2 END
         AS unit_root_rejected_1pct
FROM tt
"""


@staged("dickey_fuller_unit_root", oracle=_df_oracle())
def dickey_fuller_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (constant-only tau_mu, no
    augmentation) of the daily log-revenue series — the null-reversed
    twin of the staged ``kpss_level_stationarity`` (KPSS null =
    stationary, DF null = unit root: agreement between the two is the
    textbook pre-differencing protocol) on the SAME series the staged
    variance-ratio test reads (VR asks "random walk at the weekly
    horizon", DF asks "unit root at lag one"). tau is read against the
    published critical values -2.57/-2.86/-3.43 at 10/5/1% because the
    DF null distribution is nonstandard with no closed-form CDF — the
    tabulated-critical spec, documented (no p_value column by design).

    Exactness: daily revenue cents are exact integers on the datediff
    day key; x = ln(cents) is the established cross-engine-identical
    primitive; the five OLS sums (l, d, ld, l^2, d^2 over the
    lag-1 pair frame) each e12-quantize their per-row term and sum in
    DECIMAL(38,0) with ONE DOUBLE conversion; centered moments, rho =
    Sld/Sll, RSS = Sdd - rho*Sld, and tau = rho / sqrt((RSS/(m-2))/Sll)
    are shared texts over those exact-sourced doubles. Non-positive
    daily revenue, m < 3, lagged-level variance within 1e-9 * (sum
    l^2 / m-scale) of zero (a constant series — its mathematically-zero
    Sll survives only as quantization residue), or RSS within
    1e-9 * Sdd of zero NULL loud — the relative guards catch
    exact-deterministic series (a constant level, pure geometric
    growth, a two-point alternation) whose mathematically-zero moments
    survive only as e12-quantization residue; a fit that perfect is
    numerically degenerate at the quantization scale, and a statistic
    on residue would be meaningless noise. Day gaps index as consecutive trading days (the
    staged-VR convention, documented).

    Scale shape: one fact scan -> bounded day frame (checkpointed);
    the lag-1 pair frame is a self-join of that bounded frame; one
    five-sum scalar reduce."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("y"))
    ix = d.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.expr("CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END").alias("x"),
    )
    ix = ix.localCheckpoint()  # bounded day frame; tot + lag-1 pair join
    tot = ix.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.max(F.when(F.col("x").isNull(), 1).otherwise(0)).alias("anyn"),
    )
    a = ix.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = ix.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    j = a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).select("xa", "xb")
    sm = j.agg(
        F.expr(
            f"CAST(sum(CAST({_DF_L_E12} AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("lqd"),
        F.expr(
            f"CAST(sum(CAST({_DF_D_E12} AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("dqd"),
        F.expr(
            f"CAST(sum(CAST({_DF_LD_E12} AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("ldqd"),
        F.expr(
            f"CAST(sum(CAST({_DF_LL_E12} AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("llqd"),
        F.expr(
            f"CAST(sum(CAST({_DF_DD_E12} AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("ddqd"),
    )
    st = tot.crossJoin(F.broadcast(sm)).select(
        "nn",
        "anyn",
        F.expr("1e0 * (nn - 1)").alias("mm"),
        "lqd",
        "dqd",
        "ldqd",
        "llqd",
        "ddqd",
    )
    ct = st.select(
        "nn",
        "anyn",
        "mm",
        F.expr(_DF_SLL).alias("sll"),
        F.expr(_DF_SLD).alias("sld"),
        F.expr(_DF_SDD).alias("sdd"),
        F.expr(_DF_RHO).alias("rho"),
    )
    tt = ct.withColumn("tau", F.expr(_DF_TAU))
    return tt.select(
        F.col("nn").alias("n_days"),
        F.expr("CAST(nn - 1 AS BIGINT)").alias("m_obs"),
        F.expr(
            "CASE WHEN rho IS NULL THEN NULL ELSE round(rho, 6) + 0.0 END"
        ).alias("rho_hat"),
        F.col("tau").alias("tau_stat"),
        F.expr(
            "CASE WHEN tau IS NULL THEN NULL ELSE tau < -257e-2 END"
        ).alias("unit_root_rejected_10pct"),
        F.expr(
            "CASE WHEN tau IS NULL THEN NULL ELSE tau < -286e-2 END"
        ).alias("unit_root_rejected_5pct"),
        F.expr(
            "CASE WHEN tau IS NULL THEN NULL ELSE tau < -343e-2 END"
        ).alias("unit_root_rejected_1pct"),
    )


# --- Engle ARCH LM test ---------------------------------------------------------------

# Engle (1982): regress the squared (demeaned) return on its lag-1
# value; LM = m * R^2 ~ chi-square(1) under conditional homoskedasticity
# — the volatility-clustering diagnostic that completes the staged
# time-series family (VR asks "random walk in the MEAN", DF "unit root
# in the LEVEL", this asks "does VARIANCE cluster"). The demeaned
# return is u_t = d_t - mu with mu = (sum d)/m — identically the staged
# VR drift (x_n - x_1)/(n-1) — sourced from the e12-quantized D sum.
# The squared returns MAX-NORMALIZE before quantizing (the lesson-
# register max-normalize-before-quantize rule, hit live here: a naive
# e12 quantize of vx^2 overflowed BIGINT on a sparse corpus whose
# day-gap log-returns reach ~4.6): R^2 is invariant under separate
# rescaling of x and y, so vx/max(vx), vy/max(vy) are in [0,1], every
# per-row term is bounded, and no corpus can overflow. p is the EXACT
# chi-square(1) upper tail erfc(sqrt(LM/2)) via the shared
# Abramowitz-Stegun polynomial — no new approximation.
_ARCH_VX = "(((xb - xa) - mu) * ((xb - xa) - mu))"
_ARCH_VY = "(((xc - xb) - mu) * ((xc - xb) - mu))"
_ARCH_VXN = "CASE WHEN vmx <= 0e0 THEN 0e0 ELSE vx / vmx END"
_ARCH_VYN = "CASE WHEN vmy <= 0e0 THEN 0e0 ELSE vy / vmy END"
_ARCH_SXX = "(xxqd / 1e12 - (xqd / 1e12) * (xqd / 1e12) / mpf)"
_ARCH_SYY = "(yyqd / 1e12 - (yqd / 1e12) * (yqd / 1e12) / mpf)"
_ARCH_SXY = "(xyqd / 1e12 - (xqd / 1e12) * (yqd / 1e12) / mpf)"
_ARCH_R2 = (
    "CASE WHEN anyn = 1 OR nn < 5"
    " OR sxx <= 1e-9 * (xxqd / 1e12)"
    " OR syy <= 1e-9 * (yyqd / 1e12) THEN NULL"
    " ELSE least(1e0, (sxy * sxy) / (sxx * syy)) END"
)
_ARCH_LM = (
    "CASE WHEN r2 IS NULL"
    " OR (syy - (sxy * sxy) / sxx) <= 1e-9 * syy THEN NULL"
    " ELSE round(mpf * r2, 6) + 0.0 END"
)


def _arch_oracle() -> str:
    poly = _as_erfc_poly()
    return f"""
WITH d AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
ix AS (
  SELECT row_number() OVER (ORDER BY day) AS i,
         CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END AS x
  FROM d
),
tot AS (
  SELECT count(*)::BIGINT AS nn,
         max(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS anyn
  FROM ix
),
j1 AS (SELECT a.x AS xa, b.x AS xb FROM ix a JOIN ix b ON b.i = a.i + 1),
mu_t AS (
  SELECT CASE WHEN tot.nn < 2 THEN NULL
              ELSE (CAST(sum(CAST(CAST(round(1000000000000 * (xb - xa))
                     AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 1e12)
                   / (1e0 * (tot.nn - 1)) END AS mu
  FROM j1 CROSS JOIN tot GROUP BY tot.nn
),
t3 AS (
  SELECT a.x AS xa, b.x AS xb, c.x AS xc
  FROM ix a JOIN ix b ON b.i = a.i + 1 JOIN ix c ON c.i = a.i + 2
),
vv AS (
  SELECT {_ARCH_VX} AS vx, {_ARCH_VY} AS vy FROM t3 CROSS JOIN mu_t
),
vmax AS (SELECT max(vx) AS vmx, max(vy) AS vmy FROM vv),
vvn AS (
  SELECT {_ARCH_VXN} AS vx, {_ARCH_VYN} AS vy FROM vv CROSS JOIN vmax
),
sm AS (
  SELECT CAST(sum(CAST(CAST(round(1000000000000 * vx) AS BIGINT)
           AS DECIMAL(38,0))) AS DOUBLE) AS xqd,
         CAST(sum(CAST(CAST(round(1000000000000 * vy) AS BIGINT)
           AS DECIMAL(38,0))) AS DOUBLE) AS yqd,
         CAST(sum(CAST(CAST(round(1000000000000 * (vx * vy)) AS BIGINT)
           AS DECIMAL(38,0))) AS DOUBLE) AS xyqd,
         CAST(sum(CAST(CAST(round(1000000000000 * (vx * vx)) AS BIGINT)
           AS DECIMAL(38,0))) AS DOUBLE) AS xxqd,
         CAST(sum(CAST(CAST(round(1000000000000 * (vy * vy)) AS BIGINT)
           AS DECIMAL(38,0))) AS DOUBLE) AS yyqd
  FROM vvn
),
st AS (
  SELECT tot.nn, tot.anyn, 1e0 * (tot.nn - 2) AS mpf,
         sm.xqd, sm.yqd, sm.xyqd, sm.xxqd, sm.yyqd
  FROM tot CROSS JOIN sm
),
ct AS (
  SELECT nn, anyn, mpf, xxqd, yyqd,
         {_ARCH_SXX} AS sxx, {_ARCH_SYY} AS syy, {_ARCH_SXY} AS sxy
  FROM st
),
rt AS (SELECT *, {_ARCH_R2} AS r2 FROM ct),
lt AS (SELECT *, {_ARCH_LM} AS lm FROM rt),
xt AS (
  SELECT *, sqrt(lm / 2e0) AS _x,
         1 / (1 + 0.3275911 * sqrt(lm / 2e0)) AS _t
  FROM lt
)
SELECT nn AS n_days, CAST(nn - 2 AS BIGINT) AS m_pairs,
       CASE WHEN r2 IS NULL THEN NULL ELSE round(r2, 6) + 0.0 END
         AS arch_r2,
       lm AS lm_stat,
       CASE WHEN lm IS NULL THEN NULL
            ELSE round(({poly}), 6) + 0.0 END AS p_value
FROM xt
"""


@staged("arch_lm_test", oracle=_arch_oracle())
def arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle ARCH LM test (q = 1) of the daily log-revenue returns —
    the volatility-clustering member completing the staged time-series
    diagnostics (VR: random walk in the mean; DF/KPSS: unit root /
    stationarity of the level; this: does the VARIANCE of returns
    cluster). LM = m * R^2 of squared demeaned returns on their lag-1
    values, exact chi-square(1) upper tail.

    Exactness: the drift mu is the e12-quantized mean return (equal to
    the staged VR drift by telescoping); the squared returns
    MAX-NORMALIZE before quantizing (vx/max(vx), vy/max(vy) — R^2 is
    invariant under separate rescaling of x and y, so the regression
    operands are in [0,1] and NO corpus can overflow the e12 per-row
    quantize; the naive unnormalized form overflowed BIGINT live on a
    sparse corpus whose day-gap returns reach ~4.6); sums promote to
    DECIMAL(38,0) with one DOUBLE conversion; R^2 clamps at 1 (least);
    p = erfc(sqrt(LM/2)) is the EXACT chi-square(1) tail via the
    shared polynomial. Non-positive
    revenue, n < 5, a constant squared-return series (relative Sxx/Syy
    guards), or an auxiliary regression whose residual SS is within
    1e-9 * Syy of zero (a deterministic pattern fitting perfectly —
    e.g. the two-point alternation, whose R^2 = 1.0 survives in
    arch_r2 while lm/p NULL loud: a perfect fit at the quantization
    scale is not evidence of ARCH) NULL loud — the round-14
    relative-guard lesson applied at every degenerate-zeroable site.

    Scale shape: one fact scan -> bounded day frame (checkpointed);
    the lag-1 pair and consecutive-triple frames are self-joins of
    that bounded frame; two scalar reduces (drift, five-sum)."""
    poly = _as_erfc_poly()
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("day")
    ).agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("y"))
    ix = d.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.expr("CASE WHEN y <= 0 THEN NULL ELSE ln(1e0 * y) END").alias("x"),
    )
    ix = ix.localCheckpoint()  # bounded day frame; tot + pair/triple joins
    tot = ix.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.max(F.when(F.col("x").isNull(), 1).otherwise(0)).alias("anyn"),
    )
    a = ix.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = ix.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    c = ix.select(F.col("i").alias("ic"), F.col("x").alias("xc"))
    j1 = a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).select("xa", "xb")
    mu_t = (
        j1.crossJoin(F.broadcast(tot))
        .groupBy("nn")
        .agg(
            F.expr(
                "CASE WHEN nn < 2 THEN NULL"
                " ELSE (CAST(sum(CAST(CAST(round(1000000000000 * (xb - xa))"
                " AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 1e12)"
                " / (1e0 * (nn - 1)) END"
            ).alias("mu")
        )
        .select("mu")
    )
    t3 = (
        a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1)
        .join(F.broadcast(c), F.col("ic") == F.col("ia") + 2)
        .select("xa", "xb", "xc")
    )
    vv = t3.crossJoin(F.broadcast(mu_t)).select(
        F.expr(_ARCH_VX).alias("vx"), F.expr(_ARCH_VY).alias("vy")
    )
    vv = vv.localCheckpoint()  # bounded triple frame; vmax + five-sum reduce
    vmax = vv.agg(F.max("vx").alias("vmx"), F.max("vy").alias("vmy"))
    vvn = vv.crossJoin(F.broadcast(vmax)).select(
        F.expr(_ARCH_VXN).alias("vx"), F.expr(_ARCH_VYN).alias("vy")
    )
    sm = vvn.agg(
        F.expr(
            "CAST(sum(CAST(CAST(round(1000000000000 * vx) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("xqd"),
        F.expr(
            "CAST(sum(CAST(CAST(round(1000000000000 * vy) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("yqd"),
        F.expr(
            "CAST(sum(CAST(CAST(round(1000000000000 * (vx * vy)) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("xyqd"),
        F.expr(
            "CAST(sum(CAST(CAST(round(1000000000000 * (vx * vx)) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("xxqd"),
        F.expr(
            "CAST(sum(CAST(CAST(round(1000000000000 * (vy * vy)) AS BIGINT)"
            " AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("yyqd"),
    )
    st = tot.crossJoin(F.broadcast(sm)).select(
        "nn",
        "anyn",
        F.expr("1e0 * (nn - 2)").alias("mpf"),
        "xqd",
        "yqd",
        "xyqd",
        "xxqd",
        "yyqd",
    )
    ct = st.select(
        "nn",
        "anyn",
        "mpf",
        "xxqd",
        "yyqd",
        F.expr(_ARCH_SXX).alias("sxx"),
        F.expr(_ARCH_SYY).alias("syy"),
        F.expr(_ARCH_SXY).alias("sxy"),
    )
    rt = ct.withColumn("r2", F.expr(_ARCH_R2))
    lt = rt.withColumn("lm", F.expr(_ARCH_LM))
    xt = lt.withColumn("_x", F.expr("sqrt(lm / 2e0)")).withColumn(
        "_t", F.expr("1 / (1 + 0.3275911 * sqrt(lm / 2e0))")
    )
    return xt.select(
        F.col("nn").alias("n_days"),
        F.expr("CAST(nn - 2 AS BIGINT)").alias("m_pairs"),
        F.expr(
            "CASE WHEN r2 IS NULL THEN NULL ELSE round(r2, 6) + 0.0 END"
        ).alias("arch_r2"),
        F.col("lm").alias("lm_stat"),
        F.expr(
            f"CASE WHEN lm IS NULL THEN NULL"
            f" ELSE round(({poly}), 6) + 0.0 END"
        ).alias("p_value"),
    )
