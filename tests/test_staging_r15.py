"""Round-15 staged queries (plans/staging_r15.py): staging invariants,
plan lint, and independent Python brute-force references (the
staging_r8/r10/r11/r12/r13/r14 discipline — cross-engine parity proves
the engines AGREE, these pin the statistics against INTENT)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from flink_realtime_sessionize_sample_spark import plans
from flink_realtime_sessionize_sample_spark.plans import staging_r15 as S


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _round_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _rnd6(x: float) -> float:
    return _round_away(x * 1e6) / 1e6


def _erfc_poly(x: float) -> float:
    t = 1 / (1 + 0.3275911 * x)
    return (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t
        + 0.254829592
    ) * t * math.exp(-x * x)


def _events_pdf(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df.astype({"event_id": "int64", "user_id": "int64"})


def _orders_pdf(rows):
    df = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    return df


def _docs_pdf(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "n_chars"])
    return df.astype({"doc_id": "int64", "n_chars": "int64"})


def _write_tables(tmp_path, **tables) -> str:
    for name, df in tables.items():
        df.to_parquet(tmp_path / f"{name}.parquet", index=False)
    return str(tmp_path)


def _load_events(sf_dir: str) -> pd.DataFrame:
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def _load_orders(sf_dir: str) -> pd.DataFrame:
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    return pdf


def _load_docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _explain(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("extended"))


def _users_by_arm(n_each: int):
    """First n_each user ids hashing to arm 0 / arm 1 (the h48 % 2 arm)."""
    a0, a1 = [], []
    u = 0
    while len(a0) < n_each or len(a1) < n_each:
        (a0 if _h48(str(u)) % 2 == 0 else a1).append(u)
        u += 1
    return a0[:n_each], a1[:n_each]


def _sessions_py(pdf: pd.DataFrame):
    """Independent replication of the reference session semantics
    (30-min gap strict / 1499-event / 12-h strict): returns
    (user_id, start_sec, last_sec) per session."""
    out = []
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    secs_all = pdf["ts"].astype("int64") // 10**6
    for uid, idx in pdf.groupby("user_id").groups.items():
        start = prev = None
        cnt = 0
        for s in secs_all.loc[idx].tolist():
            if start is None:
                start, prev, cnt = s, s, 1
            elif (s - prev > 1800) or (cnt + 1 >= 1500) or (s - start > 43200):
                out.append((uid, start, prev))
                start, prev, cnt = s, s, 1
            else:
                prev, cnt = s, cnt + 1
        if start is not None:
            out.append((uid, start, prev))
    return out


# --- staging invariants ------------------------------------------------------


def test_staged_names_not_registered_live():
    # The round-14 window is full: staging must NOT leak into the live
    # registry until the round-15 promotion.
    leaked = [n for n in S.STAGED_QUERIES if n in plans.QUERIES]
    assert not leaked, f"staged names registered live behind a full window: {leaked}"


def test_every_staged_query_is_oracle_paired():
    missing = [n for n in S.STAGED_QUERIES if n not in S.STAGED_ORACLES]
    assert not missing, f"staged queries without oracles: {missing}"


def test_staged_plan_lint(spark, sf_small):
    offenders = {}
    for name, fn in S.STAGED_QUERIES.items():
        if name.startswith("stream_"):
            continue  # executes a stream replay on construction
        p = _explain(fn(spark, sf_small))
        bad = [pat for pat in ("CartesianProduct", "BatchEvalPython") if pat in p]
        if bad:
            offenders[name] = bad
    assert not offenders, f"staged plan lint failed: {offenders}"


# --- Tarone-corrected Breslow-Day -----------------------------------------------


def _tbd_ref(events: pd.DataFrame) -> dict:
    """Replicates the quantized Tarone/BD pipeline: psi from e9 ad/bc
    sums, att via the quadratic, per-stratum X^2 / deviation / variance
    terms each e9-quantized separately, clamp-at-zero correction."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # stratum -> [a, b, c, d]
    for uid, et, v in zip(events["user_id"], events["event_type"],
                          events["value"]):
        g = _h48(str(uid)) % 2
        y = 1 if v > 60 else 0
        cc = cells[et]
        if g == 1 and y == 1:
            cc[0] += 1
        elif g == 1:
            cc[1] += 1
        elif y == 1:
            cc[2] += 1
        else:
            cc[3] += 1
    strata = []
    for et, (a, b, c, d) in cells.items():
        n1, n0, m1, m0 = a + b, c + d, a + c, b + d
        if n1 > 0 and n0 > 0 and m1 > 0 and m0 > 0:
            strata.append((a, n1, m1, a + b + c + d))
    k = len(strata)
    out = {"n_strata": k, "dof": k - 1}
    ad_e9 = sum(_round_away(1e9 * (1.0 * a * (nt - n1 - m1 + a)) / nt)
                for a, n1, m1, nt in strata)
    bc_e9 = sum(_round_away(1e9 * (1.0 * (n1 - a) * (m1 - a)) / nt)
                for a, n1, m1, nt in strata)
    if bc_e9 == 0:
        out.update({"or_mh": None, "x2_bd": None, "x2_tarone": None,
                    "z_stat": None, "p_value": None})
        return out
    psi = (1.0 * ad_e9) / bc_e9
    out["or_mh"] = _rnd6(psi)
    x2_e9 = ds_e9 = vs_e9 = 0
    any_null = False
    for a, n1, m1, nt in strata:
        glo = max(0.0, 1.0 * (n1 + m1 - nt))
        ghi = min(1.0 * n1, 1.0 * m1)
        if abs(psi - 1.0) < 1e-12:
            att = (psi * n1 * m1) / (psi * (n1 + m1) + 1.0 * (nt - n1 - m1))
        else:
            aa = psi - 1.0
            bb = -(psi * (n1 + m1) + 1.0 * (nt - n1 - m1))
            cc2 = psi * n1 * m1
            sq = math.sqrt(max(0.0, bb * bb - 4.0 * aa * cc2))
            rt1 = (-bb + sq) / (2.0 * aa)
            rt2 = (-bb - sq) / (2.0 * aa)
            att = rt2 if glo <= rt2 <= ghi else rt1
        if att <= glo or att >= ghi:
            any_null = True
            break
        h = (1.0 / att + 1.0 / (n1 - att) + 1.0 / (m1 - att)
             + 1.0 / (nt - n1 - m1 + att))
        x2_e9 += _round_away(1e9 * ((1.0 * a - att) * (1.0 * a - att)) * h)
        ds_e9 += _round_away(1e9 * (1.0 * a - att))
        vs_e9 += _round_away(1e9 / h)
    if any_null or k < 2:
        out.update({"x2_bd": None, "x2_tarone": None, "z_stat": None,
                    "p_value": None})
        return out
    x2 = x2_e9 / 1e9
    out["x2_bd"] = _rnd6(x2)
    if vs_e9 <= 0:
        out.update({"x2_tarone": None, "z_stat": None, "p_value": None})
        return out
    x2t = max(0.0, x2 - ((ds_e9 / 1e9) * (ds_e9 / 1e9)) / (vs_e9 / 1e9))
    out["x2_tarone"] = _rnd6(x2t)
    dof = k - 1
    z = _rnd6(math.sqrt(2 * x2t) - math.sqrt(2.0 * dof - 1))
    out["z_stat"] = z
    p = _erfc_poly(abs(z) / math.sqrt(2.0))
    out["p_value"] = _rnd6(p / 2 if z >= 0 else 1 - p / 2)
    return out


def test_tarone_matches_python(spark, sf_small):
    ref = _tbd_ref(_load_events(sf_small))
    row = S.STAGED_QUERIES["tarone_bd_homogeneity"](spark, sf_small).collect()[0]
    assert row["n_strata"] == ref["n_strata"]
    assert row["dof"] == ref["dof"]
    for k in ("or_mh", "x2_bd", "x2_tarone", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_tarone_identical_strata_zero(spark, tmp_path):
    """Every stratum the same balanced OR = 1 table: psi = 1, the fitted
    cell equals the observed cell exactly, so BOTH statistics are 0 and
    the correction is 0 too."""
    a0, a1 = _users_by_arm(1)
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows, eid = [], 0
    for et in ("view", "click", "purchase"):
        for arm_users, g in ((a0, 0), (a1, 1)):
            for y in (0, 1):
                for _ in range(5):
                    rows.append(
                        (eid, ts + pd.Timedelta(seconds=eid), arm_users[0],
                         et, 100.0 if y else 1.0, "{}")
                    )
                    eid += 1
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["tarone_bd_homogeneity"](spark, sf).collect()[0]
    assert row["n_strata"] == 3 and row["dof"] == 2
    assert row["or_mh"] == 1.0
    assert row["x2_bd"] == 0.0 and row["x2_tarone"] == 0.0


def test_tarone_heterogeneity_detected_and_bounded(spark, tmp_path):
    """Two strata with OPPOSITE strong ORs (9 vs 1/9): the homogeneity
    statistic is large and significant, and the Tarone correction can
    only shrink it (0 <= X^2_T <= X^2_BD)."""
    a0, a1 = _users_by_arm(1)
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows, eid = [], 0
    # stratum 'view': arm1 (30 conv, 10 not), arm0 (10 conv, 30 not)
    # stratum 'click': mirrored
    plan = {
        "view": {(1, 1): 30, (1, 0): 10, (0, 1): 10, (0, 0): 30},
        "click": {(1, 1): 10, (1, 0): 30, (0, 1): 30, (0, 0): 10},
    }
    for et, cellmap in plan.items():
        for (g, y), cnt in cellmap.items():
            u = (a1 if g == 1 else a0)[0]
            for _ in range(cnt):
                rows.append(
                    (eid, ts + pd.Timedelta(seconds=eid), u, et,
                     100.0 if y else 1.0, "{}")
                )
                eid += 1
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["tarone_bd_homogeneity"](spark, sf).collect()[0]
    assert row["x2_bd"] is not None and row["x2_bd"] > 10
    assert row["x2_tarone"] is not None
    assert 0.0 <= row["x2_tarone"] <= row["x2_bd"] + 1e-9
    assert row["p_value"] < 0.01


# --- seasonal Ljung-Box on decomposition residuals --------------------------------


def _weekly_counts(orders: pd.DataFrame) -> list[int]:
    d = orders["o_orderdate"]
    week = d.dt.normalize() - pd.to_timedelta(d.dt.weekday, unit="D")
    return orders.groupby(week).size().sort_index().tolist()


def _slb_ref(orders: pd.DataFrame) -> dict:
    cs = _weekly_counts(orders)
    res = []
    for i in range(len(cs)):
        if 2 <= i <= len(cs) - 3:
            res.append(5 * cs[i] - sum(cs[i - 2:i + 3]))
    n = len(res)
    s = sum(res)
    out = {"n_resid_weeks": n, "dof": 4}
    den = float(sum((n * r - s) ** 2 for r in res))
    t_e12 = 0
    r1 = None
    any_null = False
    for k in range(1, 5):
        num = float(
            sum((n * res[i] - s) * (n * res[i + k] - s)
                for i in range(n - k))
        ) if n > k else 0.0
        if den <= 0 or n <= k:
            any_null = True
            continue
        rk = num / den
        if k == 1:
            r1 = rk
        t_e12 += _round_away(1e12 * (rk * rk) / (n - k))
    if n <= 4 or any_null:
        out.update({"r_lag1": None, "q_stat": None, "z_stat": None,
                    "p_value": None})
        return out
    q = (1.0 * n * (n + 2)) * (t_e12 / 1e12)
    out["r_lag1"] = _rnd6(r1)
    out["q_stat"] = _rnd6(q)
    z = _rnd6(math.sqrt(2 * q) - math.sqrt(2.0 * 4 - 1))
    out["z_stat"] = z
    p = _erfc_poly(abs(z) / math.sqrt(2.0))
    out["p_value"] = _rnd6(p / 2 if z >= 0 else 1 - p / 2)
    return out


def test_seasonal_lb_matches_python(spark, sf_small):
    ref = _slb_ref(_load_orders(sf_small))
    row = S.STAGED_QUERIES["seasonal_ljung_box_residuals"](
        spark, sf_small
    ).collect()[0]
    assert row["n_resid_weeks"] == ref["n_resid_weeks"]
    for k in ("r_lag1", "q_stat", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def _orders_for_weeks(counts) -> pd.DataFrame:
    """counts[i] orders placed inside ISO week i (Monday-anchored)."""
    base = pd.Timestamp("2024-01-01")  # a Monday
    rows = []
    for i, c in enumerate(counts):
        monday = base + pd.Timedelta(weeks=i)
        for j in range(c):
            rows.append((monday + pd.Timedelta(hours=j % 100), 100.0))
    return _orders_pdf(rows)


def test_seasonal_lb_alternating_residual_detected(spark, tmp_path):
    """Weekly counts alternating +-50 around 100: the MA5 residual
    alternates sign, so lag-1 autocorrelation is strongly negative and
    the portmanteau rejects white noise."""
    counts = [100 + (50 if i % 2 == 0 else -50) for i in range(20)]
    sf = _write_tables(tmp_path, orders=_orders_for_weeks(counts))
    row = S.STAGED_QUERIES["seasonal_ljung_box_residuals"](spark, sf).collect()[0]
    assert row["n_resid_weeks"] == 16
    assert row["r_lag1"] < -0.5
    assert row["p_value"] < 0.01


def test_seasonal_lb_exact_linear_trend_nulls_loud(spark, tmp_path):
    """A perfectly linear weekly series: the centered MA5 reproduces
    each center exactly, every residual is 0, the autocovariance
    denominator is 0, and the readout NULLs loud."""
    counts = [50 + 10 * i for i in range(12)]
    sf = _write_tables(tmp_path, orders=_orders_for_weeks(counts))
    row = S.STAGED_QUERIES["seasonal_ljung_box_residuals"](spark, sf).collect()[0]
    assert row["n_resid_weeks"] == 8
    assert row["q_stat"] is None and row["p_value"] is None


# --- streaming Cox score monitor ---------------------------------------------------


def _surv_obs_ref(events: pd.DataFrame):
    """(t, censored, hr) per session — Python twin of the survival
    observation frame."""
    secs = events["ts"].astype("int64") // 10**6
    mx = int(secs.max())
    out = []
    for _, start, last in _sessions_py(events):
        out.append((last - start, (mx - last) <= 1800, (start // 3600) % 24))
    return out


def _cox_terms_ref(obs, score_fn):
    """Replicates _cox_terms' e9-quantized reduction for covariate
    x = score_fn(hr). Returns (n_death_times, o, e_e9, v_e9)."""
    from collections import defaultdict

    bytime = defaultdict(lambda: [0, 0, 0, 0, 0])  # t -> [rm, rx, rx2, d, dx]
    for t, cens, hr in obs:
        x = score_fn(hr)
        b = bytime[t]
        b[0] += 1
        b[1] += x
        b[2] += x * x
        if not cens:
            b[3] += 1
            b[4] += x
    n_all = sum(b[0] for b in bytime.values())
    sx_all = sum(b[1] for b in bytime.values())
    sx2_all = sum(b[2] for b in bytime.values())
    cum = [0, 0, 0]
    o = e_e9 = v_e9 = ndt = 0
    for t in sorted(bytime):
        rm, rx, rx2, d, dx = bytime[t]
        nr = n_all - cum[0]
        sxr = sx_all - cum[1]
        sx2r = sx2_all - cum[2]
        cum = [cum[0] + rm, cum[1] + rx, cum[2] + rx2]
        if d > 0 and nr > 0:
            ndt += 1
            o += dx
            e_e9 += _round_away(1e9 * (1.0 * d * sxr) / nr)
            if nr > 1:
                v_e9 += _round_away(
                    1e9 * ((1.0 * d * (nr - d)) / (nr - 1))
                    * ((1.0 * nr * sx2r - 1.0 * sxr * sxr) / (1.0 * nr * nr))
                )
    return ndt, o, e_e9, v_e9


def _cox_z_p(o, e_e9, v_e9):
    if v_e9 <= 0:
        z = 0.0
    else:
        z = _rnd6((1.0 * o * 1e9 - e_e9) / math.sqrt(1.0 * v_e9 * 1e9))
    return z, _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))


def test_stream_cox_matches_python_on_odd_half(spark, sf_small):
    """The twin must equal the batch Cox statistic computed over the
    odd-user half — replicated independently in Python (sessionize +
    censoring + e9-quantized score reduction)."""
    ev = _load_events(sf_small)
    odd = ev[ev["user_id"] % 2 == 1]
    ndt, o, e_e9, v_e9 = _cox_terms_ref(_surv_obs_ref(odd), lambda hr: hr)
    z, p = _cox_z_p(o, e_e9, v_e9)
    row = S.STAGED_QUERIES["stream_cox_score_monitor"](spark, sf_small).collect()[0]
    assert row["n_death_times"] == ndt
    assert row["o_hours"] == o
    assert abs(row["e_hours"] - _rnd6(e_e9 / 1e9)) < 2e-6
    assert abs(row["z_stat"] - z) < 2e-6
    assert abs(row["p_value"] - p) < 2e-6


# --- D'Agostino-Pearson K^2 -----------------------------------------------------


def _dk_ref(values) -> dict:
    cents = [_round_away(v * 100) for v in values]
    nn = len(cents)
    s1 = sum(cents)
    d2 = float(sum(c * c for c in cents))
    d3 = float(sum(c ** 3 for c in cents))
    d4 = float(sum(c ** 4 for c in cents))
    out = {"n_events": nn}
    if nn < 2:
        out.update({k: None for k in ("skewness", "kurtosis_excess", "z_skew",
                                      "z_kurt", "k2_stat", "p_value")})
        return out
    m1 = 1.0 * s1 / nn
    m2 = d2 / nn - m1 * m1
    m3 = d3 / nn - 3.0 * m1 * (d2 / nn) + 2.0 * m1 ** 3
    m4 = d4 / nn - 4.0 * m1 * (d3 / nn) + 6.0 * m1 * m1 * (d2 / nn) - 3.0 * m1 ** 4
    if m2 <= 0:
        out.update({k: None for k in ("skewness", "kurtosis_excess", "z_skew",
                                      "z_kurt", "k2_stat", "p_value")})
        return out
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    out["skewness"] = _rnd6(skew)
    out["kurtosis_excess"] = _rnd6(kurt)
    if nn < 20:
        out.update({"z_skew": None, "z_kurt": None, "k2_stat": None,
                    "p_value": None})
        return out
    y = skew * math.sqrt(((nn + 1.0) * (nn + 3.0)) / (6.0 * (nn - 2.0)))
    b2t = (3.0 * (nn * nn + 27.0 * nn - 70.0) * (nn + 1.0) * (nn + 3.0)) / (
        (nn - 2.0) * (nn + 5.0) * (nn + 7.0) * (nn + 9.0)
    )
    w2 = -1.0 + math.sqrt(2.0 * (b2t - 1.0))
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))
    x = ((kurt + 3.0) - (3.0 * (nn - 1.0)) / (nn + 1.0)) / math.sqrt(
        (24.0 * nn * (nn - 2.0) * (nn - 3.0))
        / ((nn + 1.0) ** 2 * (nn + 3.0) * (nn + 5.0))
    )
    sb1 = ((6.0 * (nn * nn - 5.0 * nn + 2.0)) / ((nn + 3.0) * (nn + 5.0))) * math.sqrt(
        (6.0 * (nn + 3.0) * (nn + 5.0)) / (nn * (nn - 2.0) * (nn - 3.0))
    )
    av = 6.0 + (8.0 / sb1) * (2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    den = 1.0 + x * math.sqrt(2.0 / (av - 4.0))
    if den == 0:
        out.update({"z_skew": _rnd6(z1), "z_kurt": None, "k2_stat": None,
                    "p_value": None})
        return out
    u = (1.0 - 2.0 / av) / den
    z2 = ((1.0 - 2.0 / (9.0 * av))
          - math.copysign(abs(u) ** (1.0 / 3.0), u)) / math.sqrt(2.0 / (9.0 * av))
    k2 = z1 * z1 + z2 * z2
    out.update({
        "z_skew": _rnd6(z1), "z_kurt": _rnd6(z2), "k2_stat": _rnd6(k2),
        "p_value": _rnd6(math.exp(-k2 / 2.0)),
    })
    return out


def test_dagostino_matches_python(spark, sf_small):
    ref = _dk_ref(_load_events(sf_small)["value"].tolist())
    row = S.STAGED_QUERIES["dagostino_k2_normality"](spark, sf_small).collect()[0]
    assert row["n_events"] == ref["n_events"]
    for k in ("skewness", "kurtosis_excess", "z_skew", "z_kurt", "k2_stat",
              "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_dagostino_symmetric_two_point(spark, tmp_path):
    """A symmetric two-point distribution: skewness is exactly 0 (so
    z_skew = 0 exactly — Johnson SU maps 0 to 0), kurtosis is the
    minimal -2, so the kurtosis arm drives all of K^2 and the omnibus
    rejects decisively. (At b2 = 1 the Anscombe-Glynn denominator
    crosses zero and the transform's SIGN flips — the same artifact
    scipy's kurtosistest exhibits — so the pin is on |z_kurt| and on
    the Python-reference value, not on the sign.)"""
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows = []
    for i in range(30):
        v = 50.0 if i % 2 == 0 else -50.0
        rows.append((i, ts + pd.Timedelta(seconds=i), 1, "view", v, "{}"))
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["dagostino_k2_normality"](spark, sf).collect()[0]
    ref = _dk_ref([50.0 if i % 2 == 0 else -50.0 for i in range(30)])
    assert row["skewness"] == 0.0
    assert row["z_skew"] == 0.0
    assert row["kurtosis_excess"] == -2.0
    assert abs(row["z_kurt"]) > 2
    assert abs(row["z_kurt"] - ref["z_kurt"]) < 2e-6
    assert abs(row["k2_stat"] - row["z_kurt"] ** 2) < 2e-5
    assert row["p_value"] < 0.01


def test_dagostino_small_n_nulls_loud(spark, tmp_path):
    """n = 10 < 20 (the Anscombe-Glynn floor): moments report, the
    transformed z's and K^2 NULL loud."""
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows = [(i, ts + pd.Timedelta(seconds=i), 1, "view", float(i * 7 % 13), "{}")
            for i in range(10)]
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["dagostino_k2_normality"](spark, sf).collect()[0]
    assert row["n_events"] == 10
    assert row["skewness"] is not None
    assert row["z_skew"] is None and row["z_kurt"] is None
    assert row["k2_stat"] is None and row["p_value"] is None


# --- KPSS level stationarity -----------------------------------------------------


def _daily_cents(orders: pd.DataFrame) -> list[int]:
    days = (orders["o_orderdate"].astype("int64") // (86400 * 10**6)).astype(int)
    cents = orders["o_totalprice"].map(lambda v: _round_away(v * 100))
    g = pd.DataFrame({"d": days, "c": cents}).groupby("d")["c"].sum()
    return [int(v) for _, v in sorted(g.items())]


def _kpss_ref(ys: list[int]) -> dict:
    nn = len(ys)
    ss = sum(ys)
    ll = int(math.floor(4.0 * math.sqrt(math.sqrt(nn / 100.0))))
    out = {"n_days": nn, "lag_l": ll}
    es = [nn * y - ss for y in ys]
    den = float(sum(e * e for e in es))
    if den <= 0 or nn < 2:
        out.update({"kpss_eta": None, "stationary_10pct": None,
                    "stationary_5pct": None, "stationary_1pct": None})
        return out
    p8 = 0
    sc = 0
    for e in es:
        sc += e
        p8 += _round_away(1e8 * ((1.0 * sc * sc) / den))
    w2q = 0
    for k in range(1, min(12, ll) + 1):
        g = float(sum(es[i] * es[i + k] for i in range(nn - k)))
        w2q += (ll + 1 - k) * _round_away(1e8 * (g / den))
    wq8 = (ll + 1) * 100000000 + 2 * w2q
    if wq8 <= 0:
        out.update({"kpss_eta": None, "stationary_10pct": None,
                    "stationary_5pct": None, "stationary_1pct": None})
        return out
    eta = ((p8 / 1e8) * (ll + 1)) / (1.0 * nn * (wq8 / 1e8))
    out["kpss_eta"] = _rnd6(eta)
    out["stationary_10pct"] = eta < 0.347
    out["stationary_5pct"] = eta < 0.463
    out["stationary_1pct"] = eta < 0.739
    return out


def test_kpss_matches_python(spark, sf_small):
    ref = _kpss_ref(_daily_cents(_load_orders(sf_small)))
    row = S.STAGED_QUERIES["kpss_level_stationarity"](spark, sf_small).collect()[0]
    assert row["n_days"] == ref["n_days"]
    assert row["lag_l"] == ref["lag_l"]
    if ref["kpss_eta"] is None:
        assert row["kpss_eta"] is None
    else:
        assert abs(row["kpss_eta"] - ref["kpss_eta"]) < 2e-6
        for k in ("stationary_10pct", "stationary_5pct", "stationary_1pct"):
            assert row[k] == ref[k], k


def _orders_for_daily(ys) -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01")
    rows = [(base + pd.Timedelta(days=i), y / 100.0) for i, y in enumerate(ys)]
    return _orders_pdf(rows)


def test_kpss_trending_series_rejects(spark, tmp_path):
    """A strongly trending level (y_t = 1000 t): the partial sums of the
    demeaned series grow like n^2 and eta lands far above every
    critical value — level stationarity rejected at 1%."""
    ys = [100000 + 1000 * i for i in range(200)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["kpss_level_stationarity"](spark, sf).collect()[0]
    assert row["kpss_eta"] > 0.739
    assert row["stationary_1pct"] is False
    assert row["stationary_5pct"] is False


def test_kpss_alternating_series_accepts(spark, tmp_path):
    """A bounded alternating level: partial sums stay O(1), eta is far
    below 0.347 — stationary at every published level."""
    ys = [100000 + (500 if i % 2 == 0 else -500) for i in range(200)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["kpss_level_stationarity"](spark, sf).collect()[0]
    assert row["kpss_eta"] < 0.347
    assert row["stationary_10pct"] is True


def test_kpss_constant_series_nulls_loud(spark, tmp_path):
    ys = [100000] * 50
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["kpss_level_stationarity"](spark, sf).collect()[0]
    assert row["kpss_eta"] is None and row["stationary_5pct"] is None


# --- PACF of daily event counts --------------------------------------------------


def _event_day_counts(events: pd.DataFrame) -> dict[int, int]:
    days = (events["ts"].astype("int64") // (86400 * 10**6)).astype(int)
    return {int(d): int(c) for d, c in days.value_counts().items()}


def _pacf_ref(day_counts: dict[int, int]) -> dict:
    nn = len(day_counts)
    ss = sum(day_counts.values())
    es = {d: nn * c - ss for d, c in day_counts.items()}
    den = float(sum(e * e for e in es.values()))
    out = {"n_days": nn}
    rs = {}
    for k in (1, 2, 3):
        num = float(sum(es[d] * es[d + k] for d in es if d + k in es))
        rs[k] = None if den <= 0 else num / den
    r1, r2, r3 = rs[1], rs[2], rs[3]
    out["r_1"], out["r_2"], out["r_3"] = (
        None if r is None else _rnd6(r) for r in (r1, r2, r3)
    )
    out["pacf_1"] = out["r_1"]
    p22 = p21 = p33 = None
    if r1 is not None and r2 is not None and (1.0 - r1 * r1) != 0:
        p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        p21 = r1 * (1.0 - p22)
    if (p21 is not None and r3 is not None
            and (1.0 - p21 * r1 - p22 * r2) != 0):
        p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    out["pacf_2"] = None if p22 is None else _rnd6(p22)
    out["pacf_3"] = None if p33 is None else _rnd6(p33)
    out["ci_band"] = None if nn < 1 else _rnd6(1.959964 / math.sqrt(nn))
    return out


def test_pacf_matches_python(spark, sf_small):
    ref = _pacf_ref(_event_day_counts(_load_events(sf_small)))
    row = S.STAGED_QUERIES["pacf_daily_events"](spark, sf_small).collect()[0]
    assert row["n_days"] == ref["n_days"]
    for k in ("r_1", "r_2", "r_3", "pacf_1", "pacf_2", "pacf_3", "ci_band"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def _events_for_daily_counts(counts) -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, base + pd.Timedelta(days=i, seconds=j), 1,
                         "view", 1.0, "{}"))
            eid += 1
    return _events_pdf(rows)


def test_pacf_alternating_counts(spark, tmp_path):
    """Daily counts alternating 150/50: lag-1 autocorrelation is near
    -1, and after regressing lag 1 out, lag 2 carries nothing new —
    the AR signature PACF exists to expose."""
    counts = [150 if i % 2 == 0 else 50 for i in range(30)]
    sf = _write_tables(tmp_path, events=_events_for_daily_counts(counts))
    row = S.STAGED_QUERIES["pacf_daily_events"](spark, sf).collect()[0]
    assert row["pacf_1"] < -0.9
    assert abs(row["pacf_2"]) < abs(row["pacf_1"])
    ref = _pacf_ref({i: c for i, c in enumerate(counts)})
    for k in ("pacf_1", "pacf_2", "pacf_3"):
        assert abs(row[k] - ref[k]) < 2e-6, k


def test_pacf_constant_counts_null_loud(spark, tmp_path):
    counts = [100] * 20
    sf = _write_tables(tmp_path, events=_events_for_daily_counts(counts))
    row = S.STAGED_QUERIES["pacf_daily_events"](spark, sf).collect()[0]
    assert row["pacf_1"] is None and row["pacf_2"] is None
    assert row["pacf_3"] is None


# --- Lo-MacKinlay variance ratio --------------------------------------------------


def _vr_ref(ys: list[int]) -> dict:
    nn = len(ys)
    out = {"n_days": nn, "q": 5}
    if nn <= 6 or any(y <= 0 for y in ys):
        out.update({"vr_stat": None, "z_stat": None, "p_value": None})
        return out
    xs = [math.log(1.0 * y) for y in ys]
    mu = (xs[-1] - xs[0]) / (nn - 1)
    s1q = sum(_round_away(1e12 * (xs[i + 1] - xs[i] - mu) ** 2)
              for i in range(nn - 1))
    s5q = sum(_round_away(1e12 * (xs[i + 5] - xs[i] - 5.0 * mu) ** 2)
              for i in range(nn - 5))
    s2a = (s1q / 1e12) / (nn - 1)
    if s2a <= 0:
        out.update({"vr_stat": None, "z_stat": None, "p_value": None})
        return out
    mm = 5.0 * (nn - 4) * (1.0 - 5.0 / nn)
    vr = ((s5q / 1e12) / mm) / s2a
    out["vr_stat"] = _rnd6(vr)
    z = _rnd6((vr - 1.0) / math.sqrt(4.8 / nn))
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    return out


def test_vr_matches_python(spark, sf_small):
    ref = _vr_ref(_daily_cents(_load_orders(sf_small)))
    row = S.STAGED_QUERIES["variance_ratio_random_walk"](
        spark, sf_small
    ).collect()[0]
    assert row["n_days"] == ref["n_days"]
    for k in ("vr_stat", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_vr_mean_reverting_series(spark, tmp_path):
    """A two-point oscillating level is maximally mean-reverting: the
    5-day log change has the same magnitude as the 1-day change, so
    VR sits near 1/5 and z is decisively negative."""
    ys = [100000 if i % 2 == 0 else 200000 for i in range(120)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["variance_ratio_random_walk"](spark, sf).collect()[0]
    assert row["vr_stat"] < 0.5
    assert row["z_stat"] < -3
    assert row["p_value"] < 0.01


def test_vr_exact_geometric_growth_nulls_loud(spark, tmp_path):
    """Exact doubling every day: every 1-day log change equals the
    drift, the e12-quantized deviations vanish, and the zero 1-day
    variance NULLs the ratio loud."""
    ys = [100 * 2**i for i in range(30)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["variance_ratio_random_walk"](spark, sf).collect()[0]
    assert row["vr_stat"] is None and row["z_stat"] is None


# --- Poisson rate ratio ------------------------------------------------------------


def _pr_ref(events: pd.DataFrame) -> dict:
    arms = events["user_id"].map(lambda u: _h48(str(u)) % 2)
    e1 = int(arms.sum())
    e0 = int(len(arms) - e1)
    users = events["user_id"].unique()
    nu1 = sum(1 for u in users if _h48(str(u)) % 2 == 1)
    nu0 = len(users) - nu1
    out = {"n_users_0": nu0, "n_users_1": nu1, "events_0": e0, "events_1": e1}
    out["rate_0"] = None if nu0 < 1 else _rnd6(1.0 * e0 / nu0)
    out["rate_1"] = None if nu1 < 1 else _rnd6(1.0 * e1 / nu1)
    nt = e0 + e1
    if nt < 1 or nu0 < 1 or nu1 < 1:
        out.update({"rate_ratio": None, "rr_lo": None, "rr_hi": None,
                    "z_stat": None, "p_value": None})
        return out
    z = _rnd6(
        (1.0 * e1 - (1.0 * nt * nu1) / (nu0 + nu1))
        / math.sqrt((1.0 * nt * nu1 * nu0) / ((1.0 * (nu0 + nu1)) * (nu0 + nu1)))
    )
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    if e0 < 1 or e1 < 1:
        out.update({"rate_ratio": None, "rr_lo": None, "rr_hi": None})
        return out
    rr = (1.0 * e1 / nu1) / (1.0 * e0 / nu0)
    hw = 1.959964 * math.sqrt(1.0 / e0 + 1.0 / e1)
    out["rate_ratio"] = _rnd6(rr)
    out["rr_lo"] = _rnd6(math.exp(math.log(rr) - hw))
    out["rr_hi"] = _rnd6(math.exp(math.log(rr) + hw))
    return out


def test_rate_ratio_matches_python(spark, sf_small):
    ref = _pr_ref(_load_events(sf_small))
    row = S.STAGED_QUERIES["poisson_rate_ratio_ab"](spark, sf_small).collect()[0]
    for k in ("n_users_0", "n_users_1", "events_0", "events_1"):
        assert row[k] == ref[k], k
    for k in ("rate_0", "rate_1", "rate_ratio", "rr_lo", "rr_hi", "z_stat",
              "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_rate_ratio_doubled_rate_detected(spark, tmp_path):
    """5 users per arm, arm 1 firing 20 events/user vs arm 0's 10: the
    ratio is exactly 2, the interval excludes 1, z is positive."""
    a0, a1 = _users_by_arm(5)
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows, eid = [], 0
    for users, per in ((a0, 10), (a1, 20)):
        for u in users:
            for _ in range(per):
                rows.append((eid, ts + pd.Timedelta(seconds=eid), u, "view",
                             1.0, "{}"))
                eid += 1
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["poisson_rate_ratio_ab"](spark, sf).collect()[0]
    assert row["n_users_0"] == 5 and row["n_users_1"] == 5
    assert row["rate_ratio"] == 2.0
    assert row["rr_lo"] > 1.0
    assert row["z_stat"] > 3
    assert row["p_value"] < 0.01


def test_rate_ratio_equal_rates_zero(spark, tmp_path):
    """Identical per-user intensity in both arms: z is exactly 0 and
    the ratio is exactly 1."""
    a0, a1 = _users_by_arm(4)
    ts = pd.Timestamp("2024-04-01 10:00:00")
    rows, eid = [], 0
    for users in (a0, a1):
        for u in users:
            for _ in range(12):
                rows.append((eid, ts + pd.Timedelta(seconds=eid), u, "view",
                             1.0, "{}"))
                eid += 1
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["poisson_rate_ratio_ab"](spark, sf).collect()[0]
    assert row["rate_ratio"] == 1.0
    assert row["z_stat"] == 0.0
    assert row["p_value"] == 1.0
    assert row["rr_lo"] < 1.0 < row["rr_hi"]


def test_stream_rate_matches_python_on_odd_half(spark, sf_small):
    ev = _load_events(sf_small)
    ref = _pr_ref(ev[ev["user_id"] % 2 == 1])
    row = S.STAGED_QUERIES["stream_poisson_rate_monitor"](
        spark, sf_small
    ).collect()[0]
    for k in ("n_users_0", "n_users_1", "events_0", "events_1"):
        assert row[k] == ref[k], k
    for k in ("rate_ratio", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


# --- Cuzick trend ------------------------------------------------------------------


def _cz_ref(events: pd.DataFrame) -> dict:
    secs = events["ts"].astype("int64") // 10**6
    bands = ((secs // 3600) % 24) // 6
    cents = events["value"].map(lambda v: _round_away(v * 100))
    n = len(cents)
    # doubled midranks per value
    from collections import Counter

    cnt = Counter(cents.tolist())
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        r2[v] = 2 * cum + c + 1
        cum += c
    t2 = sum(int(l) * r2[v] for l, v in zip(bands, cents))
    l1 = int(bands.sum())
    sl2 = int((bands * bands).sum())
    sr2 = sum(c * r2[v] ** 2 for v, c in cnt.items())
    out = {"n_events": n, "t_x2": t2}
    out["e_x2"] = None if n < 1 else _rnd6(1.0 * (n + 1) * l1)
    var = ((1.0 * n * sl2 - 1.0 * l1 * l1) / n) * (
        (1.0 * sr2 - 1.0 * n * (n + 1) * (n + 1)) / (n - 1)
    ) if n >= 2 else 0.0
    if n < 2 or var <= 0:
        out.update({"z_stat": None, "p_value": None})
        return out
    z = _rnd6((1.0 * t2 - 1.0 * (n + 1) * l1) / math.sqrt(var))
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    return out


def test_cuzick_matches_python(spark, sf_small):
    ref = _cz_ref(_load_events(sf_small))
    row = S.STAGED_QUERIES["cuzick_trend_by_tod"](spark, sf_small).collect()[0]
    assert row["n_events"] == ref["n_events"]
    assert row["t_x2"] == ref["t_x2"]
    for k in ("e_x2", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_cuzick_monotone_band_shift_detected(spark, tmp_path):
    """Values strictly increasing in the time-of-day band (10, 20, 30,
    40): the rank trend is maximal, z is large positive."""
    rows, eid = [], 0
    for band, hour, val in ((0, 3, 10.0), (1, 9, 20.0), (2, 15, 30.0),
                            (3, 21, 40.0)):
        for i in range(25):
            ts = pd.Timestamp("2024-04-01") + pd.Timedelta(
                days=i, hours=hour, seconds=eid % 60
            )
            rows.append((eid, ts, 1, "view", val, "{}"))
            eid += 1
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["cuzick_trend_by_tod"](spark, sf).collect()[0]
    assert row["z_stat"] > 5
    assert row["p_value"] < 0.001


def test_cuzick_constant_values_null_loud(spark, tmp_path):
    """All values identical: every mid-rank equals (N+1)/2, the rank
    variance is 0, and the readout NULLs loud."""
    rows = []
    for i in range(40):
        ts = pd.Timestamp("2024-04-01") + pd.Timedelta(hours=i % 24)
        rows.append((i, ts, 1, "view", 7.0, "{}"))
    sf = _write_tables(tmp_path, events=_events_pdf(rows))
    row = S.STAGED_QUERIES["cuzick_trend_by_tod"](spark, sf).collect()[0]
    assert row["z_stat"] is None and row["p_value"] is None


# --- partial correlation -------------------------------------------------------------


def _pc_ref(docs: pd.DataFrame) -> dict:
    xs, ys, ws = [], [], []
    for t, nc in zip(docs["text"], docs["n_chars"]):
        toks = t.strip().lower().split(" ")
        xs.append(int(nc))
        ys.append(len(toks))
        ws.append(len(set(toks)))
    nn = len(xs)
    sums = {
        "sx": sum(xs), "sy": sum(ys), "sw": sum(ws),
        "sxx": sum(x * x for x in xs), "sxy": sum(x * y for x, y in zip(xs, ys)),
        "syy": sum(y * y for y in ys), "sxw": sum(x * w for x, w in zip(xs, ws)),
        "syw": sum(y * w for y, w in zip(ys, ws)),
        "sww": sum(w * w for w in ws),
    }
    def corr(u, v):
        duu = 1.0 * nn * sums[f"s{u}{u}"] - 1.0 * sums[f"s{u}"] * sums[f"s{u}"]
        dvv = 1.0 * nn * sums[f"s{v}{v}"] - 1.0 * sums[f"s{v}"] * sums[f"s{v}"]
        if nn < 4 or duu <= 0 or dvv <= 0:
            return None
        duv = 1.0 * nn * sums[f"s{u}{v}"] - 1.0 * sums[f"s{u}"] * sums[f"s{v}"]
        return duv / math.sqrt(duu * dvv)

    rxy, rxw, ryw = corr("x", "y"), corr("x", "w"), corr("y", "w")
    out = {"n_docs": nn}
    out["r_xy"] = None if rxy is None else _rnd6(rxy)
    out["r_xw"] = None if rxw is None else _rnd6(rxw)
    out["r_yw"] = None if ryw is None else _rnd6(ryw)
    pr = None
    if (rxy is not None and rxw is not None and ryw is not None
            and (1.0 - rxw * rxw) * (1.0 - ryw * ryw) > 0):
        pr = (rxy - rxw * ryw) / math.sqrt(
            (1.0 - rxw * rxw) * (1.0 - ryw * ryw)
        )
    out["partial_r"] = None if pr is None else _rnd6(pr)
    if pr is None or abs(pr) >= 1.0 or nn < 5:
        out.update({"z_stat": None, "p_value": None})
        return out
    z = _rnd6(0.5 * math.log((1.0 + pr) / (1.0 - pr)) * math.sqrt(1.0 * nn - 4))
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    return out


def test_partial_corr_matches_python(spark, sf_small):
    ref = _pc_ref(_load_docs(sf_small))
    row = S.STAGED_QUERIES["partial_corr_chars_tokens"](
        spark, sf_small
    ).collect()[0]
    assert row["n_docs"] == ref["n_docs"]
    for k in ("r_xy", "r_xw", "r_yw", "partial_r", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_partial_corr_constant_control_nulls_loud(spark, tmp_path):
    """Every document with identical vocabulary breadth: the control has
    zero variance, r_xw is undefined, and the partial NULLs loud."""
    rows = []
    for i in range(20):
        text = " ".join(["alpha", "beta", "gamma"] * (i + 1))
        rows.append((i, text, len(text)))
    sf = _write_tables(tmp_path, documents=_docs_pdf(rows))
    row = S.STAGED_QUERIES["partial_corr_chars_tokens"](spark, sf).collect()[0]
    assert row["r_xw"] is None
    assert row["partial_r"] is None and row["z_stat"] is None


def test_partial_corr_collinear_control_nulls_loud(spark, tmp_path):
    """Every token distinct: token count == distinct count exactly, so
    r_yw = 1 and the partial's denominator is 0 — loud NULL, not a
    manufactured statistic."""
    rows = []
    for i in range(20):
        toks = [f"w{i}x{j}" for j in range(3 + (i * 5) % 11)]
        text = " ".join(toks)
        rows.append((i, text, len(text)))
    sf = _write_tables(tmp_path, documents=_docs_pdf(rows))
    row = S.STAGED_QUERIES["partial_corr_chars_tokens"](spark, sf).collect()[0]
    assert row["r_yw"] == 1.0
    assert row["partial_r"] is None and row["z_stat"] is None


# --- Bartels rank von Neumann ---------------------------------------------------------


def _br_ref(ys: list[int]) -> dict:
    nn = len(ys)
    out = {"n_days": nn}
    from collections import Counter

    cnt = Counter(ys)
    r2m = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        r2m[v] = 2 * cum + c + 1
        cum += c
    r2s = [r2m[y] for y in ys]
    num2 = float(sum((r2s[i] - r2s[i + 1]) ** 2 for i in range(nn - 1)))
    sr2 = float(sum(r * r for r in r2s))
    den2 = sr2 - 1.0 * nn * (nn + 1) * (nn + 1)
    if nn < 4 or den2 <= 0:
        out.update({"rvn_stat": None, "z_stat": None, "p_value": None})
        return out
    rvn = num2 / den2
    out["rvn_stat"] = _rnd6(rvn)
    var = (4.0 * (nn - 2) * (5.0 * nn * nn - 2.0 * nn - 9.0)) / (
        5.0 * nn * (nn + 1.0) * (nn - 1.0) * (nn - 1.0)
    )
    z = _rnd6((rvn - 2.0) / math.sqrt(var))
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    return out


def test_bartels_matches_python(spark, sf_small):
    ref = _br_ref(_daily_cents(_load_orders(sf_small)))
    row = S.STAGED_QUERIES["bartels_rank_randomness"](spark, sf_small).collect()[0]
    assert row["n_days"] == ref["n_days"]
    for k in ("rvn_stat", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_bartels_monotone_series(spark, tmp_path):
    """Strictly increasing revenue: successive rank differences are
    minimal, RVN sits far below 2, z is decisively negative (positive
    serial correlation)."""
    ys = [100000 + 1000 * i for i in range(40)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["bartels_rank_randomness"](spark, sf).collect()[0]
    assert row["rvn_stat"] < 1.0
    assert row["z_stat"] < -3
    assert row["p_value"] < 0.01


def test_bartels_alternating_series(spark, tmp_path):
    """Oscillating revenue: successive rank differences are maximal,
    RVN sits above 2 (negative serial correlation)."""
    ys = [100000 + (i % 2) * 50000 + i for i in range(40)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["bartels_rank_randomness"](spark, sf).collect()[0]
    assert row["rvn_stat"] > 2.5
    assert row["z_stat"] > 2


def test_bartels_constant_series_nulls_loud(spark, tmp_path):
    ys = [100000] * 30
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["bartels_rank_randomness"](spark, sf).collect()[0]
    assert row["rvn_stat"] is None and row["z_stat"] is None


# --- Durbin-Watson / von Neumann on decomposition residuals --------------------------


def _dw_ref(orders: pd.DataFrame) -> dict:
    cs = _weekly_counts(orders)
    res = [5 * cs[i] - sum(cs[i - 2:i + 3]) for i in range(2, len(cs) - 2)]
    n = len(res)
    s = sum(res)
    ec = [n * r - s for r in res]
    out = {"n_resid_weeks": n}
    den = float(sum(e * e for e in ec))
    num = float(sum((ec[i + 1] - ec[i]) ** 2 for i in range(n - 1)))
    if n < 4 or den <= 0:
        out.update({"dw_stat": None, "vn_eta": None, "z_stat": None,
                    "p_value": None})
        return out
    dw = num / den
    eta = (dw * n) / (n - 1.0)
    out["dw_stat"] = _rnd6(dw)
    out["vn_eta"] = _rnd6(eta)
    z = _rnd6(
        (eta - (2.0 * n) / (n - 1))
        / math.sqrt(
            (4.0 * n * n * (n - 2)) / ((n + 1.0) * (n - 1) * (n - 1) * (n - 1))
        )
    )
    out["z_stat"] = z
    out["p_value"] = _rnd6(_erfc_poly(abs(z) / math.sqrt(2.0)))
    return out


def test_dw_matches_python(spark, sf_small):
    ref = _dw_ref(_load_orders(sf_small))
    row = S.STAGED_QUERIES["durbin_watson_residuals"](spark, sf_small).collect()[0]
    assert row["n_resid_weeks"] == ref["n_resid_weeks"]
    for k in ("dw_stat", "vn_eta", "z_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_dw_alternating_residual_oscillation(spark, tmp_path):
    """Weekly counts alternating +-50: the MA5 residual alternates sign,
    successive differences are maximal, and DW sits near its upper limit
    4 (the reference values are exact: the alternating centered residual
    gives eta = 4 exactly at even n)."""
    counts = [100 + (50 if i % 2 == 0 else -50) for i in range(20)]
    sf = _write_tables(tmp_path, orders=_orders_for_weeks(counts))
    row = S.STAGED_QUERIES["durbin_watson_residuals"](spark, sf).collect()[0]
    assert row["n_resid_weeks"] == 16
    assert row["dw_stat"] > 3.0
    assert abs(row["vn_eta"] - 4.0) < 1e-9
    assert row["z_stat"] > 3
    assert row["p_value"] < 0.01


def test_dw_smooth_seasonal_positive_correlation(spark, tmp_path):
    """A period-12 sine the MA5 underfits: the residual is itself a
    smooth sine, successive values move together, and DW collapses
    toward 0 (strong positive serial correlation, z decisively
    negative)."""
    counts = [100 + _round_away(50 * math.sin(2 * math.pi * i / 12))
              for i in range(36)]
    sf = _write_tables(tmp_path, orders=_orders_for_weeks(counts))
    row = S.STAGED_QUERIES["durbin_watson_residuals"](spark, sf).collect()[0]
    assert row["n_resid_weeks"] == 32
    assert row["dw_stat"] < 1.0
    assert row["z_stat"] < -3
    assert row["p_value"] < 0.01


def test_dw_exact_linear_trend_nulls_loud(spark, tmp_path):
    """A perfectly linear weekly series: the MA5 reproduces every
    center, all residuals are 0, and the zero sum-of-squares NULLs the
    readout loud."""
    counts = [50 + 10 * i for i in range(12)]
    sf = _write_tables(tmp_path, orders=_orders_for_weeks(counts))
    row = S.STAGED_QUERIES["durbin_watson_residuals"](spark, sf).collect()[0]
    assert row["n_resid_weeks"] == 8
    assert row["dw_stat"] is None and row["z_stat"] is None
    assert row["p_value"] is None


# --- Dickey-Fuller unit root -------------------------------------------------------


def _df_ref(ys: list[int]) -> dict:
    nn = len(ys)
    out = {"n_days": nn, "m_obs": nn - 1}
    none = {"rho_hat": None, "tau_stat": None,
            "unit_root_rejected_10pct": None,
            "unit_root_rejected_5pct": None,
            "unit_root_rejected_1pct": None}
    if nn < 4 or any(y <= 0 for y in ys):
        out.update(none)
        return out
    xs = [math.log(1.0 * y) for y in ys]
    lq = dq = ldq = llq = ddq = 0
    for i in range(nn - 1):
        lv = xs[i]
        dv = xs[i + 1] - xs[i]
        lq += _round_away(1e12 * lv)
        dq += _round_away(1e12 * dv)
        ldq += _round_away(1e12 * (lv * dv))
        llq += _round_away(1e12 * (lv * lv))
        ddq += _round_away(1e12 * (dv * dv))
    mm = 1.0 * (nn - 1)
    sll = llq / 1e12 - (lq / 1e12) * (lq / 1e12) / mm
    sld = ldq / 1e12 - (lq / 1e12) * (dq / 1e12) / mm
    sdd = ddq / 1e12 - (dq / 1e12) * (dq / 1e12) / mm
    if mm < 3 or sll <= 1e-9 * (llq / 1e12):
        out.update(none)
        return out
    rho = sld / sll
    out.update(none)
    out["rho_hat"] = _rnd6(rho)
    rss = sdd - rho * sld
    if sdd <= 0 or rss <= 1e-9 * sdd:
        return out
    tau = _rnd6(rho / math.sqrt((rss / (mm - 2)) / sll))
    out["tau_stat"] = tau
    out["unit_root_rejected_10pct"] = tau < -2.57
    out["unit_root_rejected_5pct"] = tau < -2.86
    out["unit_root_rejected_1pct"] = tau < -3.43
    return out


def test_df_matches_python(spark, sf_small):
    ref = _df_ref(_daily_cents(_load_orders(sf_small)))
    row = S.STAGED_QUERIES["dickey_fuller_unit_root"](spark, sf_small).collect()[0]
    assert row["n_days"] == ref["n_days"]
    assert row["m_obs"] == ref["m_obs"]
    for k in ("rho_hat", "tau_stat"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])
    for k in ("unit_root_rejected_10pct", "unit_root_rejected_5pct",
              "unit_root_rejected_1pct"):
        assert row[k] == ref[k], k


def test_df_stationary_noise_rejects(spark, tmp_path):
    """Deterministic scrambled noise around a fixed level is strongly
    mean-reverting: rho is decisively negative and tau rejects the unit
    root at every tabulated level."""
    ys = [100000 + ((i * 37) % 101) * 100 for i in range(120)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["dickey_fuller_unit_root"](spark, sf).collect()[0]
    assert row["n_days"] == 120
    assert row["tau_stat"] < -10
    assert row["unit_root_rejected_1pct"] is True


def test_df_smooth_walk_fails_to_reject(spark, tmp_path):
    """A smooth multiplicative walk (period-80 sinusoidal growth rate)
    wanders like a unit-root process at the daily horizon: tau sits
    near 0, far above every critical value, and no level rejects."""
    ys = [100000]
    for i in range(199):
        eps = math.sin(2 * math.pi * i / 80) / 50.0
        ys.append(max(1, _round_away(ys[-1] * (1 + eps))))
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["dickey_fuller_unit_root"](spark, sf).collect()[0]
    assert row["tau_stat"] is not None
    assert row["tau_stat"] > -2.57
    assert row["unit_root_rejected_10pct"] is False
    assert row["unit_root_rejected_5pct"] is False
    assert row["unit_root_rejected_1pct"] is False


def test_df_two_point_alternation_degenerate_fit_nulls_loud(spark, tmp_path):
    """The two-point alternating series fits d = (a+b) - 2l EXACTLY:
    rho = -2 survives (the slope is real) but the mathematically-zero
    RSS is pure e12-quantization residue, so the relative guard NULLs
    tau loud instead of reading noise as a -10^6 statistic."""
    ys = [100000 if i % 2 == 0 else 200000 for i in range(120)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["dickey_fuller_unit_root"](spark, sf).collect()[0]
    assert abs(row["rho_hat"] - (-2.0)) < 1e-9
    assert row["tau_stat"] is None
    assert row["unit_root_rejected_5pct"] is None


def test_df_constant_series_nulls_loud(spark, tmp_path):
    """A constant level has zero lagged-level variance: the whole
    readout NULLs loud."""
    ys = [100000] * 30
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["dickey_fuller_unit_root"](spark, sf).collect()[0]
    assert row["rho_hat"] is None and row["tau_stat"] is None


# --- Engle ARCH LM ------------------------------------------------------------------


def _arch_ref(ys: list[int]) -> dict:
    nn = len(ys)
    out = {"n_days": nn, "m_pairs": nn - 2}
    none = {"arch_r2": None, "lm_stat": None, "p_value": None}
    if nn < 5 or any(y <= 0 for y in ys):
        out.update(none)
        return out
    xs = [math.log(1.0 * y) for y in ys]
    dsum = sum(_round_away(1e12 * (xs[i + 1] - xs[i])) for i in range(nn - 1))
    mu = (dsum / 1e12) / (1.0 * (nn - 1))
    vxs, vys = [], []
    for i in range(nn - 2):
        d1 = xs[i + 1] - xs[i]
        d2 = xs[i + 2] - xs[i + 1]
        vxs.append((d1 - mu) * (d1 - mu))
        vys.append((d2 - mu) * (d2 - mu))
    vmx, vmy = max(vxs), max(vys)
    vxn = [0.0 if vmx <= 0 else v / vmx for v in vxs]
    vyn = [0.0 if vmy <= 0 else v / vmy for v in vys]
    xq = sum(_round_away(1e12 * v) for v in vxn)
    yq = sum(_round_away(1e12 * v) for v in vyn)
    xyq = sum(_round_away(1e12 * (a * b)) for a, b in zip(vxn, vyn))
    xxq = sum(_round_away(1e12 * (a * a)) for a in vxn)
    yyq = sum(_round_away(1e12 * (b * b)) for b in vyn)
    mpf = 1.0 * (nn - 2)
    sxx = xxq / 1e12 - (xq / 1e12) * (xq / 1e12) / mpf
    syy = yyq / 1e12 - (yq / 1e12) * (yq / 1e12) / mpf
    sxy = xyq / 1e12 - (xq / 1e12) * (yq / 1e12) / mpf
    if sxx <= 1e-9 * (xxq / 1e12) or syy <= 1e-9 * (yyq / 1e12):
        out.update(none)
        return out
    r2 = min(1.0, (sxy * sxy) / (sxx * syy))
    out.update(none)
    out["arch_r2"] = _rnd6(r2)
    if (syy - (sxy * sxy) / sxx) <= 1e-9 * syy:
        return out
    lm = _rnd6(mpf * r2)
    out["lm_stat"] = lm
    out["p_value"] = _rnd6(_erfc_poly(math.sqrt(lm / 2.0)))
    return out


def test_arch_matches_python(spark, sf_small):
    ref = _arch_ref(_daily_cents(_load_orders(sf_small)))
    row = S.STAGED_QUERIES["arch_lm_test"](spark, sf_small).collect()[0]
    assert row["n_days"] == ref["n_days"]
    assert row["m_pairs"] == ref["m_pairs"]
    for k in ("arch_r2", "lm_stat", "p_value"):
        if ref[k] is None:
            assert row[k] is None, k
        else:
            assert abs(row[k] - ref[k]) < 2e-6, (k, row[k], ref[k])


def test_arch_volatility_clustering_detected(spark, tmp_path):
    """Returns in 4-day blocks of alternating magnitude (quiet, quiet,
    loud, loud, ...): squared returns correlate with their lag, so the
    LM statistic rejects conditional homoskedasticity decisively."""
    mags = [0.002, 0.02]
    x = math.log(100000.0)
    xs = [x]
    for blk in range(30):
        a = mags[blk % 2]
        for j in range(4):
            x += a if j % 2 == 0 else -a
            xs.append(x)
    ys = [max(1, _round_away(math.exp(v))) for v in xs]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["arch_lm_test"](spark, sf).collect()[0]
    assert row["lm_stat"] is not None
    assert row["lm_stat"] > 10
    assert row["p_value"] < 0.01


def test_arch_two_point_alternation_degenerate_fit(spark, tmp_path):
    """The two-point alternating series: squared demeaned returns
    alternate between exactly two values, the auxiliary regression fits
    PERFECTLY (r2 = 1), and the relative residual-SS guard NULLs lm/p
    loud — a deterministic perfect fit is not evidence of ARCH."""
    ys = [100000 if i % 2 == 0 else 200000 for i in range(60)]
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["arch_lm_test"](spark, sf).collect()[0]
    assert row["arch_r2"] is not None
    assert abs(row["arch_r2"] - 1.0) < 1e-9
    assert row["lm_stat"] is None and row["p_value"] is None


def test_arch_constant_series_nulls_loud(spark, tmp_path):
    """A constant level: every return equals the (zero) drift, the
    squared-return series is identically zero, and the relative Sxx
    guard NULLs the whole readout loud."""
    ys = [100000] * 30
    sf = _write_tables(tmp_path, orders=_orders_for_daily(ys))
    row = S.STAGED_QUERIES["arch_lm_test"](spark, sf).collect()[0]
    assert row["arch_r2"] is None
    assert row["lm_stat"] is None and row["p_value"] is None
