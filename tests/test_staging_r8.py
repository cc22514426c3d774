"""Round-8 STAGED queries (plans/staging_r8.py): oracle parity + lint.

These run the same driver-replica comparison as test_oracle_parity.py, but
against the staging dicts — the round-7 driver window is full, so the
staged queries are locally certified here and promoted to the live
registry (with external rows) at round-8 open."""

from __future__ import annotations

import pytest

from flink_realtime_sessionize_sample_spark import plans
from flink_realtime_sessionize_sample_spark.plans import staging_r8 as S
from tests.oracle_util import _canon, run_oracle


@pytest.mark.parametrize("name", sorted(S.STAGED_ORACLES))
def test_staged_oracle_parity_small(spark, sf_small, name):
    sdf = S.STAGED_QUERIES[name](spark, sf_small).toPandas()
    odf = run_oracle(S.STAGED_ORACLES[name], sf_small)
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != oracle {sorted(odf.columns)}"
    )
    sr, orr = _canon(sdf), _canon(odf)
    mism = [(a, b) for a, b in zip(sr, orr) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"


def test_staged_names_do_not_collide_with_registry():
    clash = [n for n in S.STAGED_QUERIES if n in plans.QUERIES]
    assert not clash, f"staged names already registered: {clash}"


def test_every_staged_query_is_oracle_paired():
    # Staging has no rows-only weaker path: promotion requires the full
    # value-hash gate, so every staged query must carry an oracle.
    missing = [n for n in S.STAGED_QUERIES if n not in S.STAGED_ORACLES]
    assert not missing, f"staged queries without oracles: {missing}"


def _explain(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("extended"))


def test_staged_plan_lint(spark, sf_small):
    # Same floor as test_plan_lint.py: no CartesianProduct, no
    # row-at-a-time Python, in any staged plan.
    offenders = {}
    for name, fn in S.STAGED_QUERIES.items():
        p = _explain(fn(spark, sf_small))
        bad = [pat for pat in ("CartesianProduct", "BatchEvalPython") if pat in p]
        if bad:
            offenders[name] = bad
    assert not offenders, f"staged plan lint failed: {offenders}"


def test_staged_rank_passes_are_banded(spark, sf_small):
    # The Mann-Whitney midrank pass must ride the deterministic-banded
    # global-rank operator: band-partitioned window, no range exchange,
    # no single-partition data sort.
    p = _explain(S.STAGED_QUERIES["mann_whitney_en_tokens"](spark, sf_small))
    assert "rangepartitioning" not in p.lower()
    assert "_pid" in p
