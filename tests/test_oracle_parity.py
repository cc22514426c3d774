"""Driver-style DuckDB-oracle parity for every registered query.

This is a local replica of the t2 correctness gate: every query with an
oracle must hash-match it at sf0.01 (we run sf0.001 in the default test run
for speed; set SPARK_GRAFT_SF_ORACLE to widen)."""

from __future__ import annotations

import pytest

from flink_realtime_sessionize_sample_spark import plans
from tests.oracle_util import compare_query


@pytest.mark.parametrize("name", sorted(plans.ORACLES))
def test_oracle_parity_small(spark, sf_small, name):
    compare_query(spark, name, sf_small)
