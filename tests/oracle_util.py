"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet dir,
then compares row count + order-insensitive value content (columns sorted by
name, rows sorted by their full value tuple, floats rounded)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _canon_element(x):
    """Canonicalize one array element: round numerics (float-precision
    engines differ past ~5dp), pass strings/None/other through — an
    array<string> column must not crash the sweep."""
    if hasattr(x, "item"):
        x = x.item()
    if x is None or isinstance(x, str) or isinstance(x, bool):
        return x
    if isinstance(x, (int, float)):
        return None if isinstance(x, float) and math.isnan(x) else round(float(x), 5)
    return repr(x)


def _canon(df: pd.DataFrame) -> list[str]:
    """Strict canonicalization: repr-level equality (so int64 vs float64 vs
    Decimal mismatches are caught, mirroring a value-hash driver)."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon = []
        for v in tup:
            if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon.append(tuple(_canon_element(x) for x in v))
                continue
            if hasattr(v, "item"):  # numpy scalar → python scalar
                v = v.item()
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append(None)
            elif isinstance(v, float):
                canon.append(round(v, 6))
            else:
                canon.append(v)
        rows.append(repr(tuple(canon)))
    rows.sort()
    return rows


def compare_query(spark, name: str, sf_dir: str) -> None:
    from flink_realtime_sessionize_sample_spark import plans

    sdf = plans.QUERIES[name](spark, sf_dir).toPandas()
    odf = run_oracle(plans.ORACLES[name], sf_dir)
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != oracle {sorted(odf.columns)}"
    )
    srows, orows = _canon(sdf), _canon(odf)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
