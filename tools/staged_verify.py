"""Staged-query verify: run a staging module's STAGED_QUERIES vs their
DuckDB oracles — the staging-gate twin of tools/verify_drive.py (which
covers only the LIVE registry exposed through __spark_entry__). The
module is selected by the STAGED_MODULE env var (default: the CURRENT
driver-invisible generation, plans/staging_r15.py).

Usage: copy to /tmp and run `python /tmp/staged_verify.py [sf_dir] [name ...]`
Defaults: sf_dir=/root/testdata/sf0.01, names = all staged queries.
Honors ADV_CONF ("k=v;k=v") exactly like verify_drive.py. Run from a cwd
OUTSIDE the repo (worker-pickle gotcha — see .claude/skills/verify/SKILL.md).

The staging discipline this enforces (promotion gate): every staged query
green at sf0.001 AND sf0.01 under the default config, plus the FULL
staged set — len(STAGED_QUERIES), whatever it currently is, never a
hard-coded count — green under each adversarial config at sf0.01.
(ADVICE r9: a literal count here went stale the same session a query was
added; the sweep itself covers whatever the module exports.)

After a promotion round flips staging_r10's ``staged`` to register live,
this script still runs (STAGED_QUERIES remains as the promoted-set
record) but verify_drive.py is then the canonical path — the promoted
names are in the live registry it sweeps.
"""

import importlib
import importlib.util
import os
import sys

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

_spec = importlib.util.spec_from_file_location(
    "oracle_util", f"{REPO}/tests/oracle_util.py"
)
_ou = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ou)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # Per-process warehouse: see verify_drive.py (concurrent sweeps
        # race fixed managed-table names otherwise).
        .config("spark.sql.warehouse.dir", f"/tmp/sparkwh_{os.getpid()}")
    )
    for kv in filter(None, os.environ.get("ADV_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        print(f"ADV_CONF: {k}={v}", flush=True)
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()

    # Which staging module to sweep: STAGED_MODULE=staging_r10 etc.
    # Default = the CURRENT (driver-invisible) staging generation; promoted
    # generations are covered by verify_drive.py through the live registry.
    mod = os.environ.get("STAGED_MODULE", "staging_r15")
    S = importlib.import_module(
        f"flink_realtime_sessionize_sample_spark.plans.{mod}"
    )

    names = sys.argv[2:] or list(S.STAGED_QUERIES)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name in names:
        try:
            sdf = S.STAGED_QUERIES[name](spark, sf_dir).toPandas()
            odf = con.execute(S.STAGED_ORACLES[name]).fetchdf()
            sc, oc = sorted(sdf.columns), sorted(odf.columns)
            sr, orr = _ou._canon(sdf), _ou._canon(odf)
            ok = (len(sr) == len(orr)) and (sc == oc) and (sr == orr)
            print(
                f"{name}: {'OK' if ok else 'MISMATCH'}"
                f" spark={len(sr)} oracle={len(orr)}",
                flush=True,
            )
            if not ok:
                bad.append(name)
                if sc != oc:
                    print(f"  cols spark={sc} oracle={oc}")
                else:
                    diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
                    for a, b in diff:
                        print(f"  spark={a[:220]}\n  duck ={b[:220]}")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
    print(f"done: {len(names) - len(bad)}/{len(names)} green; bad={bad}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
