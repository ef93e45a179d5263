"""Rehearse the driver's sf0.01 oracle gate for a SUBSET of entries —
the fast inner loop for optimization rounds (the full
``rehearse_gate.py`` runs all ~229 entries; re-proving the handful a
change touched should not cost half an hour). Same session config and
the same normalize/compare helpers as the full rehearsal, so the
comparison semantics cannot drift.

Usage: python scripts/rehearse_subset.py name [name ...] [--sf DIR]
Exit status 1 if any named entry fails.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import tests.test_entry_oracle as T


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args
    if not names:
        raise SystemExit("usage: rehearse_subset.py name [name ...]")
    T.SF_DIR = sf_dir
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in T.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    fails: list[tuple[str, str]] = []
    for name in names:
        try:
            got = T._normalize(queries[name](spark, sf_dir).toPandas())
            if name not in oracles:
                print("ROWS-ONLY", name, len(got), flush=True)
                continue
            want = T._normalize(con.execute(oracles[name]).fetchdf())
            assert list(got.columns) == list(want.columns), (
                f"cols {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            for c in got.columns:
                for x, y in zip(got[c], want[c]):
                    if pd.isna(x) and pd.isna(y):
                        continue
                    if isinstance(x, float) or isinstance(y, float):
                        assert math.isclose(
                            float(x), float(y), rel_tol=1e-9, abs_tol=1e-9
                        ), f"{c}: {x} != {y}"
                    else:
                        assert x == y, f"{c}: {x} != {y}"
            print("PASS", name, len(got), flush=True)
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            fails.append((name, str(exc)[:160]))
            print("FAIL", name, str(exc)[:160], flush=True)
    print("DONE fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
