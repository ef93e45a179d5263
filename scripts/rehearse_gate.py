"""Rehearse the driver's sf0.01 correctness gate locally: run every
``queries()`` entry beside its ``oracle_sql()`` DuckDB twin at the
gate's scale (the pytest oracle suite runs at sf0.001 — a real
rehearsal must use the scale the driver uses, where row counts and
tie landscapes differ) and report per-entry pass/fail plus the
rows-only set. Reuses the oracle suite's normalize/compare helpers so
the comparison semantics cannot drift from the tested ones.

Usage: python scripts/rehearse_gate.py [sf_dir]   (default sf0.01)
Exit status 1 if any entry fails.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    fails: list[tuple[str, str]] = []
    rows_only: list[str] = []
    for i, name in enumerate(sorted(queries)):
        try:
            got = T._normalize(queries[name](spark, sf_dir).toPandas())
            if name not in oracles:
                assert len(got) >= 0
                rows_only.append(name)
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
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            fails.append((name, str(exc)[:160]))
            print("FAIL", name, str(exc)[:160], flush=True)
        if (i + 1) % 25 == 0:
            print(f"...{i + 1}/{len(queries)}", flush=True)
    print(
        "DONE oracled_pass:",
        len(queries) - len(fails) - len(rows_only),
        "rows_only:", rows_only,
        "fails:", fails,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
