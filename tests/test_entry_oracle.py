"""Local mirror of the driver's t2 gate: run every ``queries()`` entry
and its ``oracle_sql()`` twin side-by-side on sf0.001 and compare
row-counts, column names, and values (order-insensitive, float-tolerant).
Catches oracle drift before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    # Row alignment must survive sub-tolerance float jitter: the value
    # compare is positional after this sort, so if the two engines
    # disagree by <1e-9 in a float that participates in the sort key,
    # a raw all-column sort can order the rows differently on each
    # side and report a false mismatch even though every row matches
    # within tolerance (ADVICE r10). Sort on exact-typed columns
    # first, with floats last and rounded to 9 decimals so jitter
    # below the comparison tolerance lands in the same sort bucket.
    # Known residual (ADVICE r11): rounding only de-jitters noise away
    # from a rounding boundary — 0.4999999995 vs 0.5000000005, or
    # large-magnitude floats where rel_tol 1e-9 exceeds the 1e-9
    # rounding grain, can still split across sort buckets. If a flaky
    # positional mismatch ever recurs here, switch to tolerance-aware
    # matching: sort on exact columns only, then greedily pair the
    # remaining rows within tolerance (do NOT tighten the rounding).
    exact = [c for c in df.columns if df[c].dtype.kind != "f"]
    floats = [c for c in df.columns if df[c].dtype.kind == "f"]
    key = df[exact + floats].copy()
    for c in floats:
        key[c] = key[c].round(9)
    order = key.sort_values(exact + floats, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the class the driver's hash distinguishes.

    The driver hashes values together with their arrow types, so a Spark
    bigint vs a DuckDB HUGEINT (int128 -> float64 via fetchdf) hash-fails
    even when every value matches (round-2 ``shipping_delay_report``).
    Comparing collapsed kinds locally catches uncast integer aggregates
    (fix: ``CAST(... AS BIGINT)`` in the oracle) before the driver does.
    """
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        # Nullable ints surface as float64 (NaN-capable) from BOTH Spark's
        # toPandas and DuckDB's fetchdf, so int-valued floats WITH nulls are
        # representation noise; all-integral floats with no nulls on one side
        # only are the HUGEINT smell.
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def _values_match(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        gk, wk = _dtype_kind(got[col]), _dtype_kind(want[col])
        if gk != wk and not (
            {gk, wk} == {"int", "float"}
            and (got[col].isna().any() or want[col].isna().any())
        ):
            raise AssertionError(
                f"{name}.{col}: dtype kind {gk} != {wk} "
                f"({got[col].dtype} vs {want[col].dtype}) — driver hashes "
                f"types; cast the oracle (e.g. CAST(... AS BIGINT))"
            )
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_match(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
