"""Registry-consistency meta-checks: the driver contract's side lists
(bench headline, partition-invariance audit) must never drift from the
queries()/oracle_sql() registry — a name typo in a list silently
drops a query from its gate."""

from __future__ import annotations

import bench
import __spark_entry__ as entry_mod
from tests import test_partition_invariance as tpi


def test_every_oracle_has_a_query():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))


def test_bench_headline_names_resolve():
    qs = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate bench rows"


def test_invariance_list_names_resolve():
    qs = entry_mod.queries()
    missing = [n for n in tpi.NEW_R5 if n not in qs]
    assert not missing, missing


def test_rows_only_queries_are_the_documented_two():
    # every query except the model-dependent pair must carry an oracle
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = sorted(set(qs) - set(os_))
    assert rows_only == ["ann_ivf_trained", "forecast_sarimax"], rows_only
