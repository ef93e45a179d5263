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


def test_registry_order_is_stalest_first():
    # VERDICT r7 Next #2: the sweep-front ordering is DERIVED from the
    # CORRECTNESS_r*.json artifacts, never maintained by hand — the
    # registry must come back sorted by last-driver-green round
    # ascending, with never-certified entries leading. A regression
    # here would silently let fresh rows crowd stale ones out of a
    # count-bounded external sweep.
    last = entry_mod._last_green_rounds()
    ks = list(entry_mod.queries())
    rounds = [last.get(k, -1) for k in ks]
    assert rounds == sorted(rounds), [
        (k, r) for k, r in zip(ks, rounds)
        if rounds.index(r) != sorted(rounds).index(r)
    ][:5]
    # the first N keys are exactly the stalest N for every prefix
    # boundary between distinct rounds (the property the sweep relies
    # on, stated without pinning the artifact contents)
    never = {k for k in ks if last.get(k, -1) == -1}
    assert set(ks[: len(never)]) == never


def test_last_green_rounds_semantics():
    # green = full oracle match OR the documented rows-only check;
    # errors and hash mismatches must NOT count as certification
    last = entry_mod._last_green_rounds()
    # r2's shipping_delay_report row was a hash MISMATCH — its last
    # green must come from a later sweep, never round 2
    assert last.get("shipping_delay_report", -1) != 2
    # the two model fits certify through their rows-only records
    assert last.get("forecast_sarimax", -1) >= 6
    assert last.get("ann_ivf_trained", -1) >= 6
