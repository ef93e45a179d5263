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


def test_registry_order_is_certification_debt_first():
    # VERDICT r7 Next #2: the sweep-front ordering is DERIVED from the
    # CORRECTNESS_r*.json artifacts + the tracked added-round map,
    # never maintained by hand. Ordering key: certification DEBT
    # descending — current - last_green for certified rows,
    # current - added + 2.5 for never-certified ones (they outrank
    # rows certified up to two rounds before their registration, but
    # NOT rows >= 3 rounds stale). Plain "never-certified first"
    # regressed at 200 entries: a round adding ~20 operators pushed
    # 4-round-stale certified rows out of a 50-row sweep window behind
    # its own zero-wait additions.
    last = entry_mod._last_green_rounds()
    added = entry_mod._added_rounds()
    current = max(last.values(), default=0) + 1
    ks = list(entry_mod.queries())

    def debt(k):
        if k in last:
            return float(current - last[k])
        return current - added.get(k, current) + 2.5

    debts = [debt(k) for k in ks]
    assert debts == sorted(debts, reverse=True), [
        (k, d) for k, d in zip(ks, debts)
    ][:5]
    # the two concrete guarantees the rotation rides on:
    # (a) certified rows >= debt+1 stale outrank never-certified
    #     entries added in the current round...
    stale = {k for k in ks if k in last and current - last[k] >= 3}
    newly = {k for k in ks if k not in last and added.get(k, 0) >= current}
    if stale and newly:
        assert max(ks.index(k) for k in stale) < min(
            ks.index(k) for k in newly
        )
    # (b) ...while never-certified entries from PREVIOUS rounds outrank
    #     rows certified in the round they were added or later
    prior_never = {
        k for k in ks if k not in last and added.get(k, current) < current
    }
    recent = {
        k
        for k in ks
        if k in last and current - last[k] <= 2
    }
    if prior_never and recent:
        assert max(ks.index(k) for k in prior_never) < min(
            ks.index(k) for k in recent
        )


def test_every_registry_entry_declares_its_added_round():
    # the added-round map is what lets the debt ordering rank entries
    # that have never been swept; an unrecorded entry would silently
    # rank as zero-debt. Registering a query without recording its
    # round fails here.
    added = entry_mod._added_rounds()
    missing = sorted(set(entry_mod.queries()) - set(added))
    assert not missing, missing


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
