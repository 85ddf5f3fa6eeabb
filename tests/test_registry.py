"""Driver-contract sanity: every query callable runs at sf0.001 and the
oracle registry stays consistent (names ⊆ queries, non-empty SQL).

The full value-level comparison lives in scripts/verify_oracle.py (the
correctness gate); this is the fast structural check that belongs in CI.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_registry_consistent():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 50
    assert set(os_) <= set(qs)
    missing = set(qs) - set(os_)
    assert missing == set(), f"queries without oracle: {missing}"
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.slow
def test_all_queries_run_sf0001(spark, sf_dir):
    qs = E.queries()
    failures = {}
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).limit(1).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures
