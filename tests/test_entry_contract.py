"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the majority of queries should be SQL-checkable
    assert len(oracles) >= 15


def test_entry_returns_rows(ray_session):
    ds = entrymod.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert names == {"doc_id", "spans"}


@pytest.mark.parametrize("name", ["q_status_counts", "q_pricing_summary"])
def test_sample_query_runs(ray_session, name):
    out = entrymod.queries()[name]("/root/testdata/sf0.001")
    n = len(out) if hasattr(out, "__len__") else out.count()
    assert n > 0
