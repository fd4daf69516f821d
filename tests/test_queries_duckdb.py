"""Layer-5: local DuckDB oracle pre-check (SURVEY.md §5.6) — every SQL-backed
queries() entry must match its oracle (row count, columns, order-insensitive
value hash). Full sweep at sf0.01 lives in tools/check_queries.py; here a
fast-but-complete pass at sf0.001 keeps the suite green per-commit."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.check_queries import check  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _entries():
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in qs]


ENTRIES = _entries()


@pytest.mark.parametrize("name,fn,sql", ENTRIES, ids=[e[0] for e in ENTRIES])
def test_query_matches_oracle(name, fn, sql):
    ok, msg = check(name, fn, sql, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke():
    import __ray_entry__ as E

    t = E.entry()
    assert t.num_rows >= 0
    assert t.schema.names == ["sink", "source", "parse_class", "cnt"]


def test_every_query_documented():
    """Every SQL oracle key must correspond to a query (no orphans)."""
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
