"""Registry hygiene (r4 VERDICT #8): the committed docs/QUERIES.md must be
exactly what tools/gen_queries_md.py renders from the live registry, so the
inventory cannot drift from QUERIES/ORACLE_SQL/_DRIVER_PRIORITY."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    tools_dir = os.path.join(REPO, "tools")
    sys.path.insert(0, tools_dir)
    try:
        import gen_queries_md
    finally:
        # remove by VALUE: importing gen_queries_md prepends the repo root
        # itself (its own sys.path.insert), so pop(0) would strip the
        # wrong entry and leak tools/ on sys.path
        sys.path.remove(tools_dir)
    with open(os.path.join(REPO, "docs", "QUERIES.md")) as f:
        committed = f.read()
    assert committed == gen_queries_md.render(), (
        "docs/QUERIES.md is stale — run `python tools/gen_queries_md.py`")


def test_driver_priority_subset_and_oracle_coverage():
    from blog_parser_ray.pipelines.queries import (
        QUERIES, ORACLE_SQL, _DRIVER_PRIORITY)

    assert len(_DRIVER_PRIORITY) == 50
    assert set(_DRIVER_PRIORITY) <= set(QUERIES)
    assert set(ORACLE_SQL) <= set(QUERIES)
    # every oracle must PLAN under DuckDB against the driver's registered
    # views (a typoed table/column would only surface in the driver gate
    # otherwise) — EXPLAIN parses, binds and plans without executing
    import duckdb

    con = duckdb.connect()
    sf = os.path.join(os.sep, "root", "testdata", "sf0.001")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')")
    for name, sql in ORACLE_SQL.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - failure reporting
            raise AssertionError(f"oracle {name} does not plan: {exc}")
