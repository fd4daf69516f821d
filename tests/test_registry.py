"""Registry hygiene (r4 VERDICT #8): the committed docs/QUERIES.md must be
exactly what tools/gen_queries_md.py renders from the live registry, so the
inventory cannot drift from QUERIES/ORACLE_SQL/_DRIVER_PRIORITY."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import gen_queries_md
    finally:
        sys.path.pop(0)
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
    # every oracle references only the driver's pre-registered views
    # (tables are registered by name; a typo would silently 0-row)
    allowed = {"region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"}
    import re
    for name, sql in ORACLE_SQL.items():
        froms = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)",
                               sql, re.IGNORECASE))
        unknown = {t.lower() for t in froms} - allowed
        # CTE names are fine — they're defined inside the same statement
        ctes = {m.lower() for m in re.findall(
            r"(?:WITH|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(",
            sql, re.IGNORECASE)}
        unknown -= ctes
        assert not unknown, f"{name}: unknown tables {unknown}"
