"""Regenerate docs/QUERIES.md from the live registry (r4 VERDICT #8).

The inventory table is derived entirely from ``queries()`` / ``oracle_sql()``
/ ``_DRIVER_PRIORITY`` so it cannot drift from the code;
tests/test_registry.py::test_queries_md_matches_registry re-runs this
generator and diffs it against the committed file.

    python tools/gen_queries_md.py [--check]

``--check`` exits 1 (printing a unified diff) instead of writing.
"""

from __future__ import annotations

import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "QUERIES.md")


def render() -> str:
    from blog_parser_ray.pipelines.queries import _DRIVER_PRIORITY
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    window = set(_DRIVER_PRIORITY)
    # _DRIVER_PRIORITY entries come first, in rotation order; the rest keep
    # registration order — mirroring how queries() orders the driver window.
    names = list(q)
    lines = [
        "# Query inventory (generated from the registry)",
        "",
        f"{len(names)} `queries()` entries; {len(o)} with exact",
        "DuckDB oracles (driver hash gate); the rest are rows-only with",
        "pytest ground-truth/parity/property oracles. The first 50 form",
        "the current driver-verification window (`_DRIVER_PRIORITY`).",
        "",
        "Regenerate with `python tools/gen_queries_md.py`; parity with the",
        "registry is asserted by tests/test_registry.py.",
        "",
        "| # | query | oracle | in driver-50 |",
        "| --- | --- | --- | --- |",
    ]
    for i, name in enumerate(names, 1):
        oracle = "SQL hash-exact" if name in o else "rows-only (pytest oracle)"
        lines.append(f"| {i} | `{name}` | {oracle} | "
                     f"{'yes' if name in window else 'no'} |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    text = render()
    if "--check" in sys.argv[1:]:
        with open(OUT) as f:
            on_disk = f.read()
        if on_disk == text:
            print("docs/QUERIES.md is current")
            return 0
        sys.stdout.writelines(difflib.unified_diff(
            on_disk.splitlines(keepends=True), text.splitlines(keepends=True),
            "docs/QUERIES.md (committed)", "generated"))
        return 1
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
