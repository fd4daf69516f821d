"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library it calls) invokes ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

# make the package importable regardless of the driver's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → tokenized
    sequences → parse → enrich → route → per-sink Parquet + manifest →
    per-sink counts (A2). Returns the counts table (rows ≥ 0, stable schema).
    """
    import pyarrow.parquet as pq

    from blog_parser_ray.config import bridge_spec
    from blog_parser_ray.runner import run
    from blog_parser_ray.synth import tokenize_documents

    sf_dir = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="bpr_entry_")
    corpus_dir = f"{work}/corpus"
    out_dir = f"{work}/out"

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    seq = tokenize_documents(docs)
    import os
    os.makedirs(corpus_dir, exist_ok=True)
    pq.write_table(seq, f"{corpus_dir}/sequences.parquet", row_group_size=200)

    run(corpus_dir, out_dir, bridge_spec())
    return pq.read_table(f"{out_dir}/_aggregates/per_sink_counts")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (+ the
    dedup/similarity/text-analysis extension set). See
    blog_parser_ray/pipelines/queries.py."""
    from blog_parser_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query (same column names).
    Ops without an entry (token-list / LSH / sketch semantics) get the
    driver's weaker rows-only check."""
    from blog_parser_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
