"""blog_parser_ray — a from-scratch Ray-Data-native parse→enrich→route→aggregate engine.

Recasts the computation of the reference (``nathan-chappell/blog_parser``: a
single-process per-document HTML extract→sanitize→index loop; see SURVEY.md §0 —
the reference mount is empty, the binding spec is BASELINE.json + SURVEY.md) as a
streaming log/telemetry pipeline over Parquet tables of pre-tokenized sequences
(``doc_id:string, tokens:list<int32>, n_tok:int32, source:string``).

Layout
------
- ``schema``    : Arrow schemas, token constants, vocab (FIXTURES.md §1)
- ``hashing``   : process-stable vectorized hash (SURVEY.md §2.8 hash family)
- ``config``    : pipeline / router / sink configuration dataclasses
- ``oracle``    : single-process pure-Python oracle — stands in for the reference
                  (SURVEY.md §0.3, §5.3)
- ``synth``     : deterministic corpus synthesis + documents→sequences bridge
- ``sources/``  : readers, partition planner (S1, S2, S6)
- ``stages/``   : parse (P1/P2/P7), enrich (ST1), route (ST2), sink (ST3/S4), agg (A*)
- ``functions/``: scalar fns, text analysis, dedup family, knn, multimodal stubs
- ``state/``    : checkpoint manifest (S5, SURVEY.md §4.4)
- ``pipelines/``: flagship Dataset pipeline + the queries()/oracle_sql() registry
- ``runner``    : resumable partitioned executor (SURVEY.md §3.1/§3.3)

No module here calls ``ray.init()`` — sessions are owned by the driver,
``bench.py``, the CLI, and the pytest fixture only (SURVEY.md §7.4 item 7).
"""

__version__ = "0.1.0"

# Silence exactly two benign Ray-executor schema warnings (empty-block noise
# from sort's schema-less empty partitions — see _quiet.py for the measured
# evidence that no user-code fix exists). Real schema divergences still log.
from . import _quiet as _quiet_mod

_quiet_mod.install()
del _quiet_mod
