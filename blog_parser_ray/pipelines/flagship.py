"""Flagship pipeline in Dataset form (SURVEY.md §3.1 stages 2–5).

``build_routed(ds, spec, dim)`` chains parse → enrich → route as lazy
``map_batches`` stages on any sequences Dataset:

- parse: stateless tasks (pure vectorized function, nothing to amortize)
- enrich: ST1 actor pool — dim broadcast once via ``ray.put``, pulled per
  actor in ``__init__``
- route: rules are cheap compiled state; run as part of the enrich pool's
  output chain (separate ``map_batches``; Ray fuses compatible stages)

The RESUMABLE execution of the same stages lives in ``runner.py`` (partition =
unit of work and commit); this module is the streaming form used by entry(),
queries(), and aggregate-only flows.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from .. import schema as S
from ..config import PipelineSpec
from ..stages.enrich import Enricher, build_dim_table
from ..stages.parse import make_parse_fn
from ..stages.route import Router


def default_dim(num_sources: int = 1000) -> pa.Table:
    """Canonical source universe: src0..src{N-1} (covers both the synthetic
    corpus and the documents-bridge sources)."""
    return build_dim_table([f"src{i}" for i in range(num_sources)])


def build_routed(ds: rd.Dataset, spec: PipelineSpec,
                 dim: pa.Table | None = None) -> rd.Dataset:
    """sequences Dataset → routed Dataset (adds parse/enrich/route columns)."""
    dim = dim if dim is not None else default_dim()
    dim_ref = ray.put(dim)  # broadcast once; actors read it in __init__
    parsed = ds.map_batches(
        make_parse_fn(spec.vocab_size, spec.max_tokens),
        batch_format="pyarrow", batch_size=spec.batch_size,
        zero_copy_batch=True)
    enriched = parsed.map_batches(
        Enricher, fn_constructor_args=(dim_ref,),
        batch_format="pyarrow", batch_size=spec.batch_size,
        concurrency=spec.enrich_concurrency, num_cpus=1,
        zero_copy_batch=True)
    routed = enriched.map_batches(
        Router, fn_constructor_args=(spec.router,),
        batch_format="pyarrow", batch_size=spec.batch_size,
        concurrency=spec.enrich_concurrency, num_cpus=1,
        zero_copy_batch=True)
    return routed
