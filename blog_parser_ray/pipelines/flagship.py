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
from ..sources.readers import read_parquet_clean
from ..stages.route import Router


def default_dim(num_sources: int = 1000) -> pa.Table:
    """Canonical source universe: src0..src{N-1} (covers both the synthetic
    corpus and the documents-bridge sources)."""
    return build_dim_table([f"src{i}" for i in range(num_sources)])


def run_streaming(input_path: str, out_dir: str,
                  spec: PipelineSpec | None = None,
                  dim: pa.Table | None = None) -> dict:
    """Pure-Dataset flagship e2e: read → parse → enrich(actor pool) →
    route(actor pool) → ``write_parquet(partition_cols=["sink"])`` →
    aggregates from the written output.

    This is the fully streaming form (Ray owns all scheduling/fan-out). It
    trades the runner's per-partition atomic-commit manifest for simplicity —
    use ``runner.run`` when you need kill-resume. A rerun into the same
    out_dir CLEARS the sinks dir first: ``write_parquet`` adds uniquely-named
    files next to old ones, so without the clear the read-back aggregate
    would silently double-count previous generations.
    """
    import os
    import shutil

    from ..config import PipelineSpec as _Spec
    from ..stages import agg

    spec = spec or _Spec()
    ds = read_parquet_clean(input_path, columns=list(S.SEQUENCES_SCHEMA.names))
    routed = build_routed(ds, spec, dim)
    sinks_dir = os.path.join(out_dir, "sinks")
    shutil.rmtree(sinks_dir, ignore_errors=True)
    routed.write_parquet(sinks_dir, partition_cols=["sink"])

    back = read_parquet_clean(sinks_dir, columns=["sink", "source",
                                              "parse_class", "tok_len"])
    counts, hist = agg.per_sink_counts_and_hist(
        back, bin_width=spec.hist_bin_width, max_tokens=spec.max_tokens)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(out_dir, "_aggregates"), exist_ok=True)
    pq.write_table(counts, os.path.join(out_dir, "_aggregates",
                                        "per_sink_counts.parquet"))
    pq.write_table(hist, os.path.join(out_dir, "_aggregates",
                                      "ntok_hist.parquet"))
    return {"sink_rows": int(pc.sum(counts["cnt"]).as_py() or 0),
            "groups": counts.num_rows}


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
