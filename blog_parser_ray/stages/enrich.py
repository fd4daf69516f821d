"""ST1 lookup-enrich: source → metadata, on an actor pool (SURVEY.md §2.3).

Recasts the reference's in-memory sanitizer/section-indexer state
(BASELINE.json north_star: "a stateful lookup-enrich stage (source→metadata
dictionary, analogous to blog_parser's sanitizer/section-indexer state) runs
on an actor pool"). The dim side is SMALL (≤~10⁵ sources) so the physical plan
is a broadcast join (J1): the dim table is ``ray.put`` once on the driver and
each actor pulls it ONCE in ``__init__`` — never re-shipped per batch, never a
shuffle.

Per-batch lookup is fully vectorized: ``pc.index_in`` on the source column →
``pc.take`` on each metadata column (null for unknown sources = left join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..hashing import stable_hash_strings

_META_COLS = ("meta_tenant", "meta_region", "meta_priority", "sink_hint")


def build_dim_table(sources: list[str]) -> pa.Table:
    """Deterministic source→metadata dim (FIXTURES.md §2). Must stay in lockstep
    with oracle.build_dim (same stable hash → same fields)."""
    srcs = sorted(set(sources))
    h = stable_hash_strings(srcs)
    return pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "meta_tenant": pa.array([f"tenant{int(x) % 17}" for x in h],
                                type=pa.string()),
        "meta_region": pa.array(
            [S.REGIONS[int(x >> np.uint64(8)) % len(S.REGIONS)] for x in h],
            type=pa.string()),
        "meta_priority": pa.array(((h >> np.uint64(16)) % np.uint64(4))
                                  .astype(np.int32), type=pa.int32()),
        "sink_hint": pa.array([f"hint{int(x >> np.uint64(24)) % 3}" for x in h],
                              type=pa.string()),
    })


def enrich_batch(batch: pa.Table, dim: pa.Table) -> pa.Table:
    """Vectorized left-join of the broadcast dim onto ``source``."""
    idx = pc.index_in(batch["source"], value_set=dim["source"].combine_chunks()
                      if isinstance(dim["source"], pa.ChunkedArray)
                      else dim["source"])
    out = batch
    for col in _META_COLS:
        out = out.append_column(col, pc.take(dim[col], idx))
    return out


class Enricher:
    """Actor-pool stage: dim resolved once per actor in ``__init__``.

    ``dim`` may be a ``pa.Table`` or a ``ray.ObjectRef`` to one (the driver
    does ``ray.put(dim_table)`` once; every actor reads the same copy from the
    object store — the broadcast pattern, SURVEY.md §2.4 J1).
    """

    def __init__(self, dim) -> None:
        import ray

        if isinstance(dim, ray.ObjectRef):
            dim = ray.get(dim)
        if not isinstance(dim, pa.Table):
            raise TypeError(f"dim must be pa.Table or ObjectRef, got {type(dim)}")
        self.dim = dim.combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return enrich_batch(batch, self.dim)
