"""ST2 rule-driven router: ordered predicates → sink, first-match-wins.

Recasts the reference's per-site/per-kind output selection (BASELINE.json
north_star: "a rule-driven router fans rows out to per-sink Parquet writers
keyed on source/parse-class"). Rules are compiled ONCE per actor in
``__init__``; per batch each rule evaluates as a vectorized boolean mask
(pyarrow.compute kernels), combined with ``np.select`` — no per-row Python.

Null semantics match the single-process oracle exactly (oracle._pred_holds):
a predicate over a null value is False (so unknown-source rows fall through to
later rules / the default sink).

Routing does NOT split or shuffle the dataset — it only appends the ``sink``
column; physical fan-out happens in the partition-local writer (SURVEY.md §4.3:
router fan-out skew is absorbed because there is no shuffle on ``sink``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import Predicate, RouterConfig


def _pred_mask(p: Predicate, batch: pa.Table) -> np.ndarray:
    col = batch[p.column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if p.op == "eq":
        m = pc.equal(col, p.value)
    elif p.op == "ne":
        m = pc.not_equal(col, p.value)
    elif p.op == "in":
        m = pc.is_in(col, value_set=pa.array(list(p.value)))
    elif p.op == "not_in":
        # is_in yields FALSE (not null) for null inputs, so a bare invert
        # would make not_in match nulls — mask validity explicitly to keep
        # the "predicate over null is False" contract (= oracle._pred_holds)
        m = pc.and_(pc.invert(pc.is_in(col, value_set=pa.array(list(p.value)))),
                    pc.is_valid(col))
    elif p.op == "regex":
        m = pc.match_substring_regex(col, p.value)
    elif p.op == "lt":
        m = pc.less(col, p.value)
    elif p.op == "le":
        m = pc.less_equal(col, p.value)
    elif p.op == "gt":
        m = pc.greater(col, p.value)
    elif p.op == "ge":
        m = pc.greater_equal(col, p.value)
    else:  # pragma: no cover - validated at config time
        raise ValueError(p.op)
    return pc.fill_null(m, False).to_numpy(zero_copy_only=False)


def route_batch(batch: pa.Table, router: RouterConfig) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return batch.append_column("sink", pa.array([], type=pa.string()))
    masks = []
    for rule in router.rules:
        m = np.ones(n, dtype=bool)
        for p in rule.when:
            m &= _pred_mask(p, batch)
        masks.append(m)
    sink = np.select(masks, [r.sink for r in router.rules],
                     default=router.default_sink)
    return batch.append_column("sink", pa.array(sink, type=pa.string()))


class Router:
    """Actor-pool stage holding the validated rule config."""

    def __init__(self, router: RouterConfig) -> None:
        router.validate()
        self.router = router

    def __call__(self, batch: pa.Table) -> pa.Table:
        return route_batch(batch, self.router)
