"""Iterative graph dataflow: exact integer PageRank.

PageRank is THE canonical iterative-join workload; the engine-relevant
part is the dataflow shape (per iteration: rank⋈edges on src → integer
contribution map → groupby dst → node-table left join), not numerical
fidelity to the 1998 paper. The spec here is EXACT INTEGER arithmetic —
rank mass in fixed-point units, contributions ``rank // out_degree``,
damping ``(num * inc) // den`` — so the result is deterministic,
order-independent (integer sums commute exactly, unlike floats) and
verifiable hash-exact against an unrolled SQL oracle. Dangling-node mass
is dropped by spec (documented simplification).

Scale shape: nodes and ranks stay Datasets; every iteration shuffles
edge-sized (src, contrib) rows and node-sized rank rows — nothing
driver-side. equi_join's plan selection broadcasts the rank table while
it fits and hash-partitions beyond.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


def pagerank_int(edges: rd.Dataset, iters: int = 5,
                 damping_num: int = 85, damping_den: int = 100,
                 scale: int = 10 ** 12) -> rd.Dataset:
    """Returns (v, r) after ``iters`` exact-integer PageRank steps over
    (src, dst) int64 edges. r_0 = scale // N for every node;
    r' = (scale - scale*num//den... ) — precisely:
    base = ((den - num) * scale // den) // N and
    r' = base + (num * Σ_incoming(rank_src // deg_src)) // den."""
    from .join import equi_join

    def sel(c1, c2=None):
        def fn(b: pa.Table) -> pa.Table:
            return (pa.table({c1: b[c1]}) if c2 is None
                    else pa.table({c1: b[c1], c2: b[c2]}))
        return fn

    nodes = (edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].combine_chunks()
             if isinstance(b["src"], pa.ChunkedArray) else b["src"],
             b["dst"].combine_chunks()
             if isinstance(b["dst"], pa.ChunkedArray) else b["dst"]])}),
        batch_format="pyarrow")
        .map_batches(lambda b: pa.table(
            {"v": pc.unique(b["v"].combine_chunks()
                            if isinstance(b["v"], pa.ChunkedArray)
                            else b["v"])}), batch_format="pyarrow"))
    # global distinct via one thin groupby
    def one(b: pa.Table) -> pa.Table:
        return b.append_column("_one", pa.array(
            np.ones(b.num_rows, dtype=np.int64)))

    nodes = (nodes.map_batches(one, batch_format="pyarrow")
             .groupby("v").aggregate(Sum("_one", alias_name="_c"))
             .map_batches(lambda b: pa.table({"v": b["v"]}),
                          batch_format="pyarrow").materialize())
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                       "r": pa.array([], pa.int64())}))

    def deg_partial(b: pa.Table) -> pa.Table:
        g = (b.select(["src"]).group_by(["src"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["src", "p"])

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("src").aggregate(Sum("p", alias_name="d")))
    edges_deg = equi_join(
        edges.map_batches(sel("src", "dst"), batch_format="pyarrow"),
        deg.map_batches(lambda b: pa.table({"dsrc": b["src"],
                                            "d": b["d"]}),
                        batch_format="pyarrow"),
        left_on="src", right_on="dsrc").map_batches(
        lambda b: b.select(["src", "dst", "d"]),
        batch_format="pyarrow").materialize()

    base = ((damping_den - damping_num) * scale // damping_den) // n
    r0 = scale // n
    ranks = nodes.map_batches(
        lambda b: b.append_column("r", pa.array(
            np.full(b.num_rows, r0, dtype=np.int64))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        j = equi_join(
            edges_deg,
            ranks.map_batches(lambda b: pa.table({"rv": b["v"],
                                                  "r": b["r"]}),
                              batch_format="pyarrow"),
            left_on="src", right_on="rv")

        def contrib(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = pa.table({"dst": b["dst"],
                          "c": pa.array(r // d)})
            g = t.group_by(["dst"]).aggregate([("c", "sum")])
            return g.rename_columns(["dst", "p_c"])

        inc = (j.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").aggregate(Sum("p_c", alias_name="inc")))
        nj = equi_join(
            nodes,
            inc.map_batches(lambda b: pa.table({"iv": b["dst"],
                                                "inc": b["inc"]}),
                            batch_format="pyarrow"),
            left_on="v", right_on="iv", how="left")

        def step(b: pa.Table) -> pa.Table:
            iv = b["inc"].to_numpy(zero_copy_only=False)
            iv = np.where(np.isnan(iv.astype(np.float64)), 0,
                          np.nan_to_num(iv)).astype(np.int64) \
                if iv.dtype != np.int64 else iv
            r = base + damping_num * iv // damping_den
            return pa.table({"v": b["v"], "r": pa.array(r)})

        ranks = (nj.map_batches(step, batch_format="pyarrow")
                 .materialize())
    return ranks


def bfs_levels(edges: rd.Dataset, *, seed_mod: int, iters: int = 3,
               n_parts: int = 16) -> rd.Dataset:
    """Breadth-first levels over the UNDIRECTED graph of ``edges``
    (src, dst), starting from the seed set {src nodes ≡ 0 mod
    ``seed_mod``}: (node, level) for every node within ``iters`` hops —
    the reachability/shortest-hops primitive next to PageRank and
    connected components. All quantities are integers, so the result is
    layout-independent and an unrolled-CTE SQL oracle matches
    hash-exactly.

    Per round (the 100 TB shape): frontier ⋈ undirected edges (one keyed
    join, edge-scale), per-block unique + grouped distinct of the
    neighbor set, then the plan-selected visited anti-filter
    (functions/dedup.py _anti_filter_keys: broadcast ≤5M distinct
    visited nodes, else one bucketed anti-join — driver memory
    independent of graph size). Frontiers and the visited set are
    node-scale Datasets; edge payloads never accumulate."""
    from .dedup import _anti_filter_keys
    from .join import equi_join

    def both_dirs(b: pa.Table) -> pa.Table:
        src, dst = (c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c for c in (b["src"], b["dst"]))
        return pa.table({"a": pa.concat_arrays([src, dst]),
                         "b": pa.concat_arrays([dst, src])})

    # distinct undirected edges ONCE at build (matching the oracle's
    # DISTINCT CTE): duplicate (src, dst) pairs would otherwise ride
    # through every round's broadcast probe before the per-round
    # distinct (review finding)
    und = (edges.map_batches(both_dirs, batch_format="pyarrow")
           .groupby(["a", "b"]).count()
           .map_batches(lambda b: b.select(["a", "b"]),
                        batch_format="pyarrow").materialize())

    def _distinct(ds: rd.Dataset, col: str) -> rd.Dataset:
        return (ds.groupby(col).count()
                .map_batches(lambda b, c=col: b.select([c]),
                             batch_format="pyarrow"))

    frontier = _distinct(edges.map_batches(
        lambda b, m=seed_mod: pa.table(
            {"node": pc.filter(b["src"],
                               pc.equal(pc.subtract(
                                   b["src"],
                                   pc.multiply(pc.divide(b["src"], m), m)),
                                   0))}),
        batch_format="pyarrow"), "node").materialize()
    levels = [frontier]

    for _ in range(iters):
        # edges stay put: the UNIQUE frontier is the broadcast build side
        # (classic frontier-broadcast BFS) — equi_join ships it once via
        # ray.put and each edge batch does a vectorized is_in-style probe;
        # beyond the broadcast limit the plan falls back to the
        # partitioned join automatically
        nbr = equi_join(
            und,
            frontier.map_batches(lambda b: pa.table({"fn": b["node"]}),
                                 batch_format="pyarrow"),
            left_on="a", right_on="fn", num_partitions=n_parts)
        cand = _distinct(nbr.map_batches(
            lambda b: pa.table({"node": b["b"]}), batch_format="pyarrow"),
            "node")
        seen = levels[0]
        for lv in levels[1:]:
            seen = seen.union(lv)
        frontier = _anti_filter_keys(
            cand, seen.map_batches(
                lambda b: pa.table({"_drop": b["node"]}),
                batch_format="pyarrow"),
            "node").materialize()
        if frontier.count() == 0:
            break
        levels.append(frontier)

    out = None
    for i, lv in enumerate(levels):
        t = lv.map_batches(
            lambda b, i=i: pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "level": pa.array(np.full(b.num_rows, i, dtype=np.int64))}),
            batch_format="pyarrow")
        out = t if out is None else out.union(t)
    return out
