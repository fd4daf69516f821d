"""Exact integer k-means over an embedding column.

Iterative distributed ML with a BIT-EXACT SQL oracle: float32 components
are quantized once to int64 micro-units (identical bits on both sides —
the centroids_by_label pattern), after which EVERY k-means quantity is
pure integer arithmetic:

- squared distance  Σ_d (q_xd − qc_cd)²   (int64; ≤ ~6·10¹⁵ for 64 dims
  of unit-scale data — far under 2⁶³),
- assignment        argmin over clusters, ties → smallest cluster id,
- centroid update   elementwise FLOOR division of exact integer sums
  (empty cluster keeps its previous centroid).

No float enters after quantization, so summation order, block layout and
engine never matter: a DuckDB oracle that unrolls the same iterations in
LONG (cid, dim) form reproduces assignments, centroids and distances
hash-exactly — the same trick that made PageRank SQL-oracle-able
(integer fixed-point ⇒ layout-independent iterative passes).

Data movement per update round: one corpus pass emitting ≤ k·dims int64
partial rows per block through one small groupby; the k×dims centroid
matrix broadcasts via ray.put (k=10, d=64 → 5 KB). The final round is a
pure assignment map. The driver holds only centroid matrices — never
vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _quantize_batch(b: pa.Table, id_col: str, vec_col: str,
                    scale: float) -> tuple[np.ndarray, np.ndarray]:
    """(ids int64, q int64 matrix (n, d)) for one batch — floor(x·scale
    + 0.5) on the float32-promoted doubles, same formula as the oracle."""
    emb = b[vec_col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    ids = b[id_col].to_numpy().astype(np.int64)
    if n == 0:
        return ids, np.zeros((0, 1), dtype=np.int64)
    d = int(pc.list_value_length(emb)[0].as_py())
    offs = emb.offsets.to_numpy().astype(np.int64)
    v = emb.values.to_numpy()[offs[0]:offs[-1]].astype(np.float64)
    q = np.floor(v * scale + 0.5).astype(np.int64).reshape(n, d)
    return ids, q


def _dists(q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Integer squared-distance matrix (n, k): ‖q‖² + ‖c‖² − 2·q·cᵀ."""
    qq = np.einsum("ij,ij->i", q, q)[:, None]
    cc = np.einsum("ij,ij->i", C, C)[None, :]
    return qq + cc - 2 * (q @ C.T)


def kmeans_exact(ds: rd.Dataset, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 10, iters: int = 2,
                 scale: float = 1_000_000.0) -> rd.Dataset:
    """Run ``iters`` assignment rounds (``iters − 1`` centroid updates)
    from the deterministic seed centroids = the vectors with
    ``id_col < k``; return the final (vec_id, cluster, dist) Dataset.
    ``ds`` is consumed ``iters`` times — callers at corpus scale should
    pass a materialized (or cheap-to-recompute, column-pruned) input."""
    from .util import collect_table

    seed = ds.map_batches(
        lambda b, ic=id_col: b.filter(pc.less(b[ic], k)),
        batch_format="pyarrow")
    st = collect_table(seed)
    order = pc.sort_indices(st[id_col])
    st = st.take(order)
    ids0, C = _quantize_batch(st, id_col, vec_col, scale)
    assert len(ids0) == k, f"seed centroids: want {k} ids < {k}, got {len(ids0)}"
    dims = C.shape[1]

    for _ in range(iters - 1):
        ref = ray.put(C)

        def partials(b: pa.Table, _r=ref) -> pa.Table:
            Cm = ray.get(_r)
            _, q = _quantize_batch(b, id_col, vec_col, scale)
            if q.shape[0] == 0:
                z = pa.array([], type=pa.int64())
                return pa.table({"cid": z, "dim": z, "s": z, "n": z})
            a = np.argmin(_dists(q, Cm), axis=1)
            sums = np.zeros((k, dims), dtype=np.int64)
            np.add.at(sums, a, q)
            cnts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64),
                                          dims)),
                "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                        k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnts, dims))})

        agg = (ds.map_batches(partials, batch_format="pyarrow")
               .groupby(["cid", "dim"]).sum(["s", "n"]))
        Cn = C.copy()
        for r in agg.take_all():            # k·dims aggregate rows only
            if r["sum(n)"] > 0:
                Cn[int(r["cid"]), int(r["dim"])] = (
                    np.int64(r["sum(s)"]) // np.int64(r["sum(n)"]))
        C = Cn

    ref = ray.put(C)

    def assign(b: pa.Table, _r=ref) -> pa.Table:
        Cm = ray.get(_r)
        ids, q = _quantize_batch(b, id_col, vec_col, scale)
        if q.shape[0] == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({id_col: z, "cluster": z, "dist": z})
        dm = _dists(q, Cm)
        a = np.argmin(dm, axis=1)
        return pa.table({
            id_col: pa.array(ids),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(dm[np.arange(len(a)), a])})

    return ds.map_batches(assign, batch_format="pyarrow")
