"""Similarity search over an embedding column (task extension set).

- ``brute_force_topk``: baseline — broadcast the (small) query matrix via
  ``ray.put``; each batch computes a float64 matmul and emits only its LOCAL
  top-k candidates (a combiner), so the driver-side merge sees
  O(k × blocks × queries) rows, never the corpus.
- ``lsh_topk``: scale path — random-hyperplane signatures bucket the corpus;
  only buckets matching a query's signature (within ``probe`` bit flips) are
  scored. Same per-batch kernel, pre-filtered by bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _embedding_matrix


def brute_force_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
                     col: str = "embedding", id_col: str = "vec_id",
                     metric: str = "cosine") -> pa.Table:
    """Top-k rows by cosine similarity to a single query vector.

    Returns (id_col, sim:float64 rounded 4) sorted by (-sim, id). Determinism:
    ties broken by id ascending — enforced at the per-block combiner too, so
    the result is invariant to block layout. Delegates to the batched
    multi-query kernel with a 1-row query matrix.
    """
    q = np.asarray(query, dtype=np.float64)
    out = brute_force_topk_multi(ds, q[None, :], k=k, col=col, id_col=id_col)
    return out.select([id_col, "sim"])


def _topk_rows(sims: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Row indices of the top-k by (-sim, id) — DETERMINISTIC under ties
    (argpartition alone keeps an arbitrary tie member, which would make the
    result depend on block layout)."""
    if len(sims) > 4 * k:
        # cheap pre-cut, keeping ALL rows tied with the k-th value so the
        # deterministic tiebreak below still sees every tie candidate
        part = np.argpartition(-sims, k - 1)
        kth = sims[part[k - 1]]
        cand = np.flatnonzero(sims >= kth)
    else:
        cand = np.arange(len(sims))
    order = np.lexsort((ids[cand], -sims[cand]))[:k]
    return cand[order]


def brute_force_topk_multi(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
                           col: str = "embedding", id_col: str = "vec_id",
                           ) -> pa.Table:
    """Batched top-k for MANY query vectors in one corpus pass.

    The (q × dim) query matrix broadcasts once via ray.put; each batch does
    ONE (rows × dim) @ (dim × q) matmul and emits its per-query local top-k
    (a combiner, deterministic under ties) — the driver merge sees
    O(k × blocks × q) rows, never the corpus. Returns (query_id, id_col,
    sim r4) sorted by (query_id, -sim, id); ties break by id ascending,
    invariant to block layout.
    """
    Q = np.asarray(queries, dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(Qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        M = _embedding_matrix(batch, col)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if M.shape[0] == 0:
            return empty
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = Mn @ Qm.T                      # (rows, q)
        ids = batch[id_col].to_numpy()
        qids, rows = [], []
        for qi in range(sims.shape[1]):
            top = _topk_rows(sims[:, qi], ids, k)
            qids.append(np.full(len(top), qi, dtype=np.int64))
            rows.append(top)
        qid = np.concatenate(qids)
        row = np.concatenate(rows)
        return pa.table({
            "query_id": pa.array(qid),
            id_col: pa.array(ids[row]),
            "sim": pa.array(sims[row, qid]),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    qv = cand["query_id"].to_numpy()
    iv = cand[id_col].to_numpy()
    sv = cand["sim"].to_numpy()
    # one global lexsort, then first k rows per query_id
    order = np.lexsort((iv, -sv, qv))
    qs, is_, ss = qv[order], iv[order], sv[order]
    new_q = np.r_[True, qs[1:] != qs[:-1]]
    rank = np.arange(len(qs)) - np.maximum.accumulate(
        np.where(new_q, np.arange(len(qs)), 0))
    keep = rank < k
    return pa.table({
        "query_id": pa.array(qs[keep], type=pa.int64()),
        id_col: pa.array(is_[keep], type=pa.int64()),
        "sim": pa.array(np.round(ss[keep], 4), type=pa.float64()),
    })


def quantize_embedding(M: np.ndarray, scale: int = 1024) -> np.ndarray:
    """floor(x * scale) as int64 — BIT-EXACT across engines when ``scale``
    is a power of two: float32→float64 is exact, multiplying by 2^n only
    shifts the exponent, and floor of an exact double is exact. This is
    what makes an integer-distance top-k hash-comparable with a DuckDB
    oracle (the float-equality discipline applied to similarity search)."""
    return np.floor(np.asarray(M, dtype=np.float64) * float(scale)) \
        .astype(np.int64)


def brute_force_topk_multi_l2int(ds: rd.Dataset, queries_int: np.ndarray,
                                 query_ids: np.ndarray, k: int = 10,
                                 col: str = "embedding",
                                 id_col: str = "vec_id",
                                 scale: int = 1024) -> pa.Table:
    """EXACT batched top-k by integer squared-L2 distance over
    ``quantize_embedding``-quantized vectors — the oracled twin of
    ``brute_force_topk_multi`` (which ranks by float cosine and is not
    bit-stable vs SQL).

    Same distributed shape: the (q × dim) int64 query matrix broadcasts
    once via ray.put; each batch computes all q distances with ONE int64
    matmul + two squared-norm vectors (|a|² − 2a·q + |q|², every term
    exact: |values| ≤ dim·(scale+|x|max·scale)² ≪ 2⁶³ for unit-range
    embeddings) and emits its per-query LOCAL top-k — the driver merge
    sees O(k × blocks × q) rows, never the corpus. Ties break by id
    ascending, so the result is invariant to block layout. Returns
    (query_id, rnk 1-based, id_col, dist), all int64.
    """
    Q = np.ascontiguousarray(queries_int, dtype=np.int64)
    # broadcast the query matrix AND its squared norms once (each task
    # would otherwise recompute the norms per batch)
    q_ref = ray.put((Q, (Q * Q).sum(axis=1)))
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm, qn = ray.get(q_ref)
        A = quantize_embedding(_embedding_matrix(batch, col), scale)
        if A.shape[0] == 0:
            return empty
        an = (A * A).sum(axis=1)
        dists = an[:, None] - 2 * (A @ Qm.T) + qn[None, :]
        ids = batch[id_col].to_numpy()
        qcols, rows = [], []
        for qi in range(dists.shape[1]):
            # INTEGER-exact local top-k (a float64 detour would lose
            # exactness above 2^53 and could drop a boundary row under
            # ties — the bit-exact-vs-SQL contract forbids that): one
            # lexsort of (dist, id) per query, ids ascending on ties
            order = np.lexsort((ids, dists[:, qi]))[:k]
            qcols.append(np.full(len(order), qi, dtype=np.int64))
            rows.append(order)
        qcol = np.concatenate(qcols)
        row = np.concatenate(rows)
        return pa.table({"query_id": pa.array(qcol),
                         id_col: pa.array(ids[row]),
                         "dist": pa.array(dists[row, qcol])})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    qv = cand["query_id"].to_numpy()
    iv = cand[id_col].to_numpy()
    dv = cand["dist"].to_numpy()
    order = np.lexsort((iv, dv, qv))
    qs, is_, ds_ = qv[order], iv[order], dv[order]
    new_q = np.r_[True, qs[1:] != qs[:-1]]
    rank = np.arange(len(qs)) - np.maximum.accumulate(
        np.where(new_q, np.arange(len(qs)), 0))
    keep = rank < k
    return pa.table({
        "query_id": pa.array(qid_arr[qs[keep]], type=pa.int64()),
        "rnk": pa.array(rank[keep] + 1, type=pa.int64()),
        id_col: pa.array(is_[keep], type=pa.int64()),
        "dist": pa.array(ds_[keep], type=pa.int64()),
    })


class HyperplaneLSH:
    """Random-hyperplane signatures for bucketed ANN (actor-pool stage)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 13) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def sign(self, M: np.ndarray) -> np.ndarray:
        bits = (M @ self.planes) > 0
        return (bits.astype(np.uint64)
                << np.arange(self.n_bits, dtype=np.uint64)[None, :]).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _embedding_matrix(batch)
        return batch.append_column(
            "bucket", pa.array(self.sign(M).astype(np.int64)))


def lsh_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             n_bits: int = 12, probe_bits: int = 2,
             col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """ANN top-k: score only rows whose hyperplane bucket is within
    ``probe_bits`` bit flips of the query's bucket. Recall < 1 by design;
    tested against brute force for overlap, not equality."""
    q = np.asarray(query, dtype=np.float64)
    dim = q.shape[0]
    lsh = HyperplaneLSH(dim, n_bits)
    q_bucket = int(lsh.sign(q[None, :])[0])
    # buckets within hamming distance probe_bits of the query's
    probes = {q_bucket}
    frontier = {q_bucket}
    for _ in range(probe_bits):
        frontier = {b ^ (1 << i) for b in frontier for i in range(n_bits)}
        probes |= frontier
    probes_ref = ray.put(probes)
    lsh_ref = ray.put(lsh)

    def filter_buckets(batch: pa.Table) -> pa.Table:
        h = ray.get(lsh_ref)
        pset = ray.get(probes_ref)
        M = _embedding_matrix(batch, col)
        buckets = h.sign(M).astype(np.int64)
        mask = pa.array(np.isin(buckets, np.fromiter(pset, dtype=np.int64)))
        return batch.filter(mask)

    filtered = ds.map_batches(filter_buckets, batch_format="pyarrow")
    return brute_force_topk(filtered, query, k, col, id_col)


class IVFIndex:
    """IVF coarse quantizer: k-means centroids trained driver-side on a
    seeded sample, assignment vectorized per batch (actor-pool stage shape).

    The 100 TB path: train on a bounded-size seeded sample (centroids
    are tiny), broadcast centroids, assign every vector to its nearest
    centroid in map_batches, and at query time score ONLY the vectors in the
    ``nprobe`` nearest clusters — the candidate set shrinks by
    ~n_clusters/nprobe versus brute force.
    """

    def __init__(self, centroids: np.ndarray) -> None:
        self.centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @classmethod
    def train(cls, sample: np.ndarray, n_clusters: int = 16,
              n_iter: int = 10, seed: int = 11) -> "IVFIndex":
        rng = np.random.default_rng(seed)
        X = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                                1e-12)
        cents = X[rng.choice(len(X), size=min(n_clusters, len(X)),
                             replace=False)]
        for _ in range(n_iter):
            assign = (X @ cents.T).argmax(axis=1)
            for c in range(len(cents)):
                members = X[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                    cents[c] /= max(np.linalg.norm(cents[c]), 1e-12)
        return cls(cents)

    def assign(self, M: np.ndarray) -> np.ndarray:
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return (Mn @ self.centroids.T).argmax(axis=1)


def ivf_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4,
             sample_size: int = 50_000, seed: int = 11,
             col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """IVF ANN top-k: train coarse centroids on a BOUNDED seeded sample
    (≤ ``sample_size`` vectors regardless of corpus size — the driver never
    holds a corpus-proportional slice), score only the ``nprobe`` clusters
    nearest the query. Recall < 1 by design."""
    n = ds.count()  # metadata-only for parquet inputs
    if n > sample_size:
        # oversample slightly so the stream almost surely yields sample_size
        # rows, then hard-cap with limit(): driver memory is O(sample_size)
        frac = min(1.0, 1.2 * sample_size / n)
        sampled = ds.random_sample(frac, seed=seed).limit(sample_size)
    else:
        sampled = ds
    sample_rows = sampled.take_all()
    sample = np.array([r[col] for r in sample_rows], dtype=np.float64)
    index = IVFIndex.train(sample, n_clusters=n_clusters, seed=seed)

    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(index.centroids @ qn))[:nprobe].tolist())
    idx_ref = ray.put(index)
    probe_ref = ray.put(probe)

    def filter_clusters(batch: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        pr = ray.get(probe_ref)
        M = _embedding_matrix(batch, col)
        if M.shape[0] == 0:
            return batch
        mask = np.isin(ix.assign(M), np.fromiter(pr, dtype=np.int64))
        return batch.filter(pa.array(mask))

    return brute_force_topk(ds.map_batches(filter_clusters,
                                           batch_format="pyarrow"),
                            query, k, col, id_col)
