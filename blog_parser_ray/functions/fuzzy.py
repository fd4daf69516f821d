"""Edit-distance (Levenshtein) string-similarity self-join.

A fourth near-dup family next to MinHash / SimHash / embedding-LSH
(functions/dedup.py): exact small-edit matching — "same name up to k
typos" — the classic entity-resolution / fuzzy-join primitive. SQL
equivalent: ``a JOIN b ON block AND levenshtein(a.name, b.name) <= k``
(DuckDB's integer ``levenshtein`` is the oracle, so results are
hash-exact — no float discipline needed).

Scale design (all stages are Dataset stages; nothing all-pairs):

1. DISTINCT-VALUE REDUCE — distances depend only on the string values,
   so the corpus first collapses to distinct names (one thin shuffle of
   the name column). Zipf-shaped text columns collapse by orders of
   magnitude; every later stage is distinct-name-scale, not row-scale.
2. DELETION-NEIGHBORHOOD BLOCKING (the SymSpell invariant): if
   ``lev(a, b) <= k`` then deleting <= k characters from each side can
   reach a COMMON string, so bucketing every <=k-deletion variant of
   every distinct name catches every true pair — a provably complete
   candidate set with no quadratic pass. Variant rows (hash, name) are
   the only expansion: ~1 + L + C(L,2) variants per name for k=2.
3. VECTORIZED DP VERIFY — candidate pairs get an exact Levenshtein
   distance from a numpy DP over padded byte matrices; the insertion
   chain's left-to-right dependency is folded into a prefix-min
   (``np.minimum.accumulate`` on dp-minus-column-index), so the kernel
   is O(max_len) vector ops per DP row with NO per-cell Python loop.
4. EXPANSION JOIN — verified (name_a, name_b, dist) pairs (both
   directions + the dist-0 diagonal for duplicate names) join back to
   row keys within the blocking column via the repo's partitioned
   equi-joins; only thin (key, name, block) columns shuffle.

Completeness: no bucket cap is applied by default (a cap would drop
true pairs and break the levenshtein-oracle parity); a variant bucket
with very many names logs a hot-bucket warning via the shared
``bucket_pair_expand`` kernel — such a bucket means thousands of
distinct names within k edits of one string, where exact
dedup/normalization is the right first tool. Distances are BYTE-level over
UTF-8 — measured to match DuckDB's ``levenshtein`` exactly (it scores
bytes: 'café'→'cafe' = 2); blocking stays character-level, a provable
superset, so non-ASCII completeness is unaffected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..hashing import stable_hash_strings
from .join import equi_join, equi_join_multi


def levenshtein_vec(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Exact BYTE-level Levenshtein distance over UTF-8 for P string
    pairs at once — deliberately byte-level: DuckDB's ``levenshtein``
    scores bytes (measured: levenshtein('café','cafe') = 2), so this is
    the oracle-exact semantic. Candidate blocking uses CHARACTER-level
    deletion variants, a superset (char-distance ≤ byte-distance), so
    completeness is preserved for non-ASCII names.

    Classic DP, vectorized ACROSS pairs: one (P, Bmax+1) row per DP step.
    cur[j] = min(t[j], cur[j-1]+1) with t = min(substitution, deletion)
    is a prefix-min in disguise — cur[j] = min_{l<=j}(t[l] + j - l) — so
    it's computed as ``np.minimum.accumulate(t - arange) + arange``
    with no inner scan. O(Amax) python iterations total (name length,
    not pair count)."""
    P = len(a_list)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    ab = [x.encode() for x in a_list]
    bb = [x.encode() for x in b_list]
    la = np.fromiter((len(x) for x in ab), np.int64, P)
    lb = np.fromiter((len(x) for x in bb), np.int64, P)
    Am, Bm = int(la.max()), int(lb.max())
    A = np.zeros((P, max(Am, 1)), dtype=np.uint8)
    B = np.zeros((P, max(Bm, 1)), dtype=np.uint8)
    for i, x in enumerate(ab):
        if x:
            A[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    for i, x in enumerate(bb):
        if x:
            B[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    jr = np.arange(Bm + 1, dtype=np.int32)
    prev = np.broadcast_to(jr, (P, Bm + 1)).copy()
    res = prev.copy()                     # rows with la == 0: dist = lb
    for i in range(1, Am + 1):
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B[:, :Bm]).astype(np.int32)
        t = np.empty_like(prev)
        t[:, 0] = i
        np.minimum(sub, prev[:, 1:] + 1, out=t[:, 1:])
        cur = np.minimum.accumulate(t - jr, axis=1) + jr
        hit = la == i
        if hit.any():
            res[hit] = cur[hit]
        prev = cur
    return res[np.arange(P), lb].astype(np.int64)


def _deletion_variants(name: str, k: int) -> set[str]:
    """All strings reachable by deleting <= k characters (incl. name)."""
    out = {name}
    frontier = {name}
    for _ in range(k):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_pairs(names: rd.Dataset, *, name_col: str = "name",
                        k: int = 2, n_parts: int = 64,
                        max_bucket: int | None = None) -> rd.Dataset:
    """DISTINCT names → verified (na, nb, dist) pairs with na < nb and
    ``lev <= k``. The deletion-variant loop is per DISTINCT name (the
    stage after the distinct reduce — cardinality is unique-value count,
    not corpus rows), so the comprehension is not a hot row path.
    ``max_bucket=None`` keeps the candidate set provably complete; an
    int cap is a documented recall trade (bucket_pair_expand)."""

    def variants(batch: pa.Table) -> pa.Table:
        nm_in = batch[name_col].to_pylist()
        nms, vs = [], []
        for nm in nm_in:
            if nm is None:
                continue
            for v in _deletion_variants(nm, k):
                nms.append(nm)
                vs.append(v)
        key = stable_hash_strings(pa.array(vs, type=pa.string()))
        names_arr = pa.array(nms, type=pa.string())
        return pa.table({
            "key": pa.array(key.astype(np.int64)),
            "name": names_arr,
            # byte length (the DP and DuckDB's levenshtein both score
            # bytes) for the candidate length filter below
            "blen": pc.binary_length(names_arr),
        })

    keyed = names.map_batches(variants, batch_format="pyarrow")

    from .dedup import bucket_pair_expand

    def len_filter(seg, ai, bj):
        # lev(a,b) >= |len(a) - len(b)|, so pairs whose byte lengths
        # differ by more than k can never verify — drop them before the
        # O(len_a × len_b) DP (one integer compare per candidate)
        return np.abs(seg["blen"][ai] - seg["blen"][bj]) <= k

    cand = bucket_pair_expand(keyed, key_col="key", id_col="name",
                              n_parts=n_parts, max_bucket=max_bucket,
                              aux_cols=["blen"], pair_filter=len_filter)

    def verify(batch: pa.Table) -> pa.Table:
        dist = levenshtein_vec(batch["a"].to_pylist(),
                               batch["b"].to_pylist())
        keep = dist <= k
        t = batch.filter(pa.array(keep))
        return pa.table({"na": t["a"], "nb": t["b"],
                         "dist": pa.array(dist[keep])})

    return cand.map_batches(verify, batch_format="pyarrow")


def _fuzzy_expand_broadcast(rows: rd.Dataset, names: rd.Dataset,
                            pairs: rd.Dataset, *,
                            block_col: str) -> rd.Dataset:
    """Broadcast expansion: the thin (a_key, na, block) table and the
    directed name-pair table ship once via ray.put; each batch runs two
    vectorized in-memory merges + the a_key < b_key ordering filter. No
    shuffle anywhere — one distributed pass over the (already
    materialized) rows."""
    import pandas as pd

    from .util import collect_table

    rt = collect_table(rows).to_pandas()
    pt = collect_table(pairs).to_pandas()
    nt = collect_table(names).to_pandas()
    fwd = pt.rename(columns={"na": "pna", "nb": "pnb"})
    rev = pt.rename(columns={"na": "pnb", "nb": "pna"})
    diag = pd.DataFrame({"pna": nt["name"], "pnb": nt["name"],
                         "dist": np.zeros(len(nt), dtype=np.int64)})
    pdir = pd.concat([fwd[["pna", "pnb", "dist"]],
                      rev[["pna", "pnb", "dist"]], diag],
                     ignore_index=True)
    right = rt.rename(columns={"a_key": "b_key", "na": "nb2"})
    ref = ray.put((pdir, right))

    def fn(batch: pa.Table) -> pa.Table:
        p, r = ray.get(ref)
        bt = batch.schema.field("block").type
        j = (batch.to_pandas()
             .merge(p, left_on="na", right_on="pna")
             .merge(r, left_on=["pnb", "block"],
                    right_on=["nb2", "block"]))
        j = j[j["a_key"] < j["b_key"]]
        return pa.table({
            block_col: pa.array(j["block"].tolist(), type=bt),
            "a_key": pa.array(j["a_key"].to_numpy(dtype=np.int64)),
            "b_key": pa.array(j["b_key"].to_numpy(dtype=np.int64)),
            "dist": pa.array(j["dist"].to_numpy(dtype=np.int64)),
        })

    return rows.map_batches(fn, batch_format="pyarrow")


def fuzzy_self_join(ds: rd.Dataset, *, key_col: str, name_col: str,
                    block_col: str, k: int = 2, n_parts: int = 64,
                    broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """All row pairs within the same ``block_col`` whose ``name_col``
    values are within Levenshtein distance k — (block, a_key, b_key,
    dist) with a_key < b_key. Includes identical-name pairs (dist 0):
    the SQL contract is ``lev <= k``, which equal strings satisfy.

    Expansion plan selection (measured, like equi_join's):

    - BROADCAST (thin rows table ≤ ``broadcast_limit``): the 3-column
      (key, name, block) table ships once via ray.put and each batch
      does two in-memory pandas merges — ZERO corpus shuffles (measured
      9.6 s → ~4 s at sf0.1; the partitioned path's cost is two
      shuffle-join fixed overheads, not compute).
    - PARTITIONED (corpus beyond the limit): two keyed equi-joins that
      move only the thin columns; the verified name-pair table is
      distinct-name-pair-scale and never the corpus."""
    # native Dataset.join spawns one aggregator actor per partition —
    # derive join parallelism from the cluster, NOT from the shuffle
    # n_parts, or a small cluster deadlocks (ray-data gotcha).
    join_parts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8))))
    rows = ds.map_batches(
        lambda b, kc=key_col, nc=name_col, bc=block_col: pa.table({
            "a_key": pc.cast(b[kc], pa.int64()),
            "na": b[nc], "block": b[bc]}),
        batch_format="pyarrow").materialize()
    # names and pairs are each consumed by two+ downstream branches; both
    # are distinct-name-scale — materialize once, don't re-execute.
    names = (rows.groupby("na").count()
             .map_batches(lambda b: pa.table({"name": b["na"]}),
                          batch_format="pyarrow").materialize())
    pairs = edit_distance_pairs(names, name_col="name", k=k,
                                n_parts=n_parts).materialize()

    if rows.count() <= broadcast_limit:
        return _fuzzy_expand_broadcast(rows, names, pairs,
                                       block_col=block_col)
    # both directions + the dist-0 diagonal, so one inner join per side
    # covers (a from either name) and duplicate-name pairs; a_key < b_key
    # at the end keeps each unordered row pair exactly once.
    fwd = pairs.map_batches(
        lambda b: pa.table({"pna": b["na"], "pnb": b["nb"],
                            "dist": b["dist"]}),
        batch_format="pyarrow")
    rev = pairs.map_batches(
        lambda b: pa.table({"pna": b["nb"], "pnb": b["na"],
                            "dist": b["dist"]}),
        batch_format="pyarrow")
    diag = names.map_batches(
        lambda b: pa.table({
            "pna": b["name"], "pnb": b["name"],
            "dist": pa.array(np.zeros(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    pdir = fwd.union(rev).union(diag)

    j1 = equi_join(rows, pdir, left_on="na", right_on="pna",
                   broadcast_limit=0, num_partitions=join_parts)
    rows_b = ds.map_batches(
        lambda b, kc=key_col, nc=name_col, bc=block_col: pa.table({
            "b_key": pc.cast(b[kc], pa.int64()),
            "nb2": b[nc], "block_b": b[bc]}),
        batch_format="pyarrow")
    j2 = equi_join_multi(j1, rows_b, left_on=["pnb", "block"],
                         right_on=["nb2", "block_b"], broadcast_limit=0,
                         num_partitions=join_parts)

    def fin(b: pa.Table) -> pa.Table:
        keep = pc.less(b["a_key"], b["b_key"])
        t = b.filter(keep)
        return pa.table({block_col: t["block"], "a_key": t["a_key"],
                         "b_key": t["b_key"], "dist": t["dist"]})

    return j2.map_batches(fin, batch_format="pyarrow")
