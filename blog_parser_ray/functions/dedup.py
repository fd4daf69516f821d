"""Deduplication family (task extension set): exact, MinHash+LSH, SimHash,
n-gram Jaccard verify, embedding-cosine near-dup.

Scale notes (the partitioning assumptions each op relies on):

- ``exact_dedup``: two-phase winner selection — per-block (hash, min_key)
  partials, then a tiny groupby over partials, then a winner-set filter with
  two physical plans: BROADCAST while winners fit one object, else a
  hash-partitioned semi-join (both implemented; threshold
  ``broadcast_limit``). Only (hash, key) pairs ever shuffle; full rows never
  do on the broadcast plan, once each on the semi-join plan.
- ``minhash_lsh`` / ``simhash``: signature computation is embarrassingly
  parallel map_batches; candidate generation is a groupby on (band, band_hash)
  — band hashes are uniform by construction, so no salting needed. Candidate
  PAIR expansion runs distributed inside the bucket groupby (capped per
  bucket); only the expanded pair list — orders of magnitude smaller than
  the corpus, LSH's contract — and the candidate payloads reach the driver
  for the exact verify.
- ``embedding_near_dup``: hyperplane-LSH bucketed — band rows (3 thin
  columns) shuffle, vectors never do; candidates verified by exact cosine.
  Band count derives from (threshold, target_recall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..hashing import stable_hash_ints, stable_hash_strings
from .util import arrow_out

# ---------------------------------------------------------------------------
# exact dedup (U4)
# ---------------------------------------------------------------------------


def _dedup_by_hash(ds: rd.Dataset, hash_fns, key_col: str,
                   broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """Two-phase winner dedup: per-block (content-hash, min key) partials →
    tiny groupby → winner-key filter. Only (hash, key) pairs ever shuffle;
    full rows never do.

    ``hash_fns`` is a PAIR of independent 64-bit content hashes; rows are
    identical iff both agree — an effective 128-bit fingerprint, so the
    silent-drop probability from hash collisions is ~n²/2¹²⁹ (≈10⁻¹⁵ even at
    n=10¹² rows), versus birthday-expected collisions at 64 bits.

    The winner filter has two physical plans, chosen by winner count:
    BROADCAST (winners ≤ ``broadcast_limit``: one ray.put, zero-copy is_in
    per task — no row shuffle) and PARTITIONED SEMI-JOIN (hash-partitioned
    inner join of the corpus against the distinct winner keys — winners are
    unique, so the inner join IS a semi-join; both sides shuffle once on
    ``key_col``). The fallback keeps driver and per-task memory independent
    of winner cardinality at 10⁹–10¹²-row scale.
    """
    h1_fn, h2_fn = hash_fns

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"h1": pa.array(h1_fn(batch).astype(np.int64)),
                      "h2": pa.array(h2_fn(batch).astype(np.int64)),
                      key_col: batch[key_col]})
        g = t.group_by(["h1", "h2"]).aggregate([(key_col, "min")])
        return g.rename_columns(["h1", "h2", "winner"])

    winners_ds = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["h1", "h2"])
                  .aggregate(Min("winner", alias_name="winner"))
                  .materialize())

    if winners_ds.count() > broadcast_limit:
        from .join import equi_join
        winner_keys = winners_ds.map_batches(
            lambda b: pa.table({"_winner": b["winner"]}),
            batch_format="pyarrow")
        joined = equi_join(ds, winner_keys, left_on=key_col,
                           right_on="_winner", how="inner",
                           broadcast_limit=0)  # winners outgrew broadcast
        keep_cols = ds.schema().names
        return joined.map_batches(lambda b: b.select(keep_cols),
                                  batch_format="pyarrow")

    from .util import collect_table
    winners = collect_table(winners_ds)["winner"]
    winner_ref = ray.put(winners.combine_chunks())

    def keep(batch: pa.Table) -> pa.Table:
        ws = ray.get(winner_ref)  # zero-copy shared-memory read per task
        return batch.filter(pc.is_in(batch[key_col], value_set=ws))

    return ds.map_batches(keep, batch_format="pyarrow")


_HASH_KEY_2 = "bpr-dedup-key-2!"  # 16 chars: independent SipHash family


def exact_dedup(ds: rd.Dataset, content_col: str = "text",
                key_col: str = "doc_id",
                broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """U4: keep the min-``key_col`` row per distinct ``content_col`` value.

    Deterministic winner; matches SQL
    ``WHERE key IN (SELECT min(key) FROM t GROUP BY content)`` up to the
    128-bit fingerprint collision bound (see ``_dedup_by_hash``).
    """
    return _dedup_by_hash(
        ds,
        (lambda b: stable_hash_strings(b[content_col]),
         lambda b: stable_hash_strings(b[content_col], key=_HASH_KEY_2)),
        key_col, broadcast_limit=broadcast_limit)


def exact_dedup_tokens(ds: rd.Dataset, tokens_col: str = "tokens",
                       key_col: str = "doc_id",
                       broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """U4 over the flagship payload: dedup by token-array content, hashed
    with the vectorized order-sensitive list hash (hashing.hash_token_lists)
    — the token payload itself never shuffles."""
    from ..hashing import hash_token_lists

    return _dedup_by_hash(
        ds,
        (lambda b: hash_token_lists(b[tokens_col]),
         lambda b: hash_token_lists(b[tokens_col], seed=0x5DEECE66D)),
        key_col, broadcast_limit=broadcast_limit)


def _drop_keys(ds: rd.Dataset, losers, key_col: str,
               broadcast_limit: int = 5_000_000,
               num_partitions: int | None = None) -> rd.Dataset:
    """Drop corpus rows whose ``key_col`` is in ``losers`` (a list/pa.Array
    of unique keys, or a Dataset with column ``_loser``). Two plans:
    BROADCAST (losers ≤ broadcast_limit → ray.put + zero-copy is_in per
    task) and PARTITIONED ANTI JOIN (left_outer against the loser keys with
    a match marker, keep the unmatched rows — loser keys are unique so no
    row expansion; the join key column itself is coalesced by the native
    join, hence the separate marker; falls back to the portable bucketed
    left join on Ray builds without Dataset.join)."""
    if isinstance(losers, rd.Dataset):
        loser_ds = losers.materialize()
        n_losers = loser_ds.count()
    else:
        loser_ds = None
        n_losers = len(losers)
    if n_losers == 0:
        return ds
    if n_losers > broadcast_limit:
        if num_partitions is None:
            # the native join runs one aggregator actor per partition; more
            # partitions than cluster CPUs deadlocks a small cluster
            num_partitions = min(
                64, max(2, int(ray.cluster_resources().get("CPU", 8))))
        if loser_ds is None:
            loser_ds = rd.from_arrow(pa.table({
                "_loser": pa.array(losers),
                "_hit": pa.array(np.ones(n_losers, dtype=np.int8))}))
        else:
            # repartition drops the schema-LESS empty blocks that map_groups
            # pipelines emit (map_batches passes 0-row blocks through without
            # invoking the UDF) — the native join's aggregator raises on them
            loser_ds = loser_ds.map_batches(
                lambda b: b.select(["_loser"]).append_column(
                    "_hit", pa.array(np.ones(b.num_rows, dtype=np.int8))),
                batch_format="pyarrow").repartition(num_partitions)
        keep_cols = ds.schema().names
        try:
            kept = ds.join(loser_ds, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=(key_col,), right_on=("_loser",))
        except (AttributeError, TypeError):
            from .join import bucketed_hash_join
            kept = bucketed_hash_join(ds, loser_ds, left_on=key_col,
                                      right_on="_loser",
                                      num_buckets=num_partitions, how="left")
        # nan_is_null: the bucketed (pandas) fallback surfaces unmatched
        # markers as NaN rather than arrow null
        return kept.map_batches(
            lambda b: b.filter(pc.is_null(b["_hit"], nan_is_null=True))
            .select(keep_cols),
            batch_format="pyarrow")
    if loser_ds is not None:
        from .util import collect_table
        larr = collect_table(loser_ds)["_loser"]
        loser_ref = ray.put(larr.combine_chunks())
    else:
        loser_ref = ray.put(pa.array(losers))

    def keep(batch: pa.Table) -> pa.Table:
        ls = ray.get(loser_ref)
        return batch.filter(pc.invert(pc.is_in(batch[key_col], value_set=ls)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _labels_checksum(labels: rd.Dataset) -> int:
    """Order-insensitive checksum of a (node, label) Dataset — one thin
    aggregate, used as the convergence test of ``pair_components``. Labels
    are min-monotone per node, so "checksum unchanged" ⇒ "no label changed"
    up to a ~2⁻⁶⁴ per-iteration hash-collision risk. Overflow is not an
    error mode but the mechanism: per-block partials are wrapped uint64
    sums viewed as int64, and the cross-block Sum wraps two's-complement
    (numpy and Arrow int64 addition are both mod-2⁶⁴), so the final
    ``% 2⁶⁴`` recovers the exact mod-2⁶⁴ total independent of block
    layout — no partial-level modulus is taken (a per-block ``% m`` for
    m < 2⁶⁴ would be layout-SENSITIVE; see the block comment below)."""

    def part(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = stable_hash_ints(_col_hash(b["node"])
                                 ^ stable_hash_ints(_col_hash(b["label"])))
        # per-block partial = wrapped uint64 sum, viewed signed. Wrapping is
        # mod-2^64 arithmetic, so after the final mod below the total is
        # BLOCK-LAYOUT-INVARIANT — a per-block `% 2^40` of the block sum
        # would not be (sum_j(B_j mod m) depends on how rows fall into
        # blocks), and a layout-sensitive checksum would spuriously fail
        # the convergence test when repartitioning shifts rows.
        s = int(h.sum(dtype=np.uint64).astype(np.uint64).view(np.int64))
        return pa.table({"s": pa.array([s], type=pa.int64())})

    total = int(labels.map_batches(part, batch_format="pyarrow").sum("s"))
    return total % (1 << 64)


def _components_broadcast_labels(edges: rd.Dataset, labels: rd.Dataset,
                                 max_iters: int) -> rd.Dataset:
    """Components when the label table fits one broadcast object: edges
    stay distributed; labels live on the driver as an int32/int64 INDEX
    array over the sorted node ids (sorted ⇒ min index == min id, so the
    min-label algebra works on indices). Each round ships the current
    label array once (ray.put), runs one vectorized map_batches over the
    edges emitting per-block (node_idx, min_label_idx) partials, merges
    them with np.minimum.at, and fully path-compresses locally."""
    from .util import collect_table

    node_tbl = collect_table(labels)
    nodes = node_tbl["node"].combine_chunks()
    order = pc.array_sort_indices(nodes)
    nodes = nodes.take(order)
    n = len(nodes)
    nodes_ref = ray.put(nodes)
    lab = np.arange(n, dtype=np.int64)

    # the edge → node-index mapping is round-INVARIANT: resolve every
    # endpoint against the sorted node array ONCE, so each round is a pure
    # int gather instead of re-hashing all endpoints per round
    def to_idx(batch: pa.Table) -> pa.Table:
        node_arr = ray.get(nodes_ref)
        iu = pc.index_in(batch["u"], value_set=node_arr)
        iv = pc.index_in(batch["v"], value_set=node_arr)
        return pa.table({"iu": pc.cast(iu, pa.int64()),
                         "iv": pc.cast(iv, pa.int64())})

    idx_edges = edges.map_batches(to_idx, batch_format="pyarrow"
                                  ).materialize()

    def partials(batch: pa.Table, lab_ref) -> pa.Table:
        cur = ray.get(lab_ref)
        iu = batch["iu"].to_numpy()
        lv = cur[batch["iv"].to_numpy()]
        # per-block min neighbor-label per node (combiner)
        order = np.lexsort((lv, iu))
        su, sl = iu[order], lv[order]
        first = np.ones(len(su), dtype=bool)
        first[1:] = su[1:] != su[:-1]
        return pa.table({"ni": pa.array(su[first]),
                         "ml": pa.array(sl[first])})

    for _ in range(max_iters):
        lab_ref = ray.put(lab)
        new = lab.copy()
        # STREAM the per-block partials — merging incrementally keeps the
        # driver's peak at one block, not join_parts × n_labels rows
        for b in idx_edges.map_batches(
                partials, fn_args=(lab_ref,),
                batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                np.minimum.at(new, b["ni"].to_numpy(), b["ml"].to_numpy())
        # full local path compression (labels are all local — free)
        while True:
            nxt = new[new]
            if np.array_equal(nxt, new):
                break
            new = nxt
        if np.array_equal(new, lab):
            return rd.from_arrow(pa.table({"node": nodes,
                                           "label": nodes.take(
                                               pa.array(lab))}))
        lab = new
    raise RuntimeError(
        f"pair_components did not converge in {max_iters} rounds")


def pair_components(pairs: rd.Dataset, *, max_iters: int = 30,
                    n_parts: int = 64,
                    join_broadcast_limit: int = 1_000_000) -> rd.Dataset:
    """Connected components of a near-dup PAIR graph, fully distributed →
    (node, label) with label = min node id of the component.

    Hash-partitioned min-label propagation with pointer jumping: each round
    (a) every node takes the min label over itself and its neighbors (one
    equi-join of the symmetric edge list against current labels + one
    groupby-min), then (b) labels jump to their label's label (one more
    join) — path halving, so convergence is O(log diameter) rounds, each a
    constant number of shuffles of PAIR-scale data. The driver sees one
    int checksum per round, never nodes or edges. Raises RuntimeError if
    ``max_iters`` rounds don't converge (components from LSH near-dup pairs
    are near-cliques; diameter beyond 2^30 means the input isn't that).
    """
    from ray.data.aggregate import Min as MinAgg

    from .join import equi_join

    def sym(b: pa.Table) -> pa.Table:
        a = b["a"]
        bb = b["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, bb]),
                         "v": pa.concat_arrays([bb, a])})

    # every .repartition() below ALSO scrubs the schema-less 0-row blocks
    # that map_groups/map_batches pipelines emit (Ray skips the UDF on
    # empty blocks) — the native join's aggregator raises on such blocks,
    # and this loop joins on both sides every round. The repartitions move
    # only PAIR-scale data.
    join_parts = min(n_parts,
                     max(2, int(ray.cluster_resources().get("CPU", 8))))
    edges = (pairs.map_batches(sym, batch_format="pyarrow")
             .repartition(join_parts).materialize())
    labels = (_distinct_ids_ds(pairs, n_parts).map_batches(
        lambda b: pa.table({"node": b["_cid"], "label": b["_cid"]}),
        batch_format="pyarrow").repartition(join_parts).materialize())
    n_labels = labels.count()
    if n_labels <= join_broadcast_limit:
        # BROADCAST-LABELS plan: the pure Dataset loop would collect the
        # label table to the driver anyway for every broadcast join, so
        # hold it there outright as an index array. Per round: ONE
        # map_batches over the (distributed) edges computing per-block
        # (node, min neighbor label) partials, a driver numpy min-merge,
        # then FULL local path compression — converges in a few rounds
        # and costs one cluster execution each. Measured ~10x faster than
        # the Dataset loop at 1M edges; the loop below remains the plan
        # for label tables beyond the broadcast limit.
        return _components_broadcast_labels(edges, labels, max_iters)

    def partial_min(b: pa.Table) -> pa.Table:
        # combiner: per-block min label per node BEFORE the groupby —
        # shuffle volume shrinks from |edges| rows to distinct-nodes-per-
        # block rows (the A7 partial-first pattern). Name-based selection:
        # pyarrow's aggregate column ORDER differs across releases.
        g = b.group_by(["node"]).aggregate([("label", "min")])
        return pa.table({"node": g["node"], "label": g["label_min"]})

    prev_sig = None
    for _ in range(max_iters):
        lab_v = labels.map_batches(
            lambda b: pa.table({"_vn": b["node"], "_vl": b["label"]}),
            batch_format="pyarrow")
        nbr = equi_join(edges, lab_v, left_on="v", right_on="_vn",
                        how="inner", num_partitions=join_parts,
                        broadcast_limit=join_broadcast_limit).map_batches(
            lambda b: partial_min(pa.table({"node": b["u"],
                                            "label": b["_vl"]})),
            batch_format="pyarrow")
        # materialized: BOTH the jump join's left side and lab_n read it
        # repartition scrubs the schema-less 0-row blocks before the
        # next round's (potentially native) joins
        new = (labels.union(nbr).groupby("node")
               .aggregate(MinAgg("label", alias_name="label"))
               .repartition(join_parts).materialize())
        # pointer jump (path halving): label ← label(label); every label IS
        # a node, so the inner join is total
        lab_n = new.map_batches(
            lambda b: pa.table({"_pn": b["node"], "_pl": b["label"]}),
            batch_format="pyarrow")
        new = equi_join(new, lab_n, left_on="label", right_on="_pn",
                        how="inner", num_partitions=join_parts,
                        broadcast_limit=join_broadcast_limit).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["_pl"]}),
            batch_format="pyarrow").repartition(join_parts).materialize()
        sig = _labels_checksum(new)
        labels = new
        if sig == prev_sig:
            return labels
        prev_sig = sig
    raise RuntimeError(
        f"pair_components did not converge in {max_iters} rounds — the pair "
        "graph has pathological diameter; raise max_iters")


def apply_pair_dedup(ds: rd.Dataset, pairs, key_col: str = "doc_id",
                     broadcast_limit: int = 5_000_000,
                     num_partitions: int | None = None,
                     pairs_driver_limit: int = 2_000_000) -> rd.Dataset:
    """Apply verified near-dup PAIRS to the corpus: connected components →
    keep the min-``key_col`` member of each component, drop the rest — the
    step that turns a pair list into a deduplicated corpus.

    ``pairs`` is a list of (a, b) tuples OR a Dataset with columns (a, b).
    Plans, chosen by pair count:

    - DRIVER union-find (pairs ≤ ``pairs_driver_limit``): path-compressed
      union-find over the pair list only — the corpus never leaves the
      cluster. The common case: pairs ≪ corpus is LSH's contract.
    - DISTRIBUTED components (``pair_components``): hash-partitioned
      min-label propagation — driver memory independent of pair count, for
      corpora whose dup rate makes the pair list itself cluster-sized.

    Losers are dropped by ``_drop_keys`` (broadcast ≤ ``broadcast_limit``,
    partitioned anti-join beyond). Deterministic: min-key winner per
    component.
    """
    if isinstance(pairs, rd.Dataset):
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs == 0:
            return ds
        if n_pairs > pairs_driver_limit:
            comp = pair_components(pairs)
            losers = comp.map_batches(
                lambda b: pa.table({"_loser": b["node"].filter(
                    pc.invert(pc.equal(b["node"], b["label"])))}),
                batch_format="pyarrow")
            return _drop_keys(ds, losers, key_col, broadcast_limit,
                              num_partitions)
        from .util import collect_table
        tbl = collect_table(pairs)
        pairs = list(zip(tbl["a"].to_pylist(), tbl["b"].to_pylist()))

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by key order keeps the min key at the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    losers = sorted({x for x in parent if find(x) != x})
    return _drop_keys(ds, losers, key_col, broadcast_limit, num_partitions)


# ---------------------------------------------------------------------------
# MinHash + LSH (near-dup candidates) and n-gram Jaccard (verify)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


# Per-process caches for tiny derivable state (perm params, hyperplanes).
# Rationale: an actor POOL costs ~1.5 s of ramp-up per dataset execution on
# this host; when the "state" is microseconds to build, a task-pool function
# with a process-level cache gives the same build-once-per-worker behavior
# with zero pool overhead. Actor pools remain the right shape for REAL state
# (models, dim tables) — see stages/enrich.py, functions/multimodal.py.
_PERM_CACHE: dict = {}


def _perms_cached(num_perm: int, seed: int = 7):
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    return _PERM_CACHE[key]


def minhash_text_band_rows(batch: pa.Table, *, num_perm: int = 64,
                           bands: int = 16, k: int = 3,
                           text_col: str = "text") -> pa.Table:
    """Task-pool MinHash band rows over word shingles (params per-process
    cached — see cache note above)."""
    a, b = _perms_cached(num_perm)
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    sh, starts, n_out = text_shingle_hashes(text, k)
    return _band_rows(sh, starts, n_out, batch["doc_id"].to_pylist(),
                      batch["doc_id"].type, num_perm, bands, a, b)


def minhash_token_band_rows(batch: pa.Table, *, num_perm: int = 64,
                            bands: int = 16, k: int = 3) -> pa.Table:
    """Task-pool MinHash band rows over token shingles."""
    a, b = _perms_cached(num_perm)
    sh, starts, n_out = token_shingle_hashes(batch["tokens"], k)
    return _band_rows(sh, starts, n_out, batch["doc_id"].to_pylist(),
                      batch["doc_id"].type, num_perm, bands, a, b)


def _band_rows(sh, starts, n_out, ids, id_type, num_perm, bands, a, b):
    """Shared MinHash → LSH band-row emitter (fully vectorized):
    per-row signature via one ``np.minimum.reduceat`` over the perm matrix,
    band hashes by folding each band's minima."""
    from ..hashing import stable_hash_ints

    n = len(n_out)
    nonempty = n_out > 0
    sig = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
    if len(sh):
        # (sh*a + b) % 2^61-1 via the Mersenne fold — x mod (2^61-1) ==
        # (x & p) + (x >> 61), one conditional subtract: bit-identical to
        # `% _MERSENNE` (property-tested) and ~5x faster than numpy's u64
        # modulo, which was the hottest line of the whole MinHash stage.
        # Perms are processed in chunks of 8 so the (shingles × 8)
        # temporary stays cache-resident across the in-place passes —
        # measured a further 2.5x over one (shingles × num_perm) matrix
        # (the full matrix is ~6 DRAM passes of 120 MB per 2048-row batch).
        chunk = min(8, num_perm)
        ne_starts = starts[nonempty]
        with np.errstate(over="ignore"):
            for lo in range(0, num_perm, chunk):
                m = sh[:, None] * a[None, lo:lo + chunk]
                m += b[None, lo:lo + chunk]
                q = m >> np.uint64(61)
                m &= _MERSENNE
                m += q
                np.subtract(m, _MERSENNE, out=m, where=m >= _MERSENNE)
                sig[nonempty, lo:lo + chunk] = np.minimum.reduceat(
                    m, ne_starts, axis=0)
    rpb = num_perm // bands
    band_hash = np.zeros((n, bands), dtype=np.uint64)
    for band in range(bands):
        acc = sig[:, band * rpb].copy()
        for j in range(1, rpb):
            with np.errstate(over="ignore"):
                acc = stable_hash_ints(acc * np.uint64(0x100000001B3)
                                       ^ sig[:, band * rpb + j])
        band_hash[:, band] = acc
    # zero-shingle rows (empty/whitespace docs) would all share the identical
    # all-sentinel signature and collide in EVERY band → O(n²) pair blowup.
    # They can never be shingle near-dups of anything, so drop them from band
    # emission entirely (exact dedup handles identical empty docs).
    keep = np.repeat(nonempty, bands)
    return pa.table({
        "doc_id": pc.take(pa.array(ids, type=id_type),
                          pa.array(np.repeat(np.arange(n), bands)[keep])),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)[keep]),
        "band_hash": pa.array((band_hash.reshape(-1)[keep]
                               >> np.uint64(1)).astype(np.int64)),
    })


class MinHasher:
    """Actor-pool FORM of ``minhash_text_band_rows`` (same kernel; kept for
    callers that want an explicit pool — the query path uses the task-pool
    function, which skips pool ramp-up)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 text_col: str = "text") -> None:
        assert num_perm % bands == 0
        self.kw = dict(num_perm=num_perm, bands=bands, k=k,
                       text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return minhash_text_band_rows(batch, **self.kw)


def _col_hash(col) -> np.ndarray:
    """uint64 stable hash of an id column (int or string), chunk-safe."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return stable_hash_ints(col.to_numpy())
    return stable_hash_strings(col)


def _dedup_pairs_ds(pairs: rd.Dataset, n_parts: int = 64,
                    cols: list[str] | None = None) -> rd.Dataset:
    """Globally-unique (a, b) rows WITHOUT a driver collection: identical
    pairs hash to the same ``hash(a) ^ mix(hash(b)) % n_parts`` partition, so
    a per-partition ``drop_duplicates`` is a global dedup. One shuffle of the
    pair list (≪ corpus); extra columns (e.g. hamming) ride along. Pass
    ``cols`` when known — ``schema()`` on a LAZY upstream would trigger an
    extra execution."""
    import pandas as pd

    cols = cols or [c for c in pairs.schema().names]

    def add_pid(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = _col_hash(batch["a"]) ^ stable_hash_ints(_col_hash(batch["b"]))
        return batch.append_column(
            "_ppid", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g[cols]
        return g.drop_duplicates(subset=["a", "b"])[cols]

    return (pairs.map_batches(add_pid, batch_format="pyarrow")
            .groupby("_ppid").map_groups(arrow_out(per_part), batch_format="pandas"))


def _lsh_candidate_pairs(sig: rd.Dataset, max_bucket: int = 2048,
                         n_parts: int = 64) -> rd.Dataset:
    """Band rows → Dataset of unordered, globally-unique candidate pairs
    (a < b), fully distributed — the driver never sees bucket contents OR the
    pair list. Two shuffles, both of thin data:

    1. band rows are grouped by ``bucket_key % n_parts`` (n_parts ≈ cluster
       parallelism, NOT one group per bucket — per-group overhead over ~10⁵
       mostly-singleton buckets would dominate) and each partition runs a
       vectorized sort + segment-boundary scan that skips singleton buckets
       and expands colliding ones with ``np.triu_indices``;
    2. the expanded pairs are re-partitioned by a PAIR hash and deduplicated
       per partition (``_dedup_pairs_ds``) — the same pair emitted from
       buckets that landed in different partitions collides here, so the
       per-partition dedup is global.

    Buckets larger than ``max_bucket`` ids (one pathological bucket of N
    identical docs would otherwise emit N²/2 pairs) are truncated to the
    first ``max_bucket`` sorted ids, the drop logged worker-side — exact
    dedup is the right tool for such a bucket's contents.

    Returns a MATERIALIZED Dataset (pairs are ≪ corpus by LSH's contract and
    every consumer — verify join, components — reads them at least twice).
    """
    import logging

    import pandas as pd

    def key_col(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy().astype(np.uint64)
        band = batch["band"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            key = stable_hash_ints(bh ^ (band * np.uint64(0x9E3779B97F4A7C15)))
        return pa.table({"key": pa.array(key.astype(np.int64)),
                         "doc_id": batch["doc_id"],
                         "_pid": pa.array((key % np.uint64(n_parts))
                                          .astype(np.int64))})

    keyed = sig.map_batches(key_col, batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            # typed empty: an untyped pd.DataFrame({"a": []}) materializes
            # as float64 blocks among int64/string pair blocks
            d = g["doc_id"]
            return pd.DataFrame({"a": d, "b": d})
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        k = g["key"].to_numpy()
        d = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.r_[starts, len(k)])
        a_out, b_out = [], []
        for s in np.flatnonzero(sizes > 1):
            m = int(sizes[s])
            if m > max_bucket:
                logging.getLogger(__name__).warning(
                    "LSH bucket truncated: %d ids > max_bucket=%d "
                    "(%d pairs dropped)", m, max_bucket,
                    (m * (m - 1) - max_bucket * (max_bucket - 1)) // 2)
                m = max_bucket
            ids = d[starts[s]:starts[s] + m]
            ai, bj = np.triu_indices(m, k=1)
            a_out.append(ids[ai])
            b_out.append(ids[bj])
        if not a_out:
            return pd.DataFrame({"a": np.array([], dtype=d.dtype),
                                 "b": np.array([], dtype=d.dtype)})
        return pd.DataFrame({"a": np.concatenate(a_out),
                             "b": np.concatenate(b_out)})

    raw = keyed.groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
    # chain the pair-hash dedup onto the SAME pipeline (one execution, one
    # materialize); cols passed explicitly so schema() never runs upstream
    return _dedup_pairs_ds(raw, n_parts, cols=["a", "b"]).materialize()


# --------------------------------------------------------------------------
# Distributed pair verify (shared by text / token / embedding near-dup):
# candidate payloads are computed IN the cluster, joined onto the pair
# Dataset (broadcast when small, partitioned equi-join beyond — equi_join's
# plan selection), and the exact Jaccard / cosine check runs vectorized
# inside map_batches. The driver sees only the VERIFIED output table.
# --------------------------------------------------------------------------


def _distinct_ids_ds(pairs: rd.Dataset, n_parts: int = 64) -> rd.Dataset:
    """Distinct ids appearing in either pair column — per-block unique, then
    hash-partitioned global dedup (same trick as ``_dedup_pairs_ds``)."""
    import pandas as pd

    def ids(batch: pa.Table) -> pa.Table:
        a = batch["a"]
        b = batch["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        u = pc.unique(pa.concat_arrays([a, b]))
        pid = (_col_hash(u) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"_cid": u, "_ipid": pa.array(pid)})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["_cid"])[["_cid"]]

    return (pairs.map_batches(ids, batch_format="pyarrow")
            .groupby("_ipid").map_groups(arrow_out(per_part), batch_format="pandas"))


def _semi_gather(ds: rd.Dataset, pairs: rd.Dataset, id_col: str,
                 cols: list[str],
                 broadcast_ids_limit: int = 5_000_000) -> rd.Dataset:
    """Corpus rows whose ``id_col`` appears in the pair Dataset, projected to
    ``cols``. Two plans: BROADCAST the distinct-id array (ids ≤ limit — thin
    ids only, never payloads) with a zero-copy ``is_in`` per task, else a
    hash-partitioned semi-join (``equi_join`` inner against the unique ids —
    corpus shuffles once; driver memory independent of candidate count)."""
    ids_ds = _distinct_ids_ds(pairs).materialize()
    n_ids = ids_ds.count()
    if n_ids <= broadcast_ids_limit:
        from .util import collect_table
        id_arr = collect_table(ids_ds)["_cid"]
        id_ref = ray.put(id_arr.combine_chunks())

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[id_col], value_set=ray.get(id_ref))
            return batch.filter(mask).select(cols)

        return ds.map_batches(keep, batch_format="pyarrow")
    from .join import equi_join
    sub = ds.map_batches(lambda b: b.select(cols), batch_format="pyarrow")
    # scrub the map_groups-produced ids of schema-less empty blocks before
    # they reach the native join's aggregator (see _drop_keys note)
    n_join = min(64, max(2, int(ray.cluster_resources().get("CPU", 8))))
    joined = equi_join(sub, ids_ds.repartition(n_join), left_on=id_col,
                       right_on="_cid", how="inner", broadcast_limit=0)
    return joined.map_batches(lambda b: b.select(cols),
                              batch_format="pyarrow")


_PAIRS_BROADCAST_LIMIT = 2_000_000


def _verify_with_payload(ds: rd.Dataset, pairs: rd.Dataset, payload_fn,
                         *, id_col: str, payload_cols: list[str],
                         val_col: str, verify_fn,
                         pairs_broadcast_limit: int = _PAIRS_BROADCAST_LIMIT
                         ) -> rd.Dataset:
    """Shared verify driver: gather candidate payloads, attach them to both
    pair sides, run ``verify_fn`` vectorized in map_batches, and return the
    verified pairs AS A DATASET — nothing is gathered to the driver here
    (r3 verdict #1: at 100 TB with a 20-30% dup rate the verified pair list
    is itself cluster-sized; the Table APIs are thin collects on top).
    Plan by measured pair count:

    FAST PATH (pairs ≤ ``pairs_broadcast_limit``): the THIN pair table is
    collected once, its distinct-id array broadcast for the corpus
    semi-filter, the compact payload table (shingle sets / normalized
    vectors — not raw texts) broadcast via one ray.put, and each pair batch
    does two vectorized index_in+take lookups before the verify kernel.
    Three cluster executions, no shuffle beyond candidate generation.

    SCALE PATH: distinct ids via hash-partitioned dedup, semi-join gather,
    ``equi_join`` payload attach on both sides — driver memory independent
    of candidate count; payloads never leave the cluster.
    """
    n_pairs = pairs.count()
    if n_pairs <= pairs_broadcast_limit:
        from .util import collect_table

        ptbl = collect_table(pairs)
        uniq = pc.unique(pa.concat_arrays(
            [ptbl["a"].combine_chunks(), ptbl["b"].combine_chunks()]))
        id_ref = ray.put(uniq)

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[id_col], value_set=ray.get(id_ref))
            return batch.filter(mask).select(payload_cols)

        payload_ds = (ds.map_batches(keep, batch_format="pyarrow")
                      .map_batches(payload_fn, batch_format="pyarrow"))
        pay_ref = ray.put(collect_table(payload_ds).combine_chunks())

        def attach(batch: pa.Table) -> pa.Table:
            pt = ray.get(pay_ref)
            ia = pc.index_in(batch["a"], value_set=pt[id_col])
            ib = pc.index_in(batch["b"], value_set=pt[id_col])
            tbl = pa.table({
                "a": batch["a"], "b": batch["b"],
                f"{val_col}_a": pc.take(pt[val_col], ia),
                f"{val_col}_b": pc.take(pt[val_col], ib)})
            return verify_fn(tbl)

        return pairs.map_batches(attach, batch_format="pyarrow")

    payload = _semi_gather(ds, pairs, id_col, payload_cols).map_batches(
        payload_fn, batch_format="pyarrow")
    # the pair Dataset comes from a map_groups pipeline: scrub its
    # schema-less empty blocks before it becomes the LEFT side of a
    # potentially-native join (only paid on this scale path)
    n_join = min(64, max(2, int(ray.cluster_resources().get("CPU", 8))))
    pairs = pairs.repartition(n_join).materialize()
    joined = _attach_payloads(pairs, payload, id_col, val_col)
    return joined.map_batches(verify_fn, batch_format="pyarrow")


def _attach_payloads(pairs: rd.Dataset, payload: rd.Dataset, id_col: str,
                     val_col: str) -> rd.Dataset:
    """Join ``payload`` (id_col, val_col — unique per id) onto both pair
    sides → (a, b, <val_col>_a, <val_col>_b). Plan selection (broadcast vs
    partitioned hash join) is ``equi_join``'s; payload is materialized once
    so the two joins don't re-execute the corpus scan."""
    from .join import equi_join

    payload = payload.materialize()

    def ren(ka: str, va: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({ka: b[id_col], va: b[val_col]})
        return fn

    pa_a = payload.map_batches(ren("_ka", f"{val_col}_a"),
                               batch_format="pyarrow")
    pa_b = payload.map_batches(ren("_kb", f"{val_col}_b"),
                               batch_format="pyarrow")
    j1 = equi_join(pairs, pa_a, left_on="a", right_on="_ka", how="inner")
    return equi_join(j1, pa_b, left_on="b", right_on="_kb", how="inner")


def _list_segments(col) -> tuple[np.ndarray, np.ndarray]:
    """(lengths, rebased flat values) of a list column — offset-aware: a
    zero-copy sliced ListArray's offsets are ABSOLUTE into the parent values
    buffer, so both are rebased via offsets[0]."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy().astype(np.int64)
    lengths = offs[1:] - offs[:-1]
    vals = col.values.to_numpy()[offs[0]:offs[-1]]
    return lengths, vals


def _jaccard_verify_fn(threshold: float, id_type: pa.DataType):
    """Vectorized exact-Jaccard verify over (a, b, sh_a, sh_b) batches: each
    side's shingle list is a UNIQUE sorted set, so after one lexsort of
    (pair_idx, value) the per-pair intersection size is the count of adjacent
    equal values — no per-pair Python. Empty-vs-empty (union == 0) is
    DEFINED as jaccard 1.0 (can't arise via LSH candidacy: zero-shingle rows
    never emit band rows).

    Precision contract (deliberate asymmetry vs the cosine verify): the
    jaccard is ROUNDED to 4 places BEFORE thresholding, preserving the
    legacy ``ngram_jaccard`` behavior that reports round(j, 4) and that the
    parity tests pin — a pair at true J ∈ [threshold − 5e-5, threshold)
    is admitted here. ``embedding_near_dup_pairs`` thresholds the UNROUNDED
    cosine instead (its own test pins that); changing either side would
    silently flip boundary pairs, so the asymmetry is documented rather
    than unified."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], id_type),
                             "b": pa.array([], id_type),
                             "jaccard": pa.array([], pa.float64())})
        la, va = _list_segments(batch["sh_a"])
        lb, vb = _list_segments(batch["sh_b"])
        pidx = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), la),
                               np.repeat(np.arange(n, dtype=np.int64), lb)])
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, pidx))
        sp, sv = pidx[order], vals[order]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        inter = np.bincount(sp[1:][dup], minlength=n)
        union = la + lb - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        j = np.round(j, 4)
        keep = pa.array(j >= threshold)
        return pa.table({
            "a": batch["a"].filter(keep),
            "b": batch["b"].filter(keep),
            "jaccard": pa.array(j[j >= threshold]),
        })

    return fn


def _collect_pairs_sorted(ds: rd.Dataset, empty: pa.Table) -> pa.Table:
    """Materialize a VERIFIED pair Dataset (the final, small output) as one
    table sorted by (a, b)."""
    from .util import collect_table
    tbl = collect_table(ds)
    if tbl.num_rows == 0:
        return empty
    return tbl.combine_chunks().sort_by([("a", "ascending"),
                                         ("b", "ascending")])


def bucket_pair_expand(keyed: rd.Dataset, *, key_col: str, id_col: str,
                       n_parts: int = 64, max_bucket: int | None = None,
                       warn_bucket: int = 65536,
                       aux_cols: list[str] | None = None,
                       pair_filter=None) -> rd.Dataset:
    """(key, id) rows → globally-unique unordered candidate pairs (a < b)
    of ids sharing a key — the bucket-expansion kernel shared by the
    fuzzy join (key = deletion-variant hash) and the exact Jaccard join
    (key = prefix shingle). Partition by ``hash(key) % n_parts``, then a
    per-partition vectorized sort + segment scan + ``np.triu_indices``
    expansion, then the global pair-hash dedup (``_dedup_pairs_ds``).

    ``max_bucket=None`` (default) expands EVERY bucket — required by the
    exact-complete contracts; buckets above ``warn_bucket`` ids log a
    warning (a hot bucket means a near-duplicate cluster that exact
    dedup should take first). Passing an int cap truncates oversized
    buckets to the first ``max_bucket`` sorted ids — a documented recall
    trade for LSH-style probabilistic consumers only.

    (``_lsh_candidate_pairs`` keeps its own fused variant of this kernel:
    its input is (band_hash, band) rows needing key-fusion and its
    truncation policy is load-bearing for LSH bucket blowups.)

    ``aux_cols``/``pair_filter``: optional per-collision candidate pruning.
    ``aux_cols`` are integer columns carried (sorted alongside the ids)
    into each bucket; ``pair_filter(seg: dict[str, np.ndarray], ai, bj)``
    sees the bucket's aux arrays plus the pair index arrays and returns a
    keep mask. A pair colliding in SEVERAL buckets survives iff ANY
    collision passes (the global pair dedup unions bucket outputs), so a
    correct filter must be one that every qualifying pair passes at at
    least one of its collisions — see ``jaccard_join_exact``'s
    length+positional (PPJoin) filter for the proof pattern. The filter
    runs one vectorized pass per bucket, BEFORE the expensive downstream
    payload attach + verify."""
    import logging

    import pandas as pd

    from ..hashing import stable_hash_ints

    def add_pid(b: pa.Table) -> pa.Table:
        kk = b[key_col]
        if isinstance(kk, pa.ChunkedArray):
            kk = kk.combine_chunks()
        h = stable_hash_ints(kk.to_numpy().view(np.uint64))
        return b.append_column(
            "_bpid", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            d = g[id_col]
            return pd.DataFrame({"a": d, "b": d})
        g = (g.drop_duplicates(subset=[key_col, id_col])
             .sort_values([key_col, id_col], kind="mergesort"))
        kk = g[key_col].to_numpy()
        d = g[id_col].to_numpy()
        aux = ({c: g[c].to_numpy().astype(np.int64) for c in aux_cols}
               if aux_cols else None)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        sizes = np.diff(np.r_[starts, len(kk)])
        a_out, b_out = [], []
        for s in np.flatnonzero(sizes > 1):
            m = int(sizes[s])
            if max_bucket is not None and m > max_bucket:
                logging.getLogger(__name__).warning(
                    "bucket_pair_expand: bucket truncated %d → %d ids "
                    "(%d pairs dropped)", m, max_bucket,
                    (m * (m - 1) - max_bucket * (max_bucket - 1)) // 2)
                m = max_bucket
            elif m > warn_bucket:
                logging.getLogger(__name__).warning(
                    "bucket_pair_expand: hot bucket with %d ids "
                    "(%d pairs) — consider exact dedup first", m,
                    m * (m - 1) // 2)
            ids = d[starts[s]:starts[s] + m]
            ai, bj = np.triu_indices(m, k=1)
            if pair_filter is not None and len(ai):
                seg = ({c: arr[starts[s]:starts[s] + m]
                        for c, arr in aux.items()} if aux else {})
                keep = pair_filter(seg, ai, bj)
                ai, bj = ai[keep], bj[keep]
            a_out.append(ids[ai])
            b_out.append(ids[bj])
        if not a_out:
            return pd.DataFrame({"a": np.array([], dtype=d.dtype),
                                 "b": np.array([], dtype=d.dtype)})
        return pd.DataFrame({"a": np.concatenate(a_out),
                             "b": np.concatenate(b_out)})

    raw = (keyed.map_batches(add_pid, batch_format="pyarrow")
           .groupby("_bpid").map_groups(arrow_out(per_part),
                                        batch_format="pandas"))
    return _dedup_pairs_ds(raw, n_parts, cols=["a", "b"])


def _jaccard_exact_count_fn(tau_e4: int, id_type: pa.DataType):
    """Vectorized EXACT-integer Jaccard verify: same lexsort-adjacent
    intersection kernel as ``_jaccard_verify_fn``, but the threshold is
    the pure integer inequality ``10000·|∩| ≥ tau_e4·|∪|`` and the output
    carries (inter, uni) as int64 — no float ever enters, so the result
    is hash-exact against a SQL oracle with the same inequality."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], id_type),
                             "b": pa.array([], id_type),
                             "inter": pa.array([], pa.int64()),
                             "uni": pa.array([], pa.int64())})
        la, va = _list_segments(batch["sh_a"])
        lb, vb = _list_segments(batch["sh_b"])
        pidx = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), la),
                               np.repeat(np.arange(n, dtype=np.int64), lb)])
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, pidx))
        sp, sv = pidx[order], vals[order]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        inter = np.bincount(sp[1:][dup], minlength=n)
        uni = la + lb - inter
        keepm = 10000 * inter >= tau_e4 * uni
        keep = pa.array(keepm)
        return pa.table({
            "a": batch["a"].filter(keep), "b": batch["b"].filter(keep),
            "inter": pa.array(inter[keepm].astype(np.int64)),
            "uni": pa.array(uni[keepm].astype(np.int64))})

    return fn


def jaccard_join_exact(ds: rd.Dataset, *, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       tau_e4: int = 6000, n_parts: int = 64,
                       hot_bucket_warn: int = 65536,
                       df_broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """EXACT-COMPLETE word-k-shingle Jaccard similarity self-join: every
    pair with ``10000·|∩| ≥ tau_e4·|∪|`` (τ = tau_e4/10⁴), no LSH false
    negatives — the AllPairs/PPJoin prefix-filtering algorithm as Dataset
    stages. Rows with fewer than k words have ZERO shingles here
    (``short_fallback=False`` — the MinHash fold shingle is word-order-
    insensitive and would break exact semantics and the SQL k-gram
    oracle); exact dedup is the operator for short/blank duplicates.

    Completeness (the prefix lemma this relies on): order all shingles by
    global (document-frequency, hash) ascending — rarest first. For a set
    s keep the PREFIX of its first ``ℓ(s) = |s| − ⌈τ·|s|⌉ + 1`` shingles.
    If J(a,b) ≥ τ then |∩| ≥ τ·|∪| ≥ τ·|a| so |∩| ≥ ⌈τ·|a|⌉; were the
    rarest common shingle c outside prefix(a), the whole intersection
    would sit in a's last ⌈τ·|a|⌉ − 1 positions — too small. Hence c ∈
    prefix(a) and symmetrically c ∈ prefix(b): every qualifying pair
    collides in the bucket of c. No cap is applied to buckets (a cap
    would break exactness); buckets above ``hot_bucket_warn`` log a
    warning — hot shingles are by construction the RAREST ones in each
    set, so pathological buckets indicate a near-duplicate cluster that
    exact dedup should take first.

    Stages (all cluster-side; driver sees nothing): shingle sets
    (vectorized, reused by verify) → explode to (shingle, id, |s|) rows →
    DF groupby → prefix selection, plan-selected by measured distinct-
    shingle count: BROADCAST (distinct shingles ≤ ``df_broadcast_limit``)
    ships the sorted (shingle, df) arrays once via ray.put and computes
    each set's prefix per batch with a searchsorted lookup + one lexsort
    — NO join and NO prefix shuffle; the PARTITIONED path attaches DF via
    equi_join and rank-filters in a hash-partitioned sort-segment pass.
    Then bucket pair expansion + global pair dedup → exact-integer verify
    via the shared payload machinery (``_verify_with_payload``)."""
    import logging

    import pandas as pd

    from .window import _with_pid

    sub = ds.map_batches(lambda b, ic=id_col, tc=text_col: b.select([ic, tc]),
                         batch_format="pyarrow")
    # materialized once: the compact set lists feed the DF pass AND the
    # prefix pass (broadcast plan) / explode (partitioned plan) — without
    # this the whole shingle computation re-executes per consumer
    sets = sub.map_batches(
        _shingle_set_fn(lambda b: text_shingle_hashes(
            b[text_col], k, short_fallback=False), id_col),
        batch_format="pyarrow").materialize()

    def explode(b: pa.Table) -> pa.Table:
        sh = b["sh"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        lens, vals = _list_segments(sh)
        parent = pc.list_parent_indices(sh)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"sh": pa.array(vals.astype(np.int64)),
                         id_col: pc.take(ids, parent),
                         "m": pa.array(np.repeat(lens, lens))})

    rows = sets.map_batches(explode, batch_format="pyarrow")
    df_ds = rows.groupby("sh").count().materialize()

    if df_ds.count() <= df_broadcast_limit:
        from .util import collect_table

        dft = collect_table(df_ds).combine_chunks()
        sh_sorted = dft["sh"].to_numpy()
        order0 = np.argsort(sh_sorted, kind="mergesort")
        df_ref = ray.put((sh_sorted[order0],
                          dft["count()"].to_numpy()[order0]))

        def prefix_batch(b: pa.Table) -> pa.Table:
            sh_keys, df_vals = ray.get(df_ref)
            sh = b["sh"]
            if isinstance(sh, pa.ChunkedArray):
                sh = sh.combine_chunks()
            lens, vals = _list_segments(sh)
            ids = b[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if len(vals) == 0:
                return pa.table({"sh": pa.array([], type=pa.int64()),
                                 id_col: ids.slice(0, 0),
                                 "m": pa.array([], type=pa.int64())})
            dfs = df_vals[np.searchsorted(sh_keys, vals)]
            n = len(lens)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            order = np.lexsort((vals, dfs, row))
            idx = np.arange(len(row), dtype=np.int64)
            first = np.empty(len(row), dtype=bool)
            if len(row):
                first[0] = True
                first[1:] = row[1:] != row[:-1]
            start = np.maximum.accumulate(np.where(first, idx, 0))
            rank = idx - start
            m = lens[row[order]]
            need = -(-(tau_e4 * m) // 10000)      # ceil(τ·m), pure ints
            keep = rank < (m - need + 1)
            return pa.table({
                "sh": pa.array(vals[order][keep].astype(np.int64)),
                id_col: pc.take(ids, pa.array(row[order][keep])),
                "m": pa.array(m[keep]),
                # global-order rank of the shingle within its OWN set —
                # the PPJoin positional filter's input
                "pos": pa.array(rank[keep])})

        pref = sets.map_batches(prefix_batch, batch_format="pyarrow")
    else:
        df = df_ds.map_batches(
            lambda b: pa.table({"sh2": b["sh"], "df": b["count()"]}),
            batch_format="pyarrow")
        from .join import equi_join
        rows_df = equi_join(rows, df, left_on="sh", right_on="sh2",
                            broadcast_limit=0)

        def prefix_part(g: pd.DataFrame) -> pd.DataFrame:
            cols = ["sh", id_col, "m", "pos"]
            if len(g) == 0:
                g = g.assign(pos=np.array([], dtype=np.int64))
                return g[cols]
            g = g.sort_values([id_col, "df", "sh"], kind="mergesort")
            doc = g[id_col].to_numpy()
            first = np.empty(len(g), dtype=bool)
            first[0] = True
            first[1:] = doc[1:] != doc[:-1]
            idx = np.arange(len(g), dtype=np.int64)
            start = np.maximum.accumulate(np.where(first, idx, 0))
            rank = idx - start
            m = g["m"].to_numpy().astype(np.int64)
            need = -(-(tau_e4 * m) // 10000)      # ceil(τ·m), pure ints
            ell = m - need + 1
            g = g.assign(pos=rank)
            return g.loc[rank < ell, cols]

        pref = (_with_pid(rows_df, id_col, n_parts)
                .groupby("_pid")
                .map_groups(arrow_out(prefix_part), batch_format="pandas"))

    def ppjoin_filter(seg, ai, bj):
        """AllPairs length + PPJoin positional filter, per bucket collision.

        Length: J ≥ τ needs 10⁴·min(mₐ,m_b) ≥ τₑ₄·max (|∩| ≤ min, |∪| ≥
        max). Positional: J ≥ τ needs |∩| ≥ ⌈τₑ₄·(mₐ+m_b)/(10⁴+τₑ₄)⌉; at a
        collision on a shingle ranked (pₐ, p_b) within each set's global
        (df, hash) order, |∩| ≤ 1 + min(mₐ−pₐ−1, m_b−p_b−1) — valid at the
        pair's FIRST common shingle, where every other common shingle
        ranks later in BOTH sets (the global order is shared, so "earlier
        in one" implies "earlier in the other"). Completeness: a
        qualifying pair's first common shingle lies in both prefixes (the
        prefix lemma) and passes this bound there, and the pair dedup
        unions bucket outputs, so keep-if-any-collision-passes loses no
        qualifying pair. Measured at sf0.1: 299k raw candidate pairs →
        69k into verify (−77%)."""
        ma, mb = seg["m"][ai], seg["m"][bj]
        lo = np.minimum(ma, mb)
        hi = np.maximum(ma, mb)
        keep = 10000 * lo >= tau_e4 * hi
        ub = 1 + np.minimum(ma - seg["pos"][ai] - 1,
                            mb - seg["pos"][bj] - 1)
        need_ov = -(-(tau_e4 * (ma + mb)) // (10000 + tau_e4))
        return keep & (ub >= need_ov)

    pairs = bucket_pair_expand(
        pref.map_batches(
            lambda b, ic=id_col: b.select(["sh", ic, "m", "pos"]),
            batch_format="pyarrow"),
        key_col="sh", id_col=id_col, n_parts=n_parts,
        warn_bucket=hot_bucket_warn,
        aux_cols=["m", "pos"], pair_filter=ppjoin_filter).materialize()

    id_type = _id_type_of(ds, id_col)
    # verify reuses the MATERIALIZED set lists (identity payload) — no
    # re-shingling, and the scale path semi-gathers compact int64 lists
    # instead of raw text
    return _verify_with_payload(
        sets, pairs, lambda b: b,
        id_col=id_col, payload_cols=[id_col, "sh"], val_col="sh",
        verify_fn=_jaccard_exact_count_fn(tau_e4, id_type))


_BAND_COLS = ["doc_id", "band", "band_hash"]


def minhash_band_rows_ds(ds: rd.Dataset, num_perm: int = 64,
                         bands: int = 16, k: int = 3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> rd.Dataset:
    """The corpus's MinHash BAND ROWS — always the CANONICAL
    (doc_id, band, band_hash) schema whatever the source id column — as a
    Dataset: the persistable LSH index of an incremental-dedup deployment.
    Write these once per corpus snapshot (thin: ``bands`` rows × ~24 B per
    doc) and hand them to ``minhash_dedup_incremental(seen_band_rows=...)``
    so each daily increment skips the full seen-corpus re-scan + re-hash.
    Deterministic (seeded permutations), so rows computed in different
    jobs/cluster sizes are identical."""
    assert num_perm % bands == 0
    if id_col != "doc_id":
        ds = ds.map_batches(
            lambda b, ic=id_col, tc=text_col: pa.table(
                {"doc_id": b[ic], tc: b[tc]}),
            batch_format="pyarrow")
    return ds.map_batches(minhash_text_band_rows,
                          fn_kwargs=dict(num_perm=num_perm, bands=bands,
                                         k=k, text_col=text_col),
                          batch_format="pyarrow")


def minhash_candidates(ds: rd.Dataset, num_perm: int = 64, bands: int = 16,
                       k: int = 3, text_col: str = "text") -> rd.Dataset:
    """LSH bucket groupby → Dataset of unique candidate pairs (a < b)."""
    return _lsh_candidate_pairs(
        minhash_band_rows_ds(ds, num_perm, bands, k, text_col))


def _shingle_set_fn(shingle_of_batch, id_col: str = "doc_id"):
    """map_batches payload fn: per-row UNIQUE sorted shingle-hash sets as a
    list<int64> column (uint64 hashes viewed as int64 — equality-preserving).
    Vectorized: one lexsort of (row, hash) + adjacent-dup mask, no per-row
    Python."""

    def fn(batch: pa.Table) -> pa.Table:
        sh, starts, n_out = shingle_of_batch(batch)
        n = len(n_out)
        row = np.repeat(np.arange(n, dtype=np.int64), n_out)
        if len(sh):
            order = np.lexsort((sh, row))
            sv, rv = sh[order], row[order]
            keep = np.ones(len(sv), dtype=bool)
            keep[1:] = (sv[1:] != sv[:-1]) | (rv[1:] != rv[:-1])
            vals = sv[keep].astype(np.int64)
            counts = np.bincount(rv[keep], minlength=n)
        else:
            vals = np.array([], dtype=np.int64)
            counts = np.zeros(n, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                       pa.array(vals, type=pa.int64()))
        return pa.table({id_col: batch[id_col], "sh": lst})

    return fn


def _verify_pairs_jaccard(ds: rd.Dataset, pairs: rd.Dataset,
                          shingle_of_batch, *, threshold: float,
                          id_col: str, payload_cols: list[str],
                          empty: pa.Table,
                          pairs_broadcast_limit: int = _PAIRS_BROADCAST_LIMIT
                          ) -> rd.Dataset:
    """Distributed exact-Jaccard verify: per-row shingle SETS computed in
    the cluster, attached to both pair sides (broadcast or join plan —
    ``_verify_with_payload``), checked vectorized in map_batches. No raw
    corpus payload ever reaches the driver — the verified pairs come back
    as a Dataset; the fast path broadcasts only the compact shingle-hash
    table."""
    return _verify_with_payload(
        ds, pairs, _shingle_set_fn(shingle_of_batch, id_col),
        id_col=id_col, payload_cols=payload_cols, val_col="sh",
        verify_fn=_jaccard_verify_fn(threshold,
                                     empty.schema.field("a").type),
        pairs_broadcast_limit=pairs_broadcast_limit)


def ngram_jaccard(texts: dict, pairs: list[tuple], k: int = 3) -> list[dict]:
    """Exact k-shingle Jaccard for candidate pairs (the verify stage).

    Empty-vs-empty (union == 0) is DEFINED as jaccard = 1.0, but zero-shingle
    docs never reach here via LSH candidacy (``_band_rows`` drops them from
    band emission); exact dedup is the operator for identical empty docs.
    """
    ids = sorted(texts)
    sh, starts, n_out = text_shingle_hashes(
        pa.array([texts[d] for d in ids], type=pa.string()), k)
    cache = {d: set(sh[starts[i]:starts[i] + n_out[i]].tolist())
             for i, d in enumerate(ids)}
    out = []
    for a, b in pairs:
        sa, sb = cache[a], cache[b]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        out.append({"a": a, "b": b, "jaccard": round(j, 4)})
    return out


def _id_type_of(ds: rd.Dataset, id_col: str) -> pa.DataType:
    s = ds.schema()
    return dict(zip(s.names, s.types))[id_col]


def _empty_pairs(id_type: pa.DataType, score_col: str) -> pa.Table:
    return pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type),
                     score_col: pa.array([], pa.float64())})


def minhash_dedup_pairs_ds(ds: rd.Dataset, threshold: float = 0.7,
                           num_perm: int = 64, bands: int = 16, k: int = 3,
                           text_col: str = "text",
                           pairs_broadcast_limit: int =
                           _PAIRS_BROADCAST_LIMIT) -> rd.Dataset:
    """Near-dup pairs with verified word-shingle Jaccard ≥ threshold, AS A
    DATASET (a, b, jaccard) — the 100 TB surface: a 20-30% dup rate makes
    even the verified pair list cluster-sized, so it must stay distributed
    and feed ``apply_pair_dedup``'s Dataset plan directly (r3 verdict #1).

    Fully distributed: LSH candidates stay a Dataset, candidate shingle SETS
    are computed in the cluster and joined onto the pairs (broadcast /
    partitioned plan by size), and the exact Jaccard runs vectorized inside
    map_batches — nothing touches the driver.
    """
    pairs = minhash_candidates(ds, num_perm, bands, k, text_col)
    return _minhash_pairs_from_candidates(
        ds, pairs, threshold=threshold, k=k, text_col=text_col,
        id_col="doc_id", pairs_broadcast_limit=pairs_broadcast_limit)


def _minhash_pairs_from_candidates(payload_ds: rd.Dataset,
                                   cand: rd.Dataset, *, threshold: float,
                                   k: int, text_col: str, id_col: str,
                                   pairs_broadcast_limit: int =
                                   _PAIRS_BROADCAST_LIMIT) -> rd.Dataset:
    """Shared word-shingle exact-verify wiring for MinHash pair producers
    (the full-corpus path AND the persisted-seen-index incremental path —
    ONE copy so the pytest-pinned recompute/fast-path parity can't drift):
    empty-candidate short-circuit, the shingle closure, and the
    plan-selected ``_verify_pairs_jaccard`` call."""
    empty = _empty_pairs(_id_type_of(payload_ds, id_col), "jaccard")
    if cand.count() == 0:
        return rd.from_arrow(empty)

    def shingles(batch: pa.Table):
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return text_shingle_hashes(text, k)

    return _verify_pairs_jaccard(payload_ds, cand, shingles,
                                 threshold=threshold, id_col=id_col,
                                 payload_cols=[id_col, text_col],
                                 empty=empty,
                                 pairs_broadcast_limit=pairs_broadcast_limit)


def minhash_dedup_pairs(ds: rd.Dataset, threshold: float = 0.7,
                        num_perm: int = 64, bands: int = 16, k: int = 3,
                        text_col: str = "text",
                        pairs_broadcast_limit: int = _PAIRS_BROADCAST_LIMIT
                        ) -> pa.Table:
    """Driver-side convenience: ``minhash_dedup_pairs_ds`` collected to one
    (a, b)-sorted table — only for outputs known small (reports, tests)."""
    empty = _empty_pairs(_id_type_of(ds, "doc_id"), "jaccard")
    return _collect_pairs_sorted(
        minhash_dedup_pairs_ds(ds, threshold, num_perm, bands, k, text_col,
                               pairs_broadcast_limit), empty)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per document, vectorized: word hashes vote ±1 per bit,
    segmented per row via cumsum differences."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    lo = offsets[0]  # sliced arrays: offsets are absolute into the parent
    wh = stable_hash_strings(words.flatten())
    bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64) * 2 - 1  # (n_words, 64) in {-1,1}
    # per-row vote sums via reduceat over NONEMPTY segments — the previous
    # global cumsum materialized two extra (n_words × 64) temporaries (the
    # O(values)-temporary pattern this host measurably punishes); reduceat
    # reads `bits` once. Empty rows (reduceat can't express them) stay 0.
    lengths = offsets[1:] - offsets[:-1]
    nonempty = lengths > 0
    seg = np.zeros((len(lengths), 64), dtype=np.int64)
    if bits.shape[0]:
        seg[nonempty] = np.add.reduceat(
            bits, (offsets[:-1] - lo)[nonempty], axis=0)
    sh = ((seg > 0).astype(np.uint64)
          << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(sh.astype(np.int64)),
    })


def simhash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 3,
                           text_col: str = "text") -> pa.Table:
    """Candidate pairs by (max_hamming+1)-band blocking, verified by exact
    Hamming distance ≤ max_hamming. Blocking guarantee (pigeonhole): any pair
    with ≤ max_hamming differing bits agrees exactly on ≥1 of the
    max_hamming+1 disjoint bands — the band count is DERIVED from
    ``max_hamming`` so the guarantee holds for every value (selectivity
    degrades as bands narrow; bounded at 63)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63] for 64-bit SimHash")
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    shifts = np.cumsum([0] + widths[:-1]).tolist()
    masks = [(1 << w) - 1 for w in widths]

    sigs = ds.map_batches(lambda b: simhash_batch(b, text_col),
                          batch_format="pyarrow")

    def explode_bands(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(sh)
        bands = np.tile(np.arange(n_bands, dtype=np.int32), n)
        chunks = np.concatenate([
            ((sh >> np.uint64(shifts[i])) & np.uint64(masks[i]))[:, None]
            for i in range(n_bands)], axis=1).reshape(-1)
        return pa.table({
            "doc_id": pc.take(batch["doc_id"],
                              pa.array(np.repeat(np.arange(n), n_bands))),
            "simhash": pc.take(batch["simhash"],
                               pa.array(np.repeat(np.arange(n), n_bands))),
            "band": pa.array(bands, type=pa.int32()),
            "chunk": pa.array(chunks.astype(np.int64)),
        })

    def pairs_in_bucket(group: pa.Table, max_bucket: int = 2048) -> pa.Table:
        """Vectorized in-bucket verify: triu pair expansion + popcount via
        a uint8 view (no per-pair Python). Buckets beyond ``max_bucket``
        ids truncate with a worker-side log, like the MinHash path — N
        identical docs otherwise emit N²/2 pairs per band; exact dedup is
        the operator for those."""
        import logging

        df = (group.select(["doc_id", "simhash"]).to_pandas()
              .drop_duplicates().sort_values("doc_id"))
        if len(df) > max_bucket:
            logging.getLogger(__name__).warning(
                "SimHash bucket truncated: %d ids > max_bucket=%d",
                len(df), max_bucket)
            df = df.iloc[:max_bucket]
        ids = df["doc_id"].to_numpy()
        sigs = df["simhash"].to_numpy().astype(np.uint64)
        ai, bj = np.triu_indices(len(ids), k=1)
        x = (sigs[ai] ^ sigs[bj]).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int32)
        keep = ham <= max_hamming
        return pa.table({"a": pa.array(ids[ai[keep]],
                                       type=group["doc_id"].type),
                         "b": pa.array(ids[bj[keep]],
                                       type=group["doc_id"].type),
                         "hamming": pa.array(ham[keep], type=pa.int32())})

    pairs = (sigs.map_batches(explode_bands, batch_format="pyarrow")
             .groupby(["band", "chunk"])
             .map_groups(pairs_in_bucket, batch_format="pyarrow")
             ).materialize()
    id_type = _id_type_of(ds, "doc_id")
    empty = pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int32())})
    if pairs.count() == 0:
        return empty
    # cross-band duplicates of the same pair collide in one partition of the
    # pair-hash groupby — global dedup without a driver-side pandas pass
    return _collect_pairs_sorted(_dedup_pairs_ds(pairs), empty)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(rows × dim) float64 view of a list<float> column. The dim comes from
    the LONGEST row and every row must match it — a ragged or empty-row
    batch raises loudly instead of mis-reshaping (the first row's length is
    NOT trusted: a leading empty list would silently give dim=0)."""
    emb = batch[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    offs = emb.offsets.to_numpy().astype(np.int64)
    lengths = offs[1:] - offs[:-1]
    if len(lengths) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    dim = int(lengths.max())
    if dim == 0:
        return np.zeros((len(lengths), 0), dtype=np.float64)
    if not (lengths == dim).all():
        raise ValueError(
            f"ragged embedding column {col!r}: row lengths "
            f"{sorted(set(lengths.tolist()))[:5]}... expected all == {dim}")
    vals = emb.values.to_numpy().astype(np.float64)
    lo = offs[0]
    return vals[lo:lo + dim * len(lengths)].reshape(-1, dim)


def _hyperplane_bands(threshold: float, n_bits: int,
                      target_recall: float) -> int:
    """Number of independent hyperplane bands so a pair at exactly
    ``threshold`` cosine is a candidate with probability ≥ target_recall.

    Per-bit agreement probability p = 1 - θ/π (Charikar's SimHash bound);
    band match = p^n_bits; recall over L bands = 1-(1-p^b)^L. Low thresholds
    are inherently unselective for hyperplane LSH (ρ = ln p₁ / ln p₂ → 1 as
    θ → π/2): candidate volume, not correctness, degrades — size
    ``threshold`` ≥ ~0.8 for true 100 TB runs.
    """
    import logging

    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    p_band = (1.0 - theta / np.pi) ** n_bits
    if p_band >= 1.0:
        return 1
    L = int(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p_band)))
    if L > 512:
        achieved = 1.0 - (1.0 - p_band) ** 512
        logging.getLogger(__name__).warning(
            "hyperplane LSH band count capped at 512 (needed %d for recall "
            "%.4f at threshold %.2f); achieved recall at the threshold is "
            "~%.4f — raise the threshold or accept the lower recall",
            L, target_recall, threshold, achieved)
    return max(1, min(L, 512))


_PLANE_CACHE: dict = {}


def embedding_band_rows(batch: pa.Table, *, n_bits: int, n_bands: int,
                        seed: int = 13, col: str = "embedding",
                        id_col: str = "vec_id") -> pa.Table:
    """Task-pool random-hyperplane band rows per vector (planes per-process
    cached by (dim, bits, bands, seed) — see the cache note above; the dim
    is discovered from the list column, deterministic across workers and
    cluster sizes). Emits (doc_id, band:int32, band_hash:int64) rows, the
    same layout as MinHash band rows, feeding the shared candidate
    machinery."""
    M = _embedding_matrix(batch, col)
    n = M.shape[0]
    if n == 0:
        return pa.table({"doc_id": pa.array([], batch[id_col].type),
                         "band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64())})
    key = (M.shape[1], n_bits, n_bands, seed)
    if key not in _PLANE_CACHE:
        rng = np.random.default_rng(seed)
        _PLANE_CACHE[key] = rng.standard_normal(
            (M.shape[1], n_bits * n_bands))
    planes = _PLANE_CACHE[key]
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    bits = (Mn @ planes) > 0
    packed = (bits.reshape(n, n_bands, n_bits).astype(np.int64)
              << np.arange(n_bits, dtype=np.int64)[None, None, :]
              ).sum(axis=2)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        "doc_id": ids.take(pa.array(np.repeat(np.arange(n), n_bands))),
        "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
        "band_hash": pa.array(packed.reshape(-1)),
    })


class EmbeddingBander:
    """Actor-pool FORM of ``embedding_band_rows`` (same kernel; the query
    path uses the task-pool function)."""

    def __init__(self, n_bits: int, n_bands: int, seed: int = 13,
                 col: str = "embedding", id_col: str = "vec_id") -> None:
        self.kw = dict(n_bits=n_bits, n_bands=n_bands, seed=seed,
                       col=col, id_col=id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return embedding_band_rows(batch, **self.kw)


def embedding_near_dup_pairs_ds(ds: rd.Dataset, threshold: float = 0.9,
                                col: str = "embedding",
                                id_col: str = "vec_id",
                                n_bits: int = 8, target_recall: float = 0.99,
                                seed: int = 13,
                                pairs_broadcast_limit: int =
                                _PAIRS_BROADCAST_LIMIT) -> rd.Dataset:
    """Pairs with cosine ≥ threshold as a DATASET (a, b, cosine) — see
    ``minhash_dedup_pairs_ds``. Hyperplane-LSH bucketed scale path.

    Plan: band-row map_batches (vectors never shuffle; band rows are 3 thin
    columns) → shared distributed bucket-count + in-bucket pair expansion
    (``_lsh_candidate_pairs``) → DISTRIBUTED exact-cosine verify: candidate
    vectors are normalized in the cluster, joined onto the pair Dataset
    (broadcast / partitioned plan by size), and the dot product runs inside
    map_batches — the driver sees only the verified output. Band count
    derives from (threshold, target_recall): recall ≥ target_recall at the
    threshold, →1 above it; the verify stage is exact, so precision is
    always 1.

    Zero vectors share every bucket by construction; their pairs are emitted
    (capped by ``max_bucket``) and rejected by the exact verify (cosine 0).
    """
    id_type = _id_type_of(ds, id_col)
    empty = _empty_pairs(id_type, "cosine")
    n_bands = _hyperplane_bands(threshold, n_bits, target_recall)
    sig = ds.map_batches(
        embedding_band_rows,
        fn_kwargs=dict(n_bits=n_bits, n_bands=n_bands, seed=seed,
                       col=col, id_col=id_col),
        batch_format="pyarrow")
    pairs = _lsh_candidate_pairs(sig)
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    def normalize(batch: pa.Table) -> pa.Table:
        M = _embedding_matrix(batch, col)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        n, dim = Mn.shape
        offs = (np.arange(n + 1, dtype=np.int32) * dim)
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(Mn.reshape(-1), type=pa.float64()))
        return pa.table({id_col: batch[id_col], "nv": lst})

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty
        la, va = _list_segments(batch["nv_a"])
        lb, vb = _list_segments(batch["nv_b"])
        dim = int(la[0])
        cos = np.einsum("ij,ij->i", va.reshape(n, dim), vb.reshape(n, dim))
        # threshold on the UNROUNDED cosine (the verify is exact; rounding
        # first would admit pairs just below threshold), round only the
        # reported value
        mask = cos >= threshold
        keep = pa.array(mask)
        return pa.table({"a": batch["a"].filter(keep),
                         "b": batch["b"].filter(keep),
                         "cosine": pa.array(np.round(cos[mask], 4))})

    return _verify_with_payload(
        ds, pairs, normalize, id_col=id_col, payload_cols=[id_col, col],
        val_col="nv", verify_fn=verify,
        pairs_broadcast_limit=pairs_broadcast_limit)


def embedding_near_dup_pairs(ds: rd.Dataset, threshold: float = 0.9,
                             col: str = "embedding", id_col: str = "vec_id",
                             n_bits: int = 8, target_recall: float = 0.99,
                             seed: int = 13,
                             pairs_broadcast_limit: int =
                             _PAIRS_BROADCAST_LIMIT) -> pa.Table:
    """Driver-side convenience: ``embedding_near_dup_pairs_ds`` collected to
    one (a, b)-sorted table — only for outputs known small."""
    empty = _empty_pairs(_id_type_of(ds, id_col), "cosine")
    return _collect_pairs_sorted(
        embedding_near_dup_pairs_ds(ds, threshold, col, id_col, n_bits,
                                    target_recall, seed,
                                    pairs_broadcast_limit), empty)


# ---------------------------------------------------------------------------
# Token-level MinHash (U5 on the flagship payload) — fully vectorized
# ---------------------------------------------------------------------------

_SH_C = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
         np.uint64(0x165667B19E3779F9))


def _sh_consts(k: int) -> np.ndarray:
    """Per-position mixing constants for k-window shingles, ANY k ≥ 1 (the
    fixed triple only covered k ≤ 3 and crashed beyond); positions 0–2 keep
    the original constants so existing k ≤ 3 shingle hashes are unchanged."""
    from ..hashing import stable_hash_ints

    out = np.empty(k, dtype=np.uint64)
    base = np.array(_SH_C, dtype=np.uint64)
    out[:min(k, 3)] = base[:min(k, 3)]
    if k > 3:
        with np.errstate(over="ignore"):
            out[3:] = stable_hash_ints(
                np.arange(3, k, dtype=np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    return out


def _window_shingles(flat: np.ndarray, rel_offsets: np.ndarray, k: int,
                     short_fallback: np.ndarray):
    """Generic k-window shingle hashing over a flat uint64 buffer with row
    offsets (relative, starting at 0). Rows with 0 < len < k get ONE shingle
    from ``short_fallback``; empty rows get zero. Returns
    (shingle hashes, row starts into them, shingles per row)."""
    from ..hashing import stable_hash_ints

    lengths = rel_offsets[1:] - rel_offsets[:-1]
    consts = _sh_consts(k)
    with np.errstate(over="ignore"):
        win = np.zeros(max(len(flat) - k + 1, 0), dtype=np.uint64)
        for j in range(k):
            win += flat[j:len(flat) - k + 1 + j] * consts[j]
        win = stable_hash_ints(win)

    n_shingles = np.maximum(lengths - k + 1, 0)
    short = (lengths > 0) & (lengths < k)
    n_out = np.where(short, 1, n_shingles)
    out = np.empty(int(n_out.sum()), dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(n_out)])[:-1]
    full_rows = np.nonzero(n_shingles > 0)[0]
    if len(full_rows):
        idx = (np.arange(int(n_shingles[full_rows].sum()), dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(
                   n_shingles[full_rows])])[:-1], n_shingles[full_rows]))
        src = np.repeat(rel_offsets[:-1][full_rows],
                        n_shingles[full_rows]) + idx
        dst = np.repeat(starts[full_rows], n_shingles[full_rows]) + idx
        out[dst] = win[src]
    if short.any():
        out[starts[short]] = short_fallback[short]
    return out, starts, n_out


def token_shingle_hashes(tokens, k: int = 3):
    """(flat shingle hashes, row starts, shingles per row) for a list<int32>
    column — one vectorized pass, no per-row Python. Short rows fall back to
    the whole-row hash; empty rows get zero shingles."""
    from ..hashing import hash_token_lists

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy().astype(np.int64)
    values = tokens.values.to_numpy()
    lo, hi = offsets[0], offsets[-1]
    vals = values[lo:hi].astype(np.uint64)
    return _window_shingles(vals, offsets - lo, k, hash_token_lists(tokens))


def text_shingle_hashes(text_col, k: int = 3, short_fallback: bool = True):
    """Word-shingle hashes of a string column, vectorized: split → per-word
    stable hash → k-window combine (same machinery as token shingles).

    Empty/whitespace-only docs get ZERO shingles: ``pc.split_pattern``
    (unlike ``str.split``) returns [''] for an empty string, which would
    give every blank doc the identical fallback shingle and an O(n²) LSH
    pair blowup — exact dedup is the operator for identical blank docs.

    ``short_fallback``: rows with fewer than k words normally get ONE
    xor-fold shingle so MinHash LSH can still bucket them — but the fold
    is WORD-ORDER-INSENSITIVE, which an exact-semantics consumer must not
    inherit ("foo bar" vs "bar foo" would claim J=1). Pass False to give
    short rows zero shingles instead (the jaccard_join_exact contract,
    matching a SQL k-gram construction that emits nothing below k words).
    """
    from ..hashing import stable_hash_ints

    words = pc.split_pattern(text_col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    flat = words.flatten()
    wh = stable_hash_strings(flat)
    lengths = offsets[1:] - offsets[:-1]
    # blank row = every "word" is the empty string (split of ""/whitespace)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonblank = np.zeros(len(lengths), dtype=bool)
    if wlen.size:
        csum = np.concatenate([[0], np.cumsum(wlen)])
        nonblank = (csum[offsets[1:]] - csum[offsets[:-1]]) > 0
    # short-row fallback: xor-fold of the row's word hashes, mixed
    fold = np.zeros(len(lengths), dtype=np.uint64)
    nonempty = lengths > 0
    if wh.size:
        fold[nonempty] = np.bitwise_xor.reduceat(
            wh, offsets[:-1][nonempty])
    fold = stable_hash_ints(fold ^ lengths.astype(np.uint64))
    sh, starts, n_out = _window_shingles(wh, offsets, k, fold)
    # zero out blank (and, without the fallback, short) rows AFTER the
    # window pass: their shingles are dropped by compacting the output
    # (n_out=0 rows emit nothing downstream)
    keep_rows = nonblank if short_fallback else nonblank & (lengths >= k)
    if (~keep_rows).any():
        new_n = np.where(keep_rows, n_out, 0)
        keep_idx = np.flatnonzero(keep_rows)
        counts = n_out[keep_idx]
        total = int(counts.sum())
        local = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.concatenate([[0], np.cumsum(counts)])[:-1],
                             counts))
        idx = np.repeat(starts[keep_idx], counts) + local
        sh = sh[idx]
        starts = np.concatenate([[0], np.cumsum(new_n)])[:-1]
        n_out = new_n
    return sh, starts, n_out


class TokenMinHasher:
    """Actor-pool FORM of ``minhash_token_band_rows`` (same kernel; the
    query path uses the task-pool function). Signatures via ONE
    ``np.minimum.reduceat`` per corpus chunk (no per-row loops). Use modest
    ``batch_size`` (≤4096): the perm matrix is (shingles × num_perm)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3):
        assert num_perm % bands == 0
        self.kw = dict(num_perm=num_perm, bands=bands, k=k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return minhash_token_band_rows(batch, **self.kw)


def minhash_dedup_pairs_tokens_ds(ds: rd.Dataset, threshold: float = 0.7,
                                  num_perm: int = 64, bands: int = 16,
                                  k: int = 3,
                                  pairs_broadcast_limit: int =
                                  _PAIRS_BROADCAST_LIMIT) -> rd.Dataset:
    """U5 on the flagship payload: near-dup pairs by token-shingle Jaccard,
    as a DATASET (a, b, jaccard) — see ``minhash_dedup_pairs_ds``.

    Same fully-distributed plan: candidates stay a Dataset, token-shingle
    SETS are computed in the cluster and joined onto the pairs, exact
    Jaccard runs vectorized in map_batches; nothing touches the driver."""
    assert num_perm % bands == 0
    id_type = _id_type_of(ds, "doc_id")
    empty = _empty_pairs(id_type, "jaccard")
    sig = ds.map_batches(minhash_token_band_rows,
                         fn_kwargs=dict(num_perm=num_perm, bands=bands, k=k),
                         batch_format="pyarrow", batch_size=2048)
    pairs = _lsh_candidate_pairs(sig)
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    def shingles(batch: pa.Table):
        return token_shingle_hashes(batch["tokens"], k)

    return _verify_pairs_jaccard(ds, pairs, shingles, threshold=threshold,
                                 id_col="doc_id",
                                 payload_cols=["doc_id", "tokens"],
                                 empty=empty,
                                 pairs_broadcast_limit=pairs_broadcast_limit)


def minhash_dedup_pairs_tokens(ds: rd.Dataset, threshold: float = 0.7,
                               num_perm: int = 64, bands: int = 16,
                               k: int = 3,
                               pairs_broadcast_limit: int =
                               _PAIRS_BROADCAST_LIMIT) -> pa.Table:
    """Driver-side convenience: ``minhash_dedup_pairs_tokens_ds`` collected
    to one (a, b)-sorted table — only for outputs known small."""
    empty = _empty_pairs(_id_type_of(ds, "doc_id"), "jaccard")
    return _collect_pairs_sorted(
        minhash_dedup_pairs_tokens_ds(ds, threshold, num_perm, bands, k,
                                      pairs_broadcast_limit), empty)


def dedup_incremental(new_ds: rd.Dataset, seen_ds: rd.Dataset,
                      content_col: str = "text", key_col: str = "doc_id",
                      broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """Incremental (delta) exact dedup — the daily-crawl-increment op:
    survivors of the NEW shard are rows that are (a) the min-``key_col``
    winner within the shard (``exact_dedup``) and (b) whose content
    fingerprint is ABSENT from the SEEN corpus. ``content_col`` may be
    full text or any canonical key (URL, source:lang, simhash bucket…).

    The seen side reduces to its distinct 2×64-bit fingerprint pairs —
    thin regardless of corpus size. Plans by fingerprint count:
    BROADCAST (≤ limit): one ray.put of the 16-byte-per-row fingerprint
    set, each new batch filtered via a vectorized big-endian-byte
    ``np.isin`` (EXACT pair membership — no 64-bit refold, so no silent
    drops from fused-hash collisions). PARTITIONED (beyond): both sides
    bucket by ``h1 % parts`` and anti-join per partition — one thin
    shuffle each, driver memory independent of corpus size."""
    import pandas as pd

    from .util import arrow_out

    h1 = lambda b: stable_hash_strings(b[content_col])  # noqa: E731
    h2 = lambda b: stable_hash_strings(b[content_col],  # noqa: E731
                                       key=_HASH_KEY_2)

    key_type = _id_type_of(new_ds, key_col)
    fresh = exact_dedup(new_ds, content_col, key_col,
                        broadcast_limit=broadcast_limit)

    def fp_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"h1": pa.array(h1(b).astype(np.int64)),
                      "h2": pa.array(h2(b).astype(np.int64))})
        return t.group_by(["h1", "h2"]).aggregate([])

    seen_fp = (seen_ds.map_batches(fp_partial, batch_format="pyarrow")
               .groupby(["h1", "h2"])
               .aggregate(Count(alias_name="_c"))
               .map_batches(lambda b: b.select(["h1", "h2"]),
                            batch_format="pyarrow")
               .materialize())

    def _packed(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
        v = np.empty((len(a1), 2), dtype=">i8")
        v[:, 0], v[:, 1] = a1, a2
        return v.reshape(-1).view("S16")

    if seen_fp.count() <= broadcast_limit:
        from .util import collect_table
        t = collect_table(seen_fp)
        packed = _packed(
            t["h1"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["h2"].to_numpy(zero_copy_only=False).astype(np.int64))
        seen_ref = ray.put(np.sort(packed))

        def keep(batch: pa.Table) -> pa.Table:
            q = _packed(h1(batch).astype(np.int64),
                        h2(batch).astype(np.int64))
            mask = ~np.isin(q, ray.get(seen_ref), assume_unique=False)
            return batch.filter(pa.array(mask))

        return fresh.map_batches(keep, batch_format="pyarrow")

    # scale path: per-partition anti-join on the fingerprint pair
    n_parts = 64

    def tag(is_seen: int):
        def fn(b: pa.Table) -> pa.Table:
            a1 = (b["h1"].to_numpy(zero_copy_only=False) if is_seen
                  else h1(b)).astype(np.int64)
            a2 = (b["h2"].to_numpy(zero_copy_only=False) if is_seen
                  else h2(b)).astype(np.int64)
            keys = (b[key_col] if not is_seen
                    else pa.nulls(b.num_rows, key_type))
            return pa.table({
                "h1": pa.array(a1), "h2": pa.array(a2), key_col: keys,
                "_seen": pa.array(np.full(b.num_rows, is_seen,
                                          dtype=np.int8)),
                "_apid": pa.array(
                    (a1.view(np.uint64) % np.uint64(n_parts))
                    .astype(np.int64))})
        return fn

    # fresh must be materialized: tag() consumes it and the final
    # semi-filter reads it again
    fresh = fresh.materialize()
    both = (fresh.map_batches(tag(0), batch_format="pyarrow")
            .union(seen_fp.map_batches(
                lambda b: b, batch_format="pyarrow").map_batches(
                tag(1), batch_format="pyarrow")))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        seen = g[g["_seen"] == 1][["h1", "h2"]]
        new = g[g["_seen"] == 0]
        m = new.merge(seen.drop_duplicates(), on=["h1", "h2"],
                      how="left", indicator=True)
        return m[m["_merge"] == "left_only"][[key_col]]

    survivor_keys = (both.groupby("_apid")
                     .map_groups(arrow_out(anti), batch_format="pandas"))

    def as_skey(b: pa.Table) -> pa.Table:
        # the pandas round-trip types the key column PER BLOCK: the union
        # carries null keys on seen rows, so pandas may hand groups back as
        # float64 (NaN-promoted) or int64 depending on block layout — and
        # mixed dtypes across blocks break the downstream concat ("_skey
        # has incompatible types: double vs int64", a flaky layout-
        # dependent failure). Pin the declared key type explicitly.
        return pa.table({"_skey": pc.cast(b[key_col], key_type)})

    from .join import equi_join
    joined = equi_join(
        fresh,
        survivor_keys.map_batches(as_skey, batch_format="pyarrow"),
        left_on=key_col, right_on="_skey", how="inner")
    cols = new_ds.schema().names
    return joined.map_batches(lambda b: b.select(cols),
                              batch_format="pyarrow")



def _anti_filter_keys(ds: rd.Dataset, drop_keys: rd.Dataset,
                      key_col: str, drop_col: str = "_drop",
                      broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """Rows of ``ds`` whose ``key_col`` is NOT in ``drop_keys`` —
    plan-selected like ``_dedup_by_hash``'s winner filter: BROADCAST the
    distinct drop-key array when small (one ray.put, vectorized inverted
    is_in per task — no shuffle of ``ds``), else a bucketed anti-join
    (both sides shuffle once on the key; driver memory independent of
    drop-key count)."""
    import pandas as pd

    drop_keys = drop_keys.materialize()
    n = drop_keys.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        from .util import collect_table
        arr = collect_table(drop_keys)[drop_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        ref = ray.put(pc.unique(arr))

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[key_col], value_set=ray.get(ref))
            return batch.filter(pc.invert(mask))

        return ds.map_batches(keep, batch_format="pyarrow")

    n_parts = 64
    sch = ds.schema()
    cols = sch.names
    # capture plain types, NOT the Dataset — a `ds.schema()` call inside
    # the UDF would ship the Dataset handle into every task
    col_types = dict(zip(sch.names, sch.types))

    def tag(side: int, key: str):
        def fn(b: pa.Table) -> pa.Table:
            k = b[key]
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            h = _col_hash(k)
            t = pa.table({c: b[c] for c in cols}) if side == 0 else \
                pa.table({c: (b[key] if c == key_col else
                              pa.nulls(b.num_rows, col_types[c]))
                          for c in cols})
            return (t.append_column("_side", pa.array(
                np.full(b.num_rows, side, dtype=np.int8)))
                .append_column("_kpid", pa.array(
                    (h % np.uint64(n_parts)).astype(np.int64))))
        return fn

    both = (ds.map_batches(tag(0, key_col), batch_format="pyarrow")
            .union(drop_keys.map_batches(tag(1, drop_col),
                                         batch_format="pyarrow")))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        drops = g[g["_side"] == 1][key_col].to_numpy()
        keep = g[g["_side"] == 0]
        return keep[~keep[key_col].isin(drops)][cols]

    out = (both.groupby("_kpid")
           .map_groups(arrow_out(anti), batch_format="pandas"))

    def retype(b: pa.Table) -> pa.Table:
        # the union's side-1 rows null-fill the non-key columns, so the
        # pandas group round-trip may NaN-promote integer columns in SOME
        # groups (block-layout-dependent) — pin every column back to the
        # declared schema so downstream concat/joins never see mixed
        # double/int64 blocks (same flake class as dedup_incremental's
        # _skey fix)
        return pa.table({c: pc.cast(b[c], col_types[c]) for c in cols})

    return out.map_batches(retype, batch_format="pyarrow")


def minhash_dedup_incremental(new_ds: rd.Dataset, seen_ds: rd.Dataset,
                              threshold: float = 0.7, num_perm: int = 64,
                              bands: int = 16, k: int = 3,
                              text_col: str = "text",
                              key_col: str = "doc_id",
                              seen_band_rows: rd.Dataset | None = None
                              ) -> rd.Dataset:
    """Incremental NEAR-dup dedup: rows of the NEW shard whose verified
    word-shingle Jaccard vs ANY seen-corpus document is ≥ threshold are
    dropped (new-vs-new near-dups are left to the caller — compose with
    ``apply_pair_dedup`` when shard-internal dedup is also wanted).

    REQUIRES disjoint ``key_col`` spaces across the two shards (the usual
    contract for crawl increments). Plan: one LSH pass over the UNION,
    verified pairs as a Dataset, pairs touching a seen id found by a thin
    semi-join of the pair table against the seen-id set, and the new-side
    endpoints of those pairs anti-filtered out of the shard (broadcast /
    bucketed plan, ``_anti_filter_keys``). Every join input is pair- or
    id-sized; payloads never leave the cluster.

    ``seen_band_rows``: the persisted-index fast path for a production
    increment loop. Pass ``minhash_band_rows_ds(seen_ds, ...)`` written
    once per corpus snapshot (MUST use the same num_perm/bands/k — the
    permutations are seeded, so persisted and fresh rows are identical)
    and only the NEW shard is scanned/hashed this run; the seen corpus is
    touched again ONLY to gather the candidate pair endpoints' texts for
    the exact verify (a semi-filtered read, candidate-scale not
    corpus-scale). Output is identical to the recompute path (pinned by
    pytest)."""
    sel = [key_col, text_col]
    u = (new_ds.map_batches(lambda b: b.select(sel),
                            batch_format="pyarrow")
         .union(seen_ds.map_batches(lambda b: b.select(sel),
                                    batch_format="pyarrow")))
    if seen_band_rows is None:
        # the recompute path still keys its band rows on key_col via the
        # canonicalizing minhash_band_rows_ds below — same code both ways
        seen_band_rows = minhash_band_rows_ds(seen_ds, num_perm, bands, k,
                                              text_col, id_col=key_col)
    # normalize BOTH union sides to the canonical band schema: union
    # aligns blocks positionally, and the persisted side's intended use
    # is a storage round trip that may reorder columns (ray-data gotcha)
    norm = lambda d: d.map_batches(  # noqa: E731
        lambda b: b.select(_BAND_COLS), batch_format="pyarrow")
    band_u = norm(minhash_band_rows_ds(new_ds, num_perm, bands, k,
                                       text_col, id_col=key_col)
                  ).union(norm(seen_band_rows))
    cand = _lsh_candidate_pairs(band_u)
    pairs = _minhash_pairs_from_candidates(
        u, cand, threshold=threshold, k=k, text_col=text_col,
        id_col=key_col)
    return _incremental_from_pairs(new_ds, seen_ds, pairs, key_col)


def _incremental_from_pairs(new_ds: rd.Dataset, seen_ds: rd.Dataset,
                            pairs: rd.Dataset,
                            key_col: str) -> rd.Dataset:
    """Shared tail of every incremental near-dup variant: given verified
    pairs over the shard UNION (disjoint key spaces), drop the NEW-side
    endpoints of pairs that touch a seen id. All inputs pair- or
    id-sized; plan-selected anti-filters."""
    from .join import equi_join

    # repartition scrubs the schema-less 0-row blocks that map_groups
    # pipelines emit (map_batches SKIPS empty blocks, so the rename UDFs
    # below never fix them and the native join's aggregator raises
    # "No match for key field" — see the gotcha at _drop_keys)
    pairs = pairs.repartition(16).materialize()  # consumed twice below
    if pairs.count() == 0:
        # no near-dups at all — and an all-empty Dataset would reach the
        # join with no schema for the renamed key columns
        return new_ds

    seen_ids = seen_ds.map_batches(
        lambda b: pa.table({"_sid": b[key_col]}),
        batch_format="pyarrow").materialize()

    def ends(col_keep: str, col_probe: str):
        # pairs whose `col_probe` endpoint is a SEEN id → keep the other
        # endpoint (disjoint spaces ⇒ it is a NEW id iff not seen; the
        # second semi-join below removes seen-seen pairs' endpoints)
        j = equi_join(
            pairs.map_batches(
                lambda b: pa.table({"_keep": b[col_keep],
                                    "_probe": b[col_probe]}),
                batch_format="pyarrow"),
            seen_ids, left_on="_probe", right_on="_sid", how="inner",
            broadcast_limit=0)
        return j.map_batches(lambda b: pa.table({"_drop": b["_keep"]}),
                             batch_format="pyarrow")

    cand_drops = ends("a", "b").union(ends("b", "a")).materialize()
    # remove drops that are themselves seen ids (seen-seen pairs)
    new_drops = _anti_filter_keys(
        cand_drops, seen_ids, key_col="_drop", drop_col="_sid")
    return _anti_filter_keys(new_ds, new_drops, key_col=key_col,
                             drop_col="_drop")


def embedding_dedup_incremental(new_ds: rd.Dataset, seen_ds: rd.Dataset,
                                threshold: float = 0.9,
                                col: str = "embedding",
                                id_col: str = "vec_id",
                                n_bits: int = 8,
                                target_recall: float = 0.99,
                                seed: int = 13) -> rd.Dataset:
    """Incremental EMBEDDING near-dup dedup (semantic-dedup shape): new
    rows whose exact cosine vs any seen vector ≥ threshold are dropped.
    Same contract and plan as ``minhash_dedup_incremental`` (disjoint id
    spaces; one hyperplane-LSH pass over the union — vectors never
    shuffle, band rows do; verified pairs as a Dataset; thin pair/id
    joins; plan-selected anti-filters)."""
    sel = [id_col, col]
    u = (new_ds.map_batches(lambda b: b.select(sel),
                            batch_format="pyarrow")
         .union(seen_ds.map_batches(lambda b: b.select(sel),
                                    batch_format="pyarrow")))
    pairs = embedding_near_dup_pairs_ds(u, threshold=threshold, col=col,
                                        id_col=id_col, n_bits=n_bits,
                                        target_recall=target_recall,
                                        seed=seed)
    return _incremental_from_pairs(new_ds, seen_ds, pairs, id_col)


def shared_span_pairs(ds: rd.Dataset, n: int = 20,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_parts: int = 32,
                      max_bucket: int = 1024) -> rd.Dataset:
    """Document pairs sharing at least one EXACT n-word span, with the
    count of distinct shared spans — the substring-duplication primitive
    behind suffix-array-style training-data dedup (long verbatim overlap
    ⇒ near-certain duplication or quotation).

    Plan (all thin, LSH-candidate-shaped): per-batch distinct
    (span, doc) rows from the list-offset n-gram kernel
    (functions/text.py ngram_strings — spans never cross documents) →
    ONE shuffle partitioned by span hash (every copy of a span lands
    together, so per-partition processing is globally complete) →
    per-partition sort + segment scan expands each multi-doc span into
    ordered (a < b) pairs — each (a, b, span) combination is emitted
    EXACTLY ONCE globally, so plain two-phase counting yields the
    distinct-shared-span count with no second dedup shuffle. Spans
    shared by more than ``max_bucket`` docs are truncated (worker-side
    log) — such spans are boilerplate, a signal for the exact-dedup /
    normalization stages, not pair expansion."""
    import logging

    import pandas as pd
    from ray.data.aggregate import Sum

    from .text import _split_words, ngram_strings

    def gram_rows(b: pa.Table) -> pa.Table:
        grams, doc_idx, _ = ngram_strings(_split_words(b[text_col]), n)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = pa.table({"g": grams, "d": ids.take(pa.array(doc_idx))})
        t = t.group_by(["g", "d"]).aggregate([])  # batch-local distinct
        h = stable_hash_strings(t["g"].combine_chunks()
                                if isinstance(t["g"], pa.ChunkedArray)
                                else t["g"])
        return t.append_column(
            "_gpid", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": g["d"], "b": g["d"]})
        g = (g.drop_duplicates(subset=["g", "d"])
             .sort_values(["g", "d"], kind="mergesort"))
        gv = g["g"].to_numpy()
        dv = g["d"].to_numpy()
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        sizes = np.diff(np.r_[starts, len(gv)])
        a_out, b_out = [], []
        for s in np.flatnonzero(sizes > 1):
            m = int(sizes[s])
            if m > max_bucket:
                logging.getLogger(__name__).warning(
                    "shared_span_pairs: span shared by %d docs truncated "
                    "to %d (boilerplate-shaped)", m, max_bucket)
                m = max_bucket
            docs = dv[starts[s]:starts[s] + m]
            ia, ib = np.triu_indices(m, k=1)
            a_out.append(docs[ia])
            b_out.append(docs[ib])
        if not a_out:
            return pd.DataFrame({"a": dv[:0], "b": dv[:0]})
        return pd.DataFrame({"a": np.concatenate(a_out),
                             "b": np.concatenate(b_out)})

    pair_rows = (ds.map_batches(gram_rows, batch_format="pyarrow")
                 .groupby("_gpid")
                 .map_groups(arrow_out(per_part), batch_format="pandas"))

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "p_cnt"])

    return (pair_rows.map_batches(count_partial, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("p_cnt", alias_name="shared_spans")))
