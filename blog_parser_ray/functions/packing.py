"""Training-example assembly ops (task extension set): sequence packing and
deterministic stratified splits.

- ``pack_sequences``: combine whole sequences into packed training examples
  of ≤ ``max_len`` tokens (no sequence ever split). First-fit-in-order pack
  BOUNDARIES carry a true sequential dependence and are resolved in one
  Python pass over ROWS (≤ batch_size iterations — cheap next to the token
  copy); everything over TOKEN values (pack sizes, payload assembly) is one
  vectorized bincount + ListArray rebuild. Packing is per-batch
  (embarrassingly parallel); cross-batch fill is deliberately not attempted —
  at 10¹² rows the ~½-example waste per batch is noise, and batch-local
  packing keeps the op a pure map.
- ``stratified_split``: train/val/test by stable hash of the key — the same
  row lands in the same split on every run, cluster size, or input order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .. import schema as S
from ..hashing import stable_hash_strings


def pack_sequences_batch(batch: pa.Table, max_len: int = 2048) -> pa.Table:
    """One batch → packed examples (pack_id is batch-local; global ids come
    from (source file/partition, pack_id) downstream)."""
    tokens = batch["tokens"]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy().astype(np.int64)
    values = tokens.values.to_numpy()
    lengths = offsets[1:] - offsets[:-1]
    n = len(lengths)
    if n == 0:
        return pa.table({
            "pack_id": pa.array([], pa.int64()),
            "n_seqs": pa.array([], pa.int32()),
            "n_tok": pa.array([], pa.int32()),
            "doc_ids": pa.array([], pa.list_(pa.string())),
            "tokens": pa.array([], S.TOKENS_TYPE),
        })
    if int(lengths.max()) > max_len:
        raise ValueError(
            f"sequence longer than max_len={max_len}; filter oversized rows "
            "(parse_class='oversized') before packing")

    # first-fit-in-order: assign pack boundaries where the running total
    # would exceed max_len. Sequential dependence resolved in one python
    # pass over ROWS (not tokens) — cheap relative to the token copy below.
    pack_of = np.empty(n, dtype=np.int64)
    acc = 0
    pack = 0
    for i in range(n):
        li = lengths[i]
        if acc + li > max_len:
            pack += 1
            acc = 0
        pack_of[i] = pack
        acc += li
    n_packs = pack + 1

    # tokens of a pack = concatenation of its members' tokens (members are
    # consecutive in row order, so the flat copy is one gather)
    pack_tok = np.bincount(pack_of, weights=lengths).astype(np.int64)
    pack_seqs = np.bincount(pack_of).astype(np.int32)
    lo = offsets[0]
    flat = values[lo:offsets[-1]]
    # rows are consecutive → flat values are already in pack order
    out_offsets = np.concatenate([[0], np.cumsum(pack_tok)])
    packed_tokens = pa.ListArray.from_arrays(
        pa.array(out_offsets, type=pa.int32()),
        pa.array(flat, type=pa.int32()))

    doc_ids = batch["doc_id"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    id_offsets = np.concatenate([[0], np.cumsum(pack_seqs)])
    doc_id_lists = pa.ListArray.from_arrays(
        pa.array(id_offsets, type=pa.int32()), doc_ids)

    return pa.table({
        "pack_id": pa.array(np.arange(n_packs), type=pa.int64()),
        "n_seqs": pa.array(pack_seqs, type=pa.int32()),
        "n_tok": pa.array(pack_tok.astype(np.int32), type=pa.int32()),
        "doc_ids": doc_id_lists,
        "tokens": packed_tokens,
    })


def pack_sequences(ds: rd.Dataset, max_len: int = 2048,
                   batch_size: int = 8192) -> rd.Dataset:
    return ds.map_batches(lambda b: pack_sequences_batch(b, max_len),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def _salted_mod_hash(col, salt: str, mod: int) -> np.ndarray:
    """int64 ``stable_hash(salt + ":" + key) % mod`` of a column — the shared
    keying scheme of stratified_split and mixture_sample (one place so the
    two assignments can never silently diverge). The salt broadcasts as a
    scalar — no per-row Python."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    keyed = pc.binary_join_element_wise(
        pa.scalar(salt, type=pa.string()), pc.cast(col, pa.string()), ":")
    return (stable_hash_strings(keyed) % np.uint64(mod)).astype(np.int64)


def stratified_split(ds: rd.Dataset, key_col: str = "doc_id",
                     val_frac: float = 0.05, test_frac: float = 0.05,
                     salt: str = "split-v1") -> rd.Dataset:
    """Append ``split`` ∈ {train, val, test} from a salted stable hash of the
    key: deterministic across runs/cluster sizes/input order; changing the
    salt re-rolls the assignment."""
    val_cut = int(val_frac * 10_000)
    test_cut = val_cut + int(test_frac * 10_000)

    def fn(batch: pa.Table) -> pa.Table:
        h = _salted_mod_hash(batch[key_col], salt, 10_000)
        split = np.select([h < val_cut, h < test_cut], ["val", "test"],
                          default="train")
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_sample(ds: rd.Dataset, weights: dict[str, float],
                   source_col: str = "source", key_col: str = "doc_id",
                   salt: str = "mix-v1") -> rd.Dataset:
    """Deterministic weighted mixture sampling — downsample each source to
    its target rate (the training-mixture op: given per-source keep rates in
    [0, 1], e.g. derived from target mixture proportions, keep each row with
    exactly that per-source probability).

    Assignment is a salted stable hash of ``key_col`` compared against the
    source's rate — the same row keeps/drops on every run, cluster size, or
    input order (re-roll by changing the salt), and the op stays a pure
    map: no shuffle, no state, no driver collection. Sources absent from
    ``weights`` keep rate 1.0.
    """
    import pyarrow.compute as pc

    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight for {s!r} must be in [0,1], "
                             f"got {w}")
    if not weights:
        return ds  # every source keeps rate 1.0
    src_arr = pa.array(list(weights), type=pa.string())
    # unlisted sources (null index_in) map to a keep-everything cutoff
    cut_arr = np.array([int(w * 1_000_000) for w in weights.values()]
                       + [1_000_000], dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        h = _salted_mod_hash(batch[key_col], salt, 1_000_000)
        idx = pc.fill_null(
            pc.index_in(batch[source_col], value_set=src_arr),
            len(weights))
        cuts = cut_arr[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        return batch.filter(pa.array(h < cuts))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds: rd.Dataset, k: int, id_col: str = "doc_id",
                    weight_col: str = "n_chars",
                    salt: str = "wsample-v1") -> rd.Dataset:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws a uniform u from a salted
    stable hash of its id and gets key = ln(u)/w — the classic
    u^(1/w) rank order in a monotone, overflow-free form — and the sample
    is the global top-k by key. Inclusion probability ∝ weight;
    deterministic across runs, cluster sizes and input order (same salted
    hash ⇒ same u). Distributed shape: per-block top-k combiner (only
    k·blocks thin rows reach the final sort+limit — the corpus never
    shuffles). Rows with null/non-positive weight are excluded (they can
    never be sampled under the weighting semantics)."""
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        w = batch[weight_col]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        wnp = w.to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(wnp) & (wnp > 0)
        b = batch.filter(pa.array(ok)) if not ok.all() else batch
        wnp = wnp[ok]
        h = _salted_mod_hash(b[id_col], salt, 1 << 53).astype(np.uint64)
        # u in (0, 1]: (h+1) * 2^-53 — never 0, so ln(u) is finite
        u = (h + np.uint64(1)).astype(np.float64) * (2.0 ** -53)
        key = np.log(u) / wnp
        t = b.select([id_col, weight_col]).append_column(
            "_wkey", pa.array(key, type=pa.float64()))
        if t.num_rows > k:  # per-block combiner: keep the local top-k
            idx = np.argpartition(-key, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    from ..stages.agg import top_k
    out = top_k(ds.map_batches(tag, batch_format="pyarrow"),
                "_wkey", k, tiebreak=id_col)
    return out.map_batches(lambda b: b.drop_columns(["_wkey"]),
                           batch_format="pyarrow")
