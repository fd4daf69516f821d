"""Deterministic flagship-corpus synthesis (S3) and the documents→sequences bridge.

SURVEY.md §7.3 / FIXTURES.md §1, §5. Two producers of the flagship schema:

- ``tokenize_documents``: pure function of the driver ``documents`` table
  (vocab = the 31 words present in ``documents.text``); used by ``entry()`` and
  reproducible in DuckDB SQL for oracles.
- ``synth_table`` / ``synth_corpus``: seeded synthetic corpus with Zipf(1.1)
  ``source`` skew over ~1000 sources, lognormal lengths, and ~2% rows malformed
  across every parse-failure class — used for scale/skew tests and the bench.

Every random draw is a counter-based mix of (seed, row_id, stream) — a pure
function of the row id — so the corpus is byte-identical no matter how rows are
batched or partitioned across Ray tasks (M0 determinism gate), and generation
parallelizes embarrassingly via ``ray.data.range(n).map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import schema as S
from .hashing import stable_hash_ints

_NUM_SOURCES = 1000
_ZIPF_ALPHA = 1.1
_LOGNORM_MU = np.log(80.0)
_LOGNORM_SIGMA = 0.7
_MALFORMED_FRAC = 0.02


def _u01(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Deterministic uniform [0,1) per row id for a given stream index."""
    h = stable_hash_ints(ids.astype(np.uint64) * np.uint64(1_000_003)
                         + np.uint64(seed * 7919 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _uint(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    return stable_hash_ints(ids.astype(np.uint64) * np.uint64(1_000_003)
                            + np.uint64(seed * 7919 + stream))


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, _NUM_SOURCES + 1, dtype=np.float64)
    p = 1.0 / ranks ** _ZIPF_ALPHA
    p /= p.sum()
    return np.cumsum(p)


_ZIPF_CDF = _zipf_cdf()

# malformed class codes (order = stratification wheel)
_MF_CLASSES = ("malformed_id", "empty", "len_mismatch", "no_bos", "bad_token",
               "oversized")


def synth_table(ids: np.ndarray, seed: int = 42,
                vocab_size: int = S.DEFAULT_VOCAB_SIZE,
                max_tokens: int = S.MAX_TOKENS) -> pa.Table:
    """Build flagship rows for the given int64 row ids (pure, vectorized)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    if n == 0:
        return pa.table({k: pa.array([], type=t) for k, t in
                         zip(S.SEQUENCES_SCHEMA.names, S.SEQUENCES_SCHEMA.types)})

    # --- source: Zipf over src0..src999 ------------------------------------
    src_idx = np.searchsorted(_ZIPF_CDF, _u01(ids, seed, 0), side="right")
    src_idx = np.minimum(src_idx, _NUM_SOURCES - 1)
    sources = np.array([f"src{i}" for i in range(_NUM_SOURCES)], dtype=object)[src_idx]

    # --- inner content length: lognormal clipped ---------------------------
    u1, u2 = _u01(ids, seed, 1), _u01(ids, seed, 2)
    z = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-12))) * np.cos(2 * np.pi * u2)
    inner = np.clip(np.exp(_LOGNORM_MU + _LOGNORM_SIGMA * z), 1, max_tokens - 2
                    ).astype(np.int64)

    # --- malformed class per row ------------------------------------------
    mf_u = _u01(ids, seed, 3)
    is_mf = mf_u < _MALFORMED_FRAC
    mf_class = (_uint(ids, seed, 4) % np.uint64(len(_MF_CLASSES))).astype(np.int64)
    mf_class = np.where(is_mf, mf_class, -1)

    has_bos = np.ones(n, dtype=bool)
    has_eos = np.ones(n, dtype=bool)
    # no_bos class: alternately drop BOS or EOS
    no_bos_rows = mf_class == 3
    drop_eos = (_uint(ids, seed, 5) & np.uint64(1)).astype(bool)
    has_bos &= ~(no_bos_rows & ~drop_eos)
    has_eos &= ~(no_bos_rows & drop_eos)
    # oversized: force inner beyond the bound
    over_rows = mf_class == 5
    inner = np.where(over_rows,
                     max_tokens - 1 + (_uint(ids, seed, 6) % np.uint64(64)).astype(np.int64),
                     inner)
    # empty: zero tokens, no BOS/EOS
    empty_rows = mf_class == 1
    inner = np.where(empty_rows, 0, inner)
    has_bos &= ~empty_rows
    has_eos &= ~empty_rows

    lengths = inner + has_bos.astype(np.int64) + has_eos.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    total = int(offsets[-1])

    # --- flat token values: mix(row_id, position) --------------------------
    row_rep = np.repeat(ids, lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    hv = stable_hash_ints(row_rep.astype(np.uint64) * np.uint64(2_654_435_761)
                          + pos.astype(np.uint64) + np.uint64(seed))
    values = (S.N_SPECIALS
              + (hv % np.uint64(max(1, vocab_size - S.N_SPECIALS)))).astype(np.int64)

    starts = offsets[:-1]
    ends = offsets[1:] - 1
    bos_rows = np.nonzero(has_bos & (lengths > 0))[0]
    eos_rows = np.nonzero(has_eos & (lengths > 0))[0]
    values[starts[bos_rows]] = S.BOS
    values[ends[eos_rows]] = S.EOS

    # --- section delimiters: ~30% of rows with inner >= 20 -----------------
    sec_rows = np.nonzero((_u01(ids, seed, 7) < 0.30) & (inner >= 20) & ~is_mf)[0]
    for j in range(3):  # up to 3 SEC positions, each deterministic per row
        take = sec_rows[(_uint(ids[sec_rows], seed, 8 + j)
                         % np.uint64(3)).astype(np.int64) >= j]
        if len(take) == 0:
            continue
        rel = (1 + (_uint(ids[take], seed, 20 + j)
                    % np.uint64(np.maximum(inner[take] - 2, 1).astype(np.uint64)))
               ).astype(np.int64)
        values[starts[take] + has_bos[take].astype(np.int64) + rel - 1] = S.SEC

    # --- bad_token: one out-of-range id ------------------------------------
    bad_rows = np.nonzero((mf_class == 4) & (inner > 0))[0]
    if len(bad_rows):
        rel = (_uint(ids[bad_rows], seed, 30)
               % np.maximum(inner[bad_rows], 1).astype(np.uint64)).astype(np.int64)
        pick_neg = (_uint(ids[bad_rows], seed, 31) & np.uint64(1)).astype(bool)
        bad_val = np.where(pick_neg, -1, vocab_size + 7)
        values[starts[bad_rows] + has_bos[bad_rows].astype(np.int64) + rel] = bad_val

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values, type=pa.int32()),
    )

    # --- n_tok (len_mismatch rows off by a hash-derived delta) -------------
    n_tok = lengths.copy()
    mm_rows = mf_class == 2
    delta = 1 + (_uint(ids, seed, 40) % np.uint64(5)).astype(np.int64)
    n_tok = np.where(mm_rows, n_tok + delta, n_tok)

    # --- doc_id -------------------------------------------------------------
    month = (1 + _uint(ids, seed, 50) % np.uint64(12)).astype(np.int64)
    day = (1 + _uint(ids, seed, 51) % np.uint64(28)).astype(np.int64)
    date = pc.binary_join_element_wise(
        pa.array(np.full(n, "2024", dtype=object)),
        pc.utf8_lpad(pc.cast(pa.array(month), pa.string()), 2, "0"),
        pc.utf8_lpad(pc.cast(pa.array(day), pa.string()), 2, "0"),
        "-",
    )
    doc_id = pc.binary_join_element_wise(
        pa.array(sources, type=pa.string()), date,
        pc.cast(pa.array(ids), pa.string()), "/",
    )
    doc_id_np = np.asarray(doc_id.to_pylist(), dtype=object)
    mfid_rows = np.nonzero(mf_class == 0)[0]
    variants = (_uint(ids[mfid_rows], seed, 60) % np.uint64(5)).astype(np.int64)
    for i, v in zip(mfid_rows, variants):
        rid = ids[i]
        doc_id_np[i] = (
            f"noslash{rid}",                      # missing slashes
            f"{sources[i]}/2024-99-99/{rid}",     # impossible date
            f"{sources[i]}/2024-01-05/x{rid}",    # non-numeric seq
            f"/2024-01-05/{rid}",                 # empty source segment
            f"ünïcode/2024-01-05/{rid}",          # non-ascii source
        )[v]

    return pa.table(
        {
            "doc_id": pa.array(doc_id_np, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def synth_documents_table(ids: np.ndarray, seed: int = 42,
                          dup_frac: float = 0.10,
                          near_frac: float = 0.05) -> pa.Table:
    """Deterministic ``(doc_id:int64, source, text)`` documents with PLANTED
    exact and near duplicates — the corpus-scale input for curation benches
    (r3 verdict #4; the driver ``documents`` table tops out at 50k rows).

    Content: ``synth_table`` sequences detokenized onto the 31-word bridge
    vocab (non-special token ``t`` → ``VOCAB_WORDS[(t - N_SPECIALS) % 31]``).
    A ``dup_frac`` slice of rows collapses its content onto a bucket
    representative (``id - id % 101``) → exact text duplicates; a
    ``near_frac`` slice collapses AND appends one word → near duplicates at
    shingle-Jaccard just below 1. Pure and vectorized, same determinism
    contract as ``synth_table``.
    """
    ids = np.asarray(ids, dtype=np.int64)
    u = _u01(ids, seed, 17)
    rep = ids - (ids % np.int64(101))
    collapse = u < (dup_frac + near_frac)
    content_ids = np.where(collapse, rep, ids)
    t = synth_table(content_ids, seed=seed)

    toks = t["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.flatten().to_numpy().astype(np.int64)
    keep = flat >= S.N_SPECIALS  # drop BOS/EOS/SEC; malformed ids fold via %
    word_idx = (flat - S.N_SPECIALS) % np.int64(len(S.VOCAB_WORDS))
    row_of = np.repeat(np.arange(len(ids)), np.diff(offsets))
    kept_per_row = np.bincount(row_of[keep], minlength=len(ids))
    new_offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
    vocab_arr = pa.array(list(S.VOCAB_WORDS), type=pa.string())
    flat_words = vocab_arr.take(pa.array(word_idx[keep]))
    words_list = pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()), flat_words)
    text = pc.binary_join(words_list, " ")

    near = (u >= dup_frac) & (u < dup_frac + near_frac)
    text = pc.if_else(pa.array(near),
                      pc.binary_join_element_wise(text, "the", " "),
                      text)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "source": t["source"],
        "text": text,
    })


def synth_corpus(out_dir: str, n_rows: int, seed: int = 42,
                 num_partitions: int = 64,
                 vocab_size: int = S.DEFAULT_VOCAB_SIZE) -> None:
    """Distributed corpus write: ray.data.range → map_batches(synth) → parquet."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return synth_table(batch["id"].to_numpy(), seed=seed, vocab_size=vocab_size)

    (rd.range(n_rows, override_num_blocks=num_partitions)
       .map_batches(gen, batch_format="pyarrow", batch_size=65536)
       .write_parquet(out_dir))


# ---------------------------------------------------------------------------
# documents → sequences bridge (FIXTURES.md §1): pure function of the driver
# `documents` table, reproducible in SQL.
# ---------------------------------------------------------------------------

def tokenize_documents(docs: pa.Table) -> pa.Table:
    """(doc_id:int64, text, source) → flagship sequences schema.

    tokens = [BOS] + [vocab[w] for w in text.split()] + [EOS]
    doc_id' = f"{source}/2024-01-{(doc_id % 28) + 1:02d}/{doc_id}"
    """
    words = pc.split_pattern(docs["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    inner_len = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat = words.flatten()
    vocab_arr = pa.array(list(S.VOCAB_WORDS), type=pa.string())
    idx = pc.index_in(flat, value_set=vocab_arr)
    if idx.null_count > 0:
        bad = flat.filter(pc.is_null(idx)).to_pylist()[:5]
        raise ValueError(f"words outside the bridge vocab: {bad}")
    flat_ids = idx.to_numpy().astype(np.int64) + S.N_SPECIALS

    n = len(docs)
    lengths = inner_len + 2
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    values = np.empty(int(offsets[-1]), dtype=np.int64)
    starts = offsets[:-1]
    values[starts] = S.BOS
    values[offsets[1:] - 1] = S.EOS
    inner_pos = (np.arange(len(flat_ids), dtype=np.int64)
                 - np.repeat(np.concatenate([[0], np.cumsum(inner_len)])[:-1],
                             inner_len))
    values[np.repeat(starts + 1, inner_len) + inner_pos] = flat_ids

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(values, type=pa.int32()))
    raw_id = docs["doc_id"]
    day = pa.array(raw_id.to_numpy() % 28 + 1, type=pa.int64())
    doc_id = pc.binary_join_element_wise(
        docs["source"],
        pc.binary_join_element_wise(
            pa.array(["2024"] * n), pa.array(["01"] * n),
            pc.utf8_lpad(pc.cast(day, pa.string()), 2, "0"), "-"),
        pc.cast(raw_id, pa.string()), "/")

    return pa.table({
        "doc_id": pc.cast(doc_id, pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths, type=pa.int32()),
        "source": pc.cast(docs["source"], pa.string()),
    })
