"""Fused parse stage: P1 grok-parse + P2 token structural checks + P7 classify.

Recasts the reference's HTML field extraction (title/date/url) and
well-formedness/section detection (BASELINE.json north_star: "a vectorized
grok/regex parse stage runs via map_batches over zero-copy Arrow byte/token
columns"; SURVEY.md §2.2). One pass over each Arrow batch, no per-row Python:

- P1: ``pc.extract_regex`` with the named-group grok pattern over ``doc_id`` →
  ``parse_fields`` struct (null ⇒ malformed_id).
- P2: zero-copy structural checks on ``tokens`` via the ListArray offsets/values
  buffers + numpy cumsum segment sums (robust to empty rows and to sliced
  arrays whose offsets don't start at 0).
- P7: deterministic first-match precedence
  malformed_id > empty > len_mismatch > no_bos > bad_token > oversized > ok.

The ``tokens`` column is passed through untouched (token-array-equality
invariant, BASELINE.json input_hint) — parse only APPENDS columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S


def _list_layout(tokens: pa.ChunkedArray | pa.ListArray):
    """(offsets, values) numpy views of a list<int32> column.

    ``offsets`` are ABSOLUTE indices into ``values`` (a sliced ListArray keeps
    the parent buffers — offsets need not start at 0).
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy()
    values = tokens.values.to_numpy()
    return offsets, values


def _segment_count(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row count of True in ``mask`` (over flat values).

    The masks this stage counts (bad token ids, SEC delimiters) are SPARSE,
    so: positions of the hits (flatnonzero, one pass) → owning row
    (searchsorted into the absolute offsets) → per-row counts (bincount).
    Allocates O(hits + rows), never an O(values) cumsum temporary — this
    stage is memory-bandwidth-bound at full node concurrency, so every large
    temporary costs wall time (BENCH/BASELINE.md). Correct for empty rows and
    for sliced arrays (offsets are absolute; hits outside [offsets[0],
    offsets[-1]) are clipped away).
    """
    n = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    hits = np.flatnonzero(mask[lo:hi]) + lo
    if hits.size == 0:
        return np.zeros(n, dtype=np.int64)
    rows = np.searchsorted(offsets, hits, side="right") - 1
    return np.bincount(rows, minlength=n).astype(np.int64)


def parse_batch(batch: pa.Table, *, vocab_size: int = S.DEFAULT_VOCAB_SIZE,
                max_tokens: int = S.MAX_TOKENS) -> pa.Table:
    """Append ``parse_class``, ``parse_fields``, ``n_sections`` to a batch."""
    n = batch.num_rows
    if n == 0:
        out = batch
        out = out.append_column("parse_class", pa.array([], type=pa.string()))
        out = out.append_column("parse_fields",
                                pa.array([], type=S.PARSE_FIELDS_TYPE))
        out = out.append_column("n_sections", pa.array([], type=pa.int32()))
        out = out.append_column("tok_len", pa.array([], type=pa.int32()))
        return out

    # ---- P1: grok over doc_id --------------------------------------------
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    fields = pc.extract_regex(doc_id, pattern=S.GROK_DOC_ID)
    malformed = pc.is_null(fields).to_numpy(zero_copy_only=False)

    # ---- P2: token structure ---------------------------------------------
    offsets, values = _list_layout(batch["tokens"])
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_tok = batch["n_tok"].to_numpy().astype(np.int64)

    empty = lengths == 0
    len_mismatch = n_tok != lengths
    nonempty = ~empty
    first_ok = np.zeros(n, dtype=bool)
    last_ok = np.zeros(n, dtype=bool)
    ne_idx = np.nonzero(nonempty)[0]
    first_ok[ne_idx] = values[offsets[:-1][ne_idx]] == S.BOS
    last_ok[ne_idx] = values[offsets[1:][ne_idx] - 1] == S.EOS
    no_bos = nonempty & ~(first_ok & last_ok)

    # single-pass out-of-range check: int32 viewed as uint32 maps negatives
    # above any valid vocab id, so one unsigned compare covers both bounds
    bad_mask = values.view(np.uint32) >= np.uint32(vocab_size)
    bad_token = _segment_count(bad_mask, offsets) > 0
    oversized = lengths > max_tokens
    n_sections = (_segment_count(values == S.SEC, offsets) + 1).astype(np.int32)

    # ---- P7: precedence (first match wins) --------------------------------
    parse_class = np.select(
        [malformed, empty, len_mismatch, no_bos, bad_token, oversized],
        [S.CLASS_MALFORMED_ID, S.CLASS_EMPTY, S.CLASS_LEN_MISMATCH,
         S.CLASS_NO_BOS, S.CLASS_BAD_TOKEN, S.CLASS_OVERSIZED],
        default=S.CLASS_OK,
    )

    out = batch.append_column("parse_class", pa.array(parse_class, type=pa.string()))
    out = out.append_column("parse_fields", fields.cast(S.PARSE_FIELDS_TYPE))
    out = out.append_column("n_sections", pa.array(n_sections, type=pa.int32()))
    # materialized actual list length: lets downstream aggregates (A3 hist)
    # read a 4-byte column instead of the token payload
    out = out.append_column("tok_len",
                            pa.array(lengths.astype(np.int32), type=pa.int32()))
    return out


def make_parse_fn(vocab_size: int, max_tokens: int = S.MAX_TOKENS):
    """Closure form for ``Dataset.map_batches`` (stateless task stage)."""
    def fn(batch: pa.Table) -> pa.Table:
        return parse_batch(batch, vocab_size=vocab_size, max_tokens=max_tokens)
    return fn


def explode_sections(batch: pa.Table) -> pa.Table:
    """P6: split each sequence at SEC delimiters into child rows.

    Output: ``doc_id, source, sec_no:int32, sec_tokens:list<int32>,
    sec_len:int32``. Conservation invariant (tested): for every parent,
    concat(slices with SEC separators restored) == parent tokens, i.e. the
    slices partition the parent around its SEC positions.

    Vectorized: SEC positions found on the flat values buffer; child offsets
    built with numpy only (no per-row Python). This recasts the reference's
    document→sections split at header boundaries (SURVEY.md §1.1).
    """
    n = batch.num_rows
    empty_out = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "sec_no": pa.array([], type=pa.int32()),
        "sec_tokens": pa.array([], type=S.TOKENS_TYPE),
        "sec_len": pa.array([], type=pa.int32()),
    })
    if n == 0:
        return empty_out

    offsets, values = _list_layout(batch["tokens"])
    sec_flat = np.nonzero(values == S.SEC)[0]
    # keep only SEC hits inside this batch's rows (sliced arrays)
    sec_flat = sec_flat[(sec_flat >= offsets[0]) & (sec_flat < offsets[-1])]
    sec_row = np.searchsorted(offsets, sec_flat, side="right") - 1
    secs_in_row = np.bincount(sec_row, minlength=n).astype(np.int64)
    n_children = secs_in_row + 1

    # child boundaries per row: [row_start, sec_0, sec_1, ..., row_end]
    # child i spans (prev_boundary .. next_boundary) exclusive of the SEC itself
    child_starts = np.empty(int(n_children.sum()), dtype=np.int64)
    child_ends = np.empty_like(child_starts)
    child_parent = np.repeat(np.arange(n), n_children)
    child_no = (np.arange(len(child_parent), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(n_children)])[:-1],
                            n_children))
    first_child = child_no == 0
    last_child = child_no == (n_children[child_parent] - 1)
    # starts: row_start for first child, sec_pos+1 otherwise
    child_starts[first_child] = offsets[:-1][child_parent[first_child]]
    child_starts[~first_child] = sec_flat + 1
    child_ends[last_child] = offsets[1:][child_parent[last_child]]
    child_ends[~last_child] = sec_flat

    child_lens = child_ends - child_starts
    flat_idx = (np.arange(int(child_lens.sum()), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(child_lens)])[:-1],
                            child_lens)
                + np.repeat(child_starts, child_lens))
    child_values = values[flat_idx]
    child_offsets = np.concatenate([[0], np.cumsum(child_lens)])
    sec_tokens = pa.ListArray.from_arrays(
        pa.array(child_offsets, type=pa.int32()),
        pa.array(child_values, type=pa.int32()))

    take = pa.array(child_parent)
    return pa.table({
        "doc_id": pc.take(batch["doc_id"], take),
        "source": pc.take(batch["source"], take),
        "sec_no": pa.array(child_no.astype(np.int32), type=pa.int32()),
        "sec_tokens": sec_tokens,
        "sec_len": pa.array(child_lens.astype(np.int32), type=pa.int32()),
    })
