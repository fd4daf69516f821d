"""Text-analysis operators over the ``documents`` table (task extension set):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All vectorized per Arrow batch; no per-row Python in hot
paths except where a row's variable-length structure requires numpy segment
ops (offsets/cumsum patterns, same as stages/parse.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_hash_strings

STOPWORDS = ("the", "a")  # the articles present in the driver corpus vocab


def _split_words(text_col) -> pa.ListArray:
    words = pc.split_pattern(text_col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count: count(' ') + 1 (matches the SQL formula)."""
    n = pc.add(pc.count_substring(batch[text_col], " "), 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pc.cast(n, pa.int32()),
    })


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / word-length / stopword-ratio quality features + a scalar score.

    score = n_words/(n_words+50) * (1 - stop_ratio/2)  — bounded (0,1),
    SQL-reproducible (see pipelines/queries.py quality_score oracle).
    """
    words = _split_words(batch[text_col])
    n_words = pc.list_value_length(words).to_numpy().astype(np.float64)
    n_chars = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False
                                                       ).astype(np.float64)
    flat = words.flatten()
    offsets = words.offsets.to_numpy()
    stop_mask = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))
                         ).to_numpy(zero_copy_only=False)
    cs = np.concatenate([[0], np.cumsum(stop_mask, dtype=np.int64)])
    n_stop = (cs[offsets[1:]] - cs[offsets[:-1]]).astype(np.float64)

    avg_word_len = (n_chars - (n_words - 1)) / np.maximum(n_words, 1)
    stop_ratio = n_stop / np.maximum(n_words, 1)
    score = n_words / (n_words + 50.0) * (1.0 - stop_ratio / 2.0)

    def r4(x):
        # floor(x*1e4+0.5)/1e4: identical IEEE ops to the SQL oracle formula
        return pa.array(np.floor(x * 10000.0 + 0.5) / 10000.0,
                        type=pa.float64())

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words.astype(np.int32), type=pa.int32()),
        "avg_word_len": r4(avg_word_len),
        "stop_ratio": r4(stop_ratio),
        "quality": r4(score),
    })


# --- language ID (heuristic; rows-only oracle) ------------------------------
# character-frequency profiles for a handful of languages; deterministic and
# dependency-free. Real pipelines would swap in fastText here (actor-pool
# stage, model loaded once per actor) — the plumbing is identical.
_PROFILES: dict[str, str] = {
    "en": "etaoinshrdl",
    "fr": "esaitnrulod",
    "es": "eaosrnidltc",
    "de": "enisratdhul",
    "zh": "",  # non-ascii dominant
}


class LangId:
    """Actor-pool stage: profile matrix built once per actor in __init__;
    ``__call__`` is fully vectorized — one per-row byte histogram built with
    a single ``np.bincount`` over the batch's flat UTF-8 buffer (zero-copy
    from Arrow), then one (rows × 128) @ (128 × langs) matmul. No per-row
    Python. Ties break to the lexicographically smallest language (profile
    columns are in sorted-lang order; argmax returns the first maximum)."""

    def __init__(self) -> None:
        self.langs = sorted(lang for lang in _PROFILES if lang != "zh")
        W = np.zeros((128, len(self.langs)), dtype=np.float64)
        for j, lang in enumerate(self.langs):
            chars = _PROFILES[lang]
            for rank, ch in enumerate(chars):
                W[ord(ch), j] = len(chars) - rank
            s = W[:, j].sum()
            W[:, j] /= s or 1.0
        self.W = W
        self.lang_arr = np.array(self.langs + ["zh"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        if text.null_count != 0:
            raise ValueError(
                f"lang_id expects non-null text ({text.null_count} nulls in "
                "batch) — fill or filter nulls upstream")
        # a 0-row (or all-empty-string) array can carry None buffers —
        # np.frombuffer(None) would raise TypeError. All-empty rows score
        # ascii_ratio 0 → "zh", identical to the vectorized path's result
        # for an empty string inside a normal batch.
        if n == 0 or text.buffers()[1] is None or text.buffers()[2] is None:
            return pa.table({
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(["zh"] * n, type=pa.string()),
            })
        # Arrow strings ARE utf-8: read the offsets + data buffers directly
        off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
        off0 = text.offset  # sliced arrays start mid-buffer
        offsets = np.frombuffer(text.buffers()[1], dtype=off_dtype,
                                count=n + 1 + off0)[off0:].astype(np.int64)
        data = np.frombuffer(text.buffers()[2], dtype=np.uint8,
                             count=int(offsets[-1]))
        lo = offsets[0]
        flat = data[lo:offsets[-1]]
        lengths = (offsets[1:] - offsets[:-1])
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)

        clipped = np.minimum(flat, 127)
        hist = np.bincount(row_idx * 128 + clipped,
                           minlength=n * 128).reshape(n, 128).astype(np.float64)
        n_ascii = hist.sum(axis=1) - np.bincount(
            row_idx, weights=(flat >= 128).astype(np.float64), minlength=n)
        totals = np.maximum(lengths.astype(np.float64), 1.0)
        ascii_ratio = n_ascii / totals
        hist /= np.maximum(hist.sum(axis=1, keepdims=True), 1.0)

        # round before argmax: scores equal up to summation-order ulps are
        # TIES and must break to the first (lexicographically smallest) lang
        # identically on every BLAS kernel / batch split
        scores = np.round(hist @ self.W, 12)
        pick = scores.argmax(axis=1)
        pick = np.where(ascii_ratio < 0.6, len(self.langs), pick)
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(self.lang_arr[pick], type=pa.string()),
        })


_LANGID_SINGLETON: list = []


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Task-pool form of ``LangId`` with a per-process cached profile matrix
    — the state is microseconds to build, so a task pool with a process
    cache beats an actor pool's per-execution ramp-up (~1.5 s on this
    host). Keep the actor-pool class for real model-backed language ID."""
    if not _LANGID_SINGLETON:
        _LANGID_SINGLETON.append(LangId())
    return _LANGID_SINGLETON[0](batch)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Order-sensitive 64-bit document fingerprint (rolling-hash style):
    fp = XOR_i mix(word_hash_i + golden*i)  — vectorized over the flattened
    word buffer; deterministic across processes (stable hash)."""
    words = _split_words(batch[text_col])
    # rebase: a sliced ListArray's offsets are ABSOLUTE into the parent
    # values buffer while flatten() returns only the slice's values
    offsets = words.offsets.to_numpy().astype(np.int64)
    lo = offsets[0]
    rel = offsets - lo
    flat = words.flatten()
    wh = stable_hash_strings(flat)
    pos = (np.arange(len(wh), dtype=np.uint64)
           - np.repeat(rel[:-1].astype(np.uint64),
                       (rel[1:] - rel[:-1])))
    with np.errstate(over="ignore"):
        mixed = (wh + pos * np.uint64(0x9E3779B97F4A7C15))
        mixed = (mixed ^ (mixed >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    # segmented XOR via reduce on cumulative trick: xor has no cumsum; use
    # np.bitwise_xor.reduceat guarded for empty rows
    nonempty = rel[1:] > rel[:-1]
    fp = np.zeros(batch.num_rows, dtype=np.uint64)
    if mixed.size:
        red = np.bitwise_xor.reduceat(mixed, rel[:-1][nonempty])
        fp[nonempty] = red
    # hex rendering without per-row Python: hexlify the big-endian byte view
    # once, then build the StringArray straight from (uniform 16-char
    # offsets, hex buffer) — identical output to format(x, "016x")
    import binascii

    n = batch.num_rows
    if n * 16 >= 2 ** 31:  # int32 offsets would wrap (assert would be
        raise ValueError(   # stripped under python -O)
            f"fingerprint batch of {n} rows overflows int32 string "
            "offsets; reduce batch_size")
    hex_data = binascii.hexlify(fp.astype(">u8").tobytes())
    off = (np.arange(n + 1, dtype=np.int32) * 16).tobytes()
    hex_arr = pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(off), pa.py_buffer(hex_data)])
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": hex_arr,
    })


def _rel_offsets(words: pa.ListArray) -> np.ndarray:
    """Slice-rebased offsets (a sliced ListArray's offsets are ABSOLUTE
    into the parent values buffer while flatten() returns only the
    slice's values — same gotcha as fingerprint_batch)."""
    off = words.offsets.to_numpy().astype(np.int64)
    return off - off[0]


def ngram_strings(words: pa.ListArray, n: int = 3):
    """Word n-gram strings per document, fully vectorized: valid start
    positions are computed from the list offsets (no gram ever spans two
    documents), the gram text is one ``binary_join_element_wise`` over n
    shifted takes of the flattened word buffer.

    Returns ``(grams: pa.StringArray, doc_idx: np.ndarray, g_counts)``
    where ``doc_idx[i]`` is the batch-row index that gram ``i`` belongs to
    and ``g_counts[d] = max(n_words_d - n + 1, 0)``."""
    rel = _rel_offsets(words)
    counts = rel[1:] - rel[:-1]
    g_counts = np.maximum(counts - (n - 1), 0)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), g_counts)
    base = np.repeat(rel[:-1], g_counts)
    within = (np.arange(doc_idx.size, dtype=np.int64)
              - np.repeat(np.cumsum(g_counts) - g_counts, g_counts))
    starts = base + within
    flat = words.flatten()
    parts = [flat.take(pa.array(starts + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return grams, doc_idx, g_counts


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Within-document repetition features: distinct-word ratio (the
    classic boilerplate / keyword-stuffing quality signal). Exact distinct
    count via Arrow dictionary codes (collision-free, unlike hashing) +
    one lexsort over the flattened word buffer — O(words log words) per
    batch, no per-row Python."""
    words = _split_words(batch[text_col])
    rel = _rel_offsets(words)
    counts = rel[1:] - rel[:-1]
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    enc = words.flatten().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_distinct = np.zeros(batch.num_rows, dtype=np.int64)
    if codes.size:
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        first = np.empty(len(d), dtype=bool)
        first[0] = True
        first[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        n_distinct = np.bincount(d[first], minlength=batch.num_rows)
    ratio = np.floor(n_distinct / np.maximum(counts, 1) * 10000.0 + 0.5
                     ) / 10000.0
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(counts, type=pa.int64()),
        "n_distinct": pa.array(n_distinct.astype(np.int64),
                               type=pa.int64()),
        "distinct_ratio": pa.array(ratio, type=pa.float64()),
    })


def redact_batch(batch: pa.Table, pattern: str, replacement: str,
                 text_col: str = "text") -> pa.Table:
    """PII-style regex scrub: count + replace every match of ``pattern``.
    Arrow's regex engine is RE2 — the same engine DuckDB uses — so
    ``count_substring_regex`` / ``replace_substring_regex`` match
    ``regexp_extract_all`` / ``regexp_replace(..., 'g')`` byte-for-byte.
    (On this synthetic corpus the pattern targets term words; on a real
    corpus the identical kernel scrubs email/phone/SSN shapes.)"""
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_redacted": pc.cast(
            pc.count_substring_regex(batch[text_col], pattern), pa.int64()),
        "text_redacted": pc.replace_substring_regex(
            batch[text_col], pattern, replacement),
    })


def chunk_batch(batch: pa.Table, size: int = 32, stride: int = 24,
                text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Split documents into overlapping fixed-size word chunks (training
    prep: context windows with overlap = size - stride). Fully
    vectorized: chunk start positions come from the list offsets, the
    chunk text is ONE ``pc.binary_join`` over a re-gathered ListArray —
    no per-row Python. Chunks never cross documents. Row explosion is
    ~n_words/stride per doc; a pure map, no shuffle."""
    words = _split_words(batch[text_col])
    rel = _rel_offsets(words)
    counts = rel[1:] - rel[:-1]
    flat = words.flatten()

    n_chunks = np.maximum((counts + stride - 1) // stride, 1)
    # a chunk starts at every stride-th word while start < n_words
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
    within = (np.arange(doc_idx.size, dtype=np.int64)
              - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
    starts = within * stride
    lens = np.minimum(counts[doc_idx] - starts, size)

    # gather absolute word indices chunk by chunk
    total = int(lens.sum())
    gidx = (np.repeat(rel[:-1][doc_idx] + starts, lens)
            + (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens)))
    chunk_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    lst = pa.ListArray.from_arrays(
        pa.array(chunk_offsets, type=pa.int32()),
        flat.take(pa.array(gidx)))
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(doc_idx)),
        "chunk_id": pa.array(within, type=pa.int64()),
        "chunk": pc.binary_join(lst, " "),
        "n_words": pa.array(lens, type=pa.int64()),
    })
