"""ST4 Vocab actor: token-id → string decode for previews (SURVEY.md §2.2 P8,
§2.3). Recasts the reference emitting human-readable extracted text. The
id→token table is built once per actor; per batch the decode is a vectorized
``pc.take`` on the flattened values — no per-token Python."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S


class Vocab:
    """Actor-pool stage: append ``preview`` = first-K decoded tokens."""

    def __init__(self, k: int = 8, inv_vocab: dict[int, str] | None = None):
        inv = inv_vocab or S.INV_VOCAB
        size = max(inv) + 1
        words = np.array([inv.get(i, f"<unk:{i}>") for i in range(size)],
                         dtype=object)
        self.lookup = pa.array(words, type=pa.string())
        self.size = size
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        offsets = tokens.offsets.to_numpy()
        values = tokens.values.to_numpy()
        lengths = offsets[1:] - offsets[:-1]
        take_n = np.minimum(lengths, self.k)
        flat_idx = (np.arange(int(take_n.sum()), dtype=np.int64)
                    - np.repeat(np.concatenate([[0], np.cumsum(take_n)])[:-1],
                                take_n)
                    + np.repeat(offsets[:-1], take_n))
        ids = np.clip(values[flat_idx], 0, self.size - 1)
        unknown = (values[flat_idx] < 0) | (values[flat_idx] >= self.size)
        words = pc.take(self.lookup, pa.array(ids, type=pa.int64()))
        if unknown.any():
            w = words.to_pandas()
            w[unknown] = "<unk>"
            words = pa.array(w, type=pa.string())
        preview_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(take_n)]),
                     type=pa.int32()), words)
        preview = pc.binary_join(preview_list, " ")
        return batch.append_column("preview", preview)
