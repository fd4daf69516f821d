"""Process-stable vectorized hashing (SURVEY.md §2.8 "hash" family).

Python's builtin ``hash()`` is salted per process (PYTHONHASHSEED) and must never
be used for partitioning/salting. We use pandas' SipHash-based ``hash_array``
(fixed default key, deterministic across processes and platforms, C-vectorized)
for strings, and a Fibonacci-style mix for integers.

Used by: salting (SURVEY.md §4.3), dedup partitioning (U4), dim synthesis,
bucketed joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_strings(values, key: str | None = None) -> np.ndarray:
    """uint64 stable hash of a string sequence (pa.Array/ChunkedArray/np/list).

    ``key`` selects an independent SipHash key (16 chars) — two hashes with
    different keys give an effective 128-bit content fingerprint (collision
    probability ~n²/2¹²⁹; negligible at 10¹² rows), used by exact dedup.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        arr = np.asarray(values.to_pylist(), dtype=object)
    else:
        arr = np.asarray(values, dtype=object)
    if key is None:
        return pd.util.hash_array(arr, categorize=True)
    return pd.util.hash_array(arr, categorize=True, hash_key=key)


def stable_hash_ints(values) -> np.ndarray:
    """uint64 stable hash of an int64 array (splitmix64-style mix)."""
    x = np.asarray(values, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def stable_hash_one(value: str) -> int:
    """Scalar convenience (same function as stable_hash_strings)."""
    return int(stable_hash_strings([value])[0])


def hash_token_lists(tokens, seed: int = 0) -> np.ndarray:
    """Order-sensitive uint64 hash per row of a list<int32> column.

    Vectorized over the flat values buffer: mix(value, position) XOR-reduced
    per row, finalized with the row length — one pass, O(rows) output.
    Correct for sliced arrays (absolute offsets) and empty rows.

    ``seed`` derives an independent hash family; two seeds give an effective
    128-bit content fingerprint for exact dedup (collision ~n²/2¹²⁹).
    """
    import pyarrow as pa

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy().astype(np.int64)
    values = tokens.values.to_numpy()
    n = len(offsets) - 1
    lo, hi = offsets[0], offsets[-1]
    lengths = offsets[1:] - offsets[:-1]
    vals = values[lo:hi].astype(np.uint64)
    if seed:
        vals = stable_hash_ints(vals ^ np.uint64(seed))
    pos = (np.arange(hi - lo, dtype=np.uint64)
           - np.repeat((offsets[:-1] - lo).astype(np.uint64), lengths))
    with np.errstate(over="ignore"):
        mixed = stable_hash_ints(vals * np.uint64(0x9E3779B97F4A7C15)
                                 + pos * np.uint64(0xBF58476D1CE4E5B9))
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lengths > 0
    if mixed.size:
        starts = (offsets[:-1] - lo)[nonempty]
        out[nonempty] = np.bitwise_xor.reduceat(mixed, starts)
    return stable_hash_ints(out ^ lengths.astype(np.uint64))


def salt_column(keys, num_salts: int) -> np.ndarray:
    """int32 salt in [0, num_salts) from a string key column (SURVEY.md §4.3)."""
    return (stable_hash_strings(keys) % np.uint64(num_salts)).astype(np.int32)
