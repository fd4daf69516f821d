"""Mergeable sketches (SURVEY.md §2.5 A5): HyperLogLog approximate distinct.

The 10¹²-scale path for count-distinct: each block emits ONE fixed-size
register array (2^p bytes); registers merge by elementwise max — associative
and commutative, so the shuffle moves kilobytes regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..hashing import stable_hash_ints, stable_hash_strings


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """HLL registers (size 2^p) from uint64 hashes."""
    m = 1 << p
    buckets = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rho = leading zeros of `rest` + 1, capped at 64-p+1
    lz = np.zeros(len(hashes), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    rho = lz + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, buckets, rho.astype(np.int8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """HLL count-distinct: per-block partial registers → elementwise-max
    merge. The merge input is (blocks × 2^p) bytes — never the data."""

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_integer(c.type):
            h = stable_hash_ints(c.to_numpy())
        else:
            h = stable_hash_strings(c)
        return pa.table({"regs": pa.array([_registers(h, p).tobytes()],
                                          type=pa.binary())})

    merged = np.zeros(1 << p, dtype=np.int8)
    for ref in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        for blob in t["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
    return _estimate(merged)
