"""Bloom-filter semi/anti joins (SURVEY.md §2.4 J3/J4 scale path).

When the key side outgrows an exact broadcast set, ship a Bloom filter
instead: ~10 bits/key at 1% false positives (vs ≥8 bytes/key exact), built
once driver-side or merged from per-block partials (bitwise OR — Bloom
filters are mergeable). Semi-join keeps FP rows (callers needing exactness
run a small exact verify on the survivors); anti-join via a Bloom filter
DROPS false positives, so it is only safe as a pre-filter before an exact
check — ``semi_join_bloom`` is the safe primitive and the one exposed.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..hashing import stable_hash_ints, stable_hash_strings


class BloomFilter:
    """Plain numpy bit-array Bloom filter; vectorized add/contains."""

    def __init__(self, capacity: int, fp_rate: float = 0.01) -> None:
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_bits = 1 << max(6, int(math.ceil(math.log2(m))))
        self.k = max(1, int(round(self.n_bits / max(capacity, 1) * math.log(2))))
        self.k = min(self.k, 8)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _hashes(self, values) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array) and pa.types.is_integer(values.type):
            base = stable_hash_ints(values.to_numpy())
        elif isinstance(values, np.ndarray) and values.dtype.kind in "iu":
            base = stable_hash_ints(values)
        else:
            base = stable_hash_strings(values)
        h2 = (base >> np.uint64(32)) | np.uint64(1)
        idx = np.empty((self.k, len(base)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx[i] = (base + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return idx

    def add(self, values) -> None:
        idx = self._hashes(values).reshape(-1)
        np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))

    def contains(self, values) -> np.ndarray:
        idx = self._hashes(values)
        byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.bits |= other.bits
        return self


def semi_join_bloom(fact: rd.Dataset, keys: rd.Dataset, *, fact_key: str,
                    key_col: str, capacity_hint: int | None = None,
                    fp_rate: float = 0.01,
                    exact_verify: bool = True) -> rd.Dataset:
    """Keep fact rows whose key is (probably) in ``keys`` — without the
    driver ever holding the key SET.

    Build: each key block builds a same-shape partial Bloom filter inside
    ``map_batches``; the driver ORs the fixed-size bitmaps (memory bounded
    by the bitmap, ~10 bits/key at 1% FP, NOT by 8+ bytes/key of exact
    keys). Filter: the merged bitmap broadcasts once; each fact batch does a
    vectorized ``contains``. Verify (default): false positives are removed
    by a partitioned semi-join of the Bloom-shrunk survivors against the
    DISTINCT keys (``equi_join`` plan selection: broadcast if the distinct
    keys are dim-sized, shuffle otherwise) — no driver-side exact key set at
    any stage.
    """
    import pyarrow.compute as pc

    keys = keys.materialize()  # consumed twice: count/build + verify join
    cap = capacity_hint or max(keys.count(), 1)

    def partial_bloom(batch: pa.Table) -> pa.Table:
        pb = BloomFilter(cap, fp_rate)
        pb.add(batch[key_col])
        return pa.table({"bits": pa.array([pb.bits.tobytes()],
                                          type=pa.binary())})

    bf = BloomFilter(cap, fp_rate)
    for b in (keys.map_batches(partial_bloom, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for buf in b["bits"].to_pylist():
            bf.bits |= np.frombuffer(buf, dtype=np.uint8)
    bf_ref = ray.put(bf)

    def bloom_pass(batch: pa.Table) -> pa.Table:
        f = ray.get(bf_ref)
        return batch.filter(pa.array(f.contains(batch[fact_key])))

    out = fact.map_batches(bloom_pass, batch_format="pyarrow")
    if exact_verify:
        from .join import equi_join

        uniq = (keys.map_batches(
            lambda b: pa.table({"_sk": pc.unique(b[key_col])}),
            batch_format="pyarrow")
            .groupby("_sk").count()
            .map_batches(lambda b: b.select(["_sk"]), batch_format="pyarrow"))
        fact_cols = fact.schema().names
        out = equi_join(out, uniq, left_on=fact_key, right_on="_sk",
                        how="inner")
        out = out.map_batches(lambda b: b.select(fact_cols),
                              batch_format="pyarrow")
    return out
