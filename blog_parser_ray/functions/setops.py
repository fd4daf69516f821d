"""Distributed key set operations (SURVEY.md §2.6 U2/U3 scale path).

INTERSECT / EXCEPT over key columns without driver-side key sets: each side
emits per-block DISTINCT (key, side-presence) partials inside map_batches
(the combiner — shuffle volume is distinct-keys-per-block, not rows), both
sides union under ONE explicit schema (mixed-schema unions misalign columns
by position), and a single groupby(key) reduces presence flags with Max.
The driver never holds a key set; output is a streamed Dataset.

Partitioning assumption: none beyond the one hash shuffle on ``key`` that the
groupby performs. Skewed keys are harmless — each key carries at most two
flag rows per upstream block after the per-block distinct.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max


def _flagged_distinct(ds: rd.Dataset, key: str, in_a: int,
                      in_b: int) -> rd.Dataset:
    """Per-block distinct keys tagged with constant presence flags."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch[key])
        n = len(keys)
        return pa.table({
            "key": keys,
            "in_a": pa.array([in_a] * n, type=pa.int8()),
            "in_b": pa.array([in_b] * n, type=pa.int8()),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def _presence(ds_a: rd.Dataset, ds_b: rd.Dataset, key: str) -> rd.Dataset:
    tagged = (_flagged_distinct(ds_a, key, 1, 0)
              .union(_flagged_distinct(ds_b, key, 0, 1)))
    return tagged.groupby("key").aggregate(
        Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))


def key_intersect(ds_a: rd.Dataset, ds_b: rd.Dataset, key: str,
                  out_name: str | None = None) -> rd.Dataset:
    """Distinct keys present in BOTH datasets (SQL INTERSECT on one column)."""
    out = out_name or key

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.and_(pc.equal(batch["in_a"], 1),
                                    pc.equal(batch["in_b"], 1)))
        return pa.table({out: keep["key"]})

    return _presence(ds_a, ds_b, key).map_batches(finish,
                                                  batch_format="pyarrow")


def key_except(ds_a: rd.Dataset, ds_b: rd.Dataset, key: str,
               out_name: str | None = None) -> rd.Dataset:
    """Distinct keys present in ``ds_a`` but NOT ``ds_b`` (SQL EXCEPT)."""
    out = out_name or key

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.and_(pc.equal(batch["in_a"], 1),
                                    pc.equal(batch["in_b"], 0)))
        return pa.table({out: keep["key"]})

    return _presence(ds_a, ds_b, key).map_batches(finish,
                                                  batch_format="pyarrow")
