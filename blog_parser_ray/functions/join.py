"""Explicit partitioned hash join (SURVEY.md §2.4 J2 fallback).

``Dataset.join`` (Ray ≥2.46) is the default plan for big⋈big equi-joins; this
module keeps the portable pattern behind one interface for when the native
join is unavailable or mis-plans: add ``bucket = stable_hash(key) % B`` to
both sides, co-group per bucket, and hash-join inside ``map_groups``. Skew:
a hot key lands in one bucket but a bucket is joined with pandas merge
(hash join) — only pathological single-key dominance needs extra salting,
which callers do by range-splitting that key upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..hashing import stable_hash_ints, stable_hash_strings
from .util import arrow_out


def _bucket_col(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    col = batch[key]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        h = stable_hash_ints(col.to_numpy())
    else:
        h = stable_hash_strings(col)
    return batch.append_column(
        "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))


def equi_join(left: rd.Dataset, right: rd.Dataset, *, left_on: str,
              right_on: str, num_partitions: int = 8,
              how: str = "inner",
              broadcast_limit: int = 1_000_000) -> rd.Dataset:
    """Equi-join with plan selection (SURVEY.md §7.4 item 6, one interface):

    1. BROADCAST hash join when the right side is small (≤ broadcast_limit
       rows) AND unique on its key — ships the build side once via ray.put,
       no shuffle of either side; the standard small-dim optimizer rule.
    2. Native ``Dataset.join`` (Ray ≥2.46) — partitioned hash join, both
       sides shuffle once. Pass ``broadcast_limit=0`` to force this plan.
    3. The portable bucketed plan below when the native join is
       unavailable/incompatible.
    """
    if how in ("inner", "left") and broadcast_limit:
        import logging

        try:
            right = right.materialize()  # count + collect read ONE execution
            n_right = right.count()
        except (ray.exceptions.RayTaskError, ray.exceptions.RayError,
                pa.ArrowInvalid, ValueError) as exc:
            # a probe failure must not be silent: genuine execution errors
            # would otherwise resurface later, unmaterialized, inside the
            # native join with a less useful traceback AND a second
            # execution of the right side
            logging.getLogger(__name__).warning(
                "equi_join broadcast probe failed (%s: %s) — falling back "
                "to the shuffle plan", type(exc).__name__, exc)
            n_right = None
        if n_right is not None and n_right <= broadcast_limit:
            from .util import collect_table
            rt = collect_table(right)
            keys = rt[right_on]
            if (keys.null_count == 0
                    and len(pc.unique(keys)) == n_right):
                logging.getLogger(__name__).debug(
                    "equi_join plan: BROADCAST (%d build rows on %s)",
                    n_right, right_on)
                return broadcast_hash_join(left, rt, left_on=left_on,
                                           right_on=right_on, how=how)
            # duplicate or null build keys → shuffle plan (null keys must
            # NOT match; pc.index_in would match null⋈null)
            logging.getLogger(__name__).debug(
                "equi_join plan: SHUFFLE (build side has %s on %s)",
                "null keys" if keys.null_count else "duplicate keys",
                right_on)
    # Ray's native join names outer joins "left_outer"/"right_outer"; keep
    # the pandas-style "left"/"right" at this interface.
    # RIGHT/FULL outer go straight to the bucketed plan: Ray 2.49's native
    # full_outer COALESCES the keys into the left key column (SQL FULL
    # OUTER ON l=r must keep both, with the left key NULL on right-only
    # rows) and its HashShuffleAggregator.finalize can raise
    # KeyError(<right_on>) on real inputs. The bucketed pandas merge
    # preserves both key columns with exact SQL null semantics.
    if how in ("right", "outer"):
        return bucketed_hash_join(left, right, left_on=left_on,
                                  right_on=right_on,
                                  num_buckets=num_partitions * 4, how=how)
    native_how = {"left": "left_outer", "right": "right_outer",
                  "outer": "full_outer"}.get(how, how)
    try:
        return left.join(right, join_type=native_how,
                         num_partitions=num_partitions,
                         on=(left_on,), right_on=(right_on,))
    except (AttributeError, TypeError, ValueError):
        return bucketed_hash_join(left, right, left_on=left_on,
                                  right_on=right_on,
                                  num_buckets=num_partitions * 4, how=how)


def broadcast_hash_join(left: rd.Dataset, right: pa.Table, *, left_on: str,
                        right_on: str, how: str = "inner") -> rd.Dataset:
    """Small-side broadcast hash join: the build table is put in the object
    store ONCE and read zero-copy by every task; each batch does one
    vectorized ``pc.index_in`` + ``pc.take``. Requires the build side unique
    on ``right_on`` (callers verify; ``equi_join`` falls back otherwise).
    ``how='left'`` emits nulls for unmatched rows; ``'inner'`` drops them.
    Null probe keys never match (SQL equi-join semantics — ``pc.index_in``
    alone would match a null probe to a null build key)."""
    ref = ray.put(right)

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        idx = pc.index_in(batch[left_on], value_set=r[right_on])
        idx = pc.if_else(pc.is_valid(batch[left_on]), idx,
                         pa.scalar(None, type=idx.type))
        if how == "inner":
            valid = pc.is_valid(idx)
            batch = batch.filter(valid)
            idx = idx.filter(valid)
        out = batch
        for c in r.column_names:
            if c in batch.column_names:
                continue
            out = out.append_column(c, pc.take(r[c], idx))
        return out

    return left.map_batches(fn, batch_format="pyarrow")


def bucketed_hash_join(left: rd.Dataset, right: rd.Dataset, *,
                       left_on: str, right_on: str,
                       num_buckets: int = 32,
                       how: str = "inner") -> rd.Dataset:
    """Equi-join via explicit hash bucketing + per-bucket pandas merge.

    Both sides are tagged with a side marker and a shared bucket id, unioned
    under ONE padded schema (mixed-schema unions misalign blocks — see
    window.asof_join_keyed), then co-grouped by bucket; each group runs a
    local hash join. One shuffle per side, on the same key.
    """
    l_cols = left.schema().names
    r_cols = right.schema().names
    overlap = (set(l_cols) & set(r_cols)) - {left_on}
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def prep(side: int, key: str, have: list[str]):
        def fn(batch: pa.Table) -> pd.DataFrame:
            batch = _bucket_col(batch, key, num_buckets)
            df = batch.to_pandas()
            for c in all_cols:
                if c not in have:
                    df[c] = np.nan
            df["_side"] = side
            return df[all_cols + ["_bucket", "_side"]]
        return fn

    both = (left.map_batches(prep(0, left_on, l_cols), batch_format="pyarrow")
            .union(right.map_batches(prep(1, right_on, r_cols),
                                     batch_format="pyarrow")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][l_cols]
        rg = g[g["_side"] == 1][r_cols]
        merged = lg.merge(rg, left_on=left_on, right_on=right_on, how=how,
                          suffixes=("", "_r"))
        return merged[all_cols]

    return both.groupby("_bucket").map_groups(arrow_out(per_bucket), batch_format="pandas")


def equi_join_multi(left: rd.Dataset, right: rd.Dataset, *,
                    left_on: list[str], right_on: list[str],
                    num_partitions: int = 8, how: str = "inner",
                    broadcast_limit: int = 1_000_000) -> rd.Dataset:
    """Multi-key equi-join: fuse the key tuple into ONE exact composite
    string column (values joined with a \\x00 separator — collision-free
    for key values without NULs, which covers ints/dates/normal strings)
    on both sides, delegate to ``equi_join``'s plan selection
    (broadcast / native / bucketed), then drop the helper column. SQL
    NULL-key semantics are preserved: a tuple with any null component
    fuses to null, and every underlying plan refuses null⋈null matches.
    The fused column adds one thin string per row — it shuffles in place
    of (not in addition to) a multi-column key exchange."""
    if len(left_on) != len(right_on) or not left_on:
        raise ValueError("left_on/right_on must be equal-length, non-empty")

    def fuse(cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            parts = []
            for c in cols:
                a = batch[c]
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
                parts.append(pc.cast(a, pa.string()))
            fused = (parts[0] if len(parts) == 1 else
                     pc.binary_join_element_wise(
                         *parts, "\x00", null_handling="emit_null"))
            return batch.append_column("_mkey", fused)
        return fn

    lf = left.map_batches(fuse(left_on), batch_format="pyarrow")
    rf = right.map_batches(fuse(right_on), batch_format="pyarrow")
    # the right fused key duplicates the left's after the join — rename so
    # both can be dropped without clobbering real columns
    rf = rf.map_batches(
        lambda b: b.rename_columns(
            [n if n != "_mkey" else "_mkey_r" for n in b.schema.names]),
        batch_format="pyarrow")
    j = equi_join(lf, rf, left_on="_mkey", right_on="_mkey_r",
                  num_partitions=num_partitions, how=how,
                  broadcast_limit=broadcast_limit)
    return j.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("_mkey", "_mkey_r") if c in b.schema.names]),
        batch_format="pyarrow")


def skew_join(left: rd.Dataset, right: rd.Dataset, *, left_on: str,
              right_on: str, num_partitions: int = 8,
              hot_k: int = 32) -> rd.Dataset:
    """Skew-aware INNER equi-join for a hot-key-dominated probe side.

    A partitioned hash join sends every row of a hot key to ONE partition
    — a single key holding 50% of a 100 TB fact table serializes half the
    join on one worker. Plan:

    1. Detect hot LEFT keys with the Misra–Gries sketch
       (functions/sketch.py heavy_hitters — guaranteed superset of keys
       with frequency > n/(hot_k+1); two streaming passes over the thin
       key column, sketch-sized shuffles only).
    2. HOT rows: the right-side rows for ≤ hot_k keys are dim-sized by
       construction — collect once, broadcast via ``ray.put``, and join
       each hot left batch against them with a local vectorized merge
       (duplicate right keys fan out correctly; no shuffle, perfectly
       parallel over left blocks).
    3. COLD rows: normal partitioned plan (``equi_join``) — skew-free by
       construction.
    4. Union (identical column layout on both paths).

    Inner join only: split-path outer semantics (unmatched-row bookkeeping
    across two plans) is not worth the surface until a caller needs it."""
    l_cols = left.schema().names
    r_cols = right.schema().names
    overlap = (set(l_cols) & set(r_cols)) - {left_on}
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    # the right key column duplicates the left's in an inner join AND its
    # survival differs between equi_join's plans — exclude it so both the
    # hot and cold path emit one well-defined layout
    out_cols = l_cols + [c for c in r_cols
                         if c not in l_cols and c != right_on]

    from .sketch_bridge import heavy_keys
    hot = heavy_keys(left, left_on, k=hot_k)
    if len(hot) == 0:
        return equi_join(left, right, left_on=left_on, right_on=right_on,
                         num_partitions=num_partitions, how="inner")
    hot_ref = ray.put(hot)

    def split(keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch[left_on]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            mask = pc.is_in(c, value_set=ray.get(hot_ref))
            return batch.filter(mask if keep_hot else pc.invert(mask))
        return fn

    # right rows for the hot keys: dim-sized by contract — one collect
    from .util import collect_table
    rh = right.map_batches(
        lambda b: b.filter(pc.is_in(
            b[right_on].combine_chunks()
            if isinstance(b[right_on], pa.ChunkedArray) else b[right_on],
            value_set=ray.get(hot_ref))),
        batch_format="pyarrow")
    rh_df = collect_table(rh).to_pandas()
    rh_ref = ray.put(rh_df)

    def hot_merge(batch: pa.Table) -> pd.DataFrame:
        lg = batch.to_pandas()
        merged = lg.merge(ray.get(rh_ref), left_on=left_on,
                          right_on=right_on, how="inner",
                          suffixes=("", "_r"))
        return merged[out_cols]

    hot_out = (left.map_batches(split(True), batch_format="pyarrow")
               .map_batches(arrow_out(hot_merge), batch_format="pyarrow"))
    cold_out = equi_join(
        left.map_batches(split(False), batch_format="pyarrow"),
        right, left_on=left_on, right_on=right_on,
        num_partitions=num_partitions, how="inner").map_batches(
        lambda b: b.select(out_cols), batch_format="pyarrow")
    return hot_out.union(cold_out)
