"""Thin bridge: heavy-key detection for the skew-aware join (kept out of
sketch.py so join.py's import graph stays acyclic — sketch.py imports
nothing from join)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def heavy_keys(ds: rd.Dataset, col: str, k: int = 32) -> pa.Array:
    """A guaranteed SUPERSET (≤ 2(k+1) values) of the keys with
    frequency > n/(k+1), as an Arrow array in the column's ORIGINAL
    type — sketch-only mode: hot-key detection needs membership, not
    exact counts, so the exact second pass is skipped (one corpus pass
    saved; a few false-positive "hot" keys only broadcast a few extra
    dim rows). Built on functions/sketch.py heavy_hitters'
    margin-pruned candidate reduction. Non-string keys round-trip through
    a string cast (heavy_hitters' total-row sentinel lives in the string
    domain); int↔string casting is exact, and the ≤ k hot values cast
    back losslessly."""
    import pyarrow.compute as pc

    from .sketch import heavy_hitters

    orig_type = dict(zip(ds.schema().names, ds.schema().types))[col]

    def as_str(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return pa.table({col: pc.cast(c, pa.string())})

    out = heavy_hitters(ds.map_batches(as_str, batch_format="pyarrow"),
                        col, k=k, exact=False).to_pandas()
    # Ray quirk: to_pandas() on an EMPTY Dataset drops the columns
    vals = out[col].tolist() if col in out.columns else []
    return pc.cast(pa.array(vals, type=pa.string()), orig_type)
