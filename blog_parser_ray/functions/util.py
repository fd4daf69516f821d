"""Small shared Dataset utilities."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def pd_to_arrow(df) -> pa.Table:
    """pandas UDF output → metadata-free Arrow table.

    Ray stores a pandas return as a pandas block and converts it to Arrow at
    the next shuffle boundary via ``pa.Table.from_pandas(df,
    preserve_index=False)`` (pandas_block.py:384) — WITH ``pandas`` schema
    metadata attached. That metadata holds a dict, which makes
    ``hash(schema)`` raise inside sort-reduce's ``unify_schemas`` fast path
    (the worker-side "Failed to hash the schemas" warnings, r3 verdict #7).
    Doing the identical conversion here and stripping the metadata keeps
    every downstream block Arrow-typed and its schema hashable.
    """
    return pa.Table.from_pandas(
        df, preserve_index=False).replace_schema_metadata(None)


def arrow_out(fn):
    """Wrap a pandas-in / pandas-out group UDF to emit metadata-free Arrow.

    Used at every ``map_groups(..., batch_format="pandas")`` call site so the
    produced blocks are Arrow-typed with hashable schemas (see
    ``pd_to_arrow``) instead of pandas blocks that Ray converts later with
    the unhashable ``pandas`` metadata attached.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(g, *args, **kwargs):
        return pd_to_arrow(fn(g, *args, **kwargs))

    return wrapped


def collect_table(ds: rd.Dataset) -> pa.Table:
    """Concatenate a SMALL Dataset's blocks into one driver-side table.

    Ray emits schema-LESS empty blocks from some operators (the "RefBundle
    with a different schema" warning); ``pa.concat_tables`` raises on them,
    so zero-column stragglers are dropped and, when every block is empty,
    the schema comes from the Dataset. Only for results known to be small
    (winner sets, pair lists, verified outputs) — never the corpus.
    """
    tbls = []
    for r in ds.to_arrow_refs():
        t = ray.get(r)
        if not isinstance(t, pa.Table):
            # to_arrow_refs can surface raw pandas blocks (observed after
            # repartition of a map_groups(batch_format="pandas") pipeline)
            t = pa.Table.from_pandas(t, preserve_index=False)
        tbls.append(t)
    good = [t for t in tbls if t.num_columns > 0]
    if not good:
        s = ds.schema(fetch_if_missing=True)
        if s is None:
            return pa.table({})
        return pa.schema(list(zip(s.names, s.types))).empty_table()
    nonempty = [t for t in good if t.num_rows > 0]
    return pa.concat_tables(nonempty or good[:1],
                            promote_options="default").combine_chunks()
