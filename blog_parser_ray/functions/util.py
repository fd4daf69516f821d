"""Small shared Dataset utilities."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


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
