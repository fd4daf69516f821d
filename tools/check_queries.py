"""Local mimic of the driver's correctness gate (SURVEY.md §5.6).

Runs every queries()[name](sf_dir) and its oracle_sql()[name] through DuckDB,
comparing row count, column names/types, and an order-insensitive value hash.

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def norm_hash(df: pd.DataFrame):
    """Order-insensitive content digest: sort columns by name, canonicalize
    dtypes, sort rows, hash."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return pd.util.hash_pandas_object(df, index=False).sum()


def check(name: str, fn, sql: str | None, sf_dir: str) -> tuple[bool, str]:
    got = to_pandas(fn(sf_dir))
    if sql is None:
        return True, f"rows-only: {len(got)} rows"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(sql).df()
    if len(got) != len(want):
        return False, f"row count {len(got)} != {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    hg, hw = norm_hash(got), norm_hash(want)
    if hg != hw:
        g = got.reindex(sorted(got.columns), axis=1).sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        w = want.reindex(sorted(want.columns), axis=1).sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
        detail = ""
        for c in diff_cols[:2]:
            neq = g.index[g[c] != w[c]][:3].tolist()
            detail += f" {c}: rows {neq} got={g[c].iloc[neq].tolist() if neq else '?'} want={w[c].iloc[neq].tolist() if neq else '?'}"
        return False, f"value hash mismatch in cols {diff_cols};{detail}"
    return True, f"{len(got)} rows match"


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(qs)

    failures = 0
    for name in names:
        try:
            ok, msg = check(name, qs[name], oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
        failures += (not ok)
    print(f"\n{len(names) - failures}/{len(names)} passed")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
