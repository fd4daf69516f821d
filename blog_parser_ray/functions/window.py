"""Temporal window operators (SURVEY.md §2.4 J5, §2.9 extensions).

- as-of join: each left row matched to the latest right row with
  right_ts <= left_ts. Physical plans: BROADCAST (right side small → sorted
  array + ``np.searchsorted`` per batch, fully vectorized, no shuffle) and
  KEYED (both sides hash-bucketed into P partitions → ONE
  ``pd.merge_asof(by=key)`` per partition — vectorized across every key in
  the partition).
- session windows / rank-in-group: the same hash-partition pattern. The
  unavoidable cost is one row shuffle on the key; the avoidable cost — a
  Python/pandas invocation per key over ~10⁵ tiny groups — is removed by
  grouping on ``hash(key) % P`` (P ≈ cluster parallelism, default 64) and
  running numpy segment diff/cumsum over ALL keys of a partition at once
  (the offsets pattern stages/parse.py uses). Skewed keys cost one fat
  partition, not a fat group: rows within a partition are processed by
  vectorized kernels, so partition size, not key cardinality, bounds work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.types as pat
import ray
import ray.data as rd

from .util import arrow_out

DEFAULT_PARTITIONS = 64


def _with_pid(ds: rd.Dataset, key: str,
              n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Append ``_pid = stable_hash(key) % n_parts`` (process-stable hash —
    Python's salted hash() must never partition)."""
    from ..hashing import stable_hash_ints, stable_hash_strings

    def add_pid(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pat.is_integer(col.type):
            h = stable_hash_ints(col.to_numpy().astype(np.int64))
        else:
            h = stable_hash_strings(col)
        pid = (h % np.uint64(n_parts)).astype(np.int64)
        return batch.append_column("_pid", pa.array(pid))

    return ds.map_batches(add_pid, batch_format="pyarrow")


def asof_join_broadcast(left: rd.Dataset, right: pa.Table, *,
                        left_ts: str, right_ts: str,
                        right_cols: list[str]) -> rd.Dataset:
    """Broadcast as-of: right table sorted by ts is shipped once via ray.put;
    each batch does one vectorized searchsorted. Rows with no earlier right
    row get nulls (left join semantics).

    Right-side ties on ``right_ts`` must be pre-deduplicated by the caller
    (keep a deterministic winner) or results are tie-ambiguous.
    """
    right = right.sort_by([(right_ts, "ascending")])
    ref = ray.put(right)

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        rts = r[right_ts].to_numpy()
        lts = batch[left_ts].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        valid = idx >= 0
        take = pa.array(np.where(valid, idx, 0), type=pa.int64())
        out = batch
        for col in right_cols:
            vals = r[col].take(take)
            if not valid.all():
                vals = pa.Array.from_pandas(
                    pd.Series(vals.to_pandas()).where(valid))
                vals = vals.cast(r[col].type)
            out = out.append_column(col, vals)
        return out

    return left.map_batches(fn, batch_format="pyarrow")


def asof_join_keyed(left: rd.Dataset, right: rd.Dataset, *, key: str,
                    left_ts: str, right_ts: str,
                    direction: str = "backward", strict: bool = False,
                    n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Keyed as-of via hash-bucketed co-grouping, ARROW side-tagged union
    (``direction="backward"`` matches the latest right row at-or-before
    each left ts — SQL ASOF ``l.ts >= r.ts``; ``"forward"`` the earliest
    at-or-after — ``l.ts <= r.ts``; ``strict=True`` excludes equal
    timestamps, SQL ``>`` / ``<``)
    (r3 verdict #3): both sides are padded to ONE explicit Arrow schema
    with typed null columns — no pandas conversion before the shuffle, so
    none of the dtype-promotion drift the former pandas pad/union needed
    hand-rolled renormalization for. Each partition then runs a single
    vectorized ``pd.merge_asof(by=key)`` (all keys of the partition at
    once) and re-emits an explicit Arrow OUT schema, so every partition's
    block is identically typed.

    Contract: the only column name shared between the sides is ``key``
    (``left_ts`` != ``right_ts``); right-side (key, ts) ties must be
    pre-deduplicated by the caller. Output types: left columns keep their
    Arrow types (timestamps normalized to ns — merge_asof demands one
    resolution on the on-keys); right-only columns are nullable by
    left-join semantics — numerics surface as float64 (merge_asof's NaN
    convention, pinned by tests), timestamps as ns."""
    import pyarrow.compute as pc

    l_schema, r_schema = left.schema(), right.schema()
    l_cols, r_cols = l_schema.names, r_schema.names
    lt = dict(zip(l_schema.names, l_schema.types))
    rt = dict(zip(r_schema.names, r_schema.types))
    r_only = [c for c in r_cols if c not in l_cols]
    all_cols = l_cols + r_only

    def _ns(c: str, t: pa.DataType) -> pa.DataType:
        return pa.timestamp("ns") if c in (left_ts, right_ts) else t

    union_schema = pa.schema(
        [(c, _ns(c, lt[c])) for c in l_cols]
        + [(c, _ns(c, rt[c])) for c in r_only] + [("_side", pa.int8())])

    def _out_type(t: pa.DataType) -> pa.DataType:
        if pat.is_timestamp(t):
            return pa.timestamp("ns")
        if pat.is_integer(t) or pat.is_floating(t):
            return pa.float64()
        return t

    out_schema = pa.schema([(c, _ns(c, lt[c])) for c in l_cols]
                           + [(c, _out_type(rt[c])) for c in r_only])

    def pad(side: int):
        have = set(l_cols if side == 0 else r_cols)

        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = []
            for f in union_schema:
                if f.name == "_side":
                    cols.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif f.name in have:
                    cols.append(pc.cast(b[f.name], f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=union_schema)

        return fn

    both = (left.map_batches(pad(0), batch_format="pyarrow")
            .union(right.map_batches(pad(1), batch_format="pyarrow")))

    def _null_fill(t: pa.DataType):
        if pat.is_timestamp(t):
            return pd.NaT
        if pat.is_floating(t):
            return np.nan
        return None

    def per_part(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lg = (df[df["_side"] == 0][l_cols]
              .sort_values(left_ts, kind="mergesort"))
        if lg.empty:
            return out_schema.empty_table()
        rg = (df[df["_side"] == 1][list(r_cols)]
              .sort_values(right_ts, kind="mergesort"))
        if rg.empty:
            merged = lg.copy()
        else:
            merged = pd.merge_asof(lg, rg, left_on=left_ts,
                                   right_on=right_ts, by=key,
                                   direction=direction,
                                   allow_exact_matches=not strict)
        for c in r_only:            # all-empty-right partitions
            if c not in merged.columns:
                merged[c] = _null_fill(out_schema.field(c).type)
        # from_pandas attaches `pandas` schema metadata even with an
        # explicit schema — a dict that makes hash(schema) raise in
        # sort-reduce's unify fast path (the worker-side "Failed to hash
        # the schemas" warnings); strip it at the source
        return pa.Table.from_pandas(
            merged[all_cols], schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    return (_with_pid(both, key, n_parts)
            .groupby("_pid").map_groups(per_part, batch_format="pyarrow"))


def session_windows(events: rd.Dataset, *, key: str = "user_id",
                    ts_col: str = "ts", gap_minutes: int = 30,
                    n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Gap-based sessions per key → (key, sess:int64, cnt:int64).

    sess numbering = 1 + number of gap-breaks before the row within the key,
    matching the SQL ``SUM(brk) OVER (PARTITION BY key ORDER BY ts)`` oracle.
    One shuffle on hash(key) % P; per-partition work is a sort plus numpy
    diff/cumsum over all of the partition's keys at once.
    """
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000_000, "ns")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                                 "sess": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        g = g.sort_values([key, ts_col], kind="mergesort")
        kv = g[key].to_numpy()
        ts = g[ts_col].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = kv[1:] != kv[:-1]
        dt = np.empty(len(g), dtype="timedelta64[ns]")
        dt[0] = np.timedelta64(0, "ns")
        dt[1:] = ts[1:] - ts[:-1]
        brk = new_key | (dt > gap)
        sess_global = np.cumsum(brk)
        # session number restarts at 1 on each key: subtract the running
        # value at the key's first row (carried forward by maximum.accumulate)
        first = np.where(new_key, sess_global, 0)
        first = np.maximum.accumulate(first)
        sess = (sess_global - first + 1).astype(np.int64)
        out = (pd.DataFrame({key: kv, "sess": sess})
               .groupby([key, "sess"], as_index=False, sort=False).size()
               .rename(columns={"size": "cnt"}))
        out["cnt"] = out["cnt"].astype("int64")
        return out

    return (_with_pid(events, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas"))


def latest_per_key(ds: rd.Dataset, *, key: str, order_col: str,
                   tiebreak: str, out_cols: list[str],
                   n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Top-1 per key by (order_col DESC, tiebreak DESC) — rank-in-group with
    a deterministic total order (SURVEY.md §7.4 item 5). One shuffle on
    hash(key) % P; per-partition work is one sort + a shift-compare mask over
    all keys at once (no per-key pandas)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g[out_cols]
        g = g.sort_values([key, order_col, tiebreak],
                          ascending=[True, False, False], kind="mergesort")
        kv = g[key].to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = kv[1:] != kv[:-1]
        return g.loc[first, out_cols]

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas"))


def _segment_sorted(g: pd.DataFrame, key: str, order_cols: list[str],
                    ascending=None):
    """Sort a partition by (key, *order_cols) and return (sorted frame,
    first-row-of-key mask, index-of-key-start per row) — the shared prelude
    of every per-key window kernel. Vectorized over ALL keys at once."""
    cols = [key] + order_cols
    if ascending is None:
        ascending = [True] * len(cols)
    g = g.sort_values(cols, ascending=ascending, kind="mergesort")
    kv = g[key].to_numpy()
    n = len(g)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = kv[1:] != kv[:-1]
    idx = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(first, idx, 0))
    return g, first, start


def rank_in_group(ds: rd.Dataset, *, key: str, order_col: str,
                  tiebreak: str, out_col: str = "rn",
                  n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_col, tiebreak) —
    deterministic total order. One shuffle on hash(key) % P; per-partition
    work is one sort + arange arithmetic over all keys at once."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        idx = np.arange(len(g), dtype=np.int64)
        out = g.copy()
        out[out_col] = idx - start + 1
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def lag_diff_us(ds: rd.Dataset, *, key: str, ts_col: str, tiebreak: str,
                out_col: str = "gap_us", fill: int = -1,
                n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Per key ordered by (ts_col, tiebreak): microseconds since the
    previous row's ts (SQL ``date_diff('microsecond', lag(ts) OVER w, ts)``),
    ``fill`` for each key's first row. Same hash-partition + shift-compare
    pattern as the other window kernels."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        g, first, _ = _segment_sorted(g, key, [ts_col, tiebreak])
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = fill
        gap[1:] = ts[1:] - ts[:-1]
        gap[first] = fill
        out = g.copy()
        out[out_col] = gap
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def running_sum(ds: rd.Dataset, *, key: str, order_col: str, tiebreak: str,
                val_col: str, out_col: str = "cum",
                n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """SUM(val) OVER (PARTITION BY key ORDER BY order_col, tiebreak ROWS
    UNBOUNDED PRECEDING). ``val_col`` should be an INTEGER column (e.g.
    cents) — integer running sums are exactly reproducible against any SQL
    engine, float ones are not. Vectorized: one global cumsum, rebased at
    each key start."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        v = g[val_col].to_numpy().astype(np.int64)
        cs = np.cumsum(v)
        out = g.copy()
        out[out_col] = cs - cs[start] + v[start]
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def moving_sum(ds: rd.Dataset, *, key: str, order_col: str, tiebreak: str,
               val_col: str, preceding: int, sum_col: str = "mov_sum",
               avg_col: str | None = None,
               n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """SUM(val) OVER (PARTITION BY key ORDER BY order_col, tiebreak ROWS
    BETWEEN ``preceding`` PRECEDING AND CURRENT ROW) — the moving-frame
    aggregate (r3 verdict task #2). ``val_col`` should be INTEGER (cents
    discipline). Vectorized over all keys of a partition: one global
    cumsum; each row's frame start is max(key start, row - preceding), so
    frames never cross a key boundary. With ``avg_col`` the windowed AVG is
    emitted as ONE IEEE division of the two exact integers (sum / count) —
    bit-reproducible against any SQL engine computing the same division."""
    if preceding < 0:
        raise ValueError("preceding must be >= 0")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[sum_col] = pd.Series([], dtype="int64")
            if avg_col:
                out[avg_col] = pd.Series([], dtype="float64")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        v = g[val_col].to_numpy().astype(np.int64)
        idx = np.arange(len(g), dtype=np.int64)
        lo = np.maximum(start, idx - preceding)
        cs0 = np.concatenate([[0], np.cumsum(v)])
        win = cs0[idx + 1] - cs0[lo]
        out = g.copy()
        out[sum_col] = win
        if avg_col:
            out[avg_col] = win.astype(np.float64) / (idx - lo + 1)
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def moving_anomaly(ds: rd.Dataset, *, key: str, order_col: str,
                   tiebreak: str, val_col: str, preceding: int,
                   flag_col: str = "anomaly",
                   n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Windowed 2σ anomaly flag in PURE INTEGER arithmetic: over the
    trailing frame (``preceding`` PRECEDING .. CURRENT ROW) of the
    integer ``val_col``, flag rows where (x − μ)² > 4σ² — cross-
    multiplied by n² so no division or float ever appears:

        (n·x − s)² > 4·(n·ss − s²)      (s = Σv, ss = Σv², n = frame size)

    which a SQL oracle reproduces verbatim — windowed variance becomes
    hash-exact instead of float-fragile. int64 headroom: every term is
    ≤ (n·max|v|)², so n·max|v| must stay under ~3·10⁹ (e.g. cents ≤ 10⁷
    with frames up to ~300 rows). Same one-shuffle sort-segment plan as
    moving_sum (frames never cross key boundaries)."""
    if preceding < 0:
        raise ValueError("preceding must be >= 0")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[flag_col] = pd.Series([], dtype="bool")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        v = g[val_col].to_numpy().astype(np.int64)
        idx = np.arange(len(g), dtype=np.int64)
        lo = np.maximum(start, idx - preceding)
        cs = np.concatenate([[0], np.cumsum(v)])
        cs2 = np.concatenate([[0], np.cumsum(v * v)])
        n = idx - lo + 1
        s = cs[idx + 1] - cs[lo]
        ss = cs2[idx + 1] - cs2[lo]
        lhs = (n * v - s) ** 2
        rhs = 4 * (n * ss - s * s)
        out = g.copy()
        out[flag_col] = lhs > rhs
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def running_peak(ds: rd.Dataset, *, key: str, order_col: str,
                 tiebreak: str, val_col: str, peak_col: str = "peak",
                 dd_col: str = "drawdown",
                 n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Running MAX over the unbounded trailing frame plus drawdown
    (peak − current) per key — the cumulative-MAX window next to cumsum.
    ``val_col`` should be integer (cents discipline) so both outputs are
    hash-exact. Same one-shuffle sort-segment plan; the per-key cummax
    is pandas' C groupby kernel."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[peak_col] = pd.Series([], dtype="int64")
            out[dd_col] = pd.Series([], dtype="int64")
            return out
        g, _, _ = _segment_sorted(g, key, [order_col, tiebreak])
        peak = g.groupby(key, sort=False)[val_col].cummax().to_numpy()
        out = g.copy()
        out[peak_col] = peak
        out[dd_col] = peak - g[val_col].to_numpy()
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def adjacent_pair_counts(ds: rd.Dataset, *, key: str,
                         order_cols: list[str], val_col: str,
                         cur_col: str = "cur", nxt_col: str = "nxt",
                         cnt_col: str = "pcnt",
                         n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """PARTIAL counts of adjacent (current, next) value pairs per key
    under the (key, *order_cols) total order — the building block of
    transition matrices (finish with ``groupby([cur, nxt]).sum``). Each
    partition emits at most |distinct values|² count rows. Empty and
    all-singleton partitions emit STRING-TYPED empty frames (a
    null-typed empty block would diverge from the other partitions'
    schemas in the downstream groupby — the r3 verdict #7 hazard
    class)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({cur_col: pd.Series([], dtype="string"),
                              nxt_col: pd.Series([], dtype="string"),
                              cnt_col: pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        g, first, _ = _segment_sorted(g, key, order_cols)
        v = g[val_col].to_numpy()
        same = ~first[1:]                    # next row is the same key
        if not same.any():
            return empty
        pairs = pd.DataFrame({cur_col: v[:-1][same],
                              nxt_col: v[1:][same]})
        out = pairs.value_counts().rename(cnt_col).reset_index()
        return out.astype({cur_col: "string", nxt_col: "string",
                           cnt_col: "int64"})

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part),
                                        batch_format="pandas"))


def _key_sizes(first: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (count of rows in this row's key, 0-based row index within
    the key's last row) from the first-row-of-key mask."""
    n = len(first)
    starts_idx = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts_idx, n])
    cnt = np.repeat(sizes, sizes)
    ends = np.repeat(np.r_[starts_idx[1:], n] - 1, sizes)
    return cnt, ends


def ntile_percent_rank(ds: rd.Dataset, *, key: str, order_col: str,
                       tiebreak: str, n_tiles: int, tile_col: str = "tile",
                       pr_col: str = "pr",
                       n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """NTILE(n) and PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    order_col, tiebreak) in one shuffle. NTILE uses SQL semantics: the
    first (cnt mod n) tiles get ceil(cnt/n) rows. With a deterministic
    total order (tiebreak) rank == row_number, so percent_rank is
    (rn-1)/(cnt-1) — one exact-integer IEEE division, 0.0 for single-row
    keys; rounded to 4 places (same on the oracle side) for hash
    stability."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[tile_col] = pd.Series([], dtype="int64")
            out[pr_col] = pd.Series([], dtype="float64")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        idx = np.arange(len(g), dtype=np.int64)
        j = idx - start                       # 0-based row number in key
        cnt, _ = _key_sizes(first)
        q, r = cnt // n_tiles, cnt % n_tiles  # per-row arrays
        big = (q + 1) * r                     # rows covered by fat tiles
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                j < big, j // np.maximum(q + 1, 1),
                r + np.where(q > 0, (j - big) // np.maximum(q, 1), 0)) + 1
            pr = np.where(cnt > 1, j / np.maximum(cnt - 1, 1), 0.0)
        out = g.copy()
        out[tile_col] = tile.astype(np.int64)
        out[pr_col] = np.floor(pr * 10000 + 0.5) / 10000
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def edge_values(ds: rd.Dataset, *, key: str, order_col: str, tiebreak: str,
                val_col: str, first_col: str = "fv", last_col: str = "lv",
                n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """FIRST_VALUE(val) and LAST_VALUE(val) OVER (PARTITION BY key ORDER BY
    order_col, tiebreak ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING) in one shuffle — the whole-partition frame (SQL's default
    last_value frame ends at CURRENT ROW, which is just the value itself;
    the unbounded frame is the one users mean)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[first_col] = g[val_col]
            out[last_col] = g[val_col]
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        v = g[val_col].to_numpy()
        _, ends = _key_sizes(first)
        out = g.copy()
        out[first_col] = v[start]
        out[last_col] = v[ends]
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def cume_dist(ds: rd.Dataset, *, key: str, order_col: str, tiebreak: str,
              cd_col: str = "cd",
              n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """CUME_DIST() OVER (PARTITION BY key ORDER BY order_col): fraction of
    the key's rows with order value <= this row's — PEER-GROUP aware
    (ties share the distribution value of their group's LAST row), unlike
    percent_rank which needs the deterministic total order. ``tiebreak``
    only fixes the physical layout; the result is tie-invariant. One
    exact-integer IEEE division per row, floor-rounded to 4 places (same
    formula in the oracle)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[cd_col] = pd.Series([], dtype="float64")
            return out
        g, first, start = _segment_sorted(g, key, [order_col, tiebreak])
        n = len(g)
        ov = g[order_col].to_numpy()
        peer_first = first.copy()
        peer_first[1:] |= ov[1:] != ov[:-1]
        pf_idx = np.flatnonzero(peer_first)
        sizes = np.diff(np.r_[pf_idx, n])
        peer_end = np.repeat(np.r_[pf_idx[1:], n] - 1, sizes)
        cnt, _ = _key_sizes(first)
        cd = (peer_end - start + 1) / cnt
        out = g.copy()
        out[cd_col] = np.floor(cd * 10000 + 0.5) / 10000
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def lead_diff_us(ds: rd.Dataset, *, key: str, ts_col: str, tiebreak: str,
                 out_col: str = "next_us", fill: int = -1,
                 n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Per key ordered by (ts_col, tiebreak): microseconds until the NEXT
    row's ts (SQL ``date_diff('microsecond', ts, lead(ts) OVER w)``),
    ``fill`` for each key's last row — the forward twin of ``lag_diff_us``."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        g, first, _ = _segment_sorted(g, key, [ts_col, tiebreak])
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[:-1] = ts[1:] - ts[:-1]
        gap[-1] = fill
        # the last row of each key is the row BEFORE the next key's first
        last = np.empty(len(g), dtype=bool)
        last[:-1] = first[1:]
        last[-1] = True
        gap[last] = fill
        out = g.copy()
        out[out_col] = gap
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def rank_with_ties(ds: rd.Dataset, *, key: str, order_col: str,
                   descending: bool = False, rank_col: str = "rnk",
                   dense_col: str = "drnk",
                   n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """RANK() and DENSE_RANK() OVER (PARTITION BY key ORDER BY order_col
    [DESC]) — tie-aware: rows with equal ``order_col`` share a rank; RANK
    then skips (gap semantics), DENSE_RANK does not. ``order_col`` must be
    exactly comparable (integer / cents discipline) or tie groups diverge
    from the SQL oracle. Vectorized: one sort, one value-change mask, two
    accumulates."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[rank_col] = pd.Series([], dtype="int64")
            out[dense_col] = pd.Series([], dtype="int64")
            return out
        g, first, start = _segment_sorted(
            g, key, [order_col], ascending=[True, not descending])
        v = g[order_col].to_numpy()
        n = len(g)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = v[1:] != v[:-1]
        change |= first                       # value runs never cross keys
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(change, idx, 0))
        c = np.cumsum(change)                 # global dense run counter
        out = g.copy()
        out[rank_col] = run_start - start + 1
        out[dense_col] = c - c[start] + 1
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))


def range_window_sum(ds: rd.Dataset, *, key: str, ts_col: str, val_col: str,
                     preceding_us: int, out_col: str = "win_sum",
                     n_parts: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """SUM(val) OVER (PARTITION BY key ORDER BY ts_col RANGE BETWEEN
    <interval> PRECEDING AND CURRENT ROW): the frame is every row of the
    key whose ts lies in ``[ts - preceding_us, ts]`` — PEERS (equal ts)
    are all included per SQL RANGE semantics, so no tiebreak is needed and
    the result is deterministic under ties. ``val_col`` must be INTEGER
    (cents discipline). One sort + per-key-segment searchsorted (segments
    per partition ~ keys/n_parts, so the python loop is over segments, not
    rows; inside each segment everything is vectorized)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        g, first, start = _segment_sorted(g, key, [ts_col])
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g[val_col].to_numpy().astype(np.int64)
        cs0 = np.concatenate([[0], np.cumsum(v)])
        n = len(g)
        starts_idx = np.flatnonzero(first)
        bounds = np.r_[starts_idx, n]
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - preceding_us, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        out = g.copy()
        out[out_col] = cs0[hi] - cs0[lo]
        return out

    return (_with_pid(ds, key, n_parts)
            .groupby("_pid").map_groups(arrow_out(per_part), batch_format="pandas")
            .drop_columns(["_pid"]))
