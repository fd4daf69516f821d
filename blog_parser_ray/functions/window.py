"""Temporal window operators (SURVEY.md §2.4 J5, §2.9 extensions).

- as-of join: each left row matched to the latest right row with
  right_ts <= left_ts. Physical plans: BROADCAST (right side small → sorted
  array + ``np.searchsorted`` per batch, fully vectorized, no shuffle) and
  KEYED (both sides bucketed by key → ``pd.merge_asof`` per group).
- session windows: gap-based sessionization per key via
  ``groupby(key).map_groups`` over ts-sorted groups (batch recompute — Ray
  Data has no event-time streaming; ordering assumption: within one group all
  rows are presented together, which groupby guarantees).
- rank-in-group (latest-N-per-key): ``map_groups`` with a total-order sort —
  deterministic ties via the id column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


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
                    left_ts: str, right_ts: str) -> rd.Dataset:
    """Keyed as-of via co-grouping: tag sides, pad both to ONE explicit
    schema (a union of mismatched block schemas silently misaligns columns),
    union, groupby(key), merge_asof per group. Both sides shuffle once on
    ``key``; salt hot keys by range-splitting the time axis if needed."""
    l_cols = left.schema().names
    r_cols = right.schema().names
    r_only = [c for c in r_cols if c not in l_cols]
    all_cols = l_cols + r_only

    def pad(side: int, have: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in all_cols:
                if c not in have:
                    df[c] = pd.NaT if c in (left_ts, right_ts) else np.nan
            df["_side"] = side
            return df[all_cols + ["_side"]]
        return fn

    both = (left.map_batches(pad(0, l_cols), batch_format="pandas")
            .union(right.map_batches(pad(1, r_cols), batch_format="pandas")))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][l_cols].sort_values(left_ts)
        rg = g[g["_side"] == 1][[c for c in r_cols]].sort_values(right_ts)
        if lg.empty:
            return pd.DataFrame(columns=all_cols)
        rg = rg.drop(columns=[c for c in (key,) if c in rg.columns])
        merged = pd.merge_asof(lg, rg, left_on=left_ts, right_on=right_ts)
        return merged[all_cols]

    return both.groupby(key).map_groups(per_key, batch_format="pandas")


def session_windows(events: rd.Dataset, *, key: str = "user_id",
                    ts_col: str = "ts", gap_minutes: int = 30) -> rd.Dataset:
    """Gap-based sessions per key → (key, sess:int64, cnt:int64).

    sess numbering = 1 + number of gap-breaks before the row, matching the
    SQL ``SUM(brk) OVER (PARTITION BY key ORDER BY ts)`` oracle.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        brk = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sess = brk.cumsum().astype("int64")
        out = (pd.DataFrame({key: g[key], "sess": sess})
               .groupby([key, "sess"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        out["cnt"] = out["cnt"].astype("int64")
        return out

    return events.groupby(key).map_groups(per_user, batch_format="pandas")


def latest_per_key(ds: rd.Dataset, *, key: str, order_col: str,
                   tiebreak: str, out_cols: list[str]) -> rd.Dataset:
    """Top-1 per key by (order_col DESC, tiebreak DESC) — rank-in-group with a
    deterministic total order (SURVEY.md §7.4 item 5)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tiebreak], ascending=[False, False])
        return g.head(1)[out_cols]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
