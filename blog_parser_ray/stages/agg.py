"""Aggregates A1–A7 and sort/top-k O1–O3 (SURVEY.md §2.5, §2.6, §4.3).

Recasts the reference's index summary over all documents (per-site totals)
as distributed groupby/aggregate/sort. The core scale tool is the
partial+final pattern (A7): every per-key aggregate first combines INSIDE each
Arrow block with ``pa.Table.group_by`` (shrinking data by orders of magnitude
before any exchange), then runs a small final ``Dataset.groupby`` — so the
all-to-all shuffle moves partial rows, not data rows, and source-key skew
(Zipf at scale, SURVEY.md §4.3) cannot concentrate on one reducer.

Salting (``salted_group_count``) is provided for flows where partials cannot
shrink (e.g. per-group map_groups over hot keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .. import schema as S
from ..hashing import salt_column

# ---------------------------------------------------------------------------
# A7: partial+final grouped aggregates
# ---------------------------------------------------------------------------


def _partial_count(keys: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["partial_rows"])
    return fn


def group_count(ds: rd.Dataset, keys: list[str],
                alias: str = "cnt") -> rd.Dataset:
    """groupby(keys).count() via per-block partials then a tiny final groupby.

    The final shuffle sees at most (distinct keys × blocks) partial rows.
    """
    partials = ds.map_batches(_partial_count(keys), batch_format="pyarrow")
    out = partials.groupby(keys).aggregate(Sum("partial_rows", alias_name=alias))
    return out


def group_sum(ds: rd.Dataset, keys: list[str], value_col: str,
              alias: str | None = None) -> rd.Dataset:
    """groupby(keys).sum(value_col) with per-block partial sums."""
    alias = alias or f"sum_{value_col}"

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(keys + [value_col]).group_by(keys)
             .aggregate([(value_col, "sum")]))
        return g.rename_columns(keys + ["partial_sum"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum("partial_sum", alias_name=alias))


def salted_group_count(ds: rd.Dataset, keys: list[str], salt_key: str,
                       num_salts: int = 16, alias: str = "cnt") -> rd.Dataset:
    """Two-stage salted count (SURVEY.md §4.3): stage 1 groups on
    (keys, salt) spreading a hot key over ``num_salts`` reducers, stage 2
    merges salt partials. Use when per-block partials can't shrink."""

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "salt", pa.array(salt_column(batch[salt_key], num_salts)))

    stage1 = (ds.map_batches(add_salt, batch_format="pyarrow")
              .groupby(keys + ["salt"])
              .aggregate(Count(alias_name="partial")))
    return stage1.groupby(keys).aggregate(Sum("partial", alias_name=alias))


# ---------------------------------------------------------------------------
# A2 / A3: flagship per-sink aggregates
# ---------------------------------------------------------------------------


def per_sink_counts_and_hist(routed: rd.Dataset, *, bin_width: int = 64,
                             max_tokens: int = S.MAX_TOKENS
                             ) -> tuple[pa.Table, pa.Table]:
    """A2 + A3 in ONE pass over the routed data.

    Each block emits a union-schema partial table (kind=0 count rows,
    kind=1 histogram rows); the partials are tiny, so the two final groupbys
    run over a driver-side Arrow table without re-reading the input. Returns
    (per_sink_counts, ntok_hist) as small Arrow tables.
    """

    def partial(batch: pa.Table) -> pa.Table:
        sink = (batch["sink"].combine_chunks()
                if isinstance(batch["sink"], pa.ChunkedArray) else batch["sink"])
        c = (batch.select(["sink", "source", "parse_class"])
             .group_by(["sink", "source", "parse_class"])
             .aggregate([([], "count_all")])
             .rename_columns(["sink", "source", "parse_class", "cnt"]))
        if "tok_len" in batch.column_names:
            lengths = batch["tok_len"].to_numpy().astype(np.int64)
        else:
            tokens = batch["tokens"]
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            offs = tokens.offsets.to_numpy()
            lengths = (offs[1:] - offs[:-1]).astype(np.int64)
        # overflow rows land in the TOP bin (max_tokens-1), keeping the
        # bin domain at exactly [0, max_tokens/bin_width) — oracles clamp
        # with the same LEAST(len, max_tokens-1) formula
        bins = np.minimum(lengths, max_tokens - 1) // bin_width
        h = (pa.table({"sink": sink,
                       "bin": pa.array(bins.astype(np.int32), type=pa.int32())})
             .group_by(["sink", "bin"]).aggregate([([], "count_all")])
             .rename_columns(["sink", "bin", "cnt"]))
        return pa.table({
            "kind": pa.array([0] * c.num_rows + [1] * h.num_rows, pa.int8()),
            "sink": pa.concat_arrays([c["sink"].combine_chunks(),
                                      h["sink"].combine_chunks()]),
            "source": pa.concat_arrays(
                [c["source"].combine_chunks(),
                 pa.nulls(h.num_rows, pa.string())]),
            "parse_class": pa.concat_arrays(
                [c["parse_class"].combine_chunks(),
                 pa.nulls(h.num_rows, pa.string())]),
            "bin": pa.concat_arrays([pa.nulls(c.num_rows, pa.int32()),
                                     h["bin"].combine_chunks()]),
            "cnt": pa.concat_arrays([pc.cast(c["cnt"], pa.int64()).combine_chunks(),
                                     pc.cast(h["cnt"], pa.int64()).combine_chunks()]),
        })

    collected = _collect(routed.map_batches(partial, batch_format="pyarrow"))
    if not collected:  # zero-block input: empty tables with the schema
        empty_counts = pa.table({"sink": pa.array([], pa.string()),
                                 "source": pa.array([], pa.string()),
                                 "parse_class": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
        empty_hist = pa.table({"sink": pa.array([], pa.string()),
                               "bin": pa.array([], pa.int32()),
                               "cnt": pa.array([], pa.int64())})
        return empty_counts, empty_hist
    partials = pa.concat_tables(collected)
    counts = (partials.filter(pc.equal(partials["kind"], 0))
              .group_by(["sink", "source", "parse_class"])
              .aggregate([("cnt", "sum")])
              .rename_columns(["sink", "source", "parse_class", "cnt"]))
    hist = (partials.filter(pc.equal(partials["kind"], 1))
            .select(["sink", "bin", "cnt"])
            .group_by(["sink", "bin"]).aggregate([("cnt", "sum")])
            .rename_columns(["sink", "bin", "cnt"]))
    return counts, hist


def _collect(ds: rd.Dataset) -> list[pa.Table]:
    import ray
    return [ray.get(ref) for ref in ds.to_arrow_refs()]


def per_sink_counts(routed: rd.Dataset) -> rd.Dataset:
    """A2 — the flagship correctness target: counts by (sink, source,
    parse_class), skew-safe by construction (partials shrink ~10⁴×)."""
    return group_count(routed, ["sink", "source", "parse_class"], alias="cnt")


def ntok_histogram(routed: rd.Dataset, *, bin_width: int = 64,
                   max_tokens: int = S.MAX_TOKENS,
                   per_sink: bool = True) -> rd.Dataset:
    """A3 — fixed-width histogram of the REAL token count len(tokens).

    Per block: bin = min(len, max_tokens-1) // bin_width (overflow rows in
    the TOP bin — bin domain stays [0, max_tokens/bin_width)), then an
    in-block group count; final groupby sums partials. Output columns:
    (sink?, bin:int32, cnt:int64).
    """
    keys = (["sink"] if per_sink else []) + ["bin"]

    def partial(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        lengths = (tokens.offsets.to_numpy()[1:]
                   - tokens.offsets.to_numpy()[:-1]).astype(np.int64)
        bins = np.minimum(lengths, max_tokens - 1) // bin_width
        t = pa.table({
            **({"sink": batch["sink"].combine_chunks()
                if isinstance(batch["sink"], pa.ChunkedArray)
                else batch["sink"]} if per_sink else {}),
            "bin": pa.array(bins.astype(np.int32), type=pa.int32()),
        })
        g = t.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["partial_rows"])

    partials = routed.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum("partial_rows", alias_name="cnt"))


# ---------------------------------------------------------------------------
# A1 / A4 / A6: global + distinct + grouped numeric
# ---------------------------------------------------------------------------


def global_aggregates(ds: rd.Dataset, value_col: str = "n_tok") -> dict:
    """A1: count / sum / min / max / mean in one aggregate pass."""
    res = ds.aggregate(
        Count(alias_name="rows"),
        Sum(value_col, alias_name="sum"),
        Min(value_col, alias_name="min"),
        Max(value_col, alias_name="max"),
        Mean(value_col, alias_name="mean"),
    )
    return dict(res)


def distinct_count(ds: rd.Dataset, col: str) -> int:
    """A4: exact count-distinct via per-block unique partials then global
    unique — the shuffle only ever sees per-block distinct values."""
    def per_block_unique(batch: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(
            batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray)
            else batch[col])})
    return (ds.map_batches(per_block_unique, batch_format="pyarrow")
            .unique(col).__len__())


def exact_quantiles_bounded(ds: rd.Dataset, col: str, qs: list[float],
                            group_keys: list[str] | None = None):
    """EXACT quantiles for a bounded discrete domain at any scale.

    Per block: a value-count table (domain is small — e.g. token lengths
    ≤ 4096, quantities ≤ 50); merge counts; read quantiles off the CDF.
    Matches DuckDB ``quantile_disc``: sorted[floor((n-1)*q)], and like it
    IGNORES null values. The shuffle moves only (distinct values × blocks)
    count rows — never data.

    Returns ``{q: value}``, or ``{group_tuple: {q: value}}`` when
    ``group_keys`` is given (the single generalized implementation — grouped
    callers must not re-derive the CDF read). Raises ValueError when the
    (global) input has no non-null values.
    """
    keys = list(group_keys or [])

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(keys + [col]).group_by(keys + [col])
             .aggregate([([], "count_all")])
             .rename_columns(keys + [col, "partial_rows"]))
        return g

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys + [col])
              .aggregate(Sum("partial_rows", alias_name="cnt"))
              .to_pandas())
    counts = counts[counts[col].notna()].sort_values(keys + [col])

    def read_cdf(g):
        values = g[col].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        return {q: float(values[np.searchsorted(
            cum, int(np.floor((n - 1) * q)) + 1)]) for q in qs}

    if not keys:
        if counts.empty:
            raise ValueError(f"exact_quantiles_bounded: no non-null "
                             f"values in {col!r}")
        return read_cdf(counts)
    return {(k if isinstance(k, tuple) else (k,)): read_cdf(g)
            for k, g in counts.groupby(keys)}


def exact_quantile_cont_parts(ds: rd.Dataset, col: str,
                              qs: list[float]) -> pa.Table:
    """Interpolated-quantile (SQL ``quantile_cont``) DECOMPOSED into its
    exact parts: for each q, the two bounding domain values at integer
    ranks ``floor((n-1)q)`` / ``ceil((n-1)q)`` plus the interpolation
    fraction as a rounded integer. Emitting (v_lo, v_hi, frac_e6) instead
    of the interpolated float keeps the oracle comparison EXACT — the only
    float ops ((n-1)·q, frac·1e6 rounding) are the identical IEEE
    expressions the SQL side runs, with no engine-private interpolation
    formula in between. Same count-CDF plan as ``exact_quantiles_bounded``
    (bounded discrete domain; shuffle moves value-count rows only)."""

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select([col]).group_by([col])
                .aggregate([([], "count_all")])
                .rename_columns([col, "partial_rows"]))

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(col)
              .aggregate(Sum("partial_rows", alias_name="cnt"))
              .to_pandas())
    counts = counts[counts[col].notna()].sort_values(col)
    if counts.empty:
        raise ValueError(f"exact_quantile_cont_parts: no non-null "
                         f"values in {col!r}")
    values = counts[col].to_numpy()
    cum = counts["cnt"].to_numpy().cumsum()
    n = int(cum[-1])

    def at_rank(r: int) -> float:
        return float(values[np.searchsorted(cum, r + 1)])

    rows = []
    for q in qs:
        pos = (n - 1) * q
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - np.floor(pos)
        rows.append((q, at_rank(lo), at_rank(hi),
                     int(np.floor(frac * 1000000 + 0.5))))
    return pa.table({
        "q": pa.array([r[0] for r in rows], type=pa.float64()),
        "v_lo": pa.array([r[1] for r in rows], type=pa.float64()),
        "v_hi": pa.array([r[2] for r in rows], type=pa.float64()),
        "frac_e6": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def distinct_count_by(ds: rd.Dataset, key_cols: list[str],
                      distinct_col: str, alias: str = "n_distinct",
                      n_parts: int = 16) -> rd.Dataset:
    """Exact grouped COUNT(DISTINCT x): per-batch unique
    (keys…, x) tuples (Arrow group_by), ONE pair-hash shuffle partitioned
    by ``hash(x)`` — every copy of a (keys, x) tuple shares the partition,
    so the per-partition drop_duplicates is a GLOBAL dedup — then partial
    counts per key and a tiny final Sum. Shuffle volume = distinct-tuple
    rows, never the input; driver sees only the group-count-sized result.
    (The 100 TB caveat is a single pathologically hot x value; keys are
    free to skew — they ride along, they don't partition.)"""
    import pandas as pd

    from ..functions.util import arrow_out
    from ..hashing import stable_hash_ints, stable_hash_strings

    def pair_partial(b: pa.Table) -> pa.Table:
        sub = b.select(key_cols + [distinct_col])
        if sub[distinct_col].null_count:
            # SQL COUNT(DISTINCT x) ignores null x — and a null would
            # corrupt the int hash below (NaN→int is undefined), so drop
            # explicitly rather than by accident
            sub = sub.filter(pc.is_valid(
                sub[distinct_col].combine_chunks()
                if isinstance(sub[distinct_col], pa.ChunkedArray)
                else sub[distinct_col]))
        g = sub.group_by(key_cols + [distinct_col]).aggregate([])
        c = g[distinct_col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_integer(c.type):
            h = stable_hash_ints(c.to_numpy(zero_copy_only=False))
        else:
            h = stable_hash_strings(pc.cast(c, pa.string()))
        return g.append_column(
            "_pid", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=key_cols + [distinct_col])
        c = d.groupby(key_cols, sort=False).size().reset_index(name="p_cnt")
        c["p_cnt"] = c["p_cnt"].astype(np.int64)
        return c

    return (ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("_pid")
            .map_groups(arrow_out(per_part), batch_format="pandas")
            .groupby(key_cols[0] if len(key_cols) == 1 else key_cols)
            .aggregate(Sum("p_cnt", alias_name=alias)))


# ---------------------------------------------------------------------------
# O1–O3: sort / limit / top-k
# ---------------------------------------------------------------------------


def sort_by(ds: rd.Dataset, keys: list[str],
            descending: list[bool] | bool = False) -> rd.Dataset:
    """O1 global sort (all-to-all range shuffle — use on small aggregates,
    or accept the exchange on big data)."""
    return ds.sort(keys, descending=descending)


def top_k(ds: rd.Dataset, key: str, k: int, *,
          tiebreak: str | None = None) -> rd.Dataset:
    """O3 top-k. For small k the per-block heap would avoid a full sort;
    Ray's sort+limit already prunes blocks via limit pushdown, and our inputs
    to top_k are post-aggregation (small), so sort+limit is the right plan.
    A deterministic ``tiebreak`` column makes results oracle-comparable."""
    keys = [key] + ([tiebreak] if tiebreak else [])
    desc = [True] + ([False] if tiebreak else [])
    return ds.sort(keys, descending=desc).limit(k)
