"""Data-quality validation (expectation checks) over a Dataset: one
streaming pass of per-batch partials per rule + tiny reductions, emitting
one (check_name, ok, observed) row per rule — the Great-Expectations-shaped
capability a production pipeline runs before/after every load.

Rules:
  ("not_null", col)              — observed = null count
  ("range", col, lo, hi)         — observed = rows outside [lo, hi]
                                   (nulls don't count; pair with not_null)
  ("accepted", col, values)      — observed = rows outside the value set
  ("unique", col)                — observed = number of keys with >1 row
                                   (two-phase (key,count) partials → one
                                   thin shuffle; keys only, never rows)
  ("row_count_min", n)           — observed = total rows
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


def _arr(b: pa.Table, col: str):
    a = b[col]
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def validate(ds: rd.Dataset, rules: list[tuple]) -> pa.Table:
    """Run all scalar rules in ONE map_batches pass (per-batch violation
    counts, Sum-reduced), plus one thin key shuffle per `unique` rule.
    Returns (check_name: string, ok: int64, observed: int64) — rule-count
    sized, exact."""
    scalar_rules = [r for r in rules if r[0] != "unique"]
    unique_rules = [r for r in rules if r[0] == "unique"]

    def partial(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for r in scalar_rules:
            kind = r[0]
            if kind == "not_null":
                names.append(f"not_null:{r[1]}")
                vals.append(_arr(b, r[1]).null_count)
            elif kind == "range":
                _, col, lo, hi = r
                a = _arr(b, col)
                bad = pc.and_(pc.is_valid(a), pc.or_(
                    pc.less(a, lo), pc.greater(a, hi)))
                names.append(f"range:{col}")
                vals.append(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
            elif kind == "accepted":
                _, col, values = r
                a = _arr(b, col)
                bad = pc.and_(pc.is_valid(a), pc.invert(
                    pc.is_in(a, value_set=pa.array(list(values)))))
                names.append(f"accepted:{col}")
                vals.append(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
            elif kind == "row_count_min":
                names.append(f"row_count_min:{r[1]}")
                vals.append(b.num_rows)
            else:
                raise ValueError(f"unknown rule {r!r}")
        return pa.table({"check_name": pa.array(names, type=pa.string()),
                         "v": pa.array(vals, type=pa.int64())})

    out_rows: dict[str, int] = {}
    if scalar_rules:
        reduced = (ds.map_batches(partial, batch_format="pyarrow")
                   .groupby("check_name").aggregate(Sum("v", alias_name="v"))
                   .to_pandas())
        if "check_name" in reduced.columns:  # empty input: Ray's
            # to_pandas drops the columns of an empty Dataset
            out_rows.update(zip(reduced["check_name"],
                                reduced["v"].astype(int)))

    for r in unique_rules:
        col = r[1]

        def key_counts(b: pa.Table, col=col) -> pa.Table:
            g = (b.select([col]).group_by([col])
                 .aggregate([([], "count_all")]))
            return g.rename_columns([col, "p"])

        kc = (ds.map_batches(key_counts, batch_format="pyarrow")
              .groupby(col).aggregate(Sum("p", alias_name="cnt")))

        def dups(b: pa.Table) -> pa.Table:
            d = pc.sum(pc.cast(pc.greater(b["cnt"], 1), pa.int64()))
            return pa.table({"d": pa.array([d.as_py() or 0],
                                           type=pa.int64())})

        tot = (kc.map_batches(dups, batch_format="pyarrow")
               .sum("d"))
        out_rows[f"unique:{col}"] = int(tot or 0)

    checks, oks, obs = [], [], []
    for r in rules:
        if r[0] == "row_count_min":
            name, ok = f"row_count_min:{r[1]}", None
        else:
            name = f"{r[0]}:{r[1]}"
        v = int(out_rows.get(name, 0))
        if r[0] == "row_count_min":
            ok = 1 if v >= int(r[1]) else 0
        else:
            ok = 1 if v == 0 else 0
        checks.append(name)
        oks.append(ok)
        obs.append(v)
    return pa.table({"check_name": pa.array(checks, type=pa.string()),
                     "ok": pa.array(oks, type=pa.int64()),
                     "observed": pa.array(obs, type=pa.int64())})
