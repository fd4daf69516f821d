"""Direct property tests for the extended-session public kernels
(running_peak, moving_anomaly, adjacent_pair_counts, bucket_pair_expand,
bfs_levels) against independent pure-Python references on seeded random
inputs — independent of the DuckDB oracles that cover them on the real
tables."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _orders_like(n: int, n_keys: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), type=pa.int64()),
        "o": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        "tb": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(-1000, 100000, n), type=pa.int64()),
    })


def test_running_peak_matches_pandas_expanding_max():
    from blog_parser_ray.functions.window import running_peak

    t = _orders_like(800, 13, 5)
    got = (running_peak(rd.from_arrow(t), key="k", order_col="o",
                        tiebreak="tb", val_col="v")
           .to_pandas().sort_values("tb").reset_index(drop=True))
    df = t.to_pandas().sort_values(["k", "o", "tb"])
    df["peak"] = df.groupby("k")["v"].cummax()
    df["drawdown"] = df["peak"] - df["v"]
    exp = df.sort_values("tb").reset_index(drop=True)
    assert (got["peak"].to_numpy() == exp["peak"].to_numpy()).all()
    assert (got["drawdown"].to_numpy() == exp["drawdown"].to_numpy()).all()


def test_moving_anomaly_matches_exact_rational_reference():
    """The integer inequality (n·x−s)² > 4(n·ss−s²) must equal the
    EXACT rational test (x−μ)² > 4σ² computed with Fractions."""
    from blog_parser_ray.functions.window import moving_anomaly

    t = _orders_like(400, 7, 11)
    got = (moving_anomaly(rd.from_arrow(t), key="k", order_col="o",
                          tiebreak="tb", val_col="v", preceding=4)
           .to_pandas().sort_values("tb").reset_index(drop=True))
    df = t.to_pandas().sort_values(["k", "o", "tb"]).reset_index(drop=True)
    flags = {}
    for _, g in df.groupby("k"):
        vals = g["v"].tolist()
        for i, (tb, x) in enumerate(zip(g["tb"], vals)):
            win = vals[max(0, i - 4): i + 1]
            n = len(win)
            mu = Fraction(sum(win), n)
            var = sum((Fraction(w) - mu) ** 2 for w in win) / n
            flags[tb] = (Fraction(x) - mu) ** 2 > 4 * var
    assert all(bool(r.anomaly) == flags[r.tb]
               for r in got.itertuples(index=False))


def test_adjacent_pair_counts_matches_naive():
    from blog_parser_ray.functions.window import adjacent_pair_counts

    rng = np.random.default_rng(3)
    n = 600
    t = pa.table({
        "k": pa.array(rng.integers(0, 20, n), type=pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array([f"t{int(x)}" for x in rng.integers(0, 5, n)],
                      type=pa.string()),
    })
    partials = adjacent_pair_counts(rd.from_arrow(t), key="k",
                                    order_cols=["o"], val_col="v")
    got = (partials.groupby(["cur", "nxt"]).sum("pcnt").to_pandas()
           .set_index(["cur", "nxt"])["sum(pcnt)"].to_dict())
    exp: dict = {}
    df = t.to_pandas().sort_values(["k", "o"])
    for _, g in df.groupby("k"):
        vs = g["v"].tolist()
        for a, b in zip(vs[:-1], vs[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp


def test_bucket_pair_expand_complete_and_unique():
    """Every unordered id pair sharing >=1 key appears EXACTLY once."""
    from blog_parser_ray.functions.dedup import bucket_pair_expand

    rng = np.random.default_rng(9)
    n = 500
    t = pa.table({
        "key": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "id": pa.array(rng.integers(0, 60, n), type=pa.int64()),
    })
    got = bucket_pair_expand(rd.from_arrow(t), key_col="key",
                             id_col="id").to_pandas()
    got_pairs = sorted(map(tuple, got[["a", "b"]].to_numpy()))
    assert len(got_pairs) == len(set(got_pairs))   # globally unique
    buckets: dict = {}
    for k, i in zip(t["key"].to_pylist(), t["id"].to_pylist()):
        buckets.setdefault(k, set()).add(i)
    exp = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                exp.add((ids[x], ids[y]))
    assert set(got_pairs) == exp


def test_bucket_pair_expand_pair_filter_keep_if_any_collision():
    """pair_filter prunes per COLLISION; a pair colliding in several
    buckets must survive if ANY collision passes (the dedup unions
    bucket outputs) — the contract the PPJoin filter's completeness
    proof relies on."""
    from blog_parser_ray.functions.dedup import bucket_pair_expand

    # ids 1,2 share keys 10 (aux pos 5 → filtered) and 11 (pos 0 → kept);
    # ids 3,4 share only key 12 at pos 5 → fully filtered out
    t = pa.table({
        "key": pa.array([10, 10, 11, 11, 12, 12], type=pa.int64()),
        "id": pa.array([1, 2, 1, 2, 3, 4], type=pa.int64()),
        "pos": pa.array([5, 5, 0, 0, 5, 5], type=pa.int64()),
    })

    def keep_pos0(seg, ai, bj):
        return (seg["pos"][ai] == 0) & (seg["pos"][bj] == 0)

    got = bucket_pair_expand(rd.from_arrow(t), key_col="key", id_col="id",
                             aux_cols=["pos"],
                             pair_filter=keep_pos0).to_pandas()
    assert sorted(map(tuple, got[["a", "b"]].to_numpy())) == [(1, 2)]
    # no filter → both pairs, each exactly once
    got2 = bucket_pair_expand(rd.from_arrow(t.select(["key", "id"])),
                              key_col="key", id_col="id").to_pandas()
    assert sorted(map(tuple, got2[["a", "b"]].to_numpy())) == [(1, 2),
                                                               (3, 4)]


def test_bfs_levels_matches_python_bfs():
    from collections import deque

    from blog_parser_ray.functions.graph import bfs_levels

    rng = np.random.default_rng(21)
    m = 400
    src = rng.integers(0, 80, m).astype(np.int64) * 10   # multiples of 10
    dst = -(rng.integers(0, 50, m).astype(np.int64) + 1)  # negative side
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)}))
    got = {(r.node, r.level) for r in
           bfs_levels(edges, seed_mod=100, iters=3)
           .to_pandas().itertuples(index=False)}
    adj: dict = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    seeds = sorted({int(a) for a in src if a % 100 == 0})
    level = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if level[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in level:
                level[v] = level[u] + 1
                q.append(v)
    assert got == set(level.items())
