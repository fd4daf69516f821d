"""Tests for J5 as-of joins, W2 sessions, A5 HLL sketch, ST4 vocab decode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from blog_parser_ray import schema as S
from blog_parser_ray.functions.sketch import approx_distinct
from blog_parser_ray.functions.window import (asof_join_broadcast,
                                              asof_join_keyed,
                                              session_windows)
from blog_parser_ray.stages.vocab import Vocab
from blog_parser_ray.synth import tokenize_documents

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_and_merge_invariance():
    n = 20_000
    vals = (np.arange(n) * 7) % 5000  # 5000 distinct
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    for blocks in (1, 8):
        est = approx_distinct(rd.from_arrow(t).repartition(blocks), "v", p=12)
        assert abs(est - 5000) / 5000 < 0.05, est
    # string column path
    ts = pa.table({"s": pa.array([f"u{v}" for v in vals])})
    est = approx_distinct(rd.from_arrow(ts), "s", p=12)
    assert abs(est - 5000) / 5000 < 0.05, est


def test_asof_broadcast_matches_pandas():
    rng = np.random.default_rng(3)
    lts = np.sort(rng.integers(0, 10_000, 500))
    rts = np.sort(rng.choice(10_000, 80, replace=False))
    left = pa.table({"lid": pa.array(range(500), type=pa.int64()),
                     "t": pa.array(lts, type=pa.int64())})
    right = pa.table({"t_r": pa.array(rts, type=pa.int64()),
                      "rid": pa.array(range(80), type=pa.int64())})
    out = asof_join_broadcast(rd.from_arrow(left).repartition(4), right,
                              left_ts="t", right_ts="t_r",
                              right_cols=["rid"]).to_pandas()
    expect = pd.merge_asof(left.to_pandas(), right.to_pandas(),
                           left_on="t", right_on="t_r")
    out = out.sort_values("lid").reset_index(drop=True)
    expect = expect.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(out["rid"].astype("float64"),
                                   expect["rid"].astype("float64"),
                                   check_names=False)


def test_asof_keyed_matches_broadcast_per_key():
    ev = rd.read_parquet(f"{SF}/events.parquet").select_columns(
        ["event_id", "user_id", "ts"])
    # per-user as-of against each user's own earlier events (self-asof on a
    # shifted copy) — checks the keyed plan end-to-end
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderkey", "o_orderdate"])
    orders = orders.rename_columns(["user_id", "o_orderkey", "ots"])
    # dedupe (user, ts) deterministically
    dd = (orders.group_by(["user_id", "ots"])
          .aggregate([("o_orderkey", "max")])
          .rename_columns(["user_id", "ots", "o_orderkey"]))
    keyed = asof_join_keyed(ev, rd.from_arrow(dd), key="user_id",
                            left_ts="ts", right_ts="ots").to_pandas()
    # oracle: pandas per-user merge_asof
    evp = ev.to_pandas()
    ddp = dd.to_pandas().sort_values("ots")
    outs = []
    for uid, g in evp.groupby("user_id"):
        r = ddp[ddp["user_id"] == uid]
        m = pd.merge_asof(g.sort_values("ts"), r[["ots", "o_orderkey"]],
                          left_on="ts", right_on="ots")
        outs.append(m)
    expect = pd.concat(outs).sort_values("event_id").reset_index(drop=True)
    got = keyed.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(expect)
    pd.testing.assert_series_equal(got["o_orderkey"].astype("float64"),
                                   expect["o_orderkey"].astype("float64"),
                                   check_names=False)


def test_session_windows_basic():
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:50",
        "2024-01-01 02:00", "2024-01-01 02:05",
    ])
    t = pa.table({"user_id": pa.array([1] * 5, type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us"))})
    out = (session_windows(rd.from_arrow(t), gap_minutes=30)
           .to_pandas().sort_values("sess").reset_index(drop=True))
    # sessions: [00:00,00:10], [00:50], [02:00,02:05]
    assert out["sess"].tolist() == [1, 2, 3]
    assert out["cnt"].tolist() == [2, 1, 2]


def test_asof_keyed_empty_right_partitions_keep_dtypes():
    """Keys whose hash partition has NO right rows must not flip right-only
    columns to float64/NaN blocks (schema-conflict + silent int promotion)."""
    from blog_parser_ray.functions.window import asof_join_keyed
    n = 40
    lts = pd.to_datetime(["2024-01-01 00:05"] * n)
    left = pa.table({"user_id": pa.array(range(n), type=pa.int64()),
                     "ev": pa.array(range(n), type=pa.int64()),
                     "ts": pa.array(lts, type=pa.timestamp("us"))})
    right = pa.table({"user_id": pa.array([0], type=pa.int64()),
                      "rv": pa.array([7], type=pa.int64()),
                      "ots": pa.array(pd.to_datetime(["2024-01-01 00:00"]),
                                      type=pa.timestamp("us"))})
    out = asof_join_keyed(rd.from_arrow(left), rd.from_arrow(right),
                          key="user_id", left_ts="ts", right_ts="ots",
                          n_parts=8).to_pandas()
    assert len(out) == n
    # left int column survives as int64; right ts column is datetime, not
    # a float64 NaN block from the empty-right partitions
    assert out["ev"].dtype == np.int64
    assert pd.api.types.is_datetime64_any_dtype(out["ots"])
    matched = out[out["user_id"] == 0]
    assert matched["rv"].tolist() == [7.0]
    assert out[out["user_id"] != 0]["rv"].isna().all()


def test_session_windows_partitioning_invariant():
    """Hash-partitioned sessionization must be invariant to the partition
    count and to input block layout (every key lands wholly in one pid)."""
    rng = np.random.default_rng(3)
    n = 4000
    users = rng.integers(0, 300, size=n)
    base = pd.Timestamp("2024-03-01").value
    ts = pd.to_datetime(base + np.sort(rng.integers(0, 3 * 86400,
                                                    size=n)) * 10**9)
    t = pa.table({"user_id": pa.array(users, type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us"))})

    def norm(ds):
        df = ds.to_pandas().sort_values(["user_id", "sess"])
        return list(map(tuple, df.to_numpy()))

    a = norm(session_windows(rd.from_arrow(t), gap_minutes=30, n_parts=3))
    b = norm(session_windows(rd.from_arrow(t).repartition(11),
                             gap_minutes=30, n_parts=64))
    assert a == b

    from blog_parser_ray.functions.window import latest_per_key
    t2 = pa.table({"k": pa.array(users, type=pa.int64()),
                   "v": pa.array(rng.integers(0, 50, n), type=pa.int64()),
                   "id": pa.array(range(n), type=pa.int64())})
    la = (latest_per_key(rd.from_arrow(t2), key="k", order_col="v",
                         tiebreak="id", out_cols=["k", "v", "id"], n_parts=5)
          .to_pandas().sort_values("k").reset_index(drop=True))
    lb = (latest_per_key(rd.from_arrow(t2).repartition(7), key="k",
                         order_col="v", tiebreak="id",
                         out_cols=["k", "v", "id"], n_parts=64)
          .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(la, lb)


def test_vocab_decode_roundtrip():
    docs = pq.read_table(f"{SF}/documents.parquet")
    seq = tokenize_documents(docs)
    v = Vocab(k=6)
    out = v(seq)
    texts = docs["text"].to_pylist()
    for preview, text in zip(out["preview"].to_pylist()[:50], texts[:50]):
        words = ["<bos>"] + text.split()
        assert preview == " ".join(words[:6])


def test_vocab_unknown_tokens():
    t = pa.table({"tokens": pa.array([[0, 999, 1], []], type=S.TOKENS_TYPE)})
    out = Vocab(k=4)(t)
    assert out["preview"].to_pylist() == ["<bos> <unk> <eos>", ""]


def test_window_functions_match_pandas_reference():
    """rank_in_group / lag_diff_us / running_sum vs pandas groupby reference,
    partitioning-invariant (1 vs 8 input blocks)."""
    from blog_parser_ray.functions.window import (lag_diff_us, rank_in_group,
                                                  running_sum)

    rng = np.random.default_rng(9)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(
            pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="us")),
        "v": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
    })
    df = t.to_pandas().sort_values(["k", "ts", "id"], kind="mergesort")
    df["rn_ref"] = df.groupby("k").cumcount() + 1
    ts_us = df["ts"].astype("datetime64[us]").astype("int64")
    df["gap_ref"] = (ts_us - ts_us.groupby(df["k"]).shift(1)).fillna(-1).astype("int64")
    df["cum_ref"] = df.groupby("k")["v"].cumsum()

    for blocks in (1, 8):
        ds = rd.from_arrow(t).repartition(blocks)
        rn = rank_in_group(ds, key="k", order_col="ts", tiebreak="id",
                           out_col="rn").to_pandas().set_index("id")["rn"]
        gap = lag_diff_us(ds, key="k", ts_col="ts", tiebreak="id",
                          out_col="g").to_pandas().set_index("id")["g"]
        cum = running_sum(ds, key="k", order_col="ts", tiebreak="id",
                          val_col="v", out_col="c"
                          ).to_pandas().set_index("id")["c"]
        ref = df.set_index("id")
        assert rn.reindex(ref.index).tolist() == ref["rn_ref"].tolist(), blocks
        assert gap.reindex(ref.index).tolist() == ref["gap_ref"].tolist()
        assert cum.reindex(ref.index).tolist() == ref["cum_ref"].tolist()


def test_window_kernels_tolerate_empty_groups():
    """ADVICE r2: per-partition kernels must return typed empty frames for
    empty groups instead of indexing position 0."""
    from blog_parser_ray.functions.window import latest_per_key

    t = pa.table({"k": pa.array([1], type=pa.int64()),
                  "ts": pa.array(pd.to_datetime(["2024-01-01"])),
                  "id": pa.array([7], type=pa.int64())})
    out = session_windows(rd.from_arrow(t), key="k", ts_col="ts",
                          gap_minutes=30).to_pandas()
    assert out["cnt"].tolist() == [1]
    lp = latest_per_key(rd.from_arrow(t), key="k", order_col="ts",
                        tiebreak="id", out_cols=["k", "id"]).to_pandas()
    assert lp["id"].tolist() == [7]


def test_approx_quantiles_accuracy_and_invariance():
    """Min-k sample quantiles: within rank-error tolerance of the exact
    quantiles, and identical across partitionings (deterministic by key)."""
    from blog_parser_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(17)
    vals = rng.lognormal(3.0, 1.0, size=50_000)
    t = pa.table({"event_id": pa.array(np.arange(50_000), type=pa.int64()),
                  "value": pa.array(vals)})
    est1 = approx_quantiles(rd.from_arrow(t), "value", "event_id", k=8000)
    est8 = approx_quantiles(rd.from_arrow(t).repartition(8), "value",
                            "event_id", k=8000)
    assert est1 == est8                      # partitioning-invariant
    for q, got in est1.items():
        lo, hi = np.quantile(vals, max(q - 0.03, 0)), np.quantile(
            vals, min(q + 0.03, 1))
        assert lo <= got <= hi, (q, got, lo, hi)


def test_approx_quantiles_null_nan_dropped():
    """ADVICE r3: null/NaN values must not enter the min-k sample (they
    previously drew valid tags and np.sort placed NaN at the top, corrupting
    upper quantiles). Dropping them = SQL quantile NULL semantics: the
    estimate over a polluted column equals the estimate over the clean
    subset."""
    from blog_parser_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(23)
    vals = rng.normal(100.0, 10.0, size=20_000)
    clean = pa.table({"event_id": pa.array(np.arange(20_000)),
                      "value": pa.array(vals)})
    polluted_vals = np.concatenate([vals, np.full(5_000, np.nan)])
    mask = np.concatenate([np.ones(20_000, bool), np.zeros(5_000, bool)])
    # half the pollution as genuine NULLs, half as NaN payloads
    nulls = pa.array(np.where(mask, polluted_vals, np.nan),
                     mask=~mask & (np.arange(25_000) % 2 == 0))
    polluted = pa.table({"event_id": pa.array(np.arange(25_000)),
                         "value": nulls})
    est_clean = approx_quantiles(rd.from_arrow(clean), "value", "event_id",
                                 k=4000)
    est_poll = approx_quantiles(rd.from_arrow(polluted), "value", "event_id",
                                k=4000)
    assert est_clean == est_poll
    assert all(np.isfinite(v) for v in est_poll.values())


def test_grouped_corr_exact_on_wrapping_block(tmp_path):
    """ADVICE r3: a single >167k-row block of max-cents prices used to wrap
    the uint64 yy accumulator silently (400k guard was arithmetically
    false). The chunked exact accumulation must match DuckDB bit-for-bit on
    exactly that shape: 300k rows, one parquet file, prices near the 1.05e5
    ceiling."""
    import duckdb

    from blog_parser_ray.pipelines.queries import ORACLE_SQL, QUERIES

    rng = np.random.default_rng(41)
    n = 300_000
    t = pa.table({
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.int64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(90_000.0, 104_949.5, size=n), 2)),
    })
    sf = tmp_path / "sf_corr"
    sf.mkdir()
    pq.write_table(t, sf / "lineitem.parquet")
    got = (QUERIES["grouped_corr"](str(sf)).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = (con.execute(ORACLE_SQL["grouped_corr"]).df()
            .sort_values("l_returnflag").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_window_frame_kernels_small():
    """Moving frame / NTILE / percent_rank / edge values on a hand-checked
    tiny input: frames never cross key boundaries, NTILE gives the first
    cnt%n tiles the extra row, single-row keys get percent_rank 0."""
    from blog_parser_ray.functions.window import (edge_values, moving_sum,
                                                  ntile_percent_rank)

    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 1 + ["c"] * 6),
        "o": pa.array([1, 2, 3, 4, 5] + [1] + [1, 2, 3, 4, 5, 6]),
        "tb": pa.array(list(range(12)), type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50] + [7] + [1, 1, 1, 1, 1, 1],
                      type=pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)

    ms = (moving_sum(ds, key="k", order_col="o", tiebreak="tb", val_col="v",
                     preceding=2, sum_col="ms", avg_col="ma").to_pandas()
          .sort_values(["k", "o"]).reset_index(drop=True))
    assert ms[ms["k"] == "a"]["ms"].tolist() == [10, 30, 60, 90, 120]
    assert ms[ms["k"] == "b"]["ms"].tolist() == [7]       # no cross-key leak
    assert ms[ms["k"] == "a"]["ma"].tolist() == [10.0, 15.0, 20.0, 30.0,
                                                 40.0]

    nt = (ntile_percent_rank(ds, key="k", order_col="o", tiebreak="tb",
                             n_tiles=4).to_pandas()
          .sort_values(["k", "o"]).reset_index(drop=True))
    # cnt=5, n=4: tile sizes 2,1,1,1 ; cnt=6: 2,2,1,1 ; cnt=1: single tile
    assert nt[nt["k"] == "a"]["tile"].tolist() == [1, 1, 2, 3, 4]
    assert nt[nt["k"] == "b"]["tile"].tolist() == [1]
    assert nt[nt["k"] == "c"]["tile"].tolist() == [1, 1, 2, 2, 3, 4]
    assert nt[nt["k"] == "b"]["pr"].tolist() == [0.0]
    assert nt[nt["k"] == "a"]["pr"].tolist() == [0.0, 0.25, 0.5, 0.75, 1.0]

    ev = (edge_values(ds, key="k", order_col="o", tiebreak="tb",
                      val_col="v").to_pandas()
          .sort_values(["k", "o"]).reset_index(drop=True))
    assert ev[ev["k"] == "a"]["fv"].tolist() == [10] * 5
    assert ev[ev["k"] == "a"]["lv"].tolist() == [50] * 5
    assert ev[ev["k"] == "b"]["fv"].tolist() == [7]


def test_rank_with_ties_matches_pandas():
    """RANK/DENSE_RANK tie semantics vs pandas' method='min'/'dense'."""
    from blog_parser_ray.functions.window import rank_with_ties

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),
        "v": rng.integers(0, 12, n).astype(np.int64),  # heavy ties
        "id": np.arange(n, dtype=np.int64),
    })
    out = rank_with_ties(rd.from_pandas(df).repartition(5), key="k",
                         order_col="v", descending=True,
                         n_parts=7).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    want_rnk = ref.groupby("k")["v"].rank(method="min",
                                          ascending=False).astype(np.int64)
    want_drnk = ref.groupby("k")["v"].rank(method="dense",
                                           ascending=False).astype(np.int64)
    assert (out["rnk"].to_numpy() == want_rnk.to_numpy()).all()
    assert (out["drnk"].to_numpy() == want_drnk.to_numpy()).all()


def test_range_window_sum_matches_bruteforce():
    """RANGE frame (peer-inclusive) vs an O(n^2) per-key reference."""
    from blog_parser_ray.functions.window import range_window_sum

    rng = np.random.default_rng(12)
    n = 1200
    ts = rng.integers(0, 500, n) * 1_000_000  # microsecond timestamps, ties
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),
        "ts": pd.to_datetime(ts, unit="us"),
        "v": rng.integers(-50, 100, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    W = 40 * 1_000_000
    out = range_window_sum(rd.from_pandas(df).repartition(4), key="k",
                           ts_col="ts", val_col="v", preceding_us=W,
                           out_col="ws", n_parts=5).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    tsv = ts.astype(np.int64)
    want = np.empty(n, dtype=np.int64)
    for i in range(n):
        m = (df["k"].to_numpy() == df["k"].to_numpy()[i]) \
            & (tsv >= tsv[i] - W) & (tsv <= tsv[i])
        want[i] = df["v"].to_numpy()[m].sum()
    got = out.set_index("id")["ws"]
    assert (got.loc[np.arange(n)].to_numpy() == want).all()


def test_lead_diff_matches_shift():
    from blog_parser_ray.functions.window import lead_diff_us

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 23, n),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="us"),
        "id": np.arange(n, dtype=np.int64),
    })
    out = lead_diff_us(rd.from_pandas(df).repartition(4), key="k",
                       ts_col="ts", tiebreak="id",
                       n_parts=6).to_pandas().sort_values("id")
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
    nxt = ref.groupby("k")["ts"].shift(-1)
    want = ((nxt - ref["ts"]).dt.total_seconds() * 1e6).fillna(-1)
    want = want.round().astype(np.int64)
    got = out.set_index("id")["next_us"].loc[ref["id"]]
    assert (got.to_numpy() == want.to_numpy()).all()


def test_heavy_hitters_exact_vs_ground_truth():
    """MG compression path engaged: vocab (500) >> k (8), many blocks.
    Output must be EXACTLY the items with freq*(k+1) > n and their exact
    counts — the sketch only bounds the candidate pass."""
    from blog_parser_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # Zipf-ish: a few planted heavy items over a 500-item tail
    tail = rng.integers(0, 500, 30_000)
    heavy = np.repeat(np.array([1001, 1002, 1003]), [9000, 7000, 5000])
    vals = np.concatenate([tail, heavy])
    rng.shuffle(vals)
    words = np.char.add("w", vals.astype(str))
    ds = rd.from_arrow(pa.table({"word": pa.array(words.tolist())}))
    out = heavy_hitters(ds.repartition(16), "word", k=8).to_pandas()

    n = len(words)
    uniq, cnt = np.unique(words, return_counts=True)
    want = {w: int(c) for w, c in zip(uniq, cnt) if c * 9 > n}
    got = dict(zip(out["word"], out["cnt"]))
    assert got == want


def test_approx_distinct_grouped_bound():
    """Grouped HLL estimate within 4 sigma of exact per group."""
    from blog_parser_ray.functions.sketch import approx_distinct_grouped

    rng = np.random.default_rng(11)
    n = 40_000
    grp = np.array(["g0", "g1", "g2"])[rng.integers(0, 3, n)]
    # distinct cardinality differs by group
    ids = rng.integers(0, 5000, n) + np.where(grp == "g1", 100_000, 0) \
        + np.where(grp == "g2", 200_000, 0)
    ds = rd.from_arrow(pa.table({"g": pa.array(grp.tolist()),
                                 "u": pa.array(ids, type=pa.int64())}))
    out = approx_distinct_grouped(ds.repartition(8), "u", "g",
                                  p=12).to_pandas()
    import pandas as pd
    df = pd.DataFrame({"g": grp, "u": ids})
    exact = df.groupby("g")["u"].nunique()
    sigma = 1.04 / np.sqrt(4096)
    for _, row in out.iterrows():
        e = exact[row["g"]]
        assert abs(row["approx_distinct"] - e) <= 4 * sigma * e, row


def test_daily_gapfill_fills_zeros(tmp_path):
    """Plant missing days; the spine must carry cnt=0 rows for them."""
    import pyarrow.parquet as pq

    from blog_parser_ray.pipelines.queries import QUERIES

    days = ["2024-01-01", "2024-01-02", "2024-01-05"]  # gap: 03, 04
    ts = pa.array(np.array(
        [np.datetime64(f"{d}T12:00:00") for d in days for _ in range(3)],
        dtype="datetime64[us]"))
    t = pa.table({"event_id": pa.array(np.arange(9), type=pa.int64()),
                  "ts": ts,
                  "user_id": pa.array(np.zeros(9), type=pa.float64()),
                  "event_type": pa.array(["x"] * 9),
                  "value": pa.array(np.ones(9)),
                  "props": pa.array(["{}"] * 9)})
    pq.write_table(t, tmp_path / "events.parquet")
    out = QUERIES["daily_gapfill"](str(tmp_path)).to_pandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert len(out) == 5
    assert out["cnt"].tolist() == [3, 3, 0, 0, 3]


def test_weighted_sample_matches_numpy_replay():
    """Distributed A-ES sample == single-process replay of the same salted
    keys (exact id-set equality), and heavier rows are sampled more."""
    from blog_parser_ray.functions.packing import (_salted_mod_hash,
                                                   weighted_sample)

    rng = np.random.default_rng(3)
    n, k = 5000, 200
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 1000, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    out = weighted_sample(rd.from_arrow(t).repartition(8), k=k
                          ).to_pandas()

    h = _salted_mod_hash(t["doc_id"], "wsample-v1", 1 << 53
                         ).astype(np.uint64)
    u = (h + np.uint64(1)).astype(np.float64) * (2.0 ** -53)
    key = np.log(u) / w.astype(np.float64)
    order = np.lexsort((ids, -key))  # key DESC, id ASC — top_k tiebreak
    want = set(ids[order[:k]].tolist())
    assert set(out["doc_id"].tolist()) == want
    assert len(out) == k
    # weighting sanity: the sample is size-biased — for w ~ U[1,1000)
    # the expected sample mean is E[w^2]/E[w] ≈ 1.34x the corpus mean
    assert out["n_chars"].mean() > 1.25 * w.mean()


def test_distinct_count_by_ignores_null_values():
    """SQL COUNT(DISTINCT x) semantics: null x rows don't count."""
    from blog_parser_ray.stages.agg import distinct_count_by

    t = pa.table({"k": pa.array(["a", "a", "a", "b", "b"]),
                  "x": pa.array([1, 1, None, 2, None], type=pa.int64())})
    out = (distinct_count_by(rd.from_arrow(t).repartition(2), ["k"], "x")
           .to_pandas().set_index("k")["n_distinct"])
    assert out["a"] == 1 and out["b"] == 1


def test_approx_distinct_grouped_rejects_null_groups():
    import pytest as _pytest

    from blog_parser_ray.functions.sketch import approx_distinct_grouped

    t = pa.table({"g": pa.array(["a", None]),
                  "u": pa.array([1, 2], type=pa.int64())})
    with _pytest.raises(Exception, match="null values in group column"):
        approx_distinct_grouped(rd.from_arrow(t), "u", "g").materialize()


def test_round4_ops_partition_invariant():
    """New-operator results must be identical across block layouts."""
    from blog_parser_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    names = ["heavy_words", "daily_active_users", "repetition_ratio",
             "dup_span_pairs", "chunk_docs", "validate_orders",
             "priority_spend_share", "grouped_regr"]

    def norm(obj):
        df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    import blog_parser_ray.pipelines.queries as qmod
    orig_read = qmod._read
    for name in names:
        a = norm(QUERIES[name](sf))
        try:
            # force a different block layout under the same query
            qmod._read = lambda s, t, c=None: orig_read(s, t, c
                                                        ).repartition(7)
            b = norm(QUERIES[name](sf))
        finally:
            qmod._read = orig_read
        pd.testing.assert_frame_equal(a, b, check_dtype=False), name


def test_pagerank_int_matches_numpy_replay():
    from blog_parser_ray.functions.graph import pagerank_int

    rng = np.random.default_rng(41)
    src = rng.integers(0, 200, 1500).astype(np.int64)
    dst = rng.integers(0, 200, 1500).astype(np.int64)
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    out = (pagerank_int(rd.from_arrow(edges).repartition(4), iters=4)
           .to_pandas().set_index("v")["r"])

    # exact integer replay
    scale, num, den = 10 ** 12, 85, 100
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    deg = np.zeros(n, dtype=np.int64)
    for s in src:
        deg[idx[s]] += 1
    r = np.full(n, scale // n, dtype=object)
    base = ((den - num) * scale // den) // n
    for _ in range(4):
        inc = np.zeros(n, dtype=object)
        for s, d in zip(src, dst):
            inc[idx[d]] += int(r[idx[s]]) // int(deg[idx[s]])
        r = np.array([base + num * int(x) // den for x in inc],
                     dtype=object)
    for v in nodes:
        assert int(out[v]) == int(r[idx[v]]), v


def test_extended_session_ops_partition_invariant():
    """Round-4 extended-session operators must produce identical results
    across block layouts (same sweep as test_round4_ops_partition_invariant)."""
    from blog_parser_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    names = ["fuzzy_pairs_brand", "funnel_3step", "wau_sliding",
             "orders_cume_dist", "cohort_retention", "tokens_explode",
             "token_bigrams", "centroids_by_label", "bigram_familiarity",
             "jaccard_pairs_exact", "merge_upsert", "kmeans_clusters",
             "inverted_index", "profile_orders", "order_next_order",
             "table_diff", "bfs_levels", "orders_price_anomaly",
             "event_transitions", "weekly_revenue_growth", "orders_drawdown",
             "null_safe_join_events"]

    def norm(obj):
        df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    import blog_parser_ray.pipelines.queries as qmod
    orig_read = qmod._read
    for name in names:
        a = norm(QUERIES[name](sf))
        try:
            qmod._read = lambda s, t, c=None: orig_read(s, t, c).repartition(7)
            b = norm(QUERIES[name](sf))
        finally:
            qmod._read = orig_read
        pd.testing.assert_frame_equal(a, b, check_dtype=False), name


def test_jaccard_exact_short_docs_have_no_fold_shingles():
    """Exact-join contract (review finding): docs under k words get ZERO
    shingles — the MinHash fold shingle is word-order-insensitive and
    would pair 'foo bar' with 'bar foo' at J=1 while the SQL k-gram
    oracle emits nothing. Both short-short and short-long pairs must be
    absent; normal-length planted dups must still be found."""
    import pyarrow as _pa
    import ray.data as _rd

    from blog_parser_ray.functions.dedup import jaccard_join_exact

    t = _pa.table({
        "doc_id": _pa.array([1, 2, 3, 4], type=_pa.int64()),
        "text": _pa.array([
            "foo bar",                       # < k words (k=3)
            "bar foo",                       # < k words, same word SET
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",  # true duplicate
        ])})
    out = (jaccard_join_exact(_rd.from_arrow(t), id_col="doc_id",
                              text_col="text", k=3, tau_e4=6000)
           .to_pandas())
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) not in pairs          # fold shingle must not leak in
    assert (3, 4) in pairs              # real dup still found
