"""Bucketed hash join, exact bounded quantiles, sink compaction."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from blog_parser_ray.functions.join import bucketed_hash_join
from blog_parser_ray.stages.agg import exact_quantiles_bounded
from blog_parser_ray.stages.sink import compact_sinks


def test_bucketed_join_matches_pandas():
    rng = np.random.default_rng(2)
    left = pa.table({"k": pa.array(rng.integers(0, 50, 2000), type=pa.int64()),
                     "lv": pa.array(np.arange(2000), type=pa.int64())})
    right = pa.table({"rk": pa.array(np.arange(0, 60), type=pa.int64()),
                      "rv": pa.array(np.arange(60) * 10, type=pa.int64())})
    out = bucketed_hash_join(rd.from_arrow(left).repartition(4),
                             rd.from_arrow(right).repartition(2),
                             left_on="k", right_on="rk",
                             num_buckets=8).to_pandas()
    expect = left.to_pandas().merge(right.to_pandas(), left_on="k",
                                    right_on="rk")
    assert len(out) == len(expect)
    got = out.sort_values(["lv"]).reset_index(drop=True)
    want = expect.sort_values(["lv"]).reset_index(drop=True)
    assert (got["rv"].to_numpy() == want["rv"].to_numpy()).all()


def test_bucketed_join_rejects_overlap():
    import pytest
    t = pa.table({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="rename"):
        bucketed_hash_join(rd.from_arrow(t), rd.from_arrow(t),
                           left_on="k", right_on="k")


def test_exact_quantiles_match_numpy():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 100, 10_000)
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    qs = exact_quantiles_bounded(rd.from_arrow(t).repartition(8), "v",
                                 [0.1, 0.5, 0.9])
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        assert qs[q] == float(s[int(np.floor((len(s) - 1) * q))])


def test_equi_join_plan_selection():
    """Broadcast plan (small unique build) and partitioned plan must agree;
    a duplicate-keyed build side must NOT broadcast (needs row expansion)."""
    from blog_parser_ray.functions.join import equi_join
    left = pa.table({"k": pa.array([1, 2, 2, 3, 9], type=pa.int64()),
                     "lv": pa.array([10, 20, 21, 30, 90], type=pa.int64())})
    right_uniq = pa.table({"rk": pa.array([1, 2, 3, 4], type=pa.int64()),
                           "rv": pa.array(["a", "b", "c", "d"])})
    bcast = equi_join(rd.from_arrow(left), rd.from_arrow(right_uniq),
                      left_on="k", right_on="rk").to_pandas()
    shuf = equi_join(rd.from_arrow(left), rd.from_arrow(right_uniq),
                     left_on="k", right_on="rk",
                     broadcast_limit=0).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].to_numpy()))
    assert key(bcast) == key(shuf)
    assert len(bcast) == 4  # k=9 unmatched dropped

    right_dup = pa.table({"rk": pa.array([2, 2, 3], type=pa.int64()),
                          "rv": pa.array(["x", "y", "z"])})
    out = equi_join(rd.from_arrow(left), rd.from_arrow(right_dup),
                    left_on="k", right_on="rk").to_pandas()
    # k=2 appears twice on each side → 4 expanded rows, plus k=3 → 1
    assert len(out) == 5


def test_key_setops_distributed():
    from blog_parser_ray.functions.setops import key_except, key_intersect
    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, 4],
                                              type=pa.int64())})).repartition(3)
    b = rd.from_arrow(pa.table({"k": pa.array([2, 4, 5],
                                              type=pa.int64())})).repartition(2)
    assert sorted(key_intersect(a, b, "k").to_pandas()["k"]) == [2, 4]
    assert sorted(key_except(a, b, "k").to_pandas()["k"]) == [1, 3]
    assert sorted(key_except(b, a, "k", out_name="x").to_pandas()["x"]) == [5]


def test_compact_sinks(tmp_path):
    out = str(tmp_path / "out")
    for sink in ("a", "b"):
        d = os.path.join(out, "sinks", sink)
        os.makedirs(d)
        for i in range(6):
            pq.write_table(pa.table({"x": pa.array(range(i * 10, i * 10 + 10),
                                                   type=pa.int64())}),
                           os.path.join(d, f"part-{i:06d}.parquet"))
    before = rd.read_parquet(os.path.join(out, "sinks")).to_pandas()
    report = compact_sinks(out, target_rows_per_file=100)
    after = rd.read_parquet(os.path.join(out, "sinks")).to_pandas()
    assert sorted(before["x"]) == sorted(after["x"])
    for sink in ("a", "b"):
        assert report[sink]["files_after"] < report[sink]["files_before"]

    # crash between the two swap renames strands sinks/a in sinks/a.old;
    # the next invocation restores it before compacting
    a_dir = os.path.join(out, "sinks", "a")
    os.replace(a_dir, a_dir + ".old")
    assert not os.path.isdir(a_dir)
    compact_sinks(out, target_rows_per_file=100)
    recovered = rd.read_parquet(os.path.join(out, "sinks")).to_pandas()
    assert sorted(before["x"]) == sorted(recovered["x"])

    # crash AFTER the second rename leaves a stale full copy in a.old that
    # would double-count in recursive reads; recovery must delete it
    import shutil
    shutil.copytree(a_dir, a_dir + ".old")
    os.makedirs(a_dir + ".compact")
    compact_sinks(out, target_rows_per_file=100)
    assert not os.path.isdir(a_dir + ".old")
    assert not os.path.isdir(a_dir + ".compact")
    clean = rd.read_parquet(os.path.join(out, "sinks")).to_pandas()
    assert sorted(before["x"]) == sorted(clean["x"])


def test_bloom_filter_rates_and_merge():
    from blog_parser_ray.functions.bloom import BloomFilter

    keys = np.arange(0, 20_000, 2)  # evens
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add(keys)
    assert bf.contains(keys).all()            # no false negatives, ever
    odds = np.arange(1, 20_001, 2)
    fp = bf.contains(odds).mean()
    assert fp < 0.05, fp                      # near the configured rate
    # mergeability: union of two filters == filter of union
    a, b = BloomFilter(1000, 0.01), BloomFilter(1000, 0.01)
    a.add(np.arange(0, 500))
    b.add(np.arange(500, 1000))
    a.merge(b)
    assert a.contains(np.arange(0, 1000)).all()


def test_semi_join_bloom_matches_exact():
    import pyarrow.compute as pc
    from blog_parser_ray.functions.bloom import semi_join_bloom

    rng = np.random.default_rng(6)
    fact = pa.table({"k": pa.array(rng.integers(0, 1000, 5000), type=pa.int64()),
                     "v": pa.array(np.arange(5000), type=pa.int64())})
    keys = pa.table({"key": pa.array(np.arange(0, 1000, 3), type=pa.int64())})
    out = semi_join_bloom(rd.from_arrow(fact).repartition(4),
                          rd.from_arrow(keys), fact_key="k",
                          key_col="key").to_pandas()
    expect = fact.filter(pc.is_in(fact["k"], value_set=keys["key"]
                                  .combine_chunks())).to_pandas()
    assert sorted(out["v"]) == sorted(expect["v"])


def test_equi_join_multi_null_keys_and_shuffle_plan():
    """A tuple with any null component must match nothing (SQL semantics),
    on both the broadcast and the forced-shuffle plan."""
    import pandas as pd

    from blog_parser_ray.functions.join import equi_join_multi

    l = pd.DataFrame({"a": [1, 1, 2, None], "b": ["x", "y", "x", "x"],
                      "v": [10, 11, 12, 13]})
    r = pd.DataFrame({"c": [1, 2, None], "d": ["x", "x", "x"],
                      "w": [100, 200, 300]})
    want = {(1, "x", 10, 100), (2, "x", 12, 200)}
    for bl in (1_000_000, 0):  # broadcast plan, then forced shuffle plan
        out = equi_join_multi(
            rd.from_pandas(l).repartition(3),
            rd.from_pandas(r).repartition(2),
            left_on=["a", "b"], right_on=["c", "d"],
            broadcast_limit=bl).to_pandas()
        got = {(int(x.a), x.b, int(x.v), int(x.w))
               for x in out.itertuples()}
        assert got == want, (bl, out)


def test_skew_join_matches_plain_join_under_skew():
    """90%-one-key probe side, duplicate build keys: skew_join output must
    equal the plain shuffle join as a multiset."""
    import pandas as pd

    from blog_parser_ray.functions.join import equi_join, skew_join

    rng = np.random.default_rng(5)
    n = 60_000
    keys = np.where(rng.random(n) < 0.9, 7,
                    rng.integers(0, 500, n)).astype(np.int64)
    left = pa.table({"k": pa.array(keys),
                     "v": pa.array(np.arange(n, dtype=np.int64))})
    # duplicate right keys: 2 rows per key → hot fan-out must double
    rk = np.repeat(np.arange(0, 500, dtype=np.int64), 2)
    right = pa.table({"rk": pa.array(rk),
                      "w": pa.array(np.arange(len(rk), dtype=np.int64))})

    def norm(ds):
        df = ds.to_pandas().sort_values(["k", "v", "w"]).reset_index(
            drop=True)
        return df[["k", "v", "w"]]

    got = norm(skew_join(rd.from_arrow(left).repartition(8),
                         rd.from_arrow(right).repartition(2),
                         left_on="k", right_on="rk", hot_k=16))
    want = norm(equi_join(rd.from_arrow(left).repartition(8),
                          rd.from_arrow(right).repartition(2),
                          left_on="k", right_on="rk",
                          broadcast_limit=0))
    pd.testing.assert_frame_equal(got, want)


def test_dedup_incremental_both_plans_match_ground_truth():
    import pandas as pd

    from blog_parser_ray.functions.dedup import dedup_incremental

    rng = np.random.default_rng(9)
    texts = [f"t{v}" for v in rng.integers(0, 120, 400)]  # heavy overlap
    ids = np.arange(400, dtype=np.int64)
    new = pa.table({"doc_id": pa.array(ids[:150]),
                    "text": pa.array(texts[:150])})
    seen = pa.table({"doc_id": pa.array(ids[150:]),
                     "text": pa.array(texts[150:])})

    df_new, df_seen = new.to_pandas(), seen.to_pandas()
    firsts = df_new.groupby("text")["doc_id"].min()
    want = set(firsts[~firsts.index.isin(set(df_seen["text"]))].tolist())
    assert 0 < len(want) < 150  # the test really exercises both outcomes

    for bl in (5_000_000, 0):  # broadcast plan, then partitioned plan
        out = dedup_incremental(
            rd.from_arrow(new).repartition(4),
            rd.from_arrow(seen).repartition(3),
            broadcast_limit=bl).to_pandas()
        assert set(out["doc_id"].tolist()) == want, bl


def test_minhash_dedup_incremental_drops_cross_shard_neardups():
    """Planted near-identical docs across shards: new-shard copies must be
    dropped; unrelated and new-vs-new-only dups must survive."""
    from blog_parser_ray.functions.dedup import minhash_dedup_incremental

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(300)]

    def doc(seed, mutate=0):
        r = np.random.default_rng(seed)
        ws = [vocab[i] for i in r.integers(0, 300, 60)]
        for j in range(mutate):
            ws[j] = vocab[int(r.integers(0, 300))]
        return " ".join(ws)

    seen_texts = [doc(s) for s in range(40)]
    # new shard: 10 near-copies of seen docs (1-word mutation), 10 fresh,
    # plus 2 docs near-identical to EACH OTHER but not to seen
    near = [doc(s, mutate=1) for s in range(10)]
    fresh = [doc(1000 + s) for s in range(10)]
    twin_a, twin_b = doc(5000), doc(5000, mutate=1)
    new_texts = near + fresh + [twin_a, twin_b]
    seen = pa.table({"doc_id": pa.array(np.arange(1000, 1040,
                                                  dtype=np.int64)),
                     "text": pa.array(seen_texts)})
    new = pa.table({"doc_id": pa.array(np.arange(22, dtype=np.int64)),
                    "text": pa.array(new_texts)})
    out = minhash_dedup_incremental(
        rd.from_arrow(new).repartition(3),
        rd.from_arrow(seen).repartition(4),
        threshold=0.6, k=3).to_pandas()
    got = set(out["doc_id"].tolist())
    assert got & set(range(10)) == set(), got  # near-copies dropped
    assert set(range(10, 22)) <= got, got      # fresh + twins survive

    # persisted-index fast path: precomputed seen band rows (the
    # production increment loop) must give the IDENTICAL survivor set
    from blog_parser_ray.functions.dedup import minhash_band_rows_ds
    seen_bands = minhash_band_rows_ds(
        rd.from_arrow(seen).repartition(4), k=3).materialize()
    out2 = minhash_dedup_incremental(
        rd.from_arrow(new).repartition(3),
        rd.from_arrow(seen).repartition(4),
        threshold=0.6, k=3, seen_band_rows=seen_bands).to_pandas()
    assert set(out2["doc_id"].tolist()) == got

    # non-default id column + a storage round trip that REORDERS the
    # persisted index's columns (union aligns positionally — must be
    # normalized, not trusted)
    new_r = rd.from_arrow(new.rename_columns(["id", "text"]))
    seen_r = rd.from_arrow(seen.rename_columns(["id", "text"]))
    idx = minhash_band_rows_ds(seen_r, k=3, id_col="id").map_batches(
        lambda b: b.select(["band_hash", "band", "doc_id"]),
        batch_format="pyarrow").materialize()
    out3 = minhash_dedup_incremental(
        new_r, seen_r, threshold=0.6, k=3, key_col="id",
        seen_band_rows=idx).to_pandas()
    assert set(out3["id"].tolist()) == got


def test_anti_filter_keys_both_plans():
    from blog_parser_ray.functions.dedup import _anti_filter_keys

    ds = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64)),
                   "v": pa.array(np.arange(1000, dtype=np.int64) * 2)})
    drops = pa.table({"_drop": pa.array(
        np.arange(0, 1000, 3, dtype=np.int64))})
    want = {int(i) for i in range(1000) if i % 3 != 0}
    for bl in (5_000_000, 0):  # broadcast, then bucketed anti-join
        out = _anti_filter_keys(
            rd.from_arrow(ds).repartition(4),
            rd.from_arrow(drops).repartition(2),
            key_col="doc_id", broadcast_limit=bl).to_pandas()
        assert set(out["doc_id"].tolist()) == want, bl
        # non-key columns survive intact
        assert (out["v"] == out["doc_id"] * 2).all()


def test_embedding_dedup_incremental_drops_cross_shard():
    """Planted near-identical vectors across shards are dropped from the
    new shard; orthogonal-ish fresh vectors survive."""
    from blog_parser_ray.functions.dedup import embedding_dedup_incremental

    rng = np.random.default_rng(31)
    d = 16
    seen_vecs = rng.normal(size=(30, d)).astype(np.float32)
    near = seen_vecs[:8] + rng.normal(scale=0.01,
                                      size=(8, d)).astype(np.float32)
    fresh = rng.normal(size=(8, d)).astype(np.float32)
    new_vecs = np.vstack([near, fresh])

    def tbl(ids, vecs):
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32()))})

    out = embedding_dedup_incremental(
        rd.from_arrow(tbl(np.arange(16), new_vecs)).repartition(3),
        rd.from_arrow(tbl(np.arange(1000, 1030), seen_vecs)
                      ).repartition(2),
        threshold=0.95).to_pandas()
    got = set(out["vec_id"].tolist())
    assert got & set(range(8)) == set(), got   # near-copies dropped
    # fresh random gaussians are near-orthogonal to everything: survive
    assert set(range(8, 16)) <= got, got


def test_skew_join_uniform_keys_falls_back_to_plain_plan():
    """No hot keys → skew_join must route through equi_join and still be
    exact."""
    import pandas as pd

    from blog_parser_ray.functions.join import equi_join, skew_join

    rng = np.random.default_rng(17)
    keys = rng.integers(0, 5000, 20_000).astype(np.int64)  # uniform
    left = pa.table({"k": pa.array(keys),
                     "v": pa.array(np.arange(20_000, dtype=np.int64))})
    right = pa.table({"rk": pa.array(np.arange(5000, dtype=np.int64)),
                      "w": pa.array(np.arange(5000, dtype=np.int64) * 3)})

    def norm(ds):
        return (ds.to_pandas().sort_values(["k", "v"])
                .reset_index(drop=True)[["k", "v", "w"]])

    got = norm(skew_join(rd.from_arrow(left).repartition(4),
                         rd.from_arrow(right).repartition(2),
                         left_on="k", right_on="rk", hot_k=8))
    want = norm(equi_join(rd.from_arrow(left).repartition(4),
                          rd.from_arrow(right).repartition(2),
                          left_on="k", right_on="rk", broadcast_limit=0))
    pd.testing.assert_frame_equal(got, want)


def test_chunk_batch_edges():
    from blog_parser_ray.functions.text import chunk_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["", "a b", " ".join(["w"] * 64)])})
    out = chunk_batch(t, size=32, stride=24).to_pandas()
    # empty text → one chunk (the [''] word); 2 words → one chunk;
    # 64 words → starts at 0, 24, 48 → three chunks (32, 32, 16 words)
    assert out[out.doc_id == 1]["n_words"].tolist() == [1]
    assert out[out.doc_id == 2]["chunk"].tolist() == ["a b"]
    assert out[out.doc_id == 3]["n_words"].tolist() == [32, 32, 16]
    assert out[out.doc_id == 3]["chunk_id"].tolist() == [0, 1, 2]
