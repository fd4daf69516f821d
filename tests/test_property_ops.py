"""Hypothesis property tests for round-2 operator kernels (SURVEY.md §5.4):
pure-function kernels loop under hypothesis; Ray-executing paths are covered
by the fixed-seed equivalence tests elsewhere (looping Ray under hypothesis
would dominate the suite's wall time)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from blog_parser_ray.functions.bloom import BloomFilter
from blog_parser_ray.functions.dedup import (text_shingle_hashes,
                                             token_shingle_hashes)
from blog_parser_ray.functions.knn import _topk_rows
from blog_parser_ray.hashing import hash_token_lists


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(min_value=-1e3, max_value=1e3,
                                    allow_nan=False),
                          st.integers(min_value=0, max_value=10**6)),
                min_size=0, max_size=200),
       st.integers(min_value=1, max_value=20))
def test_topk_rows_matches_naive_sort(rows, k):
    """_topk_rows (argpartition pre-cut + lexsort) must equal the naive
    full sort by (-sim, id) for ANY tie structure."""
    if not rows:
        return
    sims = np.array([r[0] for r in rows], dtype=np.float64)
    ids = np.array([r[1] for r in rows], dtype=np.int64)
    got = _topk_rows(sims, ids, k)
    naive = sorted(range(len(rows)), key=lambda i: (-sims[i], ids[i]))[:k]
    assert [(sims[i], ids[i]) for i in got] == \
        [(sims[i], ids[i]) for i in naive]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet=" abcdef", min_size=0, max_size=40),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=4))
def test_text_shingles_match_per_row_reference(texts, k):
    """Vectorized text shingles == per-row reference: blank rows get zero
    shingles; short nonblank rows get exactly one fallback shingle; full
    rows get len(words)-k+1 window shingles."""
    arr = pa.array(texts, type=pa.string())
    sh, starts, n_out = text_shingle_hashes(arr, k)
    for i, t in enumerate(texts):
        words = t.split(" ")          # split_pattern semantics, NOT str.split
        blank = all(w == "" for w in words)
        if blank:
            assert n_out[i] == 0
        elif len(words) < k:
            assert n_out[i] == 1
        else:
            assert n_out[i] == len(words) - k + 1
    assert int(n_out.sum()) == len(sh)
    # identical rows produce identical shingle multisets
    seen = {}
    for i, t in enumerate(texts):
        key = tuple(sorted(sh[starts[i]:starts[i] + n_out[i]].tolist()))
        if t in seen:
            assert seen[t] == key
        seen[t] = key


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=100),
                         min_size=0, max_size=25),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=4))
def test_token_shingles_slicing_invariant(rows, k):
    """Token shingles computed on a SLICED ListArray equal those computed on
    the equivalent standalone array (absolute-offset correctness)."""
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    full = token_shingle_hashes(arr, k)
    lo = len(rows) // 3
    sliced = token_shingle_hashes(arr.slice(lo), k)
    sub = token_shingle_hashes(pa.array(rows[lo:], type=pa.list_(pa.int32())),
                               k)
    assert sliced[0].tolist() == sub[0].tolist()
    assert sliced[2].tolist() == sub[2].tolist()
    # and the full run agrees on the overlap
    for i in range(len(rows) - lo):
        fi = lo + i
        a = full[0][full[1][fi]:full[1][fi] + full[2][fi]]
        b = sub[0][sub[1][i]:sub[1][i] + sub[2][i]]
        assert a.tolist() == b.tolist()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=300, unique=True),
       st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=300))
def test_bloom_no_false_negatives_and_merge(added, probes):
    """A Bloom filter NEVER false-negatives, and the OR-merge of per-chunk
    partials equals the single-shot build."""
    bf = BloomFilter(len(added), fp_rate=0.01)
    bf.add(np.array(added, dtype=np.int64))
    assert bf.contains(np.array(added, dtype=np.int64)).all()

    half = len(added) // 2
    p1 = BloomFilter(len(added), 0.01)
    p2 = BloomFilter(len(added), 0.01)
    if added[:half]:
        p1.add(np.array(added[:half], dtype=np.int64))
    if added[half:]:
        p2.add(np.array(added[half:], dtype=np.int64))
    merged = p1.merge(p2)
    assert (merged.bits == bf.bits).all()
    pr = np.array(probes, dtype=np.int64)
    assert (merged.contains(pr) == bf.contains(pr)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=50),
                         min_size=0, max_size=20),
                min_size=1, max_size=30))
def test_token_hash_seeds_are_independent(rows):
    """The two dedup hash families must agree iff content agrees — seeded
    family differs from unseeded on (almost) every nonempty input, and both
    are chunk-layout invariant."""
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    h1 = hash_token_lists(arr)
    h2 = hash_token_lists(arr, seed=0x5DEECE66D)
    for i, r in enumerate(rows):
        for j, s in enumerate(rows):
            if r == s:
                assert h1[i] == h1[j] and h2[i] == h2[j]
    # chunked layout must not change either family
    if len(rows) > 1:
        chunked = pa.chunked_array([arr.slice(0, 1), arr.slice(1)])
        assert hash_token_lists(chunked).tolist() == h1.tolist()
        assert hash_token_lists(chunked, seed=0x5DEECE66D).tolist() == \
            h2.tolist()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(
    st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=25),
    st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=25)),
    min_size=1, max_size=30), st.floats(min_value=0.0, max_value=1.0))
def test_jaccard_verify_kernel_matches_set_reference(pairs, threshold):
    """The lexsort+adjacent-dup Jaccard kernel == python set arithmetic on
    arbitrary (possibly empty / identical / disjoint) hash sets."""
    import pyarrow as pa

    from blog_parser_ray.functions.dedup import _jaccard_verify_fn

    sa = [sorted(set(p[0])) for p in pairs]
    sb = [sorted(set(p[1])) for p in pairs]
    batch = pa.table({
        "a": pa.array(range(len(pairs)), type=pa.int64()),
        "b": pa.array(range(100, 100 + len(pairs)), type=pa.int64()),
        "sh_a": pa.array(sa, type=pa.list_(pa.int64())),
        "sh_b": pa.array(sb, type=pa.list_(pa.int64())),
    })
    out = _jaccard_verify_fn(threshold, pa.int64())(batch)
    got = {r["a"]: r["jaccard"] for r in out.to_pylist()}
    for i, (xa, xb) in enumerate(zip(sa, sb)):
        u = len(set(xa) | set(xb))
        j = round((len(set(xa) & set(xb)) / u) if u else 1.0, 4)
        if j >= threshold:
            assert got[i] == j
        else:
            assert i not in got


@settings(max_examples=5, deadline=None)  # each example is a multi-round
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=60),  # Ray job
                          st.integers(min_value=0, max_value=60)),
                min_size=1, max_size=40))
def test_pair_components_property_matches_union_find(edges):
    """Distributed components == driver union-find on arbitrary int graphs
    (self-loops dropped, duplicates tolerated)."""
    import pyarrow as pa
    import ray.data as rd

    from blog_parser_ray.functions.dedup import pair_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {x: find(x) for x in {n for e in edges for n in e}}
    t = pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                  "b": pa.array([e[1] for e in edges], type=pa.int64())})
    got = {r["node"]: r["label"]
           for r in pair_components(rd.from_arrow(t)).take_all()}
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200))
def test_mersenne_fold_equals_modulo(xs):
    """The in-place Mersenne fold in _band_rows must be bit-identical to
    numpy's % (2^61-1) over the full u64 range (signatures depend on it)."""
    p = np.uint64((1 << 61) - 1)
    x = np.array(xs, dtype=np.uint64)
    with np.errstate(over="ignore"):
        t = (x & p) + (x >> np.uint64(61))
        fold = np.where(t >= p, t - p, t)
    assert np.array_equal(x % p, fold)


@settings(max_examples=3, deadline=None)  # forced Dataset-loop plan is the
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=30),  # slow one
                          st.integers(min_value=0, max_value=30)),
                min_size=1, max_size=20))
def test_pair_components_dataset_loop_plan_property(edges):
    """Same parity property with join_broadcast_limit=0 — forces the pure
    Dataset label-propagation loop (the >1M-node plan), which the default
    small graphs would otherwise never exercise."""
    import pyarrow as pa
    import ray.data as rd

    from blog_parser_ray.functions.dedup import pair_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {x: find(x) for x in {n for e in edges for n in e}}
    t = pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                  "b": pa.array([e[1] for e in edges], type=pa.int64())})
    got = {r["node"]: r["label"]
           for r in pair_components(rd.from_arrow(t),
                                    join_broadcast_limit=0).take_all()}
    assert got == want
