"""Edit-distance fuzzy join (functions/fuzzy.py): DP kernel exactness,
SymSpell blocking completeness, and end-to-end parity vs a brute-force
all-pairs reference. The DuckDB levenshtein oracle runs in the
parametrized test_queries_duckdb sweep; these tests pin the kernel and
the blocking invariant independently of the oracle."""

from __future__ import annotations

import random

import numpy as np

from blog_parser_ray.functions.fuzzy import (
    _deletion_variants, levenshtein_vec)


def _lev_py(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_vec_matches_reference_dp():
    rng = random.Random(7)
    pairs = [("".join(rng.choice("abcde") for _ in range(rng.randint(0, 14))),
              "".join(rng.choice("abcde") for _ in range(rng.randint(0, 14))))
             for _ in range(500)]
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same"),
              ("kitten", "sitting"), ("flaw", "lawn")]
    got = levenshtein_vec([a for a, _ in pairs], [b for _, b in pairs])
    exp = np.array([_lev_py(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_levenshtein_vec_matches_duckdb_on_unicode():
    """Oracle parity on non-ASCII: DuckDB's levenshtein is BYTE-level
    (levenshtein('café','cafe') = 2, not 1) and the kernel must agree
    byte-for-byte — a code-point DP would diverge from the SQL oracle."""
    import duckdb

    cases = [("café", "cafe"), ("naïve", "naive"), ("日本語", "日本誤"),
             ("żółw", "zolw"), ("abc", "abc"), ("héllo", "héllo")]
    got = levenshtein_vec([a for a, _ in cases], [b for _, b in cases])
    exp = [duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
           for a, b in cases]
    assert got.tolist() == exp


def test_deletion_neighborhood_complete_for_k2():
    """The blocking invariant the candidate stage relies on: every pair
    within lev<=2 shares at least one <=2-deletion variant."""
    rng = random.Random(11)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
             for _ in range(120)]
    checked = 0
    for i, a in enumerate(words):
        for b in words[i + 1:]:
            if _lev_py(a, b) <= 2:
                checked += 1
                assert _deletion_variants(a, 2) & _deletion_variants(b, 2), \
                    (a, b)
    assert checked > 50  # the corpus actually exercised the invariant


def test_fuzzy_partitioned_plan_matches_broadcast_plan():
    """Plan equivalence: broadcast_limit=0 forces the partitioned
    two-join expansion (the 100 TB path); output must be identical to
    the default broadcast expansion."""
    from blog_parser_ray.functions.fuzzy import fuzzy_self_join
    from blog_parser_ray.sources.readers import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    part = read_parquet_clean(f"{sf}/part.parquet",
                              columns=["p_partkey", "p_name", "p_brand"])
    kw = dict(key_col="p_partkey", name_col="p_name",
              block_col="p_brand", k=2)
    cols = ["p_brand", "a_key", "b_key", "dist"]
    bcast = (fuzzy_self_join(part, **kw).to_pandas()[cols]
             .sort_values(cols).reset_index(drop=True))
    parted = (fuzzy_self_join(part, broadcast_limit=0, **kw)
              .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    assert len(bcast) == len(parted) > 0
    assert bcast.equals(parted)


def test_fuzzy_self_join_matches_bruteforce():
    import pyarrow.parquet as pq

    from blog_parser_ray.functions.fuzzy import fuzzy_self_join
    from blog_parser_ray.sources.readers import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    part = read_parquet_clean(f"{sf}/part.parquet",
                              columns=["p_partkey", "p_name", "p_brand"])
    got = (fuzzy_self_join(part, key_col="p_partkey", name_col="p_name",
                           block_col="p_brand", k=2)
           .to_pandas().sort_values(["p_brand", "a_key", "b_key"])
           .reset_index(drop=True))

    t = pq.read_table(f"{sf}/part.parquet",
                      columns=["p_partkey", "p_name", "p_brand"]).to_pandas()
    exp = []
    rows = sorted(t.itertuples(index=False), key=lambda r: r.p_partkey)
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            if a.p_brand == b.p_brand:
                d = _lev_py(a.p_name, b.p_name)
                if d <= 2:
                    exp.append((a.p_brand, a.p_partkey, b.p_partkey, d))
    exp.sort()
    assert len(got) == len(exp)
    assert list(map(tuple, got.to_numpy())) == exp


def test_jaccard_exact_partitioned_plan_matches_broadcast_plan():
    """jaccard_join_exact's partitioned DF path (df_broadcast_limit=0,
    the 100 TB plan) must equal the default broadcast-DF path."""
    from blog_parser_ray.functions.dedup import jaccard_join_exact
    from blog_parser_ray.sources.readers import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"])
    cols = ["a", "b", "inter", "uni"]
    bcast = (jaccard_join_exact(docs, tau_e4=6000).to_pandas()[cols]
             .sort_values(cols).reset_index(drop=True))
    parted = (jaccard_join_exact(docs, tau_e4=6000, df_broadcast_limit=0)
              .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    assert len(bcast) == len(parted) > 0
    assert bcast.equals(parted)
