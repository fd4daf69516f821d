"""Hypothesis property tests: the vectorized parse and token hashing agree
with the row-at-a-time oracle on arbitrary inputs (SURVEY.md §5.4)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from blog_parser_ray import oracle
from blog_parser_ray import schema as S
from blog_parser_ray.hashing import hash_token_lists
from blog_parser_ray.stages.parse import parse_batch

VOCAB = 40

row_strategy = st.fixed_dictionaries({
    "doc_id": st.one_of(
        st.from_regex(r"[a-z0-9_]{1,8}/2024-0[1-9]-1[0-9]/[0-9]{1,6}",
                      fullmatch=True),
        st.text(min_size=0, max_size=20),
    ),
    "tokens": st.lists(st.integers(min_value=-5, max_value=VOCAB + 5),
                       max_size=30),
    "n_tok": st.integers(min_value=0, max_value=40),
    "source": st.from_regex(r"src[0-9]{1,3}", fullmatch=True),
})


def to_table(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "tokens": pa.array([r["tokens"] for r in rows], type=S.TOKENS_TYPE),
        "n_tok": pa.array([r["n_tok"] for r in rows], type=pa.int32()),
        "source": pa.array([r["source"] for r in rows], type=pa.string()),
    })


@settings(max_examples=60, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_parse_matches_oracle_on_arbitrary_rows(rows):
    out = parse_batch(to_table(rows), vocab_size=VOCAB).to_pylist()
    for row, got in zip(rows, out):
        want = oracle.parse_row(row, VOCAB)
        assert got["parse_class"] == want["parse_class"]
        assert got["parse_fields"] == want["parse_fields"]
        assert got["n_sections"] == want["n_sections"]
        assert got["tokens"] == list(row["tokens"])  # pass-through


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=-100, max_value=100),
                         max_size=20), min_size=1, max_size=20))
def test_token_hash_content_equality(lists):
    arr = pa.array(lists, type=S.TOKENS_TYPE)
    h = hash_token_lists(arr)
    # equal content <=> equal hash (no collisions expected at this scale);
    # also stable under slicing (absolute-offset correctness)
    for i, a in enumerate(lists):
        for j, b in enumerate(lists):
            if a == b:
                assert h[i] == h[j]
    sl = pa.table({"tokens": arr}).slice(1)
    if sl.num_rows:
        h2 = hash_token_lists(sl["tokens"])
        assert (h2 == h[1:]).all()
