"""Layer-1 parse fixtures (SURVEY.md §5.2) — the pytest parse-correctness oracle.

Mirrors the reference's fixture-driven unit tests (HTML input → expected
extraction; BASELINE.json: "its HTML-extraction unit tests serve as the
parse-correctness oracle"). Each JSONL case is run (a) as a single-row batch,
(b) inside the all-rows batch, and both must agree with the expectation AND
with the single-process oracle. Token equality is asserted with Arrow
comparisons, never pandas (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from blog_parser_ray import oracle
from blog_parser_ray import schema as S
from blog_parser_ray.stages.parse import explode_sections, parse_batch

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "parse_cases.jsonl")
VOCAB_SIZE = S.BRIDGE_VOCAB_SIZE  # 34 — fixture token ids are written against it


def load_cases():
    with open(FIXTURES, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


CASES = load_cases()


def rows_table(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "tokens": pa.array([r["tokens"] for r in rows], type=S.TOKENS_TYPE),
        "n_tok": pa.array([r["n_tok"] for r in rows], type=pa.int32()),
        "source": pa.array([r["source"] for r in rows], type=pa.string()),
    })


def test_fixture_coverage():
    classes = {c["expect"]["parse_class"] for c in CASES}
    assert classes == set(S.PARSE_CLASSES)
    assert len(CASES) >= 30


@pytest.mark.parametrize("case", CASES, ids=[c["case"] for c in CASES])
def test_single_row(case):
    t = rows_table([case["in"]])
    out = parse_batch(t, vocab_size=VOCAB_SIZE)
    exp = case["expect"]
    assert out["parse_class"][0].as_py() == exp["parse_class"]
    assert out["parse_fields"][0].as_py() == exp["parse_fields"]
    assert out["n_sections"][0].as_py() == exp["n_sections"]
    # token-array equality invariant, compared in Arrow
    assert out["tokens"].combine_chunks().equals(
        pa.array([exp["tokens_out"]], type=S.TOKENS_TYPE))


def test_all_rows_batch_matches_singles():
    t = rows_table([c["in"] for c in CASES])
    out = parse_batch(t, vocab_size=VOCAB_SIZE)
    for i, case in enumerate(CASES):
        exp = case["expect"]
        assert out["parse_class"][i].as_py() == exp["parse_class"], case["case"]
        assert out["parse_fields"][i].as_py() == exp["parse_fields"], case["case"]
        assert out["n_sections"][i].as_py() == exp["n_sections"], case["case"]
    assert out["tokens"].combine_chunks().equals(
        pa.array([c["expect"]["tokens_out"] for c in CASES], type=S.TOKENS_TYPE))


def test_sliced_batch():
    """parse_batch on a zero-copy slice (offsets not starting at 0)."""
    t = rows_table([c["in"] for c in CASES])
    sl = t.slice(5, 20)
    out = parse_batch(sl, vocab_size=VOCAB_SIZE)
    for i, case in enumerate(CASES[5:25]):
        assert out["parse_class"][i].as_py() == case["expect"]["parse_class"], case["case"]


def test_matches_python_oracle():
    t = rows_table([c["in"] for c in CASES])
    out = parse_batch(t, vocab_size=VOCAB_SIZE).to_pylist()
    for case, got in zip(CASES, out):
        want = oracle.parse_row(case["in"], VOCAB_SIZE)
        assert got["parse_class"] == want["parse_class"], case["case"]
        assert got["parse_fields"] == want["parse_fields"], case["case"]
        assert got["n_sections"] == want["n_sections"], case["case"]
        assert got["tokens"] == want["tokens"], case["case"]


def test_empty_batch():
    out = parse_batch(rows_table([]), vocab_size=VOCAB_SIZE)
    assert out.num_rows == 0
    assert set(out.column_names) >= {"parse_class", "parse_fields", "n_sections"}


def test_explode_sections_conservation():
    t = rows_table([c["in"] for c in CASES])
    ex = explode_sections(t)
    by: dict[tuple, list] = {}
    for r in ex.to_pylist():
        by.setdefault(r["doc_id"], []).append((r["sec_no"], r["sec_tokens"]))
    # group fixture rows by doc_id (dup pair shares one id → children double up)
    from collections import Counter
    id_counts = Counter(c["in"]["doc_id"] for c in CASES)
    for case in CASES:
        row = case["in"]
        if id_counts[row["doc_id"]] > 1:
            continue  # dup ids checked via totals below
        kids = sorted(by[row["doc_id"]])
        rebuilt: list[int] = []
        for i, (_no, tk) in enumerate(kids):
            rebuilt.extend(tk)
            if i < len(kids) - 1:
                rebuilt.append(S.SEC)
        assert rebuilt == row["tokens"], case["case"]
        assert len(kids) == case["expect"]["n_sections"], case["case"]
    total_children = sum(c["expect"]["n_sections"] for c in CASES)
    assert ex.num_rows == total_children
