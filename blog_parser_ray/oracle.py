"""Single-process pure-Python oracle — the stand-in reference (SURVEY.md §0.3, §5.3).

The reference (``nathan-chappell/blog_parser``) is a single-process,
per-document, row-at-a-time loop: parse an HTML document → run sanitizer /
section-indexer state → emit index records → aggregate an index summary
(SURVEY.md §0.4, §1.1; the mount is empty so this oracle IS the reference for
equality checks, per SURVEY.md §0.3). It deliberately mirrors that shape —
plain dicts/lists, one row at a time, no Arrow, no numpy, no Ray — so that the
distributed engine is checked against an independently-written implementation
of the same semantics, not against itself.

Checks served (SURVEY.md §5.3): routed-row equality per sink, per-sink counts
equality, n_tok-histogram equality, token-array pass-through equality.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Any

from . import schema as S
from .config import PipelineSpec, Predicate

_GROK = re.compile(S.GROK_DOC_ID)


def parse_row(row: dict[str, Any], vocab_size: int,
              max_tokens: int = S.MAX_TOKENS) -> dict[str, Any]:
    """Row-at-a-time P1+P2+P7 with the same precedence as stages/parse.py."""
    out = dict(row)
    m = _GROK.match(row["doc_id"]) if row["doc_id"] is not None else None
    fields = ({"src": m.group("src"), "date": m.group("date"),
               "seq": m.group("seq")} if m else None)
    toks = row["tokens"]
    n_sections = sum(1 for t in toks if t == S.SEC) + 1

    if m is None:
        cls = S.CLASS_MALFORMED_ID
    elif len(toks) == 0:
        cls = S.CLASS_EMPTY
    elif row["n_tok"] != len(toks):
        cls = S.CLASS_LEN_MISMATCH
    elif toks[0] != S.BOS or toks[-1] != S.EOS:
        cls = S.CLASS_NO_BOS
    elif any(t < 0 or t >= vocab_size for t in toks):
        cls = S.CLASS_BAD_TOKEN
    elif len(toks) > max_tokens:
        cls = S.CLASS_OVERSIZED
    else:
        cls = S.CLASS_OK

    out["parse_class"] = cls
    out["parse_fields"] = fields
    out["n_sections"] = n_sections
    out["tokens"] = list(toks)  # pass-through: must equal input exactly
    return out


def enrich_row(row: dict[str, Any], dim: dict[str, dict[str, Any]]) -> dict[str, Any]:
    """Lookup-enrich from the source→metadata dict (reference: sanitizer/
    section-indexer in-memory state; BASELINE.json north_star)."""
    out = dict(row)
    meta = dim.get(row["source"])
    out["meta_tenant"] = meta["meta_tenant"] if meta else None
    out["meta_region"] = meta["meta_region"] if meta else None
    out["meta_priority"] = meta["meta_priority"] if meta else None
    out["sink_hint"] = meta["sink_hint"] if meta else None
    return out


def _pred_holds(p: Predicate, row: dict[str, Any]) -> bool:
    v = row.get(p.column)
    if p.op == "eq":
        return v == p.value
    if p.op == "ne":
        return v is not None and v != p.value
    if p.op == "in":
        return v in p.value
    if p.op == "not_in":
        return v is not None and v not in p.value
    if p.op == "regex":
        return v is not None and re.search(p.value, v) is not None
    if v is None:
        return False
    if p.op == "lt":
        return v < p.value
    if p.op == "le":
        return v <= p.value
    if p.op == "gt":
        return v > p.value
    if p.op == "ge":
        return v >= p.value
    raise ValueError(p.op)


def route_row(row: dict[str, Any], spec: PipelineSpec) -> dict[str, Any]:
    out = dict(row)
    for rule in spec.router.rules:
        if all(_pred_holds(p, row) for p in rule.when):
            out["sink"] = rule.sink
            return out
    out["sink"] = spec.router.default_sink
    return out


def run_flagship(rows: list[dict[str, Any]], dim: dict[str, dict[str, Any]],
                 spec: PipelineSpec) -> dict[str, Any]:
    """Full per-row loop: parse → enrich → route; then the index summary.

    Returns ``{"routed": rows_with_sink, "per_sink_counts": Counter,
    "hist": Counter, "totals": {...}}``. ``per_sink_counts`` keys are
    ``(sink, source, parse_class)`` (A2); ``hist`` keys are ``(sink, bin)``
    over bin = min(n_tok, max_tokens-1) // bin_width using the REAL token count
    (overflow rows land in the TOP bin; domain stays [0, max/width))
    len(tokens) (A3).
    """
    routed = []
    counts: Counter = Counter()
    hist: Counter = Counter()
    tok_total = 0
    for row in rows:
        r = route_row(enrich_row(parse_row(row, spec.vocab_size,
                                           spec.max_tokens), dim), spec)
        routed.append(r)
        counts[(r["sink"], r["source"], r["parse_class"])] += 1
        b = min(len(r["tokens"]), spec.max_tokens - 1) // spec.hist_bin_width
        hist[(r["sink"], b)] += 1
        tok_total += len(r["tokens"])
    per_sink_rows = defaultdict(int)
    for r in routed:
        per_sink_rows[r["sink"]] += 1
    return {
        "routed": routed,
        "per_sink_counts": counts,
        "hist": hist,
        "totals": {"rows": len(routed), "tokens": tok_total,
                   "per_sink_rows": dict(per_sink_rows)},
    }


def build_dim(sources: list[str]) -> dict[str, dict[str, Any]]:
    """Deterministic dim table mirror (same derivation as stages/enrich.py)."""
    from .hashing import stable_hash_one

    dim = {}
    for s in sorted(set(sources)):
        h = stable_hash_one(s)
        dim[s] = {
            "meta_tenant": f"tenant{h % 17}",
            "meta_region": S.REGIONS[(h >> 8) % len(S.REGIONS)],
            "meta_priority": (h >> 16) % 4,
            "sink_hint": f"hint{(h >> 24) % 3}",
        }
    return dim
