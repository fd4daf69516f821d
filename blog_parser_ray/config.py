"""Pipeline configuration (SURVEY.md §2.10, §3.1 stage 1).

A ``PipelineSpec`` fully determines a flagship run: parse bounds, enrich dim,
router rules, sinks, aggregate bins, salting, and physical knobs. Router rules
are data-driven, ordered, first-match-wins, with a mandatory default sink —
this recasts the reference's per-site/per-kind output selection (BASELINE.json
north_star: "a rule-driven router fans rows out to per-sink Parquet writers
keyed on source/parse-class").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from . import schema as S

_VALID_OPS = {"eq", "ne", "in", "not_in", "regex", "lt", "le", "gt", "ge"}

# sink names become filesystem path components under out_dir/sinks/ — allow
# only names that cannot escape or nest (no separators, no '.'/'..')
_SINK_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _check_sink_name(name: str) -> None:
    if not name or not _SINK_NAME_RE.match(name) or name in (".", ".."):
        raise ValueError(
            f"router: sink name {name!r} is not a safe path component "
            "(allowed: [A-Za-z0-9][A-Za-z0-9._-]*)")


@dataclass(frozen=True)
class Predicate:
    """One condition on one column. All predicates in a rule must hold (AND)."""

    column: str
    op: str
    value: Any

    def __post_init__(self) -> None:
        if self.op not in _VALID_OPS:
            raise ValueError(f"unknown predicate op {self.op!r}")
        if self.op in ("in", "not_in") and (
                isinstance(self.value, (str, bytes))
                or not hasattr(self.value, "__iter__")):
            # a string value would silently become per-CHARACTER membership
            # in the vectorized path (and substring containment in the
            # oracle) — demand an explicit sequence of values
            raise ValueError(
                f"predicate {self.op!r} on {self.column!r} needs a "
                f"list/tuple of values, got {type(self.value).__name__}")


@dataclass(frozen=True)
class RouterRule:
    """first-match-wins rule: if all predicates hold, the row goes to ``sink``."""

    sink: str
    when: tuple[Predicate, ...]


@dataclass
class RouterConfig:
    rules: tuple[RouterRule, ...]
    default_sink: str = "default"

    def validate(self) -> None:
        if not self.default_sink:
            raise ValueError("router: default sink is mandatory")
        _check_sink_name(self.default_sink)
        for r in self.rules:
            if not r.sink:
                raise ValueError("router: rule with empty sink")
            _check_sink_name(r.sink)

    @property
    def sinks(self) -> tuple[str, ...]:
        names: list[str] = []
        for r in self.rules:
            if r.sink not in names:
                names.append(r.sink)
        if self.default_sink not in names:
            names.append(self.default_sink)
        return tuple(names)


def default_router() -> RouterConfig:
    """Flagship rule set: quarantine failures, then key on source/priority.

    Mirrors the reference's routing of parse failures away from the index and
    per-site output selection (SURVEY.md §1.1 index records; BASELINE.json).
    """
    return RouterConfig(
        rules=(
            RouterRule(
                sink="quarantine",
                when=(Predicate("parse_class", "ne", S.CLASS_OK),),
            ),
            RouterRule(
                sink="hot",
                when=(Predicate("meta_priority", "ge", 3),),
            ),
            RouterRule(
                sink="sectioned",
                when=(Predicate("n_sections", "gt", 1),),
            ),
            RouterRule(
                sink="archive_a",
                when=(Predicate("source", "regex", r"^src\d*[02468]$"),),
            ),
        ),
        default_sink="archive_b",
    )


@dataclass
class PipelineSpec:
    """Everything a flagship run needs (SURVEY.md §3.1)."""

    vocab_size: int = S.DEFAULT_VOCAB_SIZE
    max_tokens: int = S.MAX_TOKENS
    router: RouterConfig = field(default_factory=default_router)
    hist_bins: int = 64          # A3: fixed-width bins over [0, max_tokens]
    num_salts: int = 16          # §4.3 salting factor for skewed groupbys
    batch_size: int = 8192       # per-stage map_batches batch size
    # ST1/ST2 actor pool (min, max): min=1 so two pools + the stateless parse
    # tasks can't starve each other of CPUs on small hosts; Ray autoscales up.
    enrich_concurrency: tuple[int, int] = (1, 8)
    target_partition_rows: int = 250_000  # runner partition granularity

    def __post_init__(self) -> None:
        self.router.validate()

    @property
    def hist_bin_width(self) -> int:
        return max(1, self.max_tokens // self.hist_bins)


def router_from_dict(d: dict) -> RouterConfig:
    """Data-driven router rules (SURVEY.md §2.10), e.g.::

        {"default_sink": "rest",
         "rules": [{"sink": "quarantine",
                    "when": [{"column": "parse_class", "op": "ne",
                              "value": "ok"}]}]}
    """
    rules = tuple(
        RouterRule(sink=r["sink"],
                   when=tuple(Predicate(p["column"], p["op"], p["value"])
                              for p in r.get("when", [])))
        for r in d.get("rules", ()))
    rc = RouterConfig(rules=rules, default_sink=d.get("default_sink", "default"))
    rc.validate()
    return rc


def spec_from_dict(d: dict) -> PipelineSpec:
    """Build a PipelineSpec from a plain dict (JSON config file / CLI)."""
    kwargs = {k: d[k] for k in ("vocab_size", "max_tokens", "hist_bins",
                                "num_salts", "batch_size",
                                "target_partition_rows") if k in d}
    if "enrich_concurrency" in d:
        kwargs["enrich_concurrency"] = tuple(d["enrich_concurrency"])
    if "router" in d:
        kwargs["router"] = router_from_dict(d["router"])
    return PipelineSpec(**kwargs)


def spec_to_dict(spec: PipelineSpec) -> dict:
    return {
        "vocab_size": spec.vocab_size,
        "max_tokens": spec.max_tokens,
        "hist_bins": spec.hist_bins,
        "num_salts": spec.num_salts,
        "batch_size": spec.batch_size,
        "target_partition_rows": spec.target_partition_rows,
        "enrich_concurrency": list(spec.enrich_concurrency),
        "router": {
            "default_sink": spec.router.default_sink,
            "rules": [{"sink": r.sink,
                       "when": [{"column": p.column, "op": p.op,
                                 "value": p.value} for p in r.when]}
                      for r in spec.router.rules],
        },
    }


def bridge_spec() -> PipelineSpec:
    """Spec for corpora produced by the documents→sequences bridge
    (vocab = 31 words + specials; FIXTURES.md §1)."""
    return PipelineSpec(vocab_size=S.BRIDGE_VOCAB_SIZE)
