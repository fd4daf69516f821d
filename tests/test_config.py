"""Config round-trip + data-driven router + UDF stage hook (SURVEY.md §2.10)."""

from __future__ import annotations

import numpy as np

from blog_parser_ray.config import (PipelineSpec, router_from_dict,
                                    spec_from_dict, spec_to_dict)
import pyarrow as pa

from blog_parser_ray import oracle, synth

from blog_parser_ray.pipelines.flagship import default_dim
from blog_parser_ray.stages.enrich import enrich_batch
from blog_parser_ray.stages.parse import parse_batch
from blog_parser_ray.stages.route import route_batch


def test_spec_round_trip():
    spec = PipelineSpec(vocab_size=99, num_salts=7)
    d = spec_to_dict(spec)
    spec2 = spec_from_dict(d)
    assert spec_to_dict(spec2) == d
    assert spec2.vocab_size == 99
    assert spec2.router.sinks == spec.router.sinks


def test_custom_router_from_dict_end_to_end():
    cfg = {
        "default_sink": "rest",
        "rules": [
            {"sink": "bad", "when": [
                {"column": "parse_class", "op": "ne", "value": "ok"}]},
            {"sink": "apac_short", "when": [
                {"column": "meta_region", "op": "eq", "value": "apac"},
                {"column": "n_tok", "op": "lt", "value": 64}]},
            {"sink": "named", "when": [
                {"column": "source", "op": "in", "value": ["src1", "src2"]}]},
        ],
    }
    spec = spec_from_dict({"router": cfg})
    assert spec.router.sinks == ("bad", "apac_short", "named", "rest")

    t = synth.synth_table(np.arange(4000), seed=13)
    b = parse_batch(t, vocab_size=spec.vocab_size)
    b = enrich_batch(b, default_dim())
    b = route_batch(b, spec.router)
    odim = oracle.build_dim([f"src{i}" for i in range(1000)])
    res = oracle.run_flagship(t.to_pylist(), odim, spec)
    eng = sorted((r["doc_id"], r["sink"]) for r in b.to_pylist())
    ora = sorted((r["doc_id"], r["sink"]) for r in res["routed"])
    assert eng == ora
    assert len({s for _, s in eng}) >= 3  # multiple rules actually fired


def test_invalid_configs_rejected():
    import pytest

    with pytest.raises(ValueError):
        router_from_dict({"default_sink": "", "rules": []})
    with pytest.raises(ValueError):
        router_from_dict({"rules": [{"sink": "x", "when": [
            {"column": "a", "op": "bogus", "value": 1}]}]})


def test_udf_stage_hook():
    """Any (pa.Table) -> pa.Table callable slots in as a stage (§2.10)."""
    import ray.data as rd

    def my_udf(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "double_ntok", pa.array(batch["n_tok"].to_numpy() * 2,
                                    type=pa.int32()))

    t = synth.synth_table(np.arange(100), seed=1)
    out = rd.from_arrow(t).map_batches(my_udf, batch_format="pyarrow").to_pandas()
    assert (out["double_ntok"] == out["n_tok"] * 2).all()


def test_cli_config_end_to_end(tmp_path):
    """--config JSON drives a real CLI run in a fresh process (custom router
    rules visible in the output sink layout)."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    t = synth.synth_table(np.arange(3000), seed=2)
    pq.write_table(t, str(corpus / "c.parquet"), row_group_size=1000)
    cfg = {"router": {
        "default_sink": "everything_else",
        "rules": [{"sink": "quarantine", "when": [
            {"column": "parse_class", "op": "ne", "value": "ok"}]}],
    }}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "blog_parser_ray.run", "--input", str(corpus),
         "--output", str(out), "--config", str(cfg_path), "--cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["conserved"]
    sinks = sorted(os.listdir(out / "sinks"))
    assert sinks == ["everything_else", "quarantine"]


def test_predicate_and_sink_name_validation():
    import pytest as _pytest

    from blog_parser_ray.config import (Predicate, RouterConfig, RouterRule)

    # in/not_in with a STRING would become per-character membership — reject
    with _pytest.raises(ValueError, match="list/tuple"):
        Predicate("parse_class", "in", "ok")
    Predicate("parse_class", "in", ["ok"])  # sequence form is fine

    # sink names become path components — separators/traversal rejected
    for bad in ("../evil", "a/b", "..", ".hidden"):
        rc = RouterConfig(rules=(RouterRule(sink=bad, when=()),),
                          default_sink="rest")
        with _pytest.raises(ValueError, match="sink name"):
            rc.validate()


def test_router_not_in_null_semantics():
    """not_in over a NULL value must be False (oracle._pred_holds parity) —
    pc.is_in returns False for nulls, so a bare invert would match them."""
    import pyarrow as pa

    from blog_parser_ray.config import (Predicate, RouterConfig, RouterRule)
    from blog_parser_ray.stages.route import route_batch

    rc = RouterConfig(rules=(
        RouterRule(sink="keep",
                   when=(Predicate("tenant", "not_in", ["t1"]),)),),
        default_sink="rest")
    batch = pa.table({"tenant": pa.array([None, "t1", "t2"],
                                         type=pa.string())})
    out = route_batch(batch, rc)
    assert out["sink"].to_pylist() == ["rest", "rest", "keep"]
