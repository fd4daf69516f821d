"""Layer-2/3: engine vs single-process oracle on synthetic corpora
(SURVEY.md §5.3, §5.4): routed-row equality, per-sink counts, histograms,
token pass-through, and parallelism/permutation invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from blog_parser_ray import oracle, synth
from blog_parser_ray import schema as S
from blog_parser_ray.config import PipelineSpec
from blog_parser_ray.pipelines.flagship import build_routed, default_dim
from blog_parser_ray.stages import agg
from blog_parser_ray.stages.enrich import enrich_batch
from blog_parser_ray.stages.parse import parse_batch
from blog_parser_ray.stages.route import route_batch

SPEC = PipelineSpec()
DIM = default_dim()
ODIM = oracle.build_dim([f"src{i}" for i in range(1000)])


def engine_routed_table(t: pa.Table, spec: PipelineSpec = SPEC) -> pa.Table:
    b = parse_batch(t, vocab_size=spec.vocab_size, max_tokens=spec.max_tokens)
    b = enrich_batch(b, DIM)
    return route_batch(b, spec.router)


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_routed_row_equality(seed):
    t = synth.synth_table(np.arange(8000), seed=seed)
    eng = engine_routed_table(t).to_pylist()
    ora = oracle.run_flagship(t.to_pylist(), ODIM, SPEC)["routed"]
    eng.sort(key=lambda r: r["doc_id"])
    ora.sort(key=lambda r: r["doc_id"])
    for e, o in zip(eng, ora):
        assert e["tokens"] == o["tokens"]          # pass-through invariant
        for k in ("doc_id", "source", "parse_class", "sink", "meta_tenant",
                  "meta_region", "meta_priority", "sink_hint", "n_sections"):
            assert e[k] == o[k], (k, e["doc_id"])


def test_per_sink_counts_and_hist_via_dataset():
    t = synth.synth_table(np.arange(12000), seed=3)
    ds = rd.from_arrow(t)
    routed = build_routed(ds, SPEC, DIM)
    counts = {(r["sink"], r["source"], r["parse_class"]): r["cnt"]
              for r in agg.per_sink_counts(routed).to_pandas().to_dict("records")}
    hist = {(r["sink"], r["bin"]): r["cnt"]
            for r in agg.ntok_histogram(routed, bin_width=SPEC.hist_bin_width)
            .to_pandas().to_dict("records")}
    res = oracle.run_flagship(t.to_pylist(), ODIM, SPEC)
    assert counts == dict(res["per_sink_counts"])
    assert hist == dict(res["hist"])


def test_parallelism_and_batchsize_invariance():
    """Identical A2 at different block counts / batch sizes (SURVEY.md §5.4)."""
    t = synth.synth_table(np.arange(6000), seed=9)
    results = []
    for blocks, bs in [(2, 4096), (16, 128)]:
        spec = PipelineSpec(batch_size=bs)
        ds = rd.from_arrow(t).repartition(blocks)
        routed = build_routed(ds, spec, DIM)
        c = agg.per_sink_counts(routed).to_pandas()
        results.append({(r["sink"], r["source"], r["parse_class"]): r["cnt"]
                        for r in c.to_dict("records")})
    assert results[0] == results[1]


def test_permutation_invariance():
    t = synth.synth_table(np.arange(5000), seed=5)
    perm = np.random.default_rng(0).permutation(5000)
    t_shuf = t.take(pa.array(perm))
    a = engine_routed_table(t)
    b = engine_routed_table(t_shuf)
    ca = a.group_by(["sink", "parse_class"]).aggregate([([], "count_all")])
    cb = b.group_by(["sink", "parse_class"]).aggregate([([], "count_all")])
    da = {(r["sink"], r["parse_class"]): r["count_all"] for r in ca.to_pylist()}
    db = {(r["sink"], r["parse_class"]): r["count_all"] for r in cb.to_pylist()}
    assert da == db


def test_salted_group_count_matches_plain():
    t = synth.synth_table(np.arange(10000), seed=21)
    ds = rd.from_arrow(t).repartition(8)
    plain = {r["source"]: r["cnt"]
             for r in agg.group_count(ds, ["source"]).to_pandas().to_dict("records")}
    salted = {r["source"]: r["cnt"]
              for r in agg.salted_group_count(ds, ["source"], "doc_id", 8)
              .to_pandas().to_dict("records")}
    assert plain == salted
    # skew sanity: hot key really is hot (Zipf) → salting path exercised
    assert max(plain.values()) > 10 * (sum(plain.values()) / len(plain))


def test_synth_determinism_and_batch_independence():
    a = synth.synth_table(np.arange(4000), seed=42)
    b = pa.concat_tables([synth.synth_table(np.arange(0, 1000), seed=42),
                          synth.synth_table(np.arange(1000, 4000), seed=42)])
    assert a.equals(b.combine_chunks())


def test_tokenize_bridge_invariants():
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    seq = synth.tokenize_documents(docs)
    S.assert_sequences_schema(seq.schema)
    out = parse_batch(seq, vocab_size=S.BRIDGE_VOCAB_SIZE)
    classes = set(out["parse_class"].to_pylist())
    assert classes == {S.CLASS_OK}  # bridge rows are all clean
    assert out["tokens"].combine_chunks().equals(seq["tokens"].combine_chunks())


def test_streaming_pipeline_matches_runner(tmp_path):
    """The pure-Dataset streaming form (write_parquet partition_cols) and the
    resumable runner produce identical per-sink counts."""
    import pyarrow.parquet as pq

    from blog_parser_ray import runner
    from blog_parser_ray.pipelines.flagship import run_streaming

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    t = synth.synth_table(np.arange(6000), seed=23)
    pq.write_table(t, str(corpus / "c.parquet"), row_group_size=1500)

    out_a = str(tmp_path / "out_stream")
    res = run_streaming(str(corpus), out_a, SPEC)
    assert res["sink_rows"] == 6000

    out_b = str(tmp_path / "out_runner")
    runner.run(str(corpus), out_b, PipelineSpec(target_partition_rows=1500))

    ca = pq.read_table(f"{out_a}/_aggregates/per_sink_counts.parquet").to_pylist()
    cb = pq.read_table(f"{out_b}/_aggregates/per_sink_counts").to_pylist()
    da = {(r["sink"], r["source"], r["parse_class"]): r["cnt"] for r in ca}
    db = {(r["sink"], r["source"], r["parse_class"]): r["cnt"] for r in cb}
    assert da == db
