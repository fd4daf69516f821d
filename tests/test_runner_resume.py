"""Layer-4: resumable runner — conservation, idempotent re-run, fault
injection, and the SIGKILL kill-test (SURVEY.md §5.5)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blog_parser_ray import oracle, runner, synth
from blog_parser_ray.config import PipelineSpec
from blog_parser_ray.sources.readers import plan_partitions

N_ROWS = 12000
SEED = 17


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    t = synth.synth_table(np.arange(N_ROWS), seed=SEED)
    pq.write_table(t.slice(0, 7000), str(d / "a.parquet"), row_group_size=1500)
    pq.write_table(t.slice(7000), str(d / "b.parquet"), row_group_size=1500)
    return str(d)


def read_sinks(out_dir: str) -> pa.Table:
    import pyarrow.dataset as pads
    return pads.dataset(os.path.join(out_dir, "sinks")).to_table()


def test_plan_is_deterministic(corpus):
    p1 = plan_partitions(corpus, target_rows=3000)
    p2 = plan_partitions(corpus, target_rows=3000)
    assert p1 == p2
    assert sum(p.num_rows for p in p1) == N_ROWS
    assert [p.partition_id for p in p1] == list(range(len(p1)))


def test_run_conserves_and_matches_oracle(corpus, tmp_path):
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    summary = runner.run(corpus, out, spec)
    assert summary["conserved"], summary
    assert summary["sink_rows"] == N_ROWS

    t = synth.synth_table(np.arange(N_ROWS), seed=SEED)
    res = oracle.run_flagship(
        t.to_pylist(), oracle.build_dim([f"src{i}" for i in range(1000)]), spec)
    counts = pq.read_table(os.path.join(out, "_aggregates", "per_sink_counts"))
    eng = {(r["sink"], r["source"], r["parse_class"]): r["cnt"]
           for r in counts.to_pylist()}
    assert eng == dict(res["per_sink_counts"])

    # routed-row equality, order-insensitive (sorted by doc_id + sink)
    routed = read_sinks(out).to_pylist()
    routed.sort(key=lambda r: (r["doc_id"], r["sink"]))
    expected = sorted(res["routed"], key=lambda r: (r["doc_id"], r["sink"]))
    assert len(routed) == len(expected)
    for e, o in zip(routed, expected):
        assert e["doc_id"] == o["doc_id"] and e["sink"] == o["sink"]
        assert e["tokens"] == o["tokens"]


def test_fresh_run_refuses_existing_manifest(corpus, tmp_path):
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=6000)
    runner.run(corpus, out, spec)
    with pytest.raises(RuntimeError, match="resume"):
        runner.run(corpus, out, spec)


def test_resume_skips_committed(corpus, tmp_path):
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    s1 = runner.run(corpus, out, spec)
    s2 = runner.run(corpus, out, spec, resume=True)
    assert s2["partitions_run"] == 0
    assert s2["partitions_skipped"] == s1["partitions_total"]
    assert s2["conserved"]


def test_injected_failure_then_resume(corpus, tmp_path):
    """A partition whose writer crashes (after Ray's retries) is absent from
    the manifest; resume completes exactly the missing work."""
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    with pytest.raises(Exception):
        runner.run(corpus, out, spec, inject_fail=frozenset({2}))
    committed = {int(k) for k in
                 json_lines(os.path.join(out, "_manifest", "manifest.jsonl"))}
    assert 2 not in committed
    s = runner.run(corpus, out, spec, resume=True)
    assert s["conserved"]
    assert s["sink_rows"] == N_ROWS


def json_lines(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                out.append(json.loads(line)["partition_id"])
            except json.JSONDecodeError:
                continue  # torn line — same skip rule as Manifest.committed
    return out


KILL_SCRIPT = r"""
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from blog_parser_ray import runner
from blog_parser_ray.config import PipelineSpec
corpus, out = sys.argv[1], sys.argv[2]
print("READY", flush=True)
runner.run(corpus, out, PipelineSpec(target_partition_rows=1500))
print("DONE", flush=True)
"""


def test_kill_and_resume(corpus, tmp_path):
    """SIGKILL mid-run, then resume; final sinks equal an uninterrupted run's
    (row-level, order-insensitive) with no duplicate partition ids."""
    out = str(tmp_path / "out_killed")
    ref_out = str(tmp_path / "out_ref")
    spec = PipelineSpec(target_partition_rows=1500)
    runner.run(corpus, ref_out, spec)

    script = str(tmp_path / "kill_script.py")
    with open(script, "w") as f:
        f.write(KILL_SCRIPT)
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen([sys.executable, script, corpus, out],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, cwd="/root/repo", env=env,
                            start_new_session=True)
    manifest_path = os.path.join(out, "_manifest", "manifest.jsonl")
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weak) run
        if os.path.exists(manifest_path) and len(json_lines(manifest_path)) >= 2:
            # kill the whole session group: driver + its ray daemons
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            killed = True
            break
        time.sleep(0.1)
    proc.wait(timeout=60)

    committed_mid = json_lines(manifest_path)
    assert len(committed_mid) == len(set(committed_mid)), "duplicate partition ids"
    if killed:
        assert len(committed_mid) < len(plan_partitions(corpus, 1500))

    s = runner.run(corpus, out, spec, resume=True)
    assert s["conserved"]
    final_ids = json_lines(manifest_path)
    assert sorted(final_ids) == sorted(set(final_ids))

    got = read_sinks(out).to_pylist()
    want = read_sinks(ref_out).to_pylist()
    key = lambda r: (r["doc_id"], r["sink"])
    got.sort(key=key)
    want.sort(key=key)
    assert len(got) == len(want) == N_ROWS
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"] and g["sink"] == w["sink"]
        assert g["tokens"] == w["tokens"]


def test_aggregates_byte_identical_across_reruns(corpus, tmp_path):
    """SURVEY.md §5.4: re-running (resume no-op) leaves byte-identical
    aggregate files — the aggregate step is a pure function of committed
    output."""
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    runner.run(corpus, out, spec)

    def agg_bytes():
        blobs = {}
        for root, _d, files in os.walk(os.path.join(out, "_aggregates")):
            for f in sorted(files):
                with open(os.path.join(root, f), "rb") as fh:
                    blobs[os.path.join(os.path.basename(root), f)] = fh.read()
        return blobs

    first = agg_bytes()
    runner.run(corpus, out, spec, resume=True)
    second = agg_bytes()
    assert first.keys() == second.keys()
    for k in first:
        assert first[k] == second[k], f"aggregate file {k} changed bytes"


def test_task_retry_does_not_double_write(corpus, tmp_path):
    """A partition that fails its FIRST attempt (then succeeds on Ray's
    retry) must end committed exactly once with no duplicate rows — the
    idempotent tmp+rename path under real task retries (SURVEY.md §7.4 #1)."""
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    s = runner.run(corpus, out, spec, fail_once=frozenset({1, 3}))
    assert s["conserved"], s
    assert s["sink_rows"] == N_ROWS
    pids = json_lines(os.path.join(out, "_manifest", "manifest.jsonl"))
    assert sorted(pids) == sorted(set(pids))
    # the retried partitions actually went through the fail-once path
    for pid in (1, 3):
        assert os.path.exists(
            os.path.join(out, "_tmp", f"fail_once_{pid:06d}.marker"))


def test_resume_rejects_changed_plan(corpus, tmp_path):
    """Resuming with a different partition granularity must fail loudly —
    partition ids would map to different fragments and skip wrong data."""
    out = str(tmp_path / "out")
    runner.run(corpus, out, PipelineSpec(target_partition_rows=3000))
    with pytest.raises(RuntimeError, match="plan changed"):
        runner.run(corpus, out, PipelineSpec(target_partition_rows=1500),
                   resume=True)


def test_torn_manifest_line_recovers(corpus, tmp_path):
    """A crash can leave a torn (truncated) final manifest line; committed()
    skips it and resume re-runs exactly that partition."""
    out = str(tmp_path / "out")
    spec = PipelineSpec(target_partition_rows=3000)
    runner.run(corpus, out, spec)
    mpath = os.path.join(out, "_manifest", "manifest.jsonl")
    lines = open(mpath).read().splitlines()
    torn = lines[:-1] + [lines[-1][: len(lines[-1]) // 2]]  # truncate last
    with open(mpath, "w") as f:
        f.write("\n".join(torn) + "\n")  # no trailing full record
    s = runner.run(corpus, out, spec, resume=True)
    assert s["partitions_run"] == 1          # only the torn one re-ran
    assert s["conserved"]
    assert s["sink_rows"] == N_ROWS
    pids = json_lines(mpath)
    assert sorted(set(pids)) == sorted(range(s["partitions_total"]))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("GRAFT_SLOW") != "1",
                    reason="bench-scale kill test; set GRAFT_SLOW=1 "
                           "(r4 VERDICT #6 — recorded run in "
                           "BENCH/kill_resume_bench_r5.json)")
def test_kill_and_resume_bench_scale(tmp_path):
    """SIGKILL at ~50% of manifest lines on a 1M-row corpus via the real
    CLI (own process group), resume, and require every sink parquet file
    and aggregate file to be sha256-IDENTICAL to an uninterrupted run —
    the bench-scale variant of test_kill_and_resume (full 4M-row record
    lives in BENCH/kill_resume_bench_r5.json)."""
    import hashlib

    corpus = str(tmp_path / "corpus")
    ref = str(tmp_path / "ref")
    killed = str(tmp_path / "killed")
    subprocess.run([sys.executable, "-m", "blog_parser_ray.run", "--synth",
                    "1000000", "--output", corpus, "--seed", "7",
                    "--cpus", "8"], check=True, capture_output=True,
                   cwd="/root/repo")

    def cli(out, *extra):
        return [sys.executable, "-m", "blog_parser_ray.run", "--input",
                corpus, "--output", out, "--cpus", "8",
                "--partition-rows", "50000", *extra]

    r = subprocess.run(cli(ref), check=True, capture_output=True, text=True,
                       cwd="/root/repo")
    total = json.loads(r.stdout.strip().splitlines()[-1])["partitions_total"]

    proc = subprocess.Popen(cli(killed), stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd="/root/repo",
                            start_new_session=True)
    manifest = os.path.join(killed, "_manifest", "manifest.jsonl")
    deadline = time.time() + 300
    hit = False
    try:
        while time.time() < deadline and proc.poll() is None:
            n = 0
            if os.path.exists(manifest):
                with open(manifest) as f:
                    n = sum(1 for _ in f)
            if n >= total // 2:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                hit = True
                break
            time.sleep(0.05)
    finally:
        if proc.poll() is None and not hit:
            # deadline lapsed with the child alive (overloaded host):
            # kill the whole group anyway so the 8-CPU run can't orphan
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait(timeout=120)
    assert hit, ("kill never fired: the run either finished early "
                 "(corpus too small) or stalled past the 300s deadline")
    time.sleep(3)
    subprocess.run(cli(killed, "--resume"), check=True, capture_output=True,
                   cwd="/root/repo")

    def hashes(out):
        d = {}
        for sub in ("sinks", "_aggregates"):
            base = os.path.join(out, sub)
            for root, _dd, files in os.walk(base):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        d[sub + "/" + os.path.relpath(p, base)] = (
                            hashlib.sha256(fh.read()).hexdigest())
        return d

    h_ref, h_kill = hashes(ref), hashes(killed)
    assert h_ref == h_kill
