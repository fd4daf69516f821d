"""Benchmark harness (BASELINE.md protocol; SURVEY.md §4.5).

    python bench.py              # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # N=2 vs 4N=8 (and 32) CPUs in fresh subprocesses

Headline metric: end-to-end flagship wall seconds (parse → enrich → route →
per-sink write → aggregate) over a deterministic ≥600k-row synthetic corpus
(seed 42, Zipf-skewed sources), matching BASELINE.json's target metric. The
corpus is generated once into a cache dir and reused (generation excluded
from timing; each timed level runs twice, second run reported, so the page
cache is warm for both levels).

Prints ONE JSON line:
  {"metric": "e2e_flagship_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "rows_per_s": ..., "tokens_per_s": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_ROWS = 4_000_000
BENCH_SEED = 42
CORPUS_CACHE = f"/tmp/bpr_bench_corpus_{BENCH_ROWS}_s{BENCH_SEED}"

QUERY_NAMES = [
    "per_sink_counts", "lineitem_by_flag", "orders_customers",
    "tumbling_daily", "dedup_docs", "sorted_counts", "json_funcs",
    "knn_cosine", "dedup_minhash", "word_counts", "session_counts",
    "qty_quantiles", "asof_orders", "orders_rank", "events_lag_delta",
    "orders_cumspend",
]


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS_CACHE, "_DONE")
    if os.path.exists(marker):
        return CORPUS_CACHE
    shutil.rmtree(CORPUS_CACHE, ignore_errors=True)
    import numpy as np
    import pyarrow.parquet as pq

    from blog_parser_ray.synth import synth_table

    os.makedirs(CORPUS_CACHE)
    # 16 files × 50k-row row groups → 80 plannable partitions at 50k target
    n_files = 16
    per_file = BENCH_ROWS // n_files
    for i in range(n_files):
        t = synth_table(np.arange(i * per_file, (i + 1) * per_file),
                        seed=BENCH_SEED)
        pq.write_table(t, f"{CORPUS_CACHE}/part-{i:02d}.parquet",
                       row_group_size=50_000)
    with open(marker, "w") as f:
        f.write("ok")
    return CORPUS_CACHE


def drain(result) -> int:
    """Consume a query result without holding it (rows returned)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        n = 0
        for b in result.iter_batches(batch_size=None, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(result, (pa.Table, pd.DataFrame)):
        return len(result)
    return 0


def _loadavg() -> list[float]:
    """Host 1/5/15-min load averages — recorded in every result so each
    sample carries its own external-tenant-load evidence (this shared VM
    has documented load windows that move walls by 1.5x; see
    BENCH/BASELINE.md)."""
    try:
        with open("/proc/loadavg") as f:
            return [round(float(x), 2) for x in f.read().split()[:3]]
    except OSError:
        return []


def run_once(num_cpus: int, sf_dir: str) -> dict:
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from blog_parser_ray.config import PipelineSpec
    from blog_parser_ray.runner import run as flagship_run

    load_start = _loadavg()
    corpus = ensure_corpus()
    spec = PipelineSpec(target_partition_rows=50_000)

    # headline: TWO warm-up runs + three timed runs, report the MEDIAN. Two
    # warm-ups, not one: measured repeatedly, the first TWO runs in a fresh
    # Ray session pay worker/actor spin-up (~6 s vs ~3 s steady state; the
    # whole gap is in the sink-write phase), and the shared VM's IO/memory
    # subsystem is noisy enough that a single sample can be 2x off.
    walls: list[float] = []
    tokens = rows = None
    # BPR_BENCH_RUNS trims the schedule for the interleaved scaling windows
    # (3 → 2 warm-ups + 1 timed run); default 5 = 2 warm-ups + 3 timed.
    n_runs = max(3, int(os.environ.get("BPR_BENCH_RUNS", "5")))
    for attempt in range(n_runs):
        out = f"/dev/shm/bpr_bench_out_{num_cpus}_{attempt}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.monotonic()
        summary = flagship_run(corpus, out, spec, write_metrics=False)
        wall = time.monotonic() - t0
        if attempt > 1:
            walls.append(wall)
        assert summary["conserved"], summary
        rows = summary["sink_rows"]
        tokens = summary.get("manifest_rows") and _manifest_tokens(out)
        shutil.rmtree(out, ignore_errors=True)
    wall = sorted(walls)[len(walls) // 2]

    # disk-sink accounting: the same pipeline with sinks on real disk
    # (/tmp, virtio-backed) instead of tmpfs — reported alongside so a
    # driver/recorded wall gap can be attributed to sink-write IO rather
    # than guessed at. One warm-up + three timed runs, median (an even
    # sample count would report the max, not a median).
    disk_walls: list[float] = []
    if os.environ.get("BPR_BENCH_DISK", "1") != "0":
        for attempt in range(4):
            out = f"/tmp/bpr_bench_diskout_{num_cpus}_{attempt}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.monotonic()
            summary = flagship_run(corpus, out, spec, write_metrics=False)
            dwall = time.monotonic() - t0
            if attempt > 0:
                disk_walls.append(dwall)
            assert summary["conserved"], summary
            shutil.rmtree(out, ignore_errors=True)
    disk_wall = (sorted(disk_walls)[len(disk_walls) // 2]
                 if disk_walls else None)

    from blog_parser_ray.pipelines.queries import QUERIES, _read

    def dedup_minhash_raw(sf):
        # the registry's dedup_minhash now runs the planted-oracle variant
        # (2x corpus: every 17th doc duplicated for the driver's hash
        # check); benchmark the raw operator on the unmodified corpus so
        # per-round walls stay comparable with r1-r4
        from blog_parser_ray.functions.dedup import minhash_dedup_pairs
        return minhash_dedup_pairs(
            _read(sf, "documents", ["doc_id", "text"]), threshold=0.5)

    bench_fns = dict(QUERIES)
    bench_fns["dedup_minhash"] = dedup_minhash_raw
    qtimes = {}
    if os.environ.get("BPR_BENCH_QUERIES", "1") != "0":
        for name in QUERY_NAMES:
            t0 = time.monotonic()
            drain(bench_fns[name](sf_dir))
            qtimes[name] = round(time.monotonic() - t0, 3)

    return {
        "metric": "e2e_flagship_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": rows,
        "walls": [round(w, 3) for w in walls],
        "tmpfs_sink_sec": round(wall, 3),
        "disk_sink_sec": round(disk_wall, 3) if disk_wall else None,
        "disk_walls": [round(w, 3) for w in disk_walls],
        "rows_per_s": round(rows / wall, 1),
        "tokens": tokens,
        "tokens_per_s": round(tokens / wall, 1) if tokens else None,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }


def _manifest_tokens(out_dir: str) -> int:
    total = 0
    with open(os.path.join(out_dir, "_manifest", "manifest.jsonl")) as f:
        for line in f:
            if line.strip():
                total += json.loads(line)["token_count"]
    return total


def _bench_subprocess(ncpu: int, *, queries: bool, disk: bool,
                      runs: int | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               BPR_BENCH_QUERIES="1" if queries else "0",
               BPR_BENCH_DISK="1" if disk else "0")
    if runs is not None:
        env["BPR_BENCH_RUNS"] = str(runs)
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench subprocess (cpus={ncpu}) failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def scaling() -> dict:
    """N vs 4N CPUs in fresh processes (BASELINE.md protocol).

    N=2 → 4N=8: the sandbox VM's memory bandwidth saturates at ~8 GB/s with
    ~8 concurrent streams and then DEGRADES (measured; see BENCH/BASELINE.md),
    so parallelism levels beyond 8 measure the host's bandwidth ceiling, not
    the engine. 2→8 sits inside the linear-bandwidth envelope; the 32-CPU
    level is still run and reported for transparency.

    INTERLEAVED windows (r3 verdict #6): the 2- and 8-CPU levels run
    back-to-back inside each of three windows (2,8), (2,8), (2,8), so every
    per-window efficiency ratio is computed under ONE host-load condition —
    round 3's 0.714 outlier came from comparing levels measured an hour
    apart on the shared VM. Each level in a window is a fresh subprocess
    with 2 warm-up runs + 1 timed run; the headline value is the median of
    the per-window efficiencies.
    """
    windows: list[dict] = []
    for w in range(3):
        r2 = _bench_subprocess(2, queries=False, disk=False, runs=3)
        r8 = _bench_subprocess(8, queries=False, disk=False, runs=3)
        eff = (r2["value"] / r8["value"]) / (8 / 2)
        windows.append({"window": w, "sec_2": r2["value"],
                        "sec_8": r8["value"], "efficiency": round(eff, 3)})
    effs = sorted(x["efficiency"] for x in windows)
    t2s = sorted(x["sec_2"] for x in windows)
    t8s = sorted(x["sec_8"] for x in windows)
    t2, t8 = t2s[len(t2s) // 2], t8s[len(t8s) // 2]

    # one full 32-CPU pass (queries + disk accounting) for the report body
    r32 = _bench_subprocess(32, queries=True, disk=True)
    t32 = r32["value"]
    return {
        "metric": "scaling_efficiency",
        "value": effs[len(effs) // 2],
        "unit": "ratio",
        "levels": "N=2 vs 4N=8 CPUs, interleaved same-window pairs "
                  "(see BENCH/BASELINE.md for why not 8/32)",
        "windows": windows,
        "sec_2": t2,
        "sec_8": t8,
        "sec_32": t32,
        "efficiency_8_32": round((t8 / t32) / 4, 3),
        "rows_per_s_32": r32["rows_per_s"],
        "tokens_per_s_32": r32["tokens_per_s"],
        "num_cpus": 32,
        "sf": r32["sf"],
        "queries": r32["queries"],
    }


def main() -> int:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
        return 0
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    res = run_once(num_cpus, sf_dir)
    import ray
    ray.shutdown()
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
