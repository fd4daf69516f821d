"""Corpus-scale curation bench (r3 verdict #4).

Runs the end-to-end LLM curation chain (pipelines/curate.py) over a
DETERMINISTIC multi-million-row documents corpus with planted exact and
near duplicates (synth_documents_table: ~10% exact-dup rows, ~5% near-dup
rows), and reports

  1. the PRODUCTION wall (``with_funnel=False`` — one materialize before
     the near-dup stage, everything else streamed) plus packed-output drain,
  2. the per-stage attribution (``with_funnel=True`` — each stage's
     incremental materialize wall from the funnel), and
  3. each stage's STANDALONE operator cost over the same (materialized)
     input it sees inside the chain,

so the verdict's done-bar — "no stage >2x of its standalone operator
cost" — is a recorded measurement, not a claim. Prints ONE JSON line;
results are recorded in BENCH/BASELINE.md.

    RAY_GRAFT_CPUS=32 python tools/bench_curate.py [--rows 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SEED = 42


def ensure_docs_corpus(n_rows: int) -> str:
    cache = f"/tmp/bpr_curate_docs_{n_rows}_s{BENCH_SEED}"
    marker = os.path.join(cache, "_DONE")
    if os.path.exists(marker):
        return cache
    shutil.rmtree(cache, ignore_errors=True)
    import numpy as np
    import pyarrow.parquet as pq

    from blog_parser_ray.synth import synth_documents_table

    os.makedirs(cache)
    n_files = 16
    per_file = n_rows // n_files
    for i in range(n_files):
        t = synth_documents_table(
            np.arange(i * per_file, (i + 1) * per_file), seed=BENCH_SEED)
        pq.write_table(t, f"{cache}/part-{i:02d}.parquet",
                       row_group_size=50_000)
    with open(marker, "w") as f:
        f.write("ok")
    return cache


def drain(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += b.num_rows
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    args = ap.parse_args()

    import ray
    from ray.data import DataContext

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd  # noqa: F401

    from blog_parser_ray.functions.dedup import (apply_pair_dedup,
                                                 exact_dedup,
                                                 minhash_dedup_pairs_ds)
    from blog_parser_ray.pipelines.curate import (curate_corpus,
                                                  lang_keep_batch,
                                                  quality_keep_batch)
    from blog_parser_ray.sources.readers import read_parquet_clean

    corpus = ensure_docs_corpus(args.rows)

    def read():
        return read_parquet_clean(corpus)

    # --- 1. production wall (warm-up + timed) ------------------------------
    for attempt in range(2):
        t0 = time.monotonic()
        packed, _ = curate_corpus(read(), mixture=None, with_funnel=False)
        n_packed = drain(packed)
        production_wall = time.monotonic() - t0

    # --- 2. per-stage attribution inside the chain -------------------------
    t0 = time.monotonic()
    _, funnel = curate_corpus(read(), mixture=None, with_funnel=True)
    funnel_wall = time.monotonic() - t0

    # --- 3. standalone operator costs over the same inputs -----------------
    # rebuild the chain's materialized intermediates once, then time each
    # operator alone on its own input
    standalone: dict[str, float] = {}
    inp = read().materialize()

    t0 = time.monotonic()
    lang_out = inp.map_batches(lang_keep_batch, batch_format="pyarrow",
                               fn_kwargs={"lang": "en"}).materialize()
    standalone["lang"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    qual_out = lang_out.map_batches(
        quality_keep_batch, batch_format="pyarrow",
        fn_kwargs={"min_quality": 0.35}).materialize()
    standalone["quality"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    exact_out = exact_dedup(qual_out, "text", "doc_id").materialize()
    standalone["exact_dedup"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pairs = minhash_dedup_pairs_ds(exact_out, threshold=0.5)
    n_pairs = pairs.count()
    standalone["near_dup_pairs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    near_out = apply_pair_dedup(exact_out, pairs,
                                key_col="doc_id").materialize()
    standalone["near_dedup"] = round(time.monotonic() - t0, 3)

    ratios = {}
    chain = {stage: sec for stage, _n, sec in funnel}
    for stage, alone in standalone.items():
        if stage in chain and alone > 0:
            ratios[stage] = round(chain[stage] / alone, 2)

    out = {
        "metric": "curate_e2e_sec",
        "value": round(production_wall, 3),
        "unit": "sec",
        "rows": args.rows,
        "num_cpus": num_cpus,
        "packed_examples": n_packed,
        "near_dup_pairs": n_pairs,
        "survivors": near_out.count(),
        "funnel": [{"stage": s, "rows": n, "sec": sec}
                   for s, n, sec in funnel],
        "funnel_total_sec": round(funnel_wall, 3),
        "standalone_sec": standalone,
        "chain_vs_standalone_ratio": ratios,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
