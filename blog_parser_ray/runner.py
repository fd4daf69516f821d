"""Resumable flagship runner (SURVEY.md §3.1 entry point A, §3.3 resume).

Execution model: the deterministic partition plan (sources/readers.py) becomes
a small Dataset of partition specs; a pool of stateless ``process_partitions``
tasks maps over it (broadcast dim via ``ray.put`` arg), each task running the
full per-partition chain

    read fragment → parse → enrich → route → atomic per-sink write

using the SAME vectorized stage functions as the streaming pipeline
(stages/parse.py, enrich.py, route.py, sink.py). The partition is the unit of
work AND of commit: sink files are partition-suffixed and renamed into place,
the driver streams lineage rows as tasks finish and appends manifest lines
incrementally — so a SIGKILL at any point resumes from the last committed
partition without recomputing or double-writing (BASELINE.json north_rule).

Why per-partition tasks instead of chained whole-dataset ``map_batches`` for
the WRITE path: Ray Data may re-bundle blocks across tasks between stages, so
"all rows of partition P are in exactly one writer task" — the property the
atomic-rename commit needs — is only guaranteed when the partition boundary IS
the task boundary. The streaming executor still pipelines partitions through
the pool with backpressure; at 100 TB the plan is just a longer list (the spec
dataset is tiny: one row per fragment).

Stage 8 aggregates (per-sink counts A2, n_tok histograms A3) re-read the
COMMITTED sinks — a pure function of committed output, shared verbatim between
fresh and resumed runs (SURVEY.md §3.1 step 8 rationale).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import pyarrow as pa
import ray
import ray.data as rd

from . import schema as S
from .config import PipelineSpec
from .sources.readers import PartitionSpec, plan_partitions, read_partition
from .stages import agg
from .stages.enrich import enrich_batch
from .stages.parse import parse_batch
from .stages.route import route_batch
from .stages.sink import write_partition_sinks
from .state.manifest import Manifest


def process_partitions(batch: pa.Table, dim_ref, spec: PipelineSpec,
                       out_dir: str,
                       inject_fail: frozenset = frozenset(),
                       fail_once: frozenset = frozenset()) -> pa.Table:
    """Stateless task over partition specs: read → parse → enrich → route →
    atomic per-sink write, returning lineage rows.

    A plain function (task pool), not an actor pool: the only state is the
    broadcast dim table, and ``ray.get`` on an ObjectRef is a zero-copy
    shared-memory read — so tasks keep the broadcast pattern while gaining
    elastic scheduling with no actor-pool ramp-up (SURVEY.md §4.2; the
    actor-pool form of the same stages lives in pipelines/flagship.py where
    per-actor state is genuinely loaded once)."""
    dim = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
    lineage: list[dict] = []
    for row in batch.to_pylist():
        spec_row = PartitionSpec(
            partition_id=row["partition_id"], path=row["path"],
            rg_start=row["rg_start"], rg_end=row["rg_end"],
            num_rows=row["num_rows"])
        t = read_partition(spec_row, columns=list(S.SEQUENCES_SCHEMA.names))
        t = parse_batch(t, vocab_size=spec.vocab_size,
                        max_tokens=spec.max_tokens)
        t = enrich_batch(t, dim)
        t = route_batch(t, spec.router)
        lineage.extend(write_partition_sinks(
            t, out_dir, spec_row.partition_id, spec_row.fragment,
            inject_fail=inject_fail, fail_once=fail_once))
    if not lineage:
        return S.LINEAGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(lineage, schema=S.LINEAGE_SCHEMA)


def run(input_dir: str, out_dir: str, spec: PipelineSpec | None = None,
        dim: pa.Table | None = None, *, resume: bool = False,
        concurrency: tuple[int, int] | int | None = None,
        write_metrics: bool = True,
        inject_fail: frozenset = frozenset(),
        fail_once: frozenset = frozenset()) -> dict:
    """Run (or resume) the flagship pipeline. Returns a summary dict."""
    t_start = time.monotonic()
    spec = spec or PipelineSpec()
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)

    plan = plan_partitions(input_dir, target_rows=spec.target_partition_rows)
    if not plan:
        raise FileNotFoundError(
            f"no parquet input under {input_dir} (nothing to plan)")
    committed = manifest.committed() if resume else {}
    if not resume and manifest.committed():
        raise RuntimeError(
            f"{out_dir} already has a manifest; pass resume=True or use a "
            "fresh output directory (refusing to double-write)")
    # resume safety: a committed partition id must refer to the SAME input
    # fragment in the current plan — otherwise the plan changed (different
    # target_partition_rows or mutated input) and skipping by id would skip
    # the wrong data.
    by_id = {p.partition_id: p for p in plan}
    for pid, rec in committed.items():
        current = by_id.get(pid)
        if current is None or rec.get("input_fragment") != current.fragment:
            raise RuntimeError(
                f"manifest partition {pid} maps to "
                f"{rec.get('input_fragment')!r} but the current plan has "
                f"{current.fragment if current else 'no such partition'!r}; "
                "the partition plan changed (different target_partition_rows "
                "or modified input) — resume with the original spec")
    todo = [p for p in plan if p.partition_id not in committed]

    summary = {
        "partitions_total": len(plan),
        "partitions_skipped": len(plan) - len(todo),
        "partitions_run": len(todo),
    }

    if todo:
        if dim is None:
            from .pipelines.flagship import default_dim
            dim = default_dim()
        dim_ref = ray.put(dim)
        specs_ds = rd.from_items([asdict(p) for p in todo])
        # function stages only accept an int concurrency (tuples are for
        # callable-class actor pools); honor a tuple caller by its max
        if isinstance(concurrency, tuple):
            concurrency = max(concurrency)
        lineage_ds = specs_ds.map_batches(
            process_partitions,
            fn_args=(dim_ref, spec, out_dir, inject_fail, fail_once),
            batch_size=1, batch_format="pyarrow", num_cpus=1,
            # transient write failures retry safely: the atomic tmp+rename
            # commit makes re-execution idempotent (SURVEY.md §7.4 item 1)
            retry_exceptions=True, max_retries=3,
            **({"concurrency": concurrency} if concurrency else {}))
        # stream lineage as partitions finish → incremental commit (§3.3)
        done_rows = 0
        # batch_size=None → one batch per finished task = per-partition commits
        for lb in lineage_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            recs = lb.to_pylist()
            by_pid: dict[int, list[dict]] = {}
            for r in recs:
                by_pid.setdefault(r["partition_id"], []).append(r)
            for pid, rs in sorted(by_pid.items()):
                manifest.append({
                    "partition_id": pid,
                    "input_fragment": rs[0]["input_fragment"],
                    "row_count": sum(r["row_count"] for r in rs),
                    "token_count": sum(r["token_count"] for r in rs),
                    "bytes_written": sum(r["bytes_written"] for r in rs),
                    "per_sink": {r["sink"]: r["row_count"] for r in rs},
                    "attempt": max(r["attempt"] for r in rs),
                    "wall_s": rs[0]["wall_s"],
                })
                done_rows += sum(r["row_count"] for r in rs)
        summary["rows_written"] = done_rows
        summary["stats"] = lineage_ds.stats()  # Ray Data per-stage breakdown
    summary["write_phase_s"] = round(time.monotonic() - t_start, 3)

    # ---- stage 8: aggregates over COMMITTED output (one read-back pass) ---
    import pyarrow.parquet as pq

    sinks_dir = os.path.join(out_dir, "sinks")
    agg_dir = os.path.join(out_dir, "_aggregates")
    # read only committed sink dirs: a crash inside compact_sinks can leave
    # stale `X.old` / `X.compact` siblings whose rows would double-count
    sink_files = [os.path.join(sinks_dir, d, f)
                  for d in sorted(os.listdir(sinks_dir))
                  if os.path.isdir(os.path.join(sinks_dir, d))
                  and not d.endswith((".old", ".compact"))
                  for f in sorted(os.listdir(os.path.join(sinks_dir, d)))
                  if f.endswith(".parquet")]
    routed = rd.read_parquet(sink_files, columns=["sink", "source",
                                                  "parse_class", "tok_len"])
    counts, hist = agg.per_sink_counts_and_hist(
        routed, bin_width=spec.hist_bin_width, max_tokens=spec.max_tokens)
    tmp_agg = agg_dir + ".tmp"
    import shutil
    # stage the replacement FULLY before touching the live dir: a crash
    # mid-write leaves the old aggregates intact (tmp is rebuilt next run);
    # the unprotected window is only the rmtree→replace pair below
    shutil.rmtree(tmp_agg, ignore_errors=True)
    os.makedirs(os.path.join(tmp_agg, "per_sink_counts"))
    os.makedirs(os.path.join(tmp_agg, "ntok_hist"))
    pq.write_table(counts.sort_by([("sink", "ascending"),
                                   ("source", "ascending"),
                                   ("parse_class", "ascending")]),
                   os.path.join(tmp_agg, "per_sink_counts", "part-0.parquet"))
    pq.write_table(hist.sort_by([("sink", "ascending"), ("bin", "ascending")]),
                   os.path.join(tmp_agg, "ntok_hist", "part-0.parquet"))
    shutil.rmtree(agg_dir, ignore_errors=True)
    os.replace(tmp_agg, agg_dir)

    # ---- conservation check + metrics (§3.1 step 9) -----------------------
    import pyarrow.compute as pc

    final_manifest = manifest.committed()
    manifest_rows = sum(r["row_count"] for r in final_manifest.values())
    plan_rows = sum(p.num_rows for p in plan)
    # row count from the aggregate read-back itself — no extra pass
    sink_rows = int(pc.sum(counts["cnt"]).as_py() or 0)
    summary.update({
        "plan_rows": plan_rows,
        "manifest_rows": manifest_rows,
        "sink_rows": sink_rows,
        "conserved": plan_rows == manifest_rows == sink_rows,
        "wall_s": round(time.monotonic() - t_start, 3),
    })
    if write_metrics:
        mdir = os.path.join(out_dir, "_metrics")
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, f"run-{int(time.time() * 1000)}.json"), "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
    return summary
