"""ST3/S4: partition-local fan-out sink writer (SURVEY.md §2.1 S4, §4.3).

Recasts the reference's per-site/per-section index file outputs. Each routed
row lands in exactly one ``sinks/{sink}/part-{pid:06d}.parquet``. The writer is
partition-local: a partition groups ITS OWN rows by sink and writes one file
per (partition, sink) — there is NO shuffle on ``sink``, so router fan-out skew
(one sink taking 30%+ of rows) costs nothing (SURVEY.md §4.3). Per-sink file
count is O(partitions); compaction is a follow-up read if ever needed.

Atomicity: write under ``_tmp/{pid}/`` then ``os.replace`` into place — a Ray
task retry or a resumed run overwrites its own files and never touches other
partitions' committed files (exactly-once effect without exactly-once
execution; SURVEY.md §7.4 item 1).

Fault injection for tests: env ``BPR_FAIL_PARTITIONS="3,7"`` crashes the
writer on those partition ids on EVERY attempt (a permanent failure — use it
to test run-level failure and resume-after-fix); the ``fail_once`` kwarg
crashes only the first attempt per partition (a marker file survives the task
death), exercising Ray's task retry + idempotent-rename overwrite path.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def write_partition_sinks(table: pa.Table, out_dir: str, partition_id: int,
                          fragment: str, attempt: int = 0,
                          inject_fail: frozenset | None = None,
                          fail_once: frozenset | None = None) -> list[dict]:
    """Write one routed partition's rows into per-sink files; return lineage
    records (one per (partition, sink)) for the manifest."""
    t0 = time.monotonic()
    fail_env = os.environ.get("BPR_FAIL_PARTITIONS", "")
    fail_ids = {int(x) for x in fail_env.split(",") if x} | set(inject_fail or ())
    if partition_id in fail_ids:
        raise RuntimeError(f"injected failure for partition {partition_id}")
    if fail_once is not None and partition_id in fail_once:
        # fail the FIRST attempt only (marker file survives the task death),
        # exercising Ray's task retry + the idempotent-rename overwrite path
        marker = os.path.join(out_dir, "_tmp",
                              f"fail_once_{partition_id:06d}.marker")
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed-first-attempt")
            raise RuntimeError(
                f"injected one-shot failure for partition {partition_id}")
        attempt = max(attempt, 1)

    tmp_dir = os.path.join(out_dir, "_tmp", f"{partition_id:06d}")
    os.makedirs(tmp_dir, exist_ok=True)

    sink_col = table["sink"]
    if isinstance(sink_col, pa.ChunkedArray):
        sink_col = sink_col.combine_chunks()
    sinks = pc.unique(sink_col).to_pylist()

    lineage: list[dict] = []
    staged: list[tuple[str, str]] = []
    for sink in sorted(sinks):
        # defense-in-depth: sink values become path components (config
        # validation is the primary gate — see config._check_sink_name)
        if not sink or os.sep in sink or sink in (".", ".."):
            raise ValueError(f"unsafe sink name {sink!r}")
        sub = table.filter(pc.equal(sink_col, sink))
        tmp_path = os.path.join(tmp_dir, f"{sink}.parquet")
        # encoding choice is measured (50k-row partition, tmpfs): delta-packed
        # token values with no dictionary writes 40% faster and reads back 27%
        # faster than dictionary encoding at 1.5x its bytes (plain would be
        # 3.3x); this stage runs at full-node concurrency against the memory-
        # bandwidth ceiling, so encode/decode passes cost more than bytes
        if "tokens" in table.column_names:
            pq.write_table(sub, tmp_path, compression="NONE",
                           use_dictionary=False,
                           column_encoding={"tokens.list.element":
                                            "DELTA_BINARY_PACKED"})
        else:  # config-driven sinks without a token payload: default encoding
            pq.write_table(sub, tmp_path, compression="NONE")
        final_dir = os.path.join(out_dir, "sinks", sink)
        os.makedirs(final_dir, exist_ok=True)
        final_path = os.path.join(final_dir, f"part-{partition_id:06d}.parquet")
        staged.append((tmp_path, final_path))
        n_tok_sum = (pc.sum(sub["n_tok"]).as_py()
                     if sub.num_rows and "n_tok" in sub.column_names else 0)
        lineage.append({
            "partition_id": partition_id,
            "input_fragment": fragment,
            "sink": sink,
            "row_count": sub.num_rows,
            "token_count": int(n_tok_sum or 0),
            "bytes_written": os.path.getsize(tmp_path),
            "attempt": attempt,
            "wall_s": 0.0,
        })

    # stage fully, then publish: renames are the commit point
    for tmp_path, final_path in staged:
        os.replace(tmp_path, final_path)
    try:
        os.rmdir(tmp_dir)
    except OSError:
        pass

    wall = time.monotonic() - t0
    for rec in lineage:
        rec["wall_s"] = round(wall, 6)
    return lineage


def compact_sinks(out_dir: str, target_rows_per_file: int = 500_000) -> dict:
    """Post-run compaction (SURVEY.md §4.3): per-sink file count is
    O(partitions); after a run completes, coalesce each sink's part files
    into ~target_rows_per_file files. Run ONLY on a completed run —
    partition-suffixed files are the resume unit, and compaction replaces
    them — and never concurrently with readers of the sink dirs.

    Crash-safety: the swap is two renames (src → src.old, then
    src.compact → src), so a crash between them leaves ``sinks/{sink}``
    momentarily ABSENT with the data intact in ``src.old``. Recovery is
    automatic: on the next invocation (or any startup path that calls this),
    a missing ``src`` with a surviving ``src.old`` is restored before
    compaction proceeds. This trades a brief reader-visible gap for POSIX
    portability (atomic dir-swap needs renameat2/symlink flips).
    """
    import shutil

    import ray.data as rd

    sinks_root = os.path.join(out_dir, "sinks")
    # crash recovery BEFORE compacting:
    # - src missing + src.old present  → crash between the two swap renames:
    #   restore src from .old
    # - src present + src.old present  → crash after the second rename but
    #   before cleanup: .old is a stale full copy that would DOUBLE-COUNT in
    #   any recursive read over sinks/ — delete it
    # - stale *.compact               → interrupted staging: delete
    for entry in sorted(os.listdir(sinks_root)):
        full = os.path.join(sinks_root, entry)
        if entry.endswith(".old"):
            src = os.path.join(sinks_root, entry[: -len(".old")])
            if not os.path.isdir(src):
                os.replace(full, src)
            else:
                shutil.rmtree(full, ignore_errors=True)
        elif entry.endswith(".compact"):
            shutil.rmtree(full, ignore_errors=True)

    report = {}
    for sink in sorted(os.listdir(sinks_root)):
        src = os.path.join(sinks_root, sink)
        if not os.path.isdir(src) or sink.endswith((".old", ".compact")):
            continue
        n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        tmp = src + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = rd.read_parquet(src)
        n_rows = ds.count()  # metadata-only for parquet
        n_blocks = max(1, -(-n_rows // target_rows_per_file))
        ds.repartition(n_blocks).write_parquet(tmp, compression="none")
        old = src + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(src, old)
        os.replace(tmp, src)
        shutil.rmtree(old, ignore_errors=True)
        n_after = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        report[sink] = {"files_before": n_before, "files_after": n_after}
    return report
