"""Readers (S1, S2, S6) and the deterministic partition planner (SURVEY.md §4.4).

``plan_partitions`` maps an input directory to a stable, cluster-size-
independent list of (file, row-group range) partitions: ``partition_id`` =
index into the sorted plan. Resume filters this plan against the manifest, so
a killed run re-reads ONLY uncommitted fragments — never the whole input
(SURVEY.md §3.3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .. import schema as S


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs) -> rd.Dataset:
    """``read_parquet`` with the file's ``pandas`` schema metadata stripped.

    Tables written through pandas carry a ``pandas`` metadata dict on the
    Arrow schema; it rides through every downstream ``append_column`` and
    makes ``hash(schema)`` raise inside sort-reduce's ``unify_schemas`` fast
    path (worker-side "Failed to hash the schemas" warnings, r3 verdict #7).
    Passing an explicit metadata-free (and column-pruned) schema costs
    nothing — the reader casts to it anyway — and kills the noise at the
    source.
    """
    first = _first_parquet_file(path)
    if os.path.isdir(path) and "=" in os.path.relpath(first, path):
        # hive-partitioned layout (key=value subdirs): partition columns are
        # not in the file schema, so an explicit schema would drop them
        return rd.read_parquet(path, columns=columns, **kwargs)
    sch = pq.read_schema(first).remove_metadata()
    if columns is not None:
        if any(sch.get_field_index(c) < 0 for c in columns):
            # a requested column lives outside the file schema (hive
            # partition column, e.g. sink=<v> dirs) — the explicit-schema
            # fast path can't express that; plain read still works and
            # partition-column reads don't carry pandas metadata anyway
            return rd.read_parquet(path, columns=columns, **kwargs)
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, schema=sch, columns=columns, **kwargs)


def read_sequences(path: str, **kwargs) -> rd.Dataset:
    """S1: read the flagship Parquet corpus with a schema assertion."""
    ds = read_parquet_clean(path, columns=list(S.SEQUENCES_SCHEMA.names), **kwargs)
    assert_schema_of(path)
    return ds


def assert_schema_of(path: str) -> None:
    """Schema gate over EVERY file (metadata-only reads — the planner opens
    each file's footer anyway); checking just the first file would let a
    later file with drifted types fail deep inside parse instead of here."""
    files = _parquet_files(path) if not os.path.isfile(path) else [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    for f in files:
        S.assert_sequences_schema(pq.ParquetFile(f).schema_arrow)


def read_dim(path: str) -> pa.Table:
    """S2: small lookup table, read driver-side (broadcast via ray.put)."""
    return pq.read_table(path)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """S6: one of the ten driver testdata tables, with column pruning."""
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                              columns=columns, **kwargs)


def read_any(path: str, fmt: str | None = None, **kwargs) -> rd.Dataset:
    """Generic source dispatch: parquet / csv / json(l) / text by extension
    (the reference walked a directory of files; this is the engine-side
    equivalent for whatever lands in the lake)."""
    fmt = fmt or os.path.splitext(path.rstrip("/"))[1].lstrip(".").lower()
    if fmt in ("parquet", ""):
        return read_parquet_clean(path, **kwargs)
    if fmt == "csv":
        return rd.read_csv(path, **kwargs)
    if fmt in ("json", "jsonl", "ndjson"):
        return rd.read_json(path, **kwargs)
    if fmt in ("txt", "text"):
        return rd.read_text(path, **kwargs)
    raise ValueError(f"unsupported source format: {fmt!r}")


# ---------------------------------------------------------------------------
# Partition planner
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PartitionSpec:
    partition_id: int
    path: str
    rg_start: int    # first row group (inclusive)
    rg_end: int      # last row group (exclusive)
    num_rows: int
    rel: str = ""    # input-dir-relative path (resume identity)

    @property
    def fragment(self) -> str:
        # identity must be input-dir-RELATIVE: basenames repeat across
        # subdirs (day1/data.parquet, day2/data.parquet), and a
        # basename-only fragment lets the resume-safety check false-pass
        # when the plan shifts onto a different same-named file
        name = self.rel or os.path.basename(self.path)
        return f"{name}[{self.rg_start}:{self.rg_end}]"


def _parquet_files(input_dir: str) -> list[str]:
    if os.path.isfile(input_dir):
        return [input_dir]
    out: list[str] = []
    for root, _dirs, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _first_parquet_file(path: str) -> str:
    files = _parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return files[0]


def plan_partitions(input_dir: str,
                    target_rows: int = 250_000) -> list[PartitionSpec]:
    """Deterministic plan: sorted files × row-group ranges, each partition
    holding ~``target_rows`` rows. Stable across runs and cluster sizes —
    the resume key (SURVEY.md §4.4)."""
    base = input_dir if os.path.isdir(input_dir) else os.path.dirname(input_dir)
    parts: list[PartitionSpec] = []
    pid = 0
    for path in _parquet_files(input_dir):
        rel = os.path.relpath(path, base) if base else os.path.basename(path)
        md = pq.ParquetFile(path).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        start, acc = 0, 0
        for i, nrows in enumerate(rg_rows):
            acc += nrows
            last = i == len(rg_rows) - 1
            if acc >= target_rows or (last and acc > 0):
                parts.append(PartitionSpec(pid, path, start, i + 1, acc,
                                           rel=rel))
                pid += 1
                start, acc = i + 1, 0
    return parts


def read_partition(spec: PartitionSpec,
                   columns: list[str] | None = None) -> pa.Table:
    """Read exactly one planned fragment (used inside runner tasks)."""
    f = pq.ParquetFile(spec.path)
    return f.read_row_groups(list(range(spec.rg_start, spec.rg_end)),
                             columns=columns, use_threads=False)
