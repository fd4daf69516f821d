"""Generic source dispatch (parquet/csv/jsonl/text) and reader guards."""

from __future__ import annotations

import json
import os

import pytest

from blog_parser_ray.sources.readers import read_any


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"a": i, "b": f"x{i}"} for i in range(20)]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "t.parquet"))
    with open(d / "t.csv", "w") as f:
        f.write("a,b\n")
        for r in rows:
            f.write(f"{r['a']},{r['b']}\n")
    with open(d / "t.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(d / "t.txt", "w") as f:
        f.write("\n".join(r["b"] for r in rows) + "\n")
    return str(d)


@pytest.mark.parametrize("name,fmt", [("t.parquet", None), ("t.csv", None),
                                      ("t.json", None), ("t.txt", None)])
def test_read_any_formats(files, name, fmt):
    ds = read_any(os.path.join(files, name), fmt)
    df = ds.to_pandas()
    assert len(df) == 20
    if name != "t.txt":
        assert sorted(df["a"]) == list(range(20))


def test_read_any_rejects_unknown(files):
    with pytest.raises(ValueError, match="unsupported"):
        read_any(os.path.join(files, "t.xyz"))


def test_runner_rejects_empty_input(tmp_path):
    from blog_parser_ray.runner import run

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="nothing to plan"):
        run(str(empty), str(tmp_path / "out"))


def test_plan_fragments_are_input_relative(tmp_path):
    """Same-basename files in different subdirs must get DISTINCT fragment
    identities (resume-safety check keys on the fragment string)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blog_parser_ray.sources.readers import plan_partitions

    for day in ("day1", "day2"):
        os.makedirs(tmp_path / day)
        pq.write_table(pa.table({"x": pa.array(np.arange(10))}),
                       str(tmp_path / day / "data.parquet"))
    plan = plan_partitions(str(tmp_path), target_rows=5)
    frags = [p.fragment for p in plan]
    assert len(frags) == len(set(frags))
    assert any("day1" in f for f in frags) and any("day2" in f for f in frags)


def test_schema_gate_checks_every_file(tmp_path):
    """A later file with drifted types must fail the S1 gate up front."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from blog_parser_ray import schema as S
    from blog_parser_ray.sources.readers import assert_schema_of
    from blog_parser_ray.synth import synth_table
    import numpy as np

    good = synth_table(np.arange(50), seed=1)
    pq.write_table(good, str(tmp_path / "a.parquet"))
    bad = good.set_column(good.schema.get_field_index("n_tok"), "n_tok",
                          good["n_tok"].cast(pa.int64()))
    pq.write_table(bad, str(tmp_path / "b.parquet"))
    with _pytest.raises((TypeError, AssertionError, ValueError)):
        assert_schema_of(str(tmp_path))
