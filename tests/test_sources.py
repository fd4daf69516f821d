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
