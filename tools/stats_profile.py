"""Per-operator Ray Data stats capture for headline queries.

Runs a handful of representative pipelines at $GRAFT_SF_DIR (default
sf0.1), materializes each, and records the executor's own per-operator
accounting (`Dataset.stats()`) — the ground truth for "is wall-time
dominated by useful compute or by stalls". Output: one text report under
BENCH/ plus a one-line-per-query wall summary on stdout.

Usage: python tools/stats_profile.py [sf_dir] [out_path]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


QUERIES_TO_PROFILE = [
    "per_sink_counts", "orders_customers", "dedup_docs",
    "fuzzy_pairs_brand", "jaccard_pairs_exact", "token_bigrams",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/stats_profile.txt"

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from blog_parser_ray.pipelines import queries as Q

    report: list[str] = [f"# Ray Data per-operator stats @ {sf} "
                         f"(loadavg {os.getloadavg()})", ""]
    for name in QUERIES_TO_PROFILE:
        t0 = time.monotonic()
        res = Q.QUERIES[name](sf)
        if isinstance(res, rd.Dataset):
            res = res.materialize()
            wall = time.monotonic() - t0
            stats = res.stats()
        else:
            wall = time.monotonic() - t0
            stats = "(driver-side table result — stats on final stage only)"
        report.append(f"## {name} — {wall:.2f}s end-to-end")
        # keep the per-operator execution lines; drop block-size noise
        for line in stats.splitlines():
            if re.search(r"(Operator \d|Execution time|executed in|"
                         r"\* Remote wall time|\* Remote cpu time|"
                         r"Runtime metrics)", line):
                report.append(line.rstrip())
        report.append("")
        print(f"{name}: {wall:.2f}s")
    with open(out_path, "w") as f:
        f.write("\n".join(report) + "\n")
    print("wrote", out_path)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
