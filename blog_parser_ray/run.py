"""CLI entry point (SURVEY.md §3.1 entry point A).

    python -m blog_parser_ray.run --input DIR --output DIR [--resume]
        [--cpus N] [--vocab-size V] [--partition-rows R]
    python -m blog_parser_ray.run --synth N --output DIR [--seed S]

Owns a Ray session (the ONLY places that do: this CLI, bench.py, and the
pytest fixture). On a real deployment this is the script handed to
``ray job submit``; in the sandbox it runs against a local session.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="blog_parser_ray.run",
                                 description="flagship parse→enrich→route→aggregate run")
    ap.add_argument("--input", help="input parquet dir (flagship schema)")
    ap.add_argument("--output", required=True, help="output dir (sinks/manifest/aggregates)")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions already committed in the manifest")
    ap.add_argument("--cpus", type=int, default=None, help="ray.init num_cpus")
    ap.add_argument("--vocab-size", type=int, default=None)
    ap.add_argument("--partition-rows", type=int, default=None)
    ap.add_argument("--synth", type=int, default=None, metavar="N_ROWS",
                    help="instead of running: synthesize a corpus into --output")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--config", default=None,
                    help="JSON pipeline config (see config.spec_from_dict)")
    args = ap.parse_args(argv)

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    try:
        if args.synth is not None:
            from .synth import synth_corpus
            synth_corpus(args.output, args.synth, seed=args.seed)
            print(json.dumps({"synthesized_rows": args.synth,
                              "out": args.output, "seed": args.seed}))
            return 0

        if not args.input:
            ap.error("--input is required unless --synth is given")
        from .config import PipelineSpec, spec_from_dict
        from .runner import run

        if args.config:
            with open(args.config, encoding="utf-8") as f:
                spec = spec_from_dict(json.load(f))
        else:
            spec = PipelineSpec()
        if args.vocab_size is not None:
            spec.vocab_size = args.vocab_size
        if args.partition_rows is not None:
            spec.target_partition_rows = args.partition_rows
        try:
            summary = run(args.input, args.output, spec, resume=args.resume)
        except RuntimeError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        summary.pop("stats", None)  # full per-stage stats live in _metrics/
        print(json.dumps(summary, sort_keys=True))
        return 0 if summary.get("conserved") else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
