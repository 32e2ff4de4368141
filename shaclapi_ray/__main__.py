"""CLI entry point (≙ the reference's run_config.py:32-36: run a job from
a JSON config string or file and print the JSON result).

Usage:
    python -m shaclapi_ray -c '{"schemaDir": "...", "pagesDir": "...", ...}'
    python -m shaclapi_ray -f config.json
    python -m shaclapi_ray --reduce -c '{...}'      # /reduce route analog
    python -m shaclapi_ray --validation -c '{...}'  # /validation route analog

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="shaclapi_ray")
    p.add_argument("-c", "--config", help="JSON config string")
    p.add_argument("-f", "--config-file", help="JSON config file")
    p.add_argument("--reduce", action="store_true", help="reduce-only (no validation)")
    p.add_argument(
        "--validation", action="store_true", help="per-shape valid/invalid counts"
    )
    p.add_argument(
        "--pipeline",
        action="store_true",
        help="run one registered training-data operator (api.run_pipeline)",
    )
    p.add_argument(
        "--incremental",
        action="store_true",
        help="cross-snapshot incremental validation (api.run_incremental; "
        "requires state_dir in the config)",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    if args.config:
        config = json.loads(args.config)
    elif args.config_file:
        with open(args.config_file) as f:
            config = json.load(f)
    else:
        p.error("one of -c / -f is required")
        return 2

    from shaclapi_ray import api

    if args.reduce:
        print(json.dumps({"reduced_schema": api.only_reduce_shape_schema(config)}))
        return 0

    import ray

    if not ray.is_initialized():
        kwargs = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kwargs,
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        if args.pipeline:
            out = api.run_pipeline(config)
        elif args.validation:
            out = api.validation_and_statistics(config)
        elif args.incremental:
            out = api.run_incremental(config)
        else:
            out = api.run_job(config)
        print(json.dumps(out, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
