"""Per-operator execution report for any registered pipeline.

Runs one operator from api.PIPELINE_REGISTRY over a table and prints each
Ray Data operator's task count, output rows, and output bytes — the
numbers that tell you whether a stage's exchange is NARROW (the scale
disciplines in COVERAGE.md: pre-aggregated partials, keyed rows instead
of wide payloads) or is shipping the whole table. Use it when touching a
pipeline's shuffle shape; bench.py measures wall time, this shows WHY.

Usage:
  python tools/stats_report.py exact_dedup /root/testdata/sf0.01/documents.parquet
  python tools/stats_report.py minhash_clusters /root/testdata/sf0.1/documents.parquet
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def operator_summaries(stats: str) -> list[dict]:
    """Parse Dataset.stats() text into per-operator {name, tasks, rows,
    bytes} rows (best effort — the format is versioned, so unknown lines
    are simply skipped)."""
    out: list[dict] = []
    cur: dict | None = None
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (\S+):.*?(\d+) tasks executed", line.strip())
        if m:
            cur = {"op": m.group(2), "tasks": int(m.group(3)), "rows": None, "bytes": None}
            out.append(cur)
            continue
        m = re.match(r"Operator (\d+) (\S+): executed", line.strip())
        if m:
            cur = {"op": m.group(2), "tasks": None, "rows": None, "bytes": None}
            out.append(cur)
            continue
        if cur is not None:
            m = re.search(r"Output num rows per block: .*?, (\d+) total", line)
            if m and cur["rows"] is None:
                cur["rows"] = int(m.group(1))
            m = re.search(r"Output size bytes per block: .*?, (\d+) total", line)
            if m and cur["bytes"] is None:
                cur["bytes"] = int(m.group(1))
    return out


def report(pipeline: str, input_path: str, **args) -> list[dict]:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib

    from shaclapi_ray.api import PIPELINE_REGISTRY
    from shaclapi_ray.io import read_table_any

    mod, func = PIPELINE_REGISTRY[pipeline].split(":")
    fn = getattr(importlib.import_module(mod), func)
    out = fn(read_table_any(input_path), **args)
    if not hasattr(out, "materialize"):  # driver-side result (DataFrame)
        print(f"{pipeline}: driver-side result ({type(out).__name__}), no stats")
        return []
    out = out.materialize()
    rows = operator_summaries(out.stats())
    return rows


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    pipeline, input_path = sys.argv[1], sys.argv[2]
    rows = report(pipeline, input_path)
    if rows:
        w = max(len(r["op"]) for r in rows) + 2
        print(f"{'operator':{w}s} {'tasks':>6s} {'rows':>12s} {'bytes':>14s}")
        for r in rows:
            print(
                f"{r['op']:{w}s} {str(r['tasks'] or '-'):>6s} "
                f"{str(r['rows'] if r['rows'] is not None else '-'):>12s} "
                f"{str(r['bytes'] if r['bytes'] is not None else '-'):>14s}"
            )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
