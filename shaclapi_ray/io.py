"""Input helpers: parquet reads with explicit block-count control.

Ray's parquet reader parallelizes across files and row groups; a
single-file single-row-group table (like the driver's testdata parquet)
arrives as ONE block, serializing every downstream map_batches. The
helpers here size ``override_num_blocks`` to the cluster and, when the
file structure cannot be split finer, repartition once after the read so
the pipeline fans out (SURVEY.md §4: blocks ≈ 2-4x CPUs).
"""

from __future__ import annotations

import ray
import ray.data


MAX_ROWS_PER_BLOCK = 250_000  # keep html-bearing blocks well under plasma limits


def target_blocks(factor: int = 2, rows: int | None = None) -> int:
    """Blocks ≈ CPUs x factor, but never fewer than rows/MAX_ROWS_PER_BLOCK —
    wide binary columns (html) make huge blocks spill the object store."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n = max(2, cpus * factor)
    if rows:
        n = max(n, (rows + MAX_ROWS_PER_BLOCK - 1) // MAX_ROWS_PER_BLOCK)
    return n


def read_parquet(path, columns=None, num_blocks: int | None = None):
    """Plain pruned read. Ray's default block sizing (file/row-group
    granularity) beats forced small blocks when per-task overhead is high;
    pass ``num_blocks`` only to override deliberately.

    ``num_blocks`` is clamped to the file's total ROW-GROUP count: asking
    for more read tasks than row groups yields empty tasks, and Ray
    passes their schema-LESS empty blocks through downstream operators
    untouched — a hash-shuffle join partition fed only such blocks aborts
    with 'No match for key field' (observed with Ray 2.49)."""
    if num_blocks:
        if isinstance(path, str):
            try:
                _, row_groups = _metadata(path)
                num_blocks = max(1, min(num_blocks, row_groups))
            except Exception:
                pass
        return ray.data.read_parquet(path, columns=columns, override_num_blocks=num_blocks)
    return ray.data.read_parquet(path, columns=columns)


def _metadata(path: str) -> tuple[int, int]:
    """(total rows, total row groups) from parquet footers — driver-local,
    metadata-only (no data read)."""
    import os

    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    rows = groups = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        groups += md.num_row_groups
    return rows, groups


def _metadata_rows(path: str) -> int:
    return _metadata(path)[0]


def read_table_split(path, columns=None, min_rows_per_block: int = 500):
    """Read + force fan-out for unsplittable single-row-group files.

    The repartition is a one-pass block split (no key shuffle), sized from
    parquet metadata (driver-local, cheap)."""
    ds = read_parquet(path, columns=columns)
    rows = _metadata_rows(path)
    n = max(1, min(target_blocks(factor=1), rows // min_rows_per_block))
    if n > 1:
        ds = ds.repartition(n)
    return ds
