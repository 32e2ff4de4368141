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


def _clean_schema(path, columns=None):
    """File schema with key-value metadata stripped (projected to
    ``columns`` when given). pandas-written parquet embeds metadata that
    makes pa.Schema unhashable (hash -> "unhashable type: 'dict'"), so
    every repartition/sort/aggregate reduce over such blocks logs a
    schema-dedup warning per task. Passing a metadata-free schema to the
    read drops it AT THE SOURCE — no extra pipeline stage (an explicit
    map_batches strip measured ~2x on short pipelines by splitting the
    fused read stage). Returns None when the footer can't be read
    (non-string path, object store URI quirks): callers fall back to
    Ray's own schema inference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        if isinstance(path, str):
            import os

            f = path
            if os.path.isdir(path):
                names = [n for n in os.listdir(path) if n.endswith(".parquet")]
                if not names:
                    return None
                f = os.path.join(path, sorted(names)[0])
            schema = pq.read_schema(f).remove_metadata()
        else:
            return None
    except Exception:
        return None
    if columns is not None:
        try:
            schema = pa.schema([schema.field(c) for c in columns])
        except KeyError:
            return None
    return schema


def read_parquet(path, columns=None, num_blocks: int | None = None, filter_expr=None):
    """Plain pruned read. Ray's default block sizing (file/row-group
    granularity) beats forced small blocks when per-task overhead is high;
    pass ``num_blocks`` only to override deliberately.

    ``filter_expr`` (a pyarrow.dataset Expression) is pushed into the
    fragment scan: Arrow prunes whole ROW GROUPS whose column statistics
    cannot match, so a warc_ts window or lang slice never leaves storage
    (build it with ``shapes.ir.pred_to_scan_expr`` — weakened, so callers
    must still apply the full predicate post-read).

    ``num_blocks`` is clamped to the file's total ROW-GROUP count: asking
    for more read tasks than row groups yields empty tasks, and Ray
    passes their schema-LESS empty blocks through downstream operators
    untouched — a hash-shuffle join partition fed only such blocks aborts
    with 'No match for key field' (observed with Ray 2.49)."""
    schema = _clean_schema(path, columns)
    kwargs = {}
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    if num_blocks:
        if isinstance(path, str):
            try:
                _, row_groups = _metadata(path)
                num_blocks = max(1, min(num_blocks, row_groups))
            except Exception:
                pass
        return ray.data.read_parquet(
            path,
            columns=columns,
            schema=schema,
            override_num_blocks=num_blocks,
            **kwargs,
        )
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)


_META_CACHE: dict = {}


def _metadata(path: str) -> tuple[int, int]:
    """(total rows, total row groups) from parquet footers — driver-local,
    metadata-only (no data read). Cached per (path, mtime): a large input
    has thousands of footers and several stages consult the same totals
    per run."""
    import os

    import pyarrow.parquet as pq

    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        key = None
    if key is not None and key in _META_CACHE:
        return _META_CACHE[key]
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
    if key is not None:
        _META_CACHE[key] = (rows, groups)
    return rows, groups


def _metadata_rows(path: str) -> int:
    return _metadata(path)[0]


def _pred_may_match(pred, stats: dict) -> bool:
    """Conservative row-group pruning: False only when NO row in the
    group can satisfy ``pred`` given the group's (min, max) column
    statistics. Unknown ops / missing stats => True (no pruning)."""
    if pred is None:
        return True
    op = pred.get("op")
    if op == "true":
        return True
    if op == "and":
        return all(_pred_may_match(a, stats) for a in pred["args"])
    if op == "or":
        return any(_pred_may_match(a, stats) for a in pred["args"])
    mm = stats.get(pred.get("column"))
    if mm is None:
        return True
    lo, hi = mm

    def coerce(v):
        from datetime import datetime

        if isinstance(lo, datetime) and isinstance(v, str):
            return datetime.fromisoformat(v.replace("Z", "+00:00")).replace(tzinfo=None)
        return v

    try:
        if op in ("==", "eq"):
            v = coerce(pred["value"])
            return lo <= v <= hi
        if op == "in":
            return any(lo <= coerce(v) <= hi for v in pred["values"])
        if op == "range":
            pmin = coerce(pred.get("min")) if pred.get("min") is not None else None
            pmax = coerce(pred.get("max")) if pred.get("max") is not None else None
            if pmin is not None and hi < pmin:
                return False
            if pmax is not None and lo > pmax:
                return False
            return True
    except Exception:
        return True
    return True  # regex / not / len_range / not_null: not stat-prunable


def estimate_rows_matching_many(path: str, preds: dict) -> dict:
    """Upper-bound row counts matching each predicate in ``preds``
    (key -> pred) from parquet ROW-GROUP statistics only — ONE metadata
    pass over the files regardless of predicate count (driver-local, no
    data read). The engine's 'TARGET IN BIG' estimate (reference
    heuristic at /root/reference/shaclapi/config.py:205-209) for ordering
    independent shapes by estimated target-set size."""
    import os

    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    totals = {k: 0 for k in preds}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats: dict = {}
            for ci in range(g.num_columns):
                col = g.column(ci)
                s = col.statistics
                if s is not None and s.has_min_max:
                    stats[col.path_in_schema] = (s.min, s.max)
            for k, pred in preds.items():
                if _pred_may_match(pred, stats):
                    totals[k] += g.num_rows
    return totals


def estimate_rows_matching(path: str, pred) -> int:
    """Single-predicate convenience over estimate_rows_matching_many."""
    return estimate_rows_matching_many(path, {"_": pred})["_"]


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


def read_table_any(path, columns=None, format: str | None = None,
                   min_rows_per_block: int = 500):
    """Format-dispatching source: parquet (the scale path — pruned,
    metadata-sized blocks), JSONL, or CSV into the same Dataset contract
    every pipeline stage consumes. The reference's single binding-stream
    source (`contactSource`) becomes a pluggable file-format seam here.

    JSONL/CSV have no footer metadata or column pruning at the read, so
    projection happens right after (`select_columns`) and fan-out uses
    the CPU-count block target; these formats are for interchange and
    small sides — bulk corpora belong in parquet."""
    import os

    fmt = format
    if fmt is None:
        if os.path.isdir(path):
            names = [n for n in os.listdir(path) if not n.startswith(".")]
            exts = {os.path.splitext(n)[1].lower().lstrip(".") for n in names}
            if exts <= {"orc"} and exts:
                fmt = "orc"
            elif exts <= {"feather", "arrow", "ipc"} and exts:
                fmt = "feather"
            else:
                fmt = "parquet"  # partitioned dirs default to the parquet path
        else:
            ext = os.path.splitext(path)[1].lower().lstrip(".")
            fmt = {"parquet": "parquet", "json": "json", "jsonl": "json",
                   "csv": "csv", "orc": "orc", "feather": "feather",
                   "arrow": "feather", "ipc": "feather"}.get(ext)
    if fmt == "parquet":
        return read_table_split(
            path, columns=columns, min_rows_per_block=min_rows_per_block
        )
    if fmt in ("orc", "feather"):
        return _read_file_tables(path, fmt, columns)
    if fmt == "json":
        ds = ray.data.read_json(path)
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
    else:
        raise ValueError(f"unsupported source format {fmt!r} for {path!r}")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds.repartition(target_blocks(factor=1))


def _read_file_tables(path, fmt: str, columns):
    """ORC / Feather(Arrow-IPC) source: one decode task per file (the
    WARC-reader pattern — Ray has no native reader for these), column
    pruning pushed into the per-file read. Files are the parallelism
    unit; both formats are record-batch containers, so a file-sized
    table per task is the natural block."""
    import io as _io

    import pyarrow as pa

    cols = list(columns) if columns is not None else None

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather
        import pyarrow.orc as orc

        tables = []
        for buf in batch["bytes"].to_pylist():
            bio = _io.BytesIO(buf)
            if fmt == "orc":
                t = orc.ORCFile(bio).read(columns=cols)
            else:
                t = feather.read_table(bio, columns=cols)
            tables.append(t)
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return ray.data.read_binary_files(path).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def write_table_files(ds, out_dir: str, fmt: str = "orc",
                      compression: str | None = None):
    """ORC / Feather sink: one content-hash-named file per input block
    (atomic tmp+rename = the retry unit, the WARC-shard convention; no
    shuffle, no driver collection). Returns (n_files, n_rows).

    Type caveat: ORC's type system has a single (nanosecond) timestamp,
    so timestamp[us] columns read back as timestamp[ns] — identical
    values, different precision label (Feather/IPC preserves Arrow
    types exactly). Pick Feather when byte-exact schema round-trips
    matter; ORC for interop with Hive-world readers."""
    import hashlib
    import io as _io
    import os

    import pyarrow as pa

    if fmt not in ("orc", "feather"):
        raise ValueError(f"write_table_files: unsupported format {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        import pyarrow.feather as feather
        import pyarrow.orc as orc

        bio = _io.BytesIO()
        if fmt == "orc":
            orc.write_table(batch, bio)
        else:
            feather.write_feather(
                batch, bio, compression=compression or "uncompressed"
            )
        data = bio.getvalue()
        name = hashlib.md5(data).hexdigest()
        p = os.path.join(out_dir, f"part-{name}.{fmt}")
        tmp = f"{p}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
        return pa.table({"path": [p], "n_rows": pa.array([batch.num_rows], pa.int64())})

    mani = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    import pyarrow as _pa

    rows = [b for b in mani.iter_batches(batch_format="pyarrow") if b.num_rows]
    total = sum(int(r) for b in rows for r in b["n_rows"].to_pylist())
    n_files = sum(b.num_rows for b in rows)
    return n_files, total
