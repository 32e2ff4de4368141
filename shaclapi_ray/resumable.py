"""Generic resumable per-shard pipeline runner for the training-data
operators.

The validation engine already checkpoints per input partition
(checkpoint.CheckpointedValidation); this is the same contract for ANY
Dataset->Dataset stage (normalize, pii scan, dedup signatures,
featurize, ...): one input parquet file = one partition = one atomic
commit. A killed 100-TB run resumes by reprocessing only the partitions
whose commit never landed — never one giant output file, never a
partial-file ambiguity.

Mechanics per partition: read -> fn(Dataset) -> write to
``out/partitions/p%05d.tmp`` -> fsync-free atomic ``os.replace`` ->
manifest append. Partitions run ``max_parallel`` at a time on driver
threads purely to pipeline reads/writes; each partition's fn already
fans out over the cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from typing import Callable

import ray
import ray.data

from shaclapi_ray.checkpoint import _stabilize_fsspec_http

_stabilize_fsspec_http()


class ResumableMapJob:
    def __init__(
        self,
        fn: Callable[[ray.data.Dataset], ray.data.Dataset],
        out_dir: str,
        columns: list[str] | None = None,
        max_parallel: int = 2,
    ):
        self.fn = fn
        self.out_dir = out_dir
        self.columns = columns
        self.max_parallel = max_parallel
        os.makedirs(os.path.join(out_dir, "partitions"), exist_ok=True)

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, "MANIFEST.json")

    def manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"completed": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    # -- run -----------------------------------------------------------------
    @staticmethod
    def _input_files(input_dir: str) -> list[str]:
        if os.path.isfile(input_dir):
            return [input_dir]
        return sorted(
            os.path.join(input_dir, f)
            for f in os.listdir(input_dir)
            if f.endswith(".parquet")
        )

    @staticmethod
    def _source_stamp(path: str) -> dict:
        st = os.stat(path)
        return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}

    def invalidate(self, pids: list[str]) -> None:
        """Drop committed partitions so the next run() reprocesses them —
        the incremental-reprocessing primitive (same contract as
        CheckpointedValidation.invalidate)."""
        m = self.manifest()
        for pid in pids:
            m["completed"].pop(pid, None)
            shutil.rmtree(
                os.path.join(self.out_dir, "partitions", pid), ignore_errors=True
            )
        self._write_manifest(m)

    def run(self, input_dir: str, stop_after: int | None = None) -> bool:
        """Process not-yet-committed partitions; returns True when every
        input file has a committed output. ``stop_after`` bounds how many
        partitions this call processes (the kill-mid-run hook). Committed
        partitions whose input file changed since processing (size/mtime
        stamp) are invalidated and reprocessed; manifests from before
        stamping are trusted as-is."""
        files = self._input_files(input_dir)
        completed = self.manifest()["completed"]
        stale = []
        for i, f in enumerate(files):
            pid = f"p{i:05d}"
            rec = completed.get(pid)
            if rec is not None and "source" in rec and rec["source"] != self._source_stamp(f):
                stale.append(pid)
        if stale:
            self.invalidate(stale)
        done = set(self.manifest()["completed"])
        todo = [(i, f) for i, f in enumerate(files) if f"p{i:05d}" not in done]
        if stop_after is not None:
            todo = todo[:stop_after]
        lock = threading.Lock()

        def process(item: tuple[int, str]) -> None:
            i, f = item
            pid = f"p{i:05d}"
            t0 = time.monotonic()
            # stat BEFORE reading: a writer racing with processing flips
            # the stamp, so the next run re-validates this partition
            src_stamp = self._source_stamp(f)
            part_dir = os.path.join(self.out_dir, "partitions", pid)
            tmp_dir = part_dir + ".tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)  # crash leftover: redo from scratch
            if os.path.exists(part_dir):
                # Crash landed between os.replace() and the manifest
                # append: the data committed but the manifest never
                # recorded it. An unrecorded part_dir is crash debris —
                # remove it so the re-run's os.replace() can't ENOTEMPTY.
                shutil.rmtree(part_dir)
            src = ray.data.read_parquet(f, columns=self.columns)
            # materialize ONCE: write_parquet + count() would otherwise
            # each re-execute the whole fn pipeline (and a
            # nondeterministic fn could report a count that doesn't match
            # the rows actually written)
            out = self.fn(src).materialize()
            out.write_parquet(tmp_dir)
            rows_out = out.count()
            os.replace(tmp_dir, part_dir)  # atomic commit
            with lock:
                m = self.manifest()
                m["completed"][pid] = {
                    "input": f,
                    "rows_out": rows_out,
                    "wall_ms": int((time.monotonic() - t0) * 1000),
                    "source": src_stamp,
                }
                self._write_manifest(m)

        if todo:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max(1, self.max_parallel)) as ex:
                list(ex.map(process, todo))
        return len(self.manifest()["completed"]) == len(files)

    def result(self) -> ray.data.Dataset:
        """Dataset over every committed partition's output."""
        paths = []
        for p in sorted(self.manifest()["completed"]):
            d = os.path.join(self.out_dir, "partitions", p)
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
        return ray.data.read_parquet(paths)
