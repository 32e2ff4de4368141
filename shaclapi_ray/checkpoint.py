"""Checkpointed, resumable validation runs with per-partition lineage.

North-rule requirements (BASELINE.json): "checkpoints merged sketch state
plus per-partition lineage/metrics so validation resumes mid-run" and
"resumable output ... never one giant file".

Layout under ``out_dir``::

    MANIFEST.json                 {"completed": [...], "epoch": N}
    partitions/p{i:05d}/events/   pass-A event rows for input partition i
    partitions/p{i:05d}/links/    extracted links for input partition i
    sketches/p{i:05d}.bin         serialized partition sketches (HLL urls, CMS hosts,
                                  t-digest text length) — mergeable, so the
                                  global state is recoverable from any
                                  subset and order (commutative merges)
    lineage.parquet               (partition_id, stage, rows_in, rows_out,
                                  wall_ms, checkpoint_epoch)
    verdicts/ violations/         final outputs (phase 2)

Phase 1 is embarrassingly partition-parallel and checkpointed after each
input partition (atomic manifest rewrite). Phase 2 (referential/global
constraints) reads the persisted partition outputs back — spilling the
intermediate to storage between phases is exactly what a 100 TB run does;
re-running phase 2 after a crash is cheap relative to phase 1.

The reference has no resume capability (SURVEY.md §4: "checkpoint /
resume: none") — this is the scale path the north rule adds.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from shaclapi_ray.engine import (
    JobConfig,
    ValidationEngine,
    ValidationResult,
    _filter_events,
    _filter_events_not_kind,
)
from shaclapi_ray.stages.links import extract_links
from shaclapi_ray.stages.predicates import ColumnShapeEvaluator
from shaclapi_ray.state.sketches import CountMinSketch, HyperLogLog, TDigest

def _stabilize_fsspec_http() -> None:
    """Make ``import fsspec.implementations.http`` deterministic under
    threads. aiohttp is absent in this environment, so the import fails —
    Ray retries it on EVERY path resolution and catches the
    ModuleNotFoundError, but two threads resolving paths concurrently can
    observe each other's half-torn-down module and get a plain
    ImportError Ray does NOT catch. Registering a placeholder module
    (HTTPFileSystem that nothing is ever an instance of) makes every
    subsequent import succeed instantly; the engine never reads over
    HTTP, so Ray's isinstance check correctly stays False."""
    import sys
    import types

    try:
        # the NAME must import, not just the module: under thread races a
        # half-initialized module can be in sys.modules without the class
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder for isinstance checks only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stabilize_fsspec_http()


LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_ms", pa.int64()),
        ("checkpoint_epoch", pa.int64()),
    ]
)


class CheckpointedValidation:
    def __init__(self, shapes, config: JobConfig | None = None, out_dir: str = "/tmp/shaclapi_ray_run"):
        self.engine = ValidationEngine(shapes, config)
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(os.path.join(out_dir, "partitions"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "sketches"), exist_ok=True)

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, "MANIFEST.json")

    def manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"completed": [], "epoch": 0, "phase2_done": False}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())  # atomic

    def _lineage_append(self, rows: list[dict]) -> None:
        path = os.path.join(self.out_dir, "lineage.parquet")
        tbl = pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
        if os.path.exists(path):
            tbl = pa.concat_tables([pq.read_table(path), tbl])
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def invalidate(self, pids: list[str]) -> None:
        """Drop partitions from the checkpoint so the next run_phase1
        reprocesses them: removes their committed outputs, sketches and
        manifest entries. The incremental-revalidation primitive — on a
        100 TB corpus a rerun after a partial source refresh touches only
        the refreshed shards."""
        m = self.manifest()
        completed = set(m["completed"])
        sources = m.get("sources", {})
        for pid in pids:
            completed.discard(pid)
            sources.pop(pid, None)
            shutil.rmtree(os.path.join(self.out_dir, "partitions", pid), ignore_errors=True)
            sk = os.path.join(self.out_dir, "sketches", pid + ".bin")
            if os.path.exists(sk):
                os.remove(sk)
        m["completed"] = sorted(completed)
        m["sources"] = sources
        self._write_manifest(m)

    @staticmethod
    def _source_stamp(path: str) -> dict:
        st = os.stat(path)
        return {"path": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns}

    # -- phase 1: per-partition column validation + links + sketches ---------
    def run_phase1(
        self, pages_dir: str, stop_after: int | None = None, max_parallel: int = 2
    ) -> bool:
        """Process input partitions not yet in the manifest. Returns True
        when all partitions are complete. ``stop_after`` processes at most
        that many partitions this call (the kill-mid-run test hook).

        ``max_parallel`` partitions run CONCURRENTLY (driver threads, each
        owning its own Dataset pipelines — the per-partition commit is the
        resume unit, so K in flight changes throughput, not semantics).
        Each partition's pipelines already fan out over the whole cluster,
        so K is a PIPELINING knob (overlap storage reads, writes and
        driver-side merges), not the parallelism source; K=2 measures best
        on one node, larger K pays off when cluster CPUs far exceed one
        partition's block count. Each partition's columns are read from
        storage ONCE; events, links and sketch partials all derive from
        the same materialized blocks (the sketch pass is fused — partials
        computed data-parallel inside map_batches, merged per partition on
        the driver)."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from shaclapi_ray.pagegen import pages_parquet_paths
        from shaclapi_ray.shapes.ir import DriftConstraint

        files = pages_parquet_paths(pages_dir)
        m = self.manifest()
        done = set(m["completed"])
        # source-change detection: a completed partition whose input file
        # changed (size/mtime) since it was processed is STALE — drop it
        # so it reprocesses. Manifests from before source stamping (no
        # record for the pid) are trusted as-is.
        sources = m.get("sources", {})
        stale = []
        for i, f in enumerate(files):
            pid = f"p{i:05d}"
            rec = sources.get(pid)
            if pid in done and rec is not None and rec != self._source_stamp(f):
                stale.append(pid)
        if stale:
            self.invalidate(stale)
            m = self.manifest()
            done = set(m["completed"])
        todo = [(i, f) for i, f in enumerate(files) if f"p{i:05d}" not in done]
        if stop_after is not None:
            todo = todo[:stop_after]
        if not todo:
            return len(done) == len(files)

        evaluator = ColumnShapeEvaluator(
            [
                s
                for s in self.engine.dag.shapes.values()
                if not any(isinstance(c, DriftConstraint) for c in s.constraints)
            ]
        )
        needs_links = self.engine.needs_links()
        cols = set(self.engine.pass_a_columns()) | {"url", "text"}
        if needs_links:
            cols |= {"url", "html"}
        cols = sorted(cols)
        meta_lock = threading.Lock()

        def fused_eval(batch: pa.Table) -> pa.Table:
            """Events AND sketch partials from ONE pass over each batch:
            the partials ride the event stream as two carrier rows
            (kind='sketchpart', payload base64 in `reason`) so no second
            execution over the materialized blocks is needed. Carrier
            rows are filtered out before the events parquet is written."""
            import base64

            from shaclapi_ray.stages.predicates import EVENTS_SCHEMA

            ev = evaluator(batch)
            h = HyperLogLog(p=14)
            h.add_array(batch["url"])
            t = TDigest()
            t.add_array(pc.utf8_length(batch["text"]))
            # host-frequency CMS: the checkpointed skew monitor — on
            # resume (or mid-run) it tells the referential planner which
            # hosts are heavy enough to need salting, without any exchange
            from shaclapi_ray.stages.links import HOST_RE

            cm = CountMinSketch(width=4096, depth=4)
            cm.add_array(
                pc.fill_null(
                    pc.struct_field(pc.extract_regex(batch["url"], HOST_RE), "host"),
                    "",
                )
            )
            carrier = pa.table(
                {
                    "url": pa.array([None] * 3, pa.string()),
                    "shape_id": pa.array([None] * 3, pa.string()),
                    "kind": pa.array(["sketchpart"] * 3, pa.string()),
                    "valid": pa.array([None] * 3, pa.bool_()),
                    "reason": pa.array(
                        [
                            base64.b64encode(h.to_bytes()).decode(),
                            base64.b64encode(t.to_bytes()).decode(),
                            base64.b64encode(cm.to_bytes()).decode(),
                        ],
                        pa.string(),
                    ),
                    "constraint": pa.array(["hll", "tdigest", "cms"], pa.string()),
                    "offending_value": pa.array([None] * 3, pa.string()),
                },
                schema=EVENTS_SCHEMA,
            )
            return pa.concat_tables([ev, carrier])

        def process(item: tuple[int, str]) -> None:
            i, f = item
            pid = f"p{i:05d}"
            t0 = time.monotonic()
            # stat BEFORE reading: a writer racing with this partition's
            # processing flips the stamp, so the next run re-validates it
            src_stamp = self._source_stamp(f)
            part_dir = os.path.join(self.out_dir, "partitions", pid)
            tmp_dir = part_dir + ".tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)  # leftover from a crash: redo
            if os.path.exists(part_dir):
                # crash between os.replace() and the manifest write: the
                # partition committed but was never recorded — treat the
                # unrecorded part_dir as debris so the redo's os.replace
                # cannot fail with ENOTEMPTY
                shutil.rmtree(part_dir)
            os.makedirs(tmp_dir)

            # ONE storage read per partition; events and sketch partials
            # come out of the SAME evaluator pass over those blocks
            import base64

            src = ray.data.read_parquet(f, columns=cols).materialize()
            rows_in = src.count()
            combined = src.map_batches(
                fused_eval, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
            events = _filter_events_not_kind(combined, "sketchpart").materialize()
            events.write_parquet(os.path.join(tmp_dir, "events"))
            rows_out = events.count()

            n_links = 0
            if needs_links:
                links = extract_links(src).materialize()
                links.write_parquet(os.path.join(tmp_dir, "links"))
                n_links = links.count()

            # partition sketches (mergeable): HLL over urls, t-digest over
            # text length — written BEFORE the manifest marks completion
            hll = HyperLogLog(p=14)
            td = TDigest()
            cms = CountMinSketch(width=4096, depth=4)
            for batch in _filter_events(combined, kind="sketchpart").iter_batches(
                batch_format="pyarrow"
            ):
                for c, payload in zip(
                    batch["constraint"].to_pylist(), batch["reason"].to_pylist()
                ):
                    blob = base64.b64decode(payload)
                    if c == "hll":
                        hll.merge(HyperLogLog.loads(blob))
                    elif c == "cms":
                        cms.merge(CountMinSketch.loads(blob))
                    else:
                        td.merge(TDigest.loads(blob))
            with open(os.path.join(self.out_dir, "sketches", pid + ".bin"), "wb") as fh:
                pickle.dump(
                    {
                        "hll": hll.to_bytes(),
                        "tdigest": td.to_bytes(),
                        "cms": cms.to_bytes(),
                    },
                    fh,
                )

            os.replace(tmp_dir, part_dir)  # atomic partition commit
            wall_ms = int((time.monotonic() - t0) * 1000)
            with meta_lock:
                mm = self.manifest()
                mm["completed"] = sorted(set(mm["completed"]) | {pid})
                mm.setdefault("sources", {})[pid] = src_stamp
                mm["epoch"] = mm.get("epoch", 0) + 1
                self._write_manifest(mm)
                self._lineage_append(
                    [
                        {
                            "partition_id": pid,
                            "stage": "pass_a",
                            "rows_in": rows_in,
                            "rows_out": rows_out,
                            "wall_ms": wall_ms,
                            "checkpoint_epoch": mm["epoch"],
                        },
                        {
                            "partition_id": pid,
                            "stage": "links",
                            "rows_in": rows_in,
                            "rows_out": n_links,
                            "wall_ms": 0,
                            "checkpoint_epoch": mm["epoch"],
                        },
                    ]
                )

        with ThreadPoolExecutor(max_workers=max(1, max_parallel)) as ex:
            list(ex.map(process, todo))
        return len(self.manifest()["completed"]) == len(files)

    # -- phase 2: global constraints over persisted partition outputs -------
    def run_phase2(self, pages_dir: str) -> ValidationResult:
        import glob as _glob

        m = self.manifest()
        part_root = os.path.join(self.out_dir, "partitions")

        def _files(sub: str) -> list[str]:
            out: list[str] = []
            for pid in m["completed"]:
                out.extend(
                    sorted(
                        _glob.glob(os.path.join(part_root, pid, sub, "*.parquet"))
                    )
                )
            return out

        events = ray.data.read_parquet(_files("events")).materialize()
        link_files = _files("links")
        links_ds = (
            ray.data.read_parquet(link_files).materialize() if link_files else None
        )
        from shaclapi_ray.io import read_parquet as _read

        pages_a = _read(pages_dir, columns=self.engine.pass_a_columns())
        t0 = time.monotonic()
        pieces = self.engine.run_pass_b([events], links_ds, pages_a, None)
        all_ev = pieces[0] if len(pieces) == 1 else pieces[0].union(*pieces[1:])
        final = _filter_events_not_kind(all_ev, "colpart")

        # final outputs: partitioned parquet (never one giant file)
        vout = os.path.join(self.out_dir, "verdicts")
        wout = os.path.join(self.out_dir, "violations")
        for d in (vout, wout):
            if os.path.exists(d):
                shutil.rmtree(d)
        _filter_events(final, kind="verdict").select_columns(
            ["url", "shape_id", "valid", "reason"]
        ).write_parquet(vout)
        _filter_events(final, kind="violation").select_columns(
            ["url", "shape_id", "constraint", "offending_value"]
        ).write_parquet(wout)
        wall_ms = int((time.monotonic() - t0) * 1000)
        mm = self.manifest()
        mm["phase2_done"] = True
        mm["epoch"] = mm.get("epoch", 0) + 1
        self._write_manifest(mm)
        self._lineage_append(
            [
                {
                    "partition_id": "__global__",
                    "stage": "pass_b",
                    "rows_in": events.count(),
                    "rows_out": final.count(),
                    "wall_ms": wall_ms,
                    "checkpoint_epoch": mm["epoch"],
                }
            ]
        )
        return ValidationResult(
            events=final,
            dag=self.engine.dag,
            target_shape=self.engine.config.target_shape,
            order=self.engine.order,
        )

    def run(self, pages_dir: str, stop_after: int | None = None):
        """Full checkpointed run; returns ValidationResult or None if
        interrupted (resume by calling run() again)."""
        complete = self.run_phase1(pages_dir, stop_after=stop_after)
        if not complete:
            return None
        return self.run_phase2(pages_dir)

    # -- merged sketch state --------------------------------------------------
    def merged_sketches(self) -> dict:
        """Order-insensitive merge of all partition sketches."""
        hll, td, cms = None, None, None
        sk_dir = os.path.join(self.out_dir, "sketches")
        for f in sorted(os.listdir(sk_dir)):
            with open(os.path.join(sk_dir, f), "rb") as fh:
                d = pickle.load(fh)
            h = HyperLogLog.loads(d["hll"])
            t = TDigest.loads(d["tdigest"])
            hll = h if hll is None else hll.merge(h)
            td = t if td is None else td.merge(t)
            if "cms" in d:  # state written by an older run lacks it
                c = CountMinSketch.loads(d["cms"])
                cms = c if cms is None else cms.merge(c)
        return {"hll": hll, "tdigest": td, "cms": cms}

    def lineage(self) -> pa.Table:
        path = os.path.join(self.out_dir, "lineage.parquet")
        if os.path.exists(path):
            return pq.read_table(path)
        return LINEAGE_SCHEMA.empty_table()


def suggest_salt_k(
    cms, total_rows: int, num_partitions: int = 32, max_k: int = 16
) -> int:
    """Data-driven salt factor for the skew-salted bucket join
    (stages.referential.qualified_counts(salt_k=...)), derived from the
    checkpointed host-frequency Count-Min sketch — the north rule's
    "explicit salting for skewed hosts/domains" decided by measurement
    instead of a hand-tuned constant.

    Heuristic: a hash-partitioned join is balanced while the heaviest
    key's share <= 1/num_partitions; beyond that, the hot partition is
    ~share*num_partitions times the average, and replicating the small
    side salt_k ways divides it back. CMS overcounts only, so the
    suggestion errs toward salting — the safe direction. Returns 0 (no
    salting) when balanced; otherwise ceil(share * num_partitions)
    clamped to max_k (replication cost grows linearly with salt_k)."""
    import math

    if cms is None or total_rows <= 0:
        return 0
    # a key's estimate is min over depth rows of its cell, and each cell
    # is bounded by its row's max — so min-of-row-maxima upper-bounds
    # EVERY key's estimate, hence the heaviest key's true count
    heaviest = int(cms.counts.max(axis=1).min())
    share = heaviest / total_rows
    if share <= 1.0 / num_partitions:
        return 0
    return min(max_k, max(2, math.ceil(share * num_partitions)))
