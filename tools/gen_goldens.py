"""Generate the pinned golden-oracle parquet files.

Some operators are deterministic (fixed seeds, order-insensitive merges,
driver-side final sorts) but not expressible in SQL — seeded MinHash-LSH
clustering, rolling Rabin-Karp fingerprints, HLL estimates, IVF probe
results, crc32 of transformed media bytes. For those the driver's
CORRECTNESS oracle is a pinned golden parquet per scale factor, generated
here by running the EXACT query callable the driver runs and writing its
(sorted) result. The goldens pin determinism across runs, processes and
block layouts; semantic correctness is asserted separately by tests
(planted duplicates, bruteforce equivalence, reference implementations —
see tests/test_dedup.py, tests/test_knn_ivf.py, tests/test_sketches.py,
tests/test_textstats_golden.py, tests/test_multimodal.py).

Usage: python tools/gen_goldens.py [sf_dir ...]
Defaults to /root/testdata/sf0.001 and /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dirs: list[str]) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    qs = entry.queries()
    # compression goldens depend on the zlib BUILD (madler vs zlib-ng
    # compress to different sizes); record the generator's build so the
    # golden tests can fail loudly with the real cause on a mismatch
    import zlib

    os.makedirs(entry.GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(entry.GOLDEN_DIR, "ZLIB_VERSION.txt"), "w") as f:
        f.write(zlib.ZLIB_RUNTIME_VERSION)
    for sf_dir in sf_dirs:
        out_dir = os.path.join(entry.GOLDEN_DIR, entry._sf_name(sf_dir))
        os.makedirs(out_dir, exist_ok=True)
        targets = {n: qs[n] for n in entry.GOLDEN_QUERIES}
        targets["media_features_feat"] = entry._media_feat_part
        targets["doc_signals_bpe"] = entry._bpe_part
        for name, fn in sorted(targets.items()):
            df = fn(sf_dir)
            if hasattr(df, "to_pandas"):
                df = df.to_pandas()
            path = os.path.join(out_dir, f"{name}.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
            print(f"wrote {path}: {len(df)} rows, cols={list(df.columns)}")
    ray.shutdown()


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    main(dirs)
