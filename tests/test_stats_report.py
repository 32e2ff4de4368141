"""stats_report: the per-operator stats parser and the end-to-end tool
path over a registered pipeline."""

import sys


def test_operator_summaries_parser():
    sys.path.insert(0, "/root/repo")
    from tools.stats_report import operator_summaries

    stats = """
Operator 1 ReadParquet->SplitBlocks(16): 1 tasks executed, 16 blocks produced in 0.1s
* Output num rows per block: 10 min, 40 max, 31 mean, 500 total
* Output size bytes per block: 100 min, 400 max, 300 mean, 166424 total
Operator 2 Repartition: executed in 0.2s
\t* Output num rows per block: 4 min, 79 max, 68 mean, 500 total
\t* Output size bytes per block: 8 min, 28 max, 22 mean, 9999 total
Operator 3 MapBatches(cover): 16 tasks executed, 16 blocks produced in 0.01s
* Output num rows per block: 1 min, 50 max, 31 mean, 500 total
* Output size bytes per block: 1 min, 5 max, 3 mean, 16128 total
"""
    rows = operator_summaries(stats)
    assert [r["op"] for r in rows] == [
        "ReadParquet->SplitBlocks(16)",
        "Repartition",
        "MapBatches(cover)",
    ]
    assert rows[0] == {
        "op": "ReadParquet->SplitBlocks(16)",
        "tasks": 1,
        "rows": 500,
        "bytes": 166424,
    }
    assert rows[1]["tasks"] is None and rows[1]["bytes"] == 9999
    assert rows[2]["bytes"] == 16128


def test_report_runs_on_registered_pipeline(ray_session):
    from tools.stats_report import report

    rows = report(
        "dup_span_coverage", "/root/testdata/sf0.001/documents.parquet"
    )
    assert rows, "expected at least one operator summary"
    assert any(r["rows"] for r in rows)
