"""Generated-docs sync gates (round 5).

Three consecutive rounds shipped perf docs contradicted by measurement;
the fix is structural: BENCHMARKS.md and the README performance section
are rendered from committed measurement rows (benchmarks/results.jsonl)
and docs/api.md from live docstrings.  These tests fail whenever either
artifact drifts from its source of truth, so a stale claim cannot be
committed silently.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))
sys.path.insert(0, os.path.join(REPO, "docs"))


def test_benchmarks_doc_in_sync():
    import report

    md, readme = report.render(write=False)
    assert open(report.BENCHMARKS_MD).read() == md, (
        "BENCHMARKS.md does not match benchmarks/results.jsonl — run "
        "`python benchmarks/report.py render` and commit the result")
    assert open(report.README_MD).read() == readme, (
        "README.md performance section does not match "
        "benchmarks/results.jsonl — run `python benchmarks/report.py "
        "render` and commit the result")


def test_benchmark_rows_are_provenance_stamped():
    import report

    rows = report.load_rows()
    assert rows, "benchmarks/results.jsonl is empty"
    for r in rows:
        for field in ("job", "key", "command", "device", "platform", "date"):
            assert field in r, (r["job"], r.get("key"), field)


def test_api_reference_in_sync():
    import gen_api

    md = gen_api.render()
    assert open(gen_api.API_MD).read() == md, (
        "docs/api.md does not match the live docstrings — run "
        "`python docs/gen_api.py` and commit the result")
