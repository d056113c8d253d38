"""bench.py compact-line contract: failures always surface (ADVICE r5)."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import MAX_LINE, compact_result_line


def test_failed_queries_survive_trimming():
    # enough long-named queries that per-query precision alone can't fit
    timings = {f"query_with_a_rather_long_name_{i:03d}": 0.001 + i for i in range(200)}
    timings["broken_query_a"] = -1.0
    timings["broken_query_b"] = -1.0
    total = sum(t for t in timings.values() if t >= 0)
    line = compact_result_line(timings, total, 0.1)
    assert len(line) <= MAX_LINE
    parsed = json.loads(line)
    # the failed entries are never folded into queries_omitted
    assert parsed["n_failed"] == 2
    assert parsed["queries"]["broken_query_a"] == -1.0
    assert parsed["queries"]["broken_query_b"] == -1.0
    # successful queries were trimmed (that's what forced the trim path)
    assert parsed.get("queries_omitted", 0) > 0


def test_no_failures_line_unchanged_shape():
    timings = {"q1": 1.0, "q2": 2.0}
    parsed = json.loads(compact_result_line(timings, 3.0, 0.1))
    assert "n_failed" not in parsed
    assert parsed["queries"] == {"q1": 1.0, "q2": 2.0}
