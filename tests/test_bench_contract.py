"""bench.py output-contract pins (no Spark session needed).

The driver machine-parses only the LAST stdout line (the summary line);
the top_movers line (VERDICT r18 item 2) sits above it and must stay
under 1 KB so both land inside the driver's 2000-char tail capture.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_top_movers_payload():
    prev = {"a": 1.0, "b": 2.0, "err_prev": -1.0, "gone": 5.0}
    now = {"a": 1.5, "b": 2.0, "err_prev": 3.0, "err_now": -1.0, "new": 9.9}
    m = bench.top_movers(prev, now)
    # errored keys (either side) and non-common keys are excluded
    assert m["n_common"] == 2
    assert m["movers"] == {"a": [1.0, 1.5], "b": [2.0, 2.0]}
    # biggest absolute delta first
    assert list(m["movers"]) == ["a", "b"]


def test_top_movers_empty_prev_is_none():
    assert bench.top_movers({}, {"a": 1.0}) is None


def test_top_movers_line_under_1kb():
    # worst realistic case: 10 movers with long key names
    keys = ["stateful_running_agg_tws_bootstrap_%02d" % i for i in range(40)]
    prev = {k: float(i) for i, k in enumerate(keys)}
    now = {k: float(i) + 123.456 for i, k in enumerate(keys)}
    m = bench.top_movers(prev, now)
    assert len(m["movers"]) == 10
    assert len(json.dumps(m)) < 1000
