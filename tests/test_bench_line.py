"""The bench headline line must survive the driver's ~2000-char
stdout tail capture at the CURRENT HEADLINE count — growth past the
budget must be a conscious choice (r12 verdict #7: the line hit
1890/1900 chars and the next entry would have silently degraded every
sub-0.1s query to 1dp zeros; the small-fold tier now absorbs that)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, format_final_line  # noqa: E402


def _line_for(timings: dict[str, float]) -> dict:
    s = format_final_line(
        timings, round(sum(timings.values()), 3), 0.1, 0.612, "32"
    )
    assert len(s) < 1900, len(s)
    return json.loads(s)


def test_final_line_keeps_2dp_at_current_headline_count():
    # worst-plausible magnitudes: every line two-digit seconds (the r12
    # real artifact topped out at 8.35s), plus a spread of sub-0.05s
    # lines that the fold tier may absorb
    timings = {
        name: (0.04 if i % 7 == 0 else 10.0 + i / 100.0)
        for i, name in enumerate(HEADLINE)
    }
    rec = _line_for(timings)
    nd = rec.get("queries_precision", 3)
    assert nd is not None and nd >= 2, (
        "per-query map degraded below 2dp at the current HEADLINE "
        f"count (precision={nd}) — cull lines or raise the budget "
        "consciously"
    )
    # every non-folded query is in the map; folded ones reconcile
    n_map, n_small = len(rec["queries"]), rec.get("small_n", 0)
    assert n_map + n_small == len(HEADLINE)
    if n_small:
        assert rec["small_sec"] >= 0
        assert all(v >= 0.05 for v in rec["queries"].values())


def test_final_line_folds_small_queries_before_dropping_precision():
    # force the 2dp-full tier over budget with a crowd of sub-0.05s
    # long-named lines — the fold must rescue 2dp for the big ones
    timings = {
        f"query_with_a_rather_long_name_{i:03d}": 0.04 for i in range(40)
    }
    timings.update({f"expensive_q_{i:03d}": 10.0 + i for i in range(25)})
    rec = _line_for(timings)
    assert rec.get("small_n") == 40
    assert rec.get("queries_precision", 3) >= 2
    assert len(rec["queries"]) == 25


def test_final_line_last_resort_drops_map_but_keeps_value():
    timings = {f"q{i:04d}_{'x' * 40}": 1.234 for i in range(400)}
    rec = _line_for(timings)
    assert rec["queries"] == {} and rec["queries_precision"] is None
    assert rec["value"] == round(sum(timings.values()), 3)


def test_final_line_all_slow_run_folds_by_quantile():
    """An all-slow run (nothing under any absolute fold threshold —
    here every value is identical, so even a strict-below percentile
    cut would catch nothing) must fold the cheapest entries BY RANK
    and ship the expensive tail of the map, instead of jumping from
    2dp-full straight to dropping the map."""
    timings = {
        f"quite_long_query_name_number_{i:03d}": 10.123 for i in range(58)
    }
    rec = _line_for(timings)
    assert rec.get("queries_precision", 3) is not None, "map was dropped"
    n_map, n_small = len(rec["queries"]), rec.get("small_n", 0)
    assert n_map + n_small == 58 and n_map > 0 and n_small > 0
    # the fold reconciles: folded seconds + mapped seconds ≈ value
    assert abs(rec["small_sec"] + sum(rec["queries"].values())
               - rec["value"]) < 0.1 * 58
    assert rec["small_lt"] == 10.123
