"""The bench regression gate must trip on an injected regression and stay
quiet within the budget (pure function — no Spark needed)."""

from __future__ import annotations

import json
from pathlib import Path

from bench import check_regressions


def test_injected_regression_detected():
    baseline = {"q1": 1.0, "q2": 0.5}
    assert check_regressions({"q1": 2.5, "q2": 0.6}, baseline) == [
        "q1: 2.500s > 2x baseline 1.000s"
    ]


def test_within_budget_passes():
    baseline = {"q1": 1.0, "q2": 0.5}
    assert check_regressions({"q1": 1.9, "q2": 0.99}, baseline) == []


def test_subsecond_baselines_floored_against_jitter():
    # a 30ms query jittering to 90ms is not a regression
    assert check_regressions({"q": 0.09}, {"q": 0.03}) == []
    assert check_regressions({"q": 0.25}, {"q": 0.03}) != []


def test_missing_query_ignored():
    assert check_regressions({}, {"q1": 1.0}) == []


def test_committed_baseline_matches_headline_suite():
    repo = Path(__file__).resolve().parent.parent
    spec = json.loads((repo / "bench_baseline.json").read_text())
    from bench import HEADLINE

    assert spec["sf"] == 0.1
    assert set(spec["queries"]) == set(HEADLINE)
