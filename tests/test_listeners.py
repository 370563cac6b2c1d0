"""LivenessListener state machine: the four states of the reference's
CustomLivenessIndicator (liveness up+fresh / up+stale / never started /
terminated) plus the threshold<=0 disable (CustomLivenessIndicator.kt:49-62,
tests liveness/CustomLivenessIndicatorTest.kt)."""

from __future__ import annotations

import time
from types import SimpleNamespace

from pagopa_ecommerce_cdc_service_spark.streaming.listeners import LivenessListener


def _started(qid):  # event shims: only .id / .progress.id are read
    return SimpleNamespace(id=qid)


def _progress(qid):
    return SimpleNamespace(progress=SimpleNamespace(id=qid))


def test_never_started_is_dead():
    assert not LivenessListener().is_alive("q1")


def test_started_and_fresh_is_alive():
    l = LivenessListener(inactivity_threshold_seconds=3600)
    l.onQueryStarted(_started("q1"))
    l.onQueryProgress(_progress("q1"))
    assert l.is_alive("q1")


def test_stale_is_dead():
    l = LivenessListener(inactivity_threshold_seconds=0.05)
    l.onQueryStarted(_started("q1"))
    time.sleep(0.1)
    assert not l.is_alive("q1")


def test_terminated_is_dead():
    l = LivenessListener()
    l.onQueryStarted(_started("q1"))
    l.onQueryTerminated(_started("q1"))
    assert not l.is_alive("q1")


def test_nonpositive_threshold_disables_staleness():
    l = LivenessListener(inactivity_threshold_seconds=-1)
    l.onQueryStarted(_started("q1"))
    time.sleep(0.05)
    assert l.is_alive("q1")


def test_idle_counts_as_progress():
    l = LivenessListener(inactivity_threshold_seconds=0.2)
    l.onQueryStarted(_started("q1"))
    time.sleep(0.15)
    l.onQueryIdle(_started("q1"))
    time.sleep(0.1)
    assert l.is_alive("q1")
