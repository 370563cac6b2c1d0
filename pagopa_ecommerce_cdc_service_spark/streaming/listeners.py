"""Operational observability for the streaming pipeline.

Spark translation of the reference's liveness machinery
(liveness/CustomLivenessIndicator.kt:35-64: stream-up flag + staleness of the
last dequeued event vs an inactivity threshold; flags written from the stream
callbacks at EcommerceTransactionsLogEventsStream.kt:47-96).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..event_mapping import KNOWN_EVENT_CODES


class LivenessListener(StreamingQueryListener):
    """Tracks last-progress wall time per query; ``is_alive`` mirrors the
    reference's inactivity check (threshold ≤ 0 disables, like
    CustomLivenessIndicator.kt:49-52)."""

    def __init__(self, inactivity_threshold_seconds: float = 3600.0):
        self.threshold = inactivity_threshold_seconds
        self.last_progress_at: dict[str, float] = {}
        self.running: dict[str, bool] = {}

    # -- listener callbacks (ids normalized: PySpark surfaces UUIDs/strings
    # inconsistently across event types) --------------------------------------
    def onQueryStarted(self, event) -> None:
        self.running[str(event.id)] = True
        self.last_progress_at[str(event.id)] = time.time()

    def onQueryProgress(self, event) -> None:
        self.last_progress_at[str(event.progress.id)] = time.time()

    def onQueryIdle(self, event) -> None:
        self.last_progress_at[str(event.id)] = time.time()

    def onQueryTerminated(self, event) -> None:
        self.running[str(event.id)] = False

    # -- probe --------------------------------------------------------------
    def is_alive(self, query_id) -> bool:
        qid = str(query_id)
        if not self.running.get(qid, False):
            return False
        if self.threshold <= 0:
            return True
        last = self.last_progress_at.get(qid)
        return last is not None and (time.time() - last) <= self.threshold


# ---------------------------------------------------------------------------
# Per-batch fold metrics (ST8): the Spark analog of the reference's per-event
# OTel span attributes — eventCode / outcome counters
# (utils/ViewUpdateTracingUtils.kt:23-37, mdcutilities/CdcTracingUtils.java:71-95)
# — surfaced as named observed metrics on StreamingQueryProgress. Pure public
# API: ``DataFrame.observe`` runs the counters as accumulator-backed
# aggregates inside the existing job, no extra pass over the data.
# ---------------------------------------------------------------------------

INTAKE_METRIC = "cdc_intake"
FOLD_METRIC = "cdc_fold"


def observe_intake(raw: DataFrame) -> DataFrame:
    """Count raw envelope rows entering the pipeline (pre-filter)."""
    return raw.observe(INTAKE_METRIC, F.count(F.lit(1)).alias("n_raw"))


def observe_fold(prepared: DataFrame) -> DataFrame:
    """Count folded rows + per-eventCode breakdown on the valid stream."""
    aggs = [F.count(F.lit(1)).alias("n_folded")]
    aggs += [
        F.sum(F.when(F.col("eventCode") == c, 1).otherwise(0)).alias(f"n::{c}")
        for c in KNOWN_EVENT_CODES
    ]
    return prepared.observe(FOLD_METRIC, *aggs)


class FoldMetricsListener(StreamingQueryListener):
    """Accumulates the observed metrics across micro-batches: rows seen,
    rows folded, rows skipped by intake filters (the reference's
    per-record-error/skip path, ST6), and per-eventCode counts."""

    def __init__(self):
        self.batches = 0
        self.rows_raw = 0
        self.rows_folded = 0
        self.rows_skipped = 0
        self.by_event_code: dict[str, int] = {}

    def onQueryStarted(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryProgress(self, event) -> None:
        om = event.progress.observedMetrics
        intake = om.get(INTAKE_METRIC)
        fold = om.get(FOLD_METRIC)
        n_raw = (intake["n_raw"] or 0) if intake is not None else 0
        n_folded = (fold["n_folded"] or 0) if fold is not None else 0
        self.rows_raw += n_raw
        if fold is not None:
            self.batches += 1
            self.rows_folded += n_folded
            for c in KNOWN_EVENT_CODES:
                v = fold[f"n::{c}"] or 0
                if v:
                    self.by_event_code[c] = self.by_event_code.get(c, 0) + v
        if intake is not None:
            self.rows_skipped += n_raw - n_folded
