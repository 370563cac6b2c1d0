"""Operational observability for the streaming pipeline.

Spark translation of the reference's liveness machinery
(liveness/CustomLivenessIndicator.kt:35-64: stream-up flag + staleness of the
last dequeued event vs an inactivity threshold; flags written from the stream
callbacks at EcommerceTransactionsLogEventsStream.kt:47-96).
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


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
