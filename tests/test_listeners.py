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


def test_fold_metrics_listener_counts_folded_skipped_per_code(spark, tmp_path):
    """ST8 end-to-end: run the real gate stream with the metrics listener
    attached and assert the per-batch counters — rows folded, rows skipped by
    the intake filters, and the per-eventCode breakdown (the reference's span
    attributes, ViewUpdateTracingUtils.kt:23-37)."""
    import json

    from pagopa_ecommerce_cdc_service_spark.streaming.listeners import (
        FoldMetricsListener,
    )
    from pagopa_ecommerce_cdc_service_spark.streaming.pipeline import (
        read_event_stream,
        stream_transactions_view,
    )

    def ev(i, code, **extra):
        return {
            "id": f"ev-{i}",
            "transactionId": f"tx-{i % 2}",
            "eventCode": code,
            "creationDate": f"2025-01-01T00:00:{i:02d}.000Z",
            "seq": i,
            "operationType": "insert",
            "data": None,
            **extra,
        }

    events = [
        ev(0, "TRANSACTION_ACTIVATED_EVENT"),
        ev(1, "TRANSACTION_CLOSURE_REQUESTED_EVENT"),
        ev(2, "TRANSACTION_ACTIVATED_EVENT"),
        ev(3, "TRANSACTION_EXPIRED_EVENT", ttl=1),  # ttl marker → skipped
        ev(4, "SOMETHING_UNKNOWN"),                 # unknown code → skipped
        ev(5, "TRANSACTION_REFUNDED_EVENT", operationType="delete"),  # skipped
    ]
    src = tmp_path / "log"
    src.mkdir()
    (src / "all.json").write_text("\n".join(json.dumps(e) for e in events))

    metrics = FoldMetricsListener()
    spark.streams.addListener(metrics)
    try:
        q = (
            stream_transactions_view(read_event_stream(spark, str(src)))
            .writeStream.format("memory")
            .queryName("metrics_demo")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # listener delivery is async — poll briefly
        deadline = time.time() + 30
        while metrics.batches == 0 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(metrics)

    assert metrics.batches >= 1
    assert metrics.rows_raw == 6
    assert metrics.rows_folded == 3
    assert metrics.rows_skipped == 3
    assert metrics.by_event_code == {
        "TRANSACTION_ACTIVATED_EVENT": 2,
        "TRANSACTION_CLOSURE_REQUESTED_EVENT": 1,
    }
