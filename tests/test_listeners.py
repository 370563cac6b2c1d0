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


# ---------------------------------------------------------------------------
# ST8 span twin (streaming/tracing.py): attribute parity, field for field,
# with ViewUpdateTracingUtils.kt:12-37 and its unit test's expectations
# (ViewUpdateTracingUtilsTest.kt: span name + 4 attributes, outcome OK),
# plus the ON_ERROR branch (EcommerceCDCEventDispatcherService.kt:89).
# ---------------------------------------------------------------------------


def test_event_spans_attribute_parity_field_for_field(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.cdc_fold import prepare_events
    from pagopa_ecommerce_cdc_service_spark.schemas import EVENT_ENVELOPE_TYPE
    from pagopa_ecommerce_cdc_service_spark.sources import generate_event_log
    from pagopa_ecommerce_cdc_service_spark.streaming import tracing

    # the Kotlin constants, verbatim (ViewUpdateTracingUtils.kt:12-21)
    assert tracing.SPAN_NAME == "eventstoreCDCEvent"
    assert tracing.ATTR_EVENT_CODE == "ecommerce.cdc.processedEvent.eventCode"
    assert (
        tracing.ATTR_TRANSACTION_ID == "ecommerce.cdc.processedEvent.transactionId"
    )
    assert (
        tracing.ATTR_CREATION_DATE
        == "ecommerce.cdc.processedEvent.eventCreationDate"
    )
    assert tracing.ATTR_OUTCOME == "ecommerce.cdc.processedEvent.outcome"

    events = generate_event_log(seed=41, n_transactions=6)
    prepared = prepare_events(
        spark.createDataFrame(events, schema=EVENT_ENVELOPE_TYPE)
    )
    spans = tracing.event_spans(prepared)
    assert spans.columns == tracing.SPAN_COLUMNS  # exact names, exact order
    rows = spans.collect()
    assert len(rows) == prepared.count()  # one span per processed event
    by_attrs = {
        (
            r[tracing.ATTR_EVENT_CODE],
            r[tracing.ATTR_TRANSACTION_ID],
            r[tracing.ATTR_CREATION_DATE],
        )
        for r in rows
    }
    expected = {
        (e["eventCode"], e["transactionId"], e["creationDate"])
        for e in events
        if (e["id"], e["transactionId"]) != (None, None)
    }
    # prepared may drop some raw events (filters); every span must trace
    # back to a real event, and every outcome is OK on the happy path
    assert by_attrs <= expected
    assert {r["span_name"] for r in rows} == {tracing.SPAN_NAME}
    assert {r[tracing.ATTR_OUTCOME] for r in rows} == {tracing.OUTCOME_OK}


def test_event_spans_error_outcome_for_poisoned_ids(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.cdc_fold import prepare_events
    from pagopa_ecommerce_cdc_service_spark.schemas import EVENT_ENVELOPE_TYPE
    from pagopa_ecommerce_cdc_service_spark.sources import generate_event_log
    from pagopa_ecommerce_cdc_service_spark.streaming import tracing

    events = generate_event_log(seed=43, n_transactions=5)
    prepared = prepare_events(
        spark.createDataFrame(events, schema=EVENT_ENVELOPE_TYPE)
    )
    bad_ids = [r["id"] for r in prepared.select("id").limit(2).collect()]
    err_df = spark.createDataFrame([(i,) for i in bad_ids], "id string")
    spans = tracing.event_spans(prepared, error_ids=err_df)
    assert spans.columns == tracing.SPAN_COLUMNS
    outcome_by_code = {
        (r[tracing.ATTR_TRANSACTION_ID], r[tracing.ATTR_CREATION_DATE]): r[
            tracing.ATTR_OUTCOME
        ]
        for r in spans.collect()
    }
    got_err = sum(1 for v in outcome_by_code.values() if v == tracing.OUTCOME_ERROR)
    assert got_err == len(bad_ids)


def test_span_stream_side_output_writes_span_table(spark, tmp_path):
    import json as _json

    from pagopa_ecommerce_cdc_service_spark.operators.cdc_fold import prepare_events
    from pagopa_ecommerce_cdc_service_spark.sources import generate_event_log
    from pagopa_ecommerce_cdc_service_spark.streaming import tracing
    from pagopa_ecommerce_cdc_service_spark.streaming.pipeline import (
        read_event_stream,
    )

    events = generate_event_log(seed=47, n_transactions=8)
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    (log_dir / "a.json").write_text("\n".join(_json.dumps(e) for e in events))

    q = tracing.start_span_stream(
        prepare_events(read_event_stream(spark, str(log_dir))),
        str(tmp_path / "spans"),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    table = spark.read.parquet(str(tmp_path / "spans"))
    assert table.columns == tracing.SPAN_COLUMNS
    assert table.count() > 0
    from pyspark.sql import functions as F

    assert (
        table.filter(
            F.col(f"`{tracing.ATTR_OUTCOME}`") != tracing.OUTCOME_OK
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# ST7 HTTP surface (streaming/liveness_http.py): the reference serves the
# liveness verdict at /actuator/health/liveness (CustomLivenessIndicator.kt:
# 35-64 + Spring actuator wiring). The Spark twin must answer the same path
# with the actuator's status-code + body contract through every listener
# state: up+fresh -> 200 UP, stale -> 503 DOWN, terminated -> 503 DOWN,
# no tracked query -> 503 DOWN, wrong path -> 404.
# ---------------------------------------------------------------------------


def test_liveness_http_endpoint_through_staleness():
    import json
    import urllib.error
    import urllib.request

    from pagopa_ecommerce_cdc_service_spark.streaming.liveness_http import (
        LIVENESS_PATH,
        start_liveness_server,
    )

    listener = LivenessListener(inactivity_threshold_seconds=0.3)
    ids = []
    server = start_liveness_server(listener, lambda: ids, port=0)
    base = f"http://127.0.0.1:{server.server_port}"

    def probe(path=LIVENESS_PATH):
        try:
            with urllib.request.urlopen(base + path, timeout=5) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            body = e.read()
            return e.code, (json.loads(body) if body else None)

    try:
        # no tracked query: the pod is not serving its purpose -> DOWN
        assert probe() == (503, {"status": "DOWN"})

        ids.append("q1")
        listener.onQueryStarted(_started("q1"))
        listener.onQueryProgress(_progress("q1"))
        assert probe() == (200, {"status": "UP"})

        # stale: no progress for longer than the threshold -> DOWN
        time.sleep(0.4)
        assert probe() == (503, {"status": "DOWN"})

        # fresh progress revives it
        listener.onQueryProgress(_progress("q1"))
        assert probe() == (200, {"status": "UP"})

        # termination kills it regardless of freshness
        listener.onQueryTerminated(_started("q1"))
        assert probe() == (503, {"status": "DOWN"})

        status, _ = probe("/actuator/health/readiness")
        assert status == 404
    finally:
        server.shutdown()
