"""Tolerant-parse tests: malformed input quarantined, valid input preserved
(reference semantics: parse failures skip the record, never kill the stream —
EcommerceTransactionsLogEventsStream.kt:122-135, tests :546-583)."""

from __future__ import annotations

import json

from pagopa_ecommerce_cdc_service_spark.operators.cdc_fold import transactions_view_from_log
from pagopa_ecommerce_cdc_service_spark.sources import generate_event_log, parse_envelope_lines


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_corrupt_and_incomplete_lines_quarantined(spark):
    events = generate_event_log(seed=7, n_transactions=5)
    good_lines = [json.dumps(e) for e in events]
    bad_lines = [
        "{not json at all",
        '"a bare string"',
        "[1, 2, 3]",
        json.dumps({"transactionId": "t-1", "eventCode": "X"}),  # missing id
        json.dumps({"id": "ev-1", "eventCode": "X"}),  # missing transactionId
        "",
    ]
    good, quar = parse_envelope_lines(_lines_df(spark, good_lines + bad_lines))
    assert good.count() == len(good_lines)
    assert quar.count() == len(bad_lines)
    assert set(quar.columns) == {"raw_record"}
    # identity fields survive the round-trip
    ids = {r.id for r in good.select("id").collect()}
    assert ids == {e["id"] for e in events}


def test_parsed_lines_fold_equals_direct_fold(spark):
    from pagopa_ecommerce_cdc_service_spark.schemas import EVENT_ENVELOPE_TYPE

    events = generate_event_log(seed=11, n_transactions=20)
    direct = spark.createDataFrame(events, EVENT_ENVELOPE_TYPE)
    good, _ = parse_envelope_lines(_lines_df(spark, [json.dumps(e) for e in events]))
    v1 = transactions_view_from_log(direct)
    v2 = transactions_view_from_log(good)
    r1 = sorted((str(r) for r in v1.collect()))
    r2 = sorted((str(r) for r in v2.collect()))
    assert r1 == r2
