"""Property test for the repo's core theorem: the order-insensitive Catalyst
fold (window guard + max-by-seq aggregates) computes exactly what the
sequential per-event replay computes, for ANY event log — adversarial
timestamp collisions, duplicate deliveries, arbitrary arrival order,
skip-rule interleavings. Hypothesis shrinks failures to minimal logs.

Spark round-trips are slow, so examples are few but maximally hostile:
2 transactions, tiny timestamp domain (forced equal-ts pairs), payload
variants drawn through the fixture payload builder.
"""

from __future__ import annotations

import random

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pagopa_ecommerce_cdc_service_spark.event_mapping import KNOWN_EVENT_CODES
from pagopa_ecommerce_cdc_service_spark.operators import transactions_view_from_log
from pagopa_ecommerce_cdc_service_spark.schemas import EVENT_ENVELOPE_TYPE
from pagopa_ecommerce_cdc_service_spark.sources.fixtures import _payload

from reference_replay import replay_reference
from test_cdc_fold import assert_views_equal

CODES = list(KNOWN_EVENT_CODES) + ["BOGUS_EVENT"]


@st.composite
def event_logs(draw) -> list[dict]:
    events = []
    for t in range(draw(st.integers(1, 2))):
        tx = f"tx-{t}"
        for i in range(draw(st.integers(1, 6))):
            code = draw(st.sampled_from(CODES))
            # 4-slot timestamp domain → frequent equal-ts pairs (strict-< guard)
            slot = draw(st.integers(0, 3))
            rng = random.Random(draw(st.integers(0, 99)))
            events.append(
                {
                    "id": f"e{t}-{i}",
                    "transactionId": tx,
                    "eventCode": code,
                    "creationDate": f"2025-01-01T00:00:0{slot}.000000Z",
                    "ttl": draw(st.sampled_from([None, None, None, 1])),
                    "operationType": draw(
                        st.sampled_from(["insert", "insert", "update", "delete"])
                    ),
                    "data": _payload(rng, code, tx),
                }
            )
    # duplicate deliveries of existing events (lock dedup: first wins)
    for j in draw(st.lists(st.integers(0, len(events) - 1), max_size=2)):
        events.append(dict(events[j]))
    # arbitrary arrival order
    order = draw(st.permutations(range(len(events))))
    shuffled = [events[k] for k in order]
    for seq, ev in enumerate(shuffled):
        ev = dict(ev)
        ev["seq"] = seq
        shuffled[seq] = ev
    return shuffled


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(event_logs())
def test_catalyst_fold_equals_sequential_replay(spark, events):
    batch = spark.createDataFrame(events, schema=EVENT_ENVELOPE_TYPE)
    got = {
        r["transactionId"]: r.asDict(recursive=True)
        for r in transactions_view_from_log(batch).collect()
    }
    assert_views_equal(got, replay_reference(events))
