"""Unit tests for the streaming state fold's seen-set (ST3 dedup) semantics:
eviction is by ARRIVAL recency, not lexicographic id order, and identity-less
events are skipped rather than fatal. No SparkSession needed — the fold
function is driven directly with a fake GroupState."""

from __future__ import annotations

import json

import pandas as pd

from pagopa_ecommerce_cdc_service_spark.streaming.state_fold import (
    MAX_SEEN_IDS_PER_KEY,
    fold_state_func,
)


class FakeGroupState:
    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, value):
        self._val = tuple(value)


_DEFAULT = object()


def _activated(i: int, *, eid=_DEFAULT, email=None, ts=None, seq=None):
    return {
        "id": f"ev-{i}" if eid is _DEFAULT else eid,
        "transactionId": "tx-1",
        "eventCode": "TRANSACTION_ACTIVATED_EVENT",
        "creationDate": "2025-01-01T00:00:00.000Z",
        "seq": i if seq is None else seq,
        "_ts_millis": (1_000 + i) if ts is None else ts,
        "data": {"email": f"e{i}" if email is None else email},
    }


def _run(state, events):
    out = list(fold_state_func(("tx-1",), [pd.DataFrame(events)], state))
    assert len(out) == 1 and len(out[0]) == 1
    return out[0].iloc[0].to_dict()


def test_seen_cap_keeps_arrival_recency_not_lexicographic_order():
    n = MAX_SEEN_IDS_PER_KEY + 904  # overflow the cap
    state = FakeGroupState()
    # unpadded ids: lexicographic order ("ev-999" > "ev-4000") disagrees with
    # arrival order, so a sort-based cap would retain the wrong window
    row = _run(state, [_activated(i) for i in range(n)])
    assert row["email"] == f"e{n - 1}"

    seen = json.loads(state.get[0])["seen"]
    assert len(seen) == MAX_SEEN_IDS_PER_KEY
    # exactly the most recent arrivals, oldest first
    assert seen == [f"ev-{i}" for i in range(n - MAX_SEEN_IDS_PER_KEY, n)]

    # a late duplicate of a RECENT id must still be dropped...
    recent_dup = _activated(n - 1, email="dup-should-be-dropped", seq=n + 1, ts=9_999_999)
    row = _run(state, [recent_dup])
    assert row["email"] == f"e{n - 1}"

    # ...while a duplicate of an EVICTED (old) id re-applies — the documented
    # cap trade-off mirroring the reference's lock TTL expiry
    old_dup = _activated(0, email="reapplied", seq=n + 2, ts=10_000_000)
    row = _run(state, [old_dup])
    assert row["email"] == "reapplied"


def test_poison_pill_event_quarantined_view_survives():
    """ST4: an event that throws inside the fold is skipped (marked seen, not
    retried) and reported in the _poisoned output column; the view keeps
    folding the rest of the batch — the reference's non-retriable-error skip
    (EcommerceCDCEventDispatcherService.kt:38-66)."""
    state = FakeGroupState()
    poison = _activated(2)
    poison["_ts_millis"] = None
    poison["creationDate"] = "not-a-timestamp"  # parse_millis → ValueError

    out = list(
        fold_state_func(
            ("tx-1",),
            [pd.DataFrame([_activated(1), poison, _activated(3)])],
            state,
        )
    )[0].iloc[0].to_dict()

    assert out["email"] == "e3"  # view built from the surviving events
    assert len(out["_poisoned"]) == 1
    assert out["_poisoned"][0]["id"] == "ev-2"
    assert "ValueError" in out["_poisoned"][0]["error"]

    # poisoned id is seen: a redelivery is dropped, not retried forever
    seen = json.loads(state.get[0])["seen"]
    assert seen == ["ev-1", "ev-2", "ev-3"]
    out2 = _run(state, [dict(poison, seq=10)])
    assert out2["_poisoned"] is None
    assert out2["email"] == "e3"


def test_poison_pill_leaves_view_unmutated():
    """A poisoned event must not half-write the view (apply runs on a scratch
    copy): the stored view state is byte-identical before and after it."""
    state = FakeGroupState()
    _run(state, [_activated(1)])
    before = json.loads(state.get[0])["view"]

    poison = _activated(2, ts=None)
    poison["_ts_millis"] = None
    poison["creationDate"] = "boom"  # parse_millis → ValueError

    out = _run(state, [poison])
    after = json.loads(state.get[0])["view"]
    assert out["_poisoned"] is not None and out["_poisoned"][0]["id"] == "ev-2"
    assert after == before  # guard state untouched by the failed event


def test_seen_ids_cap_configurable():
    """CdcConfig.seen_ids_cap flows into the fold (the lock-TTL analog)."""
    state = FakeGroupState()
    list(
        fold_state_func(
            ("tx-1",),
            [pd.DataFrame([_activated(i) for i in range(5)])],
            state,
            seen_ids_cap=2,
        )
    )
    assert json.loads(state.get[0])["seen"] == ["ev-3", "ev-4"]


def test_null_event_id_skipped_not_fatal():
    state = FakeGroupState()
    events = [
        _activated(1),
        _activated(2, eid=None, email="ghost"),  # identity-less: skipped
        _activated(3),
    ]
    row = _run(state, events)
    assert row["email"] == "e3"
    seen = json.loads(state.get[0])["seen"]
    assert seen == ["ev-1", "ev-3"]


class FakeTimeoutGroupState(FakeGroupState):
    def __init__(self, timed_out=False):
        super().__init__()
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    def remove(self):
        self._val = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_view_state_ttl_off_by_default_never_arms_timeout():
    """Reference parity (ST5): without the knob the fold must not arm any
    state timeout — the view state lives forever, like the Mongo view."""
    state = FakeTimeoutGroupState()
    _run(state, [_activated(1)])
    assert state.timeout_ms is None


def test_view_state_ttl_evicts_then_reinserts_fresh():
    """SURVEY §7 deviation knob: a timed-out key is evicted silently; a
    later event re-inserts a FRESH view (clean restart, not a corrupt
    half-merge with the expired state)."""
    state = FakeTimeoutGroupState()
    out = list(
        fold_state_func(
            ("tx-1",), [pd.DataFrame([_activated(1)])], state,
            view_state_ttl_seconds=30.0,
        )
    )
    assert state.timeout_ms == 30_000  # armed (and re-armed) on update
    assert len(out) == 1

    # the key goes idle past the TTL: Spark invokes the fold with
    # hasTimedOut=True and no rows — state drops, nothing is emitted
    expired = FakeTimeoutGroupState(timed_out=True)
    expired._val = state._val
    out = list(
        fold_state_func(
            ("tx-1",), iter([]), expired, view_state_ttl_seconds=30.0,
        )
    )
    assert expired.removed and not expired.exists
    assert out == []

    # the transaction speaks again: absent state ⇒ fresh view from the new
    # event on; the pre-TTL email is gone, the seen-set restarts
    revived = FakeTimeoutGroupState()
    row = _run_ttl(revived, [_activated(7, email="fresh-after-ttl")])
    assert row["email"] == "fresh-after-ttl"
    assert json.loads(revived.get[0])["seen"] == ["ev-7"]


def _run_ttl(state, events):
    out = list(
        fold_state_func(
            ("tx-1",), [pd.DataFrame(events)], state, view_state_ttl_seconds=30.0
        )
    )
    assert len(out) == 1 and len(out[0]) == 1
    return out[0].iloc[0].to_dict()
