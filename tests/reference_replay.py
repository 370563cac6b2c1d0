"""Faithful pure-Python replay of the reference's upsert pipeline — the test
oracle for the Spark CDC fold.

Simulates, event by event in arrival order, exactly what
/root/reference/src/main/kotlin/it/pagopa/ecommerce/cdc/services/TransactionViewUpsertService.kt:60-250
does against MongoDB:

  attempt 1: guarded statusUpdate (update iff strictly newer, :160-170)
  attempt 2: unguarded dataUpdate when the guard blocked (:201-250)
  attempt 3: upsert-if-absent applying the statusUpdate + _class (:64-81)

plus the intake filters (operationType/ttl/unknown-code skips, lock dedup)
from EcommerceTransactionsLogEventsStream.kt:79-135,183-206.

It interprets the same declarative mapping table as the Spark fold
(event_mapping.EVENT_SPECS) through the *_py evaluators, so batch fold,
streaming fold and oracle share one source of truth for the 19-way dispatch.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from pagopa_ecommerce_cdc_service_spark.event_mapping import EVENT_SPECS, WriteMode
from pagopa_ecommerce_cdc_service_spark.schemas import TRANSACTION_VIEW_CLASS

_OPERATION_TYPES = ("insert", "update", "replace")


def parse_millis(iso: str) -> int:
    # ZonedDateTime.parse(...).toInstant().toEpochMilli() equivalent
    s = iso.replace("Z", "+00:00")
    # datetime.fromisoformat handles up to 6 fractional digits; trim nanos
    if "." in s:
        head, rest = s.split(".", 1)
        for i, c in enumerate(rest):
            if not c.isdigit():
                frac, tz = rest[:i], rest[i:]
                break
        else:
            frac, tz = rest, ""
        s = f"{head}.{frac[:6]}{tz}"
    return int(datetime.fromisoformat(s).timestamp() * 1000)


def replay_reference(events: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """Replay in arrival (seq) order; returns {transactionId: view dict}."""
    views: dict[str, dict[str, Any]] = {}
    seen_ids: set[str] = set()

    for e in sorted(events, key=lambda x: x["seq"]):
        # server-side operationType match + ttl-marker skip
        if e.get("operationType") not in _OPERATION_TYPES:
            continue
        if e.get("ttl") is not None:
            continue
        # Redis exclusive lock: second delivery of the same id is dropped
        if e["id"] in seen_ids:
            continue
        seen_ids.add(e["id"])
        # unknown eventCode → CdcEventTypeException (non-retriable, dropped)
        spec = EVENT_SPECS.get(e["eventCode"])
        if spec is None:
            continue

        ts = parse_millis(e["creationDate"])
        key = e["transactionId"]
        view = views.get(key)
        applied = view is None or view["lastProcessedEventAt"] < ts

        if view is None:
            # upsert inserts the document with _class (:71-75)
            view = views[key] = {
                "transactionId": key,
                "_class": TRANSACTION_VIEW_CLASS,
                "lastProcessedEventAt": None,
            }

        if applied:
            view["lastProcessedEventAt"] = ts
            if spec.status_py is not None:
                status = spec.status_py(e)
                if status is not None:
                    view["status"] = status

        for w in spec.writes:
            if w.cond_py is not None and not w.cond_py(e):
                continue
            if w.guarded and not applied:
                continue
            value = w.value_py(e)
            if w.mode is WriteMode.SET_IF_NONNULL and value is None:
                continue
            # SET_ALWAYS with null ≡ Mongo $unset ≡ relational NULL
            view[w.view_field] = value

    return views
