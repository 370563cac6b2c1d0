"""Test oracle: faithful replay of the reference's upsert pipeline.

Thin wrapper over the package's pure-Python per-event merge
(:mod:`pagopa_ecommerce_cdc_service_spark.operators.python_fold`), adding
the stream-level intake behavior (arrival ordering + exclusive-lock dedup,
EcommerceTransactionsLogEventsStream.kt:79-206). Keeping the merge itself in
the package means the batch fold, the streaming state fold and this oracle
all interpret one mapping table.
"""

from __future__ import annotations

from typing import Any

from pagopa_ecommerce_cdc_service_spark.operators.python_fold import (
    apply_event,
    is_processable,
    new_view,
    parse_millis,  # noqa: F401  (re-exported for tests)
)


def replay_reference(events: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """Replay in arrival (seq) order; returns {transactionId: view dict}."""
    views: dict[str, dict[str, Any]] = {}
    seen_ids: set[str] = set()

    for e in sorted(events, key=lambda x: x["seq"]):
        if not is_processable(e):
            continue
        # Redis exclusive lock: second delivery of the same id is dropped
        if e["id"] in seen_ids:
            continue
        seen_ids.add(e["id"])
        key = e["transactionId"]
        view = views.get(key)
        if view is None:
            view = views[key] = new_view(key)
        apply_event(view, e)

    return views
