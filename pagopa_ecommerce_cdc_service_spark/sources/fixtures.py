"""Deterministic eventstore fixture generator (FIXTURES.md §1, §4).

Generates envelope-event logs exercising every scenario axis from the
reference's test matrix (see FIXTURES.md §4 and the reference tests at
/root/reference/src/test/kotlin/.../services/TransactionViewUpsertServiceTest.kt):
happy path, out-of-order arrival, view-absent starts, equal timestamps,
duplicate deliveries, ttl/operationType/unknown-code skips, and explicit-null
(unset) resurrection.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Any

LIFECYCLE = [
    "TRANSACTION_ACTIVATED_EVENT",
    "TRANSACTION_AUTHORIZATION_REQUESTED_EVENT",
    "TRANSACTION_AUTHORIZATION_COMPLETED_EVENT",
    "TRANSACTION_CLOSURE_REQUESTED_EVENT",
    "TRANSACTION_CLOSED_EVENT",
    "TRANSACTION_USER_RECEIPT_REQUESTED_EVENT",
    "TRANSACTION_USER_RECEIPT_ADDED_EVENT",
]

EXTRA_EVENTS = [
    "TRANSACTION_EXPIRED_EVENT",
    "TRANSACTION_REFUND_REQUESTED_EVENT",
    "TRANSACTION_REFUND_ERROR_EVENT",
    "TRANSACTION_REFUNDED_EVENT",
    "TRANSACTION_REFUND_RETRIED_EVENT",
    "TRANSACTION_USER_CANCELED_EVENT",
    "TRANSACTION_CLOSURE_ERROR_EVENT",
    "TRANSACTION_CLOSURE_RETRIED_EVENT",
    "TRANSACTION_CLOSURE_SYNTHETIC_EVENT",
    "TRANSACTION_CLOSURE_FAILED_EVENT",
    "TRANSACTION_ADD_USER_RECEIPT_ERROR_EVENT",
    "TRANSACTION_ADD_USER_RECEIPT_RETRY_EVENT",
]

_BASE = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _iso(ts: datetime) -> str:
    # micro-precision ISO-8601 zoned string, e.g. 2025-01-01T00:00:00.123456Z
    return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _payload(rng: random.Random, code: str, tx: str) -> dict[str, Any] | None:
    d: dict[str, Any] = {}
    if code == "TRANSACTION_ACTIVATED_EVENT":
        d["email"] = f"user{tx}@example.com"
        d["paymentNotices"] = [
            {
                "paymentToken": f"tok-{tx}-{i}",
                "rptId": f"rpt-{tx}-{i}",
                "description": f"notice {i}",
                "amount": rng.randrange(100, 10_000),
            }
            for i in range(rng.randrange(1, 3))
        ]
        d["clientId"] = rng.choice(["CHECKOUT", "IO", "CHECKOUT_CART"])
        d["userId"] = None if rng.random() < 0.3 else f"uid-{tx}"
    elif code == "TRANSACTION_AUTHORIZATION_REQUESTED_EVENT":
        d["paymentGateway"] = rng.choice(["NPG", "REDIRECT"])
        d["paymentTypeCode"] = rng.choice(["CP", "PPAL", "BPAY"])
        d["pspId"] = f"psp-{rng.randrange(10)}"
        d["fee"] = rng.randrange(50, 500)
        d["authorizationRequestId"] = f"authreq-{tx}"
    elif code == "TRANSACTION_AUTHORIZATION_COMPLETED_EVENT":
        kind = rng.choice(["NPG", "REDIRECT", "UNKNOWN"])
        d["authorizationCode"] = None if rng.random() < 0.25 else f"auth-{rng.randrange(10_000)}"
        d["rrn"] = None if rng.random() < 0.25 else f"rrn-{rng.randrange(10_000)}"
        d["gatewayAuthData"] = {
            "kind": kind,
            "operationResult": rng.choice(["EXECUTED", "DECLINED", "FAILED"]),
            "outcome": rng.choice(["OK", "KO"]),
            "paymentEndToEndId": None if rng.random() < 0.3 else f"e2e-{rng.randrange(10_000)}",
            "errorCode": None if rng.random() < 0.5 else f"E{rng.randrange(100):03d}",
        }
    elif code in ("TRANSACTION_USER_RECEIPT_REQUESTED_EVENT", "TRANSACTION_USER_RECEIPT_ADDED_EVENT"):
        d["responseOutcome"] = rng.choice(["OK", "KO"])
    elif code == "TRANSACTION_CLOSED_EVENT":
        d["wasCanceledByUser"] = rng.random() < 0.2
        d["responseOutcome"] = rng.choice(["OK", "KO"])
    elif code == "TRANSACTION_EXPIRED_EVENT":
        d["statusBeforeExpiration"] = rng.choice(
            ["ACTIVATED", "CANCELLATION_REQUESTED", "AUTHORIZATION_COMPLETED", "CLOSED"]
        )
    elif code in ("TRANSACTION_CLOSURE_ERROR_EVENT", "TRANSACTION_CLOSURE_RETRIED_EVENT"):
        if code == "TRANSACTION_CLOSURE_RETRIED_EVENT" and rng.random() < 0.5:
            d["closureErrorData"] = None
        else:
            d["closureErrorData"] = {
                "httpErrorCode": rng.choice(["500", "502", "422"]),
                "errorDescription": "closure failed",
                "errorType": rng.choice(["KO_RESPONSE_RECEIVED", "COMMUNICATION_ERROR"]),
            }
    return d or None


def generate_event_log(
    seed: int = 42,
    n_transactions: int = 50,
    shuffle: bool = True,
    p_duplicate: float = 0.05,
    p_equal_ts: float = 0.08,
    p_ttl: float = 0.03,
    p_bad_optype: float = 0.03,
    p_unknown_code: float = 0.03,
) -> list[dict[str, Any]]:
    """Build a list of envelope-event dicts (schema: schemas.EVENT_ENVELOPE_TYPE)."""
    rng = random.Random(seed)
    events: list[dict[str, Any]] = []
    eid = 0
    for t in range(n_transactions):
        tx = f"tx-{seed}-{t:05d}"
        n_life = rng.randrange(1, len(LIFECYCLE) + 1)
        codes = LIFECYCLE[:n_life]
        for _ in range(rng.randrange(0, 3)):
            codes.append(rng.choice(EXTRA_EVENTS))
        ts = _BASE + timedelta(seconds=rng.randrange(0, 30 * 86400))
        tx_events = []
        for code in codes:
            ts = ts + timedelta(milliseconds=rng.randrange(1, 60_000))
            if tx_events and rng.random() < p_equal_ts:
                ts = tx_events[-1][1]  # equal-timestamp pair (strict-< guard)
            tx_events.append((code, ts))
        for code, ets in tx_events:
            ev = {
                "id": f"ev-{seed}-{eid:07d}",
                "transactionId": tx,
                "eventCode": code,
                "creationDate": _iso(ets),
                "ttl": rng.randrange(1, 9999) if rng.random() < p_ttl else None,
                "operationType": (
                    rng.choice(["delete", "invalidate", "drop"])
                    if rng.random() < p_bad_optype
                    else rng.choice(["insert", "update", "replace"])
                ),
                "data": _payload(rng, code, tx),
            }
            if rng.random() < p_unknown_code:
                ev["eventCode"] = rng.choice(
                    ["TRANSACTION_UNKNOWN_EVENT", "SOME_NEW_EVENT", "BOGUS"]
                )
            events.append(ev)
            eid += 1
            if rng.random() < p_duplicate:
                events.append(dict(ev))  # same id delivered twice (lock dedup)
                eid += 1

    if shuffle:
        rng.shuffle(events)
    for i, ev in enumerate(events):
        ev["seq"] = i  # arrival order after shuffling
    return events
