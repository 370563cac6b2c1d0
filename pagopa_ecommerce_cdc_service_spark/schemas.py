"""Spark schemas for the event envelope and the transactions view.

Mirrors the document surface the reference reads/writes (SURVEY.md §1.3,
FIXTURES.md §1-2; field-usage cites are into
/root/reference/src/main/kotlin/it/pagopa/ecommerce/cdc/services/TransactionViewUpsertService.kt
— e.g. envelope read at :138,:144,:268; view writes at :308-659).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Event envelope (input).  `data` is the union of all per-event-type payloads;
# unused fields are null (FIXTURES.md §1).
# ---------------------------------------------------------------------------

PAYMENT_NOTICE_TYPE = T.StructType(
    [
        T.StructField("paymentToken", T.StringType()),
        T.StructField("rptId", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.LongType()),
    ]
)

GATEWAY_AUTH_DATA_TYPE = T.StructType(
    [
        # discriminator: NPG | REDIRECT (polymorphic dispatch,
        # TransactionViewUpsertService.kt:388-424)
        T.StructField("kind", T.StringType()),
        T.StructField("operationResult", T.StringType()),  # NPG   (:390)
        T.StructField("outcome", T.StringType()),          # REDIRECT (:406)
        T.StructField("paymentEndToEndId", T.StringType()),
        T.StructField("errorCode", T.StringType()),
    ]
)

CLOSURE_ERROR_DATA_TYPE = T.StructType(
    [
        T.StructField("httpErrorCode", T.StringType()),
        T.StructField("errorDescription", T.StringType()),
        T.StructField("errorType", T.StringType()),
    ]
)

EVENT_DATA_TYPE = T.StructType(
    [
        T.StructField("email", T.StringType()),
        T.StructField("paymentNotices", T.ArrayType(PAYMENT_NOTICE_TYPE)),
        T.StructField("clientId", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("paymentGateway", T.StringType()),
        T.StructField("paymentTypeCode", T.StringType()),
        T.StructField("pspId", T.StringType()),
        T.StructField("fee", T.LongType()),
        T.StructField("authorizationRequestId", T.StringType()),
        T.StructField("authorizationCode", T.StringType()),
        T.StructField("rrn", T.StringType()),
        T.StructField("gatewayAuthData", GATEWAY_AUTH_DATA_TYPE),
        T.StructField("responseOutcome", T.StringType()),
        T.StructField("statusBeforeExpiration", T.StringType()),
        T.StructField("wasCanceledByUser", T.BooleanType()),
        T.StructField("closureErrorData", CLOSURE_ERROR_DATA_TYPE),
    ]
)

EVENT_ENVELOPE_TYPE = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("transactionId", T.StringType(), nullable=False),
        T.StructField("eventCode", T.StringType(), nullable=False),
        # ISO-8601 zoned string, parsed with ZonedDateTime.parse in the
        # reference (TransactionViewUpsertService.kt:144)
        T.StructField("creationDate", T.StringType(), nullable=False),
        # arrival order within the log (monotone ingestion index); stands in
        # for the change-stream delivery order the reference processes in.
        T.StructField("seq", T.LongType(), nullable=False),
        # rows carrying a ttl are Cosmos migration artifacts and are skipped
        # (EcommerceTransactionsLogEventsStream.kt:111-120)
        T.StructField("ttl", T.LongType()),
        # only insert/update/replace pass (EcommerceTransactionsLogEventsStream.kt:79-85)
        T.StructField("operationType", T.StringType(), nullable=False),
        T.StructField("data", EVENT_DATA_TYPE),
    ]
)

# ---------------------------------------------------------------------------
# Transactions view (output) — every field the reference ever writes
# (SURVEY.md §1.3; FIXTURES.md §2).
# ---------------------------------------------------------------------------

# Transaction::class.java.canonicalName, set on insert
# (TransactionViewUpsertService.kt:71-75; import .documents.v2.* at :8)
TRANSACTION_VIEW_CLASS = "it.pagopa.ecommerce.commons.documents.v2.Transaction"

TRANSACTIONS_VIEW_TYPE = T.StructType(
    [
        T.StructField("transactionId", T.StringType(), nullable=False),
        T.StructField("email", T.StringType()),
        T.StructField("paymentNotices", T.ArrayType(PAYMENT_NOTICE_TYPE)),
        T.StructField("clientId", T.StringType()),
        T.StructField("creationDate", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("lastProcessedEventAt", T.LongType()),
        T.StructField("paymentGateway", T.StringType()),
        T.StructField("paymentTypeCode", T.StringType()),
        T.StructField("pspId", T.StringType()),
        T.StructField("feeTotal", T.LongType()),
        T.StructField("authorizationRequestId", T.StringType()),
        T.StructField("authorizationCode", T.StringType()),
        T.StructField("rrn", T.StringType()),
        T.StructField("gatewayAuthorizationStatus", T.StringType()),
        T.StructField("endToEndId", T.StringType()),
        T.StructField("authorizationErrorCode", T.StringType()),
        T.StructField("sendPaymentResultOutcome", T.StringType()),
        T.StructField("closureErrorData", CLOSURE_ERROR_DATA_TYPE),
        T.StructField("_class", T.StringType()),
    ]
)
