"""Tolerant JSON-envelope parsing: malformed records quarantined, never fatal.

Spark translation of the reference's drop-and-log deserialization
(/root/reference/src/main/kotlin/it/pagopa/ecommerce/cdc/datacapture/EcommerceTransactionsLogEventsStream.kt:122-135
— `onErrorResume { log; Mono.empty() }` per record): ``from_json`` in
PERMISSIVE mode keeps the stream alive on any malformed payload, the raw
line is preserved in a corrupt-record column, and the caller gets a
(parsed, quarantine) pair — the quarantine side is the observability upgrade
over the reference, which only logged and lost the record.

Works identically over ``spark.read.text`` (batch replay) and
``spark.readStream.text`` (live tail) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENT_ENVELOPE_TYPE

CORRUPT_COL = "_corrupt_record"


def _envelope_with_corrupt() -> T.StructType:
    return T.StructType(
        [*EVENT_ENVELOPE_TYPE.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )


def parse_envelope_lines(lines: DataFrame, text_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """JSON-lines text → (parsed envelope rows, quarantined raw lines).

    A record is quarantined when it is not valid JSON **or** parses to JSON
    but lacks the envelope's required identity fields (id, transactionId,
    eventCode) — the reference cannot process those either
    (TransactionViewUpsertService.kt:138,268).
    """
    parsed = lines.select(
        F.col(text_col).alias("_raw"),
        F.from_json(
            F.col(text_col),
            _envelope_with_corrupt(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("e"),
    )
    ok = (
        F.col(f"e.{CORRUPT_COL}").isNull()
        & F.col("e.id").isNotNull()
        & F.col("e.transactionId").isNotNull()
        & F.col("e.eventCode").isNotNull()
    )
    good = parsed.filter(ok).select("e.*").drop(CORRUPT_COL)
    quarantine = parsed.filter(~ok).select(F.col("_raw").alias("raw_record"))
    return good, quarantine
