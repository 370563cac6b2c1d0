"""PySpark-native analytics engine with the capabilities of
pagopa/pagopa-ecommerce-cdc-service, generalized into a reusable engine.

The reference (read-only at /root/reference/) is a Kotlin/Spring-WebFlux
change-data-capture processor: it tails a MongoDB change stream over an
append-only event store and maintains a per-transaction materialized view
with out-of-order-safe, last-event-wins merge semantics
(reference: src/main/kotlin/it/pagopa/ecommerce/cdc/services/TransactionViewUpsertService.kt).

This package re-expresses those semantics Spark-first:

- ``schemas``        — event envelope / view StructTypes (SURVEY.md §1.3)
- ``event_mapping``  — the 19-way event-type dispatch as a declarative table
- ``operators``      — batch CDC fold, dedup, similarity, text analysis,
                       windowed/event-stream operators
- ``sources``        — event-log readers (batch + streaming) and fixtures
- ``functions``      — portable column expression helpers (hashing, etc.)
- ``plans``          — the relational query suite over the TPC-H-ish testdata
- ``streaming``      — Structured Streaming pipeline (stateful incremental fold)
"""

__version__ = "0.1.0"
