"""Batch CDC fold: event log → transactions view.

Re-expresses the reference's per-event upsert pipeline
(/root/reference/src/main/kotlin/it/pagopa/ecommerce/cdc/services/TransactionViewUpsertService.kt:60-250
and datacapture/EcommerceTransactionsLogEventsStream.kt:79-135) as one
deterministic, order-insensitive fold per ``transactionId``.

Semantics (derived in SURVEY.md §2.3-2.4; the reference's three-attempt
update/upsert dance collapses into pure expressions because a shuffle by key
serializes each key's events and removes the write-write race):

* Events are processed in **arrival order** ``seq`` (the change-stream
  delivery order). ``lastProcessedEventAt`` after a prefix of events equals
  the prefix's running max event-time, so an event *applies* its guarded
  update iff its event-time is **strictly greater** than the prefix max of
  all earlier valid events (strict ``<`` guard,
  TransactionViewUpsertService.kt:144).
* Final value of each view field = value of the **last-arriving effective
  write** of that field, where unguarded writes (reference ``dataUpdate``)
  are always effective and guarded writes only when the event applied.
* ``status`` = status of the last-arriving *applied* status-bearing event;
  ``lastProcessedEventAt`` = max event-time over applied events.

Scale design: ONE shuffle (hash by ``transactionId``). The id-dedup window
partitions by (transactionId, id) and the guard window by transactionId —
both are satisfied by the same hash partitioning on transactionId, and the
final groupBy reuses it too, so Catalyst plans a single Exchange. Per-field
folds are ``max(struct(seq, value))`` aggregates: partial-aggregable,
whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import CdcConfig, DEFAULT_CONFIG
from ..event_mapping import (
    EVENT_SPECS,
    KNOWN_EVENT_CODES,
    WRITTEN_VIEW_FIELDS,
    WriteMode,
    writers_of,
)
from ..schemas import TRANSACTION_VIEW_CLASS

_TS = "_ts_millis"
_APPLIED = "_applied"


def parse_creation_date_millis(creation_date: Column) -> Column:
    """ISO-8601 zoned string → epoch millis.

    Mirrors ``ZonedDateTime.parse(...).toInstant().toEpochMilli()``
    (TransactionViewUpsertService.kt:144). Handles up to 9 fractional digits
    by trimming to micros (Spark timestamp precision) before parsing.
    """
    # normalize: 9-digit (nano) fractions → 6-digit (micro); Z offset kept
    trimmed = F.regexp_replace(
        creation_date, r"(\.\d{6})\d+(?=[+-Z])", r"$1"
    )
    return F.unix_millis(F.to_timestamp(trimmed))


def prepare_events(
    df: DataFrame,
    config: CdcConfig = DEFAULT_CONFIG,
    ts_millis: Column | None = None,
) -> DataFrame:
    """Filter/validate the raw envelope stream and attach ``_ts_millis``.

    Mirrors the reference's intake chain:
    - operationType server-side match (EcommerceTransactionsLogEventsStream.kt:79-85)
    - ttl-marked migration artifacts skipped (:111-120)
    - unknown eventCode rejected (CdcEventTypeException,
      TransactionViewUpsertService.kt:292-298)
    """
    if ts_millis is None:
        ts_millis = parse_creation_date_millis(F.col("creationDate"))
    out = df
    if "operationType" in df.columns:
        out = out.filter(F.col("operationType").isin(*config.operation_types))
    if "ttl" in df.columns:
        out = out.filter(F.col("ttl").isNull())
    out = out.filter(F.col("eventCode").isin(*KNOWN_EVENT_CODES))
    # identity guard shared by every intake path (Kafka already enforces it
    # in parse_envelope_lines): the reference cannot process identity-less
    # events either — the lock is keyed on event id and the view on
    # transactionId (TransactionViewUpsertService.kt:138)
    out = out.filter(F.col("id").isNotNull() & F.col("transactionId").isNotNull())
    return out.withColumn(_TS, ts_millis).filter(F.col(_TS).isNotNull())


def _status_op() -> Column:
    """Chained CASE building the guarded status write-op struct."""
    op = None
    for code, spec in EVENT_SPECS.items():
        if spec.status_col is None:
            continue
        value = spec.status_col()
        cond = (F.col("eventCode") == code) & F.col(_APPLIED) & value.isNotNull()
        branch = F.struct(F.col("seq").alias("_s"), value.alias("v"))
        op = F.when(cond, branch) if op is None else op.when(cond, branch)
    assert op is not None
    return op


def _field_op(view_field: str) -> Column:
    """Chained CASE building the write-op struct for one view field."""
    op = None
    for code, w in writers_of(view_field):
        cond = F.col("eventCode") == code
        if w.cond_col is not None:
            cond = cond & w.cond_col()
        if w.guarded:
            cond = cond & F.col(_APPLIED)
        value = w.value_col()
        if w.mode is WriteMode.SET_IF_NONNULL:
            cond = cond & value.isNotNull()
        branch = F.struct(F.col("seq").alias("_s"), value.alias("v"))
        op = F.when(cond, branch) if op is None else op.when(cond, branch)
    assert op is not None, f"no writers for {view_field}"
    return op


def _salted_applied(df: DataFrame, key: str, s: int) -> DataFrame:
    """Skew-resilient id-dedup + strict-newer guard (see
    ``fold_transactions_view(salt_segments=...)``).

    Segments are RANGES of the global arrival counter ``seq`` (not hashes —
    the prefix-max scan needs ordered segments), sized from a broadcast
    one-row (min, max) aggregate so no driver collect happens."""
    # id-dedup as a (key, id) aggregation: first delivery (min seq) wins.
    # min_by keeps the whole winning row; the exchange key carries id, so a
    # hot transactionId spreads across its (distinct) event ids.
    cols = df.columns
    df = (
        df.groupBy(key, "id")
        .agg(F.min_by(F.struct(*[c for c in cols if c not in (key, "id")]), F.col("seq")).alias("_row"))
        .select(key, "id", "_row.*")
    )
    # ordered segmentation of seq into s ranges
    bounds = df.agg(
        F.min("seq").alias("_lo"), F.max("seq").alias("_hi")
    )
    df = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_seg",
        F.floor(
            ((F.col("seq") - F.col("_lo")) * s) / (F.col("_hi") - F.col("_lo") + 1)
        ).cast("int"),
    )
    # level 1: per-(key, seg) maxima — partial-aggregable, skew spreads
    seg_max = df.groupBy(key, "_seg").agg(F.max(_TS).alias("_segmax"))
    # level 2: prefix max over SEGMENTS (≤ s rows per key — tiny)
    w_seg = (
        Window.partitionBy(key)
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = seg_max.withColumn("_prevmax", F.max("_segmax").over(w_seg)).select(
        key, "_seg", "_prevmax"
    )
    # level 3: within-segment prefix max — window bounded by the segment
    w_in = (
        Window.partitionBy(key, "_seg")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = df.join(prev, [key, "_seg"])
    in_seg = F.max(F.col(_TS)).over(w_in)
    prefix_max = F.greatest(F.col("_prevmax"), in_seg)  # greatest skips nulls
    return df.withColumn(
        _APPLIED, prefix_max.isNull() | (F.col(_TS) > prefix_max)
    ).drop("_lo", "_hi", "_seg", "_prevmax")


def fold_transactions_view(
    prepared: DataFrame,
    key: str = "transactionId",
    seq: str = "seq",
    salt_segments: int | None = None,
) -> DataFrame:
    """Fold a prepared event log into the transactions view (batch mode).

    ``prepared`` must be the output of :func:`prepare_events` (or carry a
    ``_ts_millis`` column) and a monotone arrival-order ``seq`` column.

    ``salt_segments``: skew fallback, COLD-STANDBY by default. The default
    plan is ONE exchange on ``key``, whose two per-key windows serialize
    every hot key's rows into one task — the round-7 sweep (SCALING.md)
    measured it WINNING through 100% single-key hotness at sf1 (≈333k rows
    per hot key), so the crossover variable is absolute per-key row count,
    not skew ratio: activate salting only when one key's event set breaches
    a single task's memory/time budget (order 10⁸⁺ rows per key at 100 TB).
    With ``salt_segments=S`` the fold
    switches to a skew-resilient formulation in which NO stage is keyed on
    ``key`` alone at event grain: id-dedup becomes a (key, id) min-by
    aggregation (ids are distinct within a hot key, so the exchange
    spreads), and the prefix-max guard becomes a two-level segmented scan —
    per-(key, seg) partial maxima, a key-grain prefix pass over the tiny
    S-row-per-key segment table, then within-segment windows bounded by the
    segment width. The final per-field folds are partial-aggregable maxes,
    which absorb skew map-side in either formulation. Costs two extra
    narrow exchanges; results are row-identical (property-tested).
    """
    df = prepared
    if seq != "seq":
        df = df.withColumn("seq", F.col(seq))

    if salt_segments is None:
        # ONE explicit shuffle by the fold key. hash(transactionId) satisfies
        # the clustered-distribution requirements of the (key, id) dedup
        # window, the key-only guard window AND the final groupBy, so
        # Catalyst plans a single Exchange (left to EnsureRequirements it
        # would shuffle twice: once on (key, id), once on key).
        df = df.repartition(key)

        # exclusive-lock dedup by event id (CdcLockService.kt:40-50): first
        # delivery wins.
        w_dedup = Window.partitionBy(key, "id").orderBy("seq")
        df = (
            df.withColumn("_rn_id", F.row_number().over(w_dedup))
            .filter(F.col("_rn_id") == 1)
            .drop("_rn_id")
        )

        # guard: applies iff strictly newer than every earlier valid event
        w_prefix = (
            Window.partitionBy(key)
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prefix_max = F.max(F.col(_TS)).over(w_prefix)
        df = df.withColumn(
            _APPLIED, prefix_max.isNull() | (F.col(_TS) > prefix_max)
        )
    else:
        df = _salted_applied(df, key, max(2, int(salt_segments)))

    aggs: list[Column] = []
    aggs.append(F.max(_status_op())["v"].alias("status"))
    aggs.append(
        F.max(F.when(F.col(_APPLIED), F.col(_TS))).alias("lastProcessedEventAt")
    )
    for f_name in WRITTEN_VIEW_FIELDS:
        aggs.append(F.max(_field_op(f_name))["v"].alias(f_name))

    view = df.groupBy(F.col(key).alias("transactionId")).agg(*aggs)

    # upsert sets _class = Transaction::class.java.canonicalName on insert
    # (TransactionViewUpsertService.kt:71-75)
    view = view.withColumn("_class", F.lit(TRANSACTION_VIEW_CLASS))

    ordered = [
        "transactionId",
        "email",
        "paymentNotices",
        "clientId",
        "creationDate",
        "userId",
        "status",
        "lastProcessedEventAt",
        "paymentGateway",
        "paymentTypeCode",
        "pspId",
        "feeTotal",
        "authorizationRequestId",
        "authorizationCode",
        "rrn",
        "gatewayAuthorizationStatus",
        "endToEndId",
        "authorizationErrorCode",
        "sendPaymentResultOutcome",
        "closureErrorData",
        "_class",
    ]
    return view.select(*ordered)


def transactions_view_from_log(
    raw: DataFrame, config: CdcConfig = DEFAULT_CONFIG
) -> DataFrame:
    """End-to-end batch replay: raw envelope log → transactions view."""
    return fold_transactions_view(prepare_events(raw, config))


def status_history(prepared: DataFrame, key: str = "transactionId") -> DataFrame:
    """SCD Type-2 status intervals of the materialized view's write history.

    ``prepared`` must be the output of :func:`prepare_events` with a
    monotone arrival-order ``seq`` column (the contract of
    :func:`fold_transactions_view`, whose dedup + strict-newer guard this
    reuses verbatim — TransactionViewUpsertService.kt:134-149 semantics).
    An interval opens when an APPLIED status-bearing event writes a status
    different from the view's previous one; applied timestamps are
    strictly increasing per key by the guard's definition, so intervals
    are well-formed. One exchange on ``key`` serves the dedup window, the
    guard window, and all three history windows.
    """
    df = prepared.repartition(key)
    w_dedup = Window.partitionBy(key, "id").orderBy("seq")
    df = (
        df.withColumn("_rn_id", F.row_number().over(w_dedup))
        .filter(F.col("_rn_id") == 1)
        .drop("_rn_id")
    )
    w_prefix = (
        Window.partitionBy(key)
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_max = F.max(F.col(_TS)).over(w_prefix)
    df = df.withColumn(_APPLIED, prefix_max.isNull() | (F.col(_TS) > prefix_max))
    writes = df.withColumn("st", _status_op()["v"]).filter(F.col("st").isNotNull())
    w_seq = Window.partitionBy(key).orderBy("seq")
    changes = writes.withColumn("prev", F.lag("st").over(w_seq)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("st"))
    )
    return changes.select(
        F.col(key).alias("transactionId"),
        F.row_number().over(w_seq).cast("long").alias("version"),
        F.col("st").alias("status"),
        F.col(_TS).alias("valid_from_ms"),
        F.lead(F.col(_TS)).over(w_seq).alias("valid_to_ms"),
        F.lead(F.col(_TS)).over(w_seq).isNull().alias("is_current"),
    )


def status_at_events(prepared: DataFrame, key: str = "transactionId") -> DataFrame:
    """POINT-IN-TIME status lookup: for every envelope event, the status
    the materialized view held at the event's business timestamp — the
    temporal-table (`FOR SYSTEM_TIME AS OF`) probe over
    :func:`status_history`'s intervals.

    Computed WITHOUT a range join: history rows (kind 0) and probe rows
    (kind 1) union on the key and a last-non-null window resolves each
    probe against the most recent interval start at-or-before its
    timestamp (history sorts before probes at equal timestamps, so a
    status applies AT its own valid_from instant). Probes that precede the
    first interval resolve to NULL. One key exchange serves the whole
    lookup — the PIT pattern that replaces the O(probes × intervals)
    theta-join at scale; applied interval starts are strictly increasing
    per key (the guard's definition), so the window order is total.
    """
    hist = status_history(prepared, key)
    h = hist.select(
        F.col("transactionId").alias("k"),
        F.col("valid_from_ms").alias("t"),
        F.lit(0).alias("kind"),
        (-F.col("version")).alias("ord"),
        "status",
        "version",
        F.lit(None).cast("string").alias("code"),
    )
    p = prepared.select(
        F.col(key).alias("k"),
        F.col(_TS).alias("t"),
        F.lit(1).alias("kind"),
        F.col("seq").alias("ord"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("long").alias("version"),
        F.col("eventCode").alias("code"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind", "ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = (
        h.unionByName(p)
        .withColumn("status_at", F.last("status", ignorenulls=True).over(w))
        .withColumn("version_at", F.last("version", ignorenulls=True).over(w))
    )
    return u.filter(F.col("kind") == 1).select(
        F.col("k").alias("transactionId"),
        F.col("ord").alias("seq"),
        F.col("t").alias("probe_ts_ms"),
        F.col("code").alias("event_code"),
        "status_at",
        "version_at",
    )


def _lineage_meta(guarded: bool) -> Column:
    """Writer-metadata struct for one potential write: ordered by arrival
    ``seq`` (max = last-arriving effective write, exactly the fold's
    winner), carrying the writer event's identity."""
    return F.struct(
        F.col("seq").alias("_s"),
        F.col("id").alias("event_id"),
        F.col("eventCode").alias("event_code"),
        F.col(_TS).alias("event_ts_millis"),
        F.lit(guarded).alias("guarded"),
    )


def _field_lineage_op(view_field: str) -> Column:
    """Chained CASE mirroring :func:`_field_op`, but the branch struct
    carries the WRITER's identity instead of the written value — same
    effectiveness conditions, so max() picks the event whose write
    produced the field's final value."""
    op = None
    for code, w in writers_of(view_field):
        cond = F.col("eventCode") == code
        if w.cond_col is not None:
            cond = cond & w.cond_col()
        if w.guarded:
            cond = cond & F.col(_APPLIED)
        value = w.value_col()
        if w.mode is WriteMode.SET_IF_NONNULL:
            cond = cond & value.isNotNull()
        branch = _lineage_meta(w.guarded)
        op = F.when(cond, branch) if op is None else op.when(cond, branch)
    assert op is not None, f"no writers for {view_field}"
    return op


def _status_lineage_op() -> Column:
    """Writer metadata for the ``status`` field (mirrors
    :func:`_status_op`: applied status-bearing events with a non-null
    target status)."""
    op = None
    for code, spec in EVENT_SPECS.items():
        if spec.status_col is None:
            continue
        value = spec.status_col()
        cond = (F.col("eventCode") == code) & F.col(_APPLIED) & value.isNotNull()
        branch = _lineage_meta(True)
        op = F.when(cond, branch) if op is None else op.when(cond, branch)
    assert op is not None
    return op


def fold_field_lineage(
    prepared: DataFrame,
    key: str = "transactionId",
    seq: str = "seq",
) -> DataFrame:
    """Per-field column lineage of the CDC fold: for every view field,
    WHICH event's write produced the field's final value.

    Generalizes the per-event span projection (streaming/tracing.py) to the
    full per-field write map of the reference's upsert service
    (TransactionViewUpsertService.kt:308-659): each field's lineage row is
    the last-arriving EFFECTIVE write of that field — unguarded writes
    always effective, guarded writes only when the event applied under the
    strict-newer guard (TransactionViewUpsertService.kt:134-149). Fields
    nothing ever wrote for a transaction have no row (the view holds their
    insert-time default NULL).

    Output: one row per (transactionId, field) with the writer's event id,
    event code, event-time millis, and whether the winning write was
    guarded. ``status`` and ``lastProcessedEventAt`` are included as
    fields; ``lastProcessedEventAt``'s writer is the last applied event
    (applied event-times are strictly increasing in arrival order, so
    last-arriving = max event-time — the fold's value).

    Scale shape: identical to :func:`fold_transactions_view` — ONE
    exchange on ``transactionId`` serves the id-dedup window, the guard
    window and the final groupBy; per-field lineage folds are
    partial-aggregable ``max(struct)``; the long format comes from a
    post-aggregation explode over an O(#fields) array, no extra shuffle.
    """
    df = prepared
    if seq != "seq":
        df = df.withColumn("seq", F.col(seq))
    df = df.repartition(key)

    w_dedup = Window.partitionBy(key, "id").orderBy("seq")
    df = (
        df.withColumn("_rn_id", F.row_number().over(w_dedup))
        .filter(F.col("_rn_id") == 1)
        .drop("_rn_id")
    )
    w_prefix = (
        Window.partitionBy(key)
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_max = F.max(F.col(_TS)).over(w_prefix)
    df = df.withColumn(_APPLIED, prefix_max.isNull() | (F.col(_TS) > prefix_max))

    aggs: list[Column] = [F.max(_status_lineage_op()).alias("_lin_status")]
    aggs.append(
        F.max(F.when(F.col(_APPLIED), _lineage_meta(True))).alias("_lin_lpea")
    )
    for f_name in WRITTEN_VIEW_FIELDS:
        aggs.append(F.max(_field_lineage_op(f_name)).alias(f"_lin_{f_name}"))
    g = df.groupBy(F.col(key).alias("transactionId")).agg(*aggs)

    entries = [
        F.struct(F.lit("status").alias("field"), F.col("_lin_status").alias("w")),
        F.struct(
            F.lit("lastProcessedEventAt").alias("field"),
            F.col("_lin_lpea").alias("w"),
        ),
    ] + [
        F.struct(F.lit(f_name).alias("field"), F.col(f"_lin_{f_name}").alias("w"))
        for f_name in WRITTEN_VIEW_FIELDS
    ]
    e = g.select("transactionId", F.explode(F.array(*entries)).alias("e"))
    return e.filter(F.col("e.w").isNotNull()).select(
        "transactionId",
        F.col("e.field").alias("field"),
        F.col("e.w.event_id").alias("event_id"),
        F.col("e.w.event_code").alias("event_code"),
        F.col("e.w.event_ts_millis").alias("event_ts_millis"),
        F.col("e.w.guarded").alias("guarded"),
    )
