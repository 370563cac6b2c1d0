"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) for the
CDC envelope feed — the connector-level twin of the reference's change-stream
source (EcommerceTransactionsLogEventsStream.kt:74-94) built on Spark's
official source-extension surface instead of a bespoke reader.

Three production-relevant properties are implemented, not stubbed:

- **Tolerant per-record parse** (T1/ST6): each JSON line is parsed in
  Python; invalid JSON or missing identity fields (id / transactionId /
  eventCode — the reference cannot process those either,
  TransactionViewUpsertService.kt:138,268) yields a quarantine row carrying
  the raw line in ``_corrupt`` instead of failing the scan.
- **Filter pushdown** (S1's server-side $match): ``pushFilters`` accepts
  EqualTo / IsNotNull on ``operationType`` and ``eventCode`` and applies
  them INSIDE the source before rows cross into the engine — the Python
  twin of the reference's change-stream match stage. Unsupported filters
  are returned to Spark for post-scan evaluation.
- **Resumable streaming** (S2-adjacent): ``SimpleDataSourceStreamReader``
  with a file-index offset over the name-sorted directory listing — each
  micro-batch consumes ``maxFilesPerBatch`` new files, ``initialOffset``
  starts at zero, and ``readBetweenOffsets`` replays any committed range
  deterministically (exactly the replayability contract checkpoint
  recovery needs).

One partition per file: the file is the parallelism unit, as in Spark's own
file sources. Rows cross as plain tuples (Arrow-batched by the engine).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    pass

SOURCE_NAME = "cdc_envelope_jsonl"

# (name, json key) in output order; seq is the only non-string field
_FIELDS = (
    "id",
    "transactionId",
    "eventCode",
    "creationDate",
    "seq",
    "operationType",
    "email",
)
_SCHEMA_DDL = (
    "id string, transactionId string, eventCode string, creationDate string, "
    "seq bigint, operationType string, email string, _corrupt string"
)

_PUSHABLE = {"operationType", "eventCode"}


def _list_files(path: str) -> list[str]:
    try:
        names = sorted(
            n for n in os.listdir(path) if not n.startswith(("_", "."))
        )
    except FileNotFoundError:
        return []
    return [os.path.join(path, n) for n in names]


def _parse_line(line: str) -> Tuple:
    """One envelope line → output tuple (good row or quarantine row).

    EVERY malformation quarantines — invalid JSON, non-object payloads,
    missing identity fields, and type surprises inside a valid object
    (e.g. ``"seq": "oops"``). The tolerant-parse contract is that the scan
    never fails; a bare ``int(seq)`` outside the guard would crash the
    task (and wedge a restarting stream on the same file forever)."""
    try:
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError("not an object")
        if (
            obj.get("id") is None
            or obj.get("transactionId") is None
            or obj.get("eventCode") is None
        ):
            raise ValueError("missing identity")
        data = obj.get("data") or {}
        seq = obj.get("seq")
        return (
            str(obj["id"]),
            str(obj["transactionId"]),
            str(obj["eventCode"]),
            None if obj.get("creationDate") is None else str(obj["creationDate"]),
            int(seq) if seq is not None else None,
            None if obj.get("operationType") is None else str(obj["operationType"]),
            data.get("email") if isinstance(data, dict) else None,
            None,
        )
    except Exception:
        return (None, None, None, None, None, None, None, line)


_FIELD_IDX = {name: i for i, name in enumerate(_FIELDS)}


def _passes(row: Tuple, pushed: list[tuple[str, str, object]]) -> bool:
    """Apply pushed predicates source-side, FULLY: a filter this reader
    consumed in ``pushFilters`` is not re-evaluated by Spark, so the
    source must implement exact SQL semantics — including that a
    quarantine row's parsed columns are NULL and therefore fail EqualTo
    (exactly as ``WHERE operationType = 'insert'`` drops them post-scan
    without pushdown). A pipeline that wants the quarantine stream reads
    the source unfiltered, as the gate query does."""
    for kind, col, value in pushed:
        v = row[_FIELD_IDX[col]]
        if kind == "eq" and (v is None or v != value):
            return False
        if kind == "notnull" and v is None:
            return False
    return True


class _FilePartition(InputPartition):
    def __init__(self, path: str):  # keep InputPartition.value populated
        super().__init__(path)
        self.path = path


class EnvelopeJsonlReader(DataSourceReader):
    """Plain reader (no ``pushFilters``): merely IMPLEMENTING that method
    makes Spark refuse every read unless
    ``spark.sql.python.filterPushdown.enabled`` is on, so pushdown lives in
    the opt-in subclass below (``.option("pushdown", "true")``)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{SOURCE_NAME}: 'path' option is required")
        self.pushed: list[tuple[str, str, object]] = []

    def partitions(self) -> Sequence[InputPartition]:
        files = _list_files(self.path)
        if not files:
            return [_FilePartition("")]
        return [_FilePartition(p) for p in files]

    def read(self, partition: InputPartition) -> Iterator[Tuple]:
        path = partition.path
        if not path:
            return
        pushed = self.pushed
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                row = _parse_line(line)
                if not pushed or _passes(row, pushed):
                    yield row


class EnvelopeJsonlPushdownReader(EnvelopeJsonlReader):
    """The pushdown-enabled variant: the Python twin of the reference's
    server-side change-stream $match (operationType / eventCode). Requires
    ``spark.sql.python.filterPushdown.enabled`` (build_session sets it)."""

    def pushFilters(self, filters: list["Filter"]) -> Iterator["Filter"]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in _PUSHABLE
            ):
                self.pushed.append(("eq", f.attribute[0], f.value))
            elif (
                isinstance(f, IsNotNull)
                and len(f.attribute) == 1
                and f.attribute[0] in _PUSHABLE
            ):
                self.pushed.append(("notnull", f.attribute[0], None))
            else:
                yield f  # unsupported: Spark evaluates it post-scan


class EnvelopeJsonlStreamReader(SimpleDataSourceStreamReader):
    """File-index offsets over the name-sorted listing: {"pos": n} means
    the first n files are committed. Deterministic replay by index range."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{SOURCE_NAME}: 'path' option is required")
        self.max_files = int(options.get("maxFilesPerBatch", "1"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, files: list[str]) -> Iterator[Tuple]:
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        yield _parse_line(line)

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        files = _list_files(self.path)
        pos = int(start.get("pos", 0))
        new = files[pos : pos + self.max_files]
        # a LIST, not a generator: the engine pickles the prefetched batch
        # alongside the offset for replay
        return list(self._rows(new)), {"pos": pos + len(new)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        files = _list_files(self.path)
        return list(
            self._rows(files[int(start.get("pos", 0)) : int(end.get("pos", 0))])
        )


class EnvelopeJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> EnvelopeJsonlReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return EnvelopeJsonlPushdownReader(self.options)
        return EnvelopeJsonlReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EnvelopeJsonlStreamReader:
        return EnvelopeJsonlStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(EnvelopeJsonlDataSource)
